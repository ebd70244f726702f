"""Relational operators: the master join, business KPI aggregates, the
CTE revenue report, and generic relational builders.

Each module exposes two registries consumed by ``__spark_entry__``:

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]`` —
  DataFrame builders over the driver testdata tables.
- ``ORACLES: dict[str, str]`` — matching ANSI SQL for the DuckDB oracle
  (omitted keys get a rows-only check).
"""
