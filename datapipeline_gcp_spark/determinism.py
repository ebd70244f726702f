"""Deterministic numeric aggregation helpers.

Floating-point SUM/AVG is order-dependent; after a shuffle join the
partial-aggregation order differs run-to-run and engine-to-engine (we
measured ~1e-16 relative drift vs a DuckDB oracle on sf0.01). To make
aggregate VALUES exactly reproducible — bitwise, across engines and
across partitionings — money-like measures are summed in exact decimal
arithmetic and only the final result is cast back to DOUBLE:

    SUM(x)  ->  CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
    AVG(x)  ->  CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x)

Decimal addition is associative and commutative (integer arithmetic on
the unscaled value), so the result is independent of row order and of
the partial/final aggregation split — which also means the same number
comes out on 1 partition or 10,000. Spark widens sum(DECIMAL(18,4)) to
DECIMAL(28,4): at scale 4 that holds sums up to 10^24, far beyond 100 TB
of money columns. The external type stays DOUBLE so downstream schemas
are unchanged.

This matters at scale beyond testing: deterministic aggregates make
reruns/backfills byte-identical, so downstream diffing and caching work.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale 4 preserves 2-decimal money exactly and tolerates derived
# values (price * (1 - discount)) to 4 places.
_DECIMAL = "DECIMAL(18,4)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dec(c: Column | str) -> Column:
    """Cast a double measure to the exact internal decimal type."""
    return _col(c).cast(_DECIMAL)


def dsum(c: Column | str) -> Column:
    """Order-independent SUM for double measures (exact decimal internally,
    DOUBLE externally)."""
    return F.sum(dec(c)).cast("double")


def davg(c: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum divided by non-null count.

    Matches SQL ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(x)``
    — a single double division on deterministic operands.
    """
    return dsum(c) / F.count(_col(c))


# --- SQL-side mirrors (for oracle strings and spark.sql text) -------------


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {_DECIMAL})) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {_DECIMAL})) AS DOUBLE) / COUNT({expr})"


def sql_dsum_diff(left: str, right: str) -> str:
    """SUM(left - right) with exact internal arithmetic."""
    return (
        f"CAST(SUM(CAST({left} AS {_DECIMAL}) - CAST({right} AS {_DECIMAL}))"
        " AS DOUBLE)"
    )


def dsum_diff(left: Column | str, right: Column | str) -> Column:
    """Order-independent SUM(left - right) for double measures."""
    return F.sum(dec(left) - dec(right)).cast("double")
