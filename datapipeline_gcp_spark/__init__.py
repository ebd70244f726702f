"""datapipeline_gcp_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``ronnygang/datapipeline_gcp`` (a GCP medallion ETL: GCS landing files →
BigQuery raw/master/business layers orchestrated by Airflow) as a single
idiomatic PySpark library:

- ``session``    — SparkSession factory (AQE on, UTC, tuned shuffle).
- ``schemas``    — fixed StructTypes mirroring the reference's declared
                   BigQuery ``schema_fields`` (typed + as-landed variants).
- ``sources``    — CSV / TSV / snapshot readers, seeded synthetic generators.
- ``sinks``      — layer-table appends, landing-file writes, archival.
- ``operators``  — the relational logic: master 3-way join, five business
                   KPI aggregates, the CTE revenue report, generic
                   relational builders.
- ``functions``  — beyond-parity column logic: text analysis, dedup
                   (exact / MinHash-LSH / SimHash / n-gram Jaccard),
                   embedding similarity, multimodal plumbing.
- ``streaming``  — the event-driven path as Structured Streaming file
                   sources + windowed/stateful aggregations.
- ``plans``      — the pipeline runner (DAG semantics: groups, retries,
                   run-date templating).

Everything is DataFrame/SQL-first: logical plans go to Catalyst; no RDDs,
no driver-side row loops; Python UDFs only where built-ins cannot express
the semantics (and then always Arrow-vectorized).
"""

from datapipeline_gcp_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
