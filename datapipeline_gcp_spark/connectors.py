"""Cloud deployment connectors (GCS + BigQuery) — configuration helpers,
gated on jar availability.

The reference lives on GCS + BigQuery; this engine is storage-agnostic
(every path in the codebase is a Hadoop-FS URI, every table a catalog
table), so cloud deployment is configuration, not code:

- GCS: the public ``gcs-connector`` Hadoop jar → ``gs://`` URIs work in
  every reader/sink/stream unchanged.
- BigQuery: the public ``spark-bigquery-connector`` →
  ``spark.read.format("bigquery")`` replaces the parquet catalog tables
  where a BigQuery warehouse is required (the reference's Dataproc job
  used exactly this connector, ``cloud_composer/datapipeline_gcp.py:31``).

Neither jar ships in this build environment, so these helpers only
*configure* a session at build time and raise actionable errors if the
classes are absent at use time. No silent fallbacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Public Maven coordinates (versions pinned to a Spark-4-compatible line).
GCS_CONNECTOR_COORD = "com.google.cloud.bigdataoss:gcs-connector:hadoop3-2.2.21"
BIGQUERY_CONNECTOR_COORD = (
    "com.google.cloud.spark:spark-bigquery-with-dependencies_2.13:0.41.0"
)

GCS_CONF = {
    "spark.hadoop.fs.gs.impl": "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem",
    "spark.hadoop.fs.AbstractFileSystem.gs.impl": (
        "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFS"
    ),
    "spark.hadoop.fs.gs.auth.type": "APPLICATION_DEFAULT",
}


def cloud_session_conf(
    gcs: bool = True, bigquery: bool = False, extra_packages: str = ""
) -> dict[str, str]:
    """Session builder conf for a cloud deployment — pass to
    ``session.get_session(extra_conf=...)``. Jars resolve via
    ``spark.jars.packages`` (needs network at session start)."""
    packages = []
    conf: dict[str, str] = {}
    if gcs:
        packages.append(GCS_CONNECTOR_COORD)
        conf.update(GCS_CONF)
    if bigquery:
        packages.append(BIGQUERY_CONNECTOR_COORD)
    if extra_packages:
        packages.append(extra_packages)
    if packages:
        conf["spark.jars.packages"] = ",".join(packages)
    return conf


def _has_class(spark: SparkSession, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)  # noqa: SLF001
        return True
    except Exception:
        return False


def require_gcs(spark: SparkSession) -> None:
    if not _has_class(
        spark, "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem"
    ):
        raise RuntimeError(
            "GCS connector not on the classpath. Build the session with "
            "get_session(extra_conf=cloud_session_conf(gcs=True)) (requires "
            f"network to resolve {GCS_CONNECTOR_COORD}), then use gs:// paths "
            "in any reader/sink/stream."
        )


def read_bigquery(spark: SparkSession, table: str, **options: str) -> DataFrame:
    """``bigquery`` format read (e.g. ``project.dataset.table``). Raises
    with setup instructions when the connector jar is absent."""
    if not _has_class(spark, "com.google.cloud.spark.bigquery.BigQueryRelationProvider"):
        raise RuntimeError(
            "BigQuery connector not on the classpath. Build the session with "
            "get_session(extra_conf=cloud_session_conf(bigquery=True)) "
            f"(resolves {BIGQUERY_CONNECTOR_COORD})."
        )
    reader = spark.read.format("bigquery").option("table", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_bigquery(
    df: DataFrame, table: str, mode: str = "append", **options: str
) -> None:
    spark = df.sparkSession
    if not _has_class(spark, "com.google.cloud.spark.bigquery.BigQueryRelationProvider"):
        raise RuntimeError(
            "BigQuery connector not on the classpath — see read_bigquery."
        )
    writer = df.write.format("bigquery").option("table", table).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()
