"""Fixed schemas for the raw layer, mirroring the reference's declared
BigQuery ``schema_fields`` lists (no inference, no evolution).

Reference declarations:
- r_campaigns    — ``cloud_composer/datapipeline_gcp.py:230-235``
- r_transactions — ``cloud_composer/datapipeline_gcp.py:247-252``
- r_sales        — ``cloud_composer/datapipeline_gcp.py:377-385``

The reference lands numeric columns as STRING and relies on BigQuery's
implicit coercion at query time (SURVEY.md §1.3 "semantics trap"). Our
canonical mode types columns at the source boundary (``TYPED``); the
``AS_LANDED`` all-string variants exist for cast-fidelity tests of the
CTE report's explicit ``CAST(... AS FLOAT64)`` (reference
``cloud_composer/load_campaigns_csv.py:19,43``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Typed (canonical) raw schemas
# --------------------------------------------------------------------------

CAMPAIGNS = T.StructType(
    [
        T.StructField("campaign_id", T.LongType()),
        T.StructField("cost", T.DoubleType()),
        T.StructField("country", T.StringType()),
        T.StructField("date_time", T.TimestampType()),
    ]
)

TRANSACTIONS = T.StructType(
    [
        T.StructField("transaction_id", T.LongType()),
        T.StructField("income", T.DoubleType()),
        T.StructField("country", T.StringType()),
        T.StructField("date_time", T.TimestampType()),
    ]
)

SALES = T.StructType(
    [
        T.StructField("transaction_id", T.LongType()),
        T.StructField("customer_id", T.LongType()),
        T.StructField("product_id", T.LongType()),
        T.StructField("quantity", T.IntegerType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("category", T.StringType()),
        T.StructField("date_time", T.TimestampType()),
    ]
)

# The reference never declares the Cloud SQL ``stations`` schema (it is a
# ``SELECT *`` pass-through, ``datapipeline_gcp.py:36``); FIXTURES.md
# suggests this minimal shape for testing the S3 source path.
STATIONS = T.StructType(
    [
        T.StructField("station_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("country", T.StringType()),
    ]
)


def as_landed(schema: T.StructType) -> T.StructType:
    """All-string variant of a raw schema — byte-fidelity with the
    reference's BigQuery loads, which declare numeric/timestamp columns
    as STRING (``datapipeline_gcp.py:232,250,382``). INTEGER columns
    keep their type (the reference types ``quantity`` INTEGER too,
    ``datapipeline_gcp.py:381``)."""
    fields = []
    for f in schema.fields:
        if isinstance(f.dataType, T.IntegerType):
            fields.append(f)
        else:
            fields.append(T.StructField(f.name, T.StringType(), f.nullable))
    return T.StructType(fields)


TYPED = {
    "r_campaigns": CAMPAIGNS,
    "r_transactions": TRANSACTIONS,
    "r_sales": SALES,
    "stations": STATIONS,
}

AS_LANDED = {name: as_landed(s) for name, s in TYPED.items()}

# --------------------------------------------------------------------------
# Layer / table naming (canonical per SURVEY.md §1.5)
# --------------------------------------------------------------------------

RAW_LAYER = "raw_layer"
MASTER_LAYER = "master_layer"
BUSINESS_LAYER = "business_layer"

# §1.5.2: the DAG writes m_performance_model but everything reads
# m_data_model — canonical name is m_data_model.
MASTER_TABLE = f"{MASTER_LAYER}.m_data_model"

BUSINESS_TABLES = (
    f"{BUSINESS_LAYER}.b_sales_kpi",
    f"{BUSINESS_LAYER}.b_performance_metrics",
    f"{BUSINESS_LAYER}.b_customer_retention",
    f"{BUSINESS_LAYER}.b_profitability_kpi",
    # §1.5.3: canonical b_ prefix (DAG used bare product_performance).
    f"{BUSINESS_LAYER}.b_product_performance",
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def pin_utc(spark) -> None:
    """Pin the session time zone to UTC (runtime-settable).

    Contract semantics are UTC: the oracle (DuckDB) treats parquet
    timestamps as naive wall-clock values, while Spark's TIMESTAMP is
    instant-typed and renders in the session time zone. The external
    driver builds a vanilla session that inherits the JVM's local zone,
    whatever that happens to be — every engine entry point that touches
    timestamps calls this so results are identical in any caller's
    session.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_testdata(spark, sf_dir: str, tables=TESTDATA_TABLES) -> dict:
    """Read the driver-provided parquet tables and register temp views.

    Returns ``{name: DataFrame}``. Parquet scans get column pruning and
    predicate pushdown from Catalyst automatically.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's reader rejects outright; it is read as raw nanos via the
    ``nanosAsLong`` legacy conf (session-settable, so this works in any
    caller's session) and converted to a microsecond TIMESTAMP — the
    data is µs-resolution, so the conversion is lossless.
    """
    from pyspark.sql import functions as F

    pin_utc(spark)

    out = {}
    for name in tables:
        path = f"{sf_dir}/{name}.parquet"
        if name == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
