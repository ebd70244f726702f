"""Shared test fixtures: one SparkSession per test run, a DuckDB
connection with the testdata views registered, and an oracle comparator
replicating the driver's check (row count + schema + order-insensitive
value comparison)."""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datapipeline_gcp_spark.schemas import TESTDATA_TABLES
from datapipeline_gcp_spark.session import get_session

TESTDATA_ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = f"{TESTDATA_ROOT}/sf0.001"
SF_CORRECTNESS = f"{TESTDATA_ROOT}/sf0.01"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    # Warehouse + derby metastore live in a temp dir so catalog-table
    # tests never pollute the repo working tree.
    wh = tmp_path_factory.mktemp("warehouse")
    s = get_session(
        app_name="datapipeline_gcp_spark-tests",
        warehouse_dir=str(wh),
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_TEST_MEM", "16g"),
            "spark.driver.extraJavaOptions": f"-Dderby.system.home={wh}",
        },
    )
    yield s
    s.stop()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


# ---------------------------------------------------------------------------
# Normalization: canonical string form per cell so value comparison is
# representation-independent (date vs datetime-at-midnight, float repr,
# NaN/None) but still exact for floats — the engine's aggregates are
# bitwise-deterministic by construction (see determinism.py).
# ---------------------------------------------------------------------------


def _canon(v) -> str:
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        v = v.to_pydatetime()
    if isinstance(v, dt.datetime):
        if v.time() == dt.time(0, 0) and v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bool,)):
        return str(bool(v))
    if isinstance(v, (int,)):
        return str(int(v))
    if pd.isna(v):
        return "∅"
    return str(v)


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = [tuple(_canon(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(out)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column sets differ: {sorted(spark_pdf.columns)} vs "
        f"{sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row counts differ: {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a, b = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: values differ; first diffs: {diffs}")


def run_oracle_check(spark, name: str, query_fn, oracle: str, sf_dir: str):
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    con = duckdb_con(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).df()
    finally:
        con.close()
    assert_frames_match(spark_pdf, oracle_pdf, name)
    return spark_pdf
