"""Connector gating: configuration helpers compose correctly and absent
jars fail loudly with setup instructions (no silent fallbacks)."""

from __future__ import annotations

import pytest

from datapipeline_gcp_spark import connectors


def test_cloud_session_conf_composition():
    conf = connectors.cloud_session_conf(gcs=True, bigquery=True)
    pkgs = conf["spark.jars.packages"].split(",")
    assert connectors.GCS_CONNECTOR_COORD in pkgs
    assert connectors.BIGQUERY_CONNECTOR_COORD in pkgs
    assert conf["spark.hadoop.fs.gs.auth.type"] == "APPLICATION_DEFAULT"
    assert "spark.jars.packages" not in connectors.cloud_session_conf(
        gcs=False, bigquery=False
    )


def test_absent_jars_raise_with_instructions(spark):
    with pytest.raises(RuntimeError, match="GCS connector"):
        connectors.require_gcs(spark)
    with pytest.raises(RuntimeError, match="BigQuery connector"):
        connectors.read_bigquery(spark, "p.d.t")
    df = spark.range(1)
    with pytest.raises(RuntimeError, match="BigQuery connector"):
        connectors.write_bigquery(df, "p.d.t")
