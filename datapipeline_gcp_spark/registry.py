"""Central query registry: merges every operator module's QUERIES and
ORACLES dicts. ``__spark_entry__`` (the driver contract) re-exports
these. Keys are unique across modules — a collision is a bug and raises
at import time.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "datapipeline_gcp_spark.operators.master",
    "datapipeline_gcp_spark.operators.business",
    "datapipeline_gcp_spark.operators.report",
    "datapipeline_gcp_spark.operators.relational",
    "datapipeline_gcp_spark.operators.asof",
    "datapipeline_gcp_spark.operators.analytics",
    "datapipeline_gcp_spark.operators.rangejoin",
    "datapipeline_gcp_spark.operators.tpch",
    "datapipeline_gcp_spark.operators.maintenance",
    "datapipeline_gcp_spark.sources.generators",
    "datapipeline_gcp_spark.sources.readers",
    "datapipeline_gcp_spark.streaming.windows",
    "datapipeline_gcp_spark.streaming.joins",
    "datapipeline_gcp_spark.functions.text",
    "datapipeline_gcp_spark.functions.dedup",
    "datapipeline_gcp_spark.functions.clusters",
    "datapipeline_gcp_spark.functions.similarity",
    "datapipeline_gcp_spark.functions.multimodal",
    "datapipeline_gcp_spark.functions.cleaning",
    "datapipeline_gcp_spark.functions.curation",
    "datapipeline_gcp_spark.functions.corpus",
    "datapipeline_gcp_spark.functions.indexing",
    "datapipeline_gcp_spark.functions.udfs",
]


def _collect() -> tuple[dict, dict]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        mod = import_module(modname)
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {modname}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name not in getattr(mod, "QUERIES", {}):
                raise ValueError(f"oracle {name!r} in {modname} has no query")
            oracles[name] = sql
    return queries, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]
