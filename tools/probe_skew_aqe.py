"""Observe AQE's skew-join handling at scale (VERDICT r12 #4): run the
skew-sensitive headline queries on the uniform 64× fixture and its
hot-key remap (``make_hotkey_fixture.py``: ~50% of orders on one
customer, ~50% of lineitem on one part) and record

- wall time (min of two, bench methodology) on each fixture, and
- whether the FINAL adaptive plan shows skew-handled joins
  (``skew=true`` on the sort-merge join / ``AQEShuffleRead`` skewed
  readers), straight from the executed plan of the measured run.

The execution is driven by a 1-row xxhash64-sum over EVERY column of
the query's output, so (a) the captured QueryExecution IS the run that
was timed (a separate writer action would plan its own execution and
report ``isFinalPlan=false``) and (b) Catalyst cannot prune the
query's own aggregate expressions — a bare ``groupBy().count()``
consumer lets the optimizer drop the aggregate FUNCTIONS (only group
existence is needed) and silently measures a cheaper query.

Usage:
    python tools/probe_skew_aqe.py [--uniform=/tmp/sf_scale64]
        [--hot=/tmp/sf_scale64_hot] [--queries=master_join,...]
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    uniform = "/tmp/sf_scale64"
    hot = "/tmp/sf_scale64_hot"
    names = [
        "master_join",
        "b_customer_retention",
        "b_profitability_kpi",
        "b_product_performance",
    ]
    for a in sys.argv[1:]:
        if a.startswith("--uniform="):
            uniform = a.split("=", 1)[1]
        elif a.startswith("--hot="):
            hot = a.split("=", 1)[1]
        elif a.startswith("--queries="):
            names = a.split("=", 1)[1].split(",")

    from datapipeline_gcp_spark import registry
    from datapipeline_gcp_spark.session import get_session

    spark = get_session(
        app_name="probe_skew_aqe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()

    from pyspark.sql import functions as F

    def consume_all(df):
        # reference every output column so no aggregate expression can
        # be pruned; count rides along for the row count. decimal(38,0)
        # sum — a raw bigint hash sum overflows under ANSI (the same
        # gotcha the sketch oracles hit, SCALE.md).
        h = F.sum(
            F.xxhash64(*[F.col(c) for c in df.columns]).cast("decimal(38,0)")
        )
        return df.select(h.alias("h"), F.count(F.lit(1)).alias("n"))

    def run_once(fn, sf):
        agg = consume_all(fn(spark, sf))
        t0 = time.monotonic()
        n = agg.collect()[0]["n"]
        wall = time.monotonic() - t0
        plan = agg._jdf.queryExecution().executedPlan().toString()
        return n, wall, plan

    print(
        "| query | fixture | rows | wall s | skew joins | skewed reads "
        "| join strategies |"
    )
    print("|---|---|---|---|---|---|---|")
    for name in names:
        fn = queries[name]
        consume_all(fn(spark, "/root/testdata/sf0.01")).collect()  # warm
        for label, sf in (("uniform64x", uniform), ("hotkey64x", hot)):
            best, rows, plan = float("inf"), None, ""
            for _ in range(2):
                n, wall, p = run_once(fn, sf)
                if wall < best:
                    best, rows, plan = wall, n, p
            skew_joins = len(re.findall(r"skew=true", plan))
            skew_reads = len(re.findall(r"AQEShuffleRead.*skewed", plan))
            joins = sorted(
                {
                    m.group(0)
                    for m in re.finditer(
                        r"(BroadcastHashJoin|SortMergeJoin\S*|"
                        r"ShuffledHashJoin|BroadcastNestedLoopJoin)",
                        plan,
                    )
                }
            )
            print(
                f"| {name} | {label} | {rows:,} | {best:.2f} | "
                f"{skew_joins} | {skew_reads} | {'+'.join(joins)} |"
            )
            sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
