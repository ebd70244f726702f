"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no
driver-side collection) so the number measures the Spark plan, not
pandas conversion. A warmup pass on sf0.001 first touches every code
path so JVM/codegen startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datapipeline_gcp_spark import registry
from datapipeline_gcp_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# Warm at sf0.01, not sf0.001: tiny inputs don't push hot generated
# methods over the C2 JIT threshold, so the first heavy timed queries
# were eating multi-second compile pauses (measured: same query 12s
# first-run vs 1.8s warmed). sf0.01 costs ~1 min more warmup and makes
# per-query timings reflect plans, not JVM state.
WARMUP_DIR = "/root/testdata/sf0.01"

#: Headline set: the flagship spine + every aggregate family + the widest
#: scans. Kept explicit (not "all registry queries") so bench timings stay
#: comparable across rounds as coverage grows.
HEADLINE = [
    "master_join",
    "b_sales_kpi",
    "b_performance_metrics",
    "b_customer_retention",
    "b_profitability_kpi",
    "b_product_performance",
    "cte_revenue_report",
    "join_composite_key",
    "scan_filter_project",
    "topk_per_group",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_session(app_name="bench")
    queries = registry.all_queries()
    names = [n for n in HEADLINE if n in queries]
    # extend with any registered queries not in the fixed headline list
    names += [n for n in sorted(queries) if n not in names]

    if os.path.isdir(WARMUP_DIR):
        for name in names:
            try:
                materialize(queries[name](spark, WARMUP_DIR))
            except Exception:
                pass

    # Min of two timed runs per query: a single pass is hostage to JIT
    # compilation pauses, GC churn from the preceding queries, and
    # noisy-neighbor CPU on shared hosts (observed: identical plans
    # swinging 2 s ↔ 14 s between full-bench passes while solo runs stay
    # flat). The min is the standard noise-floor estimator and reflects
    # the plan, which is what this bench exists to measure.
    timings: dict[str, float] = {}
    for name in names:
        best = -1.0
        try:
            for _ in range(2):
                t0 = time.time()
                materialize(queries[name](spark, SF_DIR))
                took = round(time.time() - t0, 3)
                best = took if best < 0 else min(best, took)
            timings[name] = best
        except Exception as ex:  # a failing query must not kill the bench
            print(f"bench: {name} failed: {ex}", file=sys.stderr)
            timings[name] = -1.0

    ok = {k: v for k, v in timings.items() if v >= 0}
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": round(sum(ok.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else SF_DIR,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
