"""Time individual registry queries at a given sf (bench-identical
methodology: sf0.01 warmup, then min-of-two noop materializations).

Usage: python tools/time_query.py name [name ...] [--sf DIR]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--sf")]
    sf = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    from datapipeline_gcp_spark import registry
    from datapipeline_gcp_spark.session import get_session

    # bench-identical session (tuned confs), so numbers here are
    # comparable to BENCH_DETAIL.json
    spark = get_session(
        app_name="time_query",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    for name in args:
        fn = queries[name]
        fn(spark, "/root/testdata/sf0.01").write.format("noop").mode(
            "overwrite"
        ).save()
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        print(f"{name}: {best:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
