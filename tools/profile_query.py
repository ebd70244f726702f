"""Profile registry queries: run each with the Spark UI on, then pull
per-stage wall/metrics and the number of jobs from the UI REST API —
the measure-first evidence the optimization rounds record (guide §1).

Usage: python tools/profile_query.py name [name ...] [--sf=DIR] [--runs=2]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf = "/root/testdata/sf0.1"
    runs = 2
    names: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        elif a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        else:
            names.append(a)

    from datapipeline_gcp_spark import registry
    from datapipeline_gcp_spark.session import get_session

    os.environ["SPARK_UI"] = "true"
    spark = get_session(
        app_name="profile_query",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    queries = registry.all_queries()

    def rest(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    for name in names:
        fn = queries[name]
        # warmup at sf0.01 (JIT) exactly like bench.py
        fn(spark, "/root/testdata/sf0.01").write.format("noop").mode(
            "overwrite"
        ).save()
        jobs_before = {j["jobId"] for j in rest("/jobs")}
        stages_before = {s["stageId"] for s in rest("/stages")}
        best = float("inf")
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.monotonic()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            took = time.monotonic() - t0
            best = min(best, took)
        spark.sparkContext.setJobDescription(None)
        jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
        stages = [s for s in rest("/stages") if s["stageId"] not in stages_before]
        n_tasks = sum(s.get("numCompleteTasks", 0) for s in stages)
        exec_ms = sum(s.get("executorRunTime", 0) for s in stages)
        cpu_ms = sum(s.get("executorCpuTime", 0) for s in stages) / 1e6
        shuf_w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        print(
            f"{name}: best={best:.2f}s jobs={len(jobs)} stages={len(stages)} "
            f"tasks={n_tasks} execRun={exec_ms/1000.0:.1f}s "
            f"execCpu={cpu_ms/1000.0:.1f}s shufWrite={shuf_w/1e6:.1f}MB "
            f"(all runs incl. warm structures)"
        )
        slow = sorted(
            stages, key=lambda s: s.get("executorRunTime", 0), reverse=True
        )[:8]
        for s in slow:
            print(
                f"    stage {s['stageId']}: run={s.get('executorRunTime',0)/1000.0:.2f}s "
                f"tasks={s.get('numCompleteTasks',0)} "
                f"in={s.get('inputBytes',0)/1e6:.1f}MB "
                f"sr={s.get('shuffleReadBytes',0)/1e6:.2f}MB "
                f"sw={s.get('shuffleWriteBytes',0)/1e6:.2f}MB  "
                f"{s.get('name','')[:70]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
