"""Dump ``explain('formatted')`` of named registry queries to individual
files — the before/after plan evidence the optimization rounds commit
(``plans/r13/<query>_{before,after}.txt``).

Usage:
    python tools/dump_plan_files.py --out=plans/r13 --suffix=_before name [name ...]
    python tools/dump_plan_files.py --out=plans/r13 --suffix=_before --all

Mostly explain-only: builds each DataFrame and prints its physical plan
without running the FINAL query — but queries whose builders run eager
localCheckpoint/collect fixpoints (kmeans_lloyd, ann_ivf_topk, the
dedup_clusters/connected-components family) DO execute real jobs during
DataFrame construction, so ``--all`` is not free. Streaming gates and
other action-driven queries are skipped with a note — their evidence is
the foreachBatch plan shape captured by their own tests (ADVICE r13).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: queries whose callable RUNS jobs as a side effect (streaming gates,
#: pipeline e2e) — explain() would execute them; they are skipped unless
#: explicitly named.
_ACTION_DRIVEN_PREFIXES = ("events_stream_", "multimodal_stream_", "dedup_stream_")


def main() -> None:
    out_dir = "plans/r13"
    suffix = "_before"
    sf = "/root/testdata/sf0.1"
    names: list[str] = []
    dump_all = False
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_dir = a.split("=", 1)[1]
        elif a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
        elif a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        elif a == "--all":
            dump_all = True
        else:
            names.append(a)

    from datapipeline_gcp_spark import registry
    from datapipeline_gcp_spark.session import get_session

    spark = get_session(
        app_name="dump_plan_files",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    if dump_all:
        names = [
            n
            for n in sorted(queries)
            if not n.startswith(_ACTION_DRIVEN_PREFIXES)
        ]
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = queries[name](spark, sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as ex:  # noqa: BLE001 — record the failure, keep going
            plan = f"(explain failed: {ex})\n"
        path = os.path.join(out_dir, f"{name}{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(path)
    spark.stop()


if __name__ == "__main__":
    main()
