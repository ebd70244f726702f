"""Simulate the external driver: vanilla SparkSession (NO engine confs —
the real driver builds its own session), import the contract module by
file path, run entry() smoke + every queries() entry vs its oracle_sql()
in DuckDB at sf0.01 with row-count + schema + order-insensitive value
comparison (floats via repr — the engine guarantees bitwise determinism).

Usage:  cd /tmp && python /root/repo/tools/driver_sim.py
        SIM_SF=/root/testdata/sf0.1 python tools/driver_sim.py
Run from OUTSIDE the repo dir to catch worker-import/pickling issues.
Exit code 0 iff everything matches. This is the project verify harness.
"""

import datetime as dt
import importlib.util
import math
import os
import sys
import time

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def canon(v):
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, float):
        return "∅" if math.isnan(v) else repr(v)
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, dt.datetime):
        if v.time() == dt.time(0, 0) and v.microsecond == 0:
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return str(v)


def rows(pdf):
    cols = sorted(pdf.columns)
    return sorted(tuple(canon(v) for v in r) for r in pdf[cols].itertuples(index=False))


def main():
    # vanilla session — the driver's, not the engine's. SIM_DRIVER_MEM
    # (off by default) sizes the single local-mode JVM heap for
    # larger-SF probes: the default 1g fits the sf0.01 gate but dies on
    # sf0.1 checkpoints. Heap size is a host property, not a semantic
    # conf — the no-tuned-confs principle is about the latter.
    b = SparkSession.builder.master("local[32]").appName("driver-sim")
    if os.environ.get("SIM_DRIVER_MEM"):
        b = b.config("spark.driver.memory", os.environ["SIM_DRIVER_MEM"])
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    mod = load_entry()

    t0 = time.time()
    n = mod.entry(spark).count()
    print(f"SMOKE entry(): {n} rows in {time.time()-t0:.1f}s -> {'OK' if n > 0 else 'FAIL'}")

    sf = os.environ.get("SIM_SF", "/root/testdata/sf0.01")
    con = duckdb.connect()
    for t in TABLES:
        # the manyfiles variant stores each table as a DIRECTORY of
        # part files (Spark reads those natively; DuckDB needs a glob)
        p = f"{sf}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")

    qs, os_ = mod.queries(), mod.oracle_sql()
    only = {n for n in os.environ.get("SIM_ONLY", "").split(",") if n}
    if only:
        qs = {n: f for n, f in qs.items() if n in only}
    fails = 0
    matches = 0
    # membership comes from the oracle dict, not from successful
    # execution: an oracle-less query that raises must not be deducted
    # from the value-hash count as if it had one (ADVICE r4)
    oracle_less = [n for n in sorted(qs) if n not in os_]
    failures: list[str] = []
    for name in sorted(qs):
        t0 = time.time()
        try:
            spdf = qs[name](spark, sf).toPandas()
            if name not in os_:
                print(f"ROWS-ONLY {name}: {len(spdf)} rows ({time.time()-t0:.1f}s)")
                continue
            opdf = con.execute(os_[name]).df()
            problems = []
            if sorted(spdf.columns) != sorted(opdf.columns):
                problems.append(f"cols {sorted(spdf.columns)} vs {sorted(opdf.columns)}")
            elif len(spdf) != len(opdf):
                problems.append(f"rowcount {len(spdf)} vs {len(opdf)}")
            else:
                a, b = rows(spdf), rows(opdf)
                if a != b:
                    d = [(x, y) for x, y in zip(a, b) if x != y][:2]
                    problems.append(f"values differ, e.g. {d}")
            status = "MATCH" if not problems else "MISMATCH " + "; ".join(problems)
            if problems:
                fails += 1
                failures.append(name)
            else:
                matches += 1
            print(f"{status:9s} {name}: {len(spdf)} rows ({time.time()-t0:.1f}s)")
        except Exception as ex:
            fails += 1
            failures.append(name)
            print(f"ERROR     {name}: {str(ex)[:200]}")
    print(f"\n{'ALL MATCH' if fails == 0 else f'{fails} FAILURES'} out of {len(qs)} queries")
    # SIM_SUMMARY=path writes the machine-readable run record (the
    # repo commits one per round as VERIFY_LOCAL.json so "locally
    # verified" is an artifact, not a claim — VERDICT r3 #8).
    if os.environ.get("SIM_SUMMARY"):
        import json
        import subprocess

        # stamp the exact code the sweep ran on (VERDICT r8 #4: without
        # it, "refreshed on HEAD" needs git archaeology to audit)
        try:
            commit = subprocess.run(
                ["git", "-C", "/root/repo", "rev-parse", "HEAD"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip() or "unknown"
            dirty = bool(subprocess.run(
                ["git", "-C", "/root/repo", "status", "--porcelain"],
                capture_output=True, text=True, timeout=10,
            ).stdout.strip())
        except Exception:
            commit, dirty = "unknown", True
        with open(os.environ["SIM_SUMMARY"], "w") as fh:
            json.dump(
                {
                    "harness": "tools/driver_sim.py (vanilla local[32] session, DuckDB oracles)",
                    "commit": commit + ("+dirty" if dirty else ""),
                    "sf_dir": sf,
                    "tz": os.environ.get("TZ", "system"),
                    "entry_smoke_rows": n,
                    "queries_total": len(qs),
                    "value_hash_matches": matches,
                    # a crashed oracle-less query belongs in failures,
                    # not rows_only — listing it there would claim the
                    # weaker check completed when it never ran
                    "rows_only": [n for n in oracle_less if n not in failures],
                    "failures": failures,
                },
                fh,
                indent=1,
            )
            fh.write("\n")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
