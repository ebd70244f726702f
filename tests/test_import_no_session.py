"""The registry must import with NO SparkSession alive.

Spark 4 Column construction (any `F.foo(...)` at module scope) raises
SESSION_OR_CONTEXT_NOT_EXISTS when no session exists yet.  The external
driver happens to build its session before importing `__spark_entry__`,
so such a bug is invisible to driver_sim — but it breaks pytest
collection, tooling, and any embedder that imports first.  Regression
for the r10 `_ASCII_ONLY` module-level Column (functions/udfs.py).

Run in a subprocess: the test session itself may already have a JVM,
which would mask the failure in-process.
"""

import subprocess
import sys


def test_registry_imports_without_spark_session():
    code = (
        "from datapipeline_gcp_spark import registry\n"
        "qs = registry.all_queries()\n"
        "os_ = registry.all_oracles()\n"
        "assert len(qs) >= 180 and set(os_) <= set(qs), (len(qs), len(os_))\n"
        "print('OK', len(qs))\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert proc.stdout.startswith("OK")
