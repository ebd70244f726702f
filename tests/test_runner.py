"""Unit tests for the pipeline runner's DAG semantics (SURVEY.md §2.9
O1-O4): ordering, group namespacing, retries, failure propagation,
parallel ready-set execution, and cycle detection."""

from __future__ import annotations

import threading
import time

import pytest

from datapipeline_gcp_spark.plans.runner import Pipeline


def _mk(events):
    def fn(name):
        def run(ctx):
            events.append(name)

        return run

    return fn


def test_topological_order_and_groups(spark):
    events = []
    fn = _mk(events)
    p = Pipeline("t")
    a = p.step("a", fn("a"))
    b = p.step("b", fn("b"), deps=[a], group="g1")
    c = p.step("c", fn("c"), deps=[a], group="g1")
    d = p.step("d", fn("d"), deps=[b, c])
    assert b == "g1.b" and c == "g1.c"
    res = p.run(spark)
    assert all(r.status == "success" for r in res.values())
    assert events[0] == "a" and events[-1] == "d"
    assert set(events[1:3]) == {"b", "c"}


def test_retries_then_success(spark):
    attempts = {"n": 0}

    def flaky(ctx):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")

    p = Pipeline("t")
    p.step("flaky", flaky, retries=2, retry_delay_s=0.0)
    res = p.run(spark)
    assert res["flaky"].status == "success"
    assert res["flaky"].attempts == 3


def test_failure_marks_dependents_but_not_siblings(spark):
    events = []
    fn = _mk(events)
    p = Pipeline("t")
    bad = p.step("bad", lambda c: 1 / 0, retries=0, retry_delay_s=0.0)
    dep = p.step("dep", fn("dep"), deps=[bad])
    dep2 = p.step("dep2", fn("dep2"), deps=[dep])
    ok = p.step("ok", fn("ok"))
    res = p.run(spark)
    assert res["bad"].status == "failed"
    assert "division" in res["bad"].error
    assert res["dep"].status == "upstream_failed"
    assert res["dep2"].status == "upstream_failed"
    assert res["ok"].status == "success"
    assert "dep" not in events and "dep2" not in events


def test_ready_steps_run_in_parallel(spark):
    barrier = threading.Barrier(3, timeout=10)

    def wait(ctx):
        barrier.wait()  # deadlocks unless all 3 run concurrently

    p = Pipeline("t", max_parallelism=4)
    for i in range(3):
        p.step(f"s{i}", wait)
    t0 = time.monotonic()
    res = p.run(spark)
    assert all(r.status == "success" for r in res.values())
    assert time.monotonic() - t0 < 8


def test_cycle_detection(spark):
    p = Pipeline("t")
    p.step("a", lambda c: None, deps=["b"])
    p.step("b", lambda c: None, deps=["a"])
    with pytest.raises(ValueError, match="cycle"):
        p.run(spark)


def test_unknown_dep_rejected(spark):
    p = Pipeline("t")
    p.step("a", lambda c: None, deps=["ghost"])
    with pytest.raises(ValueError, match="unknown"):
        p.run(spark)


def test_context_carries_run_date_and_config(spark):
    seen = {}

    def grab(ctx):
        seen["rd"] = ctx.run_date
        seen["cfg"] = ctx.config["k"]

    p = Pipeline("t")
    p.step("grab", grab)
    p.run(spark, run_date="20240102", config={"k": "v"})
    assert seen == {"rd": "20240102", "cfg": "v"}
