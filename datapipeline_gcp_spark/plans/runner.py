"""Pipeline runner — the engine's orchestration layer (SURVEY.md §2.9).

Replaces the reference's Airflow DAG semantics with a small in-process
runner:

- O1 named steps + dependency edges, fan-out/fan-in, parallel execution
  of ready steps (the reference runs its three ingestion TaskGroups and
  two business queries concurrently, ``datapipeline_gcp.py:449-451``;
  Spark actions are thread-safe, so ready steps run on a thread pool and
  the Spark scheduler interleaves their jobs).
- O2 groups — namespacing only (``group.step``), like Airflow TaskGroups.
- O3 barrier steps — any step with deps and no body.
- O4 retry policy — per-step retries with delay (reference default:
  1 retry / 60 s, ``datapipeline_gcp.py:38-44``; tests pass delay=0).
- O6 templated params — steps receive a ``Context`` with the run date
  (``{{ ds_nodash }}`` equivalent) and a config dict.

Steps are Python callables because in Spark the "task" is just the point
where a lazy plan is forced (a write); everything between writes is one
Catalyst plan. The runner deliberately does NOT re-implement a scheduler
— no queues, no cron; `run()` executes one DAG instance to completion
and reports per-step status.
"""

from __future__ import annotations

import datetime as dt
import threading
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from concurrent.futures import FIRST_COMPLETED, Future, ThreadPoolExecutor, wait


@dataclass
class Context:
    """Run-scoped parameters handed to every step."""

    spark: object
    run_date: str  # yyyymmdd, the reference's {{ ds_nodash }}
    config: dict = field(default_factory=dict)


@dataclass
class Step:
    name: str
    fn: Callable[[Context], object] | None  # None → barrier (O3)
    deps: tuple[str, ...] = ()
    retries: int = 1
    retry_delay_s: float = 60.0


@dataclass
class StepResult:
    name: str
    status: str  # success | failed | upstream_failed
    attempts: int = 0
    error: str | None = None
    duration_s: float = 0.0


class Pipeline:
    def __init__(self, name: str, max_parallelism: int = 4):
        self.name = name
        self._steps: dict[str, Step] = {}
        self._max_parallelism = max_parallelism

    def step(
        self,
        name: str,
        fn: Callable[[Context], object] | None = None,
        deps: tuple[str, ...] | list[str] = (),
        group: str | None = None,
        retries: int = 1,
        retry_delay_s: float = 60.0,
    ) -> str:
        """Register a step; returns its full name (``group.name``)."""
        full = f"{group}.{name}" if group else name
        if full in self._steps:
            raise ValueError(f"duplicate step {full!r}")
        self._steps[full] = Step(full, fn, tuple(deps), retries, retry_delay_s)
        return full

    def _validate(self) -> None:
        for s in self._steps.values():
            for d in s.deps:
                if d not in self._steps:
                    raise ValueError(f"step {s.name!r} depends on unknown {d!r}")
        # cycle check: Kahn
        indeg = {n: len(s.deps) for n, s in self._steps.items()}
        ready = [n for n, d in indeg.items() if d == 0]
        seen = 0
        while ready:
            n = ready.pop()
            seen += 1
            for m, s in self._steps.items():
                if n in s.deps:
                    indeg[m] -= 1
                    if indeg[m] == 0:
                        ready.append(m)
        if seen != len(self._steps):
            raise ValueError(f"cycle detected in pipeline {self.name!r}")

    def run(
        self,
        spark,
        run_date: str | None = None,
        config: dict | None = None,
    ) -> dict[str, StepResult]:
        """Execute the DAG; ready steps run in parallel. A failed step
        (after retries) marks its transitive dependents upstream_failed —
        independent branches keep running, like an Airflow DAG run."""
        self._validate()
        ctx = Context(
            spark=spark,
            run_date=run_date or dt.date.today().strftime("%Y%m%d"),
            config=config or {},
        )
        results: dict[str, StepResult] = {}
        lock = threading.Lock()
        pending = dict(self._steps)

        def runnable() -> list[Step]:
            """Pop and return steps whose deps all succeeded; steps with a
            failed dep are popped and marked upstream_failed in place."""
            ready = []
            for name in list(pending):
                s = pending[name]
                dep_results = [results.get(d) for d in s.deps]
                if any(r is not None and r.status != "success" for r in dep_results):
                    results[name] = StepResult(name, "upstream_failed")
                    pending.pop(name)
                elif all(r is not None and r.status == "success" for r in dep_results):
                    ready.append(pending.pop(name))
            return ready

        def execute(s: Step) -> StepResult:
            t0 = time.monotonic()
            attempts = 0
            while True:
                attempts += 1
                try:
                    if s.fn is not None:
                        s.fn(ctx)
                    return StepResult(
                        s.name, "success", attempts, None, time.monotonic() - t0
                    )
                except Exception as ex:
                    if attempts > s.retries:
                        return StepResult(
                            s.name, "failed", attempts, str(ex), time.monotonic() - t0
                        )
                    time.sleep(s.retry_delay_s)

        with ThreadPoolExecutor(max_workers=self._max_parallelism) as pool:
            futures: dict[Future, str] = {}
            while pending or futures:
                for s in runnable():
                    futures[pool.submit(execute, s)] = s.name
                if not futures:
                    # remaining steps can never become ready (should be
                    # unreachable given the cycle check + upstream marking)
                    for name in list(pending):
                        results[name] = StepResult(name, "upstream_failed")
                        pending.pop(name)
                    break
                done, _ = wait(futures, return_when=FIRST_COMPLETED)
                for f in done:
                    name = futures.pop(f)
                    with lock:
                        results[name] = f.result()
        return results
