"""Per-query wall-clock budget — the TimeLimitingCollector /
TimeLimitingBulkScorer analog (clt/search/time_limiting_collector.rs,
time_limiting_bulk_scorer.rs [stubs]; Lucene public semantics: a
collector wrapper that raises TimeExceededException once the clock
passes the budget, with the timer checked at collection boundaries).

Spark mapping: the query runs in a worker thread that owns a dedicated
JOB GROUP (thread-local under PySpark pinned-thread mode), so ALL Spark
jobs the query launches — planning collects, decode kernels, the final
TakeOrderedAndProject — belong to that group. When the budget elapses,
``cancelJobGroup`` interrupts the running stages cluster-wide (the
100-TB escape hatch: a runaway scan stops occupying executors) and the
caller gets ``TimeExceededException``. Driver-path queries hold no Spark
jobs to cancel, but they are bounded by construction
(DRIVER_EXEC_MAX_POSTINGS) and the elapsed check still raises at the
next boundary — exactly Lucene's collect-boundary granularity.
"""

from __future__ import annotations

import threading
import time
import uuid


class TimeExceededException(Exception):
    """Raised when a time-limited search passes its budget. Mirrors
    Lucene's TimeExceededException: carries the budget and how long the
    query had actually run when the limit was enforced."""

    def __init__(self, timeout_ms: float, elapsed_ms: float):
        self.timeout_ms = timeout_ms
        self.elapsed_ms = elapsed_ms
        super().__init__(
            f"query exceeded its time budget: {elapsed_ms:.0f} ms elapsed "
            f"> {timeout_ms:.0f} ms allowed"
        )


def _is_cancellation(exc: BaseException) -> bool:
    """True only for errors that look like a Spark job-group cancel
    (Py4JJavaError / SparkException text mentioning a cancelled job or
    killed stage) — the signatures ``cancelJobGroup`` produces."""
    text = f"{type(exc).__name__}: {exc}".lower()
    return any(
        marker in text
        for marker in ("cancelled", "canceled", "killed", "jobgroup", "job group")
    )


def run_with_time_budget(
    spark, fn, timeout_ms: float, description: str = "query", greedy: bool = False
):
    """Run ``fn()`` under a wall-clock budget. fn executes in a worker
    thread whose Spark jobs are tagged with a one-shot job group; on
    timeout the group is cancelled (interruptOnCancel) and
    TimeExceededException raises in the caller. ``greedy`` mirrors
    Lucene's greedy TimeLimitingCollector: work that COMPLETED past the
    deadline still returns its result instead of raising (an in-flight
    overrun is cancelled either way)."""
    sc = spark.sparkContext
    gid = f"lrs-timelimit-{uuid.uuid4().hex[:12]}"
    result: list = []
    err: list[BaseException] = []

    def run():
        try:
            sc.setJobGroup(gid, f"time-limited {description}", interruptOnCancel=True)
            result.append(fn())
        except BaseException as e:  # noqa: BLE001 — reraised in caller
            err.append(e)

    t0 = time.monotonic()
    worker = threading.Thread(target=run, daemon=True, name=gid)
    worker.start()
    worker.join(timeout_ms / 1000.0)
    if worker.is_alive():
        sc.cancelJobGroup(gid)
        # give the cancellation a moment to unwind the worker's collect
        worker.join(10.0)
        raise TimeExceededException(timeout_ms, (time.monotonic() - t0) * 1000.0)
    if err:
        cause = err[0]
        # a cancel racing a finishing job also surfaces as a Spark error;
        # normalize ONLY errors identifiable as job cancellation to
        # TimeExceeded — a genuine failure (bad query, OOM, data error)
        # that merely completed late must surface as itself
        elapsed = (time.monotonic() - t0) * 1000.0
        if elapsed > timeout_ms and _is_cancellation(cause):
            raise TimeExceededException(timeout_ms, elapsed) from cause
        raise cause
    elapsed = (time.monotonic() - t0) * 1000.0
    if elapsed > timeout_ms and not greedy:
        # collect-boundary semantics: the work finished but past budget —
        # Lucene's non-greedy collector still raises
        raise TimeExceededException(timeout_ms, elapsed)
    return result[0]
