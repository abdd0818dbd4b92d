"""Per-query time budget (TimeLimitingCollector /
TimeLimitingBulkScorer analog, clt/search/time_limiting_collector.rs):
a deliberately slow Spark job is cancelled cluster-wide and raises
TimeExceededException promptly; fast queries are unaffected; greedy
mode returns completed-but-late results."""

import time

import pytest

from lucene_rust_spark.search.timelimit import (
    TimeExceededException,
    run_with_time_budget,
)


def _slow_job(spark, seconds: float):
    """A real multi-task Spark job that sleeps per partition — the
    stand-in for a runaway 100-TB scan."""

    def run():
        def sleepy(it):
            time.sleep(seconds)
            yield sum(1 for _ in it)

        return spark.sparkContext.parallelize(range(64), 8).mapPartitions(sleepy).sum()

    return run


def test_slow_job_cancelled_and_raises(spark):
    t0 = time.monotonic()
    with pytest.raises(TimeExceededException) as e:
        run_with_time_budget(spark, _slow_job(spark, 30.0), timeout_ms=800)
    wall = time.monotonic() - t0
    assert e.value.timeout_ms == 800
    assert e.value.elapsed_ms >= 800
    # the 30 s job must NOT have been awaited: cancellation was real
    assert wall < 15.0, f"cancel took {wall:.1f}s — job group cancel ineffective"


def test_fast_fn_unaffected_and_errors_propagate(spark):
    assert run_with_time_budget(spark, lambda: 42, timeout_ms=5000) == 42

    with pytest.raises(ValueError, match="boom"):
        run_with_time_budget(
            spark, lambda: (_ for _ in ()).throw(ValueError("boom")), timeout_ms=5000
        )


def test_pure_python_overrun_raises(spark):
    """Driver-path shape: no Spark job to cancel, but the deadline still
    raises at the join boundary (Lucene's collect-boundary granularity)."""

    def late():
        time.sleep(0.35)
        return "done"

    with pytest.raises(TimeExceededException):
        run_with_time_budget(spark, late, timeout_ms=200)
    assert run_with_time_budget(spark, late, timeout_ms=20000, greedy=True) == "done"


def test_search_timed_fast_query_identical(searcher):
    q = {"type": "term", "term": "token"}
    want = searcher.search(q, 10)
    got = searcher.search_timed(q, 10, timeout_ms=60_000)
    assert got == want


def test_search_timed_distributed_query_times_out(searcher, monkeypatch):
    """Force the distributed plan and a tiny budget: the search must
    raise TimeExceededException rather than run to completion."""
    from lucene_rust_spark.oracle.bm25 import bool_query

    monkeypatch.setattr(searcher, "DRIVER_EXEC_MAX_POSTINGS", 0)
    q = bool_query(should=["token", "value"])
    with pytest.raises(TimeExceededException):
        searcher.search_timed(q, 10, timeout_ms=1)
