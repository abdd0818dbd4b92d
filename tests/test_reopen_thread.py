"""ControlledRealTimeReopenThread analog (search/reopen_thread.py —
clt/search/controlled_real_time_reopen_thread.rs [stub]; Lucene
semantics): wait_for_generation unblocks after the min-stale refresh
that covers a fresh commit, the max-stale cadence publishes commits
nobody waits on, and close() wakes blocked waiters."""

import threading
import time

import pytest
from pyspark.sql import functions as F

from lucene_rust_spark.oracle.bm25 import term_query


@pytest.fixture()
def managed(spark, tmp_path):
    from lucene_rust_spark.corpus import gen_corpus_spark
    from lucene_rust_spark.index.build import build_index
    from lucene_rust_spark.search.searcher_manager import SearcherManager

    out = str(tmp_path / "idx")
    src = gen_corpus_spark(spark, 180, 4).persist()
    b0 = src.filter(F.crc32(F.col("path")) % 3 != 0)
    b1 = src.filter(F.crc32(F.col("path")) % 3 == 0)
    build_index(spark, b0, out, num_partitions=4)
    mgr = SearcherManager(spark, out)
    yield mgr, out, b0, b1
    mgr.close()
    src.unpersist()


def test_wait_for_generation_serves_fresh_commit(spark, managed):
    from lucene_rust_spark.search.reopen_thread import ControlledRealTimeReopenThread
    from lucene_rust_spark.streaming.incremental import append_batch

    mgr, out, b0, b1 = managed
    # max stale is LONG: only the waiter-triggered min-stale path can
    # publish the append within the test timeout
    rt = ControlledRealTimeReopenThread(
        mgr, target_max_stale_sec=300.0, target_min_stale_sec=0.01
    )
    rt.start()
    try:
        m = append_batch(spark, b1, out, epoch=0, num_partitions=4)
        gen = int(m["generation"])
        assert mgr.current_generation < gen  # not yet visible
        assert rt.wait_for_generation(gen, timeout=120) is True
        assert mgr.current_generation >= gen
        with mgr.searcher() as s:
            n_all = s.count(term_query("merge"))
        full = b0.unionByName(b1).select(
            F.filter(F.split(F.lower("content"), r"(?U)\W+"), lambda x: x != "").alias("t")
        )
        assert n_all == full.filter(F.array_contains("t", "merge")).count()
        # already-covered generation returns immediately
        assert rt.wait_for_generation(gen, timeout=0.001) is True
        # a generation nobody committed times out False (no hang)
        assert rt.wait_for_generation(gen + 50, timeout=0.2) is False
    finally:
        rt.close()


def test_max_stale_refresh_without_waiters(spark, managed):
    from lucene_rust_spark.search.reopen_thread import ControlledRealTimeReopenThread
    from lucene_rust_spark.streaming.incremental import append_batch

    mgr, out, _b0, b1 = managed
    rt = ControlledRealTimeReopenThread(
        mgr, target_max_stale_sec=0.2, target_min_stale_sec=0.05
    )
    rt.start()
    try:
        m = append_batch(spark, b1, out, epoch=0, num_partitions=4)
        gen = int(m["generation"])
        deadline = time.monotonic() + 120
        while mgr.current_generation < gen and time.monotonic() < deadline:
            time.sleep(0.05)
        assert mgr.current_generation >= gen  # published by cadence alone
    finally:
        rt.close()


def test_close_wakes_blocked_waiters(spark, managed):
    from lucene_rust_spark.search.reopen_thread import ControlledRealTimeReopenThread

    mgr, _out, _b0, _b1 = managed
    rt = ControlledRealTimeReopenThread(
        mgr, target_max_stale_sec=300.0, target_min_stale_sec=0.01
    )
    rt.start()
    errors: list[BaseException] = []

    def waiter():
        try:
            rt.wait_for_generation(mgr.current_generation + 99, timeout=60)
        except RuntimeError as e:
            errors.append(e)

    t = threading.Thread(target=waiter)
    t.start()
    time.sleep(0.3)
    rt.close()
    t.join(timeout=30)
    assert not t.is_alive()
    assert errors and "closed" in str(errors[0])


def test_min_stale_validation(spark, managed):
    from lucene_rust_spark.search.reopen_thread import ControlledRealTimeReopenThread

    mgr, _out, _b0, _b1 = managed
    with pytest.raises(ValueError):
        ControlledRealTimeReopenThread(
            mgr, target_max_stale_sec=0.1, target_min_stale_sec=0.5
        )
