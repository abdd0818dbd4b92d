"""SearcherManager lifecycle (search/searcher_manager.py —
clt/search/searcher_manager.rs, reference_manager.rs,
controlled_real_time_reopen_thread.rs [stubs]; Lucene ReferenceManager
semantics): acquire/release refcounting, maybeRefresh generation swap,
pinned old-generation correctness under concurrent appends (the
VERDICT r5 item 6 done criterion), and the prune deletion policy."""

import threading

import pytest
from pyspark.sql import functions as F

from lucene_rust_spark.oracle.bm25 import term_query


@pytest.fixture()
def managed_index(spark, tmp_path):
    from lucene_rust_spark.corpus import gen_corpus_spark
    from lucene_rust_spark.index.build import build_index

    out = str(tmp_path / "idx")
    src = gen_corpus_spark(spark, 240, 4).persist()
    b0 = src.filter(F.crc32(F.col("path")) % 3 != 0)
    b1 = src.filter(F.crc32(F.col("path")) % 3 == 0)
    build_index(spark, b0, out, num_partitions=4)
    yield out, b0, b1
    src.unpersist()


def _true_count(batch_df, term: str) -> int:
    toks = batch_df.select(
        F.filter(
            F.split(F.lower("content"), r"(?U)\W+"), lambda x: x != ""
        ).alias("t")
    )
    return toks.filter(F.array_contains("t", term)).count()


def test_acquired_searcher_pins_generation(spark, managed_index):
    from lucene_rust_spark.search.searcher_manager import SearcherManager
    from lucene_rust_spark.streaming.incremental import append_batch

    out, b0, b1 = managed_index
    mgr = SearcherManager(spark, out, cache=True)
    term = "merge"
    n0 = _true_count(b0, term)
    n_all = n0 + _true_count(b1, term)

    s1 = mgr.acquire()
    gen1 = mgr.current_generation
    assert s1.count(term_query(term)) == n0

    append_batch(spark, b1, out, epoch=0, num_partitions=4)
    assert mgr.maybe_refresh() is True
    assert mgr.current_generation == gen1 + 1

    s2 = mgr.acquire()
    assert s2 is not s1
    assert s2.count(term_query(term)) == n_all
    # the in-flight reader keeps its generation: same result as before
    # the append, even though the manifest moved on
    assert s1.count(term_query(term)) == n0
    assert mgr.pinned_generations() == [gen1, gen1 + 1]

    mgr.release(s1)
    assert mgr.pinned_generations() == [gen1 + 1]
    mgr.release(s2)
    mgr.close()


def test_concurrent_queries_during_append_and_refresh(spark, managed_index):
    """The r5 directive's done criterion: queries running while an
    append + refresh publishes generation N+1 must each return the
    exact answer for the generation they acquired."""
    from lucene_rust_spark.search.searcher_manager import SearcherManager
    from lucene_rust_spark.streaming.incremental import append_batch

    out, b0, b1 = managed_index
    mgr = SearcherManager(spark, out, cache=False)
    term = "merge"
    expected = {
        1: _true_count(b0, term),
        2: _true_count(b0, term) + _true_count(b1, term),
    }
    base_gen = mgr.current_generation
    results: list[tuple[int, int]] = []
    errors: list[BaseException] = []
    stop = threading.Event()

    def worker():
        try:
            while not stop.is_set():
                with mgr.searcher() as s:
                    g = int(s.manifest["generation"])
                    results.append((g, s.count(term_query(term))))
        except BaseException as e:  # noqa: BLE001 — surfaced in the assert
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(2)]
    for t in threads:
        t.start()
    append_batch(spark, b1, out, epoch=0, num_partitions=4)
    mgr.maybe_refresh_blocking()
    # wait until at least one query completed on the NEW generation
    import time

    deadline = time.monotonic() + 120
    while (
        not any(g == base_gen + 1 for g, _n in list(results))
        and not errors
        and time.monotonic() < deadline
    ):
        time.sleep(0.05)
    stop.set()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    gens = {g for g, _n in results}
    assert gens <= {base_gen, base_gen + 1}
    for g, n in results:
        assert n == expected[g - base_gen + 1], (g, n)
    # at least one query completed on each side of the swap
    assert (base_gen + 1) in gens
    mgr.close()


def test_refcounting_and_close_semantics(spark, managed_index):
    from lucene_rust_spark.search.searcher_manager import (
        AlreadyClosedError,
        SearcherManager,
    )

    out, _b0, _b1 = managed_index
    mgr = SearcherManager(spark, out)
    s = mgr.acquire()
    with pytest.raises(ValueError):
        mgr.release(object())
    mgr.close()
    with pytest.raises(AlreadyClosedError):
        mgr.acquire()
    # outstanding reference survives close; release is still honored
    assert s.count(term_query("merge")) >= 0
    mgr.release(s)
    mgr.close()  # idempotent


def test_refresh_listener_callbacks(spark, managed_index):
    from lucene_rust_spark.search.searcher_manager import SearcherManager
    from lucene_rust_spark.streaming.incremental import append_batch

    out, _b0, b1 = managed_index
    mgr = SearcherManager(spark, out)
    calls = []

    class L:
        def before_refresh(self):
            calls.append("before")

        def after_refresh(self, did):
            calls.append(("after", did))

    mgr.add_listener(L())
    mgr.maybe_refresh_blocking()  # no new generation: no callbacks
    assert calls == []
    append_batch(spark, b1, out, epoch=0, num_partitions=4)
    assert mgr.maybe_refresh() is True
    assert calls == ["before", ("after", True)]
    mgr.close()


def test_prune_keeps_pinned_and_current_generations(spark, managed_index):
    import glob
    import os

    from lucene_rust_spark.search.searcher_manager import SearcherManager
    from lucene_rust_spark.streaming.incremental import append_batch

    out, _b0, b1 = managed_index
    half = b1.filter(F.crc32(F.col("path")) % 2 == 0)
    rest = b1.filter(F.crc32(F.col("path")) % 2 != 0)
    mgr = SearcherManager(spark, out)

    append_batch(spark, half, out, epoch=0, num_partitions=4)
    mgr.maybe_refresh_blocking()
    s_mid = mgr.acquire()  # pins the mid generation (terms_g2)
    mid_terms = s_mid.manifest["terms_dir"]
    append_batch(spark, rest, out, epoch=1, num_partitions=4)
    mgr.maybe_refresh_blocking()
    s_cur = mgr.acquire()
    cur_terms = s_cur.manifest["terms_dir"]
    mgr.release(s_cur)
    assert mid_terms != cur_terms

    removed = mgr.prune()
    names = {os.path.basename(d) for d in removed}
    assert mid_terms not in names and cur_terms not in names
    assert os.path.isdir(os.path.join(out, mid_terms))

    mgr.release(s_mid)
    removed = mgr.prune()
    assert mid_terms in {os.path.basename(d) for d in removed}
    assert not os.path.isdir(os.path.join(out, mid_terms))
    assert os.path.isdir(os.path.join(out, cur_terms))
    # the surviving current searcher still answers after the prune
    with mgr.searcher() as s:
        assert s.count(term_query("merge")) > 0
    mgr.close()


def test_live_field_values(spark, managed_index):
    """LiveFieldValues (clt/search/live_field_values.rs): get-by-key is
    real-time across the refresh gap — RAM window before refresh, the
    searcher after; tracked deletes mask older searcher hits; a no-op
    refresh still drops the old window."""
    from lucene_rust_spark.search.live_values import LiveFieldValues
    from lucene_rust_spark.search.searcher_manager import SearcherManager
    from lucene_rust_spark.streaming.incremental import append_batch

    out, b0, b1 = managed_index
    mgr = SearcherManager(spark, out, cache=True)

    def lookup(searcher, path):
        row = (
            searcher.docmap.filter(F.col("path") == path)
            .select("lang").take(1)
        )
        return row[0]["lang"] if row else None

    lfv = LiveFieldValues(mgr, lookup)

    # searcher fallback: a doc already searchable resolves via docmap
    known = b0.select("path", "lang").first()
    assert lfv.get(known["path"]) == known["lang"]

    # index a new batch; the writer tracks values BEFORE any refresh
    new_rows = b1.select("path", "lang").collect()
    for r in new_rows:
        lfv.add(r["path"], r["lang"])
    append_batch(spark, b1, out, epoch=0, num_partitions=4)

    # pre-refresh: searcher can't see them, LiveFieldValues can
    s = mgr.acquire()
    try:
        assert s.docmap.filter(F.col("path") == new_rows[0]["path"]).count() == 0
    finally:
        mgr.release(s)
    assert lfv.get(new_rows[0]["path"]) == new_rows[0]["lang"]
    assert lfv.size() == len(new_rows)

    # tracked delete masks the value even though b0 still matches it
    lfv.delete(known["path"])
    assert lfv.get(known["path"]) is None
    lfv.add(known["path"], known["lang"])  # restore

    # refresh: the RAM window drains, the searcher takes over seamlessly
    mgr.maybe_refresh_blocking()
    assert lfv.size() == 0
    assert lfv.get(new_rows[0]["path"]) == new_rows[0]["lang"]
    # a no-op refresh keeps everything consistent
    mgr.maybe_refresh_blocking()
    assert lfv.get(known["path"]) == known["lang"]
    lfv.close()
    mgr.close()
