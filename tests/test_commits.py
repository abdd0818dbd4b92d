"""Commit points + deletion policies + snapshots + lifetime manager.

Reference surfaces: clt/index/index_commit.rs, index_deletion_policy.rs,
keep_only_last_commit_deletion_policy.rs, no_deletion_policy.rs,
snapshot_deletion_policy.rs, persistent_snapshot_deletion_policy.rs,
index_file_deleter.rs, clt/search/searcher_lifetime_manager.rs [stubs;
Lucene 9 semantics]. Every commit writes commits/segments_<gen>.json with
the exact store-file snapshot; opening IndexSearcher(commit=N) reproduces
that generation's results exactly; the file deleter removes only what no
retained/pinned commit references."""

import os

import pytest
from pyspark.sql import functions as F

from lucene_rust_spark.oracle.bm25 import term_query


@pytest.fixture()
def gen_index(spark, tmp_path):
    """Index with 3 committed generations: build, append, delete."""
    from lucene_rust_spark.corpus import gen_corpus_spark
    from lucene_rust_spark.index.build import build_index
    from lucene_rust_spark.index.deletes import delete_by_term
    from lucene_rust_spark.streaming.incremental import append_batch

    out = str(tmp_path / "idx")
    src = gen_corpus_spark(spark, 240, 4).persist()
    b0 = src.filter(F.crc32(F.col("path")) % 3 != 0)
    b1 = src.filter(F.crc32(F.col("path")) % 3 == 0)
    build_index(spark, b0, out, num_partitions=4)
    append_batch(spark, b1, out, epoch=0, num_partitions=4)
    delete_by_term(spark, out, "merge")
    yield out, b0, b1
    src.unpersist()


def _true_count(batch_df, term: str) -> int:
    toks = batch_df.select(
        F.filter(
            F.split(F.lower("content"), r"(?U)\W+"), lambda x: x != ""
        ).alias("t")
    )
    return toks.filter(F.array_contains("t", term)).count()


def test_list_commits_and_file_names(spark, gen_index):
    from lucene_rust_spark.index.commits import list_commits

    out, b0, b1 = gen_index
    commits = list_commits(out)
    gens = [c.generation for c in commits]
    assert gens == sorted(gens) and len(gens) == 3
    assert commits[-1].is_latest and not commits[0].is_latest
    # file snapshots grow monotonically on the shared store dirs
    f0, f2 = set(commits[0].file_names()), set(commits[-1].file_names())
    assert f0 and f2
    postings0 = {f for f in f0 if f.startswith("postings")}
    postings2 = {f for f in f2 if f.startswith("postings")}
    assert postings0 < postings2  # the append added part files
    # the delete generation references a tombstone dir; older ones do not
    assert any(f.startswith("tombstones/") for f in f2)
    assert not any(f.startswith("tombstones/") for f in f0)
    # latest commit can never be marked deleted
    with pytest.raises(ValueError):
        commits[-1].delete()


def test_open_old_commit_reproduces_generation(spark, gen_index):
    from lucene_rust_spark.index.commits import list_commits
    from lucene_rust_spark.search.searcher import IndexSearcher

    out, b0, b1 = gen_index
    term = "merge"
    n0 = _true_count(b0, term)
    n_all = n0 + _true_count(b1, term)
    gens = [c.generation for c in list_commits(out)]

    s_build = IndexSearcher(spark, out, commit=gens[0])
    s_append = IndexSearcher(spark, out, commit=gens[1])
    s_live = IndexSearcher(spark, out)
    # gen0: pre-append corpus, no deletes
    assert s_build.count(term_query(term)) == n0
    assert s_build.doc_count == b0.count()
    # gen1: full corpus, delete not yet visible (its tombstone dir exists
    # on disk but is NOT in gen1's stamped tombstone_dirs)
    assert s_append.count(term_query(term)) == n_all
    # live: delete visible
    assert s_live.count(term_query(term)) == 0
    # commit searchers never refresh
    assert s_build.refresh() is False
    # top-k on the old commit scores positively
    hits = s_build.search(term_query("index"), k=5)
    assert hits and all(score > 0 for _, score in hits)


def test_open_missing_commit_raises(spark, gen_index):
    from lucene_rust_spark.search.searcher import IndexSearcher

    out, _, _ = gen_index
    with pytest.raises(FileNotFoundError):
        IndexSearcher(spark, out, commit=999)


def test_keep_only_last_commit_deleter(spark, gen_index):
    from lucene_rust_spark.index.commits import (
        IndexFileDeleter,
        KeepOnlyLastCommitDeletionPolicy,
        list_commits,
    )
    from lucene_rust_spark.search.searcher import IndexSearcher

    out, b0, b1 = gen_index
    term = "merge"
    before = list_commits(out)
    res = IndexFileDeleter(out, KeepOnlyLastCommitDeletionPolicy()).checkpoint()
    assert res["dropped_commits"] == [c.generation for c in before[:-1]]
    after = list_commits(out)
    assert [c.generation for c in after] == [before[-1].generation]
    # shared-dir files referenced by the latest commit survived the drop
    s = IndexSearcher(spark, out)
    assert s.count(term_query(term)) == 0  # delete applied, index intact
    assert s.count(term_query("index")) > 0
    # the old commits are no longer openable
    with pytest.raises(FileNotFoundError):
        IndexSearcher(spark, out, commit=before[0].generation)


def test_protected_generation_survives_checkpoint(spark, gen_index):
    from lucene_rust_spark.index.commits import IndexFileDeleter, list_commits
    from lucene_rust_spark.search.searcher import IndexSearcher

    out, b0, _ = gen_index
    gens = [c.generation for c in list_commits(out)]
    res = IndexFileDeleter(out).checkpoint(protected_generations=[gens[0]])
    assert gens[0] not in res["dropped_commits"]
    assert gens[1] in res["dropped_commits"]
    # the pinned generation still opens and answers correctly
    s0 = IndexSearcher(spark, out, commit=gens[0])
    assert s0.count(term_query("merge")) == _true_count(b0, "merge")


def test_merge_generation_files_reclaimed(spark, tmp_path):
    """After a full merge writes generation-suffixed dirs, dropping the
    pre-merge commit deletes the abandoned unsuffixed store files."""
    from lucene_rust_spark.corpus import gen_corpus_spark
    from lucene_rust_spark.index.build import build_index
    from lucene_rust_spark.index.commits import IndexFileDeleter, list_commits
    from lucene_rust_spark.index.merge import merge_segments
    from lucene_rust_spark.search.searcher import IndexSearcher

    out = str(tmp_path / "idx")
    src = gen_corpus_spark(spark, 160, 4)
    build_index(spark, src, out, num_partitions=4)
    n_idx = IndexSearcher(spark, out).count(term_query("index"))
    merge_segments(spark, out, fan_in=100)
    res = IndexFileDeleter(out).checkpoint()
    assert res["dropped_commits"]
    # the merged index still answers; the abandoned unsuffixed postings
    # dir (the merge wrote postings_g<gen>) is physically reclaimed
    s = IndexSearcher(spark, out)
    assert s.count(term_query("index")) == n_idx
    assert s.manifest.get("postings_dir", "postings") != "postings"
    p = os.path.join(out, "postings")
    assert not os.path.isdir(p) or not any(
        f.endswith(".parquet") for _, _, fs in os.walk(p) for f in fs
    ), "unreferenced postings store not reclaimed"


def test_no_deletion_policy_and_keep_last_n(spark, gen_index):
    from lucene_rust_spark.index.commits import (
        IndexFileDeleter,
        KeepLastNCommitsDeletionPolicy,
        NoDeletionPolicy,
        list_commits,
    )

    out, _, _ = gen_index
    assert IndexFileDeleter(out, NoDeletionPolicy()).checkpoint()[
        "dropped_commits"
    ] == []
    assert len(list_commits(out)) == 3
    res = IndexFileDeleter(out, KeepLastNCommitsDeletionPolicy(2)).checkpoint()
    assert len(res["dropped_commits"]) == 1
    assert len(list_commits(out)) == 2


def test_snapshot_deletion_policy(spark, gen_index):
    from lucene_rust_spark.index.commits import (
        IndexFileDeleter,
        SnapshotDeletionPolicy,
        list_commits,
    )
    from lucene_rust_spark.search.searcher import IndexSearcher

    out, b0, b1 = gen_index
    gens = [c.generation for c in list_commits(out)]
    policy = SnapshotDeletionPolicy()
    # pin the CURRENT latest; then a new commit arrives (delete_by_term)
    snap = policy.snapshot(out)
    assert snap.generation == gens[-1]
    from lucene_rust_spark.index.deletes import delete_by_term

    delete_by_term(spark, out, "index")
    deleter = IndexFileDeleter(out, policy)
    res = deleter.checkpoint()
    kept = [c.generation for c in list_commits(out)]
    assert snap.generation in kept  # snapshot survived the primary policy
    assert kept == sorted({snap.generation, max(kept)})
    # snapshotted commit still opens with its pre-second-delete view
    s = IndexSearcher(spark, out, commit=snap.generation)
    assert s.count(term_query("index")) > 0
    # release + re-checkpoint drops it
    policy.release(snap)
    res2 = deleter.checkpoint()
    assert snap.generation in res2["dropped_commits"]
    with pytest.raises(ValueError):
        policy.release(snap.generation)


def test_persistent_snapshots_survive_restart(spark, gen_index):
    from lucene_rust_spark.index.commits import (
        IndexFileDeleter,
        PersistentSnapshotDeletionPolicy,
        list_commits,
    )

    out, _, _ = gen_index
    p1 = PersistentSnapshotDeletionPolicy(out)
    snap = p1.snapshot()
    # "restart": a fresh policy instance reloads the refcounts from disk
    p2 = PersistentSnapshotDeletionPolicy(out)
    assert p2.snapshotted_generations() == [snap.generation]
    IndexFileDeleter(out, p2).checkpoint()
    assert snap.generation in [c.generation for c in list_commits(out)]
    p2.release(snap.generation)
    p3 = PersistentSnapshotDeletionPolicy(out)
    assert p3.snapshotted_generations() == []


def test_searcher_lifetime_manager_paging(spark, gen_index):
    """The paging-consistency flow: record the page-1 view, publish newer
    generations, acquire(token) serves page 2 from the SAME view."""
    from lucene_rust_spark.index.commits import list_commits
    from lucene_rust_spark.search.lifetime import (
        PruneByAge,
        SearcherLifetimeManager,
    )
    from lucene_rust_spark.search.searcher import IndexSearcher

    out, b0, b1 = gen_index
    gens = [c.generation for c in list_commits(out)]
    mgr_now = [0.0]
    mgr = SearcherLifetimeManager(_clock=lambda: mgr_now[0])

    s_old = IndexSearcher(spark, out, commit=gens[1])  # pre-delete view
    token = mgr.record(s_old)
    assert token == gens[1]
    assert mgr.record(s_old) == token  # idempotent
    page1 = s_old.search(term_query("merge"), k=3)
    assert len(page1) == 3

    s_live = IndexSearcher(spark, out)  # delete visible here
    mgr.record(s_live)
    assert s_live.count(term_query("merge")) == 0

    got = mgr.acquire(token)
    assert got is s_old
    last_doc, last_score = page1[-1]
    page2 = got.search(
        term_query("merge"), k=3, search_after=(last_score, last_doc)
    )
    all_at_once = s_old.search(term_query("merge"), k=6)
    assert [d for d, _ in page1 + page2] == [d for d, _ in all_at_once]
    mgr.release(got)

    assert mgr.recorded_generations() == sorted({gens[1], gens[2]})
    # age out the old view; the newest recorded view is never pruned
    mgr_now[0] = 100.0
    assert mgr.prune(PruneByAge(50.0)) == [gens[1]]
    assert mgr.acquire(token) is None
    assert mgr.acquire(gens[2]) is s_live
    mgr.release(s_live)
    mgr.close()


def test_lifetime_release_after_prune(spark, gen_index):
    """An acquired searcher pruned mid-flight stays usable until its
    holder releases it (then closes) — the retired-ref drain."""
    from lucene_rust_spark.index.commits import list_commits
    from lucene_rust_spark.search.lifetime import (
        PruneByAge,
        SearcherLifetimeManager,
    )
    from lucene_rust_spark.search.searcher import IndexSearcher

    out, _, _ = gen_index
    gens = [c.generation for c in list_commits(out)]
    now = [0.0]
    mgr = SearcherLifetimeManager(_clock=lambda: now[0])
    s1 = IndexSearcher(spark, out, commit=gens[0])
    s2 = IndexSearcher(spark, out)
    t1 = mgr.record(s1)
    mgr.record(s2)
    held = mgr.acquire(t1)
    now[0] = 10.0
    assert mgr.prune(PruneByAge(5.0)) == [gens[0]]
    # still answers while held
    assert held.count(term_query("index")) >= 0
    mgr.release(held)  # drains the last ref; closes without error
    with pytest.raises(ValueError):
        mgr.release(held)


# --- two-phase commit / rollback / live commit data (r6) ---------------------


def test_two_phase_commit_and_rollback(spark, tmp_path):
    from lucene_rust_spark.corpus import gen_corpus_spark
    from lucene_rust_spark.index.build import build_index
    from lucene_rust_spark.index.manifest import (
        finish_commit,
        prepare_commit,
        read_commit,
        read_manifest,
        rollback_commit,
    )

    out = str(tmp_path / "idx")
    build_index(spark, gen_corpus_spark(spark, 60, 2), out, num_partitions=2)
    m = read_manifest(out)
    g0 = int(m["generation"])

    # prepare: nothing visible
    m2 = dict(m)
    m2["generation"] = g0 + 1
    m2["user_data"] = {"phase": "prepared"}
    gen = prepare_commit(out, m2)
    assert gen == g0 + 1
    assert int(read_manifest(out)["generation"]) == g0
    assert read_commit(out, gen) is None

    # rollback: the prepared generation vanishes without a trace
    assert rollback_commit(out, gen)
    assert not rollback_commit(out, gen)
    assert int(read_manifest(out)["generation"]) == g0

    # prepare again, then finish: now visible, commit point retained
    gen = prepare_commit(out, m2)
    finish_commit(out, gen)
    assert int(read_manifest(out)["generation"]) == gen
    assert read_commit(out, gen)["user_data"] == {"phase": "prepared"}


def test_set_live_commit_data(spark, gen_index):
    from lucene_rust_spark.index.commits import list_commits, set_live_commit_data
    from lucene_rust_spark.search.searcher import IndexSearcher

    out, b0, b1 = gen_index
    s_before = IndexSearcher(spark, out)
    n = s_before.count({"type": "term", "term": "window"})
    set_live_commit_data(out, {"checkpoint": "batch-42"})
    latest = list_commits(out)[-1]
    assert latest.user_data == {"checkpoint": "batch-42"}
    # metadata-only commit: search results unchanged
    assert IndexSearcher(spark, out).count({"type": "term", "term": "window"}) == n


def test_rollback_uncommitted_drops_writer_leftovers(spark, gen_index):
    import json
    import os

    from lucene_rust_spark.index.commits import rollback_uncommitted
    from lucene_rust_spark.index.manifest import check_index, read_manifest
    from lucene_rust_spark.search.searcher import IndexSearcher

    out, b0, b1 = gen_index
    m = read_manifest(out)
    n = IndexSearcher(spark, out).count({"type": "term", "term": "window"})

    # simulate a crashed writer: a half-written part file in the live
    # postings dir, an uncommitted terms partial, a pending manifest, and
    # an orphan commit point newer than the live generation
    junk_parquet = os.path.join(
        out, m.get("postings_dir") or "postings", "group=77", "part-junk.parquet"
    )
    os.makedirs(os.path.dirname(junk_parquet), exist_ok=True)
    open(junk_parquet, "wb").close()
    junk_partial = os.path.join(out, "terms_partial", "group=999", "p.parquet")
    os.makedirs(os.path.dirname(junk_partial), exist_ok=True)
    open(junk_partial, "wb").close()
    open(os.path.join(out, "manifest.json.pending_99"), "w").write("{}")
    orphan_gen = int(m["generation"]) + 5
    with open(os.path.join(out, "commits", f"segments_{orphan_gen}.json"), "w") as f:
        json.dump({"generation": orphan_gen}, f)

    removed = rollback_uncommitted(out)
    assert not os.path.exists(junk_parquet)
    assert not os.path.exists(os.path.dirname(junk_partial))
    assert not os.path.exists(os.path.join(out, "manifest.json.pending_99"))
    assert not os.path.exists(
        os.path.join(out, "commits", f"segments_{orphan_gen}.json")
    )
    assert removed["pending"] and removed["orphan_commits"] and removed["files"]

    # committed data untouched: same results, CheckIndex green
    assert IndexSearcher(spark, out).count({"type": "term", "term": "window"}) == n
    check_index(out, spark)


def test_check_commits(spark, gen_index):
    import os

    from lucene_rust_spark.index.commits import (
        PersistentSnapshotDeletionPolicy,
        check_commits,
    )
    from lucene_rust_spark.index.manifest import read_manifest

    out, _b0, _b1 = gen_index
    info = check_commits(out)
    assert info["live_generation"] == int(read_manifest(out)["generation"])
    assert len(info["retained_generations"]) == 3
    assert not info["pending_manifests"] and not info["orphan_commit_points"]

    # a persistent snapshot shows up; a dangling one is corruption
    pol = PersistentSnapshotDeletionPolicy(out)
    pol.snapshot()
    assert check_commits(out)["snapshotted_generations"] == [
        info["live_generation"]
    ]

    # deleting a stamped file is REAL corruption: check_commits raises
    m = read_manifest(out)
    victim = m["store_files"][m.get("docmap_dir") or "docmap"][0]
    os.rename(
        os.path.join(out, victim), os.path.join(out, victim + ".hidden")
    )
    try:
        import pytest

        with pytest.raises(AssertionError, match="missing files"):
            check_commits(out)
    finally:
        os.rename(
            os.path.join(out, victim + ".hidden"), os.path.join(out, victim)
        )
    check_commits(out)
