"""addIndexes(Directory) analog: import a whole index by doc-base shift.

The merged index must be search-identical (per original document, keyed
by path) to one index built over the union corpus: same counts, same
BM25 float32 scores, same stats — because df/ttf/doc_count/sum_ttf are
sums and tf/dl per doc are untouched by the import."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def halves(spark):
    from lucene_rust_spark.corpus import gen_corpus_spark

    src = gen_corpus_spark(spark, 400, 4).persist()
    a = src.filter(F.crc32(F.col("path")) % 2 == 0)
    b = src.filter(F.crc32(F.col("path")) % 2 == 1)
    yield src, a, b
    src.unpersist()


@pytest.fixture(scope="module")
def merged(spark, tmp_path_factory, halves):
    """(merged_dir, union_dir): A with B imported, and the union build."""
    from lucene_rust_spark.index.add_indexes import add_indexes
    from lucene_rust_spark.index.build import build_index

    src, a, b = halves
    root = tmp_path_factory.mktemp("addidx")
    da, db, du = str(root / "a"), str(root / "b"), str(root / "u")
    build_index(spark, a, da, num_partitions=4)
    build_index(spark, b, db, num_partitions=4)
    build_index(spark, src, du, num_partitions=4)
    add_indexes(spark, da, db)
    return da, du


def _by_path(spark, index_dir, q, k=60):
    from lucene_rust_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark, index_dir)
    hits = s.search(q, k=k)
    if not hits:
        return {}
    ids = {int(d) for d, _ in hits}
    rows = s.docmap.filter(F.col("doc_id").isin(ids)).select("doc_id", "path").collect()
    path = {int(r["doc_id"]): r["path"] for r in rows}
    import numpy as np

    return {path[int(d)]: float(np.float32(sc)) for d, sc in hits}


def test_counts_and_stats_match_union(spark, merged, halves):
    from lucene_rust_spark.index.manifest import check_index, read_manifest
    from lucene_rust_spark.search.searcher import IndexSearcher

    da, du = merged
    ma, mu = read_manifest(da), read_manifest(du)
    assert ma["doc_count"] == mu["doc_count"] == 400
    assert ma["sum_total_term_freq"] == mu["sum_total_term_freq"]
    assert ma["content_sha256_xor"] == mu["content_sha256_xor"]
    sa = IndexSearcher(spark, da)
    su = IndexSearcher(spark, du)
    for term in ("merge", "window", "batch", "zzz_not_a_term"):
        q = {"type": "term", "term": term}
        assert sa.count(q) == su.count(q), term
    st_a = sa.term_stats(["merge", "window"])
    st_u = su.term_stats(["merge", "window"])
    assert st_a == st_u
    check_index(da, spark)


def test_bm25_score_identity_by_path(spark, merged):
    from lucene_rust_spark.oracle.bm25 import bool_query

    da, du = merged
    for q in (
        {"type": "term", "term": "merge"},
        bool_query(should=["merge", "window"]),
        bool_query(must=["data", "batch"]),
    ):
        got = _by_path(spark, da, q)
        want = _by_path(spark, du, q)
        # same docs, same float32 scores (top-k boundary ties may admit
        # different members: compare on the intersection above the cut)
        shared = set(got) & set(want)
        assert len(shared) >= min(len(got), len(want)) - 2
        for p in shared:
            assert got[p] == want[p], p


def test_tombstones_carry_over(spark, tmp_path, halves):
    from lucene_rust_spark.index.add_indexes import add_indexes
    from lucene_rust_spark.index.build import build_index
    from lucene_rust_spark.index.deletes import delete_by_term
    from lucene_rust_spark.search.searcher import IndexSearcher

    src, a, b = halves
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, a, da, num_partitions=4)
    build_index(spark, b, db, num_partitions=4)
    n_b = IndexSearcher(spark, db).count({"type": "term", "term": "merge"})
    delete_by_term(spark, db, "merge")
    add_indexes(spark, da, db)
    from lucene_rust_spark.index.manifest import read_manifest

    s = IndexSearcher(spark, da)
    # merged: only A's 'merge' docs remain live (B's were tombstoned
    # before the import and the tombstones came along, doc-base-shifted)
    got = s.count({"type": "term", "term": "merge"})
    assert read_manifest(da)["del_count"] == n_b > 0
    # engine count over the union text minus deleted B docs
    toks = src.select(
        "path",
        F.filter(F.split(F.lower("content"), r"(?U)\W+"), lambda x: x != "").alias("t"),
    )
    in_a = F.crc32(F.col("path")) % 2 == 0
    expect = toks.filter(F.array_contains("t", "merge") & in_a).count()
    assert got == expect
    assert n_b > 0  # the deletion actually exercised something


def test_incompatible_options_raise(spark, tmp_path, halves):
    from lucene_rust_spark.index.add_indexes import add_indexes
    from lucene_rust_spark.index.build import build_index

    _, a, b = halves
    da, db = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, a, da, num_partitions=2)
    build_index(spark, b, db, num_partitions=2, positions=True)
    with pytest.raises(ValueError, match="positions"):
        add_indexes(spark, da, db)
