"""Indri family (clt/search/similarities/mod.rs:30
indri_dirichlet_similarity; clt/search/mod.rs:65-70 indri_and_query /
indri_and_scorer — all [stub]; Lucene 9 public semantics): the
IndriDirichlet similarity and the smoothed-AND query that scores every
doc matching >= 1 clause, with MISSING terms contributing their
zero-frequency (collection-smoothed) log-probability."""

import numpy as np
import pytest

from lucene_rust_spark.oracle.bm25 import bool_query, oracle_search, term_query


def test_indri_dirichlet_term_parity(spark, t1_index, oracle_idx):
    from lucene_rust_spark.search.searcher import IndexSearcher

    out, _ = t1_index
    s = IndexSearcher(spark, out, similarity="indri")
    for q in [term_query("token"), bool_query(should=["token", "value", "index"]),
              bool_query(must=["token", "index"])]:
        assert s.search(q, 10) == oracle_search(oracle_idx, q, 10, similarity="indri")


def test_indri_scores_can_be_negative(spark, t1_index):
    """IndriDirichlet keeps negative log-probs (unlike LMDirichlet's
    clamp at 0) — rare terms in long docs go below zero."""
    from lucene_rust_spark.functions.similarities import get_similarity

    sim = get_similarity("indri", 1000, 100_000)
    cp = sim.weight(1, 1)
    sc = sim.score(
        np.array([1], dtype=np.int64),
        np.array([200], dtype=np.int64),  # a large dlq -> long doc
        np.full(1, cp, dtype=np.float32),
    )
    assert sc[0] < 0.0


def test_indri_and_rank_identity(spark, t1_index, oracle_idx):
    from lucene_rust_spark.search.searcher import IndexSearcher

    out, _ = t1_index
    s = IndexSearcher(spark, out, similarity="indri")
    for terms in (["token", "value"], ["token", "merge_mut", "index"]):
        q = {"type": "indri_and", "terms": terms}
        assert s.search(q, 10) == oracle_search(oracle_idx, q, 10, similarity="indri")
        # count = union of the clause postings (docs matching >= 1 term)
        assert s.count(q) == oracle_search(
            oracle_idx, bool_query(should=terms), oracle_idx.doc_count,
            similarity="indri",
        ).__len__()


def test_indri_and_distributed_plan_parity(spark, t1_index, oracle_idx, monkeypatch):
    """The distributed indri_and plan (zero-score lookup arrays, forced by
    FUSED_MAX_POSTINGS=0) matches the fused kernel and the oracle."""
    import lucene_rust_spark.search.searcher as S
    from lucene_rust_spark.search.searcher import IndexSearcher

    out, _ = t1_index
    s = IndexSearcher(spark, out, similarity="indri")
    q = {"type": "indri_and", "terms": ["token", "value", "merge_mut"]}
    want = oracle_search(oracle_idx, q, 10, similarity="indri")
    assert s.search(q, 10) == want
    monkeypatch.setattr(S, "FUSED_MAX_POSTINGS", 0)
    assert s.search(q, 10) == want


def test_indri_and_smoothing_changes_ranks(spark, t1_index, oracle_idx):
    """The smoothed-AND must differ from the plain OR under the same
    similarity: docs matching ALL terms are boosted relative to partial
    matches (missing terms pay the zero-frequency penalty)."""
    q_and = {"type": "indri_and", "terms": ["token", "index"]}
    q_or = bool_query(should=["token", "index"])
    a = oracle_search(oracle_idx, q_and, 20, similarity="indri")
    o = oracle_search(oracle_idx, q_or, 20, similarity="indri")
    assert a != o


def test_indri_and_requires_indri(searcher):
    with pytest.raises(ValueError, match="indri"):
        searcher.search({"type": "indri_and", "terms": ["token"]}, 5)
