"""IndexSearcher.explain (clt/search/explanation.rs + Weight.explain):
the Explanation tree's value must equal search()'s float32 score for
every matching doc (Lucene's CheckHits invariant), and report
match=False with a reason for non-matching docs."""

from __future__ import annotations

import numpy as np
import pytest


def _assert_explains_topk(searcher, q, k=8):
    hits = searcher.search(q, k=k)
    assert hits, f"query produced no hits: {q}"
    for doc, score in hits:
        e = searcher.explain(q, doc)
        assert e["match"], (q, doc, e["description"])
        assert np.float32(e["value"]) == np.float32(score), (q, doc, e, score)
    return hits


def test_explain_matches_search_scores(searcher, golden_queries):
    """Every golden term/bool query: explanation value == search score."""
    n_checked = 0
    for g in golden_queries[:30]:
        q = g["query"]
        if q.get("type") not in ("term", "bool"):
            continue
        hits = searcher.search(q, k=5)
        if not hits:
            continue
        _assert_explains_topk(searcher, q, k=5)
        n_checked += 1
    assert n_checked >= 5


def test_explain_non_matching_doc(searcher):
    q = {"type": "term", "term": "merge"}
    hits = searcher.search(q, k=1)
    # find a doc that does NOT match: probe doc ids near the hit
    match_ids = {d for d, _ in searcher.search(q, k=10_000)}
    probe = next(d for d in range(0, 1 << 12) if d not in match_ids)
    e = searcher.explain(q, probe)
    assert not e["match"] and e["value"] == 0.0
    assert "no match" in e["description"]
    # structure of a matching explanation
    e2 = searcher.explain(q, hits[0][0])
    assert e2["details"] and e2["details"][0]["description"].startswith("idf")
    idf_detail = e2["details"][0]
    n = idf_detail["details"][0]["value"]
    stats = searcher.term_stats(["merge"])["merge"]
    assert int(n) == stats["doc_freq"]


def test_explain_bool_semantics(searcher):
    from lucene_rust_spark.oracle.bm25 import bool_query

    q = bool_query(must=["merge"], should=["window"], must_not=["es"])
    _assert_explains_topk(searcher, q, k=5)
    # a doc failing the MUST clause explains why
    only_window = bool_query(must=["window"])
    w_hits = {d for d, _ in searcher.search(only_window, k=10_000)}
    m_hits = {d for d, _ in searcher.search(bool_query(must=["merge"]), k=10_000)}
    failing = sorted(w_hits - m_hits)
    if failing:
        e = searcher.explain(q, failing[0])
        assert not e["match"] and "MUST clause" in e["description"]


def test_explain_synonym_dismax_fuzzy(searcher):
    _assert_explains_topk(searcher, {"type": "synonym", "terms": ["merge", "window"]})
    _assert_explains_topk(
        searcher,
        {
            "type": "dismax",
            "tie": 0.1,
            "queries": [{"term": "merge"}, {"term": "window"}],
        },
    )
    _assert_explains_topk(searcher, {"type": "fuzzy", "term": "merge", "max_edits": 1})


def test_explain_constant_score_and_wrappers(searcher):
    hits = _assert_explains_topk(searcher, {"type": "prefix", "prefix": "mer"})
    e = searcher.explain({"type": "prefix", "prefix": "mer", "boost": 2.5}, hits[0][0])
    assert e["match"] and np.float32(e["value"]) == np.float32(2.5)
    _assert_explains_topk(
        searcher, {"type": "boost", "boost": 3.0, "query": {"type": "term", "term": "merge"}}
    )
    _assert_explains_topk(
        searcher,
        {"type": "const_score", "score": 0.5, "query": {"type": "term", "term": "merge"}},
    )


def test_explain_phrase(spark, tmp_path_factory):
    from lucene_rust_spark.corpus import gen_corpus_spark
    from lucene_rust_spark.index.build import build_index
    from lucene_rust_spark.search.searcher import IndexSearcher

    out = str(tmp_path_factory.mktemp("explidx") / "p")
    build_index(
        spark, gen_corpus_spark(spark, 400, 4), out, num_partitions=4, positions=True
    )
    s = IndexSearcher(spark, out)
    # a phrase that provably occurs: the first two tokens of a real doc
    from lucene_rust_spark.corpus import gen_corpus_pandas
    from lucene_rust_spark.functions.analysis import tokenize

    toks = tokenize(gen_corpus_pandas(400).iloc[7]["content"])
    q = {"type": "phrase", "terms": [toks[0], toks[1]]}
    assert s.search(q, k=1), q
    hits = s.search(q, k=5)
    for doc, score in hits:
        e = s.explain(q, doc)
        assert e["match"] and np.float32(e["value"]) == np.float32(score)
    # sloppy variant
    q2 = dict(q, slop=2)
    for doc, score in s.search(q2, k=5):
        e = s.explain(q2, doc)
        assert e["match"] and np.float32(e["value"]) == np.float32(score)


def test_explain_deleted_doc(spark, tmp_path):
    from lucene_rust_spark.corpus import gen_corpus_spark
    from lucene_rust_spark.index.build import build_index
    from lucene_rust_spark.index.deletes import delete_by_term
    from lucene_rust_spark.search.searcher import IndexSearcher

    out = str(tmp_path / "idx")
    build_index(spark, gen_corpus_spark(spark, 120, 2), out, num_partitions=2)
    s0 = IndexSearcher(spark, out)
    victim = s0.search({"type": "term", "term": "merge"}, k=1)
    assert victim
    delete_by_term(spark, out, "merge")
    s1 = IndexSearcher(spark, out)
    e = s1.explain({"type": "term", "term": "merge"}, victim[0][0])
    assert not e["match"] and "deleted" in e["description"]
