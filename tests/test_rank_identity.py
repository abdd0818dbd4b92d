"""End-to-end rank-identity: the Spark engine must reproduce the oracle's
top-k (docIDs AND float32 scores, exact) on the pinned query set
(FIXTURES.md §4) — the north-star contract."""

import numpy as np
import pytest


def _run_query(searcher, q):
    res = searcher.search(q["query"], q["k"])
    if q.get("search_after_page") == 2 and res:
        anchor = res[-1]
        res = searcher.search(q["query"], q["k"], search_after=(anchor[1], anchor[0]))
    return res


def test_rank_identity_all_queries(searcher, golden_queries, golden_results):
    """All 80 pinned queries, engine vs committed oracle goldens. Exact
    docID sequence and exact float32 scores (FIXTURES.md: abs diff == 0)."""
    failures = []
    for q in golden_queries:
        got = _run_query(searcher, q)
        want = [(int(d), float(np.float32(s))) for d, s in golden_results[q["id"]]]
        if got != want:
            failures.append((q["id"], got[:3], want[:3]))
    assert not failures, f"{len(failures)} queries mismatched: {failures[:5]}"


def test_live_oracle_spot_check(searcher, oracle_idx):
    """Engine vs freshly-built oracle (not the committed golden) for a few
    composed queries — guards against stale goldens."""
    from lucene_rust_spark.oracle.bm25 import bool_query, oracle_search, term_query

    for q in [
        term_query("token"),
        bool_query(must=["token", "index"], must_not=["merge_mut"]),
        bool_query(should=["token", "index", "value"], min_should_match=2),
    ]:
        assert searcher.search(q, 10) == oracle_search(oracle_idx, q, 10)


def test_count_matches_oracle(searcher, oracle_idx):
    from lucene_rust_spark.oracle.bm25 import oracle_count, term_query

    q = term_query("token")
    assert searcher.count(q) == oracle_count(oracle_idx, q)


def test_zero_hit_and_clause_limit(searcher):
    from lucene_rust_spark.oracle.bm25 import bool_query, term_query
    from lucene_rust_spark.search.searcher import MAX_CLAUSE_COUNT

    assert searcher.search(term_query("zzz_nosuchterm_x"), 10) == []
    with pytest.raises(ValueError):
        searcher.search(bool_query(should=[f"t{i}" for i in range(MAX_CLAUSE_COUNT + 1)]), 10)
