"""MultiCollector / CachingCollector (clt/search/multi_collector.rs,
caching_collector.rs): one scored pass, many collector outputs — each
must equal the corresponding single-collector API run independently."""

from lucene_rust_spark.oracle.bm25 import bool_query, term_query
from lucene_rust_spark.search.collectors import CachingCollector, multi_collect


def test_multi_collect_matches_individual_collectors(searcher):
    q = bool_query(should=["token", "value"])
    out = multi_collect(
        searcher, q, k=5, with_count=True,
        facet_fields=("lang",), facet_top_n=5,
        sort=[{"field": "lang"}, {"field": "path", "reverse": True}],
    )
    assert out["top_k"] == searcher.search(q, 5)
    assert out["total_hits"] == searcher.count(q)
    assert out["relation"] == "EQUAL_TO"
    want_facets = [
        (r["lang"], int(r["count"]))
        for r in searcher.facet_counts(q, "lang", top_n=5).collect()
    ]
    assert out["facets"]["lang"] == want_facets
    want_sorted = searcher.search_by_field(
        q, [{"field": "lang"}, {"field": "path", "reverse": True}], k=5
    ).collect()
    got = [(r["doc_id"],) for r in out["top_k_by_field"]]
    want = [(r["doc_id"],) for r in want_sorted]
    assert got == want


def test_multi_collect_threshold_relation(searcher):
    q = term_query("token")
    n = searcher.count(q)
    assert n > 3
    out = multi_collect(searcher, q, k=3, count_threshold=3)
    assert out["total_hits"] == 3
    assert out["relation"] == "GREATER_THAN_OR_EQUAL_TO"
    out2 = multi_collect(searcher, q, k=3, count_threshold=n + 10)
    assert out2["total_hits"] == n
    assert out2["relation"] == "EQUAL_TO"


def test_caching_collector_replay(searcher):
    q = term_query("value")
    with CachingCollector(searcher, q) as cc:
        top = cc.top_k(7).collect()
        assert [
            (int(r["doc_id"]), float(r["score"])) for r in top
        ] == [(d, s) for d, s in searcher.search(q, 7)]
        assert cc.total_hits() == searcher.count(q)
        # arbitrary replay over the cached stream: max score
        mx = cc.replay(lambda df: df.agg({"score": "max"}).first()[0])
        assert abs(mx - top[0]["score"]) < 1e-6
    # context exit released the cache; a fresh collector still works
    assert CachingCollector(searcher, q).total_hits() == searcher.count(q)


def test_rescore_by_sort(searcher):
    """SortRescorer (clt/search/sort_rescorer.rs): re-order the first-pass
    window by stored fields; verified against an independent pandas sort
    of the same window."""
    import pytest
    q = {"type": "term", "term": "merge"}
    first = searcher.search_df(q, 30)
    got = [
        (r["doc_id"], r["lang"])
        for r in searcher.rescore_by_sort(
            first, [{"field": "lang"}, {"field": "path", "reverse": True}], k=10
        ).collect()
    ]
    window = first.join(searcher.docmap, "doc_id").select(
        "doc_id", "lang", "path"
    ).toPandas()
    window = window.sort_values(
        ["lang", "path", "doc_id"], ascending=[True, False, True]
    ).head(10)
    assert got == list(zip(window["doc_id"], window["lang"]))
    # _score spec keeps relevance in the output and orders by it
    re2 = searcher.rescore_by_sort(first, [{"field": "_score"}], k=5).collect()
    top = searcher.search(q, 5)
    assert [(r["doc_id"], r["score"]) for r in re2] == [
        (d, pytest.approx(s)) for d, s in top
    ]
