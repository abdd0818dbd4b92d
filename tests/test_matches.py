"""Matches API (search/matches.py — clt/search/matches.rs,
term_matches_iterator.rs, disjunction_matches_iterator.rs [stubs];
Lucene 9 Weight#matches): per-occurrence match spans composed over the
query tree, verified against a direct tokenize_spans() recompute and
against snippets() (the two surfaces must agree on the first
occurrence — VERDICT r5 item 5's done criterion)."""

import numpy as np
import pytest

from lucene_rust_spark.oracle.bm25 import (
    assign_doc_ids,
    bool_query,
    multi_phrase_query,
    phrase_query,
    term_query,
)

N_ROWS, N_PARTS = 300, 4


@pytest.fixture(scope="module")
def off_index(spark, tmp_path_factory):
    from lucene_rust_spark.corpus import gen_corpus_pandas, gen_corpus_spark
    from lucene_rust_spark.index.build import build_index
    from lucene_rust_spark.search.searcher import IndexSearcher

    out = str(tmp_path_factory.mktemp("matches") / "off")
    build_index(
        spark, gen_corpus_spark(spark, N_ROWS, N_PARTS), out,
        num_partitions=N_PARTS, positions=True, offsets=True,
    )
    pdf = assign_doc_ids(gen_corpus_pandas(N_ROWS), N_PARTS)
    return IndexSearcher(spark, out, cache=True), pdf


def _doc_tokens(pdf):
    """doc_id -> [(token, position, start, end)] from a direct
    re-analysis — the ground truth the offset streams round-trip."""
    from lucene_rust_spark.functions.analysis import tokenize_spans

    out = {}
    for did, text in zip(pdf["doc_id"], pdf["content"]):
        out[int(did)] = [
            (tok, i, a, b) for i, (tok, a, b) in enumerate(tokenize_spans(text))
        ]
    return out


def _collect_spans(df):
    return sorted(
        (
            int(r["doc_id"]), r["term"], int(r["position"]),
            int(r["end_position"]), int(r["start_offset"]), int(r["end_offset"]),
        )
        for r in df.collect()
    )


def _common_bigram(docs):
    from collections import Counter

    c = Counter()
    for toks in docs.values():
        names = [t[0] for t in toks]
        c.update(zip(names, names[1:]))
    return list(c.most_common(1)[0][0])


def test_term_spans_match_reanalysis(off_index):
    s, pdf = off_index
    docs = _doc_tokens(pdf)
    got = _collect_spans(s.matches_df(term_query("merge")))
    want = sorted(
        (did, "merge", i, i, a, b)
        for did, toks in docs.items()
        for (tok, i, a, b) in toks
        if tok == "merge"
    )
    assert got == want
    assert len(got) > 0


def test_bool_union_and_must_not(off_index):
    s, pdf = off_index
    docs = _doc_tokens(pdf)
    q = bool_query(must=["merge"], should=["value"], must_not=["window"])
    member = {
        did for did, toks in docs.items()
        if any(t[0] == "merge" for t in toks)
        and not any(t[0] == "window" for t in toks)
    }
    got = _collect_spans(s.matches_df(q))
    want = sorted(
        (did, tok, i, i, a, b)
        for did in member
        for (tok, i, a, b) in docs[did]
        if tok in ("merge", "value")
    )
    assert got == want
    # membership respected: no span from an excluded doc
    assert all(r[0] in member for r in got)


def test_exact_phrase_spans(off_index):
    s, pdf = off_index
    docs = _doc_tokens(pdf)
    a, b = _common_bigram(docs)
    got = _collect_spans(s.matches_df(phrase_query([a, b])))
    want = []
    for did, toks in docs.items():
        for (t0, i, st, _), (t1, j, _, en) in zip(toks, toks[1:]):
            if t0 == a and t1 == b:
                want.append((did, f"{a} {b}", i, j, st, en))
    assert got == sorted(want)
    assert len(got) > 0


def test_multi_phrase_spans(off_index):
    from collections import Counter

    s, pdf = off_index
    docs = _doc_tokens(pdf)
    a, b = _common_bigram(docs)
    # an alternative slot-0 term that is definitely indexed
    c = Counter(t[0] for toks in docs.values() for t in toks)
    alt = next(t for t, _n in c.most_common() if t not in (a, b))
    q = multi_phrase_query([[a, alt], [b]], slop=0)
    got = _collect_spans(s.matches_df(q))
    alts0 = sorted({a, alt})
    label = f"{'|'.join(alts0)} {b}"
    want = []
    for did, toks in docs.items():
        for (t0, i, st, _), (t1, j, _, en) in zip(toks, toks[1:]):
            if t0 in alts0 and t1 == b:
                want.append((did, label, i, j, st, en))
    assert got == sorted(want)
    assert len(got) >= len(
        _collect_spans(s.matches_df(phrase_query([a, b])))
    )


def test_sloppy_phrase_window_spans(off_index):
    """Pinned displacement-window semantics: anchor p0 matches iff every
    slot i has a position within slop of p0+i; the span covers every
    slot occurrence inside the anchor's window."""
    s, pdf = off_index
    docs = _doc_tokens(pdf)
    a, b = _common_bigram(docs)
    slop = 1
    got = _collect_spans(s.matches_df(phrase_query([a, b], slop=slop)))
    want = []
    for did, toks in docs.items():
        pos = {}
        for (tok, i, st, en) in toks:
            pos.setdefault(tok, []).append((i, st, en))
        if a not in pos or b not in pos:
            continue
        for (p0, _, _) in pos[a]:
            hits = []
            ok = True
            for off, term in ((0, a), (1, b)):
                inw = [
                    (i, st, en) for (i, st, en) in pos.get(term, ())
                    if abs(i - (p0 + off)) <= slop
                ]
                if not inw:
                    ok = False
                    break
                hits.extend(inw)
            if ok:
                want.append(
                    (
                        did, f"{a} {b}",
                        min(h[0] for h in hits), max(h[0] for h in hits),
                        min(h[1] for h in hits), max(h[2] for h in hits),
                    )
                )
    assert got == sorted(want)
    assert len(got) >= len(_collect_spans(s.matches_df(phrase_query([a, b]))))


def test_prefix_expansion_spans(off_index):
    s, pdf = off_index
    docs = _doc_tokens(pdf)
    q = {"type": "prefix", "prefix": "mer"}
    terms = set(s.expand_query_terms(q))
    assert "merge" in terms
    got = _collect_spans(s.matches_df(q))
    want = sorted(
        (did, tok, i, i, a, b)
        for did, toks in docs.items()
        for (tok, i, a, b) in toks
        if tok in terms
    )
    assert got == want


def test_snippets_first_occurrence_parity(off_index):
    """The UnifiedHighlighter analog and the Matches API must agree:
    snippets()' (start, end) is the min-(start, end) span of matches_df
    for every returned hit."""
    import pandas as pd
    from pyspark.sql import functions as F

    s, pdf = off_index
    q = bool_query(should=["merge", "value"])
    spark = s.spark
    text_df = spark.createDataFrame(
        pdf[["doc_id", "content"]].rename(columns={"content": "text"})
    )
    snips = {
        int(r["doc_id"]): (int(r["start"]), int(r["end"]))
        for r in s.snippets(q, text_df, k=10, window=10).collect()
    }
    first = {
        int(r["doc_id"]): (int(r["start_offset"]), int(r["end_offset"]))
        for r in s.matches_df(q)
        .groupBy("doc_id")
        .agg(F.min(F.struct("start_offset", "end_offset")).alias("fo"))
        .select("doc_id", "fo.start_offset", "fo.end_offset")
        .collect()
    }
    assert snips and all(snips[d] == first[d] for d in snips)


def test_doc_matches_accessor(off_index):
    from lucene_rust_spark.search.matches import MatchSpan

    s, pdf = off_index
    docs = _doc_tokens(pdf)
    did_hit = next(
        did for did, toks in docs.items() if any(t[0] == "merge" for t in toks)
    )
    did_miss = next(
        did for did, toks in docs.items() if not any(t[0] == "merge" for t in toks)
    )
    m = s.matches(term_query("merge"), did_hit)
    want = [
        MatchSpan("merge", i, i, a, b)
        for (tok, i, a, b) in docs[did_hit]
        if tok == "merge"
    ]
    assert m == {"content": want}
    assert [sp.position for sp in m["content"]] == sorted(
        sp.position for sp in m["content"]
    )
    assert s.matches(term_query("merge"), did_miss) is None
    # MATCH_WITH_NO_TERMS: matching doc, no term spans
    assert s.matches({"type": "match_all"}, did_miss) == {"content": []}


def test_matches_doc_ids_restriction(off_index):
    s, pdf = off_index
    docs = _doc_tokens(pdf)
    hits = sorted(
        did for did, toks in docs.items() if any(t[0] == "merge" for t in toks)
    )
    pick = hits[:3]
    got = _collect_spans(s.matches_df(term_query("merge"), doc_ids=pick))
    assert {r[0] for r in got} == set(pick)


def test_multifield_matches(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    from lucene_rust_spark.corpus import gen_corpus_pandas, gen_corpus_spark
    from lucene_rust_spark.search.multifield import (
        MultiFieldSearcher,
        build_multi_field_index,
    )

    out = str(tmp_path_factory.mktemp("mf_matches") / "mf")
    src = gen_corpus_spark(spark, 120, 4).withColumn(
        "title", F.concat_ws(" ", F.col("lang"), F.split(F.col("path"), "/")[0])
    )
    build_multi_field_index(
        spark, src, out, fields=("content", "title"),
        num_partitions=4, positions=True, offsets=True,
    )
    mf = MultiFieldSearcher(spark, out, cache=True)

    # single-field routing carries the field tag
    rows = mf.matches_df({"type": "term", "term": "merge"}).collect()
    assert rows and all(r["field"] == "content" for r in rows)

    # cross-field bool: spans from both fields, membership = conjunction
    langs = [r["lang"] for r in src.select("lang").distinct().collect()]
    lang = sorted(langs)[0]
    q = {
        "type": "bool",
        "must": [
            {"term": "merge", "field": "content"},
            {"term": lang, "field": "title"},
        ],
        "should": [],
        "must_not": [],
        "min_should_match": 0,
    }
    spans = mf.matches_df(q).collect()
    by_field = {r["field"] for r in spans}
    member = {int(r["doc_id"]) for r in spans}
    c_member = {
        int(r["doc_id"])
        for r in mf.sub["content"].matching_docs_df(term_query("merge")).collect()
    }
    t_member = {
        int(r["doc_id"])
        for r in mf.sub["title"].matching_docs_df(term_query(lang)).collect()
    }
    assert member == (c_member & t_member)
    if member:
        assert by_field == {"content", "title"}
        did = min(member)
        m = mf.matches(q, did)
        assert set(m) == {"content", "title"}
        assert all(sp.term in ("merge", lang) for sps in m.values() for sp in sps)
    assert mf.matches(q, max(c_member - t_member, default=-1)) is None
