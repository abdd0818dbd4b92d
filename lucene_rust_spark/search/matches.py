"""Matches API — the per-query match-spans surface for highlighting.

Reference: core-java-transliteration/src/search/matches.rs,
matches_iterator.rs, term_matches_iterator.rs,
disjunction_matches_iterator.rs, matches_utils.rs [all 1-line stubs;
Lucene 9 Weight#matches semantics]: for each document that matches a
query, expose an iterator of match spans — (position, end_position,
start_offset, end_offset) — per field, composed over the query tree
(term leaves; disjunction union for bool; whole-occurrence windows for
phrases; rewritten-term union for multi-term queries). Documents that
do not match the query have no Matches (Lucene returns null).

Spark-first shape: the span stream IS a DataFrame
(doc_id, term, position, end_position, start_offset, end_offset)
decoded from the same Offsets postings streams the UnifiedHighlighter
analog (IndexSearcher.snippets) reads, restricted to the query's
matching doc set with a semi-join — one distributed plan, no per-doc
driver loop. The Lucene-shaped single-doc accessor (doc_matches) is a
doc_ids=[d] filter over the same plan; the filter is pushed into the
membership computation, not applied after a full corpus match.

Span semantics per query type:
- term: one span per occurrence — (pos, pos, start, end), the
  TermMatchesIterator contract.
- bool: union of the MUST and SHOULD leaves' spans on docs matching
  the whole query (DisjunctionMatchesIterator / fromSubMatches);
  MUST_NOT contributes no spans (it only constrains membership).
- synonym / dismax / blended / indri_and: union of the member terms'
  spans (same disjunction composition).
- prefix / range / wildcard / regexp / in_set / fuzzy: union over the
  rewritten term set (Lucene reports matches through the rewritten
  query).
- phrase / multi_phrase / ngram_phrase, slop=0: one span per phrase
  occurrence — position = anchor slot-0 position, end_position =
  last-slot position, start_offset = first slot's start, end_offset =
  last slot's end; term = the phrase pattern label.
- slop > 0 (pinned displacement-window semantics, FIXTURES.md): one
  span per matching anchor p0 covering every slot occurrence inside
  the anchor's slop window — (min pos, max pos, min start, max end)
  over the windowed occurrences. Deterministic; documented divergence
  from Lucene's locally-minimal sloppy windows, matching the engine's
  pinned sloppy match semantics.
- match_all / field_exists / const_score(match_all): membership with
  no term spans — MatchesUtils.MATCH_WITH_NO_TERMS; matches_df
  returns an empty span frame, doc_matches returns [] for matching
  docs (not None).

Requires an index built with offsets=True (the Offsets postings flag).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, functions as F

from lucene_rust_spark.oracle.bm25 import query_terms
from lucene_rust_spark.search.rewrite import CONSTANT_SCORE_TYPES

SPAN_SCHEMA = (
    "doc_id long, term string, position long, end_position long, "
    "start_offset long, end_offset long"
)


class MatchSpan(NamedTuple):
    """One match occurrence (the MatchesIterator cursor state:
    startPosition/endPosition/startOffset/endOffset plus the matched
    term or phrase label)."""

    term: str
    position: int
    end_position: int
    start_offset: int
    end_offset: int


def matches_df(searcher, query: dict, doc_ids: list[int] | None = None) -> DataFrame:
    """Match spans for every doc matching `query` (live docs only), as
    (doc_id, term, position, end_position, start_offset, end_offset).
    doc_ids, when given, restricts the output to those docs (the
    Weight#matches(ctx, doc) access pattern) — the restriction is
    applied to the membership frame so the span decode prunes too."""
    from lucene_rust_spark.search.searcher import _normalize_ngram_phrase

    query = _normalize_ngram_phrase(query)
    membership = searcher.matching_docs_df(query)
    if doc_ids is not None:
        ids = sorted({int(d) for d in doc_ids})
        if not ids:
            return _empty_spans(searcher)
        membership = membership.filter(
            F.expr(f"doc_id IN ({','.join(map(str, ids))})")
        )
    spans = _spans(searcher, query, doc_ids)
    return spans.join(F.broadcast(membership) if doc_ids is not None else membership,
                      "doc_id", "left_semi")


def doc_matches(searcher, query: dict, doc_id: int) -> dict[str, list[MatchSpan]] | None:
    """The Lucene-shaped accessor: Matches for one document — a dict of
    field -> spans sorted by (position, end_position) (the
    MatchesIterator iteration order), or None when the doc does not
    match the query (Weight#matches returns null). A matching doc with
    no term spans (match_all and friends) yields {field: []} —
    MATCH_WITH_NO_TERMS."""
    rows = matches_df(searcher, query, doc_ids=[doc_id]).collect()
    if not rows:
        # distinguish "no spans" from "no match"
        if not searcher.matching_docs_df(query).filter(
            F.col("doc_id") == int(doc_id)
        ).take(1):
            return None
        return {searcher_field(searcher): []}
    spans = sorted(
        MatchSpan(
            r["term"], int(r["position"]), int(r["end_position"]),
            int(r["start_offset"]), int(r["end_offset"]),
        )
        for r in rows
    )
    spans.sort(key=lambda s: (s.position, s.end_position, s.term))
    return {searcher_field(searcher): spans}


def searcher_field(searcher) -> str:
    """The field this searcher's sub-index holds (search/multifield.py
    routes one IndexSearcher per field; single-field indexes default to
    'content' — the corpus column name)."""
    return searcher.manifest.get("field", "content")


def multi_field_matches_df(
    mf, query: dict, doc_ids: list[int] | None = None
) -> DataFrame:
    """Matches over a MultiFieldSearcher, with a leading `field` column
    (the Matches#getMatches(field) axis). Single-field queries route to
    the owning sub-searcher; cross-field booleans (per-clause 'field')
    compose per-field term spans restricted to docs matching the whole
    cross-field query — fromSubMatches over the field sub-indexes."""
    if query.get("type") == "bool" and mf._is_cross_field(query):
        return _cross_field_matches(mf, query, doc_ids)
    f = query.get("field", mf.default_field)
    out = matches_df(mf._route(query), query, doc_ids)
    return out.select(F.lit(f).alias("field"), "*")


def multi_field_doc_matches(
    mf, query: dict, doc_id: int
) -> dict[str, list[MatchSpan]] | None:
    """Per-field Matches for one doc over a MultiFieldSearcher, or None
    when the doc does not match."""
    rows = multi_field_matches_df(mf, query, doc_ids=[doc_id]).collect()
    if not rows:
        if query.get("type") == "bool" and mf._is_cross_field(query):
            hit = _cross_field_membership(mf, query).filter(
                F.col("doc_id") == int(doc_id)
            ).take(1)
        else:
            hit = mf._route(query).matching_docs_df(query).filter(
                F.col("doc_id") == int(doc_id)
            ).take(1)
        return None if not hit else {}
    out: dict[str, list[MatchSpan]] = {}
    for r in rows:
        out.setdefault(r["field"], []).append(
            MatchSpan(
                r["term"], int(r["position"]), int(r["end_position"]),
                int(r["start_offset"]), int(r["end_offset"]),
            )
        )
    for spans in out.values():
        spans.sort(key=lambda s: (s.position, s.end_position, s.term))
    return out


def _cf_clauses(mf, query: dict, part: str) -> list[tuple[str, str]]:
    return [
        (c.get("field", mf.default_field), c["term"]) for c in query.get(part, ())
    ]


def _cross_field_membership(mf, query: dict) -> DataFrame:
    """Matching doc set of a cross-field bool — the unscored form of
    MultiFieldSearcher._cross_field_bool (one flat (field:term, doc_id)
    presence stream, one counting groupBy), live docs only."""
    must = _cf_clauses(mf, query, "must")
    should = _cf_clauses(mf, query, "should")
    must_not = _cf_clauses(mf, query, "must_not")
    msm = int(query.get("min_should_match", 0) or 0)
    empty = mf.spark.createDataFrame([], "doc_id long")
    if msm > len(set(should)):
        return empty
    flats: list[DataFrame] = []
    present: set = set()
    for f, terms in mf._group_by_field(set(must) | set(should) | set(must_not)):
        sub = mf.sub[f]
        stats = sub.term_stats(terms)
        have = [t for t in terms if t in stats]
        present.update((f, t) for t in have)
        if have:
            flat = sub._term_docs(have).select(
                F.concat(F.lit(f + ":"), F.col("term")).alias("term"), "doc_id"
            )
            flats.append(sub._drop_deleted(flat))
    if any(c not in present for c in set(must)) or not flats:
        return empty
    flat = flats[0]
    for df in flats[1:]:
        flat = flat.unionByName(df)
    lab = lambda cs: [f"{f}:{t}" for f, t in sorted(set(cs))]  # noqa: E731
    must_l, should_l, not_l = lab(must), lab(should), lab(must_not)
    in_must = F.col("term").isin(must_l) if must_l else F.lit(False)
    in_should = F.col("term").isin(should_l) if should_l else F.lit(False)
    in_not = F.col("term").isin(not_l) if not_l else F.lit(False)
    grouped = flat.groupBy("doc_id").agg(
        F.sum(F.when(in_must, 1).otherwise(0)).alias("n_must"),
        F.sum(F.when(in_should, 1).otherwise(0)).alias("n_should"),
        F.sum(F.when(in_not, 1).otherwise(0)).alias("n_not"),
    )
    cond = F.lit(True)
    if must_l:
        cond = cond & (F.col("n_must") == len(set(must)))
    if should_l and (msm or not must_l):
        cond = cond & (F.col("n_should") >= max(msm, 0 if must_l else 1))
    if not_l:
        cond = cond & (F.col("n_not") == 0)
    return grouped.filter(cond).select("doc_id")


def _cross_field_matches(mf, query: dict, doc_ids: list[int] | None) -> DataFrame:
    membership = _cross_field_membership(mf, query)
    if doc_ids is not None:
        ids = sorted({int(d) for d in doc_ids})
        if not ids:
            return mf.spark.createDataFrame([], "field string, " + SPAN_SCHEMA)
        membership = membership.filter(
            F.expr(f"doc_id IN ({','.join(map(str, ids))})")
        )
    pos = _cf_clauses(mf, query, "must") + _cf_clauses(mf, query, "should")
    by_f: dict[str, list[str]] = {}
    for f, t in pos:
        by_f.setdefault(f, []).append(t)
    parts = [
        _term_spans(mf.sub[f], ts).select(F.lit(f).alias("field"), "*")
        for f, ts in sorted(by_f.items())
    ]
    spans = parts[0]
    for p in parts[1:]:
        spans = spans.unionByName(p)
    return spans.join(
        F.broadcast(membership) if doc_ids is not None else membership,
        "doc_id", "left_semi",
    )


# -- span builders ----------------------------------------------------------


def _empty_spans(searcher) -> DataFrame:
    return searcher.spark.createDataFrame([], SPAN_SCHEMA)


def _term_spans(searcher, terms: list[str]) -> DataFrame:
    terms = sorted(set(terms))
    if not terms:
        return _empty_spans(searcher)
    return searcher.term_offsets(terms).select(
        "doc_id",
        "term",
        F.col("pos").alias("position"),
        F.col("pos").alias("end_position"),
        F.col("start").alias("start_offset"),
        F.col("end").alias("end_offset"),
    )


def _spans(searcher, query: dict, doc_ids: list[int] | None) -> DataFrame:
    qt = query.get("type")
    if qt in ("match_all", "field_exists"):
        return _empty_spans(searcher)
    if qt in ("boost", "const_score"):
        return _spans(searcher, query["query"], doc_ids)
    if qt in CONSTANT_SCORE_TYPES or qt == "fuzzy":
        return _term_spans(searcher, searcher.expand_query_terms(query))
    if qt in ("synonym", "indri_and"):
        return _term_spans(searcher, list(query["terms"]))
    if qt == "dismax":
        return _term_spans(searcher, [c["term"] for c in query["queries"]])
    if qt == "blended":
        return _term_spans(searcher, [c["term"] for c in query["terms"]])
    if qt in ("phrase", "multi_phrase", "ngram_phrase"):
        return _phrase_spans(searcher, query, doc_ids)
    if qt in ("term", "bool"):
        must, should, _must_not, _msm = query_terms(query)
        return _term_spans(searcher, list(must) + list(should))
    raise ValueError(f"matches: unsupported query type {qt!r}")


def _phrase_spans(searcher, query: dict, doc_ids: list[int] | None) -> DataFrame:
    """Phrase occurrence spans via the same anchor-chain plan as
    _phrase_freq (doc-level candidate pruning first, then position
    equi-joins), keeping the anchor p0 instead of collapsing to a
    count, then joining the boundary slots' offset streams to recover
    char offsets. One distributed plan; the offsets decode is filtered
    to candidate docs."""
    slop = int(query.get("slop", 0) or 0)
    slots = searcher._phrase_slots(query)
    uniq = sorted({t for s in slots for t in s})
    stats = searcher.term_stats(uniq)
    slots = [[t for t in s if t in stats] for s in slots]
    if any(not s for s in slots):
        return _empty_spans(searcher)
    offs = searcher._phrase_offsets(query, len(slots))
    label = " ".join(
        s[0] if len(s) == 1 else "|".join(s) for s in slots
    )

    # occurrence stream with char offsets, candidate-doc filtered the
    # same way _phrase_candidates_pos prunes (any superset is correct —
    # the anchor chain enforces exact coverage); no forced broadcast —
    # a common-term phrase can have a large candidate set, AQE picks
    # the semi-join strategy
    cand_pos = searcher._phrase_candidates_pos(slots, stats)
    cand = cand_pos.select("doc_id").distinct()
    occ = searcher.term_offsets(uniq).join(cand, "doc_id", "left_semi")
    if doc_ids is not None:
        ids = sorted({int(d) for d in doc_ids})
        occ = occ.filter(F.expr(f"doc_id IN ({','.join(map(str, ids))})"))
    occ = occ.persist()

    # anchor chain (p0 = slot-0 position), exactly _phrase_freq's algebra
    chain = (
        occ.filter(F.col("term").isin(slots[0]))
        .select("doc_id", F.col("pos").alias("p0"))
        .distinct()
    )
    for i, s in enumerate(slots[1:], start=1):
        o = offs[i]
        nxt = occ.filter(F.col("term").isin(s))
        if slop == 0:
            nxt = nxt.select("doc_id", (F.col("pos") - o).alias("p0"))
        else:
            nxt = nxt.select(
                "doc_id",
                F.explode(
                    F.sequence(F.col("pos") - o - slop, F.col("pos") - o + slop)
                ).alias("p0"),
            )
        chain = chain.join(nxt, ["doc_id", "p0"], "left_semi")

    if slop == 0:
        last_off = offs[-1]
        first = occ.filter(F.col("term").isin(slots[0])).select(
            "doc_id", F.col("pos").alias("p0"),
            F.col("pos").alias("position"), F.col("start").alias("start_offset"),
        )
        last = occ.filter(F.col("term").isin(slots[-1])).select(
            "doc_id", (F.col("pos") - last_off).alias("p0"),
            F.col("pos").alias("end_position"), F.col("end").alias("end_offset"),
        )
        out = (
            chain.join(first, ["doc_id", "p0"])
            .join(last, ["doc_id", "p0"])
            .select(
                "doc_id", F.lit(label).alias("term"),
                "position", "end_position", "start_offset", "end_offset",
            )
        )
    else:
        # pinned window span: every slot occurrence voting for this
        # anchor contributes; span = [min pos, max pos] with matching
        # [min start, max end] (positions and offsets are co-monotonic
        # within a doc — one token per position)
        votes = []
        for i, s in enumerate(slots):
            o = offs[i]
            votes.append(
                occ.filter(F.col("term").isin(s)).select(
                    "doc_id",
                    F.explode(
                        F.sequence(F.col("pos") - o - slop, F.col("pos") - o + slop)
                    ).alias("p0"),
                    "pos", "start", "end",
                )
            )
        allv = votes[0]
        for v in votes[1:]:
            allv = allv.unionByName(v)
        out = (
            allv.join(chain, ["doc_id", "p0"], "left_semi")
            .groupBy("doc_id", "p0")
            .agg(
                F.min("pos").alias("position"),
                F.max("pos").alias("end_position"),
                F.min("start").alias("start_offset"),
                F.max("end").alias("end_offset"),
            )
            .select(
                "doc_id", F.lit(label).alias("term"),
                "position", "end_position", "start_offset", "end_offset",
            )
        )
    searcher._scratch(cand_pos)
    searcher._scratch(occ)
    return out
