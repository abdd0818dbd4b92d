"""IndexSearcher.explain — the Explanation tree for one (query, doc).

Reference surface: clt/search/explanation.rs + Weight.explain in
weight.rs / term_scorer.rs [stubs; Lucene 9 semantics]: a nested
{match, value, description, details} record whose top-level value equals
the doc's search score EXACTLY (Lucene asserts this in CheckHits; our
tests assert float32 equality against search()).

Spark mapping: explanations are driver-side by construction (one doc).
Leaf term lookups reuse the driver path's read primitive —
`_driver_collect_postings(terms, doc_id=...)` seeks ONE posting block
per term via the zone map (the skip-list seek), so explain() costs a
single tiny collect per leaf family, never a scan. Scores come from the
same similarity kernels and the same pinned float32 fold orders as
search(), so equality is by construction, not coincidence.
"""

from __future__ import annotations

import numpy as np

from lucene_rust_spark.functions import kernels as K
from lucene_rust_spark.search.rewrite import CONSTANT_SCORE_TYPES


def _node(match: bool, value, description: str, details=()) -> dict:
    return {
        "match": bool(match),
        "value": float(np.float32(value)) if match else 0.0,
        "description": description,
        "details": list(details),
    }


def _no_match(description: str, details=()) -> dict:
    return _node(False, 0.0, description, details)


def _term_leaf(s, term: str, doc_id: int, stats=None) -> dict:
    """One term's contribution to doc_id — the Weight.explain leaf."""
    stats = stats if stats is not None else s.term_stats([term])
    if term not in stats:
        return _no_match(f"no matching term ({term!r} not in index)")
    arrs = s._driver_collect_postings([term], doc_id=int(doc_id))
    hit = None
    if arrs and term in arrs:
        docs, tfs, dlqs = arrs[term]
        i = int(np.searchsorted(docs, int(doc_id)))
        if i < len(docs) and int(docs[i]) == int(doc_id):
            hit = (int(tfs[i]), int(dlqs[i]))
    if hit is None:
        return _no_match(f"no match on doc {doc_id} for term {term!r}")
    tf, dlq = hit
    st = stats[term]
    idf = np.float32(st["idf"])
    val = np.float32(
        s.sim.score(
            np.array([tf], dtype=np.int64),
            np.array([dlq], dtype=np.int64),
            np.array([idf], dtype=np.float32),
        )[0]
    )
    n, N = int(st["doc_freq"]), int(s.sim.doc_count)
    dl = int(K.byte4_to_int(np.array([dlq], dtype=np.uint8))[0])
    avgdl = s.sim.sum_ttf / max(s.sim.doc_count, 1)
    details = [
        _node(
            True, float(idf),
            f"idf, computed as log(1 + (N - n + 0.5) / (n + 0.5)) from:",
            [
                _node(True, n, "n, number of documents containing term"),
                _node(True, N, "N, total number of documents"),
            ],
        ),
        _node(
            True, tf, "freq, occurrences of term within document",
            [
                _node(True, dl, "dl, length of field (SmallFloat-decoded)"),
                _node(True, avgdl, "avgdl, average length of field"),
            ],
        ),
    ]
    return _node(
        True, val,
        f"weight({term!r} in {doc_id}) [{type(s.sim).__name__}], score(freq={tf})",
        details,
    )


def _expansion_leaf(s, query: dict, doc_id: int) -> dict:
    """Constant-score multi-term queries: match iff the doc carries any
    expanded term; value = boost (MultiTermQuery constant-score rewrite)."""
    terms = s.expand_query_terms(query)
    boost = np.float32(query.get("boost", 1.0))
    if not terms:
        return _no_match(f"{query.get('type')} expanded to 0 terms")
    stats = s.term_stats(terms)
    live = [t for t in terms if t in stats]
    arrs = s._driver_collect_postings(live, doc_id=int(doc_id)) if live else None
    matched = []
    if arrs:
        for t, (docs, _tfs, _dlqs) in arrs.items():
            i = int(np.searchsorted(docs, int(doc_id)))
            if i < len(docs) and int(docs[i]) == int(doc_id):
                matched.append(t)
    if not matched:
        return _no_match(
            f"{query.get('type')}: doc {doc_id} matches none of "
            f"{len(live)} expanded terms"
        )
    return _node(
        True, boost,
        f"ConstantScore({query.get('type')}, {len(live)} terms, "
        f"doc matches {sorted(matched)!r})",
    )


def explain(s, query: dict, doc_id: int) -> dict:
    """Explanation for query against doc_id (IndexSearcher.explain).
    The returned tree's `value` equals search()'s float32 score for the
    doc; `match` is False (value 0) when the doc does not satisfy the
    query. Deleted docs never match (Lucene reads through the live-docs
    view)."""
    from lucene_rust_spark.oracle.bm25 import bool_query

    doc_id = int(doc_id)
    qt = query.get("type")

    # tombstoned docs match nothing (live-docs view)
    if s.tombstones is not None:
        t = s.tombstones.filter(f"doc_id = {doc_id}").take(1)
        if t:
            return _no_match(f"doc {doc_id} is deleted")

    if qt == "term":
        return _term_leaf(s, query["term"], doc_id)

    if qt == "bool":
        from lucene_rust_spark.oracle.bm25 import query_terms

        must_l, should_l, mnot_l, msm = query_terms(query)
        must = sorted(set(must_l))
        should = sorted(set(should_l))
        mnot = sorted(set(mnot_l))
        stats = s.term_stats(sorted(set(must) | set(should) | set(mnot)))
        leaves = {t: _term_leaf(s, t, doc_id, stats) for t in set(must) | set(should)}
        not_hits = [
            t for t in mnot if _term_leaf(s, t, doc_id, stats)["match"]
        ]
        details, failures = [], []
        for t in sorted(set(must) | set(should)):
            e = leaves[t]
            role = "MUST" if t in must else "SHOULD"
            e = dict(e, description=f"{role} {e['description']}")
            details.append(e)
        if not_hits:
            failures.append(f"MUST_NOT clause(s) {not_hits!r} match")
        missing_must = [t for t in must if not leaves[t]["match"]]
        if missing_must:
            failures.append(f"MUST clause(s) {missing_must!r} do not match")
        n_should = sum(1 for t in should if leaves[t]["match"])
        need = max(msm, 0 if must else 1) if should else 0
        if should and n_should < need:
            failures.append(
                f"only {n_should} of required {need} SHOULD clause(s) match"
            )
        if not must and not should:
            failures.append("no scoring clauses")
        if failures:
            return _no_match("; ".join(failures), details)
        # the pinned combine: float32 fold in ascending-term order
        acc = np.float32(0.0)
        for t in sorted(set(must) | set(should)):
            if leaves[t]["match"]:
                acc = np.float32(acc + np.float32(leaves[t]["value"]))
        return _node(True, acc, "sum of (float32 fold, ascending term):", details)

    if qt == "synonym":
        terms = sorted(set(query["terms"]))
        stats = s.term_stats(terms)
        live = [t for t in terms if t in stats]
        if not live:
            return _no_match("synonym: no term in index")
        arrs = s._driver_collect_postings(live, doc_id=doc_id) or {}
        freq, dlq, matched = 0, 0, []
        for t in live:
            if t not in arrs:
                continue
            docs, tfs, dlqs = arrs[t]
            i = int(np.searchsorted(docs, doc_id))
            if i < len(docs) and int(docs[i]) == doc_id:
                freq += int(tfs[i])
                dlq = max(dlq, int(dlqs[i]))
                matched.append(t)
        if not matched:
            return _no_match(f"synonym: doc {doc_id} matches no variant")
        df_blend = max(stats[t]["doc_freq"] for t in live)
        ttf_sum = sum(stats[t]["total_term_freq"] for t in live)
        w = np.float32(s.sim.weight(df_blend, ttf_sum))
        val = np.float32(
            s.sim.score(
                np.array([freq], dtype=np.int64),
                np.array([dlq], dtype=np.int64),
                np.array([w], dtype=np.float32),
            )[0]
        )
        return _node(
            True, val,
            f"Synonym({live!r}) blended df={df_blend}, freq=sum={freq}",
            [_node(True, float(w), "blended idf (df=max, ttf=sum)")],
        )

    if qt == "dismax":
        tie = float(query.get("tie", 0.0))
        terms = sorted({c["term"] for c in query["queries"]})
        leaves = {t: _term_leaf(s, t, doc_id) for t in terms}
        matched = [t for t in terms if leaves[t]["match"]]
        if not matched:
            return _no_match(
                f"dismax: doc {doc_id} matches no clause",
                [leaves[t] for t in terms],
            )
        val = K.dismax_combine(
            [np.float32(leaves[t]["value"]) for t in matched], tie
        )
        return _node(
            True, val, f"max plus {tie} times others of:",
            [leaves[t] for t in terms],
        )

    if qt == "fuzzy":
        terms = s.expand_query_terms(query)
        if not terms:
            return _no_match("fuzzy expanded to 0 terms")
        inner = explain(s, bool_query(should=terms), doc_id)
        desc = f"fuzzy({query.get('term')!r}) scoring-rewrite to {len(terms)} terms; "
        return dict(inner, description=desc + inner["description"])

    if qt in ("phrase", "multi_phrase", "ngram_phrase"):
        return _explain_phrase(s, query, doc_id)

    if qt in CONSTANT_SCORE_TYPES:
        return _expansion_leaf(s, query, doc_id)

    if qt == "match_all":
        return _node(True, np.float32(query.get("boost", 1.0)), "MatchAllDocsQuery")

    if qt == "match_none":
        return _no_match("MatchNoDocsQuery")

    if qt == "boost":
        inner = explain(s, query["query"], doc_id)
        b = np.float32(query["boost"])
        if not inner["match"]:
            return _no_match(f"boost({float(b)}) of non-matching query", [inner])
        return _node(
            True, np.float32(np.float32(inner["value"]) * b),
            f"boost({float(b)}) product of:", [inner],
        )

    if qt == "const_score":
        inner = explain(s, query["query"], doc_id)
        c = np.float32(query.get("score", 1.0))
        if not inner["match"]:
            return _no_match("ConstantScore of non-matching query", [inner])
        return _node(True, c, "ConstantScore", [dict(inner, value=0.0)])

    raise ValueError(f"explain: unsupported query type {qt!r}")


def _explain_phrase(s, query: dict, doc_id: int) -> dict:
    """Phrase family: decode THIS doc's positions for the phrase terms
    (zone-map block seek per term), compute the phrase freq with the same
    matcher the driver path uses, score with idf = f32 sum of per-term
    idfs (PhraseWeight semantics)."""
    from lucene_rust_spark.search.searcher import (
        _normalize_ngram_phrase,
        phrase_doc_freq,
    )

    query = _normalize_ngram_phrase(query)
    if not s.manifest.get("positions"):
        raise ValueError("phrase explain requires a positions index")
    slop = int(query.get("slop", 0) or 0)
    slots = s._phrase_slots(query)
    slot_offs = s._phrase_offsets(query, len(slots))
    uniq = sorted({t for sl in slots for t in sl})
    stats = s.term_stats(uniq)
    slots = [[t for t in sl if t in stats] for sl in slots]
    if any(not sl for sl in slots):
        return _no_match("phrase: a position slot has no indexed term")
    lucene_mode = (
        query.get("slop_mode") == "lucene" and query.get("type") != "ngram_phrase"
    )
    uniq = sorted({t for sl in slots for t in sl})
    pos_map, dlq = s._doc_positions(uniq, doc_id)
    if pos_map is None:
        return _no_match(f"phrase: doc {doc_id} lacks a required term")
    empty = np.zeros(0, dtype=np.int64)
    pos_by_slot = [
        np.unique(
            np.concatenate([pos_map.get(t, empty) for t in sl])
            if sl else empty
        )
        for sl in slots
    ]
    if any(len(p) == 0 for p in pos_by_slot):
        return _no_match(f"phrase: doc {doc_id} lacks a required slot term")
    freq = phrase_doc_freq(pos_by_slot, slot_offs, slop, lucene_mode)
    if not freq:
        return _no_match(
            f"phrase: terms present but no aligned occurrence within slop={slop}"
        )
    idf_q = np.float32(0.0)
    details = []
    for t in uniq:
        idf_q = np.float32(idf_q + np.float32(stats[t]["idf"]))
        details.append(_node(True, float(np.float32(stats[t]["idf"])), f"idf({t!r})"))
    tf = np.array([freq], dtype=np.float32 if lucene_mode else np.int64)
    val = np.float32(
        s.sim.score(tf, np.array([dlq], dtype=np.int64),
                    np.array([idf_q], dtype=np.float32))[0]
    )
    return _node(
        True, val,
        f"weight(phrase {slots!r} slop={slop} in {doc_id}), "
        f"score(phraseFreq={float(freq)})",
        details,
    )
