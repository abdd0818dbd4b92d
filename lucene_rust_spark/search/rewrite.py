"""Query rewrite: MultiTermQuery-family expansion against the terms
dictionary (clt/search/mod.rs:94 multi_term_query, :108 prefix_query,
:150 term_range_query, :169 wildcard_query, :116 regexp_query,
:58-59 fuzzy_query, :147 term_in_set_query, :129/:160 rewrite methods —
all [stub]; automata core impl'd in the reference:
clt/util/automaton/operations.rs, clt/index/automaton_terms_enum.rs).

Shared by the Spark engine and the oracle so expansions are identical.
Pinned semantics (v1):
- prefix / range / wildcard / regexp / in_set rewrite to CONSTANT_SCORE
  (every matching doc scores boost, Lucene's default rewrite method)
- fuzzy rewrites to a BM25-scored disjunction over matched terms
- expansion is ordered by term asc and capped at MAX_CLAUSE_COUNT (1024),
  raising like Lucene's TooManyClauses beyond it
"""

from __future__ import annotations

import re

MAX_EXPANSIONS = 1024  # clt/search/index_searcher.rs:1


def wildcard_to_regex(pattern: str) -> str:
    """Lucene WildcardQuery: * = any run, ? = one char; everything else
    literal. Anchored."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def levenshtein_within(a: str, b: str, k: int) -> bool:
    """Edit distance(a, b) <= k, banded DP (the LevenshteinAutomata
    analog, clt/util/automaton/levenshtein_automata.rs [stub])."""
    if abs(len(a) - len(b)) > k:
        return False
    if a == b:
        return True
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        lo = max(1, i - k)
        hi = min(len(b), i + k)
        if lo > 1:
            cur[lo - 1] = k + 1
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        if hi < len(b):
            cur[hi + 1 :] = [k + 1] * (len(b) - hi)
        if min(cur[max(0, lo - 1) : hi + 1]) > k:
            return False
        prev = cur
    return prev[len(b)] <= k


def match_terms(q: dict, candidates: list[str]) -> list[str]:
    """Expand a multi-term query against a sorted candidate term list.
    Deterministic: output sorted asc, capped (raises on overflow)."""
    t = q["type"]
    if t == "prefix":
        out = [c for c in candidates if c.startswith(q["prefix"])]
    elif t == "range":
        lo, hi = q.get("lo"), q.get("hi")
        out = [
            c
            for c in candidates
            if (lo is None or c >= lo) and (hi is None or c < hi)
        ]
    elif t in ("wildcard", "regexp"):
        pat = re.compile(
            wildcard_to_regex(q["pattern"]) if t == "wildcard" else "^" + q["pattern"] + "$"
        )
        out = [c for c in candidates if pat.match(c)]
    elif t == "fuzzy":
        k = int(q.get("max_edits", 2))
        term = q["term"]
        out = [c for c in candidates if levenshtein_within(term, c, k)]
    elif t == "in_set":
        want = set(q["terms"])
        out = [c for c in candidates if c in want]
    else:
        raise ValueError(f"not a multi-term query: {t}")
    out = sorted(set(out))
    if len(out) > MAX_EXPANSIONS:
        raise ValueError(f"too many expansions: {len(out)} > {MAX_EXPANSIONS}")
    return out


MULTI_TERM_TYPES = ("prefix", "range", "wildcard", "regexp", "fuzzy", "in_set")
CONSTANT_SCORE_TYPES = ("prefix", "range", "wildcard", "regexp", "in_set")
