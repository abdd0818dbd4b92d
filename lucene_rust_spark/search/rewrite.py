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


def match_candidates(q: dict, candidates) -> list[str]:
    """The raw automaton/DP membership test of a multi-term query over an
    iterable of candidate terms — uncapped, order-preserving. This is the
    per-partition kernel body of the distributed terms-enum intersection
    (clt/index/automaton_terms_enum.rs:1-87 analog); match_terms() wraps it
    with the deterministic sort + clause cap."""
    t = q["type"]
    if t == "prefix":
        return [c for c in candidates if c.startswith(q["prefix"])]
    if t == "range":
        lo, hi = q.get("lo"), q.get("hi")
        return [
            c
            for c in candidates
            if (lo is None or c >= lo) and (hi is None or c < hi)
        ]
    if t == "wildcard":
        pat = re.compile(wildcard_to_regex(q["pattern"]))
        return [c for c in candidates if pat.match(c)]
    if t == "regexp":
        # Lucene's regexp grammar by default (clt/util/automaton/reg_exp.rs;
        # anchored, '.' crosses newline, ^/$ literal, ~/&/# rejected);
        # syntax='python' opts into raw Python-regex semantics
        if q.get("syntax") == "python":
            pat = re.compile("^" + q["pattern"] + "$")
            return [c for c in candidates if pat.match(c)]
        from lucene_rust_spark.search.regexp import compile_lucene_regexp

        matcher = compile_lucene_regexp(q["pattern"])
        return [c for c in candidates if matcher(c)]
    if t == "fuzzy":
        k = int(q.get("max_edits", 2))
        term = q["term"]
        return [c for c in candidates if levenshtein_within(term, c, k)]
    if t == "in_set":
        want = set(q["terms"])
        return [c for c in candidates if c in want]
    raise ValueError(f"not a multi-term query: {t}")


def match_terms(q: dict, candidates: list[str]) -> list[str]:
    """Expand a multi-term query against a sorted candidate term list.
    Deterministic: output sorted asc, capped (raises on overflow)."""
    out = sorted(set(match_candidates(q, candidates)))
    if len(out) > MAX_EXPANSIONS:
        raise ValueError(f"too many expansions: {len(out)} > {MAX_EXPANSIONS}")
    return out


MULTI_TERM_TYPES = ("prefix", "range", "wildcard", "regexp", "fuzzy", "in_set")
CONSTANT_SCORE_TYPES = ("prefix", "range", "wildcard", "regexp", "in_set")
