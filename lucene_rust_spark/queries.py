"""Pinned reference query set (FIXTURES.md §4): q001-q080.

Deterministically derived from the corpus vocabulary + oracle df stats,
so the same set is used by pytest rank-identity tests, the oracle golden
generator, and bench.py.
"""

from __future__ import annotations

import numpy as np

from lucene_rust_spark.oracle.bm25 import OracleIndex, bool_query, term_query


def _df_sorted_terms(idx: OracleIndex) -> list[str]:
    """Vocabulary terms sorted by doc_freq desc, term asc (deterministic)."""
    items = [(t, len(p[0])) for t, p in idx.postings.items() if not t.startswith("uniq_")]
    items.sort(key=lambda kv: (-kv[1], kv[0]))
    return [t for t, _ in items]


def build_query_set(idx: OracleIndex) -> list[dict]:
    rng = np.random.default_rng(42)
    terms = _df_sorted_terms(idx)
    n = len(terms)
    head = terms[: max(5, n // 100)]
    torso = terms[n // 4 : n // 2]
    tail = terms[-max(20, n // 10):]

    def pick(pool, j):
        return pool[int(rng.integers(0, len(pool)))] if j is None else pool[j % len(pool)]

    queries: list[dict] = []

    def add(qid, query, k=10, search_after_page=None):
        queries.append(
            {"id": qid, "query": query, "k": k, "search_after_page": search_after_page}
        )

    # q001-q020: single term, mixed df
    for i in range(20):
        pool = [head, torso, tail][i % 3]
        add(f"q{i+1:03d}", term_query(pick(pool, None)))
    # q021-q030: uniq_* single-hit
    uniq_ids = rng.integers(0, idx.doc_count, 10)
    for i, u in enumerate(uniq_ids):
        add(f"q{21+i:03d}", term_query(f"uniq_{int(u)}"))
    # q031-q045: 2-4 term AND
    for i in range(15):
        nt = 2 + i % 3
        ts = [pick([head, torso, tail][(i + j) % 3], None) for j in range(nt)]
        add(f"q{31+i:03d}", bool_query(must=ts))
    # q046-q060: 2-4 term OR
    for i in range(15):
        nt = 2 + i % 3
        ts = [pick([head, torso, tail][(i + j) % 3], None) for j in range(nt)]
        add(f"q{46+i:03d}", bool_query(should=ts))
    # q061-q070: AND+NOT / OR with minShouldMatch=2
    for i in range(10):
        if i % 2 == 0:
            add(
                f"q{61+i:03d}",
                bool_query(must=[pick(head, None), pick(torso, None)], must_not=[pick(torso, None)]),
            )
        else:
            add(
                f"q{61+i:03d}",
                bool_query(should=[pick(head, None), pick(torso, None), pick(tail, None)], min_should_match=2),
            )
    # q071-q075: zero-hit terms
    for i in range(5):
        add(f"q{71+i:03d}", term_query(f"zzz_nosuchterm_{i}"))
    # q076-q080: top-k edges + search_after page 2
    add("q076", term_query(pick(head, 0)), k=1)
    add("q077", term_query(pick(head, 1)), k=100)
    add("q078", bool_query(should=[pick(torso, 3), pick(torso, 4)]), k=10, search_after_page=2)
    add("q079", term_query(pick(head, 2)), k=10, search_after_page=2)
    add("q080", bool_query(must=[pick(head, 3), pick(torso, 5)]), k=100)
    return queries
