"""QueryVisitor — walk a query AST the way Lucene's Query.visit does.

Reference: clt/search/query_visitor.rs [stub; Lucene 9 semantics]. The
extraction primitive behind highlighting, query caching policies, and
term-collection: a visitor receives consume_terms() for exact-term
leaves, consume_terms_matching() for multi-term (automaton) leaves, and
get_sub_visitor(occur, parent) at each boolean boundary — the default
skips MUST_NOT subtrees (their terms never contribute to a match) and
descends everywhere else.
"""

from __future__ import annotations

from lucene_rust_spark.search.rewrite import CONSTANT_SCORE_TYPES

MUST, SHOULD, MUST_NOT, FILTER = "MUST", "SHOULD", "MUST_NOT", "FILTER"


class QueryVisitor:
    """Subclass and override what you need (Lucene's QueryVisitor)."""

    def consume_terms(self, query: dict, *terms: str) -> None:
        """Exact terms this leaf matches (TermQuery, phrase slots, ...)."""

    def consume_terms_matching(self, query: dict, predicate) -> None:
        """A multi-term leaf: predicate(term) -> bool decides membership
        (the ByteRunAutomaton analog). Default: ignore."""

    def visit_leaf(self, query: dict) -> None:
        """A leaf that matches docs without enumerable terms
        (match_all, knn, ...)."""

    def accepts_field(self, field: str | None) -> bool:
        return True

    def get_sub_visitor(self, occur: str, parent: dict) -> "QueryVisitor | None":
        """Visitor for a sub-scope; None prunes the subtree. Lucene's
        default: skip MUST_NOT (terms that must be absent can't
        contribute), descend into everything else with self."""
        if occur == MUST_NOT:
            return None
        return self


class _TermCollector(QueryVisitor):
    def __init__(self):
        self.terms: set[str] = set()

    def consume_terms(self, query, *terms):
        self.terms.update(terms)


def visit_query(query: dict, visitor: QueryVisitor, searcher=None) -> None:
    """Dispatch one query dict into the visitor (Query.visit). searcher
    is only needed for multi-term leaves when the visitor wants the
    predicate grounded against a real terms dict — the predicate passed
    to consume_terms_matching is self-contained either way."""
    qt = query.get("type")
    if qt == "term":
        visitor.consume_terms(query, query["term"])
    elif qt == "bool":
        from lucene_rust_spark.oracle.bm25 import query_terms

        for occur, key in ((MUST, "must"), (SHOULD, "should"), (MUST_NOT, "must_not")):
            clauses = query.get(key, ())
            if not clauses:
                continue
            sub = visitor.get_sub_visitor(occur, query)
            if sub is None:
                continue
            for c in clauses:
                visit_query(c if isinstance(c, dict) else {"type": "term", "term": c}, sub, searcher)
    elif qt in ("synonym",):
        visitor.consume_terms(query, *query["terms"])
    elif qt == "dismax":
        sub = visitor.get_sub_visitor(SHOULD, query)
        if sub is not None:
            for c in query["queries"]:
                visit_query({"type": "term", "term": c["term"]}, sub, searcher)
    elif qt == "blended":
        visitor.consume_terms(query, *(c["term"] for c in query["terms"]))
    elif qt in ("phrase", "multi_phrase", "ngram_phrase"):
        terms = []
        for slot in query.get("terms", ()):  # phrase: flat list
            if isinstance(slot, str):
                terms.append(slot)
            else:
                terms.extend(slot)
        for slot in query.get("slots", ()):  # multi_phrase: list of lists
            terms.extend(slot if not isinstance(slot, str) else [slot])
        visitor.consume_terms(query, *terms)
    elif qt in CONSTANT_SCORE_TYPES or qt == "fuzzy":
        from lucene_rust_spark.search.rewrite import match_candidates

        visitor.consume_terms_matching(
            query, lambda term, _q=query: bool(match_candidates(_q, [term]))
        )
    elif qt in ("boost", "const_score"):
        sub = visitor.get_sub_visitor(FILTER if qt == "const_score" else MUST, query)
        if sub is not None:
            visit_query(query["query"], sub, searcher)
    elif qt in ("match_all", "match_none", "knn", "field_exists"):
        visitor.visit_leaf(query)
    else:
        raise ValueError(f"visit_query: unsupported query type {qt!r}")


def extract_terms(query: dict) -> set[str]:
    """All exact terms a query can match on (Lucene's classic
    extractTerms — MUST_NOT subtrees excluded, multi-term leaves
    excluded because their term sets are index-dependent)."""
    v = _TermCollector()
    visit_query(query, v)
    return v.terms
