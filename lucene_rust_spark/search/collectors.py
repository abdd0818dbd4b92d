"""Composite collectors — the MultiCollector / MultiCollectorManager and
CachingCollector analogs (clt/search/multi_collector.rs,
multi_collector_manager.rs, caching_collector.rs [stubs]; Lucene public
semantics: MultiCollector feeds ONE scorer pass to several collectors;
CachingCollector records the (doc, score) stream so a later collector
can replay it without re-executing the query).

Spark mapping: the scored match set is a DataFrame, so "one scorer
pass" = compute `hits_df` ONCE, persist it, and derive every requested
collector output from the cached frame — top-k, total count (with
threshold relation), per-field facet counts, and field-sorted top-k all
become small jobs over one in-memory scan instead of re-running the
decode pipeline per collector. That is exactly the economics Lucene's
MultiCollector buys (score once, collect many), expressed in the
DataFrame model. CachingCollector is the persisted frame itself, with
`replay(collector_fn)` running any further derivation until released.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CachingCollector:
    """Persisted scored-hits frame (clt/search/caching_collector.rs):
    records the (doc_id, score) stream of one query execution; `replay`
    derives further results without re-scoring; `release` unpersists.

    Unlike Lucene's RAM-bounded variant there is no silent stop-caching
    threshold — Spark spills cached partitions to disk, so replay stays
    exact at any size (the honest large-corpus behavior)."""

    def __init__(self, searcher, query: dict, prune: bool | None = None):
        self.searcher = searcher
        self.query = query
        hits = searcher.hits_df(query, prune=prune)
        self.hits: DataFrame = hits.persist()

    def replay(self, collector_fn):
        """Run `collector_fn(hits_df) -> Any` over the cached stream."""
        return collector_fn(self.hits)

    def top_k(self, k: int = 10) -> DataFrame:
        return self.searcher._finish(self.hits, k, None)

    def total_hits(self) -> int:
        # live-docs semantics: deleted docs vanish from counts
        return self.searcher._drop_deleted(self.hits).count()

    def release(self) -> None:
        self.hits.unpersist()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.release()
        return False


def multi_collect(
    searcher,
    query: dict,
    *,
    k: int = 10,
    with_count: bool = True,
    count_threshold: int | None = None,
    facet_fields: tuple[str, ...] = (),
    facet_top_n: int = 10,
    sort: list[dict] | None = None,
    prune: bool | None = None,
) -> dict:
    """MultiCollector(Manager): one scored pass, many collectors.

    Returns a dict with (as requested):
      top_k        [(doc_id, score_f32)]  — TopScoreDocCollector
      total_hits   int                    — TotalHitCountCollector
      relation     'EQUAL_TO' | 'GREATER_THAN_OR_EQUAL_TO'
                                          (when count_threshold is set)
      facets       {field: [(value, count), ...]}
      top_k_by_field  [Row, ...]          — TopFieldCollector (sort=)

    The scored frame is computed once and persisted; every collector is
    a small job over the cached scan. facet fields count over the MATCH
    SET (unscored semantics, like SortedSetDocValuesFacetCounts), via a
    semi-join from the cached hits to the docmap."""
    out: dict = {}
    with CachingCollector(searcher, query, prune=prune) as cc:
        rows = cc.top_k(k).collect()
        out["top_k"] = [(int(r["doc_id"]), float(r["score"])) for r in rows]
        if with_count or count_threshold is not None:
            if count_threshold is not None:
                # early-terminating lower bound off the cached frame
                n = (
                    searcher._drop_deleted(cc.hits)
                    .limit(count_threshold + 1)
                    .count()
                )
                out["total_hits"] = min(n, count_threshold)
                out["relation"] = (
                    "GREATER_THAN_OR_EQUAL_TO"
                    if n > count_threshold
                    else "EQUAL_TO"
                )
            else:
                out["total_hits"] = cc.total_hits()
                out["relation"] = "EQUAL_TO"
        if facet_fields:
            out["facets"] = {}
            match_ids = searcher._drop_deleted(cc.hits).select("doc_id")
            for field in facet_fields:
                if field not in searcher.docmap.columns:
                    raise ValueError(f"unknown facet field: {field}")
                counts = (
                    searcher.docmap.join(match_ids, "doc_id", "left_semi")
                    .groupBy(field)
                    .agg(F.count("*").cast("long").alias("count"))
                    .orderBy(F.desc("count"), F.asc(field))
                    .limit(facet_top_n)
                    .collect()
                )
                out["facets"][field] = [(r[field], int(r["count"])) for r in counts]
        if sort:
            # TopFieldCollector off the same match set: join stored
            # fields, order by the requested keys (reuse the searcher's
            # comparator builder for missing-value/reverse semantics)
            sorted_df = searcher.search_by_field(query, sort, k=k, hits=cc.hits)
            out["top_k_by_field"] = sorted_df.collect()
    return out
