"""IndexSearcher — BM25 top-k over the built index (SURVEY.md §3.3).

Reference surface (all [stub] there; Lucene 9 public semantics pinned in
FIXTURES.md): clt/search/index_searcher.rs:12-36 (search entry + consts),
clt/search/mod.rs:149 (TermQuery), :9 (BooleanQuery), :159 (TopScoreDoc
Collector), :161 (TotalHitCountCollector), :167 (WANDScorer — see wand.py).

Spark mapping:
  TermStates/CollectionStatistics gather = driver-side lookup on the tiny
    terms dict (broadcast-style), then constants captured in the decode kernel
  per-leaf scorer             = mapInPandas block-decode + float32 BM25 kernel
  conjunction (leapfrog)      = groupBy(doc_id) match-count filter
  disjunction sum             = groupBy(doc_id) + fixed-order float32 sum
  MUST_NOT (ReqExclScorer)    = left_anti join
  TopScoreDocCollector merge  = orderBy(score desc, doc_id asc).limit(k)
                                (Spark's TakeOrderedAndProject IS the
                                two-level heap merge)
  search_after                = (score, doc_id) keyset predicate before top-k
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_rust_spark.functions import kernels as K
from lucene_rust_spark.index.manifest import read_manifest
from lucene_rust_spark.oracle.bm25 import query_terms

MAX_CLAUSE_COUNT = 1024  # clt/search/index_searcher.rs:1


@F.pandas_udf(T.FloatType())
def _f32_ordered_sum(parts: pd.Series) -> pd.Series:
    """float32 sum of per-term scores in ascending-term order — the pinned
    combination order shared with the oracle (oracle/bm25.py)."""

    def s(lst):
        acc = np.float32(0.0)
        for p in lst:
            acc = np.float32(acc + np.float32(p["score"]))
        return float(acc)

    return parts.map(s)


class IndexSearcher:
    def __init__(self, spark: SparkSession, index_dir: str, cache: bool = False):
        self.spark = spark
        self.index_dir = index_dir
        self.manifest = read_manifest(index_dir)
        if self.manifest is None:
            raise FileNotFoundError(f"no manifest in {index_dir}")
        postings_dir = self.manifest.get("postings_dir", "postings")
        self.postings = spark.read.parquet(os.path.join(index_dir, postings_dir))
        self.terms = spark.read.parquet(os.path.join(index_dir, "terms"))
        self.docmap = spark.read.parquet(os.path.join(index_dir, "docmap"))
        if cache:
            self.postings = self.postings.persist()
        self.doc_count = int(self.manifest["doc_count"])
        self.sum_ttf = int(self.manifest["sum_total_term_freq"])
        # pinned: avgdl from exact integer stats (FIXTURES.md §3)
        self.avgdl = np.float32(np.float64(self.sum_ttf) / np.float64(self.doc_count))
        self.norm_cache = K.bm25_norm_cache(self.avgdl)

    # -- stats gather (TermStates collection, clt/index/mod.rs:173) ----------

    def term_stats(self, terms: list[str]) -> dict[str, dict]:
        if not terms:
            return {}
        rows = (
            self.terms.filter(F.col("term").isin(list(terms)))
            .select("term", "doc_freq", "total_term_freq")
            .collect()
        )
        out = {}
        for r in rows:
            out[r["term"]] = {
                "doc_freq": int(r["doc_freq"]),
                "total_term_freq": int(r["total_term_freq"]),
                "idf": float(K.bm25_idf(int(r["doc_freq"]), self.doc_count)),
            }
        return out

    # -- block decode + score kernel -----------------------------------------

    def _scored_postings(self, terms: list[str], stats: dict, blocks: DataFrame | None = None) -> DataFrame:
        """(doc_id, term, score float32) for every posting of the given terms.
        Term filter is pushed to the parquet scan (term-sorted files → row-group
        pruning plays the terms-dict seek role)."""
        idf_map = {t: np.float32(stats[t]["idf"]) for t in terms if t in stats}
        cache = self.norm_cache
        if blocks is None:
            blocks = self.postings.filter(F.col("term").isin(list(terms)))
        blocks = blocks.select("term", "n", "first_doc", "docs_bin", "tfs_bin", "dlq_bin")

        def decode(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                doc_parts, tf_parts, dlq_parts, idf_parts, term_rep = [], [], [], [], []
                for term, n, first_doc, docs_bin, tfs_bin, dlq_bin in zip(
                    pdf["term"], pdf["n"], pdf["first_doc"], pdf["docs_bin"], pdf["tfs_bin"], pdf["dlq_bin"]
                ):
                    n = int(n)
                    deltas = K.for_unpack(bytes(docs_bin), n)
                    docs = np.int64(first_doc) + np.cumsum(deltas).astype(np.int64)
                    doc_parts.append(docs)
                    tf_parts.append(K.for_unpack(bytes(tfs_bin), n))
                    dlq_parts.append(np.frombuffer(bytes(dlq_bin), dtype=np.uint8))
                    idf_parts.append(np.full(n, idf_map[term], dtype=np.float32))
                    term_rep.append(np.repeat(term, n))
                docs = np.concatenate(doc_parts)
                tfs = np.concatenate(tf_parts)
                dlqs = np.concatenate(dlq_parts)
                idfs = np.concatenate(idf_parts)
                scores = K.bm25_score(tfs, dlqs, idfs, cache)
                yield pd.DataFrame(
                    {
                        "doc_id": docs,
                        "term": np.concatenate(term_rep),
                        "score": scores,
                        "tf": tfs.astype(np.int32),
                    }
                )

        return blocks.mapInPandas(decode, schema="doc_id long, term string, score float, tf int")

    def _matching_docs(self, terms: list[str]) -> DataFrame:
        """doc_ids containing any of the terms (no scoring) — for MUST_NOT."""
        blocks = self.postings.filter(F.col("term").isin(list(terms))).select(
            "n", "first_doc", "docs_bin"
        )

        def decode(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                parts = [
                    np.int64(fd) + np.cumsum(K.for_unpack(bytes(db), int(n))).astype(np.int64)
                    for n, fd, db in zip(pdf["n"], pdf["first_doc"], pdf["docs_bin"])
                ]
                yield pd.DataFrame({"doc_id": np.concatenate(parts)})

        return blocks.mapInPandas(decode, schema="doc_id long").distinct()

    # -- search ---------------------------------------------------------------

    def search_df(
        self,
        query: dict,
        k: int = 10,
        search_after: tuple | None = None,
        prune: bool = False,
    ) -> DataFrame:
        """Top-k as a DataFrame (doc_id long, score float), ordered by
        (score desc, doc_id asc)."""
        must, should, must_not, msm = query_terms(query)
        n_clauses = len(must) + len(should) + len(must_not)
        if n_clauses > MAX_CLAUSE_COUNT:
            raise ValueError(f"too many clauses: {n_clauses} > {MAX_CLAUSE_COUNT}")
        must_set, should_set = sorted(set(must)), sorted(set(should))
        scoring = sorted(set(must_set) | set(should_set))
        stats = self.term_stats(scoring)
        if any(t not in stats for t in must_set):
            return self._empty_result()
        scoring = [t for t in scoring if t in stats]
        if not scoring:
            return self._empty_result()

        if (
            prune
            and not must_not
            and msm == 0
            and not must_set
            and search_after is None
        ):
            from lucene_rust_spark.search.wand import wand_candidates

            blocks, cand = wand_candidates(self, scoring, stats, k)
            scored = self._scored_postings(scoring, stats, blocks=blocks)
            if cand is not None:
                scored = scored.join(
                    F.broadcast(cand), scored.doc_id == cand.cand, "left_semi"
                )
        else:
            scored = self._scored_postings(scoring, stats)

        if len(scoring) == 1 and not must_not:
            hits = scored.select("doc_id", "score")
        else:
            in_must = F.col("term").isin(must_set) if must_set else F.lit(False)
            in_should = F.col("term").isin(should_set) if should_set else F.lit(False)
            grouped = scored.groupBy("doc_id").agg(
                F.sort_array(F.collect_list(F.struct("term", "score"))).alias("parts"),
                F.sum(F.when(in_must, 1).otherwise(0)).alias("n_must"),
                F.sum(F.when(in_should, 1).otherwise(0)).alias("n_should"),
            )
            cond = F.lit(True)
            if must_set:
                cond = cond & (F.col("n_must") == len(must_set))
            if should_set and (msm or not must_set):
                cond = cond & (F.col("n_should") >= max(msm, 0 if must_set else 1))
            hits = grouped.filter(cond).select(
                "doc_id", _f32_ordered_sum(F.col("parts")).alias("score")
            )
            if must_not:
                excl = self._matching_docs(sorted(set(must_not)))
                hits = hits.join(excl, "doc_id", "left_anti")

        if search_after is not None:
            s_a, d_a = float(np.float32(search_after[0])), int(search_after[1])
            hits = hits.filter(
                (F.col("score") < F.lit(s_a))
                | ((F.col("score") == F.lit(s_a)) & (F.col("doc_id") > F.lit(d_a)))
            )
        return hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def search(self, query: dict, k: int = 10, search_after: tuple | None = None, prune: bool = False):
        """Top-k as [(doc_id, score_f32)] — TopDocs analog."""
        rows = self.search_df(query, k, search_after, prune).collect()
        return [(int(r["doc_id"]), float(np.float32(r["score"]))) for r in rows]

    def count(self, query: dict) -> int:
        """TotalHitCountCollector (clt/search/mod.rs:161): exact hit count."""
        must, should, must_not, msm = query_terms(query)
        return self.search_df(query, k=self.doc_count or 1).count()

    def fetch(self, hits_df: DataFrame) -> DataFrame:
        """Join top-k back to the doc map — the stored-fields fetch."""
        return hits_df.join(self.docmap, "doc_id", "inner")

    def _empty_result(self) -> DataFrame:
        return self.spark.createDataFrame([], "doc_id long, score float")
