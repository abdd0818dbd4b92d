"""Multi-field indexing + field-scoped search — the FieldInfos / per-field
postings surface (clt/index/field_infos.rs, 760 LoC impl in the reference;
per-field format dispatch clt/codecs/perfield/per_field_postings_format.rs
[stub]).

Design: one physical sub-index per field (Lucene itself stores per-field
postings as separate streams inside a segment; here each field's postings/
norms/terms live under fields/<name>/). docID assignment is a pure
function of (repo, path, commit), so every field's sub-index shares the
SAME doc_id space — cross-field boolean queries are plain doc_id joins,
no remapping. Per-field collection stats (doc_count, sum_ttf → avgdl,
norms) are therefore exactly Lucene's per-field norms semantics.

Cross-field scoring combination is pinned: float32 left-fold over clauses
sorted by the "field:term" label ascending (the single-field engine's
ascending-term order, lifted to fields)."""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_multi_field_index(
    spark: SparkSession,
    source: DataFrame,
    out_dir: str,
    fields: tuple[str, ...] = ("content",),
    **build_kwargs,
) -> dict:
    """Build one sub-index per indexed field. Every sub-build re-reads the
    source projected to (keys..., field-as-content) — column-pruned parquet
    scans, so each field pass reads only its own column plus keys."""
    from lucene_rust_spark.index.build import build_index

    manifests = {}
    for f in fields:
        src_f = source.select(
            "repo", "path", "commit",
            F.col("lang") if "lang" in source.columns else F.lit("").alias("lang"),
            F.col(f).cast("string").alias("content"),
        )
        manifests[f] = build_index(
            spark, src_f, os.path.join(out_dir, "fields", f), **build_kwargs
        )
    meta = {
        "fields": list(fields),
        "doc_count": manifests[fields[0]]["doc_count"],
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "multifield.json.tmp"), "w") as fh:
        json.dump(meta, fh)
    os.replace(
        os.path.join(out_dir, "multifield.json.tmp"),
        os.path.join(out_dir, "multifield.json"),
    )
    return meta


class MultiFieldSearcher:
    """Field-routing searcher. Single-field queries delegate untouched
    (rank/score identity inherited); cross-field booleans union the
    per-field scored postings on the shared doc_id space."""

    def __init__(self, spark: SparkSession, index_dir: str, cache: bool = False):
        from lucene_rust_spark.search.searcher import IndexSearcher

        self.spark = spark
        with open(os.path.join(index_dir, "multifield.json")) as fh:
            self.meta = json.load(fh)
        self.fields = list(self.meta["fields"])
        self.sub = {
            f: IndexSearcher(spark, os.path.join(index_dir, "fields", f), cache=cache)
            for f in self.fields
        }
        self.default_field = self.fields[0]

    def _route(self, query: dict):
        f = query.get("field", self.default_field)
        if f not in self.sub:
            raise KeyError(f"field {f!r} is not indexed (have {self.fields})")
        return self.sub[f]

    def search_df(self, query: dict, k: int = 10, **kw) -> DataFrame:
        """Single-field queries (any v1 AST + optional 'field') delegate;
        cross-field bool ASTs ({'type':'bool', clauses with per-clause
        'field'}) are executed here."""
        if query.get("type") == "bool" and self._is_cross_field(query):
            return self._cross_field_bool(query, k, **kw)
        return self._route(query).search_df(query, k, **kw)

    def search(self, query: dict, k: int = 10, **kw):
        rows = self.search_df(query, k, **kw).collect()
        return [(int(r["doc_id"]), float(np.float32(r["score"]))) for r in rows]

    def count(self, query: dict) -> int:
        if query.get("type") == "bool" and self._is_cross_field(query):
            return self._cross_field_bool(query, k=0, count_only=True)
        return self._route(query).count(query)

    def matches_df(self, query: dict, doc_ids=None) -> DataFrame:
        """Per-field match spans (field, doc_id, term, position,
        end_position, start_offset, end_offset) — the Matches API over
        the field sub-indexes (search/matches.py)."""
        from lucene_rust_spark.search.matches import multi_field_matches_df

        return multi_field_matches_df(self, query, doc_ids)

    def matches(self, query: dict, doc_id: int):
        """{field: [MatchSpan, ...]} for one doc, None when it does not
        match the query."""
        from lucene_rust_spark.search.matches import multi_field_doc_matches

        return multi_field_doc_matches(self, query, doc_id)

    def _is_cross_field(self, query: dict) -> bool:
        fields = {
            c.get("field", self.default_field)
            for part in ("must", "should", "must_not")
            for c in query.get(part, ())
        }
        return len(fields) > 1

    def _cross_field_bool(self, query: dict, k: int, count_only: bool = False, **kw):
        """MUST/SHOULD/MUST_NOT over (field, term) clauses: per-field scored
        postings tagged with 'field:term' labels, then the single-field
        groupBy/fold plan on the shared doc_id space."""
        from lucene_rust_spark.search.searcher import _f32_fold

        def clauses(part):
            return [
                (c.get("field", self.default_field), c["term"])
                for c in query.get(part, ())
            ]

        must, should, must_not = clauses("must"), clauses("should"), clauses("must_not")
        msm = int(query.get("min_should_match", 0) or 0)
        if msm > len(set(should)):
            return 0 if count_only else self.spark.createDataFrame([], "doc_id long, score float")
        labeled: list[DataFrame] = []
        present: set = set()
        for f, terms in self._group_by_field(set(must) | set(should) | set(must_not)):
            sub = self.sub[f]
            stats = sub.term_stats(terms)
            have = [t for t in terms if t in stats]
            present.update((f, t) for t in have)
            if have:
                scored = sub._scored_postings(have, stats).select(
                    "doc_id",
                    F.concat(F.lit(f + ":"), F.col("term")).alias("term"),
                    "score",
                )
                labeled.append(sub._drop_deleted(scored))
        if any(c not in present for c in set(must)):
            return 0 if count_only else self.spark.createDataFrame([], "doc_id long, score float")
        if not labeled:
            return 0 if count_only else self.spark.createDataFrame([], "doc_id long, score float")
        scored = labeled[0]
        for df in labeled[1:]:
            scored = scored.unionByName(df)

        lab = lambda cs: [f"{f}:{t}" for f, t in sorted(set(cs))]  # noqa: E731
        must_l, should_l, not_l = lab(must), lab(should), lab(must_not)
        in_must = F.col("term").isin(must_l) if must_l else F.lit(False)
        in_should = F.col("term").isin(should_l) if should_l else F.lit(False)
        in_not = F.col("term").isin(not_l) if not_l else F.lit(False)
        grouped = scored.groupBy("doc_id").agg(
            F.collect_list(F.when(~in_not, F.struct("term", "score"))).alias("parts"),
            F.sum(F.when(in_must, 1).otherwise(0)).alias("n_must"),
            F.sum(F.when(in_should, 1).otherwise(0)).alias("n_should"),
            F.sum(F.when(in_not, 1).otherwise(0)).alias("n_not"),
        )
        cond = F.lit(True)
        if must_l:
            cond = cond & (F.col("n_must") == len(must_l))
        if should_l and (msm or not must_l):
            cond = cond & (F.col("n_should") >= max(msm, 0 if must_l else 1))
        if not_l:
            cond = cond & (F.col("n_not") == 0)
        hits = grouped.filter(cond)
        if count_only:
            return hits.count()
        hits = hits.select("doc_id", _f32_fold(F.col("parts")).alias("score"))
        return hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def _group_by_field(self, clause_set):
        by_f: dict[str, list[str]] = {}
        for f, t in clause_set:
            by_f.setdefault(f, []).append(t)
        return [(f, sorted(set(ts))) for f, ts in sorted(by_f.items())]


def oracle_cross_field(sub_oracles: dict, query: dict, k: int = 10):
    """Single-process reference for cross-field booleans: per-field oracle
    scores combined with the same pinned 'field:term'-ascending f32 fold.
    sub_oracles: field -> OracleIndex (identical doc_id spaces)."""
    from lucene_rust_spark.functions.similarities import get_similarity

    default = sorted(sub_oracles)[0]

    def clauses(part):
        return [
            (c.get("field", default), c["term"]) for c in query.get(part, ())
        ]

    must, should, must_not = clauses("must"), clauses("should"), clauses("must_not")
    msm = int(query.get("min_should_match", 0) or 0)
    if msm > len(set(should)):
        return []
    any_idx = sub_oracles[default]
    n = any_idx.doc_count
    per_doc_parts: dict[int, list] = {}
    match_must = np.zeros(n, dtype=np.int32)
    match_should = np.zeros(n, dtype=np.int32)
    match_not = np.zeros(n, dtype=np.int32)
    present = set()
    for f, t in sorted(set(must) | set(should) | set(must_not)):
        idx = sub_oracles[f]
        if t not in idx.postings:
            continue
        present.add((f, t))
        sim = get_similarity("bm25", idx.doc_count, idx.sum_ttf)
        ix, tf = idx.postings[t]
        sc = sim.score(tf, idx.dlq[ix], np.full(len(ix), sim.idf(len(ix)), dtype=np.float32))
        label = f"{f}:{t}"
        for i, v in zip(ix, sc):
            per_doc_parts.setdefault(int(i), []).append((label, np.float32(v)))
        if (f, t) in set(must):
            match_must[ix] += 1
        if (f, t) in set(should):
            match_should[ix] += 1
        if (f, t) in set(must_not):
            match_not[ix] += 1
    if any(c not in present for c in set(must)):
        return []
    out = []
    for i, parts in per_doc_parts.items():
        if set(must) and match_must[i] != len(set(must)):
            continue
        if set(should) and (msm or not set(must)):
            if match_should[i] < max(msm, 0 if set(must) else 1):
                continue
        if match_not[i] > 0:
            continue
        acc = np.float32(0.0)
        for label, v in sorted(parts):
            if label in {f"{f}:{t}" for f, t in set(must_not)}:
                continue
            acc = np.float32(acc + v)
        out.append((int(any_idx.doc_ids[i]), float(acc)))
    order = np.lexsort(
        (np.array([d for d, _ in out]), -np.array([s for _, s in out], dtype=np.float64))
    )[:k] if out else []
    return [out[i] for i in order]


def blended_cross_field_df(
    ms: MultiFieldSearcher,
    clauses: list,
    tie: float = 0.01,
    k: int = 10,
) -> DataFrame:
    """Cross-field BlendedTermQuery (clt/search/mod.rs:3 [stub]; the
    dismax+blend combination real search UIs run: one user term against
    several fields with per-field boosts). clauses: [(field, term, boost)].

    Lucene semantics, lifted to per-field sub-indexes: document frequency
    and ttf are blended to the MAX over all (field, term) clauses and fed
    to each field's similarity — every clause then scores with its OWN
    field's norms (per-field dl/avgdl) times its boost, combined with the
    pinned dismax(tie) fold over 'field:term' labels ascending."""
    import numpy as np

    from lucene_rust_spark.search.searcher import _dismax_fold

    seen = set()
    for f, t, _b in clauses:
        if (f, t) in seen:
            raise ValueError(f"duplicate blended clause {f}:{t}")
        seen.add((f, t))
    stats_by_clause = {}
    for f, t, b in clauses:
        if f not in ms.sub:
            raise KeyError(f"field {f!r} is not indexed (have {ms.fields})")
        st = ms.sub[f].term_stats([t])
        if t in st:
            stats_by_clause[(f, t)] = (st[t], float(np.float32(b)))
    if not stats_by_clause:
        return ms.spark.createDataFrame([], "doc_id long, score float")
    df_blend = max(st["doc_freq"] for st, _ in stats_by_clause.values())
    ttf_blend = max(st["total_term_freq"] for st, _ in stats_by_clause.values())
    labeled = []
    for (f, t), (st, b) in sorted(stats_by_clause.items()):
        sub = ms.sub[f]
        w = float(np.float32(sub.sim.weight(df_blend, ttf_blend)))
        scored = sub._scored_postings([t], {t: {**st, "idf": w}}).select(
            "doc_id",
            F.concat(F.lit(f + ":"), F.col("term")).alias("term"),
            (F.col("score") * F.lit(b)).cast("float").alias("score"),
        )
        labeled.append(sub._drop_deleted(scored))
    scored = labeled[0]
    for df in labeled[1:]:
        scored = scored.unionByName(df)
    hits = (
        scored.groupBy("doc_id")
        .agg(F.collect_list(F.struct("term", "score")).alias("parts"))
        .select("doc_id", _dismax_fold(F.col("parts"), float(tie)).alias("score"))
    )
    return hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def oracle_blended_cross_field(sub_oracles: dict, clauses: list, tie: float = 0.01, k: int = 10):
    """Single-process reference for blended_cross_field_df: same blend,
    same per-field norms, same f32 dismax fold over sorted labels."""
    import numpy as np

    from lucene_rust_spark.functions import kernels as K
    from lucene_rust_spark.functions.similarities import get_similarity

    present = {}
    for f, t, b in clauses:
        idx = sub_oracles[f]
        if t in idx.postings:
            present[(f, t)] = (idx, float(np.float32(b)))
    if not present:
        return []
    df_blend = max(len(idx.postings[t][0]) for (f, t), (idx, _) in present.items())
    ttf_blend = max(
        int(idx.postings[t][1].sum()) for (f, t), (idx, _) in present.items()
    )
    per_doc: dict[int, list] = {}
    any_idx = next(iter(present.values()))[0]
    for (f, t), (idx, b) in sorted(present.items()):
        sim = get_similarity("bm25", idx.doc_count, idx.sum_ttf)
        w = np.float32(sim.weight(df_blend, ttf_blend))
        ix, tf = idx.postings[t]
        sc = sim.score(tf, idx.dlq[ix], np.full(len(ix), w, dtype=np.float32))
        for i, v in zip(ix, sc):
            per_doc.setdefault(int(i), []).append(
                np.float32(np.float32(b) * np.float32(v))
            )
    items = [
        (int(any_idx.doc_ids[i]), float(K.dismax_combine(scs, float(tie))))
        for i, scs in per_doc.items()
    ]
    dids = np.array([d for d, _ in items], dtype=np.int64)
    scores = np.array([s for _, s in items], dtype=np.float32)
    order = np.lexsort((dids, -scores.astype(np.float64)))[:k]
    return [(int(dids[i]), float(scores[i])) for i in order]


def weighted_fields_df(
    ms: MultiFieldSearcher,
    term: str,
    field_weights: dict[str, float],
    k: int = 10,
) -> DataFrame:
    """BM25F-flavored weighted field combination (Robertson & Zaragoza's
    published BM25F reduces to a weighted sum of per-field BM25 scores
    when per-field norms/stats are kept — exactly what the per-field
    sub-indexes store): score(d) = float32 fold over fields ascending of
    w_f * bm25_f(term, d). Fields absent from the index or missing the
    term contribute 0."""
    from lucene_rust_spark.search.searcher import _f32_fold

    labeled = []
    for f in sorted(field_weights):
        if f not in ms.sub:
            raise KeyError(f"field {f!r} is not indexed (have {ms.fields})")
        sub = ms.sub[f]
        stats = sub.term_stats([term])
        if term not in stats:
            continue
        w = F.lit(float(np.float32(field_weights[f]))).cast("float")
        scored = sub._scored_postings([term], stats).select(
            "doc_id",
            F.concat(F.lit(f + ":"), F.col("term")).alias("term"),
            (F.col("score") * w).cast("float").alias("score"),
        )
        labeled.append(sub._drop_deleted(scored))
    if not labeled:
        return ms.spark.createDataFrame([], "doc_id long, score float")
    scored = labeled[0]
    for df in labeled[1:]:
        scored = scored.unionByName(df)
    hits = (
        scored.groupBy("doc_id")
        .agg(F.collect_list(F.struct("term", "score")).alias("parts"))
        .select("doc_id", _f32_fold(F.col("parts")).alias("score"))
    )
    return hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
