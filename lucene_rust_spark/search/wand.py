"""Block-max WAND pruning — clt/search/mod.rs:167 (w_a_n_d_scorer),
:6 (block_max_maxscore_scorer), :88 (max_score_cache), impacts
clt/index/mod.rs:61 + clt/codecs/mod.rs:5 (competitive_impact_accumulator)
— all [stub] in the reference; Lucene 9 public semantics, re-expressed as a
correctness-neutral two-pass DataFrame plan (SURVEY.md §4).

Per-block score upper bound: ub = bm25(max_tf, min_dlq) — monotone in tf (up)
and dl (down), so it dominates every posting in the block (the impact/
zone-map analog; skip lists clt/codecs/lucene90/mod.rs:22-23 become the
per-block metadata columns first_doc/last_doc/max_tf/min_dlq).

Exactness argument (pure disjunction):
 1. theta = k-th best PARTIAL score from decoding only each term's single
    best-ub block — every partial sum is a lower bound of the true score,
    so theta lower-bounds the true k-th best score.
 2. A block of term t survives if ub(block) + sum_{t' != t} global_ub(t')
    >= theta. A doc whose every appearance is in dropped blocks has true
    score < theta, hence cannot enter the top k.
 3. Candidate docs (from surviving blocks) are rescored EXACTLY against all
    blocks whose [first_doc, last_doc] range contains a candidate — a
    broadcast range join — so pruned blocks of other terms cannot corrupt a
    candidate's final score (the "advance all iterators" step of WAND).
Rank-identity tests run every OR query with pruning on and off.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lucene_rust_spark.functions import kernels as K

_BLOCK_COLS = [
    "term", "seg", "block_no", "n", "first_doc", "last_doc",
    "max_tf", "min_dlq", "sum_tf", "docs_bin", "tfs_bin", "dlq_bin",
]

# Effectiveness guard (measured, BENCH/WAND.md): when the block-max filter
# keeps more than this share of blocks, pruning cannot win — the theta
# pass plus candidate machinery only adds fixed cost on top of a near-full
# decode. Counting kept blocks is a metadata-only aggregate (no posting
# decode), so bailing out here caps the worst case at the theta bootstrap.
MAX_KEPT_RATIO = 0.5


def _with_ub(searcher, blocks: DataFrame, stats: dict) -> DataFrame:
    """Attach the per-block score upper bound, JVM-side, with the 256-entry
    norm cache and the per-term idf inlined as literal arrays/maps
    (driver-side constants — the MaxScoreCache analog).

    Format v2 blocks carry competitive impacts (imp_tf/imp_dlq pareto
    pairs, clt/codecs/mod.rs:5): ub = max over the pairs actually present,
    which is tight. v1 fallback: the (max_tf, min_dlq) corner bound —
    loose (combines tf and norm from different docs) but still sound."""
    cache_arr = F.array(*[F.lit(float(x)) for x in searcher.norm_cache])
    idf_map = F.create_map(
        *[x for t in stats for x in (F.lit(t), F.lit(float(stats[t]["idf"])))]
    )
    idf = idf_map[F.col("term")]
    if "imp_tf" in blocks.columns:
        ub = F.array_max(
            F.zip_with(
                "imp_tf",
                "imp_dlq",
                lambda t, q: idf * (t / (t + F.element_at(cache_arr, q + 1))),
            )
        )
    else:
        ub = idf * (
            F.col("max_tf")
            / (F.col("max_tf") + F.element_at(cache_arr, F.col("min_dlq") + 1))
        )
    return blocks.withColumn("ub", ub)


def wand_candidates(searcher, scoring: list, stats: dict, k: int):
    """Return (blocks_to_decode, candidates_or_None) for an OR query.
    candidates (when not None) must be semi-joined onto the decoded rows
    before combining — rescore blocks contain non-candidate docs whose
    contributions are incomplete. Falls back to (all blocks, None)."""
    cols = _BLOCK_COLS + (
        ["imp_tf", "imp_dlq"] if "imp_tf" in searcher.postings.columns else []
    )
    all_blocks = searcher.postings.filter(F.col("term").isin(list(scoring))).select(*cols)
    blocks = _with_ub(searcher, all_blocks, stats).persist()
    try:
        # global per-term upper bounds (MaxScoreSumPropagator analog)
        g = blocks.groupBy("term").agg(F.max("ub").alias("gub")).collect()
        gub = {r["term"]: float(r["gub"]) for r in g}
        if not gub:
            return all_blocks.limit(0), None
        total_ub = float(np.sum(list(gub.values()), dtype=np.float64))

        # pass 1: threshold from each term's best blocks — ranked by ub,
        # taking blocks until they cumulatively hold >= 4k postings (a
        # single block may be a tiny tail block on fragmented indexes, and
        # fewer than k partial docs would force the no-prune bailout).
        # Exact partial scores are lower bounds of true scores.
        wdesc = Window.partitionBy("term").orderBy(
            F.desc("ub"), F.asc("seg"), F.asc("block_no")
        )
        cum_n = F.sum("n").over(wdesc.rowsBetween(Window.unboundedPreceding, 0))
        best = (
            blocks.withColumn("cum_n", cum_n)
            .filter(F.col("cum_n") - F.col("n") < 4 * k)
            .drop("cum_n", "ub")
        )
        # tombstones must not inflate theta: a deleted doc's partial score
        # is not a lower bound of any LIVE doc's true score, so theta taken
        # over it could exceed the true live k-th score and over-prune
        # (the liveDocs view, clt/index/leaf_reader.rs:250)
        partial = (
            searcher._drop_deleted(
                searcher._scored_postings(scoring, stats, blocks=best)
                .groupBy("doc_id")
                .agg(F.sum("score").alias("ps"))
            )
            .orderBy(F.desc("ps"))
            .limit(k)
            .collect()
        )
        if len(partial) < k:
            return all_blocks, None  # not enough evidence to prune safely
        # shave one part in 1e5: theta is a bound computed in double while
        # true scores combine in float32 — never over-prune by an ulp
        theta = float(partial[-1]["ps"]) * (1.0 - 1e-5)
        if theta <= 0.0:
            return all_blocks, None

        n_total = blocks.count()
        if len(scoring) == 1:
            # single-term fast path (the q001 head-term shape): every
            # posting's score is already complete, so blocks whose upper
            # bound clears theta can be scored directly — no candidate
            # set, no rescore join. A top-10 on a head term now decodes
            # only the competitive blocks instead of the full posting list.
            kept = blocks.filter(F.col("ub") >= F.lit(theta))
            if kept.count() > MAX_KEPT_RATIO * n_total:
                return all_blocks, None  # not selective: exact path wins
            return kept.select(*_BLOCK_COLS), None

        # pass 2: block-max filter — keep blocks that could contribute to a
        # doc reaching theta
        gub_map = F.create_map(*[x for t in gub for x in (F.lit(t), F.lit(gub[t]))])
        kept = blocks.filter(
            F.col("ub") + (F.lit(total_ub) - gub_map[F.col("term")]) >= F.lit(theta)
        )
        if kept.count() > MAX_KEPT_RATIO * n_total:
            # bail BEFORE the candidate pass: scoring near-all postings
            # just to learn the candidate set isn't selective costs more
            # than the exact plan it would replace
            return all_blocks, None

        # candidate docs from kept blocks, filtered by per-doc upper bound
        cand = (
            searcher._scored_postings(scoring, stats, blocks=kept.select(*_BLOCK_COLS))
            .groupBy("doc_id")
            .agg(F.sum("score").alias("ps"), F.collect_set("term").alias("seen"))
        )
        # doc-level bound: partial + sum of global ubs of unseen terms
        unseen_ub = F.lit(total_ub) - F.aggregate(
            "seen", F.lit(0.0), lambda acc, t: acc + gub_map[t]
        )
        # candidates stay DISTRIBUTED: persist + count (one job), then
        # broadcast the DataFrame itself — no driver round-trip of up to
        # 100k doc_ids through collect()/createDataFrame
        cand_df = (
            searcher._drop_deleted(cand.filter(F.col("ps") + unseen_ub >= F.lit(theta)))
            .select(F.col("doc_id").alias("cand"))
            .persist()
        )
        n_cand = cand_df.count()
        if n_cand >= 100_000:
            cand_df.unpersist()
            return all_blocks, None  # not selective enough; bail to exact
        searcher._scratch(cand_df)

        # exact rescoring set: every block containing a candidate (the
        # "advance all iterators to the pivot" step) — broadcast range join
        rescore = all_blocks.join(
            F.broadcast(cand_df),
            (F.col("cand") >= F.col("first_doc")) & (F.col("cand") <= F.col("last_doc")),
            "left_semi",
        )
        return rescore, cand_df
    finally:
        blocks.unpersist()
