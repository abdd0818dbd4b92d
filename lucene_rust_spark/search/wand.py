"""Block-max WAND / MaxScore pruning — clt/search/mod.rs:167
(w_a_n_d_scorer), :6 (block_max_maxscore_scorer), :88 (max_score_cache),
impacts clt/index/mod.rs:61 + clt/codecs/mod.rs:5
(competitive_impact_accumulator) — all [stub] in the reference; Lucene 9
public semantics, re-expressed as a correctness-neutral two-pass DataFrame
plan (SURVEY.md §4).

Per-block score upper bound: ub = max BM25 over the block's competitive
impact pairs (tf, dlq) — each pair is PRESENT in the block, so the max
dominates every posting in it (the impact/zone-map analog; skip lists
clt/codecs/lucene90/mod.rs:22-23 become the per-block metadata columns).

r4 redesign (VERDICT r3 item 1) — the planning pass is METADATA-ONLY
(impact pairs + block doc ranges; no posting decode job) and implements
three stacked Lucene ideas:

 1. **theta without decoding**: within one term, every impact pair is the
    exact float32 BM25 score of >= 1 distinct doc (pairs within a block
    are distinct (tf, dlq) → distinct docs; a term's blocks cover
    disjoint doc ranges). The k-th largest pair score of a term is
    therefore a sound lower bound of the k-th best true score. Multi-term
    ORs refine theta with the k-th best PARTIAL SUM over each term's
    best blocks, decoded on the driver (a few KB of packed bins — the
    block identities came from the same metadata pass).
 2. **MaxScore essential terms** (block_max_maxscore_scorer): order terms
    by global ub ascending; the maximal prefix whose ub sum stays < theta
    is non-essential — no doc can reach theta through those terms alone,
    so candidate generation reads ONLY essential terms' blocks.
    Zero-idf head terms (df ≈ N) stop flooding the candidate set.
 3. **doc-range-aligned block bounds** (the real block-max WAND pivot
    bound): bound(b of t) = ub(b) + Σ_{t'≠t} max ub over t''s blocks
    OVERLAPPING b's [first_doc, last_doc] range. Every doc in b takes its
    t' contribution from a t'-block overlapping b, so bound dominates
    every doc in b. On an index-sorted corpus (build sort_key=
    'content_len') competitive blocks of all terms cluster at low doc_ids
    — the aligned bound collapses for long-doc blocks and pruning fires
    (BENCH/WAND_SORTED.md); on hash-random doc order it degrades to the
    gub bound (BENCH/WAND.md: provably ~0 prune there).

Candidates from surviving blocks are rescored EXACTLY against all blocks
whose range contains a candidate (broadcast range join) — pruned blocks of
other terms cannot corrupt a candidate's final score ("advance all
iterators"). Rank-identity tests run every OR query with pruning on/off.

Planner flavors: driver (default, <= DRIVER_PLAN_MAX_POSTINGS — one
metadata collect, numpy) and DataFrame (beyond — same algebra as small
JVM aggregates with the gub bound; still decode-free planning).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BLOCK_COLS = [
    "term", "seg", "block_no", "n", "first_doc", "last_doc",
    "max_tf", "min_dlq", "sum_tf", "docs_bin", "tfs_bin", "dlq_bin",
]

# Effectiveness guard (measured, BENCH/WAND.md): when the planner keeps
# more than this share of candidate-generating blocks, pruning cannot win —
# the candidate machinery only adds fixed cost on top of a near-full
# decode. The kept count comes from the metadata pass, so bailing here
# costs nothing further.
MAX_KEPT_RATIO = 0.5

# Driver planner bound: metadata rows ≈ postings/128; 16M postings ≈ 125k
# rows of small scalars + short impact arrays — a few-MB collect. Beyond
# it the DataFrame planner keeps everything distributed.
DRIVER_PLAN_MAX_POSTINGS = 16_000_000

# Max (term, seg, block-no-interval) literals pushed into the kept-blocks
# scan filter before falling back to one whole [min,max] interval per
# (term, seg) — a sound superset that stays a tiny plan.
MAX_KEPT_INTERVALS = 512

# theta safety shave: theta evidence is exact float32 scores, but bounds
# combine in double — never over-prune by an ulp.
_THETA_SHAVE = 1.0 - 1e-5


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


def _tomb_block_mask(searcher, first_doc: np.ndarray, last_doc: np.ndarray):
    """Boolean mask: block contains >= 1 tombstoned doc. None = unknown
    (tombstone set too large for the driver) — caller must not prune."""
    if searcher.tombstones is None:
        return np.zeros(len(first_doc), dtype=bool)
    if not searcher._driver_tomb_ready():
        return None
    t = searcher._tomb_ids
    if not len(t):
        return np.zeros(len(first_doc), dtype=bool)
    lo = np.searchsorted(t, first_doc, side="left")
    hi = np.searchsorted(t, last_doc, side="right")
    return hi > lo


def _essential_terms(gub: dict, theta: float) -> list:
    """MaxScore split: drop the maximal ascending-gub prefix whose sum
    stays below theta — docs matching only those terms cannot reach it."""
    order = sorted(gub, key=lambda t: gub[t])
    cum = 0.0
    ess = []
    for i, t in enumerate(order):
        if cum + gub[t] < theta and i < len(order) - 1:
            cum += gub[t]
        else:
            ess = order[i:]
            break
    return ess or order[-1:]


def wand_candidates(searcher, scoring: list, stats: dict, k: int):
    """Return (blocks_to_decode, candidates_or_None) for an OR query.
    candidates (when not None) must be semi-joined onto the decoded rows
    before combining — rescore blocks contain non-candidate docs whose
    contributions are incomplete. Falls back to (all blocks, None)."""
    has_imp = "imp_tf" in searcher.postings.columns
    cols = _BLOCK_COLS + (["imp_tf", "imp_dlq"] if has_imp else [])
    all_blocks = searcher.postings.filter(F.col("term").isin(list(scoring))).select(*cols)
    exact = (all_blocks.select(*_BLOCK_COLS), None)
    if not has_imp:
        # v1 format: no exact impact evidence for a decode-free theta —
        # pruning is not worth a scored bootstrap pass (measured r2/r3)
        return exact

    est = sum(stats[t]["doc_freq"] for t in scoring if t in stats)
    if est <= DRIVER_PLAN_MAX_POSTINGS:
        plan = _plan_driver(searcher, all_blocks, scoring, stats, k)
    else:
        plan = _plan_dataframe(searcher, all_blocks, scoring, stats, k)
    if plan is None:
        return exact
    if plan["n_kept"] > MAX_KEPT_RATIO * plan["n_total"]:
        return exact

    kept_blocks = plan["kept_filter"](all_blocks).select(*_BLOCK_COLS)
    if len(scoring) == 1:
        # single-term fast path: every posting's score is already complete,
        # so surviving blocks are scored directly — no candidate set, no
        # rescore join. A top-10 on a head term decodes only the
        # competitive blocks instead of the full posting list.
        return kept_blocks, None
    return _candidate_pass(
        searcher, all_blocks, kept_blocks, plan["essential"], stats,
        plan["theta"], plan["gub"], plan["total_ub"],
    )


def _pair_scores(searcher, stats: dict, term: str, imp_tf, imp_dlq) -> np.ndarray:
    """Exact float32 scores of a block's competitive pairs (engine kernel)."""
    tfs = np.asarray(imp_tf, dtype=np.int64)
    dlqs = np.asarray(imp_dlq, dtype=np.int64)
    idf = np.full(len(tfs), np.float32(stats[term]["idf"]), dtype=np.float32)
    return searcher.sim.score(tfs, dlqs, idf)


def _range_max_other(by_term: dict, term: str, f: np.ndarray, l: np.ndarray) -> np.ndarray:
    """Σ over other terms of (max ub among their blocks overlapping [f,l]),
    vectorized per query-block. Each term's blocks are disjoint sorted
    intervals, so the overlap set is a contiguous index window —
    np.maximum.reduceat over [start, end) pairs."""
    out = np.zeros(len(f), dtype=np.float64)
    for t2, (f2, l2, ub2) in by_term.items():
        if t2 == term or not len(f2):
            continue
        s = np.searchsorted(l2, f, side="left")
        e = np.searchsorted(f2, l, side="right")
        # typical window is 1-3 blocks (disjoint intervals at comparable
        # granularity), so the per-window max loop is cheap; single-block
        # windows (the common case) are fully vectorized
        one = e == s + 1
        out[one] += ub2[s[one]]
        for i in np.flatnonzero(e > s + 1):
            out[i] += float(ub2[s[i]:e[i]].max())
    return out


def _plan_driver(searcher, all_blocks: DataFrame, scoring, stats, k):
    """One metadata collect → plan dict. None = don't prune."""
    rows = all_blocks.select(
        "term", "seg", "block_no", "n", "first_doc", "last_doc", "imp_tf", "imp_dlq"
    ).collect()
    if not rows:
        return None
    n_total = len(rows)
    term_a = np.array([r["term"] for r in rows], dtype=object)
    seg_a = np.fromiter((r["seg"] for r in rows), np.int64, n_total)
    bno_a = np.fromiter((r["block_no"] for r in rows), np.int64, n_total)
    first = np.fromiter((r["first_doc"] for r in rows), np.int64, n_total)
    last = np.fromiter((r["last_doc"] for r in rows), np.int64, n_total)
    n_a = np.fromiter((r["n"] for r in rows), np.int64, n_total)
    tomb = _tomb_block_mask(searcher, first, last)
    if tomb is None:
        return None
    ubs = np.empty(n_total, dtype=np.float64)
    per_term_pairs: dict[str, list] = {t: [] for t in scoring}
    for i, r in enumerate(rows):
        sc = _pair_scores(searcher, stats, r["term"], r["imp_tf"], r["imp_dlq"])
        ubs[i] = float(sc.max()) if len(sc) else 0.0
        if not tomb[i]:
            per_term_pairs[r["term"]].append(sc)
    gub: dict[str, float] = {}
    for i in range(n_total):
        t = term_a[i]
        if t not in gub or ubs[i] > gub[t]:
            gub[t] = float(ubs[i])
    total_ub = float(np.sum(list(gub.values()), dtype=np.float64))

    theta = 0.0
    for t, chunks in per_term_pairs.items():
        if not chunks:
            continue
        sc = np.concatenate(chunks)
        if len(sc) < k:
            continue  # fewer than k distinct live docs in evidence
        theta = max(theta, float(np.partition(sc, -k)[-k]))
    # doc-range-aligned bound, per segment (blocks of different segments
    # never share docs): bound(b) = ub(b) + Σ_{t'≠t} rangemax_{t'}(b).
    # Theta-independent, so computed once and reused by the pre-check.
    bound = ubs.copy()
    if len(scoring) > 1:
        for s in np.unique(seg_a):
            in_seg = seg_a == s
            by_term = {}
            for t in scoring:
                m = in_seg & (term_a == t)
                order = np.argsort(first[m])
                by_term[t] = (first[m][order], last[m][order], ubs[m][order])
            for t in scoring:
                m = in_seg & (term_a == t)
                if not m.any():
                    continue
                bound[m] = ubs[m] + _range_max_other(by_term, t, first[m], last[m])

    def kept_at(theta_v: float) -> np.ndarray:
        ess = set(_essential_terms(gub, theta_v))
        in_ess = np.fromiter((t in ess for t in term_a), bool, n_total)
        return in_ess & (bound >= theta_v)

    if len(scoring) > 1:
        # Planning-overhead guard (r6): evaluate the kept set at the
        # pair-score theta BEFORE paying the partial-sum decode (a Spark
        # collect of ~terms × 4k postings). The shapes where pruning pays
        # (rare + common → MaxScore term drop) already prune here;
        # comparable-gub ORs stay at kept≈total even after refinement
        # (or3_head: 8886/8886 with full planning), so a kept-ratio
        # failure at pair theta returns the exact plan without the
        # decode job. Heuristic, not a soundness condition: skipping
        # only costs pruning, never correctness.
        pre = theta * _THETA_SHAVE
        if pre > 0.0 and int(kept_at(pre).sum()) > MAX_KEPT_RATIO * n_total:
            return None
        theta = max(
            theta,
            _theta_from_partials(searcher, stats, term_a, ubs, n_a, seg_a, bno_a, k),
        )
    theta *= _THETA_SHAVE
    if theta <= 0.0:
        return None

    essential = _essential_terms(gub, theta)
    kept_mask = kept_at(theta)
    n_kept = int(kept_mask.sum())
    keys = list(zip(term_a[kept_mask], seg_a[kept_mask], bno_a[kept_mask]))
    return {
        "theta": theta,
        "gub": gub,
        "total_ub": total_ub,
        "essential": essential,
        "n_kept": n_kept,
        "n_total": n_total,
        "kept_filter": lambda blocks, _k=keys: blocks.filter(_kept_expr(_k)),
    }


def _kept_expr(keys: list):
    """(term, seg, block_no) membership as per-(term, seg) block_no
    intervals — pushable small predicates instead of thousands of tuple
    literals. Interval gaps are filled when the literal budget is hit
    (sound superset)."""
    if not keys:
        return F.lit(False)
    by_ts: dict[tuple, list] = {}
    for t, s, b in keys:
        by_ts.setdefault((t, int(s)), []).append(int(b))
    intervals = []
    for (t, s), bs in by_ts.items():
        bs.sort()
        runs = []
        lo = prev = bs[0]
        for b in bs[1:]:
            if b == prev + 1:
                prev = b
            else:
                runs.append((lo, prev))
                lo = prev = b
        runs.append((lo, prev))
        intervals.extend((t, s, a, b) for a, b in runs)
    if len(intervals) > MAX_KEPT_INTERVALS:
        intervals = [
            (t, s, min(bs), max(bs)) for (t, s), bs in by_ts.items()
        ]
    # ONE SQL string, not an OR chain of Column objects: py4j marshals
    # each Column op separately (~0.7 ms each — seconds at 512 intervals)
    def term_eq(t: str) -> str:
        # public API accepts arbitrary term strings; backslashes, quotes,
        # or control chars would break (or subvert) a quoted literal —
        # compare via hex(UTF-8) for anything outside the safe set
        if all(c.isalnum() or c in "_-." for c in t) and t.isascii():
            return f"term = '{t}'"
        return f"hex(encode(term, 'UTF-8')) = '{t.encode('utf-8').hex().upper()}'"

    parts = [
        f"({term_eq(t)} AND seg = {s} AND block_no BETWEEN {a} AND {b})"
        for t, s, a, b in intervals
    ]
    return F.expr(" OR ".join(parts))


def _theta_from_partials(searcher, stats, term_a, ubs, n_a, seg_a, bno_a, k) -> float:
    """k-th best partial score over each term's highest-ub blocks, decoded
    driver-side (one small collect of ~terms × 4k postings worth of packed
    bins; the block identities came from the metadata pass). Multi-term
    theta refinement: top docs containing several query terms push theta
    toward sum(gub), which is what drops non-competitive blocks."""
    from lucene_rust_spark.functions import kernels as K

    keys = []
    for t in np.unique(term_a):
        m = np.flatnonzero(term_a == t)
        order = m[np.argsort(-ubs[m], kind="stable")]
        cum = 0
        for i in order:
            keys.append((term_a[i], int(seg_a[i]), int(bno_a[i])))
            cum += int(n_a[i])
            if cum >= 4 * k:
                break
    rows = (
        searcher.postings.filter(_kept_expr(keys))
        .select("term", "n", "first_doc", "docs_bin", "tfs_bin", "dlq_bin")
        .collect()
    )
    per_term: dict[str, list] = {}
    ns = np.fromiter((r["n"] for r in rows), dtype=np.int64, count=len(rows))
    docs_dec = K.for_unpack_batch([r["docs_bin"] for r in rows], ns)
    tfs_dec = K.for_unpack_batch([r["tfs_bin"] for r in rows], ns)
    for r, ddec, tdec in zip(rows, docs_dec, tfs_dec):
        docs = np.int64(r["first_doc"]) + np.cumsum(ddec).astype(np.int64)
        tfs = tdec.astype(np.int64)
        dlqs = np.frombuffer(bytes(r["dlq_bin"]), dtype=np.uint8).astype(np.int64)
        per_term.setdefault(r["term"], []).append((docs, tfs, dlqs))
    if not per_term:
        return 0.0
    arrs = {
        t: tuple(np.concatenate(x) for x in zip(*lst)) for t, lst in per_term.items()
    }
    all_docs = np.unique(np.concatenate([a[0] for a in arrs.values()]))
    acc = np.zeros(len(all_docs), dtype=np.float32)
    for t in sorted(arrs):  # ascending term — the pinned f32 fold order
        docs, tfs, dlqs = arrs[t]
        idx = np.searchsorted(all_docs, docs)
        s = searcher.sim.score(
            tfs, dlqs, np.full(len(tfs), np.float32(stats[t]["idf"]), np.float32)
        )
        acc[idx] = (acc[idx] + s).astype(np.float32)
    # tombstoned docs' partials bound no LIVE doc's score
    all_docs, acc = searcher._drop_deleted_np(all_docs, acc)
    if len(acc) < k:
        return 0.0
    return float(np.partition(acc, -k)[-k])


def _plan_dataframe(searcher, all_blocks: DataFrame, scoring, stats, k):
    """The same planning algebra as _plan_driver for cluster-scale head
    terms (metadata too big to collect), as a few small JVM aggregates:
    theta from impact pairs + a tiny best-blocks partial-sum decode,
    MaxScore essential split, gub block bound (the range-aligned bound
    stays driver-only — it needs random access to the interval arrays).
    Still no full posting decode during planning."""
    if searcher.tombstones is not None:
        if not searcher._driver_tomb_ready():
            return None
        tomb_ok = _tomb_filter_expr(searcher)
    else:
        tomb_ok = F.lit(True)
    meta = _with_ub(
        searcher,
        all_blocks.select(
            "term", "seg", "block_no", "n", "first_doc", "last_doc",
            "imp_tf", "imp_dlq",
        ),
        stats,
    ).persist()
    try:
        g = meta.groupBy("term").agg(
            F.max("ub").alias("gub"), F.count("*").alias("n_blocks")
        ).collect()
        gub = {r["term"]: float(r["gub"]) for r in g}
        n_total = int(sum(r["n_blocks"] for r in g))
        if not gub:
            return None
        total_ub = float(np.sum(list(gub.values()), dtype=np.float64))
        # per-term k-th largest pair score over tombstone-free blocks
        cache_arr = F.array(*[F.lit(float(x)) for x in searcher.norm_cache])
        idf_map = F.create_map(
            *[x for t in stats for x in (F.lit(t), F.lit(float(stats[t]["idf"])))]
        )
        pair = meta.filter(tomb_ok).select(
            "term",
            F.explode(
                F.zip_with(
                    "imp_tf",
                    "imp_dlq",
                    lambda t, q: (
                        idf_map[F.col("term")]
                        * (t / (t + F.element_at(cache_arr, q + 1)))
                    ).cast("float"),
                )
            ).alias("ps"),
        )
        w = Window.partitionBy("term").orderBy(F.desc("ps"))
        kth = (
            pair.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == k)
            .agg(F.max("ps").alias("theta"))
            .collect()[0]["theta"]
        )
        if kth is None:
            return None
        theta = float(kth)

        def kept_count(theta_v: float) -> int:
            ess = _essential_terms(gub, theta_v)
            thr_v = {t: theta_v - (total_ub - gub[t]) for t in gub}
            tm = F.create_map(
                *[x for t in thr_v for x in (F.lit(t), F.lit(thr_v[t]))]
            )
            return int(
                meta.filter(
                    F.col("term").isin(ess) & (F.col("ub") >= tm[F.col("term")])
                ).count()
            )

        if len(scoring) > 1:
            # planning-overhead guard (r6) — same rationale as the
            # driver planner: if the pair theta already keeps more than
            # MAX_KEPT_RATIO of the blocks, skip the partial-sum decode
            # job and return the exact plan immediately
            pre = theta * _THETA_SHAVE
            if pre > 0.0 and kept_count(pre) > MAX_KEPT_RATIO * n_total:
                return None
        if len(scoring) > 1:
            # partial-sum refinement: decode only each term's best blocks
            wdesc = Window.partitionBy("term").orderBy(
                F.desc("ub"), F.asc("seg"), F.asc("block_no")
            )
            cum_n = F.sum("n").over(wdesc.rowsBetween(Window.unboundedPreceding, 0))
            best_keys = (
                meta.withColumn("cum_n", cum_n)
                .filter(F.col("cum_n") - F.col("n") < 4 * k)
                .select("term", "seg", "block_no")
            )
            best = all_blocks.join(
                F.broadcast(best_keys), ["term", "seg", "block_no"], "left_semi"
            )
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
            if len(partial) >= k:
                theta = max(theta, float(partial[-1]["ps"]))
        theta *= _THETA_SHAVE
        if theta <= 0.0:
            return None
        essential = _essential_terms(gub, theta)
        thr = {t: theta - (total_ub - gub[t]) for t in gub}
        thr_map = F.create_map(*[x for t in thr for x in (F.lit(t), F.lit(thr[t]))])
        ess_pred = F.col("term").isin(essential)
        kept = meta.filter(ess_pred & (F.col("ub") >= thr_map[F.col("term")])).count()

        def kept_filter(blocks, _stats=stats, _thr_map=thr_map, _ess=essential):
            return _with_ub(searcher, blocks, _stats).filter(
                F.col("term").isin(_ess) & (F.col("ub") >= _thr_map[F.col("term")])
            )

        return {
            "theta": theta,
            "gub": gub,
            "total_ub": total_ub,
            "essential": essential,
            "n_kept": int(kept),
            "n_total": n_total,
            "kept_filter": kept_filter,
        }
    finally:
        meta.unpersist()


def _tomb_filter_expr(searcher):
    """Conservative 'block avoids the whole tombstone span' test for the
    THETA EVIDENCE only (pruning soundness never depends on evidence
    volume — smaller theta prunes less, never wrongly). Exact per-block
    masking happens in the driver planner."""
    t = searcher._tomb_ids
    if not len(t):
        return F.lit(True)
    lo, hi = int(t[0]), int(t[-1])
    return (F.col("last_doc") < lo) | (F.col("first_doc") > hi)


def _candidate_pass(searcher, all_blocks, kept_blocks, essential, stats, theta, gub, total_ub):
    """Pass 2 for multi-term ORs: partial-score candidates from kept
    (essential-term) blocks, bound by unseen terms' global ubs, then the
    exact-rescore block set via a broadcast range join."""
    gub_map = F.create_map(*[x for t in gub for x in (F.lit(t), F.lit(gub[t]))])

    cand = (
        searcher._scored_postings(essential, stats, blocks=kept_blocks)
        .groupBy("doc_id")
        .agg(F.sum("score").alias("ps"), F.collect_set("term").alias("seen"))
    )
    unseen_ub = F.lit(total_ub) - F.aggregate(
        "seen", F.lit(0.0), lambda acc, t: acc + gub_map[t]
    )
    cand_df = (
        searcher._drop_deleted(cand.filter(F.col("ps") + unseen_ub >= F.lit(theta)))
        .select(F.col("doc_id").alias("cand"))
        .persist()
    )
    n_cand = cand_df.count()
    if n_cand >= 100_000:
        cand_df.unpersist()
        return all_blocks.select(*_BLOCK_COLS), None  # not selective; exact
    searcher._scratch(cand_df)

    rescore = all_blocks.select(*_BLOCK_COLS).join(
        F.broadcast(cand_df),
        (F.col("cand") >= F.col("first_doc")) & (F.col("cand") <= F.col("last_doc")),
        "left_semi",
    )
    return rescore, cand_df
