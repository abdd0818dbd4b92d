"""WAND payoff measurement at scale (VERDICT r2 item 2): build (or reuse)
an 800k-doc index, run representative OR/term queries with prune on/off,
and report latency delta, block prune ratio, candidate restriction, and
rank identity. Writes BENCH/WAND.md + prints one JSON line.

Usage: python tools/bench_wand.py [n_rows] [reps] [--sorted]

--sorted builds the index with sort_key='content_len' (the IndexSorter
hook): docs ordered by length within each segment, which clusters
competitive (short-doc) postings into few blocks — the corpus shape
block-max pruning was designed for. The default (hash-random doc order)
is the adversarial baseline where pruning provably cannot pay
(BENCH/WAND.md r3 findings).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--sorted"]
    use_sort = "--sorted" in sys.argv[1:]
    n_rows = int(args[0]) if len(args) > 0 else 800_000
    reps = int(args[1]) if len(args) > 1 else 3
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from lucene_rust_spark.corpus import gen_corpus_spark
    from lucene_rust_spark.index.build import build_index
    from lucene_rust_spark.index.manifest import read_manifest
    from lucene_rust_spark.index.merge import merge_segments
    from lucene_rust_spark.search.searcher import IndexSearcher
    from lucene_rust_spark.search.wand import wand_candidates
    from lucene_rust_spark.session import get_spark

    spark = get_spark(app="bench_wand", cores=cpus, shuffle_partitions=max(32, cpus),
                      driver_memory="64g")
    spark.sparkContext.setLogLevel("ERROR")

    corpus_dir = f"/tmp/lrs_bench/corpus_{n_rows}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        gen_corpus_spark(spark, n_rows, 2048).write.mode("overwrite").parquet(corpus_dir)
    sort_key = "content_len" if use_sort else None
    suffix = "_sorted" if use_sort else ""
    idx_dir = f"/tmp/lrs_bench/wand_index_{n_rows}{suffix}"
    m = read_manifest(idx_dir)
    if m is None or m.get("doc_count") != n_rows or m.get("sort_key") != sort_key:
        src = spark.read.parquet(corpus_dir)
        build_index(spark, src, idx_dir, num_partitions=max(64, 8 * cpus),
                    sort_key=sort_key, resume=False)
        merge_segments(spark, idx_dir, fan_in=16)

    s = IndexSearcher(spark, idx_dir, cache=True)

    # query shapes: head/mid single terms by df, plus 2- and 3-term ORs
    top = (
        s.terms.orderBy(F.desc("doc_freq")).limit(40)
        .select("term", "doc_freq").collect()
    )
    head = [r["term"] for r in top[:6]]
    mid = [r["term"] for r in top[20:24]]
    rare = (
        s.terms.filter((F.col("doc_freq") >= 500) & (F.col("doc_freq") <= 2000))
        .orderBy(F.desc("doc_freq")).limit(1).collect()
    )
    rare_t = rare[0]["term"] if rare else mid[1]
    shapes = {
        # the classic WAND winner: a rare high-idf term lifts theta above
        # the common term's global upper bound, so the common term's
        # blocks only survive where they contain candidates
        "or_rare_head": {"type": "bool", "must": [], "must_not": [],
                         "min_should_match": 0,
                         "should": [{"type": "term", "term": rare_t},
                                    {"type": "term", "term": head[0]}]},
        "term_head": {"type": "term", "term": head[0]},
        "term_mid": {"type": "term", "term": mid[0]},
        "or2_head": {"type": "bool", "must": [], "must_not": [],
                     "min_should_match": 0,
                     "should": [{"type": "term", "term": t} for t in head[1:3]]},
        "or3_head": {"type": "bool", "must": [], "must_not": [],
                     "min_should_match": 0,
                     "should": [{"type": "term", "term": t} for t in head[3:6]]},
    }

    report: dict = {"n_rows": n_rows, "cpus": cpus, "sort_key": sort_key, "queries": {}}
    for name, q in shapes.items():
        from lucene_rust_spark.oracle.bm25 import query_terms

        _mu, should, _mn, _msm = query_terms(q)
        terms = sorted(set(should))
        stats = s.term_stats(terms)
        n_postings = sum(stats[t]["doc_freq"] for t in terms if t in stats)
        total_blocks = s.postings.filter(F.col("term").isin(terms)).count()
        blocks_df, cand = wand_candidates(s, terms, stats, 10)
        kept_blocks = blocks_df.count()
        n_cand = cand.count() if cand is not None else None

        # warm both paths once, then interleave timed reps
        exact = s.search(q, 10, prune=False)
        pruned = s.search(q, 10, prune=True)
        identical = exact == pruned
        t_exact, t_prune = [], []
        for _ in range(reps):
            t0 = time.time(); s.search(q, 10, prune=False); t_exact.append(time.time() - t0)
            t0 = time.time(); s.search(q, 10, prune=True); t_prune.append(time.time() - t0)
        report["queries"][name] = {
            "terms": terms,
            "n_postings": n_postings,
            "total_blocks": total_blocks,
            "kept_blocks": kept_blocks,
            "block_prune_ratio": round(1.0 - kept_blocks / max(total_blocks, 1), 4),
            "n_candidates": n_cand,
            "exact_ms": [round(x * 1000, 1) for x in t_exact],
            "prune_ms": [round(x * 1000, 1) for x in t_prune],
            "exact_ms_min": round(min(t_exact) * 1000, 1),
            "prune_ms_min": round(min(t_prune) * 1000, 1),
            "speedup": round(min(t_exact) / min(t_prune), 3),
            "rank_identical": identical,
        }
        print(name, json.dumps(report["queries"][name]), flush=True)

    out = ROOT / "BENCH" / ("WAND_SORTED.md" if use_sort else "WAND.md")
    lines = [
        "# BENCH/WAND — block-max WAND payoff at scale",
        "",
        f"Corpus: {n_rows:,} synthetic code files (seed 42), merged index "
        f"(fan_in 16), local[{cpus}], k=10, {reps} interleaved reps per path, "
        f"min reported (steady-state, post-warmup). Index sort: {sort_key}.",
        "",
        "| query | terms | postings | blocks kept/total | prune ratio | cands | exact ms | prune ms | speedup | rank-identical |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name, r in report["queries"].items():
        lines.append(
            f"| {name} | {','.join(r['terms'])} | {r['n_postings']:,} | "
            f"{r['kept_blocks']}/{r['total_blocks']} | {r['block_prune_ratio']} | "
            f"{r['n_candidates']} | {r['exact_ms_min']} | {r['prune_ms_min']} | "
            f"{r['speedup']} | {r['rank_identical']} |"
        )
    out.write_text("\n".join(lines) + "\n")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
