"""Per-round benchmark (driver contract): index-build throughput +
BM25 query latency on the synthetic code corpus at a size scaled by
$SPARK_GRAFT_SF_DIR, on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "build_sec": ..., "files_per_sec": ..., "query_p50_ms": ...}

The two-parallelism scaling protocol (BASELINE.md §4) lives in
tools/bench_scaling.py and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import pathlib
import re
import shutil
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

CORPUS_ROWS_PER_SF = 200_000  # FIXTURES.md: bench = 200k rows at sf=0.1 scale 1.0


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.1


def bench_queries(idx):
    """Representative slice of the pinned query set (FIXTURES.md §4)."""
    from lucene_rust_spark.queries import build_query_set

    qs = build_query_set(idx)
    want = ["q001", "q002", "q003", "q021", "q031", "q034", "q046", "q049", "q061", "q062", "q076", "q080"]
    return [q for q in qs if q["id"] in want]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_of(sf_dir)
    n_rows = max(2000, int(CORPUS_ROWS_PER_SF * sf))
    # segments sized for wave balance (8 per core-task) without fragmenting
    # posting lists into tail blocks; at 10^9-file scale the same rule
    # gives ~500k-doc segments, Lucene-sized
    num_partitions = max(64, 8 * cpus)

    from lucene_rust_spark.corpus import gen_corpus_pandas, gen_corpus_spark
    from lucene_rust_spark.index.build import build_index
    from lucene_rust_spark.oracle.bm25 import build_oracle_index
    from lucene_rust_spark.queries import build_query_set
    from lucene_rust_spark.search.searcher import IndexSearcher
    from lucene_rust_spark.session import get_spark

    spark = get_spark(app="bench", cores=cpus, shuffle_partitions=max(32, cpus), driver_memory="64g")
    spark.sparkContext.setLogLevel("ERROR")

    # corpus to parquet first (generation is not part of build throughput)
    corpus_dir = f"/tmp/lrs_bench/corpus_{n_rows}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        gen_corpus_spark(spark, n_rows, num_partitions).write.mode("overwrite").parquet(corpus_dir)
    src = spark.read.parquet(corpus_dir)
    spark.range(cpus * 4, numPartitions=cpus * 4).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()  # warm python workers before timing

    idx_dir = f"/tmp/lrs_bench/index_{n_rows}_{cpus}"
    shutil.rmtree(idx_dir, ignore_errors=True)
    t0 = time.time()
    # sort_key: the IndexSorter hook — length-clustered docIDs make the
    # per-block impacts discriminative, so the reported WAND prune ratio
    # reflects the production (sorted) configuration (BENCH/WAND_SORTED.md)
    manifest = build_index(
        spark, src, idx_dir, num_partitions=num_partitions, sort_key="content_len"
    )
    build_sec = time.time() - t0
    assert manifest["doc_count"] == n_rows

    # compact the flush segments (TieredMergePolicy analog): 2048 flush
    # segments fragment posting lists into tail blocks; merging fills FOR
    # blocks back to 128 and shrinks block metadata ~64x. Counted in the
    # reported total (Lucene's background merges are indexing cost too).
    from lucene_rust_spark.index.merge import merge_segments

    t_m = time.time()
    merge_segments(spark, idx_dir, fan_in=16)
    merge_sec = time.time() - t_m

    # query set needs term-df stats → tiny oracle index on a t1-sized sample
    # (query terms are corpus-level, derived deterministically)
    sample_idx = build_oracle_index(gen_corpus_pandas(2000), 8)
    queries = bench_queries(sample_idx)

    searcher = IndexSearcher(spark, idx_dir, cache=True)

    # steady-state protocol: one untimed pass warms the postings cache,
    # Catalyst plan compilation and broadcast machinery per query shape;
    # then N INTERLEAVED timed reps, keeping each query's BEST (this box
    # shows ~2x latency variance under ambient load — interleaved
    # best-of-N is the only repeatable number; see BENCH/ notes)
    def timed_pass(s, reps=3):
        best: dict[str, float] = {}
        for q in queries:
            s.search(q["query"], q["k"])  # warm
        for _ in range(reps):
            for q in queries:
                t1 = time.time()
                s.search(q["query"], q["k"])
                dt = time.time() - t1
                if dt < best.get(q["id"], float("inf")):
                    best[q["id"]] = dt
        return best

    q_times = {k: round(v, 4) for k, v in timed_pass(searcher).items()}
    lat = sorted(q_times.values())
    p50 = lat[len(lat) // 2]

    # transparency: the same queries through the DISTRIBUTED plan (the
    # shape that runs at 100x scale), driver fast path disabled
    searcher.DRIVER_EXEC_MAX_POSTINGS = 0
    dist_lat = sorted(timed_pass(searcher).values())
    searcher.DRIVER_EXEC_MAX_POSTINGS = type(searcher).DRIVER_EXEC_MAX_POSTINGS
    p50_dist = dist_lat[len(dist_lat) // 2]

    # block-max WAND pruning ratio on the heaviest single-term query
    # (auto-off below PRUNE_MIN_POSTINGS; forced here to report the ratio)
    from lucene_rust_spark.search.wand import wand_candidates

    head_q = next(q for q in queries if q["query"]["type"] == "term")
    head_t = head_q["query"]["term"]
    st = searcher.term_stats([head_t])
    from pyspark.sql import functions as F

    total_blocks = searcher.postings.filter(F.col("term") == head_t).count()
    kept_blocks_df, _ = wand_candidates(searcher, [head_t], st, 10)
    kept_blocks = kept_blocks_df.count()
    prune_ratio = round(1.0 - kept_blocks / max(total_blocks, 1), 4)

    # --- sf1 phase (r4, VERDICT item 10): 10x volume -------------------------
    # exercises build wave balance and the driver/distributed crossover at
    # 200k rows; reported as sf1_* fields (the headline `value` stays the
    # sf0.1 protocol so rounds remain comparable). LRS_BENCH_SKIP_SF1=1
    # skips it (debug escape hatch).
    sf1 = {}
    if not os.environ.get("LRS_BENCH_SKIP_SF1"):
        n1 = 200_000
        corpus1 = f"/tmp/lrs_bench/corpus_{n1}"
        if not os.path.exists(os.path.join(corpus1, "_SUCCESS")):
            gen_corpus_spark(spark, n1, 2048).write.mode("overwrite").parquet(corpus1)
        src1 = spark.read.parquet(corpus1)
        idx1 = f"/tmp/lrs_bench/index_{n1}_{cpus}"
        shutil.rmtree(idx1, ignore_errors=True)
        t0 = time.time()
        m1 = build_index(
            spark, src1, idx1, num_partitions=num_partitions, sort_key="content_len"
        )
        b1 = time.time() - t0
        assert m1["doc_count"] == n1
        t0 = time.time()
        merge_segments(spark, idx1, fan_in=16)
        g1 = time.time() - t0
        s1 = IndexSearcher(spark, idx1, cache=True)
        lat1 = sorted(timed_pass(s1).values())
        # the crossover behavior at 10x volume is the 100x-scale signal:
        # report the distributed plan's p50 alongside the driver path
        s1.DRIVER_EXEC_MAX_POSTINGS = 0
        lat1d = sorted(timed_pass(s1).values())
        s1.DRIVER_EXEC_MAX_POSTINGS = type(s1).DRIVER_EXEC_MAX_POSTINGS
        rate1 = n1 / (b1 + g1)
        sf1 = {
            "sf1_corpus_rows": n1,
            "sf1_build_sec": round(b1, 3),
            "sf1_merge_sec": round(g1, 3),
            "sf1_files_per_sec": round(rate1, 1),
            "sf1_rate_ratio": round(rate1 / (n_rows / (build_sec + merge_sec)), 3),
            "sf1_query_p50_ms": round(lat1[len(lat1) // 2] * 1000, 1),
            "sf1_query_p50_ms_distributed": round(lat1d[len(lat1d) // 2] * 1000, 1),
        }

    total = round(build_sec + merge_sec + sum(q_times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "index-build throughput (files/sec) + BM25 top-10 latency p50",
                "value": total,
                "unit": "sec",
                "queries": q_times,
                "sf": sf,
                "corpus_rows": n_rows,
                "cpus": cpus,
                "build_sec": round(build_sec, 3),
                "merge_sec": round(merge_sec, 3),
                "files_per_sec": round(n_rows / (build_sec + merge_sec), 1),
                "query_p50_ms": round(p50 * 1000, 1),
                "query_p50_ms_distributed": round(p50_dist * 1000, 1),
                "wand_block_prune_ratio": prune_ratio,
                **sf1,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
