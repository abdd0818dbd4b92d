"""r7 auxiliary benchmarks (bench.py is frozen; these isolate the pieces).

Usage: python bench_extra.py [n_docs]   (default 20_000)

Reports, each measured in-process or with the bench's own interleaved
best-of-N protocol:
  1. DWPT kernel A/B: regex/pandas path vs Arrow byte-LUT fast path on
     one simulated task (identical outputs asserted elsewhere:
     tests/test_build_fastpath.py).
  2. pack/unpack kernels: per-block vs batched (best-of-4 interleaved).
  3. Spark floors on this host: JVM 1-task collect, Python-task round
     trip (the distributed-path latency floor), VALUES LocalTableScan
     collect (the driver-path result shape).
  4. Single-query KNN: driver fast path vs forced distributed wave on a
     100k x 4-shard HNSW index.
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000


def best_of(fn, reps=5):
    fn()
    b = 1e9
    for _ in range(reps):
        t0 = time.time()
        fn()
        b = min(b, time.time() - t0)
    return b


def main() -> None:
    import pyarrow as pa

    from lucene_rust_spark.corpus import gen_corpus_pandas
    from lucene_rust_spark.functions import kernels as K
    from lucene_rust_spark.index.build import (
        _dwpt_partition,
        _dwpt_partition_arrow,
        block_impacts,
        block_impacts_batch,
    )

    # --- 1. DWPT kernel A/B (one task's slice) ---------------------------
    n_task = min(N, 6250)
    pdf = gen_corpus_pandas(n_task)
    pdf["doc_id"] = np.arange(n_task, dtype=np.int64)
    pdf["part"] = (np.arange(n_task) % 8).astype(np.int64)
    pds = [pdf.iloc[i : i + 2048] for i in range(0, n_task, 2048)]
    rbs = [
        pa.RecordBatch.from_pandas(b[["doc_id", "part", "content"]], preserve_index=False)
        for b in pds
    ]
    t_pd = best_of(lambda: sum(len(o) for o in _dwpt_partition(iter(pds))), reps=2)
    t_ar = best_of(lambda: sum(o.num_rows for o in _dwpt_partition_arrow(iter(rbs))), reps=2)
    print(f"dwpt kernel ({n_task} docs): pandas/regex {t_pd:.2f}s  arrow LUT {t_ar:.2f}s")

    # --- 2. pack/unpack kernels -----------------------------------------
    rng = np.random.default_rng(3)
    v = rng.integers(0, 2**14, 128 * 20000).astype(np.uint64)
    bs = np.arange(0, len(v), 128, dtype=np.int64)
    be = np.minimum(bs + 128, len(v))
    tfs = rng.integers(1, 9, len(v)).astype(np.int64)
    dlqs = rng.integers(0, 256, len(v)).astype(np.int64)
    bufs = K.for_pack_batch(v, bs, be)
    counts = (be - bs).astype(np.int64)
    r = {"pack_blk": 1e9, "pack_bat": 1e9, "imp_blk": 1e9, "imp_bat": 1e9,
         "unp_blk": 1e9, "unp_bat": 1e9}
    for _ in range(4):
        t0 = time.time(); [K.for_pack(v[s:e]) for s, e in zip(bs, be)]; r["pack_blk"] = min(r["pack_blk"], time.time() - t0)
        t0 = time.time(); K.for_pack_batch(v, bs, be); r["pack_bat"] = min(r["pack_bat"], time.time() - t0)
        t0 = time.time(); [block_impacts(tfs[s:e], dlqs[s:e]) for s, e in zip(bs, be)]; r["imp_blk"] = min(r["imp_blk"], time.time() - t0)
        t0 = time.time(); block_impacts_batch(tfs, dlqs, bs, be); r["imp_bat"] = min(r["imp_bat"], time.time() - t0)
        t0 = time.time(); [K.for_unpack(b, 128) for b in bufs[:-1]]; r["unp_blk"] = min(r["unp_blk"], time.time() - t0)
        t0 = time.time(); K.for_unpack_batch(bufs, counts); r["unp_bat"] = min(r["unp_bat"], time.time() - t0)
    print(
        f"20k blocks: pack {r['pack_blk']:.3f}->{r['pack_bat']:.3f}s  "
        f"impacts {r['imp_blk']:.3f}->{r['imp_bat']:.3f}s  "
        f"unpack {r['unp_blk']:.3f}->{r['unp_bat']:.3f}s (per-block -> batched)"
    )

    # --- 3. Spark floors -------------------------------------------------
    from lucene_rust_spark.session import get_spark, local_rows_df

    spark = get_spark(app="bench_extra", cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.range(1, numPartitions=1)
    print(f"JVM 1-task collect floor: {best_of(d.collect, 8)*1000:.1f} ms")
    m = spark.range(1, numPartitions=1).mapInPandas(lambda it: it, schema="id long")
    print(f"Python-task round trip floor: {best_of(m.collect, 8)*1000:.1f} ms")
    rows = [(i, float(i) / 7) for i in range(10)]
    ldf = lambda: local_rows_df(spark, rows, [("id", "BIGINT"), ("x", "DOUBLE")]).collect()
    print(f"VALUES LocalTableScan collect: {best_of(ldf, 8)*1000:.1f} ms")

    # --- 4. KNN driver fast path ----------------------------------------
    import lucene_rust_spark.operators.hnsw as H

    nvec, dim = 100_000, 64
    vecs = rng.normal(size=(nvec, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(nvec, dtype=np.int64), "embedding": list(map(list, vecs))})
    )
    idx = "/tmp/lrs_bench_extra_hnsw"
    t0 = time.time()
    H.build_hnsw_index(emb, idx, n_shards=4, m=16, ef_construction=100)
    print(f"hnsw build 100k x 4 shards: {time.time()-t0:.1f}s")
    q = rng.normal(size=dim).astype(np.float32)
    drv = best_of(lambda: H.hnsw_topk(spark, idx, q, k=10).collect(), 7)
    old = H.HNSW_DRIVER_MAX_BYTES
    H.HNSW_DRIVER_MAX_BYTES = 0
    dist = best_of(lambda: H.hnsw_topk(spark, idx, q, k=10).collect(), 7)
    H.HNSW_DRIVER_MAX_BYTES = old
    print(f"knn single-query warm: driver {drv*1000:.1f} ms  distributed {dist*1000:.1f} ms")
    spark.stop()


if __name__ == "__main__":
    main()
