"""Similarity search over an embedding column (array<float>).

- cosine_topk:      brute-force exact top-k vs a query vector (baseline) —
                    JVM zip_with/aggregate dot products, TakeOrdered top-k
- ann_lsh_topk:     random-hyperplane LSH bucketing (the scale path):
                    probe only buckets matching the query's signature
                    (multi-probe over Hamming-1 neighbors), exact cosine
                    within the probed buckets
- ivf_topk:         IVF-style coarse quantizer: k-means-lite centroids
                    (deterministic seeded sample), probe nprobe nearest
                    cells, exact cosine within

At 100 TB the bucketed variants turn an all-pairs scan into a handful of
partition-pruned bucket scans; bucket ids are plain columns, so writing
the embedding table partitioned/bucketed by them makes the probe a
partition-pruned read.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(col):
    return F.sqrt(
        F.aggregate(
            F.transform(col, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def _qvec_lit(qvec: np.ndarray):
    return F.array(*[F.lit(float(x)) for x in qvec])


def cosine_topk(emb: DataFrame, qvec: np.ndarray, k: int = 10) -> DataFrame:
    """Exact brute-force cosine top-k: (id, cos) ordered desc, id asc."""
    q = _qvec_lit(qvec)
    qn = float(np.sqrt(np.sum(np.asarray(qvec, dtype=np.float64) ** 2)))
    cos = _dot(F.col("embedding"), q) / (_norm(F.col("embedding")) * F.lit(qn))
    return (
        emb.select("id", cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng([seed, dim, n_planes]).standard_normal((n_planes, dim))


def lsh_bucket_col(dim: int, n_planes: int = 12, seed: int = 42):
    """Column expr: random-hyperplane signature of `embedding` → int bucket.
    sign(h·x) per plane, packed into n_planes bits — all JVM-side."""
    H = _hyperplanes(dim, n_planes, seed)
    bits = []
    for i in range(n_planes):
        h = F.array(*[F.lit(float(v)) for v in H[i]])
        bits.append(
            F.when(_dot(F.col("embedding"), h) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def ann_lsh_topk(
    emb: DataFrame,
    qvec: np.ndarray,
    k: int = 10,
    n_planes: int | None = None,
    seed: int = 42,
    min_candidates: int | None = None,
    max_probes: int = 2048,
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket, widening the
    multiprobe radius (Hamming 1, 2, …) until the probed set holds at
    least min_candidates (default 4k) vectors; exact cosine inside.
    Falls back to brute force when the probe set stays starved (tiny
    corpora / unlucky signatures) — an ANN that returns fewer than k
    near-random results is worse than a scan. n_planes defaults to
    ~log2(n/256) so expected bucket occupancy is a few hundred vectors
    regardless of corpus size. (id, cos) desc."""
    from itertools import combinations

    dim = len(qvec)
    n = emb.count()
    if min_candidates is None:
        min_candidates = max(4 * k, 100)
    if n_planes is None:
        n_planes = int(np.clip(np.log2(max(n, 2) / 256.0), 2, 20))
    H = _hyperplanes(dim, n_planes, seed)
    qsig = 0
    for i in range(n_planes):
        if float(H[i] @ np.asarray(qvec, dtype=np.float64)) > 0:
            qsig |= 1 << i
    bucketed = emb.withColumn("bk", lsh_bucket_col(dim, n_planes, seed)).persist()
    try:
        # ONE job computes every bucket's occupancy (<= 2^n_planes rows,
        # vocabulary-sized); the multiprobe radius then widens entirely
        # driver-side — no per-radius Spark count() round trips
        sizes = {
            int(r["bk"]): int(r["n"])
            for r in bucketed.groupBy("bk").agg(F.count("*").alias("n")).collect()
        }
        probes = {qsig}
        total = sizes.get(qsig, 0)
        full_scan = False
        for radius in range(n_planes + 1):
            if radius > 0:
                for combo in combinations(range(n_planes), radius):
                    m = 0
                    for i in combo:
                        m |= 1 << i
                    p = qsig ^ m
                    if p not in probes:
                        probes.add(p)
                        total += sizes.get(p, 0)
            if len(probes) >= min(2**n_planes, max_probes):
                full_scan = True  # probing nearly everything: just scan
                break
            if total >= min(min_candidates, n):
                break
        cand = (
            bucketed
            if full_scan
            else bucketed.filter(F.col("bk").isin([int(x) for x in probes]))
        )
        out = cosine_topk(cand.select("id", "embedding"), qvec, k).persist()
        out.count()  # materialize before the bucket cache is dropped
        return out
    finally:
        bucketed.unpersist()


def ivf_centroids(emb: DataFrame, n_cells: int = 16, sample: int = 2048, iters: int = 5) -> np.ndarray:
    """Deterministic k-means-lite on a hash-sampled subset (driver-side
    numpy — centroid fitting is small; assignment is distributed). The
    xxhash64(id) filter is a partition-local scan, not a global sort, so
    sampling stays O(scan) at any corpus size."""
    n = emb.count()
    m = max(1, n // sample)
    pdf = (
        emb.filter(F.pmod(F.xxhash64(F.col("id")), F.lit(m)) == 0)
        .limit(sample)
        .toPandas()
        .sort_values("id", kind="mergesort")  # driver-side: init order pinned
        .reset_index(drop=True)
    )
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(42)
    C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                v = members.mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C


def ivf_cell_col(C: np.ndarray):
    """Column expr: argmax-cosine cell id for `embedding` (normalized C)."""
    best_cell = F.lit(0)
    best_dot = _dot(F.col("embedding"), F.array(*[F.lit(float(v)) for v in C[0]]))
    # iterative argmax as nested whens is O(cells); fine for <=64 cells
    for c in range(1, len(C)):
        d = _dot(F.col("embedding"), F.array(*[F.lit(float(v)) for v in C[c]]))
        cond = d > best_dot
        best_cell = F.when(cond, F.lit(c)).otherwise(best_cell)
        best_dot = F.when(cond, d).otherwise(best_dot)
    return best_cell.cast("int")


def with_ivf_cells(emb: DataFrame, C: np.ndarray) -> DataFrame:
    """Attach the `cell` column — JVM nested-when argmax for small cell
    counts (whole-stage codegen, no Python), an Arrow-batched matmul
    kernel beyond 64 cells (the r3 caveat: expression depth is O(cells),
    which stops compiling cheaply past ~64; a (batch x dim) @ (dim x
    cells) numpy product is flat in the cell count)."""
    if len(C) <= 64:
        return emb.withColumn("cell", ivf_cell_col(C))
    Cf = np.ascontiguousarray(np.asarray(C, dtype=np.float64).T)

    @pandas_udf("int")
    def cell_of(embs: pd.Series) -> pd.Series:
        X = np.array(embs.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(X @ Cf, axis=1).astype(np.int32))

    return emb.withColumn("cell", cell_of("embedding"))


def ivf_topk(
    emb: DataFrame, qvec: np.ndarray, k: int = 10, n_cells: int = 16, nprobe: int = 4,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: assign rows to coarse cells, probe the nprobe
    cells nearest the query, exact cosine inside."""
    C = centroids if centroids is not None else ivf_centroids(emb, n_cells)
    q = np.asarray(qvec, dtype=np.float64)
    q = q / max(np.linalg.norm(q), 1e-12)
    probe = np.argsort(-(C @ q))[:nprobe].tolist()
    cells = with_ivf_cells(emb, C)
    cand = cells.filter(F.col("cell").isin([int(c) for c in probe]))
    return cosine_topk(cand.select("id", "embedding"), qvec, k)
