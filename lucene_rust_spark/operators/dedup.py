"""Deduplication operators for large-scale training-data pipelines.

All variants operate on a DataFrame with (id long, text string) — callers
select/alias (documents: doc_id/text; code corpus: doc_id/content).

- exact_dupes:        hash-groupBy on md5(text) (JVM-only)
- minhash_lsh_pairs:  shingle → minhash → banded LSH → bucket join, with
                      optional exact-Jaccard verification of candidates
- simhash_pairs:      64-bit SimHash + Hamming-ball candidate pairs via
                      band rotation joins (bitwise ops, JVM-side)
- embedding_near_dupes: cosine ≥ tau pairs over an embedding column

Scale notes: every variant is join/groupBy-shaped (no driver loops); LSH
band joins are equi-joins on small keys so AQE/broadcast handle the dims;
the O(n^2) exact verification only ever runs on LSH candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOK_RE = "[^a-z0-9_]+"


def _tok_col():
    return F.filter(F.split(F.lower("text"), TOK_RE), lambda x: x != "")


def exact_dupes(df: DataFrame) -> DataFrame:
    """(h, cnt, keeper) for exact duplicate groups (md5 hash-groupBy)."""
    return (
        df.groupBy(F.md5("text").alias("h"))
        .agg(F.count("*").cast("long").alias("cnt"), F.min("id").alias("keeper"))
        .filter(F.col("cnt") > 1)
    )


def _shingles(df: DataFrame, k: int = 3) -> DataFrame:
    """(id, g) distinct token k-gram shingles, JVM-side."""
    toks = _tok_col()
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(-1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return (
        df.select("id", F.explode(grams).alias("g"))
        .filter(F.col("g") != "")
        .distinct()
    )


def minhash_signatures(df: DataFrame, num_hashes: int = 16, k: int = 3) -> DataFrame:
    """(id, h0..h{n-1}) MinHash signature from md5-keyed hash families —
    deterministic, JVM-side (conv(substr(md5...)))."""
    sh = _shingles(df, k)
    aggs = [
        F.min(
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{i}:"), F.col("g"))), 1, 15), 16, 10).cast(
                "long"
            )
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    verify_jaccard: float | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) via banded LSH: rows whose signature
    agrees on ALL hashes of any band collide in that band's bucket. With
    verify_jaccard=tau, candidates are verified with exact shingle Jaccard
    and (a, b, j) is returned for j >= tau."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, num_hashes, k).persist()
    try:
        pairs = None
        for b in range(bands):
            cols = [f"h{b * rows_per_band + r}" for r in range(rows_per_band)]
            bucket = F.md5(F.concat_ws("_", *[F.col(c).cast("string") for c in cols]))
            x = sig.select(F.col("id").alias("a"), bucket.alias("bk"))
            y = sig.select(F.col("id").alias("b"), bucket.alias("bk"))
            p = x.join(y, "bk").filter(F.col("a") < F.col("b")).select("a", "b")
            pairs = p if pairs is None else pairs.unionByName(p)
        cand = pairs.distinct()
        if verify_jaccard is None:
            return cand
        sh = _shingles(df, k)
        sz = sh.groupBy("id").agg(F.count("*").alias("sz"))
        inter = (
            cand.join(sh.select(F.col("id").alias("a"), "g"), "a")
            .join(sh.select(F.col("id").alias("b"), F.col("g")), ["b", "g"])
            .groupBy("a", "b")
            .agg(F.count("*").cast("long").alias("inter"))
        )
        out = (
            inter.join(sz.select(F.col("id").alias("a"), F.col("sz").alias("sza")), "a")
            .join(sz.select(F.col("id").alias("b"), F.col("sz").alias("szb")), "b")
            .withColumn(
                "j", F.round(F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")), 6)
            )
            .filter(F.col("j") >= verify_jaccard)
            .select("a", "b", "j")
        )
        out = out.persist()
        out.count()
        return out
    finally:
        sig.unpersist()


def simhash(df: DataFrame, bits: int = 64) -> DataFrame:
    """(id, sig long) 64-bit SimHash over tf-weighted token hashes —
    entirely JVM-side: per-token 60-bit md5-derived hash, per-bit weighted
    votes via explode + groupBy."""
    toks = _tok_col()
    flat = (
        df.select("id", F.explode(toks).alias("t"))
        .groupBy("id", "t")
        .agg(F.count("*").alias("tf"))
        .withColumn(
            "th", F.conv(F.substring(F.md5("t"), 1, 15), 16, 10).cast("long")
        )
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b")
    votes = (
        flat.select("id", "tf", "th", bit)
        .withColumn(
            "v",
            F.when(F.shiftright(F.col("th"), F.col("b")).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
            .otherwise(-F.col("tf")),
        )
        .groupBy("id", "b")
        .agg(F.sum("v").alias("sv"))
    )
    return votes.groupBy("id").agg(
        F.sum(
            F.when(F.col("sv") > 0, F.shiftleft(F.lit(1).cast("long"), F.col("b"))).otherwise(0)
        ).alias("sig")
    )


def simhash_pairs(df: DataFrame, max_hamming: int = 3, bands: int = 4) -> DataFrame:
    """(a, b, hamming) candidate pairs with Hamming distance <= max_hamming.
    Band trick: split the 64-bit sig into `bands` chunks; any pair within
    distance < bands must agree exactly on >= 1 chunk (pigeonhole), so an
    equi-join per chunk finds all of them."""
    assert max_hamming < bands * 2  # pigeonhole validity margin
    sig = simhash(df).persist()
    try:
        width = 64 // bands
        mask = (1 << width) - 1
        pairs = None
        for b in range(bands):
            chunk = F.shiftrightunsigned(F.col("sig"), b * width).bitwiseAND(F.lit(mask))
            x = sig.select(F.col("id").alias("a"), F.col("sig").alias("siga"), chunk.alias("ck"))
            y = sig.select(F.col("id").alias("b"), F.col("sig").alias("sigb"), chunk.alias("ck"))
            p = x.join(y, "ck").filter(F.col("a") < F.col("b")).select("a", "b", "siga", "sigb")
            pairs = p if pairs is None else pairs.unionByName(p)
        ham = F.bit_count(F.col("siga").bitwiseXOR(F.col("sigb")))
        out = (
            pairs.distinct()
            .withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= max_hamming)
            .select("a", "b", "hamming")
        )
        out = out.persist()
        out.count()
        return out
    finally:
        sig.unpersist()


def embedding_near_dupes(emb: DataFrame, tau: float = 0.95) -> DataFrame:
    """(a, b, cos) pairs with cosine >= tau over (id long, embedding
    array<float>). Exact all-pairs via a normalized block-matrix kernel —
    for the scale path use operators/similarity.py (LSH-bucketed ANN)."""
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    e = emb.select("id", "embedding", norm.alias("nrm")).filter(F.col("nrm") > 0)
    x = e.select(F.col("id").alias("a"), F.col("embedding").alias("ea"), F.col("nrm").alias("na"))
    y = e.select(F.col("id").alias("b"), F.col("embedding").alias("eb"), F.col("nrm").alias("nb"))
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        x.join(y, F.col("a") < F.col("b"))
        .withColumn("cos", dot / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= tau)
        .select("a", "b", F.round("cos", 6).alias("cos"))
    )
