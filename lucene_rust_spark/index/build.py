"""Distributed index build — the IndexWriter/DWPT analog (SURVEY.md §2.3).

Reference surface: clt/index/mod.rs:77-82 (IndexWriter/DocumentsWriter, stubs),
clt/index/mod.rs:57-59 (TermsHash/FreqProxTermsWriter — our map-side per-doc
term counting), clt/index/index_sorter.rs:24-57 (canonical sort before docID
assignment), core/index/segment_index.rs:14-20 (pending→commit manifest rename).

Spark mapping (SURVEY.md §3.2):
  repartition-by-key shuffle  = routing docs to DWPTs
  per-partition build         = DWPT flush → immutable segment
  posting blocks of 128       = Lucene90 FOR blocks (for_util.rs:1)
  parquet sorted by term      = blocktree/FST terms dict (row-group stats seek)
  manifest.json atomic rename = segments_N two-phase commit

Everything stays JVM-side except three Arrow kernels: tokenize+count,
SmallFloat norm quantization (inside the same kernel), and block packing.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from lucene_rust_spark.functions import kernels as K
from lucene_rust_spark.functions.analysis import tokenize_series
from lucene_rust_spark.index.manifest import commit_manifest, read_manifest

PARTITION_SHIFT = 40

# --- docID assignment -------------------------------------------------------


def with_partition(df: DataFrame, num_partitions: int) -> DataFrame:
    """Deterministic partition key — pinned to match oracle.partition_of:
    int(sha1(repo \\x00 path \\x00 commit)[:15 hex], 16) % P. Computed
    JVM-side (sha1/conv are builtin), no Python."""
    h = F.sha1(
        F.encode(
            F.concat(F.col("repo"), F.lit("\x00"), F.col("path"), F.lit("\x00"), F.col("commit")),
            "UTF-8",
        )
    )
    part = (F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % num_partitions).cast("int")
    return df.withColumn("part", part)


def assign_doc_ids(df_with_part: DataFrame) -> DataFrame:
    """doc_id = (part << 40) | row_number within part, rows sorted by
    (repo, path, commit) — the IndexSorter + per-segment docBase analog
    (clt/index/index_sorter.rs, clt/index/leaf_reader_context.rs).
    Never monotonically_increasing_id(): must be rerun-deterministic."""
    w = Window.partitionBy("part").orderBy("repo", "path", "commit")
    return df_with_part.withColumn(
        "doc_id",
        (F.col("part").cast("long") * F.lit(1 << PARTITION_SHIFT))
        + (F.row_number().over(w) - F.lit(1)).cast("long"),
    )


# --- tokenize + per-doc term counts (TermsHash analog) ----------------------

_TOKENIZE_SCHEMA = T.StructType(
    [
        T.StructField("dl", T.IntegerType()),
        T.StructField("dlq", T.IntegerType()),
        T.StructField(
            "pairs",
            T.ArrayType(
                T.StructType(
                    [T.StructField("term", T.StringType()), T.StructField("tf", T.IntegerType())]
                )
            ),
        ),
    ]
)


@F.pandas_udf(_TOKENIZE_SCHEMA)
def analyze_udf(content: pd.Series) -> pd.DataFrame:
    """Arrow-batched: content → (doc length, quantized norm, [(term, tf)]).
    Per-doc term counting is the map-side partial aggregate — the shuffle
    then carries (term, tf) pairs, not raw token occurrences."""
    from collections import Counter

    toks = tokenize_series(content)
    dl = toks.map(len).astype("int32")
    dlq = pd.Series(K.int_to_byte4(dl.to_numpy()).astype("int32"), index=content.index)
    pairs = toks.map(lambda ts: sorted(Counter(ts).items()))
    return pd.DataFrame({"dl": dl, "dlq": dlq, "pairs": pairs})


# --- posting block packing (FOR blocks of 128; for_util.rs:1) ----------------

_BLOCK_SCHEMA = (
    "term string, seg int, block_no int, n int, first_doc long, last_doc long, "
    "max_tf int, min_dlq int, sum_tf long, docs_bin binary, tfs_bin binary, dlq_bin binary"
)


def pack_blocks(term: str, seg: int, docs: np.ndarray, tfs: np.ndarray, dlqs: np.ndarray) -> list[dict]:
    """One (term, seg) posting list (doc_id-sorted) → FOR-packed block rows."""
    rows = []
    for b0 in range(0, len(docs), K.BLOCK_SIZE):
        d = docs[b0 : b0 + K.BLOCK_SIZE]
        t = tfs[b0 : b0 + K.BLOCK_SIZE]
        q = dlqs[b0 : b0 + K.BLOCK_SIZE]
        deltas = np.empty(len(d), dtype=np.uint64)
        deltas[0] = 0  # first doc stored absolute in first_doc column
        deltas[1:] = (d[1:] - d[:-1]).astype(np.uint64)
        rows.append(
            {
                "term": term,
                "seg": seg,
                "block_no": b0 // K.BLOCK_SIZE,
                "n": len(d),
                "first_doc": int(d[0]),
                "last_doc": int(d[-1]),
                "max_tf": int(t.max()),
                "min_dlq": int(q.min()),
                "sum_tf": int(t.sum()),
                "docs_bin": K.for_pack(deltas),
                "tfs_bin": K.for_pack(t.astype(np.uint64)),
                "dlq_bin": q.astype(np.uint8).tobytes(),
            }
        )
    return rows


def _pack_partition(batches):
    """mapInPandas kernel: the input partition is sorted by
    (term, seg, doc_id), so (term, seg) posting lists are contiguous runs.
    Stream batches, carry the possibly-split tail run across batch
    boundaries, and pack complete runs with numpy slicing — one Python
    call per Arrow batch instead of one per (term, seg) group."""
    pend = None  # (term, seg, docs, tfs, dlqs) columns of the unfinished tail

    def emit(term_arr, seg_arr, docs, tfs, dlqs, flush_tail: bool):
        nonlocal pend
        out = []
        if len(term_arr) == 0:
            return out
        # run boundaries where (term, seg) changes
        change = np.flatnonzero(
            (term_arr[1:] != term_arr[:-1]) | (seg_arr[1:] != seg_arr[:-1])
        )
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [len(term_arr)]))
        last = len(starts) - 1
        for i, (s, e) in enumerate(zip(starts, ends)):
            if i == last and not flush_tail:
                pend = (term_arr[s:e], seg_arr[s:e], docs[s:e], tfs[s:e], dlqs[s:e])
                break
            out.extend(pack_blocks(term_arr[s], int(seg_arr[s]), docs[s:e], tfs[s:e], dlqs[s:e]))
        return out

    for pdf in batches:
        term_arr = pdf["term"].to_numpy()
        seg_arr = pdf["seg"].to_numpy(np.int64)
        docs = pdf["doc_id"].to_numpy(np.int64)
        tfs = pdf["tf"].to_numpy(np.int64)
        dlqs = pdf["dlq"].to_numpy(np.int64)
        if pend is not None:
            term_arr = np.concatenate((pend[0], term_arr))
            seg_arr = np.concatenate((pend[1], seg_arr))
            docs = np.concatenate((pend[2], docs))
            tfs = np.concatenate((pend[3], tfs))
            dlqs = np.concatenate((pend[4], dlqs))
            pend = None
        rows = emit(term_arr, seg_arr, docs, tfs, dlqs, flush_tail=False)
        if rows:
            yield pd.DataFrame(rows)
    if pend is not None:
        rows = emit(*pend, flush_tail=True)
        if rows:
            yield pd.DataFrame(rows)


# --- build -------------------------------------------------------------------


def build_index(
    spark: SparkSession,
    source: DataFrame,
    out_dir: str,
    num_partitions: int = 32,
    num_groups: int = 1,
    resume: bool = True,
) -> dict:
    """Build the full index under out_dir. Returns the committed manifest.

    num_groups > 1 splits the build into independent checkpointed jobs
    (group g owns partitions with part % num_groups == g), each writing
    its own group=g parquet subdirectory (idempotent overwrite). A killed
    build resumes from completed group checkpoints (north_rule
    resumability; the checkpoint file is the SegmentCommitInfo analog)."""
    t_start = time.time()
    os.makedirs(os.path.join(out_dir, "checkpoints"), exist_ok=True)
    docs = with_partition(source, num_partitions)
    group_stats = []
    for g in range(num_groups):
        ck_path = os.path.join(out_dir, "checkpoints", f"group_{g}.json")
        if resume and os.path.exists(ck_path):
            with open(ck_path) as f:
                group_stats.append(json.load(f))
            continue
        group_stats.append(_build_group(docs, out_dir, g, num_groups, num_partitions))
        with open(ck_path + ".tmp", "w") as f:
            json.dump(group_stats[-1], f)
        os.replace(ck_path + ".tmp", ck_path)  # atomic per-group checkpoint

    # global term dictionary (the OrdinalMap/global-terms analog,
    # clt/index/ordinal_map.rs) — tiny relative to corpus, one extra agg
    postings = spark.read.parquet(os.path.join(out_dir, "postings"))
    (
        postings.groupBy("term")
        .agg(
            F.sum("n").cast("long").alias("doc_freq"),
            F.sum("sum_tf").cast("long").alias("total_term_freq"),
            F.count("*").cast("long").alias("n_blocks"),
        )
        .repartitionByRange(max(1, num_partitions // 8), "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "terms"))
    )

    doc_count = sum(gs["doc_count"] for gs in group_stats)
    sum_ttf = sum(gs["sum_ttf"] for gs in group_stats)
    manifest = {
        "format_version": 1,
        "doc_count": doc_count,
        "sum_total_term_freq": sum_ttf,
        "num_partitions": num_partitions,
        "num_groups": num_groups,
        "segments": sorted(
            (s for gs in group_stats for s in gs["segments"]), key=lambda s: s["seg"]
        ),
        "content_sha256_xor": _xor_hexes(gs["content_sha256_xor"] for gs in group_stats),
        "build_wall_sec": round(time.time() - t_start, 3),
        "generation": _next_generation(out_dir),
        "files": ["postings", "norms", "docmap", "terms"],
    }
    commit_manifest(out_dir, manifest)
    return manifest


def _build_group(
    docs_with_part: DataFrame, out_dir: str, g: int, num_groups: int, num_partitions: int
) -> dict:
    """Build one checkpoint group: segments for parts ≡ g (mod num_groups).
    The part filter sits below the docID window (same partitionBy key), so
    each group job shuffles only its own slice of the corpus."""
    d = docs_with_part.filter(F.col("part") % num_groups == g) if num_groups > 1 else docs_with_part
    d = assign_doc_ids(d)
    analyzed = d.select(
        "doc_id",
        "part",
        "repo",
        "path",
        "commit",
        "lang",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        analyze_udf(F.col("content")).alias("a"),
    ).select(
        "doc_id", "part", "repo", "path", "commit", "lang", "content_sha256",
        "a.dl", "a.dlq", "a.pairs",
    )
    analyzed = analyzed.persist()

    def gdir(name: str) -> str:
        return os.path.join(out_dir, name, f"group={g}")

    # norms + doc map (row-store role stays with the source table; docmap
    # carries identity + the per-row sha256 integrity hash, SURVEY.md §1.4)
    analyzed.select("doc_id", "dl", "dlq").repartitionByRange(
        max(1, num_partitions // 4), "doc_id"
    ).sortWithinPartitions("doc_id").write.mode("overwrite").parquet(gdir("norms"))
    analyzed.select(
        "doc_id", "repo", "path", "commit", "lang", "content_sha256"
    ).repartitionByRange(max(1, num_partitions // 4), "doc_id").sortWithinPartitions(
        "doc_id"
    ).write.mode("overwrite").parquet(gdir("docmap"))

    # flat postings → per-(term, seg) FOR blocks
    flat = analyzed.select(
        "doc_id", F.col("part").alias("seg"), "dlq", F.explode("pairs").alias("p")
    ).select("doc_id", "seg", "dlq", F.col("p.term").alias("term"), F.col("p.tf").alias("tf"))
    # range-partition by term (global term order → parquet row-group pruning
    # at query time), sort runs contiguous, stream-pack per partition. The
    # sortWithinPartitions is Spark's spill-aware external sort — the
    # segment-flush analog that never holds a posting list in Python until
    # it is block-sized.
    blocks = (
        flat.repartitionByRange(max(1, num_partitions // 2), "term")
        .sortWithinPartitions("term", "seg", "doc_id")
        .mapInPandas(_pack_partition, schema=_BLOCK_SCHEMA)
    )
    blocks.write.mode("overwrite").parquet(gdir("postings"))

    seg_rows = (
        analyzed.groupBy("part")
        .agg(
            F.count("*").alias("max_doc"),
            F.sum("dl").alias("sum_ttf"),
            F.min("doc_id").alias("doc_base"),
            F.bit_xor(F.conv(F.substring("content_sha256", 1, 15), 16, 10).cast("long")).alias(
                "sha_xor"
            ),
        )
        .collect()
    )
    analyzed.unpersist()
    segments = [
        {
            "seg": int(r["part"]),
            "max_doc": int(r["max_doc"]),
            "sum_ttf": int(r["sum_ttf"]),
            "doc_base": int(r["doc_base"]),
            "del_count": 0,
            "content_sha256_xor": format(int(r["sha_xor"]) & 0xFFFFFFFFFFFFFFFF, "016x"),
            "group": g,
        }
        for r in sorted(seg_rows, key=lambda r: r["part"])
    ]
    return {
        "group": g,
        "doc_count": sum(s["max_doc"] for s in segments),
        "sum_ttf": sum(s["sum_ttf"] for s in segments),
        "segments": segments,
        "content_sha256_xor": _xor_hexes(s["content_sha256_xor"] for s in segments),
    }


def _xor_hexes(hexes) -> str:
    """Order-independent roll-up of 64-bit hex digests (agg order in Spark
    is nondeterministic, so the combiner must be commutative)."""
    acc = 0
    for h in hexes:
        acc ^= int(h, 16)
    return format(acc & 0xFFFFFFFFFFFFFFFF, "016x")


def _next_generation(out_dir: str) -> int:
    m = read_manifest(out_dir)
    return (m["generation"] + 1) if m else 1
