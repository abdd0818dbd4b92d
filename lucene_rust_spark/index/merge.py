"""Hierarchical segment merge — the SegmentMerger / MultiTermsEnum /
TieredMergePolicy analog (clt/index/mod.rs:140, :106 multi_terms_enum,
:92 doc_id_merger, :181 tiered_merge_policy — all [stub]; merge fan-in 10
observed in the reference golden index, core/tests/rfc_database.rs:96).

Because doc_id = (seg << 40) | local_row, per-term postings from different
segments are already in global docID order when segments are ordered — the
k-way sort-merge on term keys is exactly Spark's range shuffle, and docID
remapping (Lucene's docBase shifting) is unnecessary. Merging seg -> seg'
therefore reduces to: re-key blocks to the merged segment id, re-sort, and
re-pack runs so interior blocks are full 128-entry FOR blocks again
(compaction of tail blocks across old segment boundaries).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from lucene_rust_spark.functions import kernels as K
from lucene_rust_spark.index.build import _BLOCK_SCHEMA, _pack_runs
from lucene_rust_spark.index.manifest import commit_manifest, read_manifest


def _repack_partition(batches):
    """Input: block rows sorted by (term, mseg, seg, block_no) — every
    (term, mseg) run is a globally docID-sorted sequence of packed blocks
    from fan_in source segments. Decode, concatenate, re-pack. Streaming
    with a carried tail run, like the build packer."""
    pend = None  # (terms, msegs, docs, tfs, dlqs) arrays of the tail run

    def decode_rows(pdf: pd.DataFrame):
        terms, msegs, docs, tfs, dlqs = [], [], [], [], []
        for term, mseg, n, first_doc, db, tb, qb in zip(
            pdf["term"], pdf["mseg"], pdf["n"], pdf["first_doc"],
            pdf["docs_bin"], pdf["tfs_bin"], pdf["dlq_bin"],
        ):
            n = int(n)
            d = np.int64(first_doc) + np.cumsum(K.for_unpack(bytes(db), n)).astype(np.int64)
            docs.append(d)
            tfs.append(K.for_unpack(bytes(tb), n).astype(np.int64))
            dlqs.append(np.frombuffer(bytes(qb), dtype=np.uint8).astype(np.int64))
            terms.append(np.repeat(term, n))
            msegs.append(np.full(n, int(mseg), dtype=np.int64))
        if not docs:
            return None
        return (
            np.concatenate(terms),
            np.concatenate(msegs),
            np.concatenate(docs),
            np.concatenate(tfs),
            np.concatenate(dlqs),
        )

    def split_tail(cols):
        terms, msegs = cols[0], cols[1]
        n = len(terms)
        same = (terms == terms[n - 1]) & (msegs == msegs[n - 1])
        return 0 if same.all() else n - int(same[::-1].argmin())

    for pdf in batches:
        cols = decode_rows(pdf)
        if cols is None:
            continue
        if pend is not None:
            cols = tuple(np.concatenate((a, b)) for a, b in zip(pend, cols))
            pend = None
        ts = split_tail(cols)
        pend = tuple(c[ts:] for c in cols)
        head = tuple(c[:ts] for c in cols)
        out = _pack_runs(*head)
        if out is not None and len(out):
            yield out
    if pend is not None and len(pend[0]):
        out = _pack_runs(*pend)
        if out is not None and len(out):
            yield out


def merge_segments(
    spark: SparkSession, index_dir: str, fan_in: int = 10, width: int | None = None
) -> dict:
    """Merge segments seg -> seg // fan_in in place (new postings dir +
    manifest generation bump). Norms/docmap are unchanged — docIDs are
    stable across merges (no docBase remapping needed, see module doc)."""
    width = width or spark.sparkContext.defaultParallelism
    m = read_manifest(index_dir)
    assert m is not None
    if m.get("positions"):
        raise NotImplementedError("merge of positional indexes is v2 (pos stream repack)")
    postings = spark.read.parquet(os.path.join(index_dir, "postings"))
    keyed = postings.withColumn("mseg", (F.col("seg") / fan_in).cast("int"))
    merged = (
        keyed.repartitionByRange(width, "term")
        .sortWithinPartitions("term", "mseg", "seg", "block_no")
        .select(
            "term", F.col("mseg").alias("mseg"), "n", "first_doc",
            "docs_bin", "tfs_bin", "dlq_bin",
        )
        .mapInPandas(_repack_partition, schema=_BLOCK_SCHEMA)
    )
    gen = m["generation"] + 1
    out_postings = os.path.join(index_dir, f"postings_g{gen}")
    merged.withColumnRenamed("seg", "seg").write.mode("overwrite").parquet(out_postings)

    # merged segment records: group source segments by mseg
    segs: dict[int, dict] = {}
    for s in m["segments"]:
        t = segs.setdefault(
            s["seg"] // fan_in,
            {"seg": s["seg"] // fan_in, "max_doc": 0, "sum_ttf": 0,
             "doc_base": s["doc_base"], "del_count": 0, "sha_acc": 0,
             "group": s.get("group", 0), "merged_from": []},
        )
        t["max_doc"] += s["max_doc"]
        t["sum_ttf"] += s["sum_ttf"]
        t["doc_base"] = min(t["doc_base"], s["doc_base"])
        t["sha_acc"] ^= int(s["content_sha256_xor"], 16)
        t["merged_from"].append(s["seg"])
    segments = []
    for seg in sorted(segs):
        t = segs[seg]
        t["content_sha256_xor"] = format(t.pop("sha_acc") & 0xFFFFFFFFFFFFFFFF, "016x")
        segments.append(t)

    manifest = dict(m)
    manifest.update(
        {
            "generation": gen,
            "segments": segments,
            "postings_dir": f"postings_g{gen}",
            "merge_fan_in": fan_in,
        }
    )
    commit_manifest(index_dir, manifest)
    return manifest
