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


def _repack_partition(batches, positions: bool = False, pfor: bool = False, offsets: bool = False, payloads: bool = False):
    """Input: block rows sorted by (term, mseg, seg, block_no) — every
    (term, mseg) run is a globally docID-sorted sequence of packed blocks
    from fan_in source segments. Decode, concatenate, re-pack. Streaming
    with a carried tail run, like the build packer. With positions=True
    the per-posting position streams (pos_bin, within-posting deltas) are
    decoded to absolute positions and re-delta'd across the new block
    boundaries by _pack_runs — a merged positional index answers phrase
    queries identically to the unmerged one."""
    pend = None  # (terms, msegs, docs, tfs, dlqs[, pos, ostart, olen]) tail run

    def decode_rows(pdf: pd.DataFrame):
        terms, msegs, docs, tfs, dlqs, pos = [], [], [], [], [], []
        ostarts, olens, pays = [], [], []
        for row in zip(
            pdf["term"], pdf["mseg"], pdf["n"], pdf["first_doc"],
            pdf["docs_bin"], pdf["tfs_bin"], pdf["dlq_bin"],
            pdf["pos_bin"] if positions else pdf["term"],
            pdf["offs_bin"] if offsets else pdf["term"],
            pdf["olen_bin"] if offsets else pdf["term"],
            pdf["pay_bin"] if payloads else pdf["term"],
        ):
            term, mseg, n, first_doc, db, tb, qb, pb, ob, lb, yb = row
            n = int(n)
            d = np.int64(first_doc) + np.cumsum(K.for_unpack(bytes(db), n)).astype(np.int64)
            docs.append(d)
            t = K.for_unpack(bytes(tb), n).astype(np.int64)
            tfs.append(t)
            dlqs.append(np.frombuffer(bytes(qb), dtype=np.uint8).astype(np.int64))
            terms.append(np.repeat(term, n))
            msegs.append(np.full(n, int(mseg), dtype=np.int64))
            if positions:
                total = int(t.sum())
                pdeltas = K.for_unpack(bytes(pb), total).astype(np.int64)
                # segmented cumsum → absolute positions (searcher._positions)
                offs = np.concatenate(([0], np.cumsum(t)[:-1]))
                cs = np.cumsum(pdeltas)
                base = np.zeros(total, dtype=np.int64)
                base[offs[1:]] = cs[offs[1:] - 1]
                np.maximum.accumulate(base, out=base)
                pos.append(cs - base)
                if offsets:
                    odeltas = K.for_unpack(bytes(ob), total).astype(np.int64)
                    ocs = np.cumsum(odeltas)
                    obase = np.zeros(total, dtype=np.int64)
                    obase[offs[1:]] = ocs[offs[1:] - 1]
                    np.maximum.accumulate(obase, out=obase)
                    ostarts.append(ocs - obase)
                    olens.append(K.for_unpack(bytes(lb), total).astype(np.int64))
                if payloads:
                    pays.append(np.frombuffer(bytes(yb), dtype=np.uint8).astype(np.int64))
        if not docs:
            return None
        out = [
            np.concatenate(terms),
            np.concatenate(msegs),
            np.concatenate(docs),
            np.concatenate(tfs),
            np.concatenate(dlqs),
        ]
        if positions:
            out.append(np.concatenate(pos) if pos else np.zeros(0, dtype=np.int64))
        if offsets:
            out.append(np.concatenate(ostarts) if ostarts else np.zeros(0, dtype=np.int64))
            out.append(np.concatenate(olens) if olens else np.zeros(0, dtype=np.int64))
        if payloads:
            out.append(np.concatenate(pays) if pays else np.zeros(0, dtype=np.int64))
        return tuple(out)

    def split_tail(cols):
        terms, msegs = cols[0], cols[1]
        n = len(terms)
        same = (terms == terms[n - 1]) & (msegs == msegs[n - 1])
        return 0 if same.all() else n - int(same[::-1].argmin())

    def pack(cols):
        if positions:
            tfs = cols[3]
            po = np.concatenate(([0], np.cumsum(tfs)))
            kw = {}
            i = 6
            if offsets:
                kw["off_start_flat"], kw["off_len_flat"] = cols[6], cols[7]
                i = 8
            if payloads:
                kw["pay_flat"] = cols[i]
            return _pack_runs(*cols[:5], pos_flat=cols[5], pos_offsets=po, pfor=pfor, **kw)
        return _pack_runs(*cols, pfor=pfor)

    for pdf in batches:
        cols = decode_rows(pdf)
        if cols is None:
            continue
        if pend is not None:
            cols = tuple(np.concatenate((a, b)) for a, b in zip(pend, cols))
            pend = None
        ts = split_tail(cols[:5])
        pos_cut = int(cols[3][:ts].sum()) if positions else None
        pend = tuple(
            c[pos_cut:] if positions and i >= 5 else c[ts:] for i, c in enumerate(cols)
        )
        head = tuple(
            c[:pos_cut] if positions and i >= 5 else c[:ts] for i, c in enumerate(cols)
        )
        out = pack(head)
        if out is not None and len(out):
            yield out
    if pend is not None and len(pend[0]):
        out = pack(pend)
        if out is not None and len(out):
            yield out


def plan_tiered(segments: list[dict], fan_in: int) -> dict[int, int]:
    """Size-budgeted merge selection — the TieredMergePolicy analog
    (clt/index/mod.rs:181 [stub]; Lucene's published behavior: merge
    segments of SIMILAR size, never rewrite a giant to absorb dust).
    Returns seg -> mseg. Segments are sorted by size; a group greedily
    takes up to fan_in size-adjacent segments, where adjacency means the
    next segment is at most fan_in x the group's smallest — a lone giant
    ends up in a singleton group and its blocks pass through unmerged
    (bounded write amplification: each doc is rewritten O(log_fan_in n)
    times over the index's life, as in Lucene's tiered geometry).

    Any grouping is correctness-neutral here: doc_id embeds seg in its
    high bits, so ordering a group's blocks by (seg, block_no) is already
    global docID order — no docBase remapping, no adjacency requirement."""
    sized = sorted(segments, key=lambda s: (s["max_doc"], s["seg"]))
    mapping: dict[int, int] = {}
    i = 0
    while i < len(sized):
        group = [sized[i]]
        j = i + 1
        floor_sz = max(1, sized[i]["max_doc"])
        while (
            j < len(sized)
            and len(group) < fan_in
            and sized[j]["max_doc"] <= floor_sz * fan_in
        ):
            group.append(sized[j])
            j += 1
        mseg = min(s["seg"] for s in group)
        for s in group:
            mapping[s["seg"]] = mseg
        i = j
    return mapping


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    fan_in: int = 10,
    width: int | None = None,
    policy: str = "flat",
) -> dict:
    """Merge segments in place (new postings dir + manifest generation
    bump). policy='flat': seg -> seg // fan_in (every segment rewritten);
    policy='tiered': size-adjacent grouping via plan_tiered, singleton
    groups pass through without decode/repack. Norms/docmap are unchanged
    — docIDs are stable across merges (no docBase remapping, module doc)."""
    width = width or spark.sparkContext.defaultParallelism
    m = read_manifest(index_dir)
    assert m is not None
    positions = bool(m.get("positions"))
    offsets = bool(m.get("offsets"))
    payloads = bool(m.get("payloads"))
    postings = spark.read.parquet(
        os.path.join(index_dir, m.get("postings_dir", "postings"))
    )
    if policy == "tiered":
        mapping = plan_tiered(m["segments"], fan_in)
        map_col = F.create_map(
            *[x for s_, t_ in sorted(mapping.items()) for x in (F.lit(s_), F.lit(t_))]
        )
        keyed = postings.withColumn("mseg", map_col[F.col("seg")].cast("int"))
        seg_of = lambda s: mapping[s["seg"]]  # noqa: E731
        from collections import Counter

        group_sizes = Counter(mapping.values())
        passthrough_msegs = [g for g, n in group_sizes.items() if n == 1]
    elif policy == "flat":
        keyed = postings.withColumn("mseg", (F.col("seg") / fan_in).cast("int"))
        seg_of = lambda s: s["seg"] // fan_in  # noqa: E731
        passthrough_msegs = []
    else:
        raise ValueError(f"unknown merge policy: {policy!r} (flat | tiered)")
    cols = ["term", "mseg", "n", "first_doc", "docs_bin", "tfs_bin", "dlq_bin"]
    if positions:
        cols.append("pos_bin")
    if offsets:
        cols.extend(["offs_bin", "olen_bin"])
    if payloads:
        cols.append("pay_bin")

    pfor = m.get("codec") == "pfor"

    def repack(batches, _p=positions, _pf=pfor, _o=offsets, _y=payloads):
        return _repack_partition(batches, positions=_p, pfor=_pf, offsets=_o, payloads=_y)

    to_repack = keyed
    passthrough = None
    if passthrough_msegs:
        # singleton groups: blocks keep their packing — re-keying seg is
        # the only change, so skip the decode/repack kernel entirely (the
        # "don't rewrite the giant" half of the tiered policy)
        pt_cond = F.col("mseg").isin(passthrough_msegs)
        passthrough = keyed.filter(pt_cond).withColumn(
            "seg", F.col("mseg")
        ).select(*[f.split(" ")[0] for f in _BLOCK_SCHEMA.split(", ")])
        to_repack = keyed.filter(~pt_cond)
    merged = (
        to_repack.repartitionByRange(width, "term")
        .sortWithinPartitions("term", "mseg", "seg", "block_no")
        .select(*cols)
        .mapInPandas(repack, schema=_BLOCK_SCHEMA)
    )
    if passthrough is not None:
        merged = merged.unionByName(passthrough)
    gen = m["generation"] + 1
    # merged blocks live under group=0 so the generation dir keeps the
    # build's partitioned layout — later streaming appends add sibling
    # group=<epoch> dirs and partition discovery stays consistent
    out_postings = os.path.join(index_dir, f"postings_g{gen}", "group=0")
    merged.write.mode("overwrite").parquet(out_postings)

    # merged segment records: group source segments by mseg
    segs: dict[int, dict] = {}
    for s in m["segments"]:
        t = segs.setdefault(
            seg_of(s),
            {"seg": seg_of(s), "max_doc": 0, "sum_ttf": 0,
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
