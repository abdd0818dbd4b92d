"""r7 optimization round: the ASCII Arrow tokenize fast path and the
batched pack/impacts kernels must be byte-identical to the reference
implementations they replace (the regex path and the per-block kernels)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from lucene_rust_spark.functions import kernels as K
from lucene_rust_spark.index.build import (
    _count_batch,
    _count_batch_arrow,
    _dwpt_partition,
    _dwpt_partition_arrow,
    block_impacts,
    block_impacts_batch,
)


def _pairs(out, positions):
    docs, segs, dlqs, codes, tfs, uniq, pos, dl = out[:8]
    pairs, off = {}, 0
    for i in range(len(docs)):
        pairs[(int(docs[i]), uniq[codes[i]])] = (
            int(segs[i]),
            int(dlqs[i]),
            int(tfs[i]),
            tuple(pos[off : off + tfs[i]].tolist()) if positions else (),
        )
        if positions:
            off += tfs[i]
    return pairs, dl.tolist()


@pytest.mark.parametrize("positions", [False, True])
def test_count_batch_arrow_identical(positions):
    rng = np.random.default_rng(7)
    alpha = list("ab_ 19.\t\n()Z")
    for _ in range(25):
        n = int(rng.integers(1, 40))
        docs = ["".join(rng.choice(alpha, size=int(rng.integers(0, 60)))) for _ in range(n)]
        docs[0] = ""  # empty doc
        if n > 2:
            docs[1] = "x" * 300 + " ok"  # >255-char token dropped
        s = pd.Series(docs)
        d = np.arange(n, dtype=np.int64)
        p = (d % 5).astype(np.int64)
        ref = _count_batch(d, p, s, positions)
        fast = _count_batch_arrow(d, p, pa.array(docs, type=pa.string()), positions)
        assert _pairs(ref, positions) == _pairs(fast, positions)


def test_count_batch_arrow_sliced_buffer():
    arr = pa.array(["zz qq", "abc", "def ghi"], type=pa.string()).slice(1, 2)
    f = _count_batch_arrow(
        np.array([0, 1], dtype=np.int64), np.zeros(2, dtype=np.int64), arr, False
    )
    toks = sorted((int(d), f[5][c]) for d, c in zip(f[0], f[3]))
    assert toks == [(0, "abc"), (1, "def"), (1, "ghi")]


def test_dwpt_arrow_nonascii_falls_back_identically():
    # non-ASCII batches route through the regex path: block output of the
    # arrow wrapper must equal the pandas kernel's on the same rows
    docs = ["café naïve merge", "merge window", "λx x", "plain ascii only"]
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "part": np.zeros(4, dtype=np.int64),
            "content": docs,
        }
    )
    rb = pa.RecordBatch.from_pandas(pdf, preserve_index=False)
    ref = pd.concat(list(_dwpt_partition(iter([pdf]), positions=True)), ignore_index=True)
    got = pd.concat(
        [b.to_pandas() for b in _dwpt_partition_arrow(iter([rb]), positions=True)],
        ignore_index=True,
    )
    key = ["term", "seg", "block_no"]
    ref = ref.sort_values(key).reset_index(drop=True)
    got = got.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(ref, got)


def test_kernel_doc_id_assignment_content_len_utf16(spark, tmp_path):
    """The in-kernel docID assignment (r7: the JVM window moved into the
    DWPT task) must rank by (part, UTF-16 length, repo, path, commit) —
    including astral chars counting as TWO units, Spark's length()."""
    import pandas as pd

    from lucene_rust_spark.index.build import PARTITION_SHIFT, build_index
    from lucene_rust_spark.oracle.bm25 import partition_of

    rows = []
    for i in range(40):
        content = ("x " * (i % 7)) + ("\U0001f389" if i % 3 == 0 else "yy")
        rows.append(
            {"repo": f"r{i%4}", "path": f"p/{i}", "commit": f"c{i:02d}",
             "lang": "en", "content": content}
        )
    pdf = pd.DataFrame(rows)
    idx = str(tmp_path / "idx_clen")
    build_index(spark, spark.createDataFrame(pdf), idx, num_partitions=4,
                sort_key="content_len")
    got = {
        (r["repo"], r["path"], r["commit"]): int(r["doc_id"])
        for r in spark.read.parquet(f"{idx}/docmap").collect()
    }
    pdf["part"] = [partition_of(r, p, c, 4) for r, p, c in zip(pdf["repo"], pdf["path"], pdf["commit"])]
    pdf["clen"] = [len(x.encode("utf-16-le")) // 2 for x in pdf["content"]]
    pdf = pdf.sort_values(["part", "clen", "repo", "path", "commit"], kind="mergesort")
    rank = pdf.groupby("part").cumcount()
    expected = {
        (r, p, c): (int(pt) << PARTITION_SHIFT) | int(rk)
        for r, p, c, pt, rk in zip(pdf["repo"], pdf["path"], pdf["commit"], pdf["part"], rank)
    }
    assert got == expected


def test_hnsw_driver_path_matches_distributed(spark, tmp_path):
    """r7 single-query KNN driver fast path: identical hits (ids, cos,
    order) to the distributed task-wave plan, with and without a filter."""
    import lucene_rust_spark.operators.hnsw as H

    rng = np.random.default_rng(11)
    n, dim = 600, 16
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    pdf = pd.DataFrame({"id": np.arange(n, dtype=np.int64), "embedding": list(map(list, vecs))})
    emb = spark.createDataFrame(pdf)
    idx = str(tmp_path / "hnsw_idx")
    H.build_hnsw_index(emb, idx, n_shards=4, m=8, ef_construction=48)
    q = rng.normal(size=dim).astype(np.float32)
    flt = list(range(0, n, 3))
    for filter_ids in (None, flt):
        drv = H.hnsw_topk(spark, idx, q, k=12, filter_ids=filter_ids).collect()
        old = H.HNSW_DRIVER_MAX_BYTES
        H.HNSW_DRIVER_MAX_BYTES = 0
        try:
            dist = H.hnsw_topk(spark, idx, q, k=12, filter_ids=filter_ids).collect()
        finally:
            H.HNSW_DRIVER_MAX_BYTES = old
        assert [(r["id"], r["cos"]) for r in drv] == [(r["id"], r["cos"]) for r in dist]


def test_for_pack_batch_identical():
    rng = np.random.default_rng(3)
    for _ in range(25):
        nblk = int(rng.integers(1, 60))
        ns = rng.integers(1, 129, nblk)
        bstarts = np.concatenate(([0], np.cumsum(ns)[:-1])).astype(np.int64)
        bends = np.cumsum(ns).astype(np.int64)
        n = int(ns.sum())
        hi = int(rng.choice([1, 2, 300, 2**19, 2**45])) + 1
        v = rng.integers(0, hi, n).astype(np.uint64)
        assert K.for_pack_batch(v, bstarts, bends) == [
            K.for_pack(v[s:e]) for s, e in zip(bstarts, bends)
        ]


def test_for_unpack_batch_identical():
    rng = np.random.default_rng(5)
    for codec in ("for", "pfor"):
        pack = K.for_pack if codec == "for" else K.pfor_pack
        bufs, counts, refs = [], [], []
        for _ in range(120):
            n = int(rng.integers(0, 200))
            hi = int(rng.choice([1, 2, 300, 2**19, 2**45])) + 1
            v = rng.integers(0, hi, n).astype(np.uint64)
            bufs.append(pack(v))
            counts.append(n)
            refs.append(K.for_unpack(bufs[-1], n))
        got = K.for_unpack_batch(bufs, np.array(counts))
        for r, g in zip(refs, got):
            assert np.array_equal(r, g)


def test_block_impacts_batch_identical():
    rng = np.random.default_rng(4)
    for _ in range(25):
        nblk = int(rng.integers(1, 60))
        ns = rng.integers(1, 129, nblk)
        bstarts = np.concatenate(([0], np.cumsum(ns)[:-1])).astype(np.int64)
        bends = np.cumsum(ns).astype(np.int64)
        n = int(ns.sum())
        tfs = rng.integers(1, int(rng.choice([2, 9, 3000])), n).astype(np.int64)
        dlqs = rng.integers(0, 256, n).astype(np.int64)
        assert block_impacts_batch(tfs, dlqs, bstarts, bends) == [
            block_impacts(tfs[s:e], dlqs[s:e]) for s, e in zip(bstarts, bends)
        ]
