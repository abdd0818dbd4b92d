"""Dedup operators (exact / MinHash-LSH / SimHash / embedding) and
similarity search (brute-force, LSH-ANN, IVF) on the driver test tables."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.col("doc_id").alias("id"), "text")
        .persist()
    )


@pytest.fixture(scope="module")
def emb(spark):
    return (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), "embedding")
        .persist()
    )


def test_minhash_lsh_finds_near_dupes(spark, docs):
    """LSH candidates verified at J>=0.5 must cover the exact-Jaccard pairs
    found by the gate query (25 pairs at sf0.01) reasonably well, with no
    false positives after verification."""
    from lucene_rust_spark.operators.dedup import minhash_lsh_pairs

    verified = minhash_lsh_pairs(docs, num_hashes=16, bands=8, verify_jaccard=0.5).toPandas()
    assert (verified["j"] >= 0.5).all()
    # exact ground truth via the gate SQL (DuckDB-equivalent spark plan)
    from lucene_rust_spark.gate import dedup_ngram_jaccard

    truth = dedup_ngram_jaccard(spark, SF).toPandas()
    truth_pairs = set(zip(truth["a"], truth["b"]))
    got_pairs = set(zip(verified["a"], verified["b"]))
    assert got_pairs <= truth_pairs or len(got_pairs - truth_pairs) == 0
    recall = len(got_pairs & truth_pairs) / max(len(truth_pairs), 1)
    assert recall >= 0.8, (recall, len(truth_pairs), len(got_pairs))


def test_simhash_near_dupes(spark, docs):
    from lucene_rust_spark.operators.dedup import simhash, simhash_pairs

    sigs = simhash(docs).toPandas()
    assert len(sigs) == docs.count()
    # J >= 0.9 ⇒ cos ≈ 0.94 ⇒ expected 64-bit hamming ≈ 64·arccos(.94)/π ≈ 7,
    # so the candidate radius must sit above that mean to recall them
    pairs = simhash_pairs(docs, max_hamming=10, bands=12).toPandas()
    # near-dup docs (by Jaccard truth) should appear among low-hamming pairs
    from lucene_rust_spark.gate import dedup_ngram_jaccard

    truth = dedup_ngram_jaccard(spark, SF).toPandas()
    strong = truth[truth["j"] >= 0.9]
    got = set(zip(pairs["a"], pairs["b"]))
    hits = sum((a, b) in got for a, b in zip(strong["a"], strong["b"]))
    assert hits >= 0.7 * len(strong), (hits, len(strong))


def test_exact_dupes_matches_gate(spark, docs):
    """The gate seeds shifted copies of every 50th doc so dedup_exact
    exercises the cnt>1 path with real rows; seed the operator input the
    same way and assert full (h, cnt, keeper) row parity, not just count."""
    from lucene_rust_spark.gate import dedup_exact
    from lucene_rust_spark.operators.dedup import exact_dupes

    seeded = docs.unionByName(
        docs.filter(F.col("id") % 50 == 0).select(
            (F.col("id") + 10_000_000).alias("id"), "text"
        )
    )
    a = exact_dupes(seeded).orderBy("h").toPandas()
    b = dedup_exact(spark, SF).orderBy("h").toPandas()
    assert len(a) > 0  # non-vacuous: the seeded corpus has real dup groups
    assert a["h"].tolist() == b["h"].tolist()
    assert a["cnt"].tolist() == b["cnt"].tolist()
    assert a["keeper"].tolist() == b["keeper"].tolist()


def test_embedding_near_dupes_symmetric(emb):
    from lucene_rust_spark.operators.dedup import embedding_near_dupes

    pairs = embedding_near_dupes(emb.limit(100), tau=0.8).toPandas()
    assert (pairs["a"] < pairs["b"]).all()
    assert ((pairs["cos"] >= 0.8) & (pairs["cos"] <= 1.0 + 1e-9)).all()


def test_ann_vs_bruteforce(emb):
    """LSH and IVF top-k must strongly overlap the exact top-k."""
    from lucene_rust_spark.operators.similarity import ann_lsh_topk, cosine_topk, ivf_topk

    qvec = np.array(emb.filter(F.col("id") == 0).first()["embedding"], dtype=np.float64)
    pool = emb.filter(F.col("id") != 0).persist()
    exact = [r["id"] for r in cosine_topk(pool, qvec, 10).collect()]
    lsh = [r["id"] for r in ann_lsh_topk(pool, qvec, 10, n_planes=10).collect()]
    # synthetic embeddings are near-random (weak cluster structure), so the
    # true top-k spreads across cells: probe half of them for stable recall
    ivf = [r["id"] for r in ivf_topk(pool, qvec, 10, n_cells=8, nprobe=4).collect()]
    assert len(set(exact) & set(lsh)) >= 6, (exact, lsh)
    assert len(set(exact) & set(ivf)) >= 6, (exact, ivf)
    # exact path is deterministic and ordered
    again = [r["id"] for r in cosine_topk(pool, qvec, 10).collect()]
    assert exact == again
    pool.unpersist()


def test_simhash_pairs_empty_docs(spark):
    """Zero-token docs get sig = 0 and two of them are hamming-0 pairs —
    the engine and its SQL oracle must agree on this edge (the band join
    must surface the all-zero bucket, not drop it)."""
    from lucene_rust_spark.operators.dedup import simhash, simhash_pairs

    d = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "totally different content here")],
        "id long, text string",
    )
    sigs = {r["id"]: r["sig"] for r in simhash(d).collect()}
    assert sigs[1] == 0 and sigs[2] == 0
    pairs = {(r["a"], r["b"]): r["hamming"] for r in simhash_pairs(d).collect()}
    assert pairs.get((1, 2)) == 0


def test_embedding_near_dupes_lsh_recall(spark):
    """LSH-bucketed near-dup pairs: every returned pair is exact-verified
    (subset of the all-pairs result), and recall against exact all-pairs
    meets the published collision bound with slack."""
    import numpy as np

    from lucene_rust_spark.operators.dedup import (
        embedding_near_dupes,
        embedding_near_dupes_lsh,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal((60, 16)).astype(np.float32)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        if i % 4 == 0:  # a near-duplicate: tiny perturbation
            w = v + rng.standard_normal(16).astype(np.float32) * 0.02
            rows.append((1000 + i, [float(x) for x in w]))
    emb = spark.createDataFrame(rows, "id long, embedding array<float>")
    exact = {(r["a"], r["b"]) for r in embedding_near_dupes(emb, tau=0.95).collect()}
    got = {(r["a"], r["b"]) for r in embedding_near_dupes_lsh(emb, tau=0.95).collect()}
    assert got <= exact  # exact verification: no false positives
    assert len(exact) >= 10
    assert len(got) >= 0.8 * len(exact), (len(got), len(exact))


def test_embedding_near_dupes_size_guard(spark):
    import pytest

    from lucene_rust_spark.operators.dedup import embedding_near_dupes

    emb = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(30)], "id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="all-pairs"):
        embedding_near_dupes(emb, max_rows=10)


def test_ivf_many_cells_kernel(spark):
    """>64 cells routes cell assignment through the Arrow matmul kernel
    (flat in cell count) instead of O(cells) nested-when expressions; the
    assignment must equal the direct numpy argmax, and ivf_topk stays a
    working ANN at that cell count."""
    import numpy as np
    import pandas as pd

    from lucene_rust_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        with_ivf_cells,
    )

    rng = np.random.default_rng(7)
    n, dim, n_cells = 600, 16, 80
    X = rng.standard_normal((n, dim))
    emb = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n), "embedding": [r.astype(np.float32).tolist() for r in X]})
    )
    C = rng.standard_normal((n_cells, dim))
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    got = {
        r["id"]: r["cell"]
        for r in with_ivf_cells(emb, C).select("id", "cell").collect()
    }
    Xf = np.array([np.asarray(X[i], dtype=np.float32).astype(np.float64) for i in range(n)])
    want = np.argmax(Xf @ C.T, axis=1)
    assert all(got[i] == int(want[i]) for i in range(n))
    # end-to-end: probing more cells can only improve recall vs fewer
    q = X[3]
    exact = [r["id"] for r in cosine_topk(emb, q, 10).collect()]
    approx = [
        r["id"]
        for r in ivf_topk(emb, q, 10, n_cells=n_cells, nprobe=20, centroids=C).collect()
    ]
    assert len(set(exact) & set(approx)) >= 5


def test_hnsw_per_shard_graph_ann(spark, tmp_path):
    """HNSW analog (clt/util/hnsw/, knn_vector_query): per-shard graphs
    built in applyInPandas, beam-searched in parallel, per-shard top-k
    merged. Recall@10 >= 0.9 vs brute-force cosine on a 2k-vector corpus,
    deterministic across rebuilds."""
    import numpy as np
    import pandas as pd

    from lucene_rust_spark.operators.hnsw import HnswGraph, build_hnsw_index, hnsw_topk
    from lucene_rust_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(11)
    n, dim = 2000, 24
    X = rng.standard_normal((n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n), "embedding": [r.tolist() for r in X]})
    )
    out = str(tmp_path / "hnsw")
    build_hnsw_index(emb, out, n_shards=4, m=12, ef_construction=80)

    recalls = []
    for qi in (0, 17, 523):
        q = X[qi]
        exact = [r["id"] for r in cosine_topk(emb, q, 10).collect()]
        approx = [r["id"] for r in hnsw_topk(spark, out, q, 10, ef=64).collect()]
        recalls.append(len(set(exact) & set(approx)) / 10)
    assert sum(recalls) / len(recalls) >= 0.9, recalls

    # rebuild determinism: same chunk rows modulo row order
    out2 = str(tmp_path / "hnsw2")
    build_hnsw_index(emb, out2, n_shards=4, m=12, ef_construction=80)

    def rows_by_key(path):
        return {
            (r["shard"], r["kind"], r["part"]): (r["meta"], bytes(r["payload"]))
            for r in spark.read.parquet(path).collect()
        }

    b1, b2 = rows_by_key(out), rows_by_key(out2)
    assert b1 == b2

    # single-graph sanity: exhaustive beam (ef = n) is exact within a shard
    pdf0 = spark.read.parquet(out).filter("shard = 0").toPandas()
    g = HnswGraph.from_rows(pdf0)
    ids0 = set(g.ids[: g.n].tolist())
    q = X[5]
    got = [i for i, _ in g.search(q, 5, ef=len(ids0))]
    qn = q / np.linalg.norm(q)
    Xs = np.array([X[i] for i in sorted(ids0)])
    Xs = Xs / np.linalg.norm(Xs, axis=1, keepdims=True)
    want = [sorted(ids0)[j] for j in np.argsort(-(Xs @ qn))[:5]]
    assert got == want


def test_hnsw_filtered_knn(spark, tmp_path):
    """Filtered KNN (clt/search/abstract_knn_vector_query.rs shape): the
    pre-filter becomes a per-shard bitmask; a selective filter takes the
    EXACT fallback and must equal brute-force filtered cosine top-k; a
    broad filter stays on the beam path with recall >= 0.9 and only
    allowed ids in the result."""
    import numpy as np
    import pandas as pd

    from lucene_rust_spark.operators.hnsw import build_hnsw_index, hnsw_topk

    rng = np.random.default_rng(7)
    n, dim = 3000, 24
    X = rng.standard_normal((n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n), "embedding": [r.tolist() for r in X]})
    )
    out = str(tmp_path / "hnsw_f")
    build_hnsw_index(emb, out, n_shards=4, m=12, ef_construction=80)
    q = X[42]
    qn = q / np.linalg.norm(q)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    sims = Xn @ qn

    # selective filter (id % 31 == 5: ~3.2% < exact_cutoff 5%) -> exact path
    sel = np.arange(n)[np.arange(n) % 31 == 5]
    want = sel[np.argsort(-sims[sel], kind="stable")[:10]].tolist()
    got = [
        r["id"]
        for r in hnsw_topk(spark, out, q, 10, ef=64, filter_ids=sel).collect()
    ]
    assert got == want

    # broad filter (50%) -> beam path; all results allowed, recall >= 0.9
    broad = np.arange(n)[np.arange(n) % 2 == 0]
    want_b = set(broad[np.argsort(-sims[broad], kind="stable")[:10]].tolist())
    got_b = [
        r["id"]
        for r in hnsw_topk(spark, out, q, 10, ef=128, filter_ids=broad).collect()
    ]
    assert all(g % 2 == 0 for g in got_b)
    assert len(set(got_b) & want_b) >= 9

    # filter_ids as a DataFrame goes through the same path
    fdf = spark.createDataFrame(pd.DataFrame({"id": sel}))
    got_df = [
        r["id"]
        for r in hnsw_topk(spark, out, q, 10, ef=64, filter_ids=fdf).collect()
    ]
    assert got_df == want

    # EMPTY filter: zero hits, no executor crash (regression: searchsorted
    # against an empty allow-array indexed out of bounds)
    assert hnsw_topk(spark, out, q, 10, ef=64, filter_ids=[]).collect() == []
    # filter matching nothing in the index behaves the same
    assert (
        hnsw_topk(spark, out, q, 10, ef=64, filter_ids=[10_000_000]).collect()
        == []
    )


def test_hnsw_chunked_serialization(spark, tmp_path, monkeypatch):
    """A shard's arrays split across multiple <= CHUNK_BYTES rows and
    reassemble identically — the path that removes the ~2 GB single-cell
    ceiling (verified by forcing tiny chunks)."""
    import numpy as np
    import pandas as pd

    from lucene_rust_spark.operators import hnsw as H

    rng = np.random.default_rng(3)
    n, dim = 500, 16
    X = rng.standard_normal((n, dim)).astype(np.float32)
    g = H.HnswGraph(dim, m=8, ef_construction=40)
    g.add_batch(np.arange(n, dtype=np.int64), X)
    q = rng.standard_normal(dim).astype(np.float32)
    ref = g.search(q, 10, ef=64)

    monkeypatch.setattr(H, "CHUNK_BYTES", 4096)
    rows = pd.DataFrame(
        g.to_rows(0), columns=["shard", "kind", "part", "meta", "payload"]
    )
    # vecs alone are 500*16*4 = 32000 bytes -> >= 8 chunk rows
    assert (rows["kind"] == "vecs").sum() >= 8
    assert rows["payload"].map(len).max() <= 4096
    g2 = H.HnswGraph.from_rows(rows.sample(frac=1.0, random_state=1))
    assert g2.search(q, 10, ef=64) == ref


def test_hnsw_byte_vectors(spark, tmp_path):
    """KnnByteVectorQuery (clt/search/knn_byte_vector_query.rs): int8
    vectors stored raw (4x smaller), cosine via per-node inverse norms.
    Exhaustive beam == exact within a graph; distributed top-10 overlap
    >= 9 vs a float64 oracle over the same int8 values; serialized rows
    round-trip including the inorm chunks."""
    import numpy as np
    import pandas as pd

    from lucene_rust_spark.operators.hnsw import HnswGraph, build_hnsw_index, hnsw_topk

    rng = np.random.default_rng(9)
    n, dim = 2000, 24
    X = rng.integers(-127, 128, size=(n, dim)).astype(np.int8)
    # avoid all-zero rows (undefined cosine)
    X[:, 0] = np.where(X[:, 0] == 0, 1, X[:, 0])

    g = HnswGraph(dim, m=12, ef_construction=80, dtype="int8")
    g.add_batch(np.arange(n, dtype=np.int64), X)
    assert g.vecs.dtype == np.int8
    q = rng.integers(-127, 128, size=dim).astype(np.int8).astype(np.float32)
    # exhaustive beam is exact
    got = [i for i, _ in g.search(q, 5, ef=n)]
    Xf = X.astype(np.float64)
    sims = (Xf / np.linalg.norm(Xf, axis=1, keepdims=True)) @ (
        q.astype(np.float64) / np.linalg.norm(q)
    )
    want = np.argsort(-sims.astype(np.float32), kind="stable")[:5].tolist()
    assert got == want

    # rows round-trip (incl. inorm)
    rows = pd.DataFrame(
        g.to_rows(0), columns=["shard", "kind", "part", "meta", "payload"]
    )
    assert (rows["kind"] == "inorm").sum() >= 1
    g2 = HnswGraph.from_rows(rows)
    assert g2.dtype == "int8" and g2.vecs.dtype == np.int8
    assert g2.search(q, 5, ef=64) == g.search(q, 5, ef=64)

    # distributed path
    emb = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n), "embedding": [r.tolist() for r in X]})
    )
    out = str(tmp_path / "hnsw_b")
    build_hnsw_index(emb, out, n_shards=4, m=12, ef_construction=80, dtype="int8")
    approx = {r["id"] for r in hnsw_topk(spark, out, q, 10, ef=128).collect()}
    exact = set(np.argsort(-sims, kind="stable")[:10].tolist())
    assert len(approx & exact) >= 9


def test_hnsw_topk_batch(spark, tmp_path):
    """Batched KNN serving: one wave of shard tasks answers a whole
    query batch; per-query results must match the single-query path's
    quality (>= 9/10 overlap vs exact per query) and return exactly k
    rows per qid."""
    import numpy as np
    import pandas as pd

    from lucene_rust_spark.operators.hnsw import build_hnsw_index, hnsw_topk_batch

    rng = np.random.default_rng(11)
    n, dim, B = 3000, 24, 16
    X = rng.standard_normal((n, dim)).astype(np.float32)
    emb = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n), "embedding": [r.tolist() for r in X]})
    )
    out = str(tmp_path / "hnsw_batch")
    build_hnsw_index(emb, out, n_shards=4, m=12, ef_construction=80)

    Q = rng.standard_normal((B, dim)).astype(np.float32)
    rows = hnsw_topk_batch(spark, out, Q, k=10, ef=128).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r["id"])
    assert set(by_q) == set(range(B))
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    for qi in range(B):
        assert len(by_q[qi]) == 10
        qn = Q[qi] / np.linalg.norm(Q[qi])
        exact = set(np.argsort(-(Xn @ qn), kind="stable")[:10].tolist())
        assert len(set(by_q[qi]) & exact) >= 9, qi
