"""Per-shard HNSW graph ANN — the KnnVectorQuery / Lucene99HnswVectorsFormat
analog (clt/util/hnsw/, 8 files; clt/search/knn_vector_query.rs — [stub];
Lucene 9 public semantics: one small-world graph PER SEGMENT, queried with
a greedy beam search, per-segment top-k merged by the collector).

Spark mapping: shard = segment. Vectors are hash-routed to S shards;
each shard's graph is built INSIDE one applyInPandas task (graph
construction is inherently sequential per segment — exactly Lucene's
per-segment writer) and serialized as one binary blob row. A query
mapInPandas-scans the blob rows, beam-searches each graph, and the
per-shard candidates merge through a TakeOrderedAndProject — so query
fan-out, not construction, is what scales with the corpus, matching how
Lucene searches one graph per segment and merges.

The in-memory graph is a compact numpy HNSW (hierarchical layers with
exponential level assignment, greedy descent over upper layers, ef-beam
on layer 0, M-pruned bidirectional links). Distances are COSINE on
build-normalized vectors (dot products thereafter).
"""

from __future__ import annotations

import heapq
import io
import pickle

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class HnswGraph:
    """Single-segment HNSW over unit-normalized vectors, cosine metric."""

    def __init__(self, dim: int, m: int = 16, ef_construction: int = 100, seed: int = 42):
        self.dim = dim
        self.m = m
        self.m0 = 2 * m  # layer-0 degree bound (Lucene/HNSW convention)
        self.ef_c = ef_construction
        self.ml = 1.0 / np.log(m)
        self.rng = np.random.default_rng(seed)
        self.vecs = np.zeros((0, dim), dtype=np.float32)
        self.ids = np.zeros(0, dtype=np.int64)
        self.levels: list[int] = []
        self.links: list[list[list[int]]] = []  # node -> per-layer neighbor lists
        self.entry = -1
        self.max_level = -1

    # -- construction --------------------------------------------------------

    def add_batch(self, ids: np.ndarray, vecs: np.ndarray) -> None:
        vecs = np.asarray(vecs, dtype=np.float32)
        norms = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        vecs = vecs / norms
        base = len(self.ids)
        self.vecs = np.concatenate((self.vecs, vecs))
        self.ids = np.concatenate((self.ids, np.asarray(ids, dtype=np.int64)))
        for i in range(len(ids)):
            self._insert(base + i)

    def _insert(self, node: int) -> None:
        level = int(-np.log(max(self.rng.random(), 1e-12)) * self.ml)
        self.levels.append(level)
        self.links.append([[] for _ in range(level + 1)])
        if self.entry < 0:
            self.entry, self.max_level = node, level
            return
        q = self.vecs[node]
        ep = self.entry
        for lc in range(self.max_level, level, -1):
            ep = self._greedy(q, ep, lc)
        for lc in range(min(level, self.max_level), -1, -1):
            cand = self._search_layer(q, [ep], lc, self.ef_c)
            mmax = self.m0 if lc == 0 else self.m
            chosen = [n for _, n in heapq.nlargest(self.m, cand)]
            self.links[node][lc] = list(chosen)
            for nb in chosen:
                lst = self.links[nb][lc]
                lst.append(node)
                if len(lst) > mmax:
                    # prune to the mmax closest of nb
                    d = self.vecs[lst] @ self.vecs[nb]
                    keep = np.argsort(-d)[:mmax]
                    self.links[nb][lc] = [lst[i] for i in keep]
            ep = chosen[0] if chosen else ep
        if level > self.max_level:
            self.entry, self.max_level = node, level

    def _greedy(self, q: np.ndarray, ep: int, layer: int) -> int:
        cur, cur_d = ep, float(q @ self.vecs[ep])
        improved = True
        while improved:
            improved = False
            for nb in self.links[cur][layer]:
                d = float(q @ self.vecs[nb])
                if d > cur_d:
                    cur, cur_d, improved = nb, d, True
        return cur

    def _search_layer(self, q, eps: list[int], layer: int, ef: int) -> list:
        """Beam search; returns [(sim, node)] of up to ef best (max-heap
        content, unordered)."""
        visited = set(eps)
        cand = [(-float(q @ self.vecs[e]), e) for e in eps]  # min-heap by -sim
        heapq.heapify(cand)
        best = [(float(q @ self.vecs[e]), e) for e in eps]  # min-heap by sim
        heapq.heapify(best)
        while cand:
            nsim, node = heapq.heappop(cand)
            if best and -nsim < best[0][0] and len(best) >= ef:
                break
            for nb in self.links[node][layer]:
                if nb in visited:
                    continue
                visited.add(nb)
                d = float(q @ self.vecs[nb])
                if len(best) < ef or d > best[0][0]:
                    heapq.heappush(cand, (-d, nb))
                    heapq.heappush(best, (d, nb))
                    if len(best) > ef:
                        heapq.heappop(best)
        return best

    # -- query ---------------------------------------------------------------

    def search(self, qvec: np.ndarray, k: int, ef: int | None = None) -> list:
        """[(id, cosine)] top-k, best first."""
        if self.entry < 0:
            return []
        ef = max(ef or 4 * k, k)
        q = np.asarray(qvec, dtype=np.float32)
        q = q / max(np.linalg.norm(q), 1e-12)
        ep = self.entry
        for lc in range(self.max_level, 0, -1):
            ep = self._greedy(q, ep, lc)
        best = self._search_layer(q, [ep], 0, ef)
        top = heapq.nlargest(k, best)
        return [(int(self.ids[n]), float(d)) for d, n in top]

    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        pickle.dump(
            {
                "dim": self.dim, "m": self.m, "ef_c": self.ef_c,
                "vecs": self.vecs, "ids": self.ids, "levels": self.levels,
                "links": self.links, "entry": self.entry,
                "max_level": self.max_level,
            },
            buf, protocol=4,
        )
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "HnswGraph":
        d = pickle.loads(blob)
        g = cls(d["dim"], d["m"], d["ef_c"])
        g.vecs, g.ids, g.levels = d["vecs"], d["ids"], d["levels"]
        g.links, g.entry, g.max_level = d["links"], d["entry"], d["max_level"]
        return g


def build_hnsw_index(
    emb: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    m: int = 16,
    ef_construction: int = 100,
) -> None:
    """Build per-shard graphs (shard = xxhash64(id) % n_shards — the
    segment router) and persist one blob row per shard. Construction
    parallelism = n_shards tasks; each task's memory holds only its
    shard's vectors + links, which is the per-segment bound Lucene's
    HNSW writer has."""
    routed = emb.withColumn(
        "shard", F.pmod(F.xxhash64("id"), F.lit(n_shards)).cast("int")
    ).repartition(n_shards, "shard")

    def build(batches):
        by_shard: dict[int, list] = {}
        for pdf in batches:
            for sh, grp in pdf.groupby("shard"):
                by_shard.setdefault(int(sh), []).append(grp)
        for sh, parts in by_shard.items():
            pdf = pd.concat(parts).sort_values("id", kind="mergesort")  # deterministic
            g = HnswGraph(
                dim=len(pdf["embedding"].iloc[0]), m=m,
                ef_construction=ef_construction, seed=42 + sh,
            )
            g.add_batch(
                pdf["id"].to_numpy(np.int64),
                np.array(pdf["embedding"].tolist(), dtype=np.float32),
            )
            yield pd.DataFrame({"shard": [sh], "blob": [g.to_bytes()]})

    routed.mapInPandas(build, schema="shard int, blob binary").write.mode(
        "overwrite"
    ).parquet(out_dir)


def hnsw_topk(
    spark: SparkSession, index_dir: str, qvec: np.ndarray, k: int = 10, ef: int | None = None
) -> DataFrame:
    """(id, cos) top-k: beam-search every shard graph in parallel, merge
    per-shard candidates with TakeOrderedAndProject — the per-segment
    KnnVectorQuery collector shape."""
    q = np.asarray(qvec, dtype=np.float64).tolist()

    def probe(batches, _q=q, _k=k, _ef=ef):
        qv = np.asarray(_q, dtype=np.float32)
        for pdf in batches:
            out_id, out_cos = [], []
            for blob in pdf["blob"]:
                g = HnswGraph.from_bytes(bytes(blob))
                for i, c in g.search(qv, _k, _ef):
                    out_id.append(i)
                    out_cos.append(c)
            if out_id:
                yield pd.DataFrame({"id": out_id, "cos": out_cos})

    blobs = spark.read.parquet(index_dir)
    return (
        blobs.mapInPandas(probe, schema="id long, cos double")
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )
