"""Per-shard HNSW graph ANN — the KnnVectorQuery / Lucene99HnswVectorsFormat
analog (clt/util/hnsw/, 8 files; clt/search/knn_vector_query.rs,
abstract_knn_vector_query.rs [stubs]; Lucene 9 public semantics: one
small-world graph PER SEGMENT, queried with a greedy beam search,
per-segment top-k merged by the collector; a pre-filter becomes a
per-segment bitset, with a visited-node limit that falls back to exact
search when the filter is selective).

Spark mapping: shard = segment. Vectors are hash-routed to S shards; each
shard's graph is built INSIDE one applyInPandas task (graph construction
is inherently sequential per segment — exactly Lucene's per-segment
writer) and serialized as CHUNKED numpy rows (vectors / ids / levels /
layer-0 fixed-width links / upper-layer CSR), each row <= ~32 MB — a
shard is NOT capped by Spark's ~2 GB single-cell ceiling — written
PARTITIONED BY SHARD. A query fans one tiny task out per shard; each
task OPENS its shard's parquet from shared storage (pyarrow) and keeps
the deserialized graph in a bounded per-worker cache, so repeat queries
move zero index bytes — the executor-opens-its-segment / pinned-reader
model. Per-shard candidates merge through a TakeOrderedAndProject —
query fan-out, not construction, is what scales with the corpus,
matching how Lucene searches one graph per segment and merges.

The in-memory graph is a compact numpy HNSW: hierarchical layers with
exponential level assignment, greedy descent over upper layers, ef-beam
on layer 0 with BATCHED neighbor scoring (one mat-vec per hop, a numpy
visited bitmap — no per-neighbor Python arithmetic), M-pruned
bidirectional links in fixed-width int32 arrays. Distances are COSINE on
build-normalized vectors (dot products thereafter).

Filtered KNN (Lucene's KnnVectorQuery(filter) shape): the allowed-id set
becomes a per-shard node bitmask; traversal is unrestricted but only
allowed nodes enter the result heap. If the filter is selective
(< exact_cutoff of the shard) or the beam visits more than
visited_limit nodes, the shard falls back to EXACT scoring over the
allowed vectors — Lucene's visited-limit exact fallback.
"""

from __future__ import annotations

import heapq
import io
import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# serialization chunk target (bytes of payload per row)
CHUNK_BYTES = 32 * 1024 * 1024
# broadcast the filter id-set into the query closure below this count;
# larger filters should be pre-materialized per shard by the caller
FILTER_BROADCAST_MAX = 2_000_000


class HnswGraph:
    """Single-segment HNSW over unit-normalized vectors, cosine metric.

    Layer-0 links live in a fixed-width (n, m0) int32 array + counts;
    upper-layer links in per-layer dicts (few nodes have them). All beam
    hops score every neighbor of the popped node with ONE mat-vec.
    """

    def __init__(
        self,
        dim: int,
        m: int = 16,
        ef_construction: int = 100,
        seed: int = 42,
        dtype: str = "float32",
    ):
        if dtype not in ("float32", "int8"):
            raise ValueError(f"dtype must be float32 or int8, got {dtype!r}")
        self.dtype = dtype
        self.dim = dim
        self.m = m
        self.m0 = 2 * m  # layer-0 degree bound (Lucene/HNSW convention)
        self.ef_c = ef_construction
        self.ml = 1.0 / np.log(m)
        self.rng = np.random.default_rng(seed)
        self.n = 0
        self._cap = 0
        self.vecs = np.zeros(
            (0, dim), dtype=np.float32 if dtype == "float32" else np.int8
        )
        # int8 mode (KnnByteVectorQuery, clt/search/knn_byte_vector_query.rs
        # [stub]): vectors stay RAW int8 (4x memory/IO of float32) and the
        # per-node inverse norm turns dot products into cosines at score
        # time; float32 mode pre-normalizes and needs no inv_norm
        self.inv_norm = np.zeros(0, dtype=np.float32)
        self.ids = np.zeros(0, dtype=np.int64)
        self.levels = np.zeros(0, dtype=np.int32)
        self.link0 = np.zeros((0, self.m0), dtype=np.int32)
        self.cnt0 = np.zeros(0, dtype=np.int32)
        # upper[layer][node] -> int32 neighbor array (layers are sparse:
        # ~n/m nodes at layer 1, n/m^2 at 2, ...)
        self.upper: list[dict[int, np.ndarray]] = []
        self.entry = -1
        self.max_level = -1
        self._vis: np.ndarray | None = None
        self._vis_gen = 0

    # -- construction --------------------------------------------------------

    def _grow(self, add: int) -> None:
        need = self.n + add
        if need <= self._cap:
            return
        cap = max(need, int(self._cap * 1.5) + 64)
        for name, width in (("vecs", self.dim), ("link0", self.m0)):
            old = getattr(self, name)
            new = np.zeros((cap, width), dtype=old.dtype)
            new[: self.n] = old[: self.n]
            setattr(self, name, new)
        names = ["ids", "levels", "cnt0"]
        if self.dtype == "int8":
            names.append("inv_norm")
        for name in names:
            old = getattr(self, name)
            new = np.zeros(cap, dtype=old.dtype)
            new[: self.n] = old[: self.n]
            setattr(self, name, new)
        self._cap = cap

    def add_batch(self, ids: np.ndarray, vecs: np.ndarray) -> None:
        k = len(ids)
        self._grow(k)
        base = self.n
        if self.dtype == "int8":
            v8 = np.asarray(vecs, dtype=np.int8)
            norms = np.maximum(
                np.linalg.norm(v8.astype(np.float32), axis=1), 1e-12
            )
            self.vecs[base : base + k] = v8
            self.inv_norm[base : base + k] = (1.0 / norms).astype(np.float32)
        else:
            vf = np.asarray(vecs, dtype=np.float32)
            norms = np.maximum(np.linalg.norm(vf, axis=1, keepdims=True), 1e-12)
            self.vecs[base : base + k] = vf / norms
        self.ids[base : base + k] = np.asarray(ids, dtype=np.int64)
        # draw all levels up front (one RNG call, reproducible)
        lv = (-np.log(np.maximum(self.rng.random(k), 1e-12)) * self.ml).astype(
            np.int32
        )
        self.levels[base : base + k] = lv
        for i in range(k):
            self.n = base + i + 1
            self._insert(base + i)

    def _qsims(self, idx: np.ndarray, q: np.ndarray) -> np.ndarray:
        """Cosines of stored nodes `idx` vs the UNIT float32 query."""
        if self.dtype == "int8":
            return (self.vecs[idx].astype(np.float32) @ q) * self.inv_norm[idx]
        return self.vecs[idx] @ q

    def _unit_vec(self, node: int) -> np.ndarray:
        """Node vector as a unit float32 vector (query form)."""
        if self.dtype == "int8":
            return self.vecs[node].astype(np.float32) * self.inv_norm[node]
        return self.vecs[node]

    def _unit_rows(self, nodes: np.ndarray) -> np.ndarray:
        if self.dtype == "int8":
            return self.vecs[nodes].astype(np.float32) * self.inv_norm[nodes][:, None]
        return self.vecs[nodes]

    def _neighbors(self, node: int, layer: int) -> np.ndarray:
        if layer == 0:
            return self.link0[node, : self.cnt0[node]]
        if layer > len(self.upper):
            return _EMPTY_I32
        return self.upper[layer - 1].get(node, _EMPTY_I32)

    def _set_neighbors(self, node: int, layer: int, nbrs: np.ndarray) -> None:
        if layer == 0:
            c = min(len(nbrs), self.m0)
            self.link0[node, :c] = nbrs[:c]
            self.cnt0[node] = c
        else:
            while len(self.upper) < layer:
                self.upper.append({})
            self.upper[layer - 1][node] = np.asarray(nbrs, dtype=np.int32)

    def _insert(self, node: int) -> None:
        level = int(self.levels[node])
        if self.entry < 0:
            self.entry, self.max_level = node, level
            self._set_neighbors(node, 0, _EMPTY_I32)
            return
        q = self._unit_vec(node)
        ep = self.entry
        for lc in range(self.max_level, level, -1):
            ep = self._greedy(q, ep, lc)
        for lc in range(min(level, self.max_level), -1, -1):
            cand, _ = self._search_layer(q, [ep], lc, self.ef_c, expand=4)
            mmax = self.m0 if lc == 0 else self.m
            chosen = self._select_diverse(cand, self.m)
            self._set_neighbors(node, lc, np.asarray(chosen, dtype=np.int32))
            for nb in chosen:
                self._link_back(nb, node, lc, mmax)
            ep = chosen[0] if chosen else ep
        if level > self.max_level:
            self.entry, self.max_level = node, level

    def _select_diverse(self, cand: list, m: int) -> list[int]:
        """Heuristic neighbor selection (HNSW paper alg. 4 / Lucene's
        diversity check): take candidates by descending sim to q, skip c
        if it is closer to an already-selected neighbor than to q —
        keeps edges spread across directions, which is what preserves
        graph navigability (plain top-m clusters the links and costs
        recall). One candidate-candidate gram matrix, no per-step
        gathers."""
        if not cand:
            return []
        order = sorted(cand, reverse=True)
        nodes = np.fromiter((c for _, c in order), dtype=np.int64, count=len(order))
        simsq = np.fromiter((s for s, _ in order), dtype=np.float32, count=len(order))
        V = self._unit_rows(nodes)
        S = V @ V.T
        sel: list[int] = []
        skipped: list[int] = []
        for i in range(len(nodes)):
            if len(sel) >= m:
                break
            if sel and bool((S[i, sel] >= simsq[i]).any()):
                skipped.append(i)
                continue
            sel.append(i)
        if len(sel) < m and skipped:
            # keepPrunedConnections: backfill with the best skipped
            # candidates — without this, dense clusters yield under-linked
            # nodes and recall collapses at scale
            sel.extend(skipped[: m - len(sel)])
            sel.sort()
        return [int(nodes[i]) for i in sel]

    def _link_back(self, nb: int, node: int, layer: int, mmax: int) -> None:
        cur = self._neighbors(nb, layer)
        if len(cur) < mmax:
            if layer == 0:
                self.link0[nb, self.cnt0[nb]] = node
                self.cnt0[nb] += 1
            else:
                self.upper[layer - 1][nb] = np.append(cur, np.int32(node))
            return
        # prune to the mmax closest of nb (one mat-vec). Measured: the
        # full diversity-heuristic shrink here costs 1.75x build time for
        # +0.006 recall on random 64-d data — keep-closest is the right
        # trade for the overflow path (selection keeps the heuristic)
        cand = np.append(cur, np.int32(node))
        sims = self._qsims(cand, self._unit_vec(nb))
        keep = cand[np.argsort(-sims, kind="stable")[:mmax]]
        self._set_neighbors(nb, layer, keep)

    def _greedy(self, q: np.ndarray, ep: int, layer: int) -> int:
        cur = ep
        cur_d = float(q @ self._unit_vec(ep))
        while True:
            nbrs = self._neighbors(cur, layer)
            if len(nbrs) == 0:
                return cur
            sims = self._qsims(nbrs, q)
            j = int(np.argmax(sims))
            if sims[j] <= cur_d:
                return cur
            cur, cur_d = int(nbrs[j]), float(sims[j])

    def _search_layer(
        self,
        q: np.ndarray,
        eps: list[int],
        layer: int,
        ef: int,
        allowed: np.ndarray | None = None,
        visited_limit: int | None = None,
        expand: int = 1,
    ) -> tuple[list, int]:
        """Beam search with batched neighbor scoring. Returns
        ([(sim, node)] min-heap content of up to ef best, n_visited).
        `allowed` (bool mask over nodes) restricts which nodes may enter
        the RESULT heap — traversal is unrestricted (the Lucene filtered
        HNSW rule). Raises _VisitedLimit when the traversal exceeds
        visited_limit.

        ``expand`` > 1 pops that many frontier candidates per iteration
        and fuses their layer-0 neighbor gather + scoring into single
        numpy ops (fixed-width link0 makes the gather one fancy index) —
        ~6 numpy dispatches per POP become ~6 per BATCH. A coarser
        expansion order explores a slightly different (measured:
        equivalent-recall) frontier; construction uses it, queries keep
        expand=1 for the canonical order."""
        # generation-stamped visited bitmap: no per-search allocation
        if self._vis is None or len(self._vis) < self._cap:
            self._vis = np.zeros(self._cap, dtype=np.int64)
            self._vis_gen = 0
        self._vis_gen += 1
        gen = self._vis_gen
        vis = self._vis
        n_visited = len(eps)
        eps_arr = np.asarray(eps, dtype=np.int64)
        vis[eps_arr] = gen
        sims0 = self._qsims(eps_arr, q)
        cand = [(-float(s), int(e)) for s, e in zip(sims0, eps)]
        heapq.heapify(cand)
        best = [
            (float(s), int(e))
            for s, e in zip(sims0, eps)
            if allowed is None or allowed[e]
        ]
        heapq.heapify(best)
        link0, cnt0 = self.link0, self.cnt0
        m0 = self.m0
        col = np.arange(m0)
        while cand:
            if expand > 1 and layer == 0:
                # fused multi-pop: gather up to `expand` above-threshold
                # frontier nodes, mask their fixed-width link rows in one
                # shot, dedup via the visited stamp
                batch = []
                while cand and len(batch) < expand:
                    nsim, node = heapq.heappop(cand)
                    if len(best) >= ef and -nsim < best[0][0]:
                        if not batch:
                            return best, n_visited
                        break
                    batch.append(node)
                if not batch:
                    break
                barr = np.asarray(batch, dtype=np.int64)
                rows = link0[barr]
                flat = rows[col[None, :] < cnt0[barr][:, None]]
                if len(flat) == 0:
                    continue
                nbrs = np.unique(flat)
            else:
                nsim, node = heapq.heappop(cand)
                if len(best) >= ef and -nsim < best[0][0]:
                    break
                if layer == 0:
                    nbrs = link0[node, : cnt0[node]]
                else:
                    nbrs = self._neighbors(node, layer)
            if len(nbrs) == 0:
                continue
            fresh = nbrs[vis[nbrs] != gen]
            if len(fresh) == 0:
                continue
            vis[fresh] = gen
            n_visited += len(fresh)
            if visited_limit is not None and n_visited > visited_limit:
                raise _VisitedLimit()
            sims = self._qsims(fresh, q)
            if len(best) >= ef:
                # numpy-prune against the current worst kept sim: stale
                # within the batch (a superset of the exact rule) but it
                # removes the per-neighbor Python comparisons
                keep = sims > best[0][0]
                if not keep.any():
                    continue
                fresh, sims = fresh[keep], sims[keep]
            for s, nb in zip(sims.tolist(), fresh.tolist()):
                heapq.heappush(cand, (-s, nb))
                if allowed is None or allowed[nb]:
                    heapq.heappush(best, (s, nb))
                    if len(best) > ef:
                        heapq.heappop(best)
        return best, n_visited

    # -- query ---------------------------------------------------------------

    def search(
        self,
        qvec: np.ndarray,
        k: int,
        ef: int | None = None,
        allowed: np.ndarray | None = None,
        visited_limit: int | None = None,
    ) -> list:
        """[(id, cosine)] top-k, best first. `allowed` is a bool mask over
        internal nodes; on visited-limit overrun falls back to EXACT
        scoring of the allowed set (Lucene's exact fallback)."""
        if self.n == 0 or self.entry < 0:
            return []
        ef = max(ef or 4 * k, k)
        q = np.asarray(qvec, dtype=np.float32)
        q = q / max(float(np.linalg.norm(q)), 1e-12)
        try:
            ep = self.entry
            for lc in range(self.max_level, 0, -1):
                ep = self._greedy(q, ep, lc)
            best, _ = self._search_layer(
                q, [ep], 0, ef, allowed=allowed, visited_limit=visited_limit
            )
        except _VisitedLimit:
            # pass the ORIGINAL query: re-normalizing an already-unit
            # vector perturbs low bits and would make the fallback
            # disagree with a direct search_exact call on near-ties
            return self.search_exact(qvec, k, allowed)
        top = heapq.nlargest(k, best)
        return [(int(self.ids[n]), float(d)) for d, n in top]

    def search_exact(
        self, qvec: np.ndarray, k: int, allowed: np.ndarray | None = None
    ) -> list:
        """Exact top-k by one mat-vec (the brute/fallback path)."""
        q = np.asarray(qvec, dtype=np.float32)
        q = q / max(float(np.linalg.norm(q)), 1e-12)
        if allowed is not None:
            idx = np.flatnonzero(allowed[: self.n])
        else:
            idx = np.arange(self.n)
        if len(idx) == 0:
            return []
        sims = self._qsims(idx, q)
        kk = min(k, len(idx))
        top = np.argpartition(-sims, kk - 1)[:kk]
        top = top[np.argsort(-sims[top], kind="stable")]
        return [(int(self.ids[idx[t]]), float(sims[t])) for t in top]

    # -- serialization (chunked, no pickle) ----------------------------------

    def to_rows(self, shard: int) -> list[tuple]:
        """(shard, kind, part, meta, payload) rows, each payload <=
        ~CHUNK_BYTES — reassembled by from_rows inside a query task."""
        rows: list[tuple] = []
        n = self.n
        meta = {
            "dim": self.dim, "m": self.m, "ef_c": self.ef_c, "n": int(n),
            "entry": int(self.entry), "max_level": int(self.max_level),
            "n_upper": len(self.upper), "dtype": self.dtype,
        }
        rows.append((shard, "meta", 0, json.dumps(meta), b""))
        arrays = [
            ("vecs", np.ascontiguousarray(self.vecs[:n])),
            ("ids", np.ascontiguousarray(self.ids[:n])),
            ("levels", np.ascontiguousarray(self.levels[:n])),
            ("link0", np.ascontiguousarray(self.link0[:n])),
            ("cnt0", np.ascontiguousarray(self.cnt0[:n])),
        ]
        if self.dtype == "int8":
            arrays.append(("inorm", np.ascontiguousarray(self.inv_norm[:n])))
        for kind, arr in arrays:
            raw = arr.tobytes()
            for part, off in enumerate(range(0, max(len(raw), 1), CHUNK_BYTES)):
                rows.append((shard, kind, part, "", raw[off : off + CHUNK_BYTES]))
        for layer_i, d in enumerate(self.upper):
            nodes = np.fromiter(d.keys(), dtype=np.int32, count=len(d))
            order = np.argsort(nodes, kind="stable")
            nodes = nodes[order]
            lists = [d[int(nd)] for nd in nodes]
            indptr = np.zeros(len(nodes) + 1, dtype=np.int64)
            if lists:
                indptr[1:] = np.cumsum([len(x) for x in lists])
            indices = (
                np.concatenate(lists).astype(np.int32)
                if lists
                else _EMPTY_I32
            )
            buf = io.BytesIO()
            np.savez(buf, nodes=nodes, indptr=indptr, indices=indices)
            raw = buf.getvalue()
            for part, off in enumerate(range(0, max(len(raw), 1), CHUNK_BYTES)):
                rows.append(
                    (shard, f"upper{layer_i + 1}", part, "", raw[off : off + CHUNK_BYTES])
                )
        return rows

    @classmethod
    def from_rows(cls, rows: pd.DataFrame) -> "HnswGraph":
        meta = json.loads(
            rows.loc[rows["kind"] == "meta", "meta"].iloc[0]
        )
        def blob(kind: str) -> bytes:
            sel = rows[rows["kind"] == kind].sort_values("part")
            return b"".join(bytes(b) for b in sel["payload"])

        dtype = meta.get("dtype", "float32")
        g = cls(meta["dim"], meta["m"], meta["ef_c"], dtype=dtype)
        n = meta["n"]
        g.n = g._cap = n
        vdt = np.float32 if dtype == "float32" else np.int8
        g.vecs = np.frombuffer(blob("vecs"), dtype=vdt).reshape(n, meta["dim"]).copy()
        if dtype == "int8":
            g.inv_norm = np.frombuffer(blob("inorm"), dtype=np.float32).copy()
        g.ids = np.frombuffer(blob("ids"), dtype=np.int64).copy()
        g.levels = np.frombuffer(blob("levels"), dtype=np.int32).copy()
        g.link0 = np.frombuffer(blob("link0"), dtype=np.int32).reshape(n, g.m0).copy()
        g.cnt0 = np.frombuffer(blob("cnt0"), dtype=np.int32).copy()
        g.entry, g.max_level = meta["entry"], meta["max_level"]
        for layer_i in range(meta["n_upper"]):
            z = np.load(io.BytesIO(blob(f"upper{layer_i + 1}")))
            d: dict[int, np.ndarray] = {}
            nodes, indptr, indices = z["nodes"], z["indptr"], z["indices"]
            for j, nd in enumerate(nodes):
                d[int(nd)] = indices[indptr[j] : indptr[j + 1]]
            g.upper.append(d)
        return g


class _VisitedLimit(Exception):
    pass


_EMPTY_I32 = np.zeros(0, dtype=np.int32)

_ROWS_SCHEMA = "shard int, kind string, part int, meta string, payload binary"


def build_hnsw_index(
    emb: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    m: int = 16,
    ef_construction: int = 100,
    dtype: str = "float32",
) -> None:
    """Build per-shard graphs (shard = xxhash64(id) % n_shards — the
    segment router) and persist chunked rows PARTITIONED BY SHARD, plus a
    driver-side _hnsw_meta.json (shard list + build id). Construction
    parallelism = n_shards tasks; each task's memory holds only its
    shard's vectors + links, which is the per-segment bound Lucene's
    HNSW writer has. The partitioned layout lets a query task open ONLY
    its shard's files (the executor-opens-its-segment model) instead of
    shuffling every chunk row per query."""
    import uuid

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
                ef_construction=ef_construction, seed=42 + sh, dtype=dtype,
            )
            g.add_batch(
                pdf["id"].to_numpy(np.int64),
                np.array(
                    pdf["embedding"].tolist(),
                    dtype=np.float32 if dtype == "float32" else np.int8,
                ),
            )
            yield pd.DataFrame(
                g.to_rows(sh),
                columns=["shard", "kind", "part", "meta", "payload"],
            )

    out = routed.mapInPandas(build, schema=_ROWS_SCHEMA)
    out.write.mode("overwrite").partitionBy("shard").parquet(out_dir)
    spark = emb.sparkSession
    shards = [
        int(r["shard"])
        for r in spark.read.parquet(out_dir).select("shard").distinct().collect()
    ]
    meta = {"shards": sorted(shards), "build_id": uuid.uuid4().hex}
    with open(_meta_path(out_dir), "w") as f:
        json.dump(meta, f)


def _meta_path(out_dir: str) -> str:
    import os

    return os.path.join(out_dir, "_hnsw_meta.json")


def _read_index_meta(spark, out_dir: str) -> dict:
    import os

    p = _meta_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    # fallback (e.g. meta lost in a copy): derive shards, synthesize id
    shards = [
        int(r["shard"])
        for r in spark.read.parquet(out_dir).select("shard").distinct().collect()
    ]
    return {"shards": sorted(shards), "build_id": f"derived:{out_dir}"}


# per-worker deserialized-graph cache (pyspark reuses python workers
# across queries: this is the "reader pinned in executor memory" model —
# Lucene opens a segment reader once and serves every query from it).
# Keyed by (index_dir, shard, build_id) so a rebuilt index misses;
# bounded LRU.
_GRAPH_CACHE: dict = {}
_GRAPH_CACHE_MAX = 4


def _graph_for_shard(index_dir: str, sh: int, build_id: str) -> HnswGraph:
    key = (index_dir, int(sh), build_id)
    g = _GRAPH_CACHE.get(key)
    if g is None:
        import pyarrow.parquet as pq

        tbl = pq.read_table(f"{index_dir}/shard={int(sh)}")
        g = HnswGraph.from_rows(tbl.to_pandas())
        if len(_GRAPH_CACHE) >= _GRAPH_CACHE_MAX:
            _GRAPH_CACHE.pop(next(iter(_GRAPH_CACHE)))
        _GRAPH_CACHE[key] = g
    return g


def hnsw_topk(
    spark: SparkSession,
    index_dir: str,
    qvec: np.ndarray,
    k: int = 10,
    ef: int | None = None,
    filter_ids=None,
    exact_cutoff: float = 0.05,
    visited_limit_frac: float = 0.5,
) -> DataFrame:
    """(id, cos) top-k: beam-search every shard graph in parallel, merge
    per-shard candidates with TakeOrderedAndProject — the per-segment
    KnnVectorQuery collector shape.

    `filter_ids` (KnnVectorQuery's pre-filter, clt/search/
    abstract_knn_vector_query.rs): a DataFrame with an `id` column or an
    iterable of ids. Per shard the filter becomes a node bitmask; if the
    filter covers < exact_cutoff of the shard, or the beam's visited set
    exceeds visited_limit_frac * shard_n, the shard scores the allowed
    vectors EXACTLY instead (Lucene's visited-limit fallback), so highly
    selective filters return exact answers."""
    q = np.asarray(qvec, dtype=np.float64).tolist()
    allowed_arr = None
    if filter_ids is not None:
        if isinstance(filter_ids, DataFrame):
            n_filter = filter_ids.count()
            if n_filter > FILTER_BROADCAST_MAX:
                raise ValueError(
                    f"filter has {n_filter} ids > FILTER_BROADCAST_MAX; "
                    "pre-restrict the filter or raise the cap"
                )
            allowed_arr = np.sort(
                np.array(
                    [r[0] for r in filter_ids.select("id").collect()],
                    dtype=np.int64,
                )
            )
        else:
            allowed_arr = np.sort(np.asarray(list(filter_ids), dtype=np.int64))

    meta = _read_index_meta(spark, index_dir)
    shards, build_id = meta["shards"], meta["build_id"]

    def probe(batches, _q=q, _k=k, _ef=ef, _allow=allowed_arr,
              _dir=index_dir, _bid=build_id):
        qv = np.asarray(_q, dtype=np.float32)
        for pdf in batches:
            for sh in pdf["shard"].tolist():
                # each task OPENS its shard from shared storage (pyarrow)
                # and caches the deserialized graph across queries — no
                # per-query shuffle of index bytes
                g = _graph_for_shard(_dir, int(sh), _bid)
                if _allow is not None and len(_allow) == 0:
                    # empty filter: zero hits everywhere (searchsorted
                    # against an empty array would index out of bounds)
                    continue
                if _allow is not None:
                    mask = np.zeros(g.n, dtype=bool)
                    pos = np.searchsorted(_allow, g.ids[: g.n])
                    pos = np.minimum(pos, len(_allow) - 1)
                    mask[np.flatnonzero(_allow[pos] == g.ids[: g.n])] = True
                    n_allowed = int(mask.sum())
                    if n_allowed == 0:
                        continue
                    if n_allowed < exact_cutoff * g.n:
                        hits = g.search_exact(qv, _k, allowed=mask)
                    else:
                        hits = g.search(
                            qv, _k, _ef, allowed=mask,
                            visited_limit=max(int(visited_limit_frac * g.n), 64),
                        )
                else:
                    hits = g.search(qv, _k, _ef)
                if hits:
                    yield pd.DataFrame(
                        {"id": [h[0] for h in hits], "cos": [h[1] for h in hits]}
                    )

    # one slice per shard via parallelize: no shuffle stage — the whole
    # query is one wave of shard tasks feeding a TakeOrderedAndProject
    rdd = spark.sparkContext.parallelize(
        [(int(s),) for s in shards], max(len(shards), 1)
    )
    tasks = spark.createDataFrame(rdd, "shard int")
    return (
        tasks.mapInPandas(probe, schema="id long, cos double")
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )
