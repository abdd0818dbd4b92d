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

    # visited-bitmap budget for wave construction / batched serving: caps
    # the queries-per-wave so (wave, n) bool arrays stay bounded — at
    # 10M-node shards waves shrink to ~50 queries and throughput degrades
    # gracefully toward the sequential path instead of blowing memory
    VISITED_BUDGET_BYTES = 512 * 1024 * 1024
    # sequential bootstrap size before wave insertion starts: a seed
    # graph built the exact per-insert way — tiny wave graphs measured
    # poor beam navigability when the first wave is a large fraction of
    # the graph. Scalar inserts run ~300 vec/s, so this is front-loaded
    # cost: 256 measured BETTER recall than 1024 at 30k-100k gaussian
    # (the early waves' exact brute candidates beat early scalar beams)
    # at a third of the bootstrap cost
    BOOTSTRAP = 256
    # graphs this small build fully sequentially (see add_batch)
    SEQ_MAX = 1024
    # wave ceiling: bounds the O(W^2) intra-wave candidate pass and keeps
    # each wave small relative to the frozen graph (graph quality — wave
    # peers search a snapshot that excludes each other's links). Smaller
    # waves also measured FASTER end-to-end in the brute-candidate regime
    # (survivor extraction and diversity gram matrices scale with W while
    # the gemm total is W-invariant): 30k/64-d gaussian sweep — cap 128:
    # 5,068 vec/s recall@400 0.996; cap 256: 4,936 / 0.994; cap 512:
    # 3,590 / 0.992; cap 2048: 2,570 / 0.932
    WAVE_CAP = 128

    def add_batch(self, ids: np.ndarray, vecs: np.ndarray) -> None:
        """Bulk insert via BATCH-INSERT WAVES (the vectorized analog of
        Lucene's concurrent HnswGraphBuilder merge workers): store all
        vectors, sequentially insert a small bootstrap + every node with
        an upper level (rare, ~1/m), then insert level-0 nodes in
        doubling waves — each wave's neighbor searches run as ONE
        multi-query vectorized beam over the frozen snapshot (wave peers
        become candidates via a brute intra-wave top-m), followed by
        vectorized diversity selection and batched back-link
        reconciliation. Wave nodes don't see each other's links during
        the search, exactly like hnswlib's concurrent inserts; recall is
        held by the intra-wave candidate pass (measured on gaussian
        vectors, the worst case)."""
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

        end = base + k
        pos = base
        # sequential bootstrap; SMALL graphs (<= SEQ_MAX total) stay
        # entirely on the exact per-insert path — waves that are a large
        # fraction of a tiny graph measured worse beam navigability, and
        # sequential cost is negligible at this size
        boot_end = end if end <= self.SEQ_MAX else min(
            end, max(self.BOOTSTRAP, self.n)
        )
        while pos < boot_end:
            self.n = pos + 1
            self._insert(pos)
            pos += 1
        while pos < end:
            vis_cap = max(64, self.VISITED_BUDGET_BYTES // max(pos, 1))
            # wave <= half the frozen graph: each node's exact frozen
            # candidates then cover >= 2/3 of all inserted vectors
            wave = min(end - pos, max(128, pos // 2), self.WAVE_CAP, vis_cap)
            a, b = pos, pos + wave
            self.n = b
            # upper-LAYER links first (rare: ~1/m nodes) — batched
            # against the frozen upper layers; their layer-0 links come
            # from the wave below like everyone else's. Unlinked wave
            # peers are unreachable and thus invisible to these searches.
            lvl = self.levels[a:b]
            self._insert_upper_wave(a + np.flatnonzero(lvl > 0))
            self._insert_wave(np.arange(a, b, dtype=np.int64))
            pos = b

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
        self._register_upper(node, level)
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

    def _register_upper(self, node: int, level: int) -> None:
        """Track layer membership (nodes with level >= l) for the exact
        upper-layer candidate search."""
        if not hasattr(self, "_upper_members"):
            self._upper_members: list[list[int]] = []
        while len(self._upper_members) < level:
            self._upper_members.append([])
        for lc in range(1, level + 1):
            self._upper_members[lc - 1].append(int(node))

    def _upper_candidates(self, q: np.ndarray, lc: int, ep: int, ef_u: int):
        """Candidates for one node at layer lc: EXACT top-ef_u over the
        layer's members while the layer is small (one mat-vec — layers
        hold ~n/m^lc nodes so this stays cheap far beyond the layer-0
        brute cutoff), else the sequential beam."""
        members = (
            self._upper_members[lc - 1]
            if hasattr(self, "_upper_members") and lc <= len(self._upper_members)
            else []
        )
        if 0 < len(members) <= self.UPPER_BRUTE_MAX:
            arr = np.fromiter(members, dtype=np.int64, count=len(members))
            sims = self._qsims(arr, q)
            k = min(ef_u, len(arr))
            top = np.argpartition(-sims, k - 1)[:k]
            return [(float(sims[t]), int(arr[t])) for t in top]
        cand, _ = self._search_layer(q, [ep], lc, ef_u, expand=4)
        return cand

    def _insert_upper_only(self, node: int) -> None:
        """Place a node's links on layers >= 1 only (its layer-0 links
        come from the wave batch), using exact per-layer candidates."""
        level = int(self.levels[node])
        if self.entry < 0:
            self.entry, self.max_level = node, level
            self._set_neighbors(node, 0, _EMPTY_I32)
            self._register_upper(node, level)
            return
        q = self._unit_vec(node)
        ep = self.entry
        for lc in range(self.max_level, level, -1):
            ep = self._greedy(q, ep, lc)
        ef_u = max(2 * self.m, 48)
        for lc in range(min(level, self.max_level), 0, -1):
            cand = self._upper_candidates(q, lc, ep, ef_u)
            chosen = self._select_diverse(cand, self.m)
            self._set_neighbors(node, lc, np.asarray(chosen, dtype=np.int32))
            for nb in chosen:
                self._link_back(nb, node, lc, self.m)
            ep = chosen[0] if chosen else ep
        if level > self.max_level:
            self.entry, self.max_level = node, level
        self._register_upper(node, level)

    def _insert_upper_wave(self, nodes: np.ndarray) -> None:
        """Place upper-layer links for a wave's level>0 nodes in one
        batched pass: per layer, ONE gemm of the nodes' unit vectors
        against the FROZEN layer membership + per-row top-ef cut — the
        batched form of _upper_candidates' exact path. The scalar
        per-insert path handles bootstrap, level-raising nodes (they
        become the new entry), and layers past the brute cutoff (beam).
        Like the level-0 waves, wave peers search a snapshot that
        excludes each other — intra-wave upper links are forgone (they
        are ~(1/m)^2-rare and layer 0 still connects those docs)."""
        if not len(nodes):
            return
        ef_u = max(2 * self.m, 48)
        batch: list[int] = []
        for node in nodes.tolist():
            node = int(node)
            level = int(self.levels[node])
            mem_ok = True
            for lc in range(1, level + 1):
                members = (
                    self._upper_members[lc - 1]
                    if hasattr(self, "_upper_members")
                    and lc <= len(self._upper_members)
                    else []
                )
                if not (0 < len(members) <= self.UPPER_BRUTE_MAX):
                    mem_ok = False
                    break
            if self.entry < 0 or level > self.max_level or not mem_ok:
                self._insert_upper_only(node)
            else:
                batch.append(node)
        if not batch:
            return
        maxl = int(max(self.levels[n] for n in batch))
        for lc in range(maxl, 0, -1):
            sel = np.array(
                [n for n in batch if int(self.levels[n]) >= lc], dtype=np.int64
            )
            mem = self._upper_members[lc - 1]
            arr = np.fromiter(mem, dtype=np.int64, count=len(mem))
            S = self._unit_rows(sel) @ self._unit_rows(arr).T
            k = min(ef_u, len(arr))
            if k < S.shape[1]:
                top = np.argpartition(-S, k - 1, axis=1)[:, :k]
            else:
                top = np.tile(np.arange(S.shape[1]), (S.shape[0], 1))
            # per-row scalar diversity select: the incremental heuristic
            # touches few pairwise sims for m<<ef_u and measured FASTER
            # than the full (C,C) gram of _select_diverse_batch here
            for j, n in enumerate(sel.tolist()):
                cand = [(float(S[j, t]), int(arr[t])) for t in top[j]]
                chosen = self._select_diverse(cand, self.m)
                self._set_neighbors(int(n), lc, np.asarray(chosen, dtype=np.int32))
                for nb in chosen:
                    self._link_back(int(nb), int(n), lc, self.m)
        for n in batch:
            self._register_upper(n, int(self.levels[n]))

    # -- batched (wave) construction + multi-query search --------------------

    def _unit_rows2(self, nodes: np.ndarray) -> np.ndarray:
        """(A, B) node index array -> (A, B, d) unit float32 rows."""
        flat = self._unit_rows(nodes.reshape(-1))
        return flat.reshape(*nodes.shape, self.dim)

    def _batch_descend(self, Q: np.ndarray) -> np.ndarray:
        """Vectorized greedy descent of all upper layers for W unit
        queries at once -> (W,) entry points for layer 0. Per layer the
        sparse dict adjacency is padded ONCE into (rows, width) arrays so
        each greedy step is a single gather + batched mat-vec."""
        W = len(Q)
        cur = np.full(W, self.entry, dtype=np.int64)
        if self.max_level < 1:
            return cur
        cur_sim = np.einsum("wd,wd->w", self._unit_rows(cur), Q)
        rng_w = np.arange(W)
        for layer in range(self.max_level, 0, -1):
            d = self.upper[layer - 1] if layer - 1 < len(self.upper) else {}
            if not d:
                continue
            nodes = np.fromiter(d.keys(), dtype=np.int64, count=len(d))
            width = max(len(v) for v in d.values())
            padded = np.full((len(nodes), width), -1, dtype=np.int64)
            for j, nd in enumerate(nodes):
                padded[j, : len(d[int(nd)])] = d[int(nd)]
            rowmap = np.full(self._cap, -1, dtype=np.int64)
            rowmap[nodes] = np.arange(len(nodes))
            while True:
                rows = rowmap[cur]
                has = rows >= 0
                if not has.any():
                    break
                nb = padded[np.where(has, rows, 0)]
                valid = has[:, None] & (nb >= 0)
                nb_safe = np.where(valid, nb, 0)
                sims = np.einsum("wkd,wd->wk", self._unit_rows2(nb_safe), Q)
                sims = np.where(valid, sims, -np.inf)
                j = np.argmax(sims, axis=1)
                best = sims[rng_w, j]
                improved = best > cur_sim
                if not improved.any():
                    break
                cur = np.where(improved, nb_safe[rng_w, j], cur)
                cur_sim = np.where(improved, best, cur_sim)
        return cur

    def _batch_search_layer0(
        self, Q: np.ndarray, ef: int, width: int, expand: int = 4
    ) -> tuple[np.ndarray, np.ndarray]:
        """Multi-query beam over layer 0: W queries advance in LOCKSTEP;
        each iteration pops the best unexpanded pool entries per query,
        gathers + scores ONLY the not-yet-visited neighbors in one fused
        flat gather/mat-vec, and keeps the per-query top-ef by
        argpartition (no per-iteration sort — the pool is unsorted until
        the final per-row sort).

        Pop width ADAPTS: it starts at `expand` and grows as queries
        finish (E ~ W*expand/active) so straggler queries drain their
        whole frontier in a few coarse iterations instead of dragging
        the wave through hundreds of near-empty lockstep steps.

        Pool semantics per query: the ef best (node, sim, expanded)
        triples; the frontier IS the unexpanded subset of the pool (the
        same bound that terminates the sequential beam). Returns
        (nodes (W, ef) int64 with -1 padding, sims (W, ef) float32),
        desc-sorted. `width` bounds the visited bitmap (>= max reachable
        node index + 1)."""
        W, P = len(Q), ef
        E0 = max(1, expand)
        m0 = self.m0
        link0, cnt0 = self.link0, self.cnt0
        eps = self._batch_descend(Q)
        pool_nodes = np.full((W, P), -1, dtype=np.int32)
        pool_sims = np.full((W, P), -np.inf, dtype=np.float32)
        pool_exp = np.ones((W, P), dtype=bool)
        pool_nodes[:, 0] = eps
        pool_sims[:, 0] = np.einsum("wd,wd->w", self._unit_rows(eps), Q)
        pool_exp[:, 0] = False
        # BITPACKED visited map: (W, width/8) uint8 — 8x smaller than a
        # bool map, which keeps it AND the vector table resident in L3
        # (the unpacked map measured ~2x on the whole beam from cache
        # thrash alone). Duplicate set-bits within one scatter are
        # last-write-wins; a lost bit only means one node may be scored
        # twice, which the end-of-search dedup already tolerates.
        visited = np.zeros((W, (width >> 3) + 1), dtype=np.uint8)
        visited[np.arange(W), eps >> 3] = (1 << (eps & 7)).astype(np.uint8)
        col = np.arange(m0)
        NEG = -np.inf
        while True:
            frontier = np.where(pool_exp, NEG, pool_sims)
            act = np.flatnonzero((frontier > NEG).any(axis=1))
            if len(act) == 0:
                break
            A = len(act)
            E = int(min(P, self.ADAPT_E_CAP, max(E0, (W * E0) // A)))
            sub_front = frontier[act]
            if E < P:
                pick = np.argpartition(-sub_front, E - 1, axis=1)[:, :E]
            else:
                pick = np.tile(np.arange(P), (A, 1))
            picked_valid = np.take_along_axis(sub_front, pick, axis=1) > NEG
            pops = np.take_along_axis(pool_nodes[act], pick, axis=1)
            pool_exp[act[:, None], pick] = True
            safe_pops = np.where(picked_valid, pops, 0)
            nb_all = link0[safe_pops]  # (A, E, m0) int32 (stale past cnt)
            valid_all = picked_valid[:, :, None] & (
                col[None, None, :] < cnt0[safe_pops][:, :, None]
            )
            # one 3-D visited gather (stale/invalid slots hold real node
            # ids, so the unmasked gather is safe). A neighbor shared by
            # two pops of the SAME iteration slips through as a duplicate
            # — accepted: dup rate is a few %, duplicate pool entries
            # cost one wasted slot + a no-op re-expansion (visited blocks
            # re-adding), and the final per-row pass drops them from the
            # returned top-ef. An exact per-iteration sort-dedup measured
            # ~35% of the whole beam — not worth it.
            vis_bytes = visited[act[:, None, None], nb_all >> 3]
            fresh = valid_all & (
                (vis_bytes >> (nb_all & 7).astype(np.uint8)) & 1 == 0
            )
            ai, ei, mi = np.nonzero(fresh)
            if len(ai) == 0:
                continue
            nodes_flat = nb_all[ai, ei, mi]
            visited[act[ai], nodes_flat >> 3] |= (
                1 << (nodes_flat & 7)
            ).astype(np.uint8)
            # score ONLY the fresh neighbors: one flat row-wise mat-vec
            sims_flat = np.einsum(
                "nd,nd->n", self._unit_rows(nodes_flat), Q[act[ai]]
            ).astype(np.float32, copy=False)
            # scatter the ragged per-row candidates into a padded block
            counts = np.bincount(ai, minlength=A)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            pos = np.arange(len(ai)) - starts[ai]
            F = int(counts.max())
            cand_nodes = np.full((A, F), -1, dtype=np.int32)
            cand_sims = np.full((A, F), NEG, dtype=np.float32)
            cand_nodes[ai, pos] = nodes_flat
            cand_sims[ai, pos] = sims_flat
            all_nodes = np.concatenate([pool_nodes[act], cand_nodes], axis=1)
            all_sims = np.concatenate([pool_sims[act], cand_sims], axis=1)
            all_exp = np.concatenate([pool_exp[act], cand_nodes < 0], axis=1)
            keep = np.argpartition(-all_sims, P - 1, axis=1)[:, :P]
            pool_nodes[act] = np.take_along_axis(all_nodes, keep, axis=1)
            pool_sims[act] = np.take_along_axis(all_sims, keep, axis=1)
            pool_exp[act] = np.take_along_axis(all_exp, keep, axis=1)
        order = np.argsort(-pool_sims, axis=1, kind="stable")
        out_nodes = np.take_along_axis(pool_nodes, order, axis=1).astype(np.int64)
        out_sims = np.take_along_axis(pool_sims, order, axis=1)
        # drop within-iteration duplicate survivors: a node's duplicates
        # share one sim, so after the desc sort they sit inside the same
        # equal-sim run — one stable per-row node-sort finds them
        key_order = np.argsort(out_nodes, axis=1, kind="stable")
        by_node = np.take_along_axis(out_nodes, key_order, axis=1)
        dup_sorted = by_node[:, 1:] == by_node[:, :-1]
        if dup_sorted.any():
            dup = np.zeros_like(out_nodes, dtype=bool)
            np.put_along_axis(
                dup,
                key_order[:, 1:],
                dup_sorted & (by_node[:, 1:] >= 0),
                axis=1,
            )
            out_sims = np.where(dup, -np.inf, out_sims)
            out_nodes = np.where(dup, -1, out_nodes)
            reorder = np.argsort(-out_sims, axis=1, kind="stable")
            out_nodes = np.take_along_axis(out_nodes, reorder, axis=1)
            out_sims = np.take_along_axis(out_sims, reorder, axis=1)
        return out_nodes, out_sims

    def _select_diverse_batch(
        self, nodes: np.ndarray, sims: np.ndarray, m: int
    ) -> np.ndarray:
        """Vectorized heuristic neighbor selection (HNSW alg. 4 +
        keepPrunedConnections), run in LOCKSTEP across W candidate rows:
        candidate column i is occluded when it sits closer to an
        already-selected candidate than to the query. Candidates arrive
        desc-sorted; returns a bool selection mask with <= m per row —
        same rule as the sequential _select_diverse."""
        W, C = nodes.shape
        valid = nodes >= 0
        V = self._unit_rows2(np.where(valid, nodes, 0))
        S = np.matmul(V, V.transpose(0, 2, 1))
        selmask = np.zeros((W, C), dtype=bool)
        nsel = np.zeros(W, dtype=np.int64)
        for i in range(C):
            occ = (
                np.where(selmask, S[:, i, :], -np.inf) >= sims[:, i, None]
            ).any(axis=1)
            take = valid[:, i] & ~occ & (nsel < m)
            selmask[:, i] = take
            nsel += take
        # keepPrunedConnections backfill with the best skipped candidates
        skipped = valid & ~selmask
        crank = np.cumsum(skipped, axis=1)
        backfill = skipped & (crank <= (m - nsel)[:, None])
        return selmask | backfill

    def _add_links_batch(self, dst: np.ndarray, src: np.ndarray) -> None:
        """Batched layer-0 back-link reconciliation: append where slots
        remain; overflowing targets take ONE padded batched keep-closest
        prune (the same overflow rule as _link_back)."""
        m0 = self.m0
        order = np.argsort(dst, kind="stable")
        dst, src = dst[order], src[order]
        uniq, start, counts = np.unique(dst, return_index=True, return_counts=True)
        pos_in_grp = np.arange(len(dst)) - np.repeat(start, counts)
        over = counts + self.cnt0[uniq] > m0
        easy = np.repeat(~over, counts)
        if easy.any():
            de, se = dst[easy], src[easy]
            slot = self.cnt0[de] + pos_in_grp[easy]
            self.link0[de, slot] = se.astype(np.int32)
            self.cnt0[uniq[~over]] += counts[~over].astype(np.int32)
        if not over.any():
            return
        o_uniq, o_counts, o_start = uniq[over], counts[over], start[over]
        T = len(o_uniq)
        K = m0 + int(o_counts.max())
        cand = np.full((T, K), -1, dtype=np.int64)
        cand[:, :m0] = self.link0[o_uniq]
        cand[:, :m0][np.arange(m0)[None, :] >= self.cnt0[o_uniq][:, None]] = -1
        rr = np.repeat(np.arange(T), o_counts)
        cc = m0 + (
            np.arange(int(o_counts.sum()))
            - np.repeat(np.cumsum(o_counts) - o_counts, o_counts)
        )
        flat_src = np.concatenate(
            [src[s : s + c] for s, c in zip(o_start, o_counts)]
        )
        cand[rr, cc] = flat_src
        cvalid = cand >= 0
        qt = self._unit_rows(o_uniq)
        sims = np.einsum("tkd,td->tk", self._unit_rows2(np.where(cvalid, cand, 0)), qt)
        sims = np.where(cvalid, sims, -np.inf)
        keep = np.argsort(-sims, axis=1, kind="stable")[:, :m0]
        kept = np.take_along_axis(cand, keep, axis=1)
        kvalid = kept >= 0
        self.link0[o_uniq] = np.where(kvalid, kept, 0).astype(np.int32)
        self.cnt0[o_uniq] = kvalid.sum(axis=1).astype(np.int32)

    # worker threads for the wave's frozen-graph searches (the Lucene
    # 9.8 concurrent-merge HnswGraphBuilder analog: N workers build ONE
    # segment's graph). The searches are pure reads of the frozen
    # snapshot; link mutation stays single-threaded. numpy releases the
    # GIL on the hot gathers/reductions, measured ~1.9x at 4 threads.
    # Default 1: inside a Spark build task the executor already runs one
    # task per core, so intra-task threads would oversubscribe unless
    # spark.task.cpus is raised to match.
    BUILD_THREADS = 1
    # below this frozen-graph size a wave's candidate search runs EXACT:
    # one BLAS sgemm of the wave queries against every inserted vector +
    # a sampled-threshold top-C cut. At 64-d the gemm matches the beam's
    # rate around ~300k nodes (measured 300k gaussian: all-brute 1,382
    # vec/s recall@400 0.833 vs mixed 1,315 / 0.787 — exact candidates
    # also build the better graph), parallelizes through OpenBLAS, and
    # construction quality can only match or beat the sequential insert
    # path. Larger frozen graphs fall back to the lockstep beam (the
    # 1M+-vector shard path).
    BRUTE_N_MAX = 300_000
    # upper layers use the same exact-brute candidates while the layer
    # membership is small (it is n/m^level — tiny until huge shards)
    UPPER_BRUTE_MAX = 50_000
    # adaptive pop-width ceiling: expanding too many frontier entries of
    # ONE query in a single iteration inflates within-iteration duplicate
    # neighbors (they dodge the visited check) and wastes score volume
    ADAPT_E_CAP = 100
    # intra-wave brute candidates per node and selection gram width
    INTRA_T = 16
    SELECT_C = 64
    # frozen vectors per gemm block in _brute_topC: (wave x block) scores
    # stay L3-resident through the compare + survivor extraction
    BRUTE_COL_BLOCK = 8192

    def _batch_search_threaded(
        self, Q: np.ndarray, ef: int, width: int, expand: int = 4
    ) -> tuple[np.ndarray, np.ndarray]:
        T = max(1, int(self.BUILD_THREADS))
        W = len(Q)
        if T == 1 or W < 2 * T:
            return self._batch_search_layer0(Q, ef, width, expand)
        from concurrent.futures import ThreadPoolExecutor

        bounds = np.linspace(0, W, T + 1).astype(int)
        slices = [slice(a, b) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]
        with ThreadPoolExecutor(max_workers=len(slices)) as ex:
            parts = list(
                ex.map(
                    lambda s: self._batch_search_layer0(Q[s], ef, width, expand),
                    slices,
                )
            )
        return (
            np.concatenate([p[0] for p in parts], axis=0),
            np.concatenate([p[1] for p in parts], axis=0),
        )

    def _brute_topC(
        self, Q: np.ndarray, n_frozen: int, C: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """EXACT wave candidates: sgemm of the wave queries against
        every frozen vector, then a per-row top-C cut. A naive
        per-row argpartition over (W, n) measured ~20x the gemm itself,
        so the cut uses a SAMPLED THRESHOLD: estimate each row's C-th
        value from a strided column sample, keep entries above it
        (~2C survivors), and run the exact partition on the survivors
        only; rows whose sample misjudged fall back to an exact per-row
        partition. The gemm runs COLUMN-BLOCKED (BRUTE_COL_BLOCK
        frozen vectors per block) with survivors extracted while the
        block is still cache-resident: materializing the full (W, n) S
        pushed every compare/nonzero pass to DRAM speed and measured
        3.2-3.5x slower at 60k-200k frozen. Survivor sets are identical
        to the unblocked form (same threshold rule). Returns ((W, C)
        int64 nodes desc-sorted by sim with -1 padding, (W, C) float32
        sims)."""
        W = len(Q)
        C = min(C, n_frozen)
        if self.dtype == "int8":
            Vt = self.vecs[:n_frozen].astype(np.float32) * self.inv_norm[
                :n_frozen, None
            ]
        else:
            Vt = self.vecs[:n_frozen]
        out_nodes = np.full((W, C), -1, dtype=np.int64)
        out_sims = np.full((W, C), -np.inf, dtype=np.float32)

        def exact_rows_full(rows):
            if not len(rows):
                return
            Sb = Q[rows] @ Vt.T
            for j, r in enumerate(rows):
                top = np.argpartition(-Sb[j], C - 1)[:C]
                order = np.argsort(-Sb[j, top], kind="stable")
                out_nodes[r] = top[order]
                out_sims[r] = Sb[j, top[order]]

        if n_frozen <= 8 * C:
            exact_rows_full(np.arange(W))
            return out_nodes, out_sims
        # pass 1: sampled per-row threshold (kth margin 2.5x so cnt < C
        # fallbacks — each a full 1-row gemm — stay rare)
        step = max(1, n_frozen // 2048)
        samp = Q @ Vt[::step].T
        k = samp.shape[1]
        kth = min(k - 1, max(1, int(C * k / n_frozen * 2.5) + 1))
        thr = np.partition(samp, k - kth, axis=1)[:, k - kth]
        # pass 2: column-blocked gemm + cache-hot survivor extraction.
        # flatnonzero on the raveled mask (one index array, derive
        # row/col by shift/mask — B is a power of two) measured ~2x the
        # 2-D nonzero, which fills two index arrays with a divmod pass;
        # the mask buffer is reused across blocks (no per-block alloc)
        B = self.BRUTE_COL_BLOCK
        assert B & (B - 1) == 0, "BRUTE_COL_BLOCK must be a power of two"
        shift = B.bit_length() - 1
        mask_buf = np.empty((W, B), dtype=bool)
        ri_parts, ci_parts, sv_parts = [], [], []
        for b0 in range(0, n_frozen, B):
            Sb = Q @ Vt[b0 : b0 + B].T
            mb = mask_buf[:, : Sb.shape[1]]
            np.greater(Sb, thr[:, None], out=mb)
            flat = np.flatnonzero(mb.ravel() if Sb.shape[1] == B else mb)
            if len(flat):
                if Sb.shape[1] == B:
                    rb = flat >> shift
                    cb = flat & (B - 1)
                else:
                    rb, cb = np.divmod(flat, Sb.shape[1])
                ri_parts.append(rb)
                ci_parts.append((cb + b0).astype(np.int64))
                sv_parts.append(Sb[rb, cb])
        if ri_parts:
            ri = np.concatenate(ri_parts)
            ci = np.concatenate(ci_parts)
            sv = np.concatenate(sv_parts)
        else:
            ri = np.empty(0, dtype=np.int64)
            ci = np.empty(0, dtype=np.int64)
            sv = np.empty(0, dtype=np.float32)
        cnt = np.bincount(ri, minlength=W)
        bad = (cnt < C) | (cnt > 16 * C)
        good = ~bad
        gsel = good[ri]
        ri, ci, sv = ri[gsel], ci[gsel], sv[gsel]
        if len(ri):
            # block-major -> row-major so the padded scatter matches the
            # single-nonzero ordering
            order = np.argsort(ri, kind="stable")
            ri, ci, sv = ri[order], ci[order], sv[order]
            counts = np.bincount(ri, minlength=W)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            pos = np.arange(len(ri)) - starts[ri]
            Fm = int(counts.max())
            pad_s = np.full((W, Fm), -np.inf, dtype=np.float32)
            pad_n = np.full((W, Fm), -1, dtype=np.int64)
            pad_s[ri, pos] = sv
            pad_n[ri, pos] = ci
            kk = min(C, Fm)
            keep = np.argpartition(-pad_s, kk - 1, axis=1)[:, :kk]
            kn = np.take_along_axis(pad_n, keep, axis=1)
            ks = np.take_along_axis(pad_s, keep, axis=1)
            order2 = np.argsort(-ks, axis=1, kind="stable")
            kn = np.take_along_axis(kn, order2, axis=1)
            ks = np.take_along_axis(ks, order2, axis=1)
            grows = np.flatnonzero(good)
            out_nodes[grows, :kk] = kn[grows]
            out_sims[grows, :kk] = ks[grows]
        exact_rows_full(np.flatnonzero(bad))
        return out_nodes, out_sims

    def _insert_wave(self, idxs: np.ndarray) -> None:
        """Insert a wave of level-0 nodes: one batched frozen-graph
        search for neighbor candidates, a brute intra-wave top-m pass
        (wave peers can't see each other's links yet — this is what
        keeps near-duplicate/clustered inserts linked), vectorized
        diversity selection, then batched link writes + back-links."""
        W = len(idxs)
        m = self.m
        Q = self._unit_rows(idxs)
        n_frozen = int(idxs[0])
        if n_frozen <= self.BRUTE_N_MAX:
            nodes, sims = self._brute_topC(Q, n_frozen, self.ef_c)
        else:
            nodes, sims = self._batch_search_threaded(
                Q, self.ef_c, width=int(idxs.max()) + 1, expand=4
            )
        if W > 1:
            Sww = (Q @ Q.T).astype(np.float32)
            np.fill_diagonal(Sww, -np.inf)
            t = min(self.INTRA_T, W - 1)
            part = np.argpartition(-Sww, t - 1, axis=1)[:, :t]
            wave_nodes = idxs[part]
            wave_sims = np.take_along_axis(Sww, part, axis=1)
            nodes = np.concatenate([nodes, wave_nodes], axis=1)
            sims = np.concatenate([sims, wave_sims.astype(np.float32)], axis=1)
        # desc-sort merged candidates, truncate for the gram matrix
        C = min(nodes.shape[1], max(self.SELECT_C, 3 * m))
        order = np.argsort(-sims, axis=1, kind="stable")[:, :C]
        nodes = np.take_along_axis(nodes, order, axis=1)
        sims = np.take_along_axis(sims, order, axis=1)
        selmask = self._select_diverse_batch(nodes, sims, m)
        w_idx, c_idx = np.nonzero(selmask)
        slot = (np.cumsum(selmask, axis=1) - 1)[w_idx, c_idx]
        chosen = nodes[w_idx, c_idx]
        self.link0[idxs[w_idx], slot] = chosen.astype(np.int32)
        self.cnt0[idxs] = selmask.sum(axis=1).astype(np.int32)
        if len(w_idx):
            self._add_links_batch(chosen, idxs[w_idx])

    def search_batch(
        self, qvecs: np.ndarray, k: int, ef: int | None = None
    ) -> list[list]:
        """Batched multi-query serving: ONE lockstep vectorized beam for
        all queries against this graph (amortizes per-hop overhead the
        same way wave construction does). Returns per-query
        [(id, cosine)] top-k, best first — the building block of
        hnsw_topk_batch's one-wave-of-shard-tasks plan. Query batches
        are chunked to the visited-bitmap budget."""
        if self.n == 0 or self.entry < 0:
            return [[] for _ in range(len(qvecs))]
        ef = max(ef or 4 * k, k)
        Q = np.asarray(qvecs, dtype=np.float32)
        Q = Q / np.maximum(
            np.linalg.norm(Q, axis=1, keepdims=True), 1e-12
        )
        cap = max(16, self.VISITED_BUDGET_BYTES // max(self.n, 1))
        out: list[list] = []
        for off in range(0, len(Q), cap):
            nodes, sims = self._batch_search_threaded(
                Q[off : off + cap], ef, width=self.n, expand=4
            )
            for r in range(len(nodes)):
                valid = nodes[r] >= 0
                nn, ss = nodes[r][valid][:k], sims[r][valid][:k]
                out.append(
                    [(int(self.ids[n]), float(s)) for n, s in zip(nn, ss)]
                )
        return out

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
# workers only ever open their own task's shards (1-2 graphs each); the
# driver fast path pins every shard of a <=HNSW_DRIVER_MAX_BYTES index,
# so the LRU must hold a full small index without thrashing
_GRAPH_CACHE_MAX = 64


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


# single-query driver fast path (r7, the DRIVER_EXEC_MAX_POSTINGS analog
# for KNN): when the index's on-disk footprint fits this bound, serve the
# query from driver-side pinned graphs instead of a wave of Spark tasks —
# the per-task python round trip alone is ~140 ms on this host while the
# beam search is single-digit ms. Same per-shard kernel (_probe_shard),
# same merge order, so results are identical; 0 disables.
HNSW_DRIVER_MAX_BYTES = 512 * 1024 * 1024


def _index_bytes(index_dir: str) -> int:
    import os

    total = 0
    for root, _dirs, files in os.walk(index_dir):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(root, fn))
            except OSError:
                pass
    return total


def _probe_shard(
    g: "HnswGraph",
    qv: np.ndarray,
    k: int,
    ef,
    allow,
    exact_cutoff: float,
    visited_limit_frac: float,
):
    """Per-shard KNN probe — the ONE kernel shared by the distributed
    task wave and the driver fast path (so their hits are identical)."""
    if allow is not None and len(allow) == 0:
        # empty filter: zero hits everywhere (searchsorted against an
        # empty array would index out of bounds)
        return []
    if allow is not None:
        mask = np.zeros(g.n, dtype=bool)
        pos = np.searchsorted(allow, g.ids[: g.n])
        pos = np.minimum(pos, len(allow) - 1)
        mask[np.flatnonzero(allow[pos] == g.ids[: g.n])] = True
        n_allowed = int(mask.sum())
        if n_allowed == 0:
            return []
        if n_allowed < exact_cutoff * g.n:
            return g.search_exact(qv, k, allowed=mask)
        return g.search(
            qv, k, ef, allowed=mask,
            visited_limit=max(int(visited_limit_frac * g.n), 64),
        )
    return g.search(qv, k, ef)


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

    if HNSW_DRIVER_MAX_BYTES and _index_bytes(index_dir) <= HNSW_DRIVER_MAX_BYTES:
        # driver fast path: pinned graphs (same _GRAPH_CACHE), same
        # per-shard kernel, same (cos desc, id asc) merge — identical
        # hits without a wave of Spark tasks
        qv = np.asarray(q, dtype=np.float32)
        rows: list = []
        for sh in shards:
            g = _graph_for_shard(index_dir, int(sh), build_id)
            rows.extend(
                _probe_shard(
                    g, qv, k, ef, allowed_arr, exact_cutoff, visited_limit_frac
                )
            )
        rows.sort(key=lambda h: (-h[1], h[0]))
        from lucene_rust_spark.session import local_rows_df

        return local_rows_df(
            spark,
            [(int(i), float(c)) for i, c in rows[:k]],
            [("id", "BIGINT"), ("cos", "DOUBLE")],
        )

    def probe(batches, _q=q, _k=k, _ef=ef, _allow=allowed_arr,
              _dir=index_dir, _bid=build_id,
              _xc=exact_cutoff, _vl=visited_limit_frac):
        qv = np.asarray(_q, dtype=np.float32)
        for pdf in batches:
            for sh in pdf["shard"].tolist():
                # each task OPENS its shard from shared storage (pyarrow)
                # and caches the deserialized graph across queries — no
                # per-query shuffle of index bytes
                g = _graph_for_shard(_dir, int(sh), _bid)
                hits = _probe_shard(g, qv, _k, _ef, _allow, _xc, _vl)
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


def hnsw_topk_batch(
    spark: SparkSession,
    index_dir: str,
    qvecs: np.ndarray,
    k: int = 10,
    ef: int | None = None,
) -> DataFrame:
    """(qid, id, cos) top-k PER QUERY for a whole batch of queries in ONE
    wave of shard tasks — the batched-serving shape that amortizes the
    per-task floor (task launch + plan) across the batch: each shard
    task opens its cached graph once and answers EVERY query with the
    lockstep vectorized multi-query beam (HnswGraph.search_batch, the
    same kernel wave construction uses), so B queries cost one task wave
    instead of B. Per-query candidates from all shards (B x shards x k
    rows — tiny) merge with a row_number window, exactly the per-segment
    KnnVectorQuery collector merge done once per query."""
    from pyspark.sql.window import Window

    Qm = np.asarray(qvecs, dtype=np.float64)
    if Qm.ndim != 2:
        raise ValueError("qvecs must be (n_queries, dim)")
    qlist = Qm.tolist()
    meta = _read_index_meta(spark, index_dir)
    shards, build_id = meta["shards"], meta["build_id"]

    def probe(batches, _q=qlist, _k=k, _ef=ef, _dir=index_dir, _bid=build_id):
        qarr = np.asarray(_q, dtype=np.float32)
        for pdf in batches:
            for sh in pdf["shard"].tolist():
                g = _graph_for_shard(_dir, int(sh), _bid)
                per_q = g.search_batch(qarr, _k, _ef)
                qid, ids, cos = [], [], []
                for qi, hits in enumerate(per_q):
                    for i, c in hits:
                        qid.append(qi)
                        ids.append(i)
                        cos.append(c)
                if qid:
                    yield pd.DataFrame({"qid": qid, "id": ids, "cos": cos})

    rdd = spark.sparkContext.parallelize(
        [(int(s),) for s in shards], max(len(shards), 1)
    )
    tasks = spark.createDataFrame(rdd, "shard int")
    cand = tasks.mapInPandas(probe, schema="qid int, id long, cos double")
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
