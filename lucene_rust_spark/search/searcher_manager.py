"""SearcherManager — refcounted NRT searcher lifecycle.

Reference: clt/search/searcher_manager.rs, reference_manager.rs,
controlled_real_time_reopen_thread.rs [1-line stubs; Lucene 9
ReferenceManager semantics]: acquire() hands out the current searcher
and pins it; release() drops the pin; maybeRefresh() opens a NEW
searcher on the latest committed generation and atomically swaps it in
as current, while every already-acquired searcher stays fully usable
on its own generation until its last holder releases it.

Why this is safe on this index layout: commits are single-writer
two-phase manifest swaps (index/manifest.py), and every store a
searcher opens is immutable once its generation is committed — appends
add NEW part files (an already-opened DataFrame's file listing is
snapshotted at open), merges and delete-reclaims write NEW
generation-suffixed dirs (postings_g{n}, norms_g{n}, docmap_g{n},
terms_g{n}) and only retire the side-car terms_partial aggregates that
no reader opens. An old-generation searcher therefore never observes a
file vanish mid-query — the property Lucene gets from
IndexDeletionPolicy keeping referenced commit points alive.

The deletion policy itself is prune(): generation-suffixed dirs not
referenced by the current manifest or any still-acquired searcher are
deleted (keep-last-commit + keep-pinned). At fleet scale stale
generations are real storage — the manager is the one component that
knows which generations are pinned, so the policy lives here.
"""

from __future__ import annotations

import glob
import os
import shutil
import threading
from contextlib import contextmanager

from lucene_rust_spark.index.manifest import read_manifest


class AlreadyClosedError(RuntimeError):
    """Operation on a closed SearcherManager (the reference_manager.rs
    ensureOpen contract)."""


class _Ref:
    __slots__ = ("searcher", "count")

    def __init__(self, searcher, count: int):
        self.searcher = searcher
        self.count = count


class SearcherManager:
    """acquire/release refcounting + maybeRefresh over a single index
    directory. Thread-safe; Spark actions from concurrently-acquired
    searchers run on their own generations."""

    def __init__(
        self,
        spark,
        index_dir: str,
        cache: bool = False,
        similarity: str = "bm25",
        soft_deletes: bool = True,
    ):
        from lucene_rust_spark.search.searcher import IndexSearcher

        self._spark = spark
        self._index_dir = index_dir
        # pin_files: each generation's searcher freezes its file listing
        # at open — without it, a new searcher's directory-path read
        # plan-matches an older cached relation (Spark's CacheManager
        # matches analyzed plans) and would reuse its stale file set
        self._make = lambda: IndexSearcher(
            spark, index_dir, cache=cache,
            similarity=similarity, soft_deletes=soft_deletes, pin_files=True,
        )
        self._lock = threading.Lock()
        self._refresh_lock = threading.Lock()
        self._listeners: list = []
        self._closed = False
        # count=1 is the manager's own reference to the current searcher
        self._current: _Ref = _Ref(self._make(), 1)
        # retired generations still pinned by holders
        self._retired: list[_Ref] = []

    # -- ReferenceManager surface -------------------------------------------

    def acquire(self):
        """Pin and return the current searcher. Every acquire() must be
        paired with release() (or use the searcher() context manager)."""
        with self._lock:
            if self._closed:
                raise AlreadyClosedError("SearcherManager is closed")
            self._current.count += 1
            return self._current.searcher

    def release(self, searcher) -> None:
        """Drop one pin. When a retired generation's count reaches zero
        its caches are torn down (decRef → close, reference_manager.rs
        analog)."""
        with self._lock:
            if searcher is self._current.searcher:
                self._current.count -= 1
                if self._current.count <= 0 and self._closed:
                    self._close_searcher(self._current.searcher)
                return
            for i, ref in enumerate(self._retired):
                if ref.searcher is searcher:
                    ref.count -= 1
                    if ref.count <= 0:
                        self._retired.pop(i)
                        self._close_searcher(ref.searcher)
                    return
        raise ValueError("release() of a searcher this manager did not issue")

    @contextmanager
    def searcher(self):
        """with manager.searcher() as s: ... — acquire/release pairing."""
        s = self.acquire()
        try:
            yield s
        finally:
            self.release(s)

    def maybe_refresh(self) -> bool:
        """Open the latest committed generation if it is newer and swap
        it in as current. Returns False when another thread is already
        refreshing (Lucene maybeRefresh contract: only one refresh at a
        time; callers that must wait use maybe_refresh_blocking)."""
        if not self._refresh_lock.acquire(blocking=False):
            return False
        try:
            self._do_refresh()
            return True
        finally:
            self._refresh_lock.release()

    def maybe_refresh_blocking(self) -> None:
        with self._refresh_lock:
            self._do_refresh()

    def add_listener(self, listener) -> None:
        """listener gets before_refresh() / after_refresh(did_refresh)
        callbacks when it defines them (RefreshListener analog)."""
        self._listeners.append(listener)

    def remove_listener(self, listener) -> None:
        self._listeners.remove(listener)

    def close(self) -> None:
        """Drop the manager's reference; the current searcher is torn
        down once (and if) no holder still pins it. Idempotent."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._current.count -= 1
            if self._current.count <= 0:
                self._close_searcher(self._current.searcher)

    # -- introspection -------------------------------------------------------

    @property
    def current_generation(self) -> int:
        with self._lock:
            return int(self._current.searcher.manifest.get("generation", 0))

    def pinned_generations(self) -> list[int]:
        """Generations still held by at least one reference (current
        included) — what prune() must keep."""
        with self._lock:
            refs = [self._current] + list(self._retired)
            return sorted(
                {int(r.searcher.manifest.get("generation", 0)) for r in refs}
            )

    # -- deletion policy -----------------------------------------------------

    def prune(self) -> list[str]:
        """Delete generation-suffixed store dirs referenced by neither
        the on-disk manifest nor any pinned searcher (keep-last-commit +
        keep-pinned, the IndexDeletionPolicy analog). Returns the
        removed dirs. Single-writer assumption: no concurrent
        merge/append while pruning (same as commits)."""
        keep: set[str] = set()
        with self._lock:
            if self._closed:
                raise AlreadyClosedError("SearcherManager is closed")
            manifests = [r.searcher.manifest for r in [self._current] + self._retired]
        disk = read_manifest(self._index_dir)
        if disk is not None:
            manifests.append(disk)
        for m in manifests:
            for k in ("postings_dir", "norms_dir", "docmap_dir", "terms_dir"):
                keep.add(m.get(k) or k.replace("_dir", ""))
        removed = []
        for pat in ("postings_g*", "norms_g*", "docmap_g*", "terms_g*"):
            for d in sorted(glob.glob(os.path.join(self._index_dir, pat))):
                if os.path.basename(d) not in keep:
                    shutil.rmtree(d, ignore_errors=True)
                    removed.append(d)
        return removed

    # -- internals -----------------------------------------------------------

    def _do_refresh(self) -> None:
        with self._lock:
            if self._closed:
                raise AlreadyClosedError("SearcherManager is closed")
            cur_gen = int(self._current.searcher.manifest.get("generation", 0))
        m = read_manifest(self._index_dir)
        if m is None or int(m.get("generation", 0)) == cur_gen:
            return
        for ls in self._listeners:
            if hasattr(ls, "before_refresh"):
                ls.before_refresh()
        new = self._make()  # outside the lock: builds caches, runs Spark jobs
        with self._lock:
            old = self._current
            self._current = _Ref(new, 1)
            old.count -= 1  # the manager's reference moves to the new one
            if old.count <= 0:
                self._close_searcher(old.searcher)
            else:
                self._retired.append(old)
        for ls in self._listeners:
            if hasattr(ls, "after_refresh"):
                ls.after_refresh(True)

    @staticmethod
    def _close_searcher(s) -> None:
        s.close()
