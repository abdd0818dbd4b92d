"""SearcherLifetimeManager — search old generations by token.

Reference: clt/search/searcher_lifetime_manager.rs [stub; Lucene 9
semantics]. The paging-consistency primitive: record() the searcher that
served page 1 and hand its token to the client; when page 2 arrives —
possibly after refreshes published newer generations — acquire(token)
returns the SAME index view, so search_after cursors stay valid and no
hit is skipped or repeated across pages. prune(PruneByAge(...)) drops
views no client can still reasonably hold.

Spark mapping: the token is the commit generation (Lucene uses the
IndexCommit version — same monotonic identity). Recorded searchers are
refcounted like SearcherManager's retired refs; acquire() re-pins. A
recorded generation also guards the deletion policy: pass
recorded_generations() into IndexFileDeleter.checkpoint(protected_generations=...)
so a paging client's files stay on disk (Spark re-opens parquet per job,
unlike Lucene's POSIX unlink-while-open)."""

from __future__ import annotations

import threading
import time


class PruneByAge:
    """Drop recorded searchers older than max_age_sec — Lucene's
    PruneByAge. Never prunes the newest recorded searcher (a just-paging
    client should always find SOME view), matching Lucene's contract."""

    def __init__(self, max_age_sec: float):
        self.max_age_sec = float(max_age_sec)

    def do_prune(self, age_sec: float, searcher) -> bool:
        return age_sec > self.max_age_sec


class _Rec:
    __slots__ = ("searcher", "count", "recorded_at")

    def __init__(self, searcher, now: float):
        self.searcher = searcher
        self.count = 1  # the manager's own reference
        self.recorded_at = now


class SearcherLifetimeManager:
    def __init__(self, _clock=time.monotonic):
        self._lock = threading.Lock()
        self._by_gen: dict[int, _Rec] = {}
        self._pruned: list[_Rec] = []  # dropped but still pinned by acquirers
        self._clock = _clock
        self._closed = False

    @staticmethod
    def _gen(searcher) -> int:
        return int(searcher.manifest.get("generation", 0))

    def record(self, searcher) -> int:
        """Keep this searcher's view alive; returns the token a client
        embeds in its paging cursor. Re-recording the same generation is
        a no-op returning the same token (Lucene: record is idempotent
        per version)."""
        with self._lock:
            if self._closed:
                raise RuntimeError("SearcherLifetimeManager is closed")
            gen = self._gen(searcher)
            rec = self._by_gen.get(gen)
            if rec is None:
                self._by_gen[gen] = _Rec(searcher, self._clock())
            elif rec.searcher is not searcher:
                raise ValueError(
                    f"a different searcher for generation {gen} is already recorded"
                )
            return gen

    def acquire(self, token: int):
        """The searcher recorded under token, re-pinned — or None when it
        was pruned (the client must restart its paging session, Lucene's
        contract)."""
        with self._lock:
            rec = self._by_gen.get(int(token))
            if rec is None:
                return None
            rec.count += 1
            return rec.searcher

    def release(self, searcher) -> None:
        close = False
        with self._lock:
            gen = self._gen(searcher)
            rec = self._by_gen.get(gen)
            if rec is not None and rec.searcher is searcher:
                rec.count -= 1  # stays >= 1 while recorded (manager's ref)
                return
            for i, rec in enumerate(self._pruned):
                if rec.searcher is searcher:
                    rec.count -= 1
                    if rec.count <= 0:
                        self._pruned.pop(i)
                        close = True
                    break
            else:
                raise ValueError("release() of a searcher not acquired here")
        if close:
            searcher.close()

    def recorded_generations(self) -> list[int]:
        """For IndexFileDeleter.checkpoint(protected_generations=...)."""
        with self._lock:
            return sorted(self._by_gen)

    def prune(self, pruner) -> list[int]:
        """Apply the pruner to every recorded searcher except the newest.
        A pruned generation is dropped from the map immediately; its
        searcher is closed once in-flight acquirers release it."""
        to_close = []
        pruned = []
        now = self._clock()
        with self._lock:
            if not self._by_gen:
                return []
            newest = max(self._by_gen)
            for gen in sorted(g for g in self._by_gen if g != newest):
                rec = self._by_gen[gen]
                if pruner.do_prune(now - rec.recorded_at, rec.searcher):
                    del self._by_gen[gen]
                    pruned.append(gen)
                    rec.count -= 1  # the manager's own reference
                    if rec.count <= 0:
                        to_close.append(rec.searcher)
                    else:
                        self._pruned.append(rec)  # acquirers still hold it
        for s in to_close:
            s.close()
        return pruned

    def close(self) -> None:
        with self._lock:
            if self._closed:
                return
            self._closed = True
            recs = list(self._by_gen.values())
            self._by_gen.clear()
        for rec in recs:
            rec.count -= 1
            if rec.count <= 0:
                rec.searcher.close()
