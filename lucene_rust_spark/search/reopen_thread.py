"""ControlledRealTimeReopenThread analog — periodic NRT refresh with
wait-for-generation semantics.

Reference: clt/search/controlled_real_time_reopen_thread.rs [1-line stub;
Lucene 9 ControlledRealTimeReopenThread semantics]: a daemon thread that
refreshes the SearcherManager at most every target_max_stale_sec; a
caller that has just committed generation G calls wait_for_generation(G)
and blocks until a refreshed searcher covers G — the thread then
refreshes after only target_min_stale_sec (batching concurrent waiters
into one reopen instead of refreshing per-commit).

Generations here are manifest generations: append_batch /
update_documents / delete_by_ids return (or advance) the manifest, whose
"generation" field is the analog of Lucene's writer generation — pass
manifest["generation"] to wait_for_generation. Refreshes run Spark jobs
(opening a pinned searcher over the new file set), so they happen outside
every lock; waiters only touch condition variables.
"""

from __future__ import annotations

import threading
import time


class ControlledRealTimeReopenThread(threading.Thread):
    """Background refresher for a SearcherManager.

    target_max_stale_sec: refresh cadence with no waiters — the most a
    searcher may lag the last commit when nobody is blocking on it.
    target_min_stale_sec: delay between a wait_for_generation call and
    the refresh that serves it — long enough to batch a burst of
    commits into one reopen, short enough to feel immediate.
    """

    def __init__(
        self,
        manager,
        target_max_stale_sec: float = 1.0,
        target_min_stale_sec: float = 0.05,
    ):
        if target_min_stale_sec > target_max_stale_sec:
            raise ValueError("target_min_stale_sec > target_max_stale_sec")
        super().__init__(name="lrs-reopen", daemon=True)
        self._manager = manager
        self._max_stale = float(target_max_stale_sec)
        self._min_stale = float(target_min_stale_sec)
        # one lock for scheduling state; refreshed_cond signals waiters
        # after every completed refresh
        self._cond = threading.Condition()
        self._waiting_gen = -1  # highest generation any waiter needs
        self._closed = False

    # -- caller surface ------------------------------------------------------

    def searching_generation(self) -> int:
        return self._manager.current_generation

    def wait_for_generation(self, target_gen: int, timeout: float | None = None) -> bool:
        """Block until the manager's current searcher covers target_gen
        (a manifest generation returned by an append/update commit).
        Returns False on timeout. Waking the reopen thread — not
        refreshing inline — is the point: concurrent waiters share one
        reopen, and the Spark jobs run on the reopen thread only."""
        deadline = None if timeout is None else time.monotonic() + timeout
        with self._cond:
            if self._manager.current_generation >= target_gen:
                return True
            if self._waiting_gen < target_gen:
                self._waiting_gen = target_gen
            self._cond.notify_all()  # schedule a min-stale refresh
            while self._manager.current_generation < target_gen:
                if self._closed:
                    raise RuntimeError("reopen thread is closed")
                remaining = None if deadline is None else deadline - time.monotonic()
                if remaining is not None and remaining <= 0:
                    return False
                self._cond.wait(timeout=remaining)
            return True

    def close(self) -> None:
        """Stop the thread (idempotent). Outstanding wait_for_generation
        calls are woken and raise rather than hanging forever."""
        with self._cond:
            if self._closed:
                return
            self._closed = True
            self._cond.notify_all()
        self.join(timeout=60)

    # -- thread loop ---------------------------------------------------------

    def run(self) -> None:  # pragma: no cover - exercised via the API tests
        last_refresh = time.monotonic()
        while True:
            with self._cond:
                if self._closed:
                    return
                has_waiter = (
                    self._waiting_gen > self._manager.current_generation
                )
                stale = self._min_stale if has_waiter else self._max_stale
                due = last_refresh + stale - time.monotonic()
                if due > 0:
                    # a new waiter notifies; re-evaluate stale target then
                    self._cond.wait(timeout=due)
                    continue
            # refresh OUTSIDE the lock: opens a pinned searcher (Spark
            # jobs); waiters keep blocking on the condition meanwhile
            try:
                self._manager.maybe_refresh_blocking()
            except Exception:
                # manager closed under us, or a transient open failure:
                # surface nothing here, waiters time out / close() ends us
                with self._cond:
                    if self._closed:
                        return
            last_refresh = time.monotonic()
            with self._cond:
                self._cond.notify_all()
