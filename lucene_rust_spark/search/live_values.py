"""LiveFieldValues — real-time get-by-key across the NRT refresh gap.

Reference: clt/search/live_field_values.rs [stub; Lucene 9 semantics].
The NRT completion piece: a searcher only sees docs up to its refresh
point, so "get this doc's field by primary key" silently misses anything
indexed since. LiveFieldValues bridges the gap with Lucene's exact
two-map protocol: the writer calls add(id, value) as it indexes;
before_refresh moves the current map aside (docs indexed BEFORE the
refresh started will be visible in the new searcher, but the refresh is
still in flight, so they must stay readable from RAM); after_refresh
drops the old map — those entries are now answered by the searcher.
get() therefore always returns the newest value with no wait-for-refresh
and no race, at the cost of RAM proportional to the un-refreshed window.

Register with SearcherManager.add_listener(); pass a lookup function
that resolves an id through a (pinned) searcher — typically a docmap
filter, which Spark answers with a pushed-down parquet scan.
"""

from __future__ import annotations

import threading

_DELETED = object()  # the missing-value marker for tracked deletes


class LiveFieldValues:
    def __init__(self, manager, lookup):
        """manager: SearcherManager (registers as its RefreshListener).
        lookup: fn(searcher, id) -> value | None — the searcher-side
        fallback for ids outside the un-refreshed window."""
        self._manager = manager
        self._lookup = lookup
        self._lock = threading.Lock()
        self._current: dict = {}
        self._old: dict = {}
        manager.add_listener(self)

    # -- writer side ----------------------------------------------------------

    def add(self, id, value) -> None:
        """Track a just-indexed doc's value (call at index time, before
        the commit publishes)."""
        with self._lock:
            self._current[id] = value

    def delete(self, id) -> None:
        """Track a just-applied delete: get(id) returns None even though
        an older searcher still matches the doc."""
        with self._lock:
            self._current[id] = _DELETED

    # -- RefreshListener protocol ----------------------------------------------

    def before_refresh(self) -> None:
        with self._lock:
            # values indexed from here on belong to the NEXT refresh
            # window; the in-flight refresh will make _old's docs
            # searchable, but not until after_refresh fires
            self._old = self._current
            self._current = {}

    def after_refresh(self, did_refresh: bool) -> None:
        with self._lock:
            # Lucene drops old unconditionally: even a no-op refresh
            # means the searcher already covered those generations
            self._old = {}

    # -- reader side -----------------------------------------------------------

    def get(self, id):
        """The newest value for id: the un-refreshed RAM window first
        (current, then old), else the current searcher via the manager's
        acquire/release discipline."""
        with self._lock:
            for m in (self._current, self._old):
                if id in m:
                    v = m[id]
                    return None if v is _DELETED else v
        s = self._manager.acquire()
        try:
            return self._lookup(s, id)
        finally:
            self._manager.release(s)

    def size(self) -> int:
        """Tracked ids still in the un-refreshed window."""
        with self._lock:
            return len(self._current) + len(self._old)

    def close(self) -> None:
        self._manager.remove_listener(self)
        with self._lock:
            self._current = {}
            self._old = {}
