"""Exact Lucene sloppy-phrase matching (clt/search/mod.rs:137
sloppy_phrase_matcher [stub]; Lucene 9 public semantics, the classic
SloppyPhraseScorer.phraseFreq priority-queue algorithm).

A phrase position of slot i at document position p has ADJUSTED position
a = p - i. The matcher slides a window over the per-slot adjusted position
streams: each locally-minimal configuration whose spread (max - min of the
current adjusted positions) is <= slop is a match contributing
sloppyWeight = 1 / (1 + spread) to the phrase freq. slop=0 degenerates to
exact adjacency with each occurrence contributing exactly 1.

This float freq is what Lucene feeds BM25 for sloppy phrases — distinct
from the engine's pinned displacement-window form (searcher._phrase_freq),
which stays the default; pass slop_mode="lucene" on the query to use this
matcher. Repeated terms across slots (Lucene's hasRpts machinery) are not
supported and raise.

The kernel is shared verbatim by the Spark engine (inside applyInPandas)
and the single-process oracle — the construction that makes float32
rank-identity well-defined for every other scorer here."""

from __future__ import annotations

import heapq

import numpy as np


def lucene_sloppy_freq(slot_positions: list[np.ndarray], slop: int) -> float:
    """Exact phraseFreq for one document. slot_positions[i] holds the
    SORTED adjusted positions (p - i) of slot i's term(s); empty slot =>
    no match. Returns sum of 1/(1+matchLength) over matches (float64 here;
    callers quantize to float32 at the scoring boundary)."""
    n = len(slot_positions)
    if n == 0 or any(len(a) == 0 for a in slot_positions):
        return 0.0
    if n == 1:
        # degenerate single-slot phrase: every position is a 0-length match
        return float(len(slot_positions[0]))
    ptr = [0] * n
    heap = [(int(a[0]), i) for i, a in enumerate(slot_positions)]
    heapq.heapify(heap)
    end = max(p for p, _ in heap)
    freq = 0.0
    pos, si = heapq.heappop(heap)
    match_length = end - pos
    next_ = heap[0][0]
    while True:
        # advancePP: move the minimal pp to its next position
        ptr[si] += 1
        if ptr[si] >= len(slot_positions[si]):
            break
        npos = int(slot_positions[si][ptr[si]])
        if npos > end:
            end = npos
        if npos > next_:
            # done minimizing the current match length: score it
            if match_length <= slop:
                freq += 1.0 / (1.0 + match_length)
            heapq.heappush(heap, (npos, si))
            pos, si = heapq.heappop(heap)
            next_ = heap[0][0]
            match_length = end - pos
        else:
            ml2 = end - npos
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq += 1.0 / (1.0 + match_length)
    return freq


def check_no_repeats(slots: list[list[str]]) -> None:
    """Lucene's repeat handling (hasRpts collision resolution) is out of
    scope for slop_mode='lucene' — a term in two slots raises."""
    seen: set = set()
    for s in slots:
        for t in s:
            if t in seen:
                raise NotImplementedError(
                    f"slop_mode='lucene' does not support repeated terms ({t!r})"
                )
            seen.add(t)


def sloppy_freqs_for_doc(
    terms: np.ndarray, positions: np.ndarray, slots: list[list[str]], slop: int
) -> float:
    """Convenience: build per-slot adjusted position arrays from one doc's
    flat (term, pos) rows and run the matcher. MultiPhrase slots union the
    positions of every term in the slot (UnionPostingsEnum analog)."""
    slot_arrs = []
    for i, s in enumerate(slots):
        mask = np.isin(terms, s)
        a = np.unique(positions[mask].astype(np.int64) - i)
        slot_arrs.append(a)
    return lucene_sloppy_freq(slot_arrs, slop)
