"""Block-max WAND pruning (clt/search/mod.rs:167 w_a_n_d_scorer,
:6 block_max_maxscore_scorer, impacts clt/index/mod.rs:61 — all [stub];
Lucene 9 public semantics). Implemented as a correctness-neutral two-pass
DataFrame plan over the per-block zone map — see SURVEY.md §4.

v1 placeholder: implemented in a later milestone this round; search with
prune=False is the exact path.
"""

from __future__ import annotations


def wand_candidates(searcher, scoring, stats, k, search_after):
    raise NotImplementedError("block-max WAND lands after the exact path is green")
