"""Analysis chain: StandardAnalyzer-equivalent tokenization.

Reference surface: clt/analysis/analyzer.rs:58-179 (Analyzer policy),
clt/analysis/token_stream.rs:43-86 (TokenStream contract),
clt/analysis/standard/standard_analyzer.rs:1 [stub],
clt/analysis/mod.rs:15 (LowerCaseFilter) — semantics pinned in FIXTURES.md §2:

1. tokenize on `\\w+` runs (ASCII + Unicode alphanumerics + underscore)
2. drop tokens longer than 255 chars (DEFAULT_MAX_TOKEN_LENGTH)
3. lowercase
4. no stop words (pinned config)
5. positions = token index (stored, unused by v1 scoring)

The same `tokenize()` is used by the oracle and, wrapped in a pandas UDF,
by the Spark engine — Arrow-batched, never row-at-a-time Python UDFs.
"""

from __future__ import annotations

import re

import pandas as pd

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer DEFAULT_MAX_TOKEN_LENGTH

_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def tokenize(text: str) -> list[str]:
    """Pinned analyzer: \\w+ runs, ≤255 chars, lowercased. Oracle + engine."""
    if not text:
        return []
    return [t.lower() for t in _TOKEN_RE.findall(text) if len(t) <= MAX_TOKEN_LENGTH]


def tokenize_series(s: pd.Series) -> pd.Series:
    """Vectorized batch form used inside pandas UDFs. Order pinned to match
    tokenize(): find \\w+ runs FIRST, then lowercase each token — lowering
    the whole string first changes token boundaries for chars whose
    lowercase form introduces combining marks (e.g. 'İ' → 'i̇', which \\w
    splits), breaking engine↔oracle identity on non-ASCII corpora."""
    toks = s.fillna("").str.findall(_TOKEN_RE)
    return toks.map(lambda ts: [t.lower() for t in ts if len(t) <= MAX_TOKEN_LENGTH])


def term_counts_series(s: pd.Series) -> pd.Series:
    """Batch: text -> list[(term, tf)] — the map-side partial aggregate
    (the TermsHash/FreqProxTermsWriter analog, clt/index/mod.rs:57-59).
    Emitting per-doc (term, tf) pairs instead of raw token occurrences
    keeps the explode + shuffle proportional to distinct terms per doc,
    not total token count."""
    from collections import Counter

    def _count(ts: list[str]) -> list[tuple[str, int]]:
        return sorted(Counter(ts).items())

    return tokenize_series(s).map(_count)
