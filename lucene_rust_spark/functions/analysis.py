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

# Lucene EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (public constant) — wired
# but OFF by default (FIXTURES.md pins the no-stopword analyzer; StopFilter
# surface: clt/analysis/mod.rs:17, CharArraySet :8)
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


def _filter_tokens(raw: list[str], stop_words) -> list[str]:
    out = []
    for t in raw:
        if len(t) > MAX_TOKEN_LENGTH:
            continue
        lt = t.lower()
        if stop_words and lt in stop_words:
            continue
        out.append(lt)
    return out


def tokenize(text: str, stop_words=None, char_filters=None) -> list[str]:
    """Pinned analyzer: optional CharFilter chain (regex mappings,
    clt/analysis/mod.rs:9) → \\w+ runs, ≤255 chars, lowercase → optional
    StopFilter. Deviation from Lucene's StopFilter pinned in FIXTURES.md:
    positions are post-filter indices (no position-increment gaps) — the
    oracle and engine share this function, so identity holds. Oracle +
    engine."""
    if not text:
        return []
    if char_filters:
        for pat, repl in char_filters:
            text = re.sub(pat, repl, text)
    return _filter_tokens(_TOKEN_RE.findall(text), stop_words)


def tokenize_series(s: pd.Series, stop_words=None, char_filters=None) -> pd.Series:
    """Vectorized batch form used inside pandas UDFs. Order pinned to match
    tokenize(): find \\w+ runs FIRST, then lowercase each token — lowering
    the whole string first changes token boundaries for chars whose
    lowercase form introduces combining marks (e.g. 'İ' → 'i̇', which \\w
    splits), breaking engine↔oracle identity on non-ASCII corpora."""
    s = s.fillna("")
    if char_filters:
        for pat, repl in char_filters:
            s = s.str.replace(pat, repl, regex=True)
    toks = s.str.findall(_TOKEN_RE)
    return toks.map(lambda ts: _filter_tokens(ts, stop_words))


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
