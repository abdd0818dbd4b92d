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


def _build_uax29_re():
    """UAX#29 word-break tokenizer (clt/analysis/standard/
    standard_tokenizer.rs:1 [stub]; the Lucene StandardTokenizerImpl JFlex
    grammar re-expressed over the `regex` module's Word_Break property
    classes). Each base class absorbs trailing Extend/Format/ZWJ (WB4);
    letters join across MidLetter/MidNumLet/Single_Quote (WB6-7), numerics
    across MidNum/MidNumLet/Single_Quote (WB11-12), letter<->number
    directly (WB9-10), Katakana runs (WB13), and ExtendNumLet (incl. '_')
    glues segments (WB13a-b). CJK ideographs and Hiragana emit one token
    per char (Lucene's IDEOGRAPHIC/HIRAGANA rule)."""
    import regex

    fe = "[\\p{Word_Break=Extend}\\p{Word_Break=Format}\\u200D]*"
    al = r"[\p{Word_Break=ALetter}\p{Word_Break=Hebrew_Letter}]" + fe
    nu = r"\p{Word_Break=Numeric}" + fe
    ex = r"\p{Word_Break=ExtendNumLet}" + fe
    ka = r"\p{Word_Break=Katakana}" + fe
    ml = r"[\p{Word_Break=MidLetter}\p{Word_Break=MidNumLet}\p{Word_Break=Single_Quote}]" + fe
    mn = r"[\p{Word_Break=MidNum}\p{Word_Break=MidNumLet}\p{Word_Break=Single_Quote}]" + fe
    letter_seq = f"(?:{al})+(?:(?:{ml})(?:{al})+)*"
    num_seq = f"(?:{nu})+(?:(?:{mn})(?:{nu})+)*"
    seg = f"(?:{letter_seq}|{num_seq}|(?:{ka})+)"
    word = f"(?:{ex})*{seg}(?:(?:{ex})*{seg})*(?:{ex})*"
    ideo = r"[\p{Ideographic}\p{Script=Hiragana}]" + fe
    return regex.compile(f"{word}|{ideo}")


_UAX29_RE = None  # built lazily: the regex module compile is not free


def _token_pattern(word_break: str):
    global _UAX29_RE
    if word_break == "uax29":
        if _UAX29_RE is None:
            _UAX29_RE = _build_uax29_re()
        return _UAX29_RE
    if word_break in (None, "simple"):
        return _TOKEN_RE
    raise ValueError(f"unknown word_break: {word_break!r} (simple | uax29)")

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


def tokenize(text: str, stop_words=None, char_filters=None, word_break="simple") -> list[str]:
    """Pinned analyzer: optional CharFilter chain (regex mappings,
    clt/analysis/mod.rs:9) → token runs (word_break='simple' = \\w+, the
    pinned default; 'uax29' = the UAX#29 word-break grammar), ≤255 chars,
    lowercase → optional StopFilter. Deviation from Lucene's StopFilter
    pinned in FIXTURES.md: positions are post-filter indices (no
    position-increment gaps) — the oracle and engine share this function,
    so identity holds. Oracle + engine."""
    if not text:
        return []
    if char_filters:
        for pat, repl in char_filters:
            text = re.sub(pat, repl, text)
    return _filter_tokens(_token_pattern(word_break).findall(text), stop_words)


def tokenize_series(s: pd.Series, stop_words=None, char_filters=None, word_break="simple") -> pd.Series:
    """Vectorized batch form used inside pandas UDFs. Order pinned to match
    tokenize(): find token runs FIRST, then lowercase each token — lowering
    the whole string first changes token boundaries for chars whose
    lowercase form introduces combining marks (e.g. 'İ' → 'i̇', which \\w
    splits), breaking engine↔oracle identity on non-ASCII corpora."""
    s = s.fillna("")
    if char_filters:
        for pat, repl in char_filters:
            s = s.str.replace(pat, repl, regex=True)
    pat = _token_pattern(word_break)
    toks = s.map(pat.findall)
    return toks.map(lambda ts: _filter_tokens(ts, stop_words))


def tokenize_spans(text: str, stop_words=None, char_filters=None, word_break="simple"):
    """[(token_lower, start, end)] — same token stream as tokenize() plus
    char offsets (postings_enum.rs:63-67 Offsets flag). Offsets index into
    the CHAR-FILTERED text (no offset correction across CharFilters —
    pinned deviation from Lucene's correctOffset)."""
    if not text:
        return []
    if char_filters:
        for pat, repl in char_filters:
            text = re.sub(pat, repl, text)
    out = []
    for m in _token_pattern(word_break).finditer(text):
        t = m.group()
        if len(t) > MAX_TOKEN_LENGTH:
            continue
        lt = t.lower()
        if stop_words and lt in stop_words:
            continue
        out.append((lt, m.start(), m.end()))
    return out


def tokenize_spans_series(s: pd.Series, stop_words=None, char_filters=None, word_break="simple") -> pd.Series:
    """Batch form of tokenize_spans: Series of [(token, start, end)]."""
    return s.fillna("").map(
        lambda x: tokenize_spans(
            x, stop_words=stop_words, char_filters=char_filters, word_break=word_break
        )
    )


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


def default_payload_fn(tokens, positions):
    """Default per-occurrence payload byte (PayloadAttribute analog,
    clt/analysis/token_stream.rs token attributes): token-type classifier
    0 = alphabetic word, 1 = all-digit number, 2 = mixed/other — the
    StandardTokenizer token-type lattice reduced to a byte. Vectorized:
    (tokens object[], positions int64[]) -> uint8[]. Custom build-time
    payload functions use the same signature."""
    import numpy as np

    out = np.full(len(tokens), 2, dtype=np.uint8)
    for i, t in enumerate(tokens):
        if t.isdigit():
            out[i] = 1
        elif t.isalpha():
            out[i] = 0
    return out


# -- payload-fn registry (r4, VERDICT item 8) --------------------------------
# A manifest cannot serialize a callable, so streaming appends could only
# replay a payload build if the fn is NAMED: builds record the registry
# name, appends resolve it back. Unregistered callables are recorded as
# 'custom' and appends REFUSE them (a silent downgrade to the default fn
# would change payload semantics mid-index).

PAYLOAD_REGISTRY: dict = {"token_type": default_payload_fn}


def register_payload_fn(name: str, fn) -> None:
    """Register a vectorized (tokens, positions) -> uint8[] payload fn
    under a stable name so appends can resolve it across processes."""
    PAYLOAD_REGISTRY[name] = fn


def resolve_payload_fn(spec):
    """(fn_or_None, name_or_None) from a build/append payload spec:
    None/False -> off; True -> the default token-type fn; a registered
    name -> that fn; a callable -> itself (named if registered, else
    'custom')."""
    if not spec:
        return None, None
    if spec is True:
        return default_payload_fn, "token_type"
    if isinstance(spec, str):
        if spec not in PAYLOAD_REGISTRY:
            raise ValueError(
                f"unknown payload fn {spec!r} — register_payload_fn() it first "
                f"(registered: {sorted(PAYLOAD_REGISTRY)})"
            )
        return PAYLOAD_REGISTRY[spec], spec
    for n, f in PAYLOAD_REGISTRY.items():
        if f is spec:
            return spec, n
    return spec, "custom"
