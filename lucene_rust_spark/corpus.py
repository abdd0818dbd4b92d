"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Schema matches BASELINE.json input_hint:
  (repo:string, path:string, commit:string, lang:string, content:string)

Generation is a pure function of ``row_id`` (seed 42), so the corpus can be
generated either locally in pandas (tests, oracle) or distributed via
``spark.range(n).mapInPandas`` (bench scale) with byte-identical content.

Skew is intentional (north_rule requires explicit skew handling):
- repo 0 ("org0/repo0") holds ~30% of all files (Zipf a=1.3 tail for the rest)
- lang is categorical (.35/.2/.2/.15/.1), per-lang Zipf(a=1.1) token profiles
- ~1% of files are near-duplicates of the previous file
- every file embeds one globally unique token ``uniq_{row_id}``
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

SEED = 42
VOCAB_SIZE = 5000

LANGS = ["python", "rust", "java", "go", "markdown"]
LANG_PROBS = np.array([0.35, 0.20, 0.20, 0.15, 0.10])
LANG_EXT = {"python": "py", "rust": "rs", "java": "java", "go": "go", "markdown": "md"}

_PUNCT = ["(", ")", "{", "}", ";", ".", ",", "::", "->", "=", "==", "+", "[", "]"]
_PUNCT_ARR = np.array(_PUNCT, dtype=object)


def make_vocab() -> list[str]:
    """5000 deterministic code-like identifiers."""
    bases = [
        "get", "set", "add", "remove", "iter", "map", "hash", "list", "node", "tree",
        "index", "value", "key", "item", "buffer", "stream", "read", "write", "parse",
        "build", "make", "create", "init", "close", "open", "find", "search", "sort",
        "merge", "split", "join", "push", "pop", "next", "prev", "head", "tail", "root",
        "count", "size", "len", "cap", "max", "min", "sum", "avg", "tmp", "ptr", "ref",
        "ctx", "env", "cfg", "opt", "err", "res", "ret", "val", "var", "idx", "pos",
        "token", "term", "doc", "field", "query", "score", "rank", "block", "segment",
        "batch", "chunk", "page", "cache", "pool", "lock", "mutex", "chan", "async",
        "await", "spawn", "task", "job", "worker", "queue", "stack", "heap", "array",
        "vector", "string", "bytes", "int", "float", "bool", "char", "slice", "tuple",
        "struct", "class", "trait", "impl", "interface", "module", "pkg", "import",
    ]
    suffixes = [
        "", "s", "_mut", "_ref", "_ptr", "_at", "_by", "_or", "_all", "_one", "_for",
        "_impl", "_util", "_iter", "_map", "_fn", "_cb", "_ctx", "_buf", "_len", "_idx",
        "_new", "_old", "_tmp", "_err", "_ok", "_val", "_key", "_id", "_ty", "_arg",
        "_out", "_in", "_src", "_dst", "_lo", "_hi", "_min", "_max", "_cnt", "_tot",
        "_obj", "_cls", "_str", "_num", "_seq", "_set", "_lst", "_vec", "_arr",
    ]
    vocab: list[str] = []
    seen = set()
    for suf in suffixes:
        for b in bases:
            t = f"{b}{suf}"
            if t not in seen:
                seen.add(t)
                vocab.append(t)
            if len(vocab) == VOCAB_SIZE:
                return vocab
    i = 0
    while len(vocab) < VOCAB_SIZE:
        t = f"sym_{i:04d}"
        if t not in seen:
            seen.add(t)
            vocab.append(t)
        i += 1
    return vocab


VOCAB = make_vocab()
_VOCAB_ARR = np.array(VOCAB)

# per-lang Zipf(a=1.1) over a lang-specific permutation of the vocab
_rank_p = 1.0 / np.arange(1, VOCAB_SIZE + 1) ** 1.1
_rank_p /= _rank_p.sum()
_LANG_CDF = {}
_LANG_PERM = {}
for _li, _lang in enumerate(LANGS):
    _perm = np.random.default_rng([SEED, 777, _li]).permutation(VOCAB_SIZE)
    _LANG_PERM[_lang] = _perm
    _LANG_CDF[_lang] = np.cumsum(_rank_p)


def _n_repos(n_rows: int) -> int:
    return max(4, n_rows // 200)


def _repo_cdf(n_rows: int) -> np.ndarray:
    """repo 0 gets ~30%; the rest Zipf(a=1.3)."""
    r = _n_repos(n_rows)
    p = 1.0 / np.arange(1, r + 1) ** 1.3
    p[0] = 0.0
    p = p / p.sum() * 0.7
    p[0] = 0.3
    return np.cumsum(p)


def _gen_content(rng: np.random.Generator, lang: str) -> str:
    n_lines = int(rng.integers(20, 401))
    toks_per_line = rng.integers(3, 10, size=n_lines)
    total = int(toks_per_line.sum())
    # Zipf ranks → permuted vocab ids, vectorized via searchsorted
    ranks = np.searchsorted(_LANG_CDF[lang], rng.random(total), side="right")
    ids = _LANG_PERM[lang][np.minimum(ranks, VOCAB_SIZE - 1)]
    words = _VOCAB_ARR[ids].astype(object)
    # sprinkle punctuation (~20% of slots get a trailing mark) — vectorized
    punct_mask = rng.random(total) < 0.2
    punct = rng.integers(0, len(_PUNCT), size=total)
    words[punct_mask] = words[punct_mask] + _PUNCT_ARR[punct[punct_mask]]
    sep = np.full(total, " ", dtype=object)
    sep[np.cumsum(toks_per_line) - 1] = "\n"
    body = "".join((words + sep).tolist())
    lit = f'x = "{int(rng.integers(0, 10**6))}"; y = {int(rng.integers(0, 10**9))}'
    return body + lit


def _row_core(row_id: int, n_rows: int, repo_cdf: np.ndarray) -> tuple[str, str, str, str]:
    """Deterministic (repo, path, lang, ext) for a row."""
    rng = np.random.default_rng([SEED, row_id])
    repo_i = int(np.searchsorted(repo_cdf, rng.random(), side="right"))
    repo = f"org{repo_i // 50}/repo{repo_i}"
    lang = LANGS[int(np.searchsorted(np.cumsum(LANG_PROBS), rng.random(), side="right"))]
    d1, d2 = int(rng.integers(0, 16)), int(rng.integers(0, 16))
    path = f"src/{d1:x}/{d2:x}/file_{row_id}.{LANG_EXT[lang]}"
    return repo, path, lang, f"{d1:x}{d2:x}"


def gen_rows(row_ids: np.ndarray, n_rows: int) -> pd.DataFrame:
    """Generate corpus rows for the given row_ids (pure in row_id)."""
    repo_cdf = _repo_cdf(n_rows)
    out = {"row_id": [], "repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for rid in row_ids.tolist():
        rid = int(rid)
        repo, path, lang, _ = _row_core(rid, n_rows, repo_cdf)
        is_dup = rid % 100 == 99 and rid > 0
        if is_dup:
            # near-duplicate of the previous row's content (FIXTURES §1)
            base_repo, _, base_lang, _ = _row_core(rid - 1, n_rows, repo_cdf)
            rng = np.random.default_rng([SEED, rid - 1, 1])
            content = _gen_content(rng, base_lang)
            content = content.replace("\n", f"\nmutated_{rid} ", 1)
        else:
            rng = np.random.default_rng([SEED, rid, 1])
            content = _gen_content(rng, lang)
        content = content + f"\nuniq_{rid}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        out["row_id"].append(rid)
        out["repo"].append(repo)
        out["path"].append(path)
        out["commit"].append(commit)
        out["lang"].append(lang)
        out["content"].append(content)
    return pd.DataFrame(out)


def gen_corpus_pandas(n_rows: int) -> pd.DataFrame:
    return gen_rows(np.arange(n_rows), n_rows)


def gen_corpus_spark(spark, n_rows: int, n_partitions: int = 32):
    """Distributed generation: each task generates its row-id range."""
    schema = "row_id long, repo string, path string, commit string, lang string, content string"

    def _gen(it):
        for pdf in it:
            yield gen_rows(pdf["id"].to_numpy(), n_rows)

    return spark.range(0, n_rows, 1, n_partitions).mapInPandas(_gen, schema=schema)
