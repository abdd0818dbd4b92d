"""Character-range automaton algebra for the Lucene regexp operators the
regex engine alone cannot express: ``~`` (complement), ``&``
(intersection) and ``#`` (empty language) — the analog of
clt/util/automaton/operations.rs:1-1042 (determinize / union / intersect
/ complement over code-point ranges), built from the textbook
constructions (Thompson NFA, subset construction over an interval
alphabet, product automaton, completion + accept-flip).

Everything operates on an AST of tuples produced by
``search.regexp._Parser``:

    ('char', [(lo, hi), ...])   code-point ranges, inclusive
    ('any',)                    any single character (incl. newline)
    ('eps',)                    the empty string
    ('empty',)                  the empty LANGUAGE (#)
    ('concat', [a, b, ...])
    ('union', [a, b, ...])
    ('inter', [a, b, ...])      &
    ('not', a)                  ~
    ('star', a) ('plus', a) ('opt', a)
    ('rep', a, m, n | None)     {m}, {m,}, {m,n}

``compile_ast`` returns a ``match(term) -> bool`` callable that walks the
DFA; terms are short, so the per-character range binary search is cheap.
"""

from __future__ import annotations

from bisect import bisect_right

MAX_CP = 0x10FFFF

# guard against pathological blowup (subset construction is worst-case
# exponential; real Lucene patterns determinize small)
MAX_DFA_STATES = 100_000


class AutomatonTooComplex(ValueError):
    pass


# ---------------------------------------------------------------------------
# Thompson NFA
# ---------------------------------------------------------------------------


class _Nfa:
    """States 0..n-1; eps[s] = set of states; trans[s] = list of
    (lo, hi, dst) inclusive code-point ranges."""

    def __init__(self):
        self.eps: list[set[int]] = []
        self.trans: list[list[tuple[int, int, int]]] = []

    def new_state(self) -> int:
        self.eps.append(set())
        self.trans.append([])
        return len(self.eps) - 1


def _build(nfa: _Nfa, ast) -> tuple[int, int]:
    """Thompson construction; returns (start, accept) state pair."""
    kind = ast[0]
    if kind == "char":
        s, a = nfa.new_state(), nfa.new_state()
        for lo, hi in ast[1]:
            nfa.trans[s].append((lo, hi, a))
        return s, a
    if kind == "any":
        s, a = nfa.new_state(), nfa.new_state()
        nfa.trans[s].append((0, MAX_CP, a))
        return s, a
    if kind == "eps":
        s = nfa.new_state()
        return s, s
    if kind == "empty":
        # no path from start to accept
        s, a = nfa.new_state(), nfa.new_state()
        return s, a
    if kind == "concat":
        parts = ast[1]
        if not parts:
            s = nfa.new_state()
            return s, s
        s, a = _build(nfa, parts[0])
        for p in parts[1:]:
            s2, a2 = _build(nfa, p)
            nfa.eps[a].add(s2)
            a = a2
        return s, a
    if kind == "union":
        s, a = nfa.new_state(), nfa.new_state()
        for p in ast[1]:
            ps, pa = _build(nfa, p)
            nfa.eps[s].add(ps)
            nfa.eps[pa].add(a)
        return s, a
    if kind == "star":
        s, a = nfa.new_state(), nfa.new_state()
        ps, pa = _build(nfa, ast[1])
        nfa.eps[s].update((ps, a))
        nfa.eps[pa].update((ps, a))
        return s, a
    if kind == "plus":
        return _build(nfa, ("concat", [ast[1], ("star", ast[1])]))
    if kind == "opt":
        return _build(nfa, ("union", [ast[1], ("eps",)]))
    if kind == "rep":
        _, inner, m, n = ast
        parts = [inner] * m
        if n is None:
            parts.append(("star", inner))
        else:
            parts.extend([("opt", inner)] * (n - m))
        return _build(nfa, ("concat", parts))
    if kind in ("inter", "not"):
        # boolean ops happen at the DFA level: compile the subtree to a
        # DFA and re-import it as an NFA fragment
        dfa = ast_to_dfa(ast)
        return _import_dfa(nfa, dfa)
    raise ValueError(f"unknown AST node {kind!r}")


def _import_dfa(nfa: _Nfa, dfa: "Dfa") -> tuple[int, int]:
    base = len(nfa.eps)
    for _ in range(dfa.n):
        nfa.new_state()
    accept = nfa.new_state()
    for s in range(dfa.n):
        for lo, hi, dst in dfa.trans[s]:
            nfa.trans[base + s].append((lo, hi, base + dst))
        if s in dfa.accepts:
            nfa.eps[base + s].add(accept)
    return base + dfa.start, accept


# ---------------------------------------------------------------------------
# DFA (subset construction over an interval alphabet)
# ---------------------------------------------------------------------------


class Dfa:
    """Deterministic, possibly partial: trans[s] is a sorted disjoint
    range list; a missing range means reject."""

    def __init__(self, n, start, accepts, trans):
        self.n = n
        self.start = start
        self.accepts = accepts
        self.trans = trans  # list[list[(lo, hi, dst)]], sorted by lo
        self._starts = [[t[0] for t in row] for row in trans]

    def step(self, state: int, cp: int) -> int:
        row = self.trans[state]
        j = bisect_right(self._starts[state], cp) - 1
        if j >= 0:
            lo, hi, dst = row[j]
            if lo <= cp <= hi:
                return dst
        return -1

    def matches(self, term: str) -> bool:
        s = self.start
        for ch in term:
            s = self.step(s, ord(ch))
            if s < 0:
                return False
        return s in self.accepts


def _eps_closure(nfa: _Nfa, states: frozenset[int]) -> frozenset[int]:
    out = set(states)
    stack = list(states)
    while stack:
        s = stack.pop()
        for t in nfa.eps[s]:
            if t not in out:
                out.add(t)
                stack.append(t)
    return frozenset(out)


def determinize(nfa: _Nfa, start: int, accept: int) -> Dfa:
    init = _eps_closure(nfa, frozenset((start,)))
    ids: dict[frozenset, int] = {init: 0}
    order = [init]
    trans: list[list[tuple[int, int, int]]] = []
    accepts: set[int] = set()
    i = 0
    while i < len(order):
        cur = order[i]
        if accept in cur:
            accepts.add(i)
        # partition the alphabet by every outgoing range boundary
        edges: list[tuple[int, int, int]] = []
        for s in cur:
            edges.extend(nfa.trans[s])
        points: set[int] = set()
        for lo, hi, _ in edges:
            points.add(lo)
            points.add(hi + 1)
        row: list[tuple[int, int, int]] = []
        bounds = sorted(points)
        for j in range(len(bounds) - 1):
            # the alphabet slice [lo, nxt] is uniform (no boundary inside),
            # so membership evaluated at lo holds for the whole slice
            lo, nxt = bounds[j], bounds[j + 1] - 1
            tgt = frozenset(d for (elo, ehi, d) in edges if elo <= lo <= ehi)
            if not tgt:
                continue
            tgt = _eps_closure(nfa, tgt)
            if tgt not in ids:
                ids[tgt] = len(order)
                order.append(tgt)
                if len(order) > MAX_DFA_STATES:
                    raise AutomatonTooComplex(
                        f"regexp determinizes past {MAX_DFA_STATES} states"
                    )
            row.append((lo, nxt, ids[tgt]))
        # merge adjacent ranges with the same destination
        merged: list[tuple[int, int, int]] = []
        for lo, hi, d in sorted(row):
            if merged and merged[-1][2] == d and merged[-1][1] + 1 == lo:
                merged[-1] = (merged[-1][0], hi, d)
            else:
                merged.append((lo, hi, d))
        trans.append([tuple(t) for t in merged])
        i += 1
    return Dfa(len(order), 0, accepts, trans)


def complement(dfa: Dfa) -> Dfa:
    """Complete with a sink state, then flip accepting."""
    n = dfa.n
    sink = n
    trans = []
    for s in range(n):
        row = list(dfa.trans[s])
        filled = []
        cur = 0
        for lo, hi, d in row:
            if lo > cur:
                filled.append((cur, lo - 1, sink))
            filled.append((lo, hi, d))
            cur = hi + 1
        if cur <= MAX_CP:
            filled.append((cur, MAX_CP, sink))
        trans.append(filled)
    trans.append([(0, MAX_CP, sink)])
    accepts = {s for s in range(n + 1) if s not in dfa.accepts}
    return Dfa(n + 1, dfa.start, accepts, trans)


def intersect(a: Dfa, b: Dfa) -> Dfa:
    """Product construction (reachable part only)."""
    ids: dict[tuple[int, int], int] = {(a.start, b.start): 0}
    order = [(a.start, b.start)]
    trans: list[list[tuple[int, int, int]]] = []
    accepts: set[int] = set()
    i = 0
    while i < len(order):
        sa, sb = order[i]
        if sa in a.accepts and sb in b.accepts:
            accepts.add(i)
        row: list[tuple[int, int, int]] = []
        for alo, ahi, ad in a.trans[sa]:
            for blo, bhi, bd in b.trans[sb]:
                lo, hi = max(alo, blo), min(ahi, bhi)
                if lo > hi:
                    continue
                key = (ad, bd)
                if key not in ids:
                    ids[key] = len(order)
                    order.append(key)
                    if len(order) > MAX_DFA_STATES:
                        raise AutomatonTooComplex(
                            f"regexp product exceeds {MAX_DFA_STATES} states"
                        )
                row.append((lo, hi, ids[key]))
        trans.append(sorted(row))
        i += 1
    return Dfa(len(order), 0, accepts, trans)


def ast_to_dfa(ast) -> Dfa:
    kind = ast[0]
    if kind == "not":
        return complement(ast_to_dfa(ast[1]))
    if kind == "inter":
        parts = ast[1]
        dfa = ast_to_dfa(parts[0])
        for p in parts[1:]:
            dfa = intersect(dfa, ast_to_dfa(p))
        return dfa
    nfa = _Nfa()
    start, accept = _build(nfa, ast)
    return determinize(nfa, start, accept)


def compile_ast(ast):
    """AST -> ``match(term) -> bool`` via the DFA."""
    dfa = ast_to_dfa(ast)
    return dfa.matches


# ---------------------------------------------------------------------------
# numeric intervals  <m-n>
# ---------------------------------------------------------------------------


def interval_ast(lo: int, hi: int):
    """AST for Lucene's ``<m-n>``: decimal integers in [lo, hi], leading
    zeros allowed (Automata.makeDecimalInterval with digits=0)."""
    if hi < lo:
        lo, hi = hi, lo
    parts = []
    d_lo, d_hi = len(str(lo)), len(str(hi))
    for d in range(d_lo, d_hi + 1):
        lo_d = max(lo, 0 if d == 1 else 10 ** (d - 1))
        hi_d = min(hi, 10**d - 1)
        if lo_d > hi_d:
            continue
        parts.append(_fixed_range(str(lo_d).zfill(d), str(hi_d).zfill(d)))
    body = parts[0] if len(parts) == 1 else ("union", parts)
    # optional leading zeros
    return ("concat", [("star", ("char", [(ord("0"), ord("0"))])), body])


def _digit(lo: str, hi: str):
    return ("char", [(ord(lo), ord(hi))])


def _fixed_range(lo: str, hi: str):
    """AST matching d-digit strings numerically in [lo, hi] (equal
    lengths, may carry leading zeros from zfill)."""
    if len(lo) == 1:
        return _digit(lo, hi)
    if lo[0] == hi[0]:
        return ("concat", [_digit(lo[0], lo[0]), _fixed_range(lo[1:], hi[1:])])
    parts = [("concat", [_digit(lo[0], lo[0]), _fixed_range(lo[1:], "9" * (len(lo) - 1))])]
    if ord(hi[0]) - ord(lo[0]) >= 2:
        mid_any = ("concat", [_digit("0", "9")] * (len(lo) - 1))
        parts.append(
            ("concat", [_digit(chr(ord(lo[0]) + 1), chr(ord(hi[0]) - 1)), mid_any])
        )
    parts.append(
        ("concat", [_digit(hi[0], hi[0]), _fixed_range("0" * (len(hi) - 1), hi[1:])])
    )
    return ("union", parts)
