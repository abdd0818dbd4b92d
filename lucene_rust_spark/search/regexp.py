"""Lucene RegexpQuery grammar — clt/util/automaton/reg_exp.rs (the
reference's transliteration of org.apache.lucene.util.automaton.RegExp;
parser surface [stub], automaton ops clt/util/automaton/operations.rs:1-1042
— implemented here in search/automaton.py).

Lucene's regexp syntax is NOT Python's. Differences this module pins
(each covered by a divergence test in tests/test_regexp.py):

- **Anchored**: a pattern matches the ENTIRE term — there is no
  unanchored search. (Python ``re.search`` semantics never apply, and the
  Python idiom ``"^pat$"`` is wrong too: ``$`` also matches before a
  trailing newline.)
- ``.`` matches ANY character including newline (Python's ``.`` skips
  newline without DOTALL).
- ``^`` and ``$`` are LITERAL characters (they are only special to
  Python). ``[^...]`` negation inside a class is the one place ``^`` is
  an operator.
- ``@`` (ANYSTRING, enabled in Lucene's default ALL flag set) matches any
  string — Python has no such operator.
- ``"..."`` quotes a literal run (QUOTED flag, default-on).
- ``~`` (complement), ``&`` (intersection), ``#`` (empty language) and
  ``<m-n>`` (numeric interval, leading zeros allowed) are full automaton
  algebra: the parser emits an AST; patterns using only regex-expressible
  operators compile to a Python pattern (fullmatch, DOTALL), while
  ``~``/``&``/``#`` route through the char-range DFA in
  search/automaton.py (Thompson NFA -> subset construction -> product /
  complement), mirroring Lucene's operations.

Precedence (loosest to tightest), per the published grammar:
``|`` (union)  <  ``&`` (intersection)  <  concatenation  <
postfix repeats  <  ``~`` (complement)  <  atoms.
Membership testing stays a per-candidate function, so it plugs into the
distributed terms-dict intersection kernel unchanged
(search/rewrite.py match_candidates)."""

from __future__ import annotations

import re

from lucene_rust_spark.search.automaton import (
    MAX_CP,
    compile_ast,
    interval_ast,
)


class LuceneRegexpError(ValueError):
    pass


class _Parser:
    """Recursive descent over Lucene's RegExp grammar, emitting the
    tuple-AST consumed by search/automaton.py."""

    def __init__(self, pattern: str):
        self.s = pattern
        self.i = 0

    # -- cursor helpers ------------------------------------------------------

    def _peek(self) -> str | None:
        return self.s[self.i] if self.i < len(self.s) else None

    def _next(self) -> str:
        if self.i >= len(self.s):
            raise LuceneRegexpError(f"unexpected end of pattern: {self.s!r}")
        c = self.s[self.i]
        self.i += 1
        return c

    def _expect(self, c: str) -> None:
        got = self._next()
        if got != c:
            raise LuceneRegexpError(
                f"expected {c!r} at position {self.i - 1} in {self.s!r}, got {got!r}"
            )

    # -- grammar -------------------------------------------------------------

    def parse(self):
        out = self._union()
        if self.i != len(self.s):
            raise LuceneRegexpError(
                f"unexpected {self.s[self.i]!r} at position {self.i} in {self.s!r}"
            )
        return out

    def _union(self):
        parts = [self._inter()]
        while self._peek() == "|":
            self._next()
            parts.append(self._inter())
        return parts[0] if len(parts) == 1 else ("union", parts)

    def _inter(self):
        parts = [self._concat()]
        while self._peek() == "&":
            self._next()
            parts.append(self._concat())
        return parts[0] if len(parts) == 1 else ("inter", parts)

    def _concat(self):
        parts = []
        while self._peek() not in (None, "|", "&", ")"):
            parts.append(self._repeat())
        if not parts:
            return ("eps",)
        return parts[0] if len(parts) == 1 else ("concat", parts)

    def _repeat(self):
        atom = self._complexp()
        while True:
            c = self._peek()
            if c == "?":
                self._next()
                atom = ("opt", atom)
            elif c == "*":
                self._next()
                atom = ("star", atom)
            elif c == "+":
                self._next()
                atom = ("plus", atom)
            elif c == "{":
                save = self.i
                self._next()
                digits = ""
                while self._peek() is not None and self._peek().isdigit():
                    digits += self._next()
                if not digits:
                    raise LuceneRegexpError(
                        f"expected digit after '{{' at position {save} in {self.s!r}"
                    )
                lo = int(digits)
                hi: int | None = lo
                if self._peek() == ",":
                    self._next()
                    hs = ""
                    while self._peek() is not None and self._peek().isdigit():
                        hs += self._next()
                    hi = int(hs) if hs else None
                self._expect("}")
                if hi is not None and hi < lo:
                    raise LuceneRegexpError(
                        f"invalid repetition range {{{lo},{hi}}} in {self.s!r}"
                    )
                atom = ("rep", atom, lo, hi)
            else:
                return atom

    def _complexp(self):
        if self._peek() == "~":
            self._next()
            return ("not", self._complexp())
        return self._atom()

    def _atom(self):
        c = self._peek()
        if c is None:
            raise LuceneRegexpError(f"unexpected end of pattern: {self.s!r}")
        if c == "(":
            self._next()
            inner = self._union()
            self._expect(")")
            return inner
        if c == "[":
            return self._char_class()
        if c == ".":
            self._next()
            return ("any",)
        if c == "@":
            self._next()
            return ("star", ("any",))  # ANYSTRING (default-on flag)
        if c == "#":
            self._next()
            return ("empty",)  # the empty LANGUAGE
        if c == "<":
            return self._interval()
        if c == '"':
            self._next()
            chars = []
            while True:
                q = self._next()
                if q == '"':
                    break
                chars.append(("char", [(ord(q), ord(q))]))
            return ("concat", chars) if chars else ("eps",)
        if c == "\\":
            self._next()
            lit = self._next()
            return ("char", [(ord(lit), ord(lit))])
        if c in (")", "|", "&", "?", "*", "+", "{", "}", "]"):
            raise LuceneRegexpError(
                f"unexpected {c!r} at position {self.i} in {self.s!r}"
            )
        # any other char is a literal — including ^ and $ (Python-special,
        # Lucene-literal)
        self._next()
        return ("char", [(ord(c), ord(c))])

    def _interval(self):
        """``<m-n>`` numeric interval (Automata.makeDecimalInterval,
        digits=0: leading zeros allowed). Anything else inside <> —
        Lucene's named-automaton syntax — is unsupported and rejected."""
        save = self.i
        self._expect("<")
        body = ""
        while self._peek() not in (None, ">"):
            body += self._next()
        self._expect(">")
        m = re.fullmatch(r"(\d+)-(\d+)", body)
        if not m:
            raise LuceneRegexpError(
                f"unsupported <...> at position {save}: expected numeric "
                f"interval <m-n>, got {body!r} (named automata need a provider)"
            )
        return interval_ast(int(m.group(1)), int(m.group(2)))

    def _char_class(self):
        self._expect("[")
        negate = False
        if self._peek() == "^":
            self._next()
            negate = True
        ranges: list[tuple[int, int]] = []
        first = True
        while True:
            c = self._peek()
            if c is None:
                raise LuceneRegexpError(f"unterminated character class in {self.s!r}")
            if c == "]" and not first:
                break
            first = False
            c = self._next()
            if c == "\\":
                c = self._next()
            lo = c
            if self._peek() == "-" and self.i + 1 < len(self.s) and self.s[self.i + 1] != "]":
                self._next()  # the '-'
                hi = self._next()
                if hi == "\\":
                    hi = self._next()
                if ord(hi) < ord(lo):
                    raise LuceneRegexpError(
                        f"invalid class range {lo}-{hi} in {self.s!r}"
                    )
                ranges.append((ord(lo), ord(hi)))
            else:
                ranges.append((ord(lo), ord(lo)))
        self._expect("]")
        if negate:
            ranges = _complement_ranges(ranges)
            if not ranges:
                return ("empty",)
        return ("char", _merge_ranges(ranges))


def _merge_ranges(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    for lo, hi in sorted(ranges):
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return out


def _complement_ranges(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    out: list[tuple[int, int]] = []
    cur = 0
    for lo, hi in _merge_ranges(ranges):
        if lo > cur:
            out.append((cur, lo - 1))
        cur = max(cur, hi + 1)
    if cur <= MAX_CP:
        out.append((cur, MAX_CP))
    return out


# ---------------------------------------------------------------------------
# compilation: regex fast path / DFA algebra path
# ---------------------------------------------------------------------------


def _needs_dfa(ast) -> bool:
    kind = ast[0]
    if kind in ("not", "inter", "empty"):
        return True
    if kind in ("concat", "union"):
        return any(_needs_dfa(p) for p in ast[1])
    if kind in ("star", "plus", "opt"):
        return _needs_dfa(ast[1])
    if kind == "rep":
        return _needs_dfa(ast[1])
    return False


def _cls_escape(c: str) -> str:
    return "\\" + c if c in r"\^]-[" else c


def _ranges_to_py(ranges: list[tuple[int, int]]) -> str:
    if len(ranges) == 1 and ranges[0][0] == ranges[0][1]:
        return re.escape(chr(ranges[0][0]))
    items = []
    for lo, hi in ranges:
        if lo == hi:
            items.append(_cls_escape(chr(lo)))
        else:
            items.append(f"{_cls_escape(chr(lo))}-{_cls_escape(chr(hi))}")
    return "[" + "".join(items) + "]"


def _ast_to_py(ast) -> str:
    kind = ast[0]
    if kind == "char":
        return _ranges_to_py(ast[1])
    if kind == "any":
        return "."  # compiled with DOTALL
    if kind == "eps":
        return ""
    if kind == "concat":
        return "".join(_ast_to_py(p) for p in ast[1])
    if kind == "union":
        return "(?:" + "|".join(_ast_to_py(p) for p in ast[1]) + ")"
    if kind == "star":
        return f"(?:{_ast_to_py(ast[1])})*"
    if kind == "plus":
        return f"(?:{_ast_to_py(ast[1])})+"
    if kind == "opt":
        return f"(?:{_ast_to_py(ast[1])})?"
    if kind == "rep":
        _, inner, m, n = ast
        body = f"(?:{_ast_to_py(inner)})"
        if n is None:
            return f"{body}{{{m},}}"
        if n == m:
            return f"{body}{{{m}}}"
        return f"{body}{{{m},{n}}}"
    raise LuceneRegexpError(f"node {kind!r} has no regex form")


def parse_lucene_regexp(pattern: str):
    """Parse to the automaton AST (exposed for tests and planners)."""
    return _Parser(pattern).parse()


def compile_lucene_regexp(pattern: str):
    """Compile a Lucene-grammar regexp into a Python matcher with Lucene
    semantics: ``matcher(term) -> bool`` is True iff the automaton accepts
    the WHOLE term. Patterns without ``~``/``&``/``#`` compile to a
    Python pattern (DOTALL + fullmatch — anchoring pinned exactly);
    automaton-algebra patterns compile to a char-range DFA."""
    ast = _Parser(pattern).parse()
    if _needs_dfa(ast):
        return compile_ast(ast)
    compiled = re.compile(_ast_to_py(ast), re.DOTALL)
    return lambda term, _fm=compiled.fullmatch: _fm(term) is not None
