"""Lucene RegexpQuery grammar — clt/util/automaton/reg_exp.rs (the
reference's transliteration of org.apache.lucene.util.automaton.RegExp;
parser surface [stub], automaton ops clt/util/automaton/operations.rs:1-1042).

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
  ``<m-n>`` (numeric interval) require automaton algebra this engine does
  not implement — they are REJECTED with a clear error naming the
  operator, never silently treated as literals.

The parser is a recursive-descent over the published grammar
(unionexp / interexp / concatexp / repeatexp / charclassexp / simpleexp)
that emits an equivalent Python pattern, compiled with DOTALL and matched
with ``fullmatch``. Membership testing stays a per-candidate function, so
it plugs into the distributed terms-dict intersection kernel unchanged
(search/rewrite.py match_candidates)."""

from __future__ import annotations

import re

_UNSUPPORTED = {
    "~": "complement (~) requires automaton complement",
    "&": "intersection (&) requires automaton intersection",
    "#": "the empty-language operator (#) is not supported",
    "<": "numeric intervals (<m-n>) are not supported",
}


class LuceneRegexpError(ValueError):
    pass


class _Parser:
    """Recursive descent over Lucene's RegExp grammar, emitting a Python
    regex string with identical anchored semantics."""

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

    def parse(self) -> str:
        out = self._union()
        if self.i != len(self.s):
            raise LuceneRegexpError(
                f"unexpected {self.s[self.i]!r} at position {self.i} in {self.s!r}"
            )
        return out

    def _union(self) -> str:
        parts = [self._concat()]
        while self._peek() == "|":
            self._next()
            parts.append(self._concat())
        return "|".join(parts) if len(parts) > 1 else parts[0]

    def _concat(self) -> str:
        parts = []
        while self._peek() not in (None, "|", ")"):
            parts.append(self._repeat())
        return "".join(parts)  # empty concat = the empty string

    def _repeat(self) -> str:
        atom = self._atom()
        while True:
            c = self._peek()
            if c in ("?", "*", "+"):
                self._next()
                atom = f"(?:{atom}){c}"
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
                lo = digits
                hi = None
                if self._peek() == ",":
                    self._next()
                    hi = ""
                    while self._peek() is not None and self._peek().isdigit():
                        hi += self._next()
                self._expect("}")
                if hi is None:
                    atom = f"(?:{atom}){{{lo}}}"
                elif hi == "":
                    atom = f"(?:{atom}){{{lo},}}"
                else:
                    if int(hi) < int(lo):
                        raise LuceneRegexpError(
                            f"invalid repetition range {{{lo},{hi}}} in {self.s!r}"
                        )
                    atom = f"(?:{atom}){{{lo},{hi}}}"
            else:
                return atom

    def _atom(self) -> str:
        c = self._peek()
        if c is None:
            raise LuceneRegexpError(f"unexpected end of pattern: {self.s!r}")
        if c in _UNSUPPORTED:
            raise LuceneRegexpError(
                f"unsupported Lucene regexp operator at position {self.i}: "
                f"{_UNSUPPORTED[c]} (escape it as \\{c} to match the literal)"
            )
        if c == "(":
            self._next()
            inner = self._union()
            self._expect(")")
            return f"(?:{inner})"
        if c == "[":
            return self._char_class()
        if c == ".":
            self._next()
            return "."  # compiled with DOTALL: any char incl. newline
        if c == "@":
            self._next()
            return ".*"  # ANYSTRING (default-on flag)
        if c == '"':
            self._next()
            lit = ""
            while True:
                q = self._next()
                if q == '"':
                    break
                lit += q
            return re.escape(lit)
        if c == "\\":
            self._next()
            return re.escape(self._next())
        if c in (")", "|", "?", "*", "+", "{", "}", "]"):
            raise LuceneRegexpError(
                f"unexpected {c!r} at position {self.i} in {self.s!r}"
            )
        # any other char is a literal — including ^ and $ (Python-special,
        # Lucene-literal)
        self._next()
        return re.escape(c)

    def _char_class(self) -> str:
        self._expect("[")
        negate = False
        if self._peek() == "^":
            self._next()
            negate = True
        items = []
        while True:
            c = self._peek()
            if c is None:
                raise LuceneRegexpError(f"unterminated character class in {self.s!r}")
            if c == "]" and items:
                break
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
                items.append(f"{_cls_escape(lo)}-{_cls_escape(hi)}")
            else:
                items.append(_cls_escape(lo))
        self._expect("]")
        return ("[^" if negate else "[") + "".join(items) + "]"


def _cls_escape(c: str) -> str:
    return "\\" + c if c in r"\^]-[" else c


def compile_lucene_regexp(pattern: str):
    """Compile a Lucene-grammar regexp into a Python matcher with Lucene
    semantics: ``matcher(term) -> bool`` is True iff the automaton accepts
    the WHOLE term. DOTALL makes ``.`` match newline; fullmatch pins the
    anchoring exactly (no trailing-newline leniency)."""
    py = _Parser(pattern).parse()
    compiled = re.compile(py, re.DOTALL)
    return compiled.fullmatch
