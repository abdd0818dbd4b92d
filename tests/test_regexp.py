"""Lucene regexp grammar: semantics pinned against Lucene's published
RegExp behavior (clt/util/automaton/reg_exp.rs surface), including the
cases where Python-regex semantics DIVERGE — the silent-porting traps
VERDICT r3 item 4 names."""

import pytest

from lucene_rust_spark.search.regexp import (
    LuceneRegexpError,
    compile_lucene_regexp,
)


def m(pattern, s):
    return bool(compile_lucene_regexp(pattern)(s))


def test_literals_and_basic_ops():
    assert m("abc", "abc")
    assert not m("abc", "abcd")  # anchored both ends
    assert not m("abc", "xabc")
    assert m("a|b", "a") and m("a|b", "b") and not m("a|b", "ab")
    assert m("ab*", "a") and m("ab*", "abbb")
    assert m("ab+", "abb") and not m("ab+", "a")
    assert m("ab?", "a") and m("ab?", "ab") and not m("ab?", "abb")
    assert m("(ab)+", "abab") and not m("(ab)+", "aba")


def test_char_classes():
    assert m("va[ln].*", "value") and m("va[ln].*", "vanish")
    assert not m("va[ln].*", "vapid")
    assert m("[0-9]+", "123") and not m("[0-9]+", "12a")
    assert m("[^0-9]+", "abc") and not m("[^0-9]+", "a1")
    assert m("[a\\-c]", "-") and m("[a\\-c]", "a") and not m("[a\\-c]", "b")


def test_bounded_repeats():
    assert m("a{2}", "aa") and not m("a{2}", "a") and not m("a{2}", "aaa")
    assert m("a{2,}", "aaaa") and not m("a{2,}", "a")
    assert m("a{1,3}", "aa") and not m("a{1,3}", "aaaa")
    assert m("(ab){2,3}", "ababab")
    with pytest.raises(LuceneRegexpError):
        m("a{3,1}", "aa")
    with pytest.raises(LuceneRegexpError):
        m("a{", "a{")  # malformed repeat is an error, not a literal


def test_anchoring_divergence_from_python():
    # Python re.match is only left-anchored; Lucene is both-ends
    assert not m("ab", "abc")
    # Python "$" tolerates a trailing newline; Lucene does not
    assert not m("abc", "abc\n")
    # unanchored-substring intuition must not hold
    assert not m("b", "abc")


def test_dot_matches_newline_divergence():
    # Lucene '.' = any char; Python '.' skips \n without DOTALL
    assert m("a.c", "a\nc")
    assert m(".*", "a\nb")


def test_caret_dollar_are_literals():
    # '^' and '$' are ordinary characters in Lucene's grammar
    assert m("a^b", "a^b") and not m("a^b", "ab")
    assert m("a$", "a$") and not m("a$", "a")
    assert m("\\^", "^")


def test_anystring_and_quoted():
    assert m("a@c", "abbbc") and m("a@c", "ac")
    assert m('"a.c"', "a.c") and not m('"a.c"', "abc")  # quoted = literal
    assert m('ab"*"', "ab*")


def test_escapes():
    assert m("a\\.c", "a.c") and not m("a\\.c", "abc")
    assert m("\\~x", "~x")
    assert m("\\&", "&")
    assert m("\\\\", "\\")


def test_unsupported_operators_rejected_clearly():
    for pat, op in [("~abc", "~"), ("a&b", "&"), ("#", "#"), ("<1-5>", "<")]:
        with pytest.raises(LuceneRegexpError) as e:
            m(pat, "x")
        assert op in str(e.value) or "interval" in str(e.value)


def test_empty_and_group_edge_cases():
    assert m("", "") and not m("", "a")
    assert m("()", "") and not m("()", "a")
    assert m("(|a)b", "b") and m("(|a)b", "ab")


def test_engine_integration_uses_lucene_grammar():
    # match_candidates routes regexp through the Lucene parser by default
    from lucene_rust_spark.search.rewrite import match_candidates

    got = match_candidates(
        {"type": "regexp", "pattern": "va[ln].*"}, ["value", "vanish", "vapid"]
    )
    assert got == ["value", "vanish"]
    # Lucene semantics: '.' crosses newline, pattern is fully anchored
    got = match_candidates(
        {"type": "regexp", "pattern": "a.c"}, ["a\nc", "abc", "abcd"]
    )
    assert got == ["a\nc", "abc"]
    # python syntax stays available as an explicit opt-out
    got = match_candidates(
        {"type": "regexp", "pattern": "a.c", "syntax": "python"},
        ["a\nc", "abc"],
    )
    assert got == ["abc"]


def test_property_parser_robustness():
    """Property: any pattern either compiles or raises LuceneRegexpError —
    never a raw re.error or crash — and compiled matchers accept exactly
    what a self-round-trip predicts for operator-free literals."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    alphabet = "ab01_.*+?|()[]{}^$\\~&#<>\"@-"

    @settings(max_examples=300, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=12))
    def run(pat):
        try:
            m = compile_lucene_regexp(pat)
        except LuceneRegexpError:
            return
        m("abc")  # matching never crashes either

    run()


def test_property_escaped_literals_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(min_size=0, max_size=10))
    def run(s):
        pat = "".join("\\" + c for c in s)
        matcher = compile_lucene_regexp(pat)
        assert matcher(s)
        assert not matcher(s + "x")

    run()
