"""Property-based tests (hypothesis): codec roundtrips under adversarial
inputs, sloppy-matcher equivalence to brute force, and engine-vs-oracle
rank identity under RANDOMIZED boolean queries over the shared t1 index —
the 80 pinned goldens sample the query space; these walk it."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lucene_rust_spark.functions import kernels as K


@given(st.lists(st.integers(0, 2**50), max_size=300))
@settings(max_examples=200, deadline=None)
def test_for_and_pfor_roundtrip(vals):
    v = np.array(vals, dtype=np.uint64)
    assert (K.for_unpack(K.for_pack(v), len(v)) == v).all()
    assert (K.for_unpack(K.pfor_pack(v), len(v)) == v).all()


@given(st.lists(st.integers(0, 2**62), max_size=100), st.sampled_from([32, 64]))
@settings(max_examples=200, deadline=None)
def test_vint_roundtrip(vals, width):
    if width == 32:
        vals = [v & 0xFFFFFFFF for v in vals]
    v = np.array(vals, dtype=np.uint64)
    got = K.read_vint_array(K.write_vint_array(v.astype(np.int64), width), len(v))
    assert (got == v).all()


@given(st.lists(st.integers(-(2**62), 2**62), max_size=100))
@settings(max_examples=200, deadline=None)
def test_zigzag_roundtrip(vals):
    v = np.array(vals, dtype=np.int64)
    assert (K.zigzag_decode(K.zigzag_encode(v)) == v).all()


@given(st.lists(st.integers(0, 2**31 - 1), min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_smallfloat_monotone_and_bounded(vals):
    v = np.array(vals, dtype=np.int64)
    enc = K.int_to_byte4(v)
    dec = K.byte4_to_int(enc)
    # decode never exceeds the original and re-encoding is stable
    assert (dec <= v).all()
    assert (K.int_to_byte4(dec) == enc).all()
    # monotone: larger input -> encoded byte not smaller
    order = np.argsort(v)
    assert (np.diff(enc[order].astype(np.int64)) >= 0).all()


@given(
    st.lists(
        st.lists(st.integers(0, 15), min_size=1, max_size=5, unique=True),
        min_size=2,
        max_size=4,
    ),
    st.integers(0, 4),
)
@settings(max_examples=300, deadline=None)
def test_lucene_sloppy_existence_matches_bruteforce(slots, slop):
    import itertools

    from lucene_rust_spark.search.sloppy import lucene_sloppy_freq

    arrs = [np.array(sorted(s), dtype=np.int64) for s in slots]
    freq = lucene_sloppy_freq(arrs, slop)
    exists = any(
        max(c) - min(c) <= slop for c in itertools.product(*[a.tolist() for a in arrs])
    )
    assert (freq > 0) == exists


@pytest.mark.usefixtures("searcher", "oracle_idx")
@given(data=st.data())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_random_bool_rank_identity(searcher, oracle_idx, data):
    """Engine == oracle (docIDs and float32 scores) for random boolean
    queries over real + missing terms with random minimumShouldMatch."""
    from lucene_rust_spark.oracle.bm25 import bool_query, oracle_search

    terms = sorted(oracle_idx.postings)[:300] + ["zzz_missing_term"]
    pick = st.lists(st.sampled_from(terms), min_size=0, max_size=3)
    must = data.draw(pick)
    should = data.draw(pick)
    must_not = data.draw(pick)
    msm = data.draw(st.integers(0, 3))
    if not (must or should):
        return  # no scoring clauses: trivially empty on both sides
    q = bool_query(must=must, should=should, must_not=must_not, min_should_match=msm)
    got = searcher.search(q, 10)
    want = oracle_search(oracle_idx, q, 10)
    assert [d for d, _ in got] == [d for d, _ in want], q
    assert all(np.float32(a) == np.float32(b) for (_, a), (_, b) in zip(got, want)), q
