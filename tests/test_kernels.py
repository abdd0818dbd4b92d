"""Golden-byte kernel tests, mirroring the reference's unit-test style
(core/src/io/encoding.rs:312-375) including its exact VByte vectors."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_rust_spark.functions import kernels as K
from lucene_rust_spark.functions.analysis import tokenize, tokenize_series

# --- VByte: reference golden vectors (core/src/io/encoding.rs:328-367) ---


def test_vint_reference_goldens():
    for i in range(127):
        assert K.write_vint(i) == bytes([i])
    assert K.write_vint(128) == bytes([0b1000_0000, 0b0000_0001])
    assert K.write_vint(129) == bytes([0b1000_0001, 0b0000_0001])
    assert K.write_vint(16383) == bytes([0b1111_1111, 0b0111_1111])
    assert K.write_vint(16384) == bytes([0b1000_0000, 0b1000_0000, 0b0000_0001])
    assert K.write_vint(16385) == bytes([0b1000_0001, 0b1000_0000, 0b0000_0001])
    assert K.write_vint(2_147_483_647) == bytes([0xFF, 0xFF, 0xFF, 0xFF, 0b0000_0111])
    assert K.write_vint(-2_147_483_648) == bytes([0x80, 0x80, 0x80, 0x80, 0b0000_1000])
    assert K.write_vint(-1) == bytes([0xFF, 0xFF, 0xFF, 0xFF, 0b0000_1111])


def test_vint_roundtrip_scalar():
    for v in [0, 1, 127, 128, 16383, 16384, 2**31 - 1, -1, -(2**31)]:
        assert K.read_vint(K.write_vint(v)) == v


@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), max_size=300))
@settings(max_examples=50, deadline=None)
def test_vint_array_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    buf = K.write_vint_array(arr, 32)
    out = K.read_vint_array(buf, len(vals))
    assert out.tolist() == [v & 0xFFFFFFFF for v in vals]


def test_vint64_roundtrip():
    vals = np.array([0, 1, 2**40, 2**63 - 1], dtype=np.uint64)
    buf = K.write_vint_array(vals, 64)
    assert K.read_vint_array(buf, 4).tolist() == vals.tolist()


# --- ZigZag ---


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=100))
@settings(max_examples=30, deadline=None)
def test_zigzag_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert K.zigzag_decode(K.zigzag_encode(arr)).tolist() == vals


def test_zigzag_goldens():
    assert K.zigzag_encode(np.array([0, -1, 1, -2, 2])).tolist() == [0, 1, 2, 3, 4]


# --- FOR pack (FIXTURES.md §5: all-equal, max-delta, ramp) ---


def test_for_pack_goldens():
    assert K.for_pack(np.zeros(128, dtype=np.uint64)) == bytes([0])  # bw 0
    ramp = np.arange(1, 129, dtype=np.uint64)
    buf = K.for_pack(ramp)
    assert buf[0] == 8  # max=128 → 8 bits
    assert len(buf) == 1 + 128
    assert K.for_unpack(buf, 128).tolist() == ramp.tolist()
    big = np.array([0, 2**31 - 1], dtype=np.uint64)
    assert K.for_unpack(K.for_pack(big), 2).tolist() == big.tolist()


@given(st.lists(st.integers(min_value=0, max_value=2**32 - 1), min_size=1, max_size=128))
@settings(max_examples=50, deadline=None)
def test_for_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert K.for_unpack(K.for_pack(arr), len(vals)).tolist() == vals


def test_delta_roundtrip():
    docs = np.array([3, 7, 8, 100, 10_000_000_000], dtype=np.uint64)
    assert K.delta_decode(K.delta_encode(docs)).tolist() == docs.tolist()


# --- SmallFloat norm quantization (FIXTURES.md §5 golden pairs) ---


def test_smallfloat_free_values_exact():
    assert K.NUM_FREE_VALUES == 24
    for i in range(24):
        assert int(K.int_to_byte4(np.array([i]))[0]) == i
        assert int(K.byte4_to_int(np.array([i]))[0]) == i


def test_smallfloat_monotone_and_idempotent():
    counts = np.arange(0, 300_000, 7)
    b = K.int_to_byte4(counts)
    dec = K.byte4_to_int(b)
    # decode(encode(x)) <= x, and re-encoding a decoded value is stable
    assert (dec <= counts).all()
    assert (K.int_to_byte4(dec) == b).all()
    # monotone non-decreasing
    assert (np.diff(dec) >= 0).all()


def test_smallfloat_goldens():
    cases = np.array([0, 1, 2, 127, 128, 255, 256, 10_000])
    enc = K.int_to_byte4(cases)
    dec = K.byte4_to_int(enc)
    # derived from the published SmallFloat algorithm (scalar reference impl)
    assert enc.tolist() == [0, 1, 2, 60, 61, 70, 70, 113]
    assert dec.tolist() == [0, 1, 2, 120, 128, 248, 248, 9240]


def test_smallfloat_max_int_encodable():
    assert int(K.int_to_byte4(np.array([2**31 - 1]))[0]) == 255
    assert int(K.byte4_to_int(np.array([255]))[0]) == 24 + 15 * 2**27


# --- BM25 kernel ---


def test_bm25_matches_formula_float32():
    doc_count, df, avgdl = 1000, 10, np.float32(57.3)
    idf = K.bm25_idf(df, doc_count)
    assert idf == np.float32(np.log(np.float32(1.0) + (np.float32(990.5)) / np.float32(10.5)))
    cache = K.bm25_norm_cache(avgdl)
    tf = np.array([1, 5, 20], dtype=np.int64)
    dl_byte = K.int_to_byte4(np.array([30, 100, 2000]))
    s = K.bm25_score(tf, dl_byte, np.full(3, idf, dtype=np.float32), cache)
    dl = K.byte4_to_int(dl_byte).astype(np.float32)
    expect = (idf * (tf.astype(np.float32) / (tf.astype(np.float32) + (K.K1 * (np.float32(1.0) - K.B + K.B * dl / avgdl)).astype(np.float32)))).astype(np.float32)
    assert s.tolist() == pytest.approx(expect.tolist(), abs=0)
    assert s.dtype == np.float32


def test_bm25_upper_bound_dominates():
    rng = np.random.default_rng(42)
    cache = K.bm25_norm_cache(np.float32(80.0))
    idf = np.float32(1.7)
    tf = rng.integers(1, 50, 256)
    nb = K.int_to_byte4(rng.integers(5, 5000, 256))
    scores = K.bm25_score(tf, nb, np.full(256, idf, dtype=np.float32), cache)
    ub = K.bm25_upper_bound(
        np.array([tf.max()]), np.array([nb.min()]), np.array([idf], dtype=np.float32), cache
    )
    assert (scores <= ub[0]).all()


# --- Analyzer (FIXTURES.md §2) ---


def test_tokenize_pinned_spec():
    assert tokenize("Foo_bar::baz(1) -> x99") == ["foo_bar", "baz", "1", "x99"]
    assert tokenize("") == []
    assert tokenize(None) == []
    long = "a" * 256
    assert tokenize(f"ok {long} fine") == ["ok", "fine"]
    assert tokenize("a" * 255) == ["a" * 255]


def test_tokenize_series_matches_scalar():
    import pandas as pd

    texts = ["HashMap<K,V> get_value()", "", None, "x " + "b" * 300, "Üml4ut_ok"]
    out = tokenize_series(pd.Series(texts)).tolist()
    assert out == [tokenize(t) for t in texts]


def test_tokenize_series_nonascii_order_pinned():
    """Tokenize-then-lowercase order: 'İ'.lower() introduces a combining
    mark (U+0307) that \\w would split — the series path must not lowercase
    before tokenizing (engine↔oracle identity on non-ASCII corpora)."""
    import pandas as pd

    texts = ["İstanbul Merge", "ẞtraße İİ x", "ΑΒΓ δε"]
    out = tokenize_series(pd.Series(texts)).tolist()
    assert out == [tokenize(t) for t in texts]
    # the scalar path keeps 'İstanbul' a single token
    assert tokenize("İstanbul")[0] == "i̇stanbul"
    assert len(tokenize("İstanbul")) == 1


def test_pfor_pack_roundtrip_and_savings():
    """PFor exception patching: self-describing blobs decode through the
    same for_unpack; outlier-laden blocks shrink vs plain FOR."""
    rng = np.random.default_rng(11)
    # typical posting deltas with up to 3 huge outliers
    for n_out in (0, 1, 2, 3):
        v = rng.integers(0, 14, 128).astype(np.uint64)
        pos = rng.choice(128, size=n_out, replace=False)
        v[pos] = rng.integers(1 << 30, 1 << 40, n_out)
        plain = K.for_pack(v)
        patched = K.pfor_pack(v)
        assert (K.for_unpack(patched, 128) == v).all()
        assert (K.for_unpack(plain, 128) == v).all()
        if n_out:
            assert len(patched) < len(plain), (n_out, len(patched), len(plain))
        else:
            assert patched == plain  # no outliers -> falls back to plain FOR
    # degenerate shapes
    for v in ([], [0], [7], [0, 1 << 50], list(range(128))):
        a = np.array(v, dtype=np.uint64)
        assert (K.for_unpack(K.pfor_pack(a), len(a)) == a).all()


def test_uax29_tokenizer_goldens():
    """UAX#29 word-break option: joins across MidLetter/MidNum/
    Single_Quote and ExtendNumLet, per-char CJK, tokenize-then-lower
    order preserved for the İ combining-mark case."""
    from lucene_rust_spark.functions.analysis import tokenize

    cases = {
        "can't stop won't": ["can't", "stop", "won't"],
        "3.14 1,000,000": ["3.14", "1,000,000"],
        "a_b x_1_y": ["a_b", "x_1_y"],
        "foo.bar colon:sep semi;colon": ["foo.bar", "colon:sep", "semi", "colon"],
        "O’Neil": ["o’neil"],
        "カタカナ run": ["カタカナ", "run"],
        "漢字": ["漢", "字"],
        "İstanbul": ["i̇stanbul"],  # single token, lowered AFTER split
        "café naïve": ["café", "naïve"],
    }
    for text, want in cases.items():
        assert tokenize(text, word_break="uax29") == want, text
    # simple mode unchanged
    assert tokenize("can't") == ["can", "t"]
    # batch form identical to scalar
    import pandas as pd

    from lucene_rust_spark.functions.analysis import tokenize_series

    texts = list(cases)
    assert tokenize_series(pd.Series(texts), word_break="uax29").tolist() == [
        tokenize(t, word_break="uax29") for t in texts
    ]
