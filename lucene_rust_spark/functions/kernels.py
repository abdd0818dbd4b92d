"""Vectorized numpy encode/decode + scoring kernels.

These are the Arrow-batch "codecs" of the engine — the Spark-native
equivalent of the reference's byte-level I/O kernels:

- VByte varint       (spec: reference core/src/io/encoding.rs:13-57, goldens :328-367)
- ZigZag             (reference core-java-transliteration/src/store/data_input.rs:168-173)
- FOR(128) bit-pack  (reference core-java-transliteration/src/codecs/lucene90/for_util.rs:1
                      [stub]; Lucene90 public format: 128-int blocks at the block's
                      max bit width)
- SmallFloat norm quantization (reference clt/util/small_float.rs:1 [stub]; Lucene 9
                      public semantics: intToByte4 / byte4ToInt)
- BM25 score kernel  (reference clt/search/similarities/b_m25_similarity.rs:1 [stub];
                      Lucene 9 public formula, pinned in FIXTURES.md §3)

All kernels operate on whole numpy arrays — no per-element Python in the
hot path. They are shared verbatim by the Spark engine (inside pandas
UDFs) and the single-process oracle, which is what makes float32
rank-identity well-defined.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128  # Lucene90 postings block size (for_util.rs:1)

# ---------------------------------------------------------------------------
# VByte varint
# ---------------------------------------------------------------------------


def write_vint_array(values: np.ndarray, width: int = 32) -> bytes:
    """Encode an array of non-negative ints as concatenated VByte varints.

    Negative inputs are encoded at max width (5 bytes for 32-bit, 10 for
    64-bit) by reinterpreting as unsigned — matching the reference spec
    (core/src/io/encoding.rs:24-49: "negative numbers are always encoded
    at maximum width").
    """
    if width == 32:
        u = values.astype(np.int64) & 0xFFFFFFFF
        max_bytes = 5
    else:
        u = values.astype(np.uint64)
        max_bytes = 10
    n = len(u)
    if n == 0:
        return b""
    out = np.zeros((n, max_bytes), dtype=np.uint8)
    lengths = np.ones(n, dtype=np.int64)
    rem = u.astype(np.uint64).copy()
    for i in range(max_bytes):
        out[:, i] = (rem & np.uint64(0x7F)).astype(np.uint8)
        rem >>= np.uint64(7)
        more = rem != 0
        out[more, i] |= 0x80
        lengths[more] = i + 2
        if not more.any():
            break
    mask = np.arange(max_bytes)[None, :] < lengths[:, None]
    return out[mask].tobytes()


def read_vint_array(buf: bytes, count: int) -> np.ndarray:
    """Decode `count` VByte varints from buf → uint64 array."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if count == 0:
        return np.zeros(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)[:count]
    starts = np.empty(count, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    vals = np.zeros(count, dtype=np.uint64)
    max_len = int((ends - starts).max()) + 1
    for i in range(max_len):
        pos = starts + i
        active = pos <= ends
        vals[active] |= (b[pos[active]].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * i)
    return vals


def write_vint(value: int, width: int = 32) -> bytes:
    return write_vint_array(np.array([value], dtype=np.int64), width)


def read_vint(buf: bytes, width: int = 32) -> int:
    v = int(read_vint_array(buf, 1)[0])
    if width == 32:
        v &= 0xFFFFFFFF
        if v >= 1 << 31:
            v -= 1 << 32
    else:
        if v >= 1 << 63:
            v -= 1 << 64
    return v


# ---------------------------------------------------------------------------
# ZigZag
# ---------------------------------------------------------------------------


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    v = v.astype(np.int64)
    return ((v << 1) ^ (v >> 63)).astype(np.uint64)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(u & np.uint64(1)).astype(np.int64)


# ---------------------------------------------------------------------------
# FOR bit-packing (Frame Of Reference): pack uint32 values at the
# block's max bit width. Layout: [1 byte bitwidth][ceil(n*bw/8) bytes,
# values MSB-first]. bw==0 (all zeros) stores no payload.
# ---------------------------------------------------------------------------


_SHIFTS_CACHE: dict = {}


def _shifts(bw: int) -> np.ndarray:
    s = _SHIFTS_CACHE.get(bw)
    if s is None:
        s = np.arange(bw - 1, -1, -1, dtype=np.uint64)
        _SHIFTS_CACHE[bw] = s
    return s


def for_pack(values: np.ndarray) -> bytes:
    v = values.astype(np.uint64)
    if len(v) == 0:
        return bytes([0])
    m = int(v.max())
    bw = m.bit_length()
    if bw == 0:
        return bytes([0])
    shifts = _shifts(bw)
    bits = ((v[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    packed = np.packbits(bits.ravel())
    return bytes([bw]) + packed.tobytes()


def bit_length_arr(m: np.ndarray) -> np.ndarray:
    """Exact vectorized int.bit_length for uint64 arrays."""
    m = m.astype(np.uint64, copy=False)
    bw = np.zeros(len(m), dtype=np.int64)
    x = m.copy()
    for s in (32, 16, 8, 4, 2, 1):
        hit = (x >> np.uint64(s)) != 0
        bw[hit] += s
        x[hit] >>= np.uint64(s)
    bw[m != 0] += 1
    return bw


def for_pack_batch(values: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> list:
    """[for_pack(values[s:e]) for s, e in zip(starts, ends)], vectorized.

    REQUIRES the (s, e) slices to tile `values` contiguously (ends[i] ==
    starts[i+1]) — the _pack_runs block layout — so per-slice maxima come
    from one reduceat. Blocks are grouped by (bit width, length) and each
    group's bit matrix is built with one strided fill per bit + one
    packbits call, replacing ~3 numpy calls per block with ~bw calls per
    group (byte-identical output, tests/test_kernels.py)."""
    nb = len(starts)
    out: list = [None] * nb
    if nb == 0:
        return out
    v = values.astype(np.uint64, copy=False)
    ns = (ends - starts).astype(np.int64)
    maxes = np.maximum.reduceat(v, starts) if len(v) else np.zeros(nb, dtype=np.uint64)
    bws = bit_length_arr(maxes)
    bws[ns == 0] = 0
    for i in np.flatnonzero(bws == 0):
        out[i] = b"\x00"
    nz = np.flatnonzero(bws != 0)
    if len(nz) == 0:
        return out
    order = nz[np.lexsort((ns[nz], bws[nz]))]
    gb, gn = bws[order], ns[order]
    cut = np.flatnonzero((gb[1:] != gb[:-1]) | (gn[1:] != gn[:-1]))
    gstarts = np.concatenate(([0], cut + 1))
    gends = np.concatenate((cut + 1, [len(order)]))
    for gs, ge in zip(gstarts, gends):
        bw, n = int(gb[gs]), int(gn[gs])
        idxs = order[gs:ge]
        nbytes_payload = (n * bw + 7) // 8
        # chunk so the (k, n) gather + per-bit temps stay cache-friendly
        max_k = max(1, (1 << 22) // max(n, 1))
        col = np.arange(n, dtype=np.int64)
        for c0 in range(0, len(idxs), max_k):
            idxc = idxs[c0 : c0 + max_k]
            k = len(idxc)
            mat = v[starts[idxc][:, None] + col[None, :]]  # (k, n)
            bits = np.empty((k, n * bw), dtype=np.uint8)
            for j in range(bw):
                bits[:, j::bw] = (
                    (mat >> np.uint64(bw - 1 - j)) & np.uint64(1)
                ).astype(np.uint8)
            packed = np.packbits(bits, axis=1)
            rows = np.empty((k, 1 + nbytes_payload), dtype=np.uint8)
            rows[:, 0] = bw
            rows[:, 1:] = packed
            rb = rows.tobytes()
            w = 1 + nbytes_payload
            for jj, i in enumerate(idxc):
                out[i] = rb[jj * w : (jj + 1) * w]
    return out


_PFOR_MARKER = 255  # legit FOR bitwidths are 0..64, so 255/254 are free
_PFOR_MARKER16 = 254  # wide variant: exception positions stored as u16


def pfor_pack(values: np.ndarray, max_exceptions: int = 3) -> bytes:
    """PFor exception patching (reference surface
    clt/codecs/lucene90/mod.rs:26 p_for_util [stub]; Lucene 9 public
    semantics: pack at a lower bit width and store up to 3 outliers
    separately). Layout: [255][bw_low][n_exc][(pos u8, value u64-BE) x
    n_exc][payload at bw_low, exception slots masked]. Inputs longer than
    256 (the per-block position stream: sum of tf, unbounded by BLOCK_SIZE)
    use marker 254 with u16-BE positions; beyond 65536 values patching
    falls back to plain FOR. The output is self-describing either way, so
    for_unpack decodes all variants transparently."""
    v = values.astype(np.uint64)
    n = len(v)
    if n == 0:
        return for_pack(v)
    plain = for_pack(v)
    if n > 65536:
        return plain
    wide = n > 256
    marker, pos_bytes = (_PFOR_MARKER16, 2) if wide else (_PFOR_MARKER, 1)
    best = plain
    order = np.argsort(v)[::-1]  # biggest values = exception candidates
    for n_exc in range(1, min(max_exceptions, n - 1) + 1):
        exc_pos = np.sort(order[:n_exc])
        rest_max = int(v[order[n_exc]]) if n_exc < n else 0
        bw_low = rest_max.bit_length()
        if bw_low:
            masked = v.copy()
            masked[exc_pos] &= (np.uint64(1) << np.uint64(bw_low)) - np.uint64(1)
            payload = for_pack(masked)[1:]
        else:
            payload = b""
        out = bytes([marker, bw_low, n_exc])
        for p in exc_pos:
            out += int(p).to_bytes(pos_bytes, "big") + int(v[p]).to_bytes(8, "big")
        out += payload
        if len(out) < len(best):
            best = out
    return best


def for_unpack(buf: bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.zeros(0, dtype=np.uint64)
    bw = buf[0]
    if bw in (_PFOR_MARKER, _PFOR_MARKER16):
        pos_bytes = 2 if bw == _PFOR_MARKER16 else 1
        bw_low, n_exc = buf[1], buf[2]
        pos = np.empty(n_exc, dtype=np.int64)
        val = np.empty(n_exc, dtype=np.uint64)
        off = 3
        for i in range(n_exc):
            pos[i] = int.from_bytes(buf[off : off + pos_bytes], "big")
            val[i] = int.from_bytes(buf[off + pos_bytes : off + pos_bytes + 8], "big")
            off += pos_bytes + 8
        if bw_low == 0:
            out = np.zeros(count, dtype=np.uint64)
        else:
            out = for_unpack(bytes([bw_low]) + buf[off:], count)
        out[pos] = val
        return out
    if bw == 0:
        return np.zeros(count, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8, offset=1), count=count * bw)
    bits = bits.reshape(count, bw).astype(np.uint64)
    weights = np.uint64(1) << np.arange(bw - 1, -1, -1, dtype=np.uint64)
    return bits @ weights


_WEIGHTS_CACHE: dict = {}


def _weights(bw: int) -> np.ndarray:
    w = _WEIGHTS_CACHE.get(bw)
    if w is None:
        w = np.uint64(1) << np.arange(bw - 1, -1, -1, dtype=np.uint64)
        _WEIGHTS_CACHE[bw] = w
    return w


def for_unpack_batch(bufs: list, counts: np.ndarray) -> list:
    """[for_unpack(bufs[i], counts[i]) for i], vectorized by grouping rows
    of equal (bit width, count) into one unpackbits + matmul. PFor-marked
    rows (and bw==0) fall back to the scalar kernel. Identical outputs
    (tests/test_kernels.py)."""
    k = len(bufs)
    out: list = [None] * k
    if k == 0:
        return out
    counts = np.asarray(counts, dtype=np.int64)
    bws = np.fromiter(
        ((b[0] if len(b) else 0) for b in bufs), dtype=np.int64, count=k
    )
    plain = (bws > 0) & (bws < _PFOR_MARKER16) & (counts > 0)
    for i in np.flatnonzero(~plain):
        out[i] = for_unpack(bytes(bufs[i]), int(counts[i]))
    idx = np.flatnonzero(plain)
    if len(idx) == 0:
        return out
    order = idx[np.lexsort((counts[idx], bws[idx]))]
    gb, gn = bws[order], counts[order]
    cut = np.flatnonzero((gb[1:] != gb[:-1]) | (gn[1:] != gn[:-1]))
    gstarts = np.concatenate(([0], cut + 1))
    gends = np.concatenate((cut + 1, [len(order)]))
    for gs, ge in zip(gstarts, gends):
        bw, n = int(gb[gs]), int(gn[gs])
        idxs = order[gs:ge]
        nbp = (n * bw + 7) // 8
        max_k = max(1, (1 << 22) // max(n * bw, 1))
        for c0 in range(0, len(idxs), max_k):
            idxc = idxs[c0 : c0 + max_k]
            g = len(idxc)
            mat = np.empty((g, nbp), dtype=np.uint8)
            for j, i in enumerate(idxc):
                mat[j] = np.frombuffer(bufs[i], dtype=np.uint8, count=nbp, offset=1)
            bits = np.unpackbits(mat, axis=1, count=n * bw)
            vals = (bits.reshape(-1, bw).astype(np.uint64) @ _weights(bw)).reshape(g, n)
            for j, i in enumerate(idxc):
                out[i] = vals[j]
    return out


def delta_encode(sorted_vals: np.ndarray) -> np.ndarray:
    """First value kept absolute-relative-to-0? No: caller stores first_doc
    separately; deltas[0] = v[0] - base where base is passed by caller."""
    v = sorted_vals.astype(np.uint64)
    out = np.empty_like(v)
    out[0] = v[0]
    out[1:] = v[1:] - v[:-1]
    return out


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(deltas.astype(np.uint64))


# ---------------------------------------------------------------------------
# SmallFloat 4-bit-mantissa norm quantization (Lucene 9 public semantics;
# reference surface clt/util/small_float.rs:1 [stub]).
# intToByte4: counts 0..23 exact; larger values lossy (3-bit mantissa +
# implicit leading bit + shift). byte4ToInt decodes.
# ---------------------------------------------------------------------------


def _long_to_int4(i: np.ndarray) -> np.ndarray:
    i = i.astype(np.int64)
    # bit_length via frexp: exact for values < 2^53 (our domain is < 2^31)
    num_bits = np.frexp(i.astype(np.float64))[1].astype(np.int64)
    subnormal = num_bits < 4
    shift = np.where(subnormal, 0, num_bits - 4)
    encoded = (i >> shift) & np.where(subnormal, np.int64(0xF), np.int64(0x07))
    encoded = np.where(subnormal, i, encoded | ((shift + 1) << 3))
    return encoded


def _int4_to_long(e: np.ndarray) -> np.ndarray:
    e = e.astype(np.int64)
    bits = e & 0x07
    shift = (e >> 3) - 1
    subnormal = shift == -1
    return np.where(subnormal, e & 0x0F, (bits | 0x08) << np.maximum(shift, 0))


_MAX_INT4 = int(_long_to_int4(np.array([2**31 - 1]))[0])
NUM_FREE_VALUES = 255 - _MAX_INT4  # == 24


def int_to_byte4(i: np.ndarray) -> np.ndarray:
    """Quantize a non-negative int (doc token count) to one byte."""
    i = np.asarray(i, dtype=np.int64)
    small = i < NUM_FREE_VALUES
    big = NUM_FREE_VALUES + _long_to_int4(np.maximum(i - NUM_FREE_VALUES, 0))
    return np.where(small, i, big).astype(np.uint8)


def byte4_to_int(b: np.ndarray) -> np.ndarray:
    b = np.asarray(b, dtype=np.int64) & 0xFF
    small = b < NUM_FREE_VALUES
    big = NUM_FREE_VALUES + _int4_to_long(np.maximum(b - NUM_FREE_VALUES, 0))
    return np.where(small, b, big).astype(np.int64)


# ---------------------------------------------------------------------------
# BM25 (Lucene 9 formula, pinned FIXTURES.md §3; k1=1.2, b=0.75).
# All arithmetic float32, fixed op order — identical in engine and oracle.
# ---------------------------------------------------------------------------

K1 = np.float32(1.2)
B = np.float32(0.75)


def bm25_idf(doc_freq: int, doc_count: int) -> np.float32:
    df = np.float32(doc_freq)
    n = np.float32(doc_count)
    return np.float32(np.log(np.float32(1.0) + (n - df + np.float32(0.5)) / (df + np.float32(0.5))))


def bm25_norm_cache(avgdl: np.float32, k1: np.float32 = K1, b: np.float32 = B) -> np.ndarray:
    """256-entry float32 cache: cache[q] = k1 * (1 - b + b * dl(q)/avgdl)."""
    dl = byte4_to_int(np.arange(256)).astype(np.float32)
    return (k1 * (np.float32(1.0) - b + b * dl / np.float32(avgdl))).astype(np.float32)


def bm25_score(tf: np.ndarray, norm_byte: np.ndarray, idf: np.ndarray, cache: np.ndarray) -> np.ndarray:
    """score = idf * tf / (tf + cache[norm]); all float32, one op order."""
    tf32 = tf.astype(np.float32)
    denom = tf32 + cache[np.asarray(norm_byte, dtype=np.int64) & 0xFF]
    return (idf.astype(np.float32) * (tf32 / denom)).astype(np.float32)


def bm25_upper_bound(max_tf: np.ndarray, min_norm_byte: np.ndarray, idf: np.ndarray, cache: np.ndarray) -> np.ndarray:
    """Per-block score upper bound (block-max WAND): monotone in tf (↑)
    and dl (↓), so (max_tf, min_dl) bounds every posting in the block."""
    return bm25_score(max_tf, min_norm_byte, idf, cache)


def f32_ordered_sum(scores) -> np.float32:
    """Pinned combination: float32 left-fold in the given (ascending-term)
    order — shared by engine UDF and oracle."""
    acc = np.float32(0.0)
    for x in scores:
        acc = np.float32(acc + np.float32(x))
    return acc


def dismax_combine(scores_term_sorted, tie: float) -> np.float32:
    """DisjunctionMaxQuery combiner (clt/search/mod.rs:32-33 [stub]):
    max + tie * sum(others), float32, others summed in ascending-term
    order skipping the first occurrence of the max."""
    if not len(scores_term_sorted):
        return np.float32(0.0)
    arr = [np.float32(x) for x in scores_term_sorted]
    m = max(arr)
    skipped = False
    acc = np.float32(0.0)
    for x in arr:
        if not skipped and x == m:
            skipped = True
            continue
        acc = np.float32(acc + x)
    return np.float32(m + np.float32(np.float32(tie) * acc))
