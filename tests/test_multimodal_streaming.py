"""Multimodal binary-column operators + incremental (streaming) index
append."""

import numpy as np


def test_media_pipeline(spark):
    from lucene_rust_spark.operators.multimodal import (
        audio_stats,
        gen_media_spark,
        image_features,
        image_resize,
        video_sample_frames,
    )

    media = gen_media_spark(spark, 60, 4).persist()
    feats = image_features(media).toPandas()
    assert len(feats) == 20  # every 3rd row is an image
    for f in feats["feature"]:
        assert len(f) == 16
        assert abs(sum(f) - 1.0) < 1e-5  # normalized histogram

    resized = image_resize(media, 4, 4).toPandas()
    assert (resized["data"].map(len) == 16).all()

    frames = video_sample_frames(media, every=2).toPandas()
    assert (frames["frame_no"] % 2 == 0).all()
    assert (frames["data"].map(len) == 64).all()

    astats = audio_stats(media).toPandas()
    assert len(astats) == 20
    assert (astats["rms"] > 0).all()
    media.unpersist()


def test_media_determinism(spark):
    from lucene_rust_spark.operators.multimodal import gen_media_spark

    a = gen_media_spark(spark, 12, 2).toPandas().sort_values("media_id").reset_index(drop=True)
    b = gen_media_spark(spark, 12, 4).toPandas().sort_values("media_id").reset_index(drop=True)
    assert (a["data"] == b["data"]).all()


def test_incremental_append(spark, tmp_path):
    """Batch 0 built, batches 1-2 appended via the streaming sink; results
    must equal a full rebuild (same scores; docIDs differ by construction,
    so compare (path, score) multisets)."""
    from lucene_rust_spark.corpus import gen_corpus_spark
    from lucene_rust_spark.index.build import build_index
    from lucene_rust_spark.oracle.bm25 import bool_query
    from lucene_rust_spark.search.searcher import IndexSearcher
    from lucene_rust_spark.streaming.incremental import append_batch, stream_append

    full_src = gen_corpus_spark(spark, 600, 4).persist()
    b0 = full_src.filter("row_id < 200").drop("row_id")
    b1 = full_src.filter("row_id >= 200 and row_id < 400").drop("row_id")
    b2 = full_src.filter("row_id >= 400").drop("row_id")

    inc_dir = str(tmp_path / "inc")
    build_index(spark, b0, inc_dir, num_partitions=4)
    # one direct append + one through the Structured Streaming sink
    append_batch(spark, b1, inc_dir, epoch=99, num_partitions=4)  # distinct epoch namespace from the stream's epoch 0
    batch2_dir = str(tmp_path / "b2src")
    b2.write.mode("overwrite").parquet(batch2_dir)
    stream = spark.readStream.schema(b2.schema).parquet(batch2_dir)
    q = stream_append(spark, stream, inc_dir, str(tmp_path / "ckpt"), num_partitions=4)
    q.awaitTermination(120)

    full_dir = str(tmp_path / "full")
    build_index(spark, full_src.drop("row_id"), full_dir, num_partitions=4)

    s_inc = IndexSearcher(spark, inc_dir)
    s_full = IndexSearcher(spark, full_dir)
    assert s_inc.doc_count == s_full.doc_count == 600
    assert s_inc.sum_ttf == s_full.sum_ttf
    assert s_inc.manifest["content_sha256_xor"] == s_full.manifest["content_sha256_xor"]

    for query in [bool_query(should=["token", "value"]), bool_query(must=["index"])]:
        k = 1000  # > doc_count: no tie-boundary truncation, full hit sets compare
        a = s_inc.fetch(s_inc.search_df(query, k)).select("path", "score").collect()
        b = s_full.fetch(s_full.search_df(query, k)).select("path", "score").collect()
        a_set = sorted((r["path"], round(float(np.float32(r["score"])), 6)) for r in a)
        b_set = sorted((r["path"], round(float(np.float32(r["score"])), 6)) for r in b)
        assert a_set == b_set
    full_src.unpersist()


def _encode_bmp24(gray_rgb: "np.ndarray", bottom_up=True) -> bytes:
    """Minimal 24-bit uncompressed BMP encoder (test-side reference)."""
    import numpy as np

    h, w, _ = gray_rgb.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    # BMP stores BGR
    rows[:, : w * 3] = gray_rgb[:, :, ::-1].reshape(h, w * 3)
    if bottom_up:
        rows = rows[::-1]
    px = rows.tobytes()
    off = 14 + 40
    header = (
        b"BM"
        + (off + len(px)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (h if bottom_up else -h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(px).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + px


def test_bmp_decode_real_format(spark):
    """The numpy BMP decoder handles a REAL standard format end-to-end
    (no PIL): 24-bit bottom-up and top-down payloads decode to the exact
    BT.601 integer luma, row padding respected, and the distributed
    image_features kernel consumes codec='bmp' rows unchanged."""
    import numpy as np
    import pandas as pd

    from lucene_rust_spark.operators.multimodal import (
        _decode_bmp,
        image_features,
    )

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)  # w=7 forces padding
    want = (
        (299 * rgb[..., 0].astype(np.int32)
         + 587 * rgb[..., 1].astype(np.int32)
         + 114 * rgb[..., 2].astype(np.int32)) // 1000
    ).astype(np.uint8)
    for bottom_up in (True, False):
        got = _decode_bmp(_encode_bmp24(rgb, bottom_up))
        assert got.shape == (5, 7)
        assert (got == want).all(), bottom_up
    # garbage rejected clearly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _decode_bmp(b"JUNKJUNKJUNK")

    # distributed: BMP rows through the feature kernel
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2],
                "kind": ["image", "image"],
                "data": [_encode_bmp24(rgb), _encode_bmp24(rgb, bottom_up=False)],
                "width": [7, 7],
                "height": [5, 5],
                "sample_rate": [0, 0],
                "duration_ms": [0, 0],
                "codec": ["bmp", "bmp"],
            }
        )
    )
    feats = {r["media_id"]: r["feature"] for r in image_features(media).collect()}
    assert len(feats) == 2 and feats[1] == feats[2]  # same pixels, same features
    ref = np.bincount(want.ravel() >> 4, minlength=16) / want.size
    assert np.allclose(feats[1], ref, atol=1e-6)


def _encode_wav(pcm16: "np.ndarray", rate=16000, n_ch=1, bits=16, junk_chunk=True) -> bytes:
    import numpy as np

    if bits == 16:
        raw = pcm16.astype("<i2").tobytes()
    else:
        raw = ((pcm16.astype(np.int32) // 256) + 128).astype(np.uint8).tobytes()
    fmt = (
        (1).to_bytes(2, "little") + n_ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * n_ch * bits // 8).to_bytes(4, "little")
        + (n_ch * bits // 8).to_bytes(2, "little") + bits.to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    if junk_chunk:  # decoders must WALK chunks, not assume adjacency
        chunks += b"LIST" + (5).to_bytes(4, "little") + b"INFOX" + b"\x00"
    chunks += b"data" + len(raw).to_bytes(4, "little") + raw
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_wav_decode_real_format(spark):
    """RIFF/WAVE decode with numpy alone: chunk walking (junk LIST chunk
    between fmt and data), 16-bit mono, stereo downmix, 8-bit rescale;
    audio_stats consumes codec='wav' rows through the distributed kernel."""
    import numpy as np
    import pandas as pd

    from lucene_rust_spark.operators.multimodal import _decode_wav, audio_stats

    rng = np.random.default_rng(5)
    mono = rng.integers(-(2**15), 2**15, 400, dtype=np.int16)
    pcm, rate = _decode_wav(_encode_wav(mono))
    assert rate == 16000 and (pcm == mono.astype(np.float64)).all()
    # stereo downmix = channel mean
    stereo = np.stack([mono, np.roll(mono, 1)], axis=1).ravel()
    pcm2, _ = _decode_wav(_encode_wav(stereo, n_ch=2))
    want = np.stack([mono, np.roll(mono, 1)]).astype(np.float64).mean(axis=0)
    assert np.allclose(pcm2, want)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _decode_wav(b"NOTAWAVEFILE")

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1], "kind": ["audio"], "data": [_encode_wav(mono)],
                "width": [0], "height": [0], "sample_rate": [16000],
                "duration_ms": [25], "codec": ["wav"],
            }
        )
    )
    r = audio_stats(media).collect()[0]
    assert r["n_samples"] == 400
    assert abs(r["rms"] - float(np.sqrt(np.mean(mono.astype(np.float64) ** 2)))) < 1e-9


def test_bmp_encoder_decoder_roundtrip():
    """encode_bmp24 / encode_bmp8 -> _decode_bmp recovers the exact
    BT.601 luma, including non-multiple-of-4 widths (row padding) and
    the bottom-up flip."""
    from lucene_rust_spark.operators.multimodal import (
        _decode_bmp,
        encode_bmp8,
        encode_bmp24,
    )

    rng = np.random.default_rng(7)
    for w, h in ((5, 3), (8, 8), (13, 2), (1, 7)):
        bgr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        gray = _decode_bmp(encode_bmp24(bgr))
        b, g, r = (bgr[..., c].astype(np.int64) for c in range(3))
        want = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
        assert gray.shape == (h, w)
        assert np.array_equal(gray, want)

        idx = rng.integers(0, 16, (h, w), dtype=np.uint8)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        gray8 = _decode_bmp(encode_bmp8(idx, pal))
        p = pal.astype(np.int64)
        pal_gray = ((299 * p[:, 2] + 587 * p[:, 1] + 114 * p[:, 0]) // 1000).astype(
            np.uint8
        )
        assert np.array_equal(gray8, pal_gray[idx])


def test_wav_encoder_decoder_roundtrip():
    """encode_wav_pcm16 -> _decode_wav is sample-exact, with and without
    an odd-sized junk chunk between fmt and data (word-aligned walk)."""
    from lucene_rust_spark.operators.multimodal import _decode_wav, encode_wav_pcm16

    rng = np.random.default_rng(11)
    for n, junk in ((1, False), (100, False), (257, True)):
        samples = rng.integers(-(2**15), 2**15, n, dtype=np.int16)
        pcm, rate = _decode_wav(encode_wav_pcm16(samples, 8000, junk_chunk=junk))
        assert rate == 8000
        assert np.array_equal(pcm, samples.astype(np.float64))


def test_image_luma_stats_operator(spark):
    """image_luma_stats through a media DataFrame equals the direct
    numpy computation, and the position weight detects orientation."""
    from lucene_rust_spark.operators.multimodal import (
        _decode_bmp,
        encode_bmp24,
        image_luma_stats,
    )

    rng = np.random.default_rng(3)
    rows, want = [], {}
    for mid in range(6):
        w, h = 4 + mid, 3 + mid
        bgr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = encode_bmp24(bgr)
        flat = _decode_bmp(data).astype(np.int64).ravel()
        i = np.arange(flat.size)
        want[mid] = (flat.size, int(flat.sum()), int((flat * (i + 1)).sum()))
        rows.append((mid, "image", bytearray(data), w, h, 0, 0, "bmp"))
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, data binary, width int, height int,"
        " sample_rate int, duration_ms int, codec string",
    )
    got = {
        r["media_id"]: (r["n_px"], r["luma_sum"], r["luma_wsum"])
        for r in image_luma_stats(media).collect()
    }
    assert got == want
    # a flipped (top-down stored) image must change luma_wsum but not luma_sum
    any_mid = 5
    _, s, wsum = want[any_mid]
    flipped = np.ascontiguousarray(
        _decode_bmp(bytes(rows[any_mid][2]))[::-1]
    ).astype(np.int64).ravel()
    i = np.arange(flipped.size)
    assert int(flipped.sum()) == s
    assert int((flipped * (i + 1)).sum()) != wsum
