"""Multimodal columns for the training-data pipeline: image/audio/video as
opaque binary columns + typed metadata, processed by Arrow-batched kernels.

The Spark-side plumbing (schemas, partitioning, mapInPandas batch shape,
binary <-> numpy marshalling) is real and tested; the codec decode step is
behind an import-try (PIL / soundfile are not in this container) with a
clearly-marked deterministic fake decoder so downstream feature pipelines
stay end-to-end testable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, data binary, "
    "width int, height int, sample_rate int, duration_ms int, codec string"
)

try:  # real decoders when available
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def gen_media_spark(spark: SparkSession, n_rows: int, n_partitions: int = 8) -> DataFrame:
    """Deterministic synthetic media table (seed 42): binary payloads are
    raw grayscale pixels (images) / pcm16 (audio) so the fake decoder is
    exact, not a mock."""

    def gen(batches):
        for pdf in batches:
            rows = {k: [] for k in ("media_id", "kind", "data", "width", "height",
                                    "sample_rate", "duration_ms", "codec")}
            for rid in pdf["id"].tolist():
                rng = np.random.default_rng([42, int(rid)])
                kind = ["image", "audio", "video"][int(rid) % 3]
                if kind == "image":
                    w, h = int(rng.integers(8, 33)), int(rng.integers(8, 33))
                    data = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
                    meta = (w, h, 0, 0, "raw8")
                elif kind == "audio":
                    n = int(rng.integers(100, 1000))
                    data = rng.integers(-(2**15), 2**15, n, dtype=np.int16).tobytes()
                    meta = (0, 0, 16000, n * 1000 // 16000, "pcm16")
                else:  # video: frame-concatenated raw8 "frames"
                    w, h, nf = 8, 8, int(rng.integers(2, 9))
                    data = rng.integers(0, 256, w * h * nf, dtype=np.uint8).tobytes()
                    meta = (w, h, 0, nf * 40, "rawv8")
                rows["media_id"].append(int(rid))
                rows["kind"].append(kind)
                rows["data"].append(data)
                for key, v in zip(("width", "height", "sample_rate", "duration_ms", "codec"), meta):
                    rows[key].append(v)
            yield pd.DataFrame(rows)

    return spark.range(0, n_rows, 1, n_partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def encode_bmp24(bgr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 BGR -> uncompressed 24-bit BMP (BITMAPINFOHEADER,
    bottom-up, 4-byte row alignment) — the write side of ``_decode_bmp``,
    used for round-trip tests and the deterministic media gate fixtures."""
    h, w, _ = bgr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = bgr.reshape(h, w * 3)
    px = rows[::-1].tobytes()  # positive height => bottom-up storage
    off = 14 + 40
    hdr = (
        b"BM"
        + (off + len(px)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(px).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return hdr + px


def encode_bmp8(idx: np.ndarray, palette_bgr: np.ndarray) -> bytes:
    """(h, w) uint8 palette indices + (n, 3) uint8 BGR palette ->
    uncompressed 8-bit paletted BMP (bottom-up, BGRA palette entries)."""
    h, w = idx.shape
    n = len(palette_bgr)
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = idx
    px = rows[::-1].tobytes()
    pal = np.zeros((n, 4), dtype=np.uint8)
    pal[:, :3] = palette_bgr
    off = 14 + 40 + 4 * n
    hdr = (
        b"BM"
        + (off + len(px)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(px).to_bytes(4, "little")
        + b"\x00" * 8
        + n.to_bytes(4, "little")  # clrUsed — read by the decoder
        + b"\x00" * 4
    )
    return hdr + pal.tobytes() + px


def encode_wav_pcm16(samples: np.ndarray, rate: int, junk_chunk: bool = False) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM bytes — the write side of
    ``_decode_wav``. ``junk_chunk`` inserts an odd-sized unknown chunk
    between fmt and data to exercise word-aligned chunk walking."""
    raw = samples.astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")  # byte rate
        + (2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    if junk_chunk:
        chunks += b"jnk " + (5).to_bytes(4, "little") + b"abcde" + b"\x00"
    chunks += b"data" + len(raw).to_bytes(4, "little") + raw
    if len(raw) & 1:
        chunks += b"\x00"
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def _decode_bmp(data: bytes) -> np.ndarray:
    """Pure-numpy BMP decoder (r4): uncompressed BITMAPINFOHEADER files,
    24-bit BGR and 8-bit paletted — a REAL standard-format decode with no
    image library. Returns (h, w) uint8 grayscale; luma pinned to the
    integer BT.601 form (299R + 587G + 114B) // 1000 so results are
    bit-reproducible everywhere. Rows are 4-byte aligned; positive height
    means bottom-up storage (flipped on return)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    off = int.from_bytes(data[10:14], "little")
    hdr_sz = int.from_bytes(data[14:18], "little")
    if hdr_sz < 40:
        raise NotImplementedError(f"BMP core-header size {hdr_sz} unsupported")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    comp = int.from_bytes(data[30:34], "little")
    if comp != 0:
        raise NotImplementedError(f"compressed BMP (method {comp}) unsupported")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * bpp // 8 + 3) & ~3
    px = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    px = px.reshape(h, stride)
    if bpp == 24:
        row = px[:, : w * 3].reshape(h, w, 3).astype(np.int32)
        b, g, r = row[..., 0], row[..., 1], row[..., 2]
        gray = ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
    elif bpp == 8:
        n_colors = int.from_bytes(data[46:50], "little") or 256
        pal = np.frombuffer(
            data, dtype=np.uint8, count=4 * n_colors, offset=14 + hdr_sz
        ).reshape(n_colors, 4).astype(np.int32)  # BGRA entries
        pal_gray = ((299 * pal[:, 2] + 587 * pal[:, 1] + 114 * pal[:, 0]) // 1000).astype(
            np.uint8
        )
        gray = pal_gray[px[:, :w]]
    else:
        raise NotImplementedError(f"BMP bpp {bpp} unsupported (24/8 only)")
    return gray[::-1] if bottom_up else gray


def _decode_image(data: bytes, width: int, height: int, codec: str) -> np.ndarray:
    """Decode one image payload to a (h, w) uint8 array. raw8 and BMP
    (24-bit / 8-bit uncompressed) decode with numpy alone; other real
    formats need PIL (not in this container)."""
    if codec == "raw8":
        return np.frombuffer(data, dtype=np.uint8).reshape(height, width)
    if codec == "bmp":
        return _decode_bmp(data)
    if HAVE_PIL:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    raise NotImplementedError(f"image codec {codec!r} needs PIL (not installed)")


def image_features(media: DataFrame, bins: int = 16) -> DataFrame:
    """(media_id, feature array<float>) — byte-histogram features, the
    decode → feature-extract stage of a multimodal pipeline. Vectorized
    per Arrow batch; at scale this is the shape a CLIP/ViT embedder runs
    in (same schema, same batching), with the model call swapped in."""

    def kernel(batches):
        for pdf in batches:
            ids, feats = [], []
            for rid, data, w, h, codec in zip(
                pdf["media_id"], pdf["data"], pdf["width"], pdf["height"], pdf["codec"]
            ):
                img = _decode_image(bytes(data), int(w), int(h), codec)
                hist = np.bincount((img.ravel() >> 4), minlength=bins).astype(np.float32)
                feats.append((hist / np.float32(max(img.size, 1))).tolist())
                ids.append(int(rid))
            yield pd.DataFrame({"media_id": ids, "feature": feats})

    return media.filter(F.col("kind") == "image").mapInPandas(
        kernel, schema="media_id long, feature array<float>"
    )


def image_luma_stats(media: DataFrame) -> DataFrame:
    """(media_id, n_px, luma_sum, luma_wsum) — integer-exact grayscale
    statistics through the full decode path. ``luma_wsum`` weights pixel
    ``i`` (row-major over the logical top-down image) by ``i+1``, so
    orientation/stride bugs (missed bottom-up flip, wrong row padding)
    change the value even when the plain sum would not."""

    def kernel(batches):
        for pdf in batches:
            ids, npx, ls, lw = [], [], [], []
            for rid, data, w, h, codec in zip(
                pdf["media_id"], pdf["data"], pdf["width"], pdf["height"], pdf["codec"]
            ):
                img = _decode_image(bytes(data), int(w), int(h), codec)
                flat = img.astype(np.int64).ravel()
                i = np.arange(flat.size, dtype=np.int64)
                ids.append(int(rid))
                npx.append(int(flat.size))
                ls.append(int(flat.sum()))
                lw.append(int((flat * (i + 1)).sum()))
            yield pd.DataFrame(
                {"media_id": ids, "n_px": npx, "luma_sum": ls, "luma_wsum": lw}
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        kernel, schema="media_id long, n_px long, luma_sum long, luma_wsum long"
    )


def image_resize(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of raw8 images — (media_id, data binary)."""

    def kernel(batches):
        for pdf in batches:
            ids, out = [], []
            for rid, data, w, h, codec in zip(
                pdf["media_id"], pdf["data"], pdf["width"], pdf["height"], pdf["codec"]
            ):
                img = _decode_image(bytes(data), int(w), int(h), codec)
                yi = (np.arange(out_h) * img.shape[0] // out_h).astype(np.int64)
                xi = (np.arange(out_w) * img.shape[1] // out_w).astype(np.int64)
                out.append(img[yi][:, xi].tobytes())
                ids.append(int(rid))
            yield pd.DataFrame({"media_id": ids, "data": out})

    return media.filter(F.col("kind") == "image").mapInPandas(
        kernel, schema="media_id long, data binary"
    )


def video_sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling: one output row per kept frame (media_id, frame_no,
    data binary) — the video analog of explode."""

    def kernel(batches):
        for pdf in batches:
            ids, fnos, out = [], [], []
            for rid, data, w, h in zip(pdf["media_id"], pdf["data"], pdf["width"], pdf["height"]):
                raw = np.frombuffer(bytes(data), dtype=np.uint8)
                fsize = int(w) * int(h)
                nf = len(raw) // fsize
                for f in range(0, nf, every):
                    ids.append(int(rid))
                    fnos.append(f)
                    out.append(raw[f * fsize : (f + 1) * fsize].tobytes())
            yield pd.DataFrame({"media_id": ids, "frame_no": fnos, "data": out})

    return media.filter(F.col("kind") == "video").mapInPandas(
        kernel, schema="media_id long, frame_no int, data binary"
    )


def _decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Pure-numpy RIFF/WAVE decoder (r4): PCM (format 1) 16-bit and 8-bit
    mono/stereo, chunk-walked (fmt may not be adjacent to data). Returns
    (mono float64 samples in int16 scale, sample_rate). Multi-channel
    payloads are averaged to mono — the standard featurizer front-end."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        sz = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            raw = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1:
        raise NotImplementedError(f"WAV format {audio_fmt} unsupported (PCM only)")
    if bits == 16:
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif bits == 8:  # unsigned, rescaled into the int16 range
        pcm = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) * 256.0
    else:
        raise NotImplementedError(f"WAV bit depth {bits} unsupported (8/16 only)")
    if n_ch > 1:
        pcm = pcm[: len(pcm) - len(pcm) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return pcm, rate


def audio_stats(media: DataFrame) -> DataFrame:
    """(media_id, n_samples, rms, peak) from pcm16 or WAV payloads — the
    feature-extraction shape for audio."""

    def kernel(batches):
        for pdf in batches:
            ids, ns, rms, peak = [], [], [], []
            for rid, data, codec in zip(pdf["media_id"], pdf["data"], pdf["codec"]):
                if codec == "pcm16":
                    pcm = np.frombuffer(bytes(data), dtype=np.int16).astype(np.float64)
                elif codec == "wav":
                    pcm, _rate = _decode_wav(bytes(data))
                else:
                    raise NotImplementedError(
                        f"audio codec {codec!r} needs soundfile (pcm16/wav are native)"
                    )
                ids.append(int(rid))
                ns.append(len(pcm))
                rms.append(float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0)
                peak.append(float(np.abs(pcm).max()) if len(pcm) else 0.0)
            yield pd.DataFrame({"media_id": ids, "n_samples": ns, "rms": rms, "peak": peak})

    return media.filter(F.col("kind") == "audio").mapInPandas(
        kernel, schema="media_id long, n_samples int, rms double, peak double"
    )
