"""Structured Streaming: watermarked window aggregation (late-data drop)
and the applyInPandasWithState sessionizer, driven with availableNow
restarts against one checkpoint — the production backfill/resume shape."""

import os

import pandas as pd
import pytest


def _write_batch(spark, src_dir, rows, name):
    """The file stream source lists FILES in src_dir (not subdirs): write
    the batch to a scratch dir and move its part file in under `name`."""
    import glob
    import shutil
    import tempfile

    from lucene_rust_spark.streaming.windows import EVENT_SCHEMA

    df = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
        ),
        schema=EVENT_SCHEMA,
    )
    with tempfile.TemporaryDirectory() as td:
        df.coalesce(1).write.mode("overwrite").parquet(os.path.join(td, "b"))
        part = glob.glob(os.path.join(td, "b", "part-*.parquet"))[0]
        shutil.copy(part, os.path.join(src_dir, f"{name}.parquet"))


def _ts(s):
    return pd.Timestamp(s)


def test_watermarked_window_drops_late_events(spark, tmp_path):
    from lucene_rust_spark.streaming.windows import stream_windowed_counts

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    # batch 1: events in hours 00 and 03 — advances the watermark to
    # 03:30 - 2h = 01:30, which closes the 00:00 window
    _write_batch(
        spark, src,
        [
            (1, _ts("2024-01-01 00:10:00"), 1, "click", 1.0),
            (2, _ts("2024-01-01 00:20:00"), 1, "click", 2.0),
            (3, _ts("2024-01-01 03:30:00"), 2, "click", 3.0),
        ],
        "b1",
    )
    q = stream_windowed_counts(spark, src, out, ck)
    q.awaitTermination()

    # batch 2: one on-time event (04:00) and one LATE event in the closed
    # 00:00 window — the late row must be dropped, not re-open the window
    _write_batch(
        spark, src,
        [
            (4, _ts("2024-01-01 00:40:00"), 3, "click", 100.0),  # late -> dropped
            (5, _ts("2024-01-01 04:00:00"), 2, "click", 4.0),
            (6, _ts("2024-01-01 07:00:00"), 2, "click", 5.0),  # advances watermark
        ],
        "b2",
    )
    q = stream_windowed_counts(spark, src, out, ck)
    q.awaitTermination()

    got = {
        (r["w_start"].strftime("%H:%M"), r["event_type"]): (r["n"], r["v"])
        for r in spark.read.parquet(out).collect()
    }
    assert got[("00:00", "click")] == (2, 3.0)  # late row NOT counted
    # the 03:00 window closed once the watermark passed 04:00 via 07:00
    assert got[("03:00", "click")] == (1, 3.0)
    assert got[("04:00", "click")] == (1, 4.0)


def test_sessionize_stateful(spark, tmp_path):
    from lucene_rust_spark.streaming.windows import stream_sessionize

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    # user 1: two events 10 min apart (one session), then nothing.
    # user 2: one event, then a second 3 HOURS later (gap 30 min -> two
    # sessions; the first closes when the watermark passes its gap).
    _write_batch(
        spark, src,
        [
            (1, _ts("2024-01-01 00:00:00"), 1, "click", 1.0),
            (2, _ts("2024-01-01 00:10:00"), 1, "click", 2.0),
            (3, _ts("2024-01-01 00:05:00"), 2, "click", 10.0),
        ],
        "b1",
    )
    q = stream_sessionize(spark, src, out, ck, gap_minutes=30, watermark="1 hour")
    q.awaitTermination()

    _write_batch(
        spark, src,
        [
            (4, _ts("2024-01-01 03:05:00"), 2, "click", 20.0),
            (5, _ts("2024-01-01 08:00:00"), 9, "click", 0.0),  # watermark pusher
        ],
        "b2",
    )
    q = stream_sessionize(spark, src, out, ck, gap_minutes=30, watermark="1 hour")
    q.awaitTermination()

    # one more empty-ish batch far in the future so every open session
    # times out and emits
    _write_batch(
        spark, src,
        [(6, _ts("2024-01-02 00:00:00"), 9, "click", 0.0)],
        "b3",
    )
    q = stream_sessionize(spark, src, out, ck, gap_minutes=30, watermark="1 hour")
    q.awaitTermination()

    rows = spark.read.parquet(out).collect()
    sess = sorted(
        (r["user_id"], r["session_start"].isoformat(), r["n_events"], r["value_sum"])
        for r in rows
        if r["user_id"] in (1, 2)
    )
    assert (1, "2024-01-01T00:00:00", 2, 3.0) in sess
    u2 = [s for s in sess if s[0] == 2]
    assert (2, "2024-01-01T00:05:00", 1, 10.0) in u2
    assert (2, "2024-01-01T03:05:00", 1, 20.0) in u2


def test_sessionize_intra_batch_gap_split(spark, tmp_path):
    """A SINGLE micro-batch (availableNow backfill file spanning hours)
    carrying >gap-separated events for one user must yield multiple
    sessions, not one merged span."""
    from lucene_rust_spark.streaming.windows import stream_sessionize

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    # user 7, ONE file: events at 00:00/00:10 (session A), 03:00 (B),
    # 06:00/06:05 (C) — gap 30 min. A and B close within the batch; C
    # stays open until the timeout batch.
    _write_batch(
        spark, src,
        [
            (1, _ts("2024-01-01 00:00:00"), 7, "click", 1.0),
            (2, _ts("2024-01-01 00:10:00"), 7, "click", 2.0),
            (3, _ts("2024-01-01 03:00:00"), 7, "click", 4.0),
            (4, _ts("2024-01-01 06:00:00"), 7, "click", 8.0),
            (5, _ts("2024-01-01 06:05:00"), 7, "click", 16.0),
        ],
        "b1",
    )
    q = stream_sessionize(spark, src, out, ck, gap_minutes=30, watermark="1 hour")
    q.awaitTermination()

    # cross-batch continuation: 06:20 extends session C (gap from 06:05
    # is 15 min), then a far-future pusher closes it via timeout
    _write_batch(
        spark, src,
        [
            (6, _ts("2024-01-01 06:20:00"), 7, "click", 32.0),
            (7, _ts("2024-01-02 00:00:00"), 9, "click", 0.0),
        ],
        "b2",
    )
    q = stream_sessionize(spark, src, out, ck, gap_minutes=30, watermark="1 hour")
    q.awaitTermination()
    _write_batch(
        spark, src,
        [(8, _ts("2024-01-03 00:00:00"), 9, "click", 0.0)],
        "b3",
    )
    q = stream_sessionize(spark, src, out, ck, gap_minutes=30, watermark="1 hour")
    q.awaitTermination()

    u7 = sorted(
        (
            r["session_start"].isoformat(),
            r["session_end"].isoformat(),
            r["n_events"],
            r["value_sum"],
        )
        for r in spark.read.parquet(out).collect()
        if r["user_id"] == 7
    )
    assert u7 == [
        ("2024-01-01T00:00:00", "2024-01-01T00:10:00", 2, 3.0),
        ("2024-01-01T03:00:00", "2024-01-01T03:00:00", 1, 4.0),
        ("2024-01-01T06:00:00", "2024-01-01T06:20:00", 3, 56.0),
    ]


def test_sessionize_out_of_order_within_watermark(spark, tmp_path):
    """An event that arrives in a LATER batch but timestamps BEFORE the
    stored session (still inside the watermark) must bridge/extend via
    the sorted segment merge — not open a bogus second session."""
    from lucene_rust_spark.streaming.windows import stream_sessionize

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    # batch 1: user 5 at 02:00; watermark (1h) reaches 01:30 via user 9
    _write_batch(
        spark, src,
        [
            (1, _ts("2024-01-01 02:00:00"), 5, "click", 1.0),
            (2, _ts("2024-01-01 02:30:00"), 9, "click", 0.0),
        ],
        "b1",
    )
    q = stream_sessionize(spark, src, out, ck, gap_minutes=30, watermark="1 hour")
    q.awaitTermination()

    # batch 2: OUT-OF-ORDER event for user 5 at 01:45 (before the stored
    # 02:00 start, after the watermark) — gap 15 min bridges backwards,
    # so the session becomes [01:45, 02:00]
    _write_batch(
        spark, src,
        [
            (3, _ts("2024-01-01 01:45:00"), 5, "click", 2.0),
            (4, _ts("2024-01-01 02:35:00"), 9, "click", 0.0),
        ],
        "b2",
    )
    q = stream_sessionize(spark, src, out, ck, gap_minutes=30, watermark="1 hour")
    q.awaitTermination()

    # flush via far-future pusher
    _write_batch(
        spark, src,
        [(5, _ts("2024-01-02 00:00:00"), 9, "click", 0.0)],
        "b3",
    )
    q = stream_sessionize(spark, src, out, ck, gap_minutes=30, watermark="1 hour")
    q.awaitTermination()

    u5 = [
        (r["session_start"].isoformat(), r["session_end"].isoformat(),
         r["n_events"], r["value_sum"])
        for r in spark.read.parquet(out).collect()
        if r["user_id"] == 5
    ]
    assert u5 == [("2024-01-01T01:45:00", "2024-01-01T02:00:00", 2, 3.0)]


def test_sessionize_late_event_bridges_open_islands(spark, tmp_path):
    """A late-but-in-watermark event that lands BETWEEN two open islands
    must merge them into ONE session. This only works because islands
    stay in state until the watermark provably closes them (emit-once
    append output cannot retract an eagerly-emitted half-session)."""
    from lucene_rust_spark.streaming.windows import stream_sessionize

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    # batch 1: user 3 at 00:00 and 00:50 (gap 30 min -> two islands);
    # pusher 02:20 keeps the watermark (2h) at 00:20, so NEITHER island
    # is provably closed (island 1 needs wm > 00:30)
    _write_batch(
        spark, src,
        [
            (1, _ts("2024-01-01 00:00:00"), 3, "click", 1.0),
            (2, _ts("2024-01-01 00:50:00"), 3, "click", 2.0),
            (3, _ts("2024-01-01 02:20:00"), 9, "click", 0.0),
        ],
        "b1",
    )
    q = stream_sessionize(spark, src, out, ck, gap_minutes=30, watermark="2 hours")
    q.awaitTermination()

    # batch 2: LATE event at 00:25 (admitted: > watermark 00:20) bridges
    # both islands (25 min to each side)
    _write_batch(
        spark, src,
        [
            (4, _ts("2024-01-01 00:25:00"), 3, "click", 4.0),
            (5, _ts("2024-01-01 05:00:00"), 9, "click", 0.0),
        ],
        "b2",
    )
    q = stream_sessionize(spark, src, out, ck, gap_minutes=30, watermark="2 hours")
    q.awaitTermination()

    # flush everything
    _write_batch(
        spark, src,
        [(6, _ts("2024-01-02 00:00:00"), 9, "click", 0.0)],
        "b3",
    )
    q = stream_sessionize(spark, src, out, ck, gap_minutes=30, watermark="2 hours")
    q.awaitTermination()

    u3 = [
        (r["session_start"].isoformat(), r["session_end"].isoformat(),
         r["n_events"], r["value_sum"])
        for r in spark.read.parquet(out).collect()
        if r["user_id"] == 3
    ]
    assert u3 == [("2024-01-01T00:00:00", "2024-01-01T00:50:00", 3, 7.0)]
