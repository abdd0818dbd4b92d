"""Structured Streaming operators over the events stream: watermarked
windowed aggregation (late-data handling) and a gap-based sessionizer as
a custom stateful operator (applyInPandasWithState).

The reference engine is batch-only (SURVEY.md §2.8) — these cover the
streaming half of the relational checklist with Spark's native machinery:
- `stream_windowed_counts`: readStream → withWatermark → window agg →
  append sink. A window emits exactly once, when the watermark passes its
  end; events later than the watermark are DROPPED (the late-data rule).
- `stream_sessionize`: per-user gap sessions via applyInPandasWithState
  with event-time timeout — state (start, last_ts, n, value_sum) lives in
  the state store, sessions emit when the watermark passes last_ts + gap.

Both are file-source driven and tested with availableNow restarts against
the same checkpoint, which is exactly how a production backfill resumes:
the watermark persists in the checkpoint, so batch N+1 sees batch N's
event-time high-water mark.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def read_event_stream(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source event stream (one file per micro-batch in tests; at
    scale a cloud-files / kafka source with the same schema)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def windowed_counts(stream: DataFrame, watermark: str = "2 hours", window: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window counts per event_type. Append output:
    a row appears exactly once, when the watermark closes its window."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").cast("long").alias("n"), F.sum("value").alias("v"))
        .select(
            F.col("w.start").alias("w_start"),
            "event_type",
            "n",
            F.round("v", 4).alias("v"),
        )
    )


def stream_windowed_counts(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    window: str = "1 hour",
):
    """Run the watermarked window agg over everything currently in
    src_dir (availableNow) into a parquet append sink. Returns the
    StreamingQuery; the caller awaits termination. Restarting with the
    same checkpoint continues the watermark from where it stopped."""
    agg = windowed_counts(read_event_stream(spark, src_dir), watermark, window)
    return (
        agg.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)

SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)


def _session_fn(gap_minutes: int):
    gap_ns = gap_minutes * 60 * 1_000_000_000

    def fn(key, pdfs, state):
        # state holds NANOSECOND epochs (pandas datetime64[ns] native);
        # setTimeoutTimestamp takes epoch MILLIS
        import numpy as np

        user_id = key[0]
        if state.hasTimedOut:
            start_ns, last_ns, n, v = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_ns)],
                    "session_end": [pd.Timestamp(last_ns)],
                    "n_events": [n],
                    "value_sum": [v],
                }
            )
            return
        rows = pd.concat(list(pdfs)).sort_values("ts", kind="mergesort")
        ts_ns = rows["ts"].astype("int64").to_numpy()
        vals = rows["value"].to_numpy(dtype=float)
        # split THIS batch's sorted timestamps on gaps > gap_ns: a single
        # micro-batch (availableNow backfill, multi-hour file) can carry
        # several distinct sessions for one user
        cuts = np.flatnonzero(np.diff(ts_ns) > gap_ns) + 1
        bounds = np.concatenate(([0], cuts, [len(ts_ns)]))
        segs = [
            (
                int(ts_ns[a]),
                int(ts_ns[b - 1]),
                int(b - a),
                float(vals[a:b].sum()),
            )
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        if state.exists:
            segs.append(tuple(state.get))
            segs.sort(key=lambda s: s[0])
        # merge adjacent segments whose gap closed (the stored session can
        # bridge into — or be bridged by — the batch's segments)
        merged = [segs[0]]
        for s in segs[1:]:
            p = merged[-1]
            if s[0] - p[1] <= gap_ns:
                merged[-1] = (p[0], max(p[1], s[1]), p[2] + s[2], p[3] + s[3])
            else:
                merged.append(s)
        # every segment but the trailing one is CLOSED (a later event this
        # batch proved the gap elapsed) — emit now; keep only the tail
        out = [(user_id, *s) for s in merged[:-1]]
        start_ns, last_ns, n, v = merged[-1]
        state.update((start_ns, last_ns, n, v))
        # emit when the WATERMARK passes last_ts + gap (event-time timeout)
        state.setTimeoutTimestamp(last_ns // 1_000_000 + gap_ns // 1_000_000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1]) for o in out],
                    "session_end": [pd.Timestamp(o[2]) for o in out],
                    "n_events": [o[3] for o in out],
                    "value_sum": [o[4] for o in out],
                }
            )

    return fn


def sessionize(stream: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessions per user as a custom stateful operator
    (applyInPandasWithState, event-time timeout): a session closes when
    the event-time watermark passes last_event + gap, or eagerly when a
    later batch opens a new session for the same user."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_minutes),
            outputStructType=SESSION_OUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def stream_sessionize(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
):
    """availableNow run of the sessionizer into a parquet append sink."""
    out = sessionize(read_event_stream(spark, src_dir), gap_minutes, watermark)
    return (
        out.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
