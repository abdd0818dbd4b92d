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


# parallel arrays, one entry per OPEN gap-island. Holding EVERY island
# (not just the trailing one) is what makes emission watermark-correct:
# an island only emits once the watermark proves no in-watermark late
# event can still bridge into it, so a late-but-valid event that lands
# between two open islands merges them instead of splitting a true
# session across already-emitted output (append sinks can't retract).
SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.ArrayType(T.LongType())),
        T.StructField("last_us", T.ArrayType(T.LongType())),
        T.StructField("n", T.ArrayType(T.LongType())),
        T.StructField("v", T.ArrayType(T.DoubleType())),
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
    gap_ms = gap_minutes * 60 * 1_000

    def emit_df(user_id, islands):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(islands),
                "session_start": [pd.Timestamp(s[0]) for s in islands],
                "session_end": [pd.Timestamp(s[1]) for s in islands],
                "n_events": [s[2] for s in islands],
                "value_sum": [s[3] for s in islands],
            }
        )

    def split_emit(islands, wm_ms):
        """Partition open islands into (provably closed, still open): an
        island is closed once the watermark strictly passes end + gap —
        no event the watermark still admits can bridge into it."""
        closed = [s for s in islands if s[1] // 1_000_000 + gap_ms < wm_ms]
        kept = [s for s in islands if s[1] // 1_000_000 + gap_ms >= wm_ms]
        return closed, kept

    def save(state, kept, wm_ms):
        if not kept:
            state.remove()
            return
        state.update(tuple([list(col) for col in zip(*kept)]))
        # re-arm for the earliest still-open island; the timestamp must
        # be strictly past the current watermark
        ts = min(s[1] // 1_000_000 + gap_ms for s in kept)
        state.setTimeoutTimestamp(max(ts, wm_ms + 1))

    def fn(key, pdfs, state):
        # state holds NANOSECOND epochs (pandas datetime64[ns] native);
        # setTimeoutTimestamp / getCurrentWatermarkMs are epoch MILLIS
        import numpy as np

        user_id = key[0]
        wm_ms = state.getCurrentWatermarkMs()
        if state.hasTimedOut:
            starts, lasts, ns, vs = state.get
            islands = sorted(zip(starts, lasts, ns, vs))
            closed, kept = split_emit(islands, wm_ms)
            save(state, kept, wm_ms)
            if closed:
                yield emit_df(user_id, closed)
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
            starts, lasts, ns, vs = state.get
            segs.extend(
                (int(a), int(b), int(c), float(d))
                for a, b, c, d in zip(starts, lasts, ns, vs)
            )
            segs.sort(key=lambda s: s[0])
        # merge adjacent segments whose gap closed (stored islands can
        # bridge into — or be bridged by — the batch's segments, in
        # either time direction)
        merged = [segs[0]]
        for s in segs[1:]:
            p = merged[-1]
            if s[0] - p[1] <= gap_ns:
                merged[-1] = (p[0], max(p[1], s[1]), p[2] + s[2], p[3] + s[3])
            else:
                merged.append(s)
        # emit ONLY islands the watermark has provably closed; every other
        # island stays open in state until its event-time timeout — an
        # in-watermark late event in a later batch may still bridge them
        closed, kept = split_emit(merged, wm_ms)
        save(state, kept, wm_ms)
        if closed:
            yield emit_df(user_id, closed)

    return fn


def sessionize(stream: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours") -> DataFrame:
    """Gap-based sessions per user as a custom stateful operator
    (applyInPandasWithState, event-time timeout): a session closes
    exactly when the event-time watermark passes last_event + gap —
    never earlier, so in-watermark late events can still merge open
    islands (append output is emit-once and cannot retract)."""
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
