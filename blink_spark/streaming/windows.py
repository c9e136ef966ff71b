"""Event-time streaming aggregations: watermarks + windowed counts, and a
custom stateful operator (applyInPandasWithState) for cross-batch streaming
dedup.

The reference is pure batch (SURVEY.md §2.10: no event-time semantics
anywhere), so these are the engine's own streaming surface per the build
brief: watermarked tumbling-window arrival stats for late data, and
first-seen fingerprint suppression — the streaming form of exact dedup,
bounded state keyed by fingerprint.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_doc_rates(
    stream: DataFrame,
    ts_col: str = "event_time",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window document arrival counts with a watermark: rows later
    than ``watermark`` behind the max seen event time are dropped; windows
    finalize (append mode) once the watermark passes their end."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_docs",
        )
    )


_FIRST_SEEN_SCHEMA = T.StructType(
    [
        T.StructField("fp", T.StringType()),
        T.StructField("doc_id", T.StringType()),
    ]
)
_STATE_SCHEMA = "seen boolean"


def _first_seen_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit the min doc_id for this fingerprint the FIRST time the
    fingerprint appears in the stream; suppress every later occurrence.
    State per key is one boolean — bounded, no growth per duplicate."""
    if state.exists:
        # already emitted: drain and suppress
        for _ in pdfs:
            pass
        return
    best = None
    for pdf in pdfs:
        m = pdf["doc_id"].min()
        best = m if best is None or m < best else best
    state.update((True,))
    yield pd.DataFrame({"fp": [key[0]], "doc_id": [best]})


def stream_first_seen(stream: DataFrame, fp_col: str = "fp") -> DataFrame:
    """Cross-batch streaming exact-dedup: one output row per fingerprint,
    ever (the min doc_id of its first batch) — applyInPandasWithState with
    per-key boolean state (the custom-stateful-operator surface)."""
    return (
        stream.groupBy(F.col(fp_col).alias("fp"))
        .applyInPandasWithState(
            _first_seen_fn,
            outputStructType=_FIRST_SEEN_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "event_time",
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time session windows in streaming: per key, rows closer than
    ``gap`` merge into one session; a session finalizes (append mode) once
    the watermark passes ``last_event + gap``. This is the streaming twin of
    the batch ``sessionize_events`` query (gap-based running-sum form) —
    same gap semantics, but here Spark's session_window state keeps only
    open sessions per key: state is bounded by concurrent activity, not
    stream lifetime."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    left_ts: str = "event_time",
    right_ts: str = "event_time",
    lookback_s: int = 3600,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each left event pairs with the same-key
    right events in its closed ``[t - lookback_s, t]`` window — the
    streaming form of ``operators/temporal.py::window_range_count``'s
    semantics, with matches enumerated instead of counted.

    Both sides carry watermarks and the join condition bounds right-ts
    relative to left-ts on BOTH ends, which is exactly what Structured
    Streaming needs to size the join state and evict rows: unbounded
    conditions would accumulate state forever. Inner join => matched pairs
    only; unmatched lefts need the outer variant, which Spark only emits
    after watermark expiry."""
    l = left.withWatermark(left_ts, watermark).select(
        F.col(on).alias("k"),
        F.col("event_id").alias("left_id"),
        F.col(left_ts).alias("lt"),
    )
    r = right.withWatermark(right_ts, watermark).select(
        F.col(on).alias("rk"),
        F.col("event_id").alias("right_id"),
        F.col(right_ts).alias("rt"),
    )
    cond = (
        (F.col("k") == F.col("rk"))
        & (F.col("rt") <= F.col("lt"))
        & (F.col("rt") >= F.col("lt") - F.expr(f"INTERVAL {lookback_s} SECOND"))
    )
    return l.join(r, cond, "inner").select(
        F.col("k").alias(on),
        "left_id",
        "right_id",
        F.expr("timestampdiff(MICROSECOND, rt, lt)").cast("long").alias("lag_us"),
    )


def streaming_burst_rates(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "event_time",
    window: str = "60 seconds",
    slide: str = "20 seconds",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-key SLIDING-window event counts — the streaming twin of the
    batch ``events_burst_score`` rate-limit readout: each event lands in
    window/slide overlapping windows, so the max per-key count approaches
    the true trailing-60s burst within one slide of alignment (the batch
    RANGE-frame form is the exact offline reference). Watermarked append
    mode: a window finalizes once the watermark passes its end — state is
    bounded by keys × open windows, the standard sliding-agg state story.
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col), F.window(F.col(ts_col), window, slide))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col).alias("key"),
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
        )
    )
