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
