"""Streaming temporal operators: event-time session windows (append-mode
finalization via watermark) and the stream-stream interval join."""

from __future__ import annotations

import os

import pandas as pd


def _write(dir_path, name, rows):
    pd.DataFrame(rows, columns=["event_id", "user_id", "event_time"]).to_parquet(
        os.path.join(dir_path, name), index=False,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )


def _t(hhmm: str):
    return pd.Timestamp(f"2026-01-01 {hhmm}:00")


def test_streaming_sessionize_finalizes_on_watermark(spark, tmp_path):
    from blink_spark.streaming.windows import streaming_sessionize

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.schema(
                "event_id long, user_id long, event_time timestamp"
            ).parquet(str(in_dir))
        )
        agg = streaming_sessionize(stream, gap="30 minutes", watermark="30 minutes")

        def sink(batch_df, batch_id):
            if not batch_df.isEmpty():
                batch_df.write.mode("append").parquet(out_dir)

        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # user 1: three events 10 minutes apart (one session under the 30m gap),
    # then an isolated noon event (second session); user 99 advances the
    # watermark far past both session ends
    _write(in_dir, "b1.parquet", [
        (1, 1, _t("10:00")), (2, 1, _t("10:10")), (3, 1, _t("10:20")),
        (4, 1, _t("12:00")),
        (90, 99, _t("20:00")),
    ])
    run_once()
    # second run (same checkpoint -> persisted watermark) pushes the
    # watermark again so run-1 sessions finalize in append mode
    _write(in_dir, "b2.parquet", [(91, 99, _t("23:00"))])
    run_once()

    got = {
        (r.user_id, r.session_start.strftime("%H:%M"),
         r.session_end.strftime("%H:%M"), r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert (1, "10:00", "10:50", 3) in got   # 3 events merged, end = last + gap
    assert (1, "12:00", "12:30", 1) in got
    # the 23:00 advancer's own session is still open: never emitted
    assert all(not (u == 99 and s == "23:00") for (u, s, _, _) in got)


def test_stream_interval_join_matches_closed_window(spark, tmp_path):
    from blink_spark.streaming.windows import stream_interval_join

    l_dir = tmp_path / "clicks"
    r_dir = tmp_path / "purchases"
    l_dir.mkdir()
    r_dir.mkdir()
    out_dir = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt2")

    _write(l_dir, "b1.parquet", [(101, 1, _t("10:00")), (102, 1, _t("10:30"))])
    _write(r_dir, "b1.parquet", [
        (201, 1, _t("09:40")),   # within 1h of both clicks
        (202, 1, _t("10:15")),   # within 1h of click 102 only (after 101)
        (203, 1, _t("11:50")),   # after both clicks: matches nothing
        (204, 2, _t("10:00")),   # other user: matches nothing
    ])

    schema = "event_id long, user_id long, event_time timestamp"
    joined = stream_interval_join(
        spark.readStream.schema(schema).parquet(str(l_dir)),
        spark.readStream.schema(schema).parquet(str(r_dir)),
        lookback_s=3600,
    )

    def sink(batch_df, batch_id):
        if not batch_df.isEmpty():
            batch_df.write.mode("append").parquet(out_dir)

    q = (
        joined.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.left_id, r.right_id, r.lag_us)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got == {
        (101, 201, 20 * 60 * 1_000_000),
        (102, 201, 50 * 60 * 1_000_000),
        (102, 202, 15 * 60 * 1_000_000),
    }
