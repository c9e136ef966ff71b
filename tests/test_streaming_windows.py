"""Event-time streaming: watermark drops late data; windows finalize in
append mode; the stateful first-seen operator suppresses cross-batch
duplicates with bounded state."""

from __future__ import annotations

import os

import pandas as pd


def _write_batch(dir_path, name, rows, schema_cols):
    # pandas emits nanosecond timestamps; Spark's 'timestamp' is micros
    pd.DataFrame(rows, columns=schema_cols).to_parquet(
        os.path.join(dir_path, name), index=False,
        coerce_timestamps="us", allow_truncated_timestamps=True,
    )


def test_watermarked_window_counts_drop_late_rows(spark, tmp_path):
    from blink_spark.streaming.windows import windowed_doc_rates

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    cols = ["doc_id", "event_time"]
    t0 = pd.Timestamp("2026-01-01 10:00:00")

    def ts(minutes):
        return t0 + pd.Timedelta(minutes=minutes)

    out_dir = str(tmp_path / "emitted")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.schema("doc_id string, event_time timestamp")
            .parquet(str(in_dir))
        )
        agg = windowed_doc_rates(stream, window="10 minutes", watermark="30 minutes")

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

    # run 1: docs in [10:00,10:10) and [10:10,10:20) plus a 12:00 row that
    # advances the watermark to 11:30 — both early windows finalize
    _write_batch(in_dir, "b1.parquet",
                 [("a", ts(1)), ("b", ts(2)), ("c", ts(9)), ("d", ts(11)),
                  ("e", ts(120))], cols)
    run_once()
    # run 2 (same checkpoint → watermark persisted at 11:30): a row back in
    # [10:00,10:10) is now LATE past the watermark and must be dropped
    _write_batch(in_dir, "b3.parquet",
                 [("late", ts(3)), ("f", ts(125))], cols)
    run_once()

    rows = {
        (r.window_start.minute, r.n_docs)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert (0, 3) in rows   # late row dropped, count stays 3
    assert (10, 1) in rows
    assert all(n != 4 for _, n in rows)  # the late row never counted anywhere


def test_stream_first_seen_suppresses_cross_batch_duplicates(spark, tmp_path):
    from blink_spark.streaming.windows import stream_first_seen

    in_dir = tmp_path / "in2"
    in_dir.mkdir()
    cols = ["fp", "doc_id"]
    _write_batch(in_dir, "b1.parquet",
                 [("f1", "d2"), ("f1", "d1"), ("f2", "d3")], cols)
    _write_batch(in_dir, "b2.parquet",
                 [("f1", "d9"), ("f3", "d4")], cols)

    stream = (
        spark.readStream.schema("fp string, doc_id string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    out = stream_first_seen(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {(r.fp, r.doc_id) for r in spark.sql("SELECT * FROM first_seen").collect()}
    # f1 emitted once with the min id of its FIRST batch; the batch-2 f1
    # duplicate is suppressed by state
    assert got == {("f1", "d1"), ("f2", "d3"), ("f3", "d4")}


def test_sliding_burst_windows_finalize_and_count(spark, tmp_path):
    from blink_spark.streaming.windows import streaming_burst_rates

    in_dir = tmp_path / "in_burst"
    in_dir.mkdir()
    cols = ["user_id", "event_time"]
    t0 = pd.Timestamp("2026-01-01 10:00:00")

    def ts(seconds):
        return t0 + pd.Timedelta(seconds=seconds)

    out_dir = str(tmp_path / "burst_out")
    ckpt = str(tmp_path / "burst_ckpt")

    def run_once():
        stream = (
            spark.readStream.schema("user_id long, event_time timestamp")
            .parquet(str(in_dir))
        )
        agg = streaming_burst_rates(
            stream, window="60 seconds", slide="20 seconds", watermark="2 minutes"
        )

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

    # user 1 bursts: 5 events inside 50s; user 2 is slow (2 events, 100s
    # apart); a far-future row advances the watermark so windows finalize.
    _write_batch(
        in_dir,
        "b1.parquet",
        [(1, ts(0)), (1, ts(20)), (1, ts(35)), (1, ts(45)), (1, ts(50)),
         (2, ts(0)), (2, ts(100)), (9, ts(3600))],
        cols,
    )
    run_once()
    out = spark.read.parquet(out_dir).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["key"], []).append(r["n_events"])
    # the [09:59:20,10:00:20+40) sliding grid: window starting 10:00:00
    # holds all 5 of user 1's events (0..50s)
    assert max(by_user[1]) == 5
    assert max(by_user[2]) == 1
    # every event lands in exactly 3 overlapping 60s/20s windows
    assert sum(by_user[1]) == 5 * 3
