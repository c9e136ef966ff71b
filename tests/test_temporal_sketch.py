"""Planted-fixture tests for the temporal joins (as-of, range-count), the
KMV distinct sketch, chunk-level dedup stats and the mix planner."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F


def _ts(minute: int, micro: int = 0):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(
        minutes=minute, microseconds=micro
    )


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_asof_join_planted(spark):
    from blink_spark.operators.temporal import asof_join

    clicks = _events(
        spark,
        [
            (101, 1, _ts(10)),
            (102, 1, _ts(20)),
            (103, 1, _ts(30)),
            (104, 2, _ts(1)),  # user with no purchases at all
        ],
    )
    purchases = _events(
        spark,
        [
            (201, 1, _ts(5)),
            (202, 1, _ts(20)),  # same instant as click 102: visible
            (203, 1, _ts(25)),
            (204, 1, _ts(25)),  # tie on ts: larger event_id wins
            (205, 1, _ts(40)),  # future: never matched
        ],
    )
    got = {
        r["event_id"]: (r["matched_event_id"], r["lag_us"])
        for r in asof_join(clicks, purchases, on="user_id").collect()
    }
    assert got == {
        101: (201, 5 * 60 * 1_000_000),
        102: (202, 0),
        103: (204, 5 * 60 * 1_000_000),
        104: (None, None),
    }


def test_asof_join_is_single_shuffle(spark):
    """The merge form must shuffle ONCE on the key — no join operator, no
    pair explosion — or it is not the 100 TB plan."""
    from blink_spark.operators.temporal import asof_join

    l = _events(spark, [(1, 1, _ts(1))])
    r = _events(spark, [(2, 1, _ts(0))])
    plan = asof_join(l, r, on="user_id")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan


def test_window_range_count_boundaries(spark):
    from blink_spark.operators.temporal import window_range_count

    lb = 600  # 10 minutes
    clicks = _events(spark, [(100, 1, _ts(20))])
    views = _events(
        spark,
        [
            (1, 1, _ts(10)),            # exactly lookback old: counted
            (2, 1, _ts(10, micro=-1)),  # 1 us older: out
            (3, 1, _ts(15)),            # inside
            (4, 1, _ts(20)),            # at the probe instant: counted
            (5, 1, _ts(20, micro=1)),   # 1 us later: out
            (6, 2, _ts(19)),            # other user: out
        ],
    )
    [row] = window_range_count(clicks, views, on="user_id", lookback_s=lb).collect()
    assert (row["event_id"], row["n_in_window"]) == (100, 3)


def test_window_range_count_zero_when_no_right_rows(spark):
    from blink_spark.operators.temporal import window_range_count

    clicks = _events(spark, [(1, 7, _ts(0))])
    views = _events(spark, [(2, 8, _ts(0))])  # other key only
    [row] = window_range_count(clicks, views, on="user_id").collect()
    assert row["n_in_window"] == 0


def _kmv_py(values, k):
    hs = sorted(
        {int(hashlib.md5(f"kmv:{v}".encode()).hexdigest()[:8], 16) for v in values}
    )
    n = len(hs)
    if n < k:
        return n, None, n
    return n, hs[k - 1], (k - 1) * (1 << 32) // hs[k - 1]


def test_kmv_matches_pure_python(spark):
    from blink_spark.operators.sketch import kmv_distinct

    small = [("a", i) for i in range(3)]          # 3 < k: sketch exact
    big = [("b", i * 13 + 7) for i in range(200)]  # 200 distinct, duplicated rows
    df = spark.createDataFrame(small + big + big, "grp string, uid long")
    got = {
        r["grp"]: (r["n_exact"], r["kth_hash"], r["est_distinct"])
        for r in kmv_distinct(df, key_col="uid", group_col="grp", k=8).collect()
    }
    assert got["a"] == _kmv_py(range(3), 8)
    assert got["b"] == _kmv_py([i * 13 + 7 for i in range(200)], 8)


def test_kmv_estimate_in_error_band(spark):
    """k=64 on 5000 distinct keys: the KMV relative error is ~1/sqrt(k-2);
    assert a generous 4-sigma band so the test is deterministic-but-honest."""
    from blink_spark.operators.sketch import kmv_distinct

    df = spark.range(5000).select(
        F.lit("g").alias("grp"), F.col("id").alias("uid")
    )
    [row] = kmv_distinct(df, key_col="uid", group_col="grp", k=64).collect()
    assert row["n_exact"] == 5000
    assert abs(row["est_distinct"] - 5000) / 5000 < 4 / (62**0.5)


def test_chunk_dedup_stats_planted(spark):
    from blink_spark.operators.corpus import chunk_dedup_stats

    block_a = " ".join(f"a{i}" for i in range(16))
    block_b = " ".join(f"b{i}" for i in range(16))
    docs = spark.createDataFrame(
        [
            (1, f"{block_a} {block_b}"),   # first occurrence of both chunks
            (2, f"{block_a} {block_b}"),   # exact dup: 2/2 chunks duplicate
            (3, f"{block_a} {block_a}"),   # one cross-doc dup + one self dup
            (4, " ".join(f"u{i}" for i in range(20))),  # unique, ragged tail
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_dup_chunks"], r["dup_chunk_frac"])
        for r in chunk_dedup_stats(docs, size=16).collect()
    }
    assert got == {
        1: (2, 0, 0.0),
        2: (2, 2, 1.0),
        3: (2, 2, 1.0),
        4: (2, 0, 0.0),
    }


def test_mix_plan_planted(spark):
    from blink_spark.operators.corpus import mix_plan

    # stratum "big": 4 docs x 5 tokens = 20 tokens; "tiny": 1 doc x 2 tokens.
    rows = [(i, "w x y z q", "big") for i in range(4)] + [(9, "a b", "tiny")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["stratum"]: (r["n_docs"], r["n_toks"], r["rate_ppm"], r["exp_toks"])
        for r in mix_plan(docs, budget_tokens=20).collect()
    }
    # budget 20 over 2 strata = 10 tokens each:
    # big: 10*1e6 div 20 = 500_000 ppm -> 20*0.5 = 10 tokens expected
    # tiny: 10*1e6 div 2 = 5e6 -> capped at 1e6 -> keeps all 2 tokens
    assert got == {"big": (4, 20, 500_000, 10), "tiny": (1, 2, 1_000_000, 2)}
