"""Distributed deterministic id assignment and prefix sums.

The reference assigns dense local ids with a mutable counter
(/root/reference/blink/main_dense.py:138-143) and sessionizes token streams
with a sequential scan (/root/reference/blink/candidate_retrieval/
dataset.py:73-110). The naive Spark translations — ``row_number() OVER
(ORDER BY ...)`` with no partition, or a running sum over a global order —
funnel the ENTIRE dataset through one task (Exchange SinglePartition): the
clearest 100×-scale killer pattern. Both operators here are the classic
two-phase form instead:

  phase 1: a tiny per-partition aggregate (counts / partial sums) collected
           to the driver — O(#partitions) rows;
  phase 2: a per-partition window + the broadcast offset of every earlier
           partition.

No single-partition exchange anywhere; every pass is fully parallel.
``tests/test_sources_scale.py`` asserts the plans stay that way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_ids(
    df: DataFrame, sort_cols: list, id_col: str = "dense_id"
) -> DataFrame:
    """Assign ``row_number() - 1`` over a TOTAL order of ``sort_cols``
    without a global single-task sort.

    Range-partition by the sort key (partition i holds keys strictly below
    partition i+1), count per partition, cumulate the tiny count table on
    the driver, then id = partition offset + (local rank - 1). Identical
    output to the global window for any total order; fully parallel.
    """
    spark = df.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 2)
    ordered = (
        df.repartitionByRange(n_parts, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
        # pin partition ids across the two passes. NB the cache must stay
        # alive until the caller consumes the result (unpersisting forces a
        # recompute that could re-sample range boundaries); it is the input
        # itself — bounded — and evicts LRU.
        .persist()
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ordered.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    # broadcast-join the tiny offset table (one row per partition) — a
    # when()-chain expression would grow the plan linearly in #partitions
    off_df = spark.createDataFrame(offsets, "_pid int, _offset long")
    w = Window.partitionBy("_pid").orderBy(*sort_cols)
    out = (
        ordered.join(F.broadcast(off_df), "_pid")
        .withColumn(id_col, F.col("_offset") + F.row_number().over(w) - 1)
        .drop("_pid", "_offset")
    )
    return out


def partitioned_running_sum(
    df: DataFrame, order_col: str, value_col: str, out_col: str
) -> DataFrame:
    """Global running sum of ``value_col`` in ``order_col`` order (the
    sessionization primitive) without a global single-task window.

    Range-partition on ``order_col`` (partition i holds strictly earlier
    rows than partition i+1 — a parallel shuffle, not a funnel), then
    phase 1 collects one partial sum per partition and phase 2 adds the
    within-partition running sum to the broadcast prefix of earlier
    partitions.
    """
    spark = df.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 2)
    part = (
        df.repartitionByRange(n_parts, F.col(order_col).asc())
        .withColumn("_pid", F.spark_partition_id())
        .persist()  # see dense_ids: pins pids; bounded cache, evicts LRU
    )
    partials = {
        r["_pid"]: r["s"]
        for r in part.groupBy("_pid")
        .agg(F.coalesce(F.sum(value_col), F.lit(0)).alias("s"))
        .collect()
    }
    prefix, acc = [], 0
    for pid in sorted(partials):
        prefix.append((pid, acc))
        acc += partials[pid]
    pre_df = spark.createDataFrame(prefix, "_pid int, _prefix long")
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        part.join(F.broadcast(pre_df), "_pid")
        .withColumn(out_col, F.col("_prefix") + F.sum(value_col).over(w))
        .drop("_pid", "_prefix")
    )
