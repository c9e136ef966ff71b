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
    return partitioned_running_sums(df, order_col, {out_col: value_col})


def partitioned_running_sums(
    df: DataFrame, order_col: str, sums: dict[str, str]
) -> DataFrame:
    """Several global running sums sharing one order column and ONE range
    shuffle — ``sums`` maps each output column to its value column. Same
    two-phase form as ``partitioned_running_sum`` (which delegates here):
    N separate calls would range-shuffle and persist the table N times for
    identical partitioning; this collects one per-partition partial ROW
    (all the sums) and broadcasts one prefix table.
    """
    spark = df.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 2)
    part = (
        df.repartitionByRange(n_parts, F.col(order_col).asc())
        .withColumn("_pid", F.spark_partition_id())
        .persist()  # see dense_ids: pins pids; bounded cache, evicts LRU
    )
    outs = list(sums)
    partials = {
        r["_pid"]: r
        for r in part.groupBy("_pid")
        .agg(
            *[
                F.coalesce(F.sum(v), F.lit(0)).alias(f"_s_{o}")
                for o, v in sums.items()
            ]
        )
        .collect()
    }
    prefix, acc = [], {o: 0 for o in outs}
    for pid in sorted(partials):
        prefix.append((pid, *[acc[o] for o in outs]))
        for o in outs:
            acc[o] += partials[pid][f"_s_{o}"]
    pre_df = spark.createDataFrame(
        prefix, "_pid int, " + ", ".join(f"_p_{o} long" for o in outs)
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = part.join(F.broadcast(pre_df), "_pid")
    for o, v in sums.items():
        out = out.withColumn(o, F.col(f"_p_{o}") + F.sum(v).over(w))
    return out.drop("_pid", *[f"_p_{o}" for o in outs])
