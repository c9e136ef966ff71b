"""Incremental sketch maintenance over micro-batches.

An HLL register table is the textbook streaming-aggregation state: merging
a batch's registers into the store is a max per (group, register), the
store is ``m x n_groups`` rows no matter how much data has flowed through
it, and the estimate for EVERYTHING ever seen falls out of the store alone
— no key set is retained (reference analogue: the incremental linking store
in streaming/incremental.py keeps O(corpus) state because linkage needs the
records back; cardinality monitoring doesn't, which is why the sketch store
is the right tool for stream-health dashboards at 100 TB/day).

Scale notes:
- The per-batch work is the batch's own register aggregation (bounded by
  batch size) plus a merge against m x n_groups stored rows. Unlike the
  block/prep stores, this store is deliberately NOT hive-bucketed: it is
  sketch-sized (kilobytes), and partition machinery would cost more than
  rewriting it whole.
- The merged content is localCheckpoint'ed (eager) before the overwrite so
  the write plan is severed from the parquet files it is replacing — the
  same read-then-overwrite discipline as the assignment store refresh.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blink_spark.operators.sketch import hll_registers


def _exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def update_hll_register_store(
    spark: SparkSession,
    batch_df: DataFrame,
    store_path: str,
    key_col: str,
    group_col: str,
    p: int = 4,
) -> None:
    """Merge ``batch_df``'s HLL registers into the persisted register store
    at ``store_path`` (created on first batch). Idempotent in the sketch
    sense: re-merging the same batch is a no-op because max is idempotent —
    an at-least-once sink still yields the exactly-once estimate."""
    batch_regs = hll_registers(batch_df, key_col, group_col, p)
    if _exists(store_path):
        old = spark.read.parquet(store_path)
        merged = (
            batch_regs.unionByName(old)
            .groupBy(group_col, "j")
            .agg(F.max("mj").cast("int").alias("mj"))
        )
    else:
        merged = batch_regs
    merged = merged.localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(store_path)
