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
- Unlike the record stores (which can be rebuilt from retained records), a
  lost register store is unrecoverable — so the refresh goes through the
  two-generation write-aside-then-swap in ``streaming/stores.py`` instead of
  a bare ``mode("overwrite")``: at every crash point a complete generation
  survives on disk and the reader falls back to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blink_spark.operators.sketch import hll_registers
from blink_spark.streaming.stores import commit_store, resolve_store


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
    cur = resolve_store(store_path)
    if cur is not None:
        old = spark.read.parquet(cur)
        merged = (
            batch_regs.unionByName(old)
            .groupBy(group_col, "j")
            .agg(F.max("mj").cast("int").alias("mj"))
        )
    else:
        merged = batch_regs
    new_dir = store_path + ".new"
    merged.write.mode("overwrite").parquet(new_dir)
    commit_store(new_dir, store_path)
