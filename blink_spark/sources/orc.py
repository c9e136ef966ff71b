"""ORC source/sink — second columnar format next to parquet.

Reference behavior: the reference's stage tables are pickles / numpy /
jsonl (``blink/candidate_ranking/utils.py:33-60`` read_dataset +
torch.save stage artifacts); the engine-side analogue of "another columnar
stage format" is ORC, which Spark supports natively (no extra package) and
which carries the same pushdown machinery as parquet
(``spark.sql.orc.filterPushdown`` is on by default in Spark 3+/4).

Spark-first notes:
- ``write_orc`` partitions the sink by a low-cardinality column when given
  one — at 100 TB a partitioned ORC table gets partition PRUNING (the
  directory level) on top of stripe-level predicate pushdown, exactly like
  the hive-bucketed parquet stores elsewhere in this repo.
- ``read_orc`` is a plain ``spark.read.orc``; filters land in the scan
  node's ``PushedFilters`` (asserted by ``tests/test_tail_ops.py``), so a
  selective query reads a subset of stripes, not the table.
- The write→read roundtrip is value-exact for the string/long columns used
  here, so an ORC-sourced query can share a parquet-sourced DuckDB oracle
  (DuckDB reads no ORC; parity is proven through the roundtrip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    """Write ``df`` as an ORC table, optionally hive-partitioned."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC table (directory of files / hive partitions)."""
    return spark.read.orc(path)
