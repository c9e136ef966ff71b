"""Stable dense line numbering for line-oriented text sources.

The reference reads these formats sequentially and numbers lines with a
Python ``enumerate`` (e.g. /root/reference/blink/candidate_retrieval/
process_wiki_extractor_output.py:30-40). The prior Spark form here was
``rdd.zipWithIndex()`` + a Python ``map`` — which funnels EVERY line of
the scan through row-at-a-time Python (JVM→Python serialization, a
per-row lambda, then a re-inferred ``createDataFrame``): at a 100 TB dump
that is the 10-100× slow path this engine otherwise avoids everywhere.

This form stays entirely JVM-side. ``monotonically_increasing_id`` packs
(scan-partition index, within-partition offset) into one long whose total
order is exactly the order ``zipWithIndex`` enumerates (partition order,
then position), and ``dense_ids`` densifies it to 0..n-1 with the
two-phase range-partition + broadcast-offset pattern — no
single-partition exchange, no ``Scan ExistingRDD``, no Python anywhere in
the plan (``tests/test_sources_scale.py`` asserts both properties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blink_spark.operators.ids import dense_ids


def numbered_lines(spark: SparkSession, path: str) -> DataFrame:
    """``(line string, line_no long)`` rows in stable file-scan order."""
    raw = spark.read.text(path).select(
        F.col("value").alias("line"),
        F.monotonically_increasing_id().alias("_mid"),
    )
    return dense_ids(raw, ["_mid"], "line_no").drop("_mid")
