"""Sentence-file scan (/root/reference/blink/utils.py:15-30): plain text →
one row per sentence, either one-sentence-per-line or split with the
deterministic [.!?]-boundary splitter (the segtok stand-in)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blink_spark.functions.text import sentences
from blink_spark.sources.lines import numbered_lines


def read_sentence_file(
    spark: SparkSession, path: str, one_sentence_per_line: bool = False
) -> DataFrame:
    """(line_no, sent_idx, sentence) rows; line_no is the stable file order
    (JVM-side two-phase dense ids — no global sort, no per-row Python)."""
    df = numbered_lines(spark, path)
    if one_sentence_per_line:
        return (
            df.select("line_no", F.lit(0).alias("sent_idx"), F.trim("line").alias("sentence"))
            .filter(F.col("sentence") != "")
        )
    return df.select(
        "line_no", F.posexplode(sentences("line")).alias("sent_idx", "sentence")
    )
