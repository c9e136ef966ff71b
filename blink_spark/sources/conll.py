"""CoNLL/AIDA token-stream scan → documents + BIO mention spans.

Reference: /root/reference/blink/candidate_retrieval/dataset.py:73-138 reads
token/tag lines, starts a new document at each ``-DOCSTART-`` marker, and
accumulates B/I tagged mention spans with a two-cursor loop. The Spark form:
tag each line with a monotonic line number, sessionize with a running sum
over the DOCSTART marker, and derive spans with window functions — no
driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_conll(spark: SparkSession, path: str) -> DataFrame:
    """CoNLL lines → (doc_id, line_no, token, tag).

    zipWithIndex gives a stable global line order (file order); the running
    sum of DOCSTART markers is the document id — the sessionization pattern
    (SURVEY.md §2.10).
    """
    from blink_spark.operators.ids import partitioned_running_sum

    lines = spark.read.text(path).rdd.zipWithIndex().map(
        lambda pair: (pair[0].value, pair[1])
    )
    df = spark.createDataFrame(lines, "line string, line_no long")
    marked = df.withColumn(
        "is_doc_start", F.when(F.col("line").startswith("-DOCSTART-"), 1).otherwise(0)
    )
    # two-phase prefix sum (ids.partitioned_running_sum) — a no-partition
    # Window.orderBy here would shuffle the entire dump into one task
    tagged = partitioned_running_sum(marked, "line_no", "is_doc_start", "doc_id")
    toks = (
        tagged.filter((F.col("is_doc_start") == 0) & (F.trim("line") != ""))
        .select(
            "doc_id",
            "line_no",
            F.split("line", r"\s+")[0].alias("token"),
            F.coalesce(F.split("line", r"\s+")[1], F.lit("O")).alias("tag"),
        )
    )
    return toks


def conll_mention_spans(tokens: DataFrame) -> DataFrame:
    """B/I tag runs → (doc_id, start_line, mention) via run-id windows:
    a new run starts at every B tag or at an I tag following O."""
    w = Window.partitionBy("doc_id").orderBy("line_no")
    runs = (
        tokens.withColumn("prev_tag", F.lag("tag").over(w))
        .withColumn(
            "run_start",
            F.when(
                F.col("tag").startswith("B")
                | (F.col("tag").startswith("I") & ~F.coalesce(
                    F.col("prev_tag").startswith("B")
                    | F.col("prev_tag").startswith("I"),
                    F.lit(False),
                )),
                1,
            ).otherwise(0),
        )
        .withColumn("run_id", F.sum("run_start").over(w))
    )
    return (
        runs.filter(F.col("tag") != "O")
        .groupBy("doc_id", "run_id")
        .agg(
            F.min("line_no").alias("start_line"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_no", "token"))),
                    lambda s: s["token"],
                ),
                " ",
            ).alias("mention"),
        )
        .drop("run_id")
    )
