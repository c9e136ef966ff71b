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

    numbered_lines gives a stable dense global line order (file-scan
    order, JVM-side); the running sum of DOCSTART markers is the document
    id — the sessionization pattern (SURVEY.md §2.10).
    """
    from blink_spark.operators.ids import partitioned_running_sum
    from blink_spark.sources.lines import numbered_lines

    df = numbered_lines(spark, path)
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
            F.split("line", r"[\t\n\x0B\f\r ]+")[0].alias("token"),
            F.coalesce(F.split("line", r"[\t\n\x0B\f\r ]+")[1], F.lit("O")).alias("tag"),
        )
    )
    return toks


def read_conll_csv(spark: SparkSession, path: str) -> DataFrame:
    """CoNLL/AIDA TSV scan with candidate-list parse
    (/root/reference/blink/candidate_retrieval/dataset.py:18-69): variable
    column count (candidates are columns 7..n-2, 1-based), each candidate
    'id,prior,name...' where the name may itself contain commas; names get
    the '\"'→'%22' and ' '→'_' wiki-form rewrite; the gold column drops 2 or
    3 leading fields depending on the -1 marker. All array ops — the
    variable arity rules out a fixed-schema CSV reader."""
    lines = spark.read.text(path).filter(F.trim("value") != "")
    comps = F.split("value", "\t")
    n = F.size(comps)

    def _wiki_form(c):
        return F.regexp_replace(F.regexp_replace(c, '"', "%22"), " ", "_")

    def _cand(c):
        parts = F.split(c, ",")
        name = _wiki_form(
            F.array_join(F.slice(parts, 3, F.greatest(F.size(parts) - 2, F.lit(0))), ",")
        )
        return F.struct(
            name.alias("entity"), parts[1].cast("double").alias("prior")
        )

    gold_parts = F.split(F.element_at(comps, -1), ",")
    gold_skip = F.when(gold_parts[0] == "-1", 2).otherwise(3)
    gold_name = _wiki_form(
        F.array_join(
            F.slice(
                gold_parts,
                gold_skip + 1,
                F.greatest(F.size(gold_parts) - gold_skip, F.lit(0)),
            ),
            ",",
        )
    )
    cands = F.when(
        F.element_at(comps, 7) == "EMPTYCAND", F.array().cast("array<struct<entity:string,prior:double>>")
    ).otherwise(
        F.transform(F.slice(comps, 7, F.greatest(n - 8, F.lit(0))), _cand)
    )
    return lines.select(
        F.concat(comps[0], F.lit(" "), comps[1]).alias("doc_name"),
        comps[2].alias("mention"),
        comps[3].alias("context_left"),
        comps[4].alias("context_right"),
        cands.alias("candidates"),
        gold_name.alias("gold_entity"),
    )


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
