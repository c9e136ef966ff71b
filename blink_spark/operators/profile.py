"""Data-profiling operators — the per-column quality report every ingest
pipeline runs before trusting a new source (completeness, cardinality,
dominant value, value-distribution entropy). The reference profiles its
inputs ad hoc (row counts and per-field sanity prints during KB ingestion,
/root/reference/blink/candidate_retrieval/process_wiki_extractor_output.py);
this is the systematic relational form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: dict[str, str]) -> DataFrame:
    """One profile row per column: total rows, nulls, distinct non-null
    values, the most frequent value with its count (ties broken by MAX
    value — deterministic on both engines via lexicographic struct max),
    and the exact value-distribution entropy in integer micro-nats
    (``ln(n) − Σ c·ln(c)/n`` over non-null value counts — 0 for a
    constant column, ln(n) for a unique key; the same floor(ln·1e6)
    closed form as ``char_entropy``).

    ``cols`` maps output column names to STRING-rendered SQL expression
    strings — the caller chooses the rendering (cast dates to date, never
    render raw doubles: float-to-string differs across engines).

    Scale notes (100 TB): the wide table is unpivoted with ``stack``
    (codegen, no shuffle), then everything is two keyed partial aggs —
    (col, value) counts, then per-col finalize. No window over a value
    partition (a rank-per-column window would funnel each column's whole
    distinct-value set through one task); the top value is an O(1)
    struct-max inside the second agg. Output is |cols| rows.
    """
    n = len(cols)
    pairs = ", ".join(f"'{name}', ({expr})" for name, expr in cols.items())
    long = df.select(F.expr(f"stack({n}, {pairs}) as (col, val)"))
    vc = long.groupBy("col", "val").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    nn_struct = F.when(
        F.col("val").isNotNull(), F.struct(F.col("cnt"), F.col("val"))
    )
    p = vc.groupBy("col").agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("val").isNull(), F.col("cnt"))), F.lit(0)
        )
        .cast("long")
        .alias("n_null"),
        F.count(F.when(F.col("val").isNotNull(), F.lit(1)))
        .cast("long")
        .alias("n_distinct"),
        F.max(nn_struct).alias("_top"),
        F.sum(F.when(F.col("val").isNotNull(), F.col("cnt")))
        .cast("long")
        .alias("_n_nn"),
        F.sum(
            F.when(
                F.col("val").isNotNull(),
                F.col("cnt")
                * F.floor(F.log(F.col("cnt").cast("double")) * F.lit(1e6)).cast(
                    "long"
                ),
            )
        )
        .cast("long")
        .alias("_s_micro"),
    )
    return p.select(
        F.col("col").alias("column_name"),
        "n_rows",
        "n_null",
        "n_distinct",
        F.col("_top.val").alias("top_value"),
        F.col("_top.cnt").cast("long").alias("top_freq"),
        F.when(
            F.col("_n_nn") > 0,
            F.floor(F.log(F.col("_n_nn").cast("double")) * F.lit(1e6)).cast(
                "long"
            )
            - F.expr("_s_micro div _n_nn"),
        )
        .cast("long")
        .alias("entropy_micro"),
    )
