"""S6 — evaluation aggregations (SURVEY.md §2.7).

- pairwise precision/recall/F1 at shared blocking key — the headline
  criterion (mirror of the reference's *normalized* accuracy, conditional on
  gold-in-candidates: /root/reference/blink/crossencoder/data_process.py:89-112
  and main_dense.py:562-577)
- recall@k curves (/root/reference/blink/main_dense.py:459-477)
- blocking recall (candidate-gen recall,
  /root/reference/blink/candidate_retrieval/evaluator.py:16-90)
- macro vs micro accuracy (/root/reference/blink/crossencoder/
  train_cross.py:104-127)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pairwise_f1(
    gold_pairs: DataFrame, clusters: DataFrame
) -> DataFrame:
    """gold_pairs(mention_id_a, mention_id_b, same_entity, block_key) ×
    clusters(record_id, cluster_id) → one row of TP/FP/FN/P/R/F1.

    Predicted-positive for a gold pair = both sides in the same predicted
    cluster. Restriction to shared blocking key is inherited from gold_pairs
    (it only contains intra-block pairs).
    """
    ca = clusters.select(
        F.col("record_id").alias("mention_id_a"), F.col("cluster_id").alias("cl_a")
    )
    cb = clusters.select(
        F.col("record_id").alias("mention_id_b"), F.col("cluster_id").alias("cl_b")
    )
    joined = (
        gold_pairs.join(ca, "mention_id_a", "left")
        .join(cb, "mention_id_b", "left")
        .withColumn(
            "pred",
            F.col("cl_a").isNotNull()
            & F.col("cl_b").isNotNull()
            & (F.col("cl_a") == F.col("cl_b")),
        )
    )
    agg = joined.agg(
        F.sum(F.when(F.col("pred") & F.col("same_entity"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("same_entity"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("same_entity"), 1).otherwise(0)).alias("fn"),
    )
    return agg.select(
        "tp",
        "fp",
        "fn",
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))).alias("precision"),
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))).alias("recall"),
        (
            2.0
            * F.col("tp")
            / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1))
        ).alias("f1"),
    )


def blocking_recall(gold_pairs: DataFrame, cand_pairs: DataFrame) -> DataFrame:
    """Share of gold positive pairs present in the candidate pair set."""
    cand = cand_pairs.select(
        F.col("record_id_a").alias("mention_id_a"),
        F.col("record_id_b").alias("mention_id_b"),
        F.lit(True).alias("covered"),
    ).distinct()
    return (
        gold_pairs.filter("same_entity")
        .join(cand, ["mention_id_a", "mention_id_b"], "left")
        .agg(
            F.count("*").alias("n_gold_pos"),
            F.sum(F.when(F.col("covered"), 1).otherwise(0)).alias("n_covered"),
            F.avg(F.when(F.col("covered"), 1.0).otherwise(0.0)).alias("recall"),
        )
    )


def recall_at_k(ranked: DataFrame, gold_col: str, pred_col: str,
                group_col: str, rank_col: str, ks: list[int]) -> DataFrame:
    """recall@k curve: fraction of groups whose gold appears in top-i.

    ``ranked`` has one row per (group, candidate) with a 1-based rank.
    One pass: rank-of-gold per group, then avg(rank <= k) per k.
    """
    gold_rank = (
        ranked.filter(F.col(gold_col) == F.col(pred_col))
        .groupBy(group_col)
        .agg(F.min(rank_col).alias("gold_rank"))
    )
    total = ranked.select(group_col).distinct()
    per_group = total.join(gold_rank, group_col, "left")
    return per_group.agg(
        *[
            F.round(
                F.avg(
                    F.when(
                        F.col("gold_rank").isNotNull() & (F.col("gold_rank") <= k), 1.0
                    ).otherwise(0.0)
                ),
                6,
            ).alias(f"recall_at_{k}")
            for k in ks
        ]
    )


def macro_micro_accuracy(
    preds: DataFrame, label_col: str, pred_col: str, group_col: str
) -> DataFrame:
    """Per-group (macro) and global (micro) accuracy in one result —
    grouping-sets flavor of the reference's zeshel reporting."""
    hit = F.when(F.col(label_col) == F.col(pred_col), 1.0).otherwise(0.0)
    per_world = preds.groupBy(group_col).agg(F.avg(hit).alias("acc"))
    macro = per_world.agg(F.round(F.avg("acc"), 6).alias("acc")).withColumn(
        "kind", F.lit("macro")
    )
    micro = preds.agg(F.round(F.avg(hit), 6).alias("acc")).withColumn(
        "kind", F.lit("micro")
    )
    return macro.unionByName(micro).select("kind", "acc")


def topk_per_group(
    scored: DataFrame, group_col: str, score_col: str, tiebreak_col: str, k: int
) -> DataFrame:
    """Deterministic top-k: total order (score DESC, tiebreak ASC) —
    fixes the reference's index-order tie behavior
    (/root/reference/blink/main_dense.py:253) reproducibly."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(tiebreak_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
