"""S4 — vectorized pairwise scoring (the crossencoder stage).

Candidate pairs + both surface forms → feature columns + blended score +
match decision. Everything except Jaro-Winkler is a JVM Column expression
(whole-stage codegen); Jaro-Winkler and embeddings are Arrow-batched pandas
UDFs (no per-row Python, per BASELINE.json input_hint).

Reference analogue: /root/reference/blink/crossencoder/crossencoder.py:135-144
(joint pair logit) + /root/reference/blink/main_dense.py:541-560 (argmax →
prediction); here the decision is a calibrated threshold rule and the full
feature vector is kept for metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blink_spark.functions.similarity import (
    JACCARD_THRESHOLD,
    cosine,
    lev_ratio,
    lev_within,
    pair_score,
    token_jaccard,
)
from blink_spark.functions.text import normalize_text


def score_pairs(
    pairs_attrs: DataFrame,
    text_a: str = "text_a",
    text_b: str = "text_b",
    emb_a: str | None = None,
    emb_b: str | None = None,
    features: str = "full",
) -> DataFrame:
    """Add feature + decision columns to a pairs-with-attributes frame.

    ``features='full'``  — exact lev_ratio + Jaro-Winkler + blended score
                           (short strings: mentions, titles).
    ``features='cheap'`` — Jaccard + banded Levenshtein decision only
                           (long texts: document dedup). O(n·k) per pair,
                           no Python in the plan.
    The match decision is identical in both modes (banded levenshtein is
    integer-exact equivalent of the ratio threshold).
    """
    out = pairs_attrs.withColumn(
        "norm_eq", normalize_text(text_a) == normalize_text(text_b)
    ).withColumn("jaccard", F.round(token_jaccard(text_a, text_b), 6))
    if features == "full":
        out = out.withColumn("lev_ratio", F.round(lev_ratio(text_a, text_b), 6))
    if emb_a and emb_b:
        out = out.withColumn("emb_cos", F.round(cosine(emb_a, emb_b), 6))
    out = out.withColumn(
        "is_match",
        F.col("norm_eq")
        | (F.col("jaccard") >= F.lit(JACCARD_THRESHOLD))
        | lev_within(text_a, text_b),
    )
    if features == "full":
        out = out.withColumn("score", pair_score(text_a, text_b, emb_a, emb_b))
    else:
        out = out.withColumn(
            "score",
            F.round(
                F.when(F.col("norm_eq"), F.lit(1.0)).otherwise(F.col("jaccard")), 6
            ),
        )
    return out


def match_edges(scored: DataFrame) -> DataFrame:
    """Thresholded scored pairs → undirected edge list for clustering."""
    return scored.filter(F.col("is_match")).select(
        F.col("record_id_a").alias("src"), F.col("record_id_b").alias("dst")
    )
