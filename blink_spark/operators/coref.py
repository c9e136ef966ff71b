"""Coreference candidate merging — the reference's only non-equi join
(/root/reference/blink/candidate_retrieval/dataset.py:153-187): for each
mention, find other mentions IN THE SAME DOCUMENT whose top candidate is a
person and that contain this mention as a word-bounded strict substring
(first occurrence, matching the reference's str.find), then replace the
mention's candidate distribution with the partners' distributions averaged
over the number of partners.

Spark form: a theta self-join on (same doc) AND (instr word-boundary
predicate) — the doc_id equi-key keeps the join co-partitioned; the
substring predicate filters within doc groups, so the join never goes
all-pairs across the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_bounded_substring(outer, inner) -> "F.Column":
    """First occurrence of ``inner`` in ``outer`` exists, is a strict
    substring, and sits on word boundaries (space or string edge on both
    sides) — instr arithmetic, mirroring str.find semantics."""
    pos = F.instr(outer, inner)
    before_ok = (pos == 1) | (F.substring(outer, pos - 1, 1) == " ")
    after_pos = pos + F.length(inner)
    after_ok = (after_pos == F.length(outer) + 1) | (
        F.substring(outer, after_pos, 1) == " "
    )
    return (pos > 0) & (outer != inner) & before_ok & after_ok


def coref_candidate_merge(
    mentions: DataFrame,
    candidates: DataFrame,
    person_entities: DataFrame,
    id_col: str = "mention_id",
    doc_col: str = "doc_id",
    text_col: str = "mention",
    entity_col: str = "entity_id",
    prob_col: str = "prob",
    rank_col: str = "rank",
) -> DataFrame:
    """→ (mention_id, entity_id, merged_p, n_partners): the merged candidate
    distribution for every mention that has >= 1 coref partner.

    Probabilities are summed in exact integer micro-units (round(p * 1e6))
    so the cross-partner sum is order-independent, then divided by the
    partner count — deterministic across partitionings and engines.
    """
    persons = person_entities.select(F.col(entity_col).alias("_pe"))
    top1_person = (
        candidates.filter(F.col(rank_col) == 1)
        .join(persons, F.col(entity_col) == F.col("_pe"), "left_semi")
        .select(F.col(id_col).alias("_partner_id"))
    )
    cur = mentions.select(
        F.col(id_col).alias("cur_id"),
        F.col(doc_col).alias("doc"),
        F.lower(F.col(text_col)).alias("cur_text"),
    )
    other = (
        mentions.join(top1_person, mentions[id_col] == F.col("_partner_id"), "left_semi")
        .select(
            F.col(id_col).alias("partner_id"),
            F.col(doc_col).alias("doc"),
            F.lower(F.col(text_col)).alias("partner_text"),
        )
    )
    pairs = cur.join(other, "doc").filter(
        word_bounded_substring(F.col("partner_text"), F.col("cur_text"))
    )
    # distinct partners per mention (a partner may qualify via one row only —
    # ids are unique — but keep the distinct for safety)
    partners = pairs.select("cur_id", "partner_id").distinct()
    n_partners = partners.groupBy("cur_id").agg(
        F.count("*").alias("n_partners")
    )
    cand_micro = candidates.select(
        F.col(id_col).alias("partner_id"),
        F.col(entity_col).alias("entity_id"),
        F.round(F.col(prob_col) * 1_000_000).cast("long").alias("p_micro"),
    )
    merged = (
        partners.join(cand_micro, "partner_id")
        .groupBy("cur_id", "entity_id")
        .agg(F.sum("p_micro").alias("sum_micro"))
        .join(n_partners, "cur_id")
        .select(
            F.col("cur_id").alias(id_col),
            "entity_id",
            F.round(
                F.col("sum_micro")
                / (F.col("n_partners") * F.lit(1_000_000.0)),
                6,
            ).alias("merged_p"),
            "n_partners",
        )
    )
    return merged
