"""S1 — mention extraction from interleaved documents.

``documents(doc_id, spans[])`` → ``mentions(mention_id, doc_id, span_idx,
context_left, mention, context_right)``.

Spark-first re-expression of the reference's context reconstruction from
neighboring spans (/root/reference/blink/candidate_ranking/
bert_reranking.py:337-353 builds left/right context from sentence neighbors;
/root/reference/blink/main_dense.py:80-95 lowercases every field).

The spans array is **read, never rewritten** (span-sequence invariant,
SURVEY.md §1.4): outputs carry doc_id/span_idx so any span-bearing output
joins back to the untouched input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def extract_mentions(documents: DataFrame) -> DataFrame:
    """posexplode(spans) + windowed neighbor-text context.

    context_left  = nearest preceding 'text' span in offset order
    context_right = nearest following 'text' span
    Both lowercased (reference: "LOWERCASE EVERYTHING!").

    Per-doc windows shuffle on doc_id only once; at 100 TB the input is
    already hash-distributed by doc_id so this is a narrow, skew-free window
    (spans-per-doc is bounded, unlike token-level keys).
    """
    exploded = documents.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.offset").alias("offset"),
    )

    w = Window.partitionBy("doc_id").orderBy("offset")
    text_only = F.when(F.col("kind") == "text", F.col("text"))
    with_ctx = exploded.withColumn(
        "context_left",
        F.last(text_only, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).withColumn(
        "context_right",
        F.first(text_only, ignorenulls=True).over(
            w.rowsBetween(1, Window.unboundedFollowing)
        ),
    )

    return (
        with_ctx.filter(F.col("kind") == "mention")
        .select(
            F.concat(
                F.col("doc_id"), F.lit(":"), F.lpad(F.col("span_idx"), 4, "0")
            ).alias("mention_id"),
            "doc_id",
            "span_idx",
            F.lower("context_left").alias("context_left"),
            F.lower("text").alias("mention"),
            F.lower("context_right").alias("context_right"),
        )
    )


def media_spans(documents: DataFrame) -> DataFrame:
    """Companion extraction of media spans (multimodal plumbing): typed
    metadata rows pointing at opaque media refs."""
    return (
        documents.select("doc_id", F.posexplode("spans").alias("span_idx", "span"))
        .filter(F.col("span.kind") == "media")
        .select(
            "doc_id",
            "span_idx",
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.offset").alias("offset"),
        )
    )
