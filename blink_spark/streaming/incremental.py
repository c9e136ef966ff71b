"""Incremental re-linking of newly arriving documents.

``readStream`` over a documents directory → per micro-batch (foreachBatch):
extract mentions, block them, pair them against BOTH the batch and the
existing mention store, score, and append new match edges; clusters are
refreshed by re-running connected components over the accumulated edge set
(CC is cheap relative to pair scoring, and re-clustering keeps min-id
determinism — an incremental union-find would make cluster ids
order-dependent).

This mirrors how the reference would be deployed incrementally: its caches
(entity encodings, candidate pools) are reused across runs
(/root/reference/blink/biencoder/eval_biencoder.py:169-201); here the stage
tables are the cache.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blink_spark import schemas
from blink_spark.operators.blocking import df_aware_blocks
from blink_spark.operators.cluster import assign_clusters
from blink_spark.operators.extract import extract_mentions
from blink_spark.operators.pairs import candidate_pairs, pairs_with_attrs
from blink_spark.operators.scoring import (
    match_edges,
    prepare_records,
    score_pairs_cascade,
)


def _link_batch(spark: SparkSession, batch_docs: DataFrame, store_dir: str) -> None:
    """One micro-batch: link new docs against the accumulated store."""
    os.makedirs(store_dir, exist_ok=True)
    new_mentions = extract_mentions(batch_docs)

    p_mentions = os.path.join(store_dir, "mentions")
    if os.path.exists(os.path.join(p_mentions, "_SUCCESS")):
        old_mentions = spark.read.parquet(p_mentions)
        all_mentions = old_mentions.unionByName(new_mentions).dropDuplicates(
            ["mention_id"]
        )
    else:
        all_mentions = new_mentions
    all_mentions = all_mentions.localCheckpoint()

    # block over the union — df-aware keys need corpus frequencies, and the
    # frequencies legitimately shift as the corpus grows
    blocks, _ = df_aware_blocks(all_mentions, "mention_id", "mention")
    new_ids = new_mentions.select(F.col("mention_id").alias("record_id"))
    pairs, _ = candidate_pairs(blocks)
    # keep only pairs touching the new batch: old-old pairs are already in
    # the edge store
    touching_new = pairs.join(
        new_ids.withColumnRenamed("record_id", "record_id_a"), "record_id_a", "left_semi"
    ).unionByName(
        pairs.join(
            new_ids.withColumnRenamed("record_id", "record_id_b"),
            "record_id_b",
            "left_semi",
        )
    ).distinct()

    prep = prepare_records(all_mentions, "mention_id", "mention", with_emb=True)
    attrs = pairs_with_attrs(touching_new, prep, "record_id", ["norm", "toks", "emb"])
    edges = match_edges(score_pairs_cascade(attrs, with_emb=True))

    p_edges = os.path.join(store_dir, "edges")
    edges.write.mode("append").parquet(p_edges)
    all_edges = spark.read.parquet(p_edges)

    clusters = assign_clusters(all_mentions, "mention_id", all_edges)
    clusters.write.mode("overwrite").parquet(os.path.join(store_dir, "clusters_tmp"))
    # atomic-ish swap
    final = os.path.join(store_dir, "clusters")
    spark.read.parquet(os.path.join(store_dir, "clusters_tmp")).write.mode(
        "overwrite"
    ).parquet(final)

    all_mentions.write.mode("overwrite").parquet(p_mentions + "_tmp")
    spark.read.parquet(p_mentions + "_tmp").write.mode("overwrite").parquet(p_mentions)


def incremental_link_stream(
    spark: SparkSession, input_dir: str, store_dir: str, checkpoint_dir: str
):
    """readStream(file source) → foreachBatch(_link_batch). Returns the
    StreamingQuery (caller awaits/stops)."""
    stream = (
        spark.readStream.schema(schemas.DOCUMENTS_PARQUET)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        _link_batch(spark, batch_df, store_dir)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
