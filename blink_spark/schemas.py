"""Explicit StructType schemas for every table in the engine.

The reference's schemas are fixed-by-convention python dicts enforced by
KeyError (see SURVEY.md §1.3; e.g. /root/reference/blink/main_dense.py:80-95).
Here every table is declared once and enforced at write time.
"""

from __future__ import annotations

from pyspark.sql import types as T

# The flagship input (BASELINE.json input_hint): interleaved text+media docs.
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),       # 'text'|'mention'|'media'
        T.StructField("text", T.StringType(), True),        # '' for media spans
        T.StructField("media_ref", T.StringType(), True),   # 'm://<hash>' or NULL
        T.StructField("offset", T.IntegerType(), False),    # strictly increasing
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN, False), False),
    ]
)

# On-disk variant: pandas/pyarrow-written fixtures store offset as INT64 and
# file schemas must match exactly for streaming reads (batch reads infer).
SPAN_PARQUET = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.LongType(), True),
    ]
)

DOCUMENTS_PARQUET = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN_PARQUET, True), True),
    ]
)

# Entity catalogue (KB) — mirrors blink/main_dense.py:119-151 JSONL records.
ENTITIES = T.StructType(
    [
        T.StructField("entity_id", T.LongType(), False),
        T.StructField("title", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("wikipedia_id", T.LongType(), True),
        T.StructField("aliases", T.ArrayType(T.StringType()), True),
        T.StructField("num_incoming_links", T.LongType(), True),
        T.StructField("world", T.StringType(), True),
    ]
)

# Exploded gold-labeled mention records (zeshel/TAC-KBP style) — mirrors
# examples/zeshel/create_BLINK_zeshel_data.py:128-137.
MENTIONS = T.StructType(
    [
        T.StructField("mention_id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("span_idx", T.IntegerType(), False),
        T.StructField("context_left", T.StringType(), True),
        T.StructField("mention", T.StringType(), False),
        T.StructField("context_right", T.StringType(), True),
        T.StructField("world", T.StringType(), True),
        T.StructField("label_id", T.LongType(), True),
        T.StructField("label_title", T.StringType(), True),
    ]
)

GOLD_PAIRS = T.StructType(
    [
        T.StructField("mention_id_a", T.StringType(), False),
        T.StructField("mention_id_b", T.StringType(), False),
        T.StructField("same_entity", T.BooleanType(), False),
        T.StructField("block_key", T.StringType(), False),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("entity_id", T.LongType(), False),
        T.StructField("emb", T.ArrayType(T.FloatType(), False), False),
    ]
)

# Candidate pairs after blocking (S3 output).
CAND_PAIRS = T.StructType(
    [
        T.StructField("mention_id_a", T.StringType(), False),
        T.StructField("mention_id_b", T.StringType(), False),
        T.StructField("block_key", T.StringType(), False),
    ]
)

# Scored pairs (S4 output) → edges above threshold.
SCORED_PAIRS = T.StructType(
    [
        T.StructField("mention_id_a", T.StringType(), False),
        T.StructField("mention_id_b", T.StringType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

# Cluster assignment (S5 output): cluster_id = min mention_id in component.
CLUSTERS = T.StructType(
    [
        T.StructField("mention_id", T.StringType(), False),
        T.StructField("cluster_id", T.StringType(), False),
    ]
)

# Per-stage lineage/metrics row (resumability + observability, north rule).
LINEAGE = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)
