"""Deduplication family for training-data pipelines (build-brief first-class
requirement): exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding-cosine.

All variants share the engine's blocking → pair → score → cluster spine; a
dedup method is just a (blocking strategy, match predicate) pair, so each
function here composes the existing operators rather than reimplementing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blink_spark.functions.hashing import embed_text_udf, hamming64
from blink_spark.functions.similarity import cosine
from blink_spark.functions.text import fingerprint, shingles
from blink_spark.operators.cluster import assign_clusters
from blink_spark.operators.pairs import candidate_pairs, pairs_with_attrs
from blink_spark.operators.scoring import match_edges


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Bag-of-words-exact dedup: groups share the sorted-token fingerprint;
    keeper = min id (deterministic). One shuffle."""
    return (
        df.select(F.col(id_col).alias("record_id"), fingerprint(df[text_col]).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("group_size"),
            F.min("record_id").alias("keeper"),
            F.sort_array(F.collect_list("record_id")).alias("members"),
        )
    )


def _pairs_from_blocks(blocks: DataFrame, **kw) -> DataFrame:
    pairs, _ = candidate_pairs(blocks, **kw)
    return pairs


def simhash_relational(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(record_id, sh): 60-bit token SimHash via explode + 60 conditional-sum
    aggregates — the codegen-friendly form of ``functions.hashing.simhash64``
    (whose per-bit array filters are interpreted CodegenFallback HOFs).
    Identical values: majority vote over distinct-token hash bits."""
    from blink_spark.functions.hashing import _hash16
    from blink_spark.functions.text import tokens

    tok = (
        df.select(F.col(id_col).cast("string").alias("record_id"),
                  F.explode(tokens(df[text_col])).alias("tok"))
        .dropDuplicates(["record_id", "tok"])
        .withColumn("h", _hash16(F.col("tok"), 99))
    )
    aggs = [F.count("*").alias("n")] + [
        F.sum(F.shiftright("h", b).bitwiseAND(F.lit(1))).alias(f"c{b}")
        for b in range(60)
    ]
    per = tok.groupBy("record_id").agg(*aggs)
    sh = None
    for b in range(60):
        term = F.when(F.col(f"c{b}") * 2 > F.col("n"), F.lit(1 << b)).otherwise(
            F.lit(0)
        ).cast("long")
        sh = term if sh is None else sh + term
    return per.select("record_id", sh.alias("sh"))


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bands: int = 4,
    rows: int = 8,
    shingle_n: int = 7,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """MinHash-LSH near-dup clustering: band-bucket blocking, exact
    shingle-Jaccard verification, CC. The verification step makes LSH a
    candidate generator, not the decision — false band collisions are
    filtered by the true Jaccard."""
    from blink_spark.operators.blocking import minhash_blocks

    recs = df.select(
        F.col(id_col).cast("string").alias("record_id"),
        df[text_col].alias("text"),
        shingles(df[text_col], n=shingle_n).alias("sh"),
    ).persist()
    blocks = minhash_blocks(
        recs, "record_id", "text", bands=bands, rows=rows, shingle_n=shingle_n
    ).select("block_key", "record_id")
    pairs = _pairs_from_blocks(blocks)
    attrs = pairs_with_attrs(pairs, recs, "record_id", ["sh"])
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    scored = attrs.withColumn(
        "shingle_jaccard", F.round(F.when(union > 0, inter / union).otherwise(0.0), 6)
    ).withColumn("is_match", F.col("shingle_jaccard") >= jaccard_threshold)
    # assign_clusters materializes the edge set eagerly (CC localCheckpoint),
    # so both caches can be released before returning; the returned frame
    # only re-reads recs' pruned id column.
    out = assign_clusters(recs, "record_id", match_edges(scored))
    blocks.unpersist()  # candidate_pairs persisted it
    recs.unpersist()
    return out


SIMHASH_BITS = 60


def simhash_band_splits(max_hamming: int) -> list[tuple[int, int]]:
    """(offset, width) per band such that recall is GUARANTEED at the given
    radius: ``max_hamming + 1`` bands partitioning the 60 signature bits —
    by pigeonhole, any pair within hamming <= max_hamming agrees exactly on
    at least one whole band. (4 bands of 15 bits guarantee radius 3 only;
    radius 8 needs 9 bands — the round-1 default silently mixed the two.)"""
    n_bands = max_hamming + 1
    assert 1 <= n_bands <= SIMHASH_BITS
    base, extra = divmod(SIMHASH_BITS, n_bands)
    splits, off = [], 0
    for b in range(n_bands):
        width = base + (1 if b < extra else 0)
        splits.append((off, width))
        off += width
    return splits


def simhash_band_cols(sh_col, max_hamming: int):
    """One block-key Column per band: '<b>:<band bits>'."""
    return [
        F.concat(
            F.lit(f"{b}:"),
            F.shiftright(sh_col, off).bitwiseAND(F.lit((1 << width) - 1)).cast("string"),
        )
        for b, (off, width) in enumerate(simhash_band_splits(max_hamming))
    ]


def simhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup clustering: 60-bit token simhash, pigeonhole-banded
    blocking with ``max_hamming + 1`` bands (guaranteed recall at the
    verification radius — see ``simhash_band_splits``), exact hamming
    verification."""
    recs = simhash_relational(df, id_col, text_col).persist()
    banded = recs.select(
        "record_id",
        "sh",
        F.explode(F.array(*simhash_band_cols(F.col("sh"), max_hamming))).alias(
            "block_key"
        ),
    )
    blocks = banded.select("block_key", "record_id")
    pairs = _pairs_from_blocks(blocks)
    attrs = pairs_with_attrs(pairs, recs, "record_id", ["sh"])
    scored = attrs.withColumn("hamming", hamming64("sh_a", "sh_b")).withColumn(
        "is_match", F.col("hamming") <= max_hamming
    )
    out = assign_clusters(recs, "record_id", match_edges(scored))
    blocks.unpersist()  # candidate_pairs persisted it
    recs.unpersist()
    return out


def embedding_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    cosine_threshold: float = 0.95,
    n_planes: int = 12,
) -> DataFrame:
    """Embedding-cosine near-dup clustering: hashing-trick embeddings
    (Arrow-batched UDF), sign-LSH bucket blocking, exact cosine
    verification."""
    from blink_spark.functions.hashing import sign_lsh_bucket

    recs = df.select(
        F.col(id_col).cast("string").alias("record_id"),
        embed_text_udf(df[text_col]).alias("emb"),
    ).persist()
    blocks = recs.select(
        "record_id",
        F.concat(F.lit("e:"), sign_lsh_bucket("emb", n_planes=n_planes)).alias(
            "block_key"
        ),
    ).select("block_key", "record_id")
    pairs = _pairs_from_blocks(blocks)
    attrs = pairs_with_attrs(pairs, recs, "record_id", ["emb"])
    scored = attrs.withColumn(
        "cos", F.round(cosine("emb_a", "emb_b"), 6)
    ).withColumn("is_match", F.col("cos") >= cosine_threshold)
    out = assign_clusters(recs, "record_id", match_edges(scored))
    blocks.unpersist()  # candidate_pairs persisted it
    recs.unpersist()
    return out
