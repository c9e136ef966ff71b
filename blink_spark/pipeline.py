"""End-to-end staged ER pipeline with checkpointed, resumable stage tables.

Stage graph (SURVEY.md §7):

    documents ─ S1 extract ─→ mentions
    mentions  ─ S2 block   ─→ blocks        (token-pair ∪ MinHash-LSH keys)
    blocks    ─ S3 pairs   ─→ cand_pairs    (skew-aware salted self-join)
    cand_pairs─ S4 score   ─→ scored_pairs  (vectorized features + decision)
    scored    ─ S5 cluster ─→ clusters      (large-star/small-star CC)
    *         ─ S6 metrics ─→ lineage       (per-stage rows)

Every stage writes parquet and is skipped when its output already exists —
the Spark translation of the reference's "output exists → exit" guards
(/root/reference/blink/candidate_retrieval/process_wikidata.py:35-37,
enrich_data.py:27-29) and its try-load-else-compute caches
(/root/reference/blink/biencoder/eval_biencoder.py:169-201). That gives the
north rule's checkpoint resumability: kill the job after any stage and a
re-run resumes from the next one.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from blink_spark.operators.blocking import (
    df_aware_blocks,
    minhash_blocks,
    union_blocks,
)
from blink_spark.operators.cluster import assign_clusters
from blink_spark.operators.extract import extract_mentions
from blink_spark.operators.pairs import candidate_pairs, pairs_with_attrs
from blink_spark.operators.scoring import (
    match_edges,
    prepare_records,
    score_pairs_cascade,
    score_pairs_prepped_cheap,
)
from blink_spark.functions.text import normalize_text


def exact_contract(mentions: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Contract exact-duplicate normalized surfaces before pair generation.

    Mentions with identical normalized text are same-cluster by the match
    rule (norm_eq), so only one representative per distinct surface — the
    min id, which is also what makes the final min-id cluster labels come
    out identical to the uncontracted run — needs to enter blocking /
    scoring / clustering. Classic dedupe-before-match: cuts the pair table
    by the square of the duplication factor, with provably unchanged
    cluster assignments.

    Returns (record_id, norm) — one row per distinct surface.

    The shuffle is keyed by ``(xxhash64(norm), length(norm))`` — a 12-byte
    numeric composite, never the full normalized text: for whole-document
    inputs (dedup_documents_pipeline) the text is KBs per row, and
    hash-partitioning + sort-comparing on it dominates the exchange. A
    numeric key beats a hex-digest string key (round-3 A/B: the 32-char md5
    key cost ~15% end-to-end at 600k docs — string grouping keys sort/probe
    byte-wise). All norms within a (hash, length) group are identical
    (64-bit+length collision: ~n²/2^65 · P(len_eq), negligible to ~10^9
    distinct surfaces per job; beyond that, widen to two seeded hashes), so
    ``min(norm)`` recovers the surface exactly and the cluster labels are
    unchanged.
    """
    return (
        mentions.select(
            mentions[id_col].alias("mention_id"),
            normalize_text(mentions[text_col]).alias("norm"),
        )
        .withColumn("norm_h", F.xxhash64("norm"))
        .withColumn("norm_l", F.length("norm"))
        .groupBy("norm_h", "norm_l")
        .agg(
            F.min("mention_id").alias("record_id"),
            F.min("norm").alias("norm"),
        )
        .select("record_id", "norm")
    )


def expand_contracted_clusters(
    mentions: DataFrame, id_col: str, text_col: str, rep_clusters: DataFrame
) -> DataFrame:
    """Map every mention to its representative's cluster id.

    Only the numeric ``(xxhash64(norm), length(norm))`` key ever leaves the
    scan — the expansion never shuffles the text at all (the groupBy and the
    final join are both keyed by the 12-byte composite), versus two
    full-text-keyed exchanges in the naive form.
    """
    norm = normalize_text(mentions[text_col])
    with_norm = mentions.select(
        mentions[id_col].alias("record_id"),
        F.xxhash64(norm).alias("norm_h"),
        F.length(norm).alias("norm_l"),
    )
    norm_to_cluster = (
        with_norm.groupBy("norm_h", "norm_l")
        .agg(F.min("record_id").alias("rep_id"))
        .join(
            rep_clusters.withColumnRenamed("record_id", "rep_id"),
            "rep_id",
            "left",
        )
        .select(
            "norm_h", "norm_l",
            F.coalesce("cluster_id", "rep_id").alias("cluster_id"),
        )
    )
    return with_norm.join(norm_to_cluster, ["norm_h", "norm_l"]).select(
        "record_id", "cluster_id"
    )


@dataclass
class PipelineConfig:
    max_block_size: int = 64
    hard_cap: int = 4096
    n_salt: int = 8
    use_minhash: bool = True
    minhash_bands: int = 4
    # 8 rows/band: short similar-vocab strings collide far less (p ≈ j^8)
    # while true near-dups (j ≳ 0.9) still land together w.p. ~1-(1-0.43)^4
    minhash_rows: int = 8
    # char-shingle width for MinHash. 3 suits short mention strings; long
    # documents from a small vocabulary need wider shingles (7 ≈ a word
    # bigram) or their baseline shingle-Jaccard is high enough that every
    # band collides and candidate generation degenerates quadratic.
    minhash_shingle_n: int = 3
    # Row/match counts are observed DURING stage writes (Observation API —
    # zero extra scans, always on). rich_metrics additionally collects the
    # token-class and skew stats tables (small extra jobs).
    rich_metrics: bool = True
    # Jaro-Winkler (the only Python UDF in the plan) feeds only the
    # diagnostic `score` column — is_match and the clusters are identical
    # without it, so the clustering pipeline defaults it off.
    with_jw: bool = False
    # write every stage to parquet (resumable checkpoints). False = fused
    # plan: only clusters are written; intermediates persist in memory/disk
    # cache. Checkpointing costs ~2 full materializations of the pair table
    # in disk bandwidth, which does not scale with cores — on a real cluster
    # the same trade is checkpoint-to-object-store vs fused stages.
    checkpoints: bool = True
    stages: tuple[str, ...] = (
        "mentions",
        "blocks",
        "cand_pairs",
        "scored_pairs",
        "clusters",
    )
    extra: dict = field(default_factory=dict)


def _estimated_partitions(df: DataFrame) -> int:
    """Plan-side scan-parallelism estimate: Catalyst's sizeInBytes statistic
    over the session's maxPartitionBytes. Replaces df.rdd.getNumPartitions(),
    which instantiates the RDD lineage just to count — a needless analysis
    barrier under AQE. Only the 'is this input tiny relative to the cluster'
    decision rides on it, so the byte-based estimate is exactly as good:
    large inputs are never repartitioned, and mis-estimating a small input
    merely adds a cheap small-input shuffle (the intended behavior)."""
    spark = df.sparkSession
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    mpb = int(spark.conf.get("spark.sql.files.maxPartitionBytes", str(128 << 20)))
    return max(1, (size + mpb - 1) // mpb)


def _read_documents(spark: SparkSession, documents_path: str) -> DataFrame:
    """Read the input at full parallelism. Row-group splitting (see
    session.py maxPartitionBytes) usually parallelizes the scan itself; the
    explicit repartition only fires for inputs estimated to arrive in fewer
    partitions than cores (tiny or single-row-group files) — repartitioning
    an already-parallel scan would just add a full shuffle of the corpus.

    The repartition is KEYED on doc_id (not round-robin): every consumer
    (context windows in S1, per-doc span work) requires hashpartitioning on
    doc_id, so a keyed shuffle of the compact pre-explode table satisfies
    EnsureRequirements and the ~10x-larger exploded span table is never
    re-shuffled. doc_id is unique per row, so the keyed shuffle is as
    uniform as round-robin."""
    documents = spark.read.parquet(documents_path)
    par = spark.sparkContext.defaultParallelism
    if _estimated_partitions(documents) < par:
        documents = documents.repartition(par, "doc_id")
    return documents


def _stage_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage)


def _exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _write_stage(df: DataFrame, path: str, observe: dict | None = None) -> dict:
    """Write a stage table; optionally collect aggregate metrics DURING the
    write via Observation — row/match counts cost zero extra scans (the
    round-1 pipeline re-read and re-counted every stage table)."""
    if observe:
        from pyspark.sql import Observation

        obs = Observation()
        df = df.observe(obs, *[expr.alias(name) for name, expr in observe.items()])
        df.write.mode("overwrite").parquet(path)
        return dict(obs.get)
    df.write.mode("overwrite").parquet(path)
    return {}


def _partition_lineage(path: str) -> list[dict]:
    """Per-partition lineage of a written stage table: one entry per part
    file with its row count (parquet FOOTER read only — no Spark job, no
    data scan) and byte size. Each part file is one write task's output, so
    this is the per-partition record the north rule's resumability contract
    asks for; at cluster scale the same footers are what a manifest-based
    table format (Iceberg) indexes."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        full = os.path.join(path, name)
        try:
            n_rows = pq.ParquetFile(full).metadata.num_rows
        except Exception:  # non-data sidecar
            continue
        out.append({"file": name, "rows": n_rows, "bytes": os.path.getsize(full)})
    return out


def _log_lineage(out_dir: str, stage: str, metrics: dict, path: str | None = None) -> None:
    os.makedirs(out_dir, exist_ok=True)
    line = {"stage": stage, "ts": time.time(), **metrics}
    if path is not None and os.path.isdir(path):
        line["partitions"] = _partition_lineage(path)
    with open(os.path.join(out_dir, "lineage.jsonl"), "a") as f:
        f.write(json.dumps(line) + "\n")


def run_pipeline(
    spark: SparkSession,
    documents_path: str,
    out_dir: str,
    config: PipelineConfig | None = None,
    force: bool = False,
) -> DataFrame:
    """Run (or resume) the full pipeline; returns the clusters DataFrame."""
    cfg = config or PipelineConfig()
    if not cfg.checkpoints:
        return _run_pipeline_fused(spark, documents_path, out_dir, cfg)
    os.makedirs(out_dir, exist_ok=True)

    _rows_obs = {"rows": F.count(F.lit(1))}

    # S1 — extract
    p_mentions = _stage_path(out_dir, "mentions")
    if force or not _exists(p_mentions):
        documents = _read_documents(spark, documents_path)
        mentions = extract_mentions(documents)
        m = _write_stage(mentions, p_mentions, observe=_rows_obs)
        _log_lineage(out_dir, "mentions", m, p_mentions)
    mentions = spark.read.parquet(p_mentions)

    # S2a — exact contraction: one representative per distinct surface
    p_reps = _stage_path(out_dir, "reps")
    if force or not _exists(p_reps):
        m = _write_stage(
            exact_contract(mentions, "mention_id", "mention"), p_reps,
            observe=_rows_obs,
        )
        _log_lineage(out_dir, "reps", m, p_reps)
    reps = spark.read.parquet(p_reps)

    # S2b — blocking over representatives (df-aware keys ∪ MinHash-LSH)
    p_blocks = _stage_path(out_dir, "blocks")
    if force or not _exists(p_blocks):
        tb, token_stats = df_aware_blocks(
            reps,
            "record_id",
            "norm",
            rare_df=cfg.max_block_size,
            max_df=cfg.hard_cap,
            cache_freq=cfg.rich_metrics,  # stats unread ⇒ freq has 1 consumer
        )
        assignments = tb
        if cfg.use_minhash:
            mh = minhash_blocks(
                reps,
                "record_id",
                "norm",
                bands=cfg.minhash_bands,
                rows=cfg.minhash_rows,
                shingle_n=cfg.minhash_shingle_n,
            ).select("block_key", "record_id")
            assignments = union_blocks(tb, mh)
        metrics = _write_stage(
            assignments.select("block_key", "record_id"), p_blocks,
            observe=_rows_obs,
        )
        if cfg.rich_metrics:
            metrics["token_classes"] = [r.asDict() for r in token_stats.collect()]
        _log_lineage(out_dir, "blocks", metrics, p_blocks)
    blocks = spark.read.parquet(p_blocks)

    # S3 — candidate pairs (skew-aware)
    p_pairs = _stage_path(out_dir, "cand_pairs")
    if force or not _exists(p_pairs):
        pairs, skew = candidate_pairs(
            blocks,
            max_block_size=cfg.max_block_size,
            hard_cap=cfg.hard_cap,
            n_salt=cfg.n_salt,
        )
        metrics = _write_stage(pairs, p_pairs, observe=_rows_obs)
        blocks.unpersist()  # candidate_pairs persisted it; pairs are on disk
        if cfg.rich_metrics:
            metrics["skew"] = [r.asDict() for r in skew.collect()]
        _log_lineage(out_dir, "cand_pairs", metrics, p_pairs)
    pairs = spark.read.parquet(p_pairs)

    # S4 — cascade scoring with biencoder-style embeddings on the hot branch
    p_scored = _stage_path(out_dir, "scored_pairs")
    if force or not _exists(p_scored):
        prep = prepare_records(reps, "record_id", "norm", with_emb=True,
                           pre_normalized=True)
        attrs = pairs_with_attrs(pairs, prep, "record_id", ["norm", "toks", "emb", "emb_n"])
        scored = score_pairs_cascade(attrs, with_emb=True, with_jw=cfg.with_jw)
        metrics = _write_stage(
            scored.select(
                "record_id_a",
                "record_id_b",
                "jaccard",
                "lev_ratio",
                "emb_cos",
                "score",
                "is_match",
            ),
            p_scored,
            observe={
                "rows": F.count(F.lit(1)),
                "matches": F.sum(F.col("is_match").cast("long")),
            },
        )
        _log_lineage(out_dir, "scored_pairs", metrics, p_scored)
    scored = spark.read.parquet(p_scored)

    # S5 — clustering over representatives, expanded back to all mentions
    p_clusters = _stage_path(out_dir, "clusters")
    if force or not _exists(p_clusters):
        edges = match_edges(scored)
        rep_clusters = assign_clusters(reps, "record_id", edges,
                                   assume_unique=True, edges_canonical=True)
        clusters = expand_contracted_clusters(
            mentions, "mention_id", "mention", rep_clusters
        )
        metrics = _write_stage(
            clusters, p_clusters,
            observe={
                "rows": F.count(F.lit(1)),
                # observed during the write (no second scan); approximate by
                # construction — the exact distinct needs its own aggregate
                "n_clusters_approx": F.approx_count_distinct("cluster_id"),
            },
        )
        _log_lineage(out_dir, "clusters", metrics, p_clusters)
    return spark.read.parquet(p_clusters)


def _run_pipeline_fused(
    spark: SparkSession,
    documents_path: str,
    out_dir: str,
    cfg: PipelineConfig,
) -> DataFrame:
    """Checkpoint-free variant: one fused DAG from documents to clusters.

    Multi-consumer frames persist in the block cache instead of parquet, so
    the pair table is never round-tripped through disk. Same operators,
    same results; no resumability (that's what checkpoints=True is for).
    """
    os.makedirs(out_dir, exist_ok=True)
    # fused mode consumes only (mention_id, mention): contraction and the
    # final expansion both key on the surface. Selecting them BEFORE the
    # persist lets Catalyst prune the context_left/right columns, which
    # removes the per-doc Sort + two Window passes over the exploded span
    # table from the plan (the checkpointed path keeps the full S1 schema —
    # its stage table is the resumable contract). With no per-doc window
    # left, the under-parallel-input repartition moves AFTER the explode,
    # onto the skinny mention rows — the same parallelism for every
    # downstream map-side agg at a fraction of the shuffled bytes (the
    # span/text payload never crosses an exchange).
    documents = spark.read.parquet(documents_path)
    m = extract_mentions(documents).select("mention_id", "mention")
    if _estimated_partitions(documents) < spark.sparkContext.defaultParallelism:
        # keyed on the unique mention_id: hash repartition skips the
        # round-robin path's sort-before-repartition (SPARK-23207) and
        # spreads exactly as uniformly
        m = m.repartition(spark.sparkContext.defaultParallelism, "mention_id")
    mentions = m.persist()
    reps = exact_contract(mentions, "mention_id", "mention").persist()

    tb, _ = df_aware_blocks(
        reps, "record_id", "norm",
        rare_df=cfg.max_block_size, max_df=cfg.hard_cap,
        cache_freq=False,  # fused mode never reads token_stats
    )
    assignments = tb
    if cfg.use_minhash:
        mh = minhash_blocks(
            reps, "record_id", "norm",
            bands=cfg.minhash_bands, rows=cfg.minhash_rows,
            shingle_n=cfg.minhash_shingle_n,
        ).select("block_key", "record_id")
        assignments = union_blocks(tb, mh)

    pairs, _ = candidate_pairs(
        assignments,
        max_block_size=cfg.max_block_size,
        hard_cap=cfg.hard_cap,
        n_salt=cfg.n_salt,
    )
    prep = prepare_records(reps, "record_id", "norm", with_emb=True,
                           pre_normalized=True)
    attrs = pairs_with_attrs(pairs, prep, "record_id", ["norm", "toks", "emb", "emb_n"])
    scored = score_pairs_cascade(attrs, with_emb=True, with_jw=cfg.with_jw)
    edges = match_edges(scored)
    rep_clusters = assign_clusters(reps, "record_id", edges,
                                   assume_unique=True, edges_canonical=True)
    clusters = expand_contracted_clusters(
        mentions, "mention_id", "mention", rep_clusters
    )
    p_clusters = _stage_path(out_dir, "clusters")
    _write_stage(clusters, p_clusters)
    mentions.unpersist()
    reps.unpersist()
    assignments.unpersist()  # candidate_pairs persisted its input
    return spark.read.parquet(p_clusters)


def dedup_documents_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    id_col: str,
    text_col: str,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """In-memory variant over a flat (id, text) table — near-duplicate
    clustering (the flagship `entry()` query). No stage writes; same
    operators. Default config: wide shingles (see minhash_shingle_n)."""
    cfg = cfg or PipelineConfig(minhash_shingle_n=7, minhash_rows=4)
    recs = documents.select(
        F.col(id_col).cast("string").alias("record_id"), F.col(text_col).alias("text")
    )
    if _estimated_partitions(recs) < spark.sparkContext.defaultParallelism:
        # keyed on the unique record_id (vs round-robin): no
        # sort-before-repartition of the document payload (SPARK-23207)
        recs = recs.repartition(spark.sparkContext.defaultParallelism, "record_id")
    recs = recs.persist()
    reps = exact_contract(recs, "record_id", "text").persist()
    mh = minhash_blocks(reps, "record_id", "norm",
                        bands=cfg.minhash_bands, rows=cfg.minhash_rows,
                        shingle_n=cfg.minhash_shingle_n)
    assignments = mh.select("block_key", "record_id")
    pairs, _ = candidate_pairs(
        assignments,
        max_block_size=cfg.max_block_size,
        hard_cap=cfg.hard_cap,
        n_salt=cfg.n_salt,
    )
    prep = prepare_records(reps, "record_id", "norm", pre_normalized=True)
    attrs = pairs_with_attrs(pairs, prep, "record_id", ["norm", "toks"])
    scored = score_pairs_prepped_cheap(attrs)
    edges = match_edges(scored)
    rep_clusters = assign_clusters(reps, "record_id", edges,
                                   assume_unique=True, edges_canonical=True)
    # localCheckpoint is eager: the whole plan materializes here, so every
    # persist this pipeline (or candidate_pairs) registered can be released
    # before returning — no leaked cached RDDs outlive the call.
    out = expand_contracted_clusters(
        recs, "record_id", "text", rep_clusters
    ).localCheckpoint()
    assignments.unpersist()
    reps.unpersist()
    recs.unpersist()
    return out
