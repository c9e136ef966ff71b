"""Distinct-count sketching (KMV / bottom-k) for corpus-scale cardinality.

A 100 TB curation run constantly needs "roughly how many distinct users /
domains / shingles are in this slice" without paying an exact
count-distinct. The K-Minimum-Values sketch answers it from only the k
smallest hash values per group: if the k-th smallest of n uniform hashes in
[0, M) sits at R, then n ~= (k-1) * M / R (the classic KMV estimator,
Bar-Yossef et al. 2002). Unlike HyperLogLog the whole computation is exact
integer arithmetic — portable bit-for-bit across engines (the house oracle
rule), mergeable (union of bottom-k sets -> bottom-k), and the error is
~1/sqrt(k-2).

Scale notes (100 TB):
- The only corpus-sized shuffle is the ``distinct`` on (group, hash) —
  unavoidable for any distinct-count, and Spark performs it with map-side
  partial dedup. The bottom-k ranking then runs over the already-deduped
  set; at extreme per-group cardinality the window sort is the honest cost,
  and the production escape hatch is a per-partition bottom-k partial
  aggregation (sort only k * n_partitions rows) feeding the same final
  ranking — the estimator is identical because bottom-k is mergeable.
- No floats anywhere: the estimate is ``(k-1) * 2^32 div kth_hash``, exact
  in BIGINT for any k below ~2^21.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_M = 1 << 32  # hash space: first 8 hex digits of md5


def _kmv_hash(col: Column) -> Column:
    """Uniform hash into [0, 2^32): first 8 md5 hex digits as a long
    (DuckDB-portable: ('0x' || substr(md5('kmv:' || x), 1, 8))::BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv:"), col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate of ``key_col``.

    Returns (group, n_exact, kth_hash, est_distinct):
    - ``n_exact``      exact distinct-hash count (the sketch's target; kept
                       so recall/error is auditable in the same scan)
    - ``kth_hash``     the k-th smallest hash (null when the group holds
                       fewer than k distinct values — the sketch is exact
                       there and ``est_distinct = n_exact``)
    - ``est_distinct`` ``(k-1) * 2^32 div kth_hash``, BIGINT

    Deterministic: md5 hashing, integer division, no sampling.
    """
    h = (
        df.select(
            F.col(group_col).alias("grp"),
            _kmv_hash(F.col(key_col)).alias("h"),
        )
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy(F.col("h").asc())
    ranked = h.select("grp", "h", F.row_number().over(w).alias("rn"))
    agg = ranked.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_exact"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).cast("long").alias("kth_hash"),
    )
    est = F.when(F.col("n_exact") < k, F.col("n_exact")).otherwise(
        F.expr(f"cast({(k - 1) * _M} as bigint) div kth_hash")
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n_exact",
        "kth_hash",
        est.cast("long").alias("est_distinct"),
    )
