"""Round-6 optimization equivalence tests.

Each round-6 fast path is a caller-guarantee rewrite that must be
VALUE-IDENTICAL to the defensive form it replaces (OPTIMIZATION_r06.md).
These tests pin that equivalence on small inputs so a future edit to either
side can't silently fork the semantics.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_embed_batch_matches_reference_token_loop():
    """Vectorized + memoized _embed_batch must be bit-identical to the
    original per-token-occurrence loop (exact ±1 integer sums in float64,
    unchanged per-row norm call path)."""
    from blink_spark.functions.hashing import EMB_DIM, _embed_batch

    def reference(texts: pd.Series, dim: int) -> pd.Series:
        out = []
        for t in texts:
            v = np.zeros(dim, dtype=np.float64)
            for tok in (t or "").lower().split():
                d = hashlib.blake2b(tok.encode(), digest_size=9).digest()
                idx = int.from_bytes(d[:8], "big")
                sign = 1.0 if d[8] & 1 else -1.0
                v[idx % dim] += sign
            n = np.linalg.norm(v)
            if n > 0:
                v /= n
            out.append(v.astype(np.float32).tolist())
        return pd.Series(out)

    texts = pd.Series(
        [
            None,
            "",
            "   ",
            "The The the THE",
            "Ünïcode Ünïcode tökens",
            "a b c d e f g a b c",
            "x" * 300,
            "repeated word word word word",
        ]
        + [f"tok{i} tok{i%7} shared common" for i in range(200)],
        dtype=object,
    )
    a = reference(texts, EMB_DIM)
    b = _embed_batch(texts, EMB_DIM)
    assert all(x == y for x, y in zip(a, b))
    # second call exercises the warm memo path — still identical
    c = _embed_batch(texts, EMB_DIM)
    assert all(x == y for x, y in zip(b, c))


@pytest.fixture(scope="module")
def prepped_pairs(spark, fixture_paths):
    """Real prepped pair attributes from the fixture mentions."""
    from blink_spark.operators.blocking import (
        df_aware_blocks,
        minhash_blocks,
        union_blocks,
    )
    from blink_spark.operators.pairs import candidate_pairs, pairs_with_attrs
    from blink_spark.operators.scoring import prepare_records
    from blink_spark.pipeline import exact_contract

    m = spark.read.parquet(fixture_paths["mentions"]).select(
        "mention_id", "mention"
    )
    reps = exact_contract(m, "mention_id", "mention")
    tb, _ = df_aware_blocks(reps, "record_id", "norm", cache_freq=False)
    mh = minhash_blocks(reps, "record_id", "norm", bands=4, rows=8).select(
        "block_key", "record_id"
    )
    pairs, _ = candidate_pairs(union_blocks(tb, mh))
    prep = prepare_records(
        reps, "record_id", "norm", with_emb=True, pre_normalized=True
    )
    return pairs_with_attrs(
        pairs, prep, "record_id", ["norm", "toks", "emb", "emb_n"]
    ).persist()


def _union_form_cascade(pa, with_emb):
    """The pre-round-6 structural filter→union cascade, verbatim."""
    from blink_spark.functions.similarity import JACCARD_THRESHOLD, dot
    from blink_spark.operators.scoring import _base_features

    base = _base_features(pa).withColumn(
        "plausible",
        F.col("is_match") | (F.col("jaccard") >= F.lit(JACCARD_THRESHOLD * 0.9)),
    )
    m = F.greatest(F.length("norm_a"), F.length("norm_b"))
    exact_lev = F.when(
        m > 0, 1.0 - F.levenshtein("norm_a", "norm_b").cast("double") / m
    ).otherwise(F.lit(1.0))
    hot = (
        base.filter(F.col("plausible"))
        .withColumn("lev_ratio", F.round(exact_lev, 6))
        .withColumn("jw", F.lit(None).cast("double"))
    )
    cold = (
        base.filter(~F.col("plausible"))
        .withColumn("lev_ratio", F.lit(None).cast("double"))
        .withColumn("jw", F.lit(None).cast("double"))
    )
    if with_emb:
        denom = F.col("emb_n_a") * F.col("emb_n_b")
        cos_expr = F.when(denom > 0, dot("emb_a", "emb_b") / denom).otherwise(
            F.lit(0.0)
        )
        hot = hot.withColumn("emb_cos", F.round(cos_expr, 6))
        cold = cold.withColumn("emb_cos", F.lit(None).cast("double"))
        hot = hot.withColumn(
            "score",
            F.round(0.4 * (F.col("emb_cos") + 1.0) / 2.0 + 0.6 * F.col("lev_ratio"), 6),
        )
    else:
        hot = hot.withColumn("score", F.round(F.col("lev_ratio"), 6))
    cold = cold.withColumn("score", F.col("jaccard") * 0.5)
    return hot.unionByName(cold).drop("plausible")


@pytest.mark.parametrize("with_emb", [True, False])
def test_single_pass_cascade_equals_union_form(prepped_pairs, with_emb):
    from blink_spark.operators.scoring import score_pairs_cascade

    cols = [
        "record_id_a", "record_id_b", "norm_eq", "jaccard", "is_match",
        "lev_ratio", "jw", "score",
    ] + (["emb_cos"] if with_emb else [])
    old = _union_form_cascade(prepped_pairs, with_emb)
    new = score_pairs_cascade(prepped_pairs, with_emb=with_emb, with_jw=False)
    assert old.columns == new.columns
    a = sorted(tuple(r) for r in old.select(cols).collect())
    b = sorted(tuple(r) for r in new.select(cols).collect())
    assert a == b and len(a) > 0


def test_assign_clusters_fast_flags_equal_defensive_path(spark):
    from blink_spark.operators.cluster import assign_clusters

    # canonical (src < dst), distinct, self-loop-free edges — the
    # candidate_pairs guarantee — over ids with singletons left out of edges
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("f", "g"), ("a", "c")],
        ["src", "dst"],
    )
    records = spark.createDataFrame(
        [(x,) for x in "abcdefgh"], ["record_id"]
    )
    slow = assign_clusters(records, "record_id", edges)
    fast = assign_clusters(
        records, "record_id", edges, assume_unique=True, edges_canonical=True
    )
    assert sorted(map(tuple, slow.collect())) == sorted(map(tuple, fast.collect()))


def test_prepare_records_pre_normalized_identity(spark, fixture_paths):
    from blink_spark.operators.scoring import prepare_records
    from blink_spark.pipeline import exact_contract

    m = spark.read.parquet(fixture_paths["mentions"]).select(
        "mention_id", "mention"
    )
    reps = exact_contract(m, "mention_id", "mention")
    a = prepare_records(reps, "record_id", "norm", with_emb=True)
    b = prepare_records(
        reps, "record_id", "norm", with_emb=True, pre_normalized=True
    )
    assert a.columns == b.columns
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    assert ra == rb and len(ra) > 0
