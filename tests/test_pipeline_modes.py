"""Fused vs checkpointed pipeline equivalence + contraction correctness."""

from __future__ import annotations

from blink_spark.pipeline import PipelineConfig, run_pipeline


def test_fused_equals_checkpointed(spark, fixture_paths, tmp_path):
    a = run_pipeline(
        spark, fixture_paths["documents"], str(tmp_path / "ck")
    )
    b = run_pipeline(
        spark,
        fixture_paths["documents"],
        str(tmp_path / "fu"),
        config=PipelineConfig(checkpoints=False),
    )
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_contraction_identity(spark):
    """Identical normalized surfaces always share a cluster; the cluster id
    is the min mention id of the component (contraction-invariant)."""
    import pandas as pd

    from blink_spark.pipeline import exact_contract, expand_contracted_clusters
    from pyspark.sql import functions as F

    recs = spark.createDataFrame(
        pd.DataFrame(
            {
                "mention_id": ["m1", "m2", "m3", "m4"],
                "mention": ["Alpha  Bravo", "alpha bravo", "ALPHA BRAVO", "zulu"],
            }
        )
    )
    reps = exact_contract(recs, "mention_id", "mention")
    rows = {r.norm: r.record_id for r in reps.collect()}
    assert rows == {"alpha bravo": "m1", "zulu": "m4"}

    rep_clusters = reps.select(
        "record_id", F.col("record_id").alias("cluster_id")
    )
    expanded = {
        r.record_id: r.cluster_id
        for r in expand_contracted_clusters(
            recs, "mention_id", "mention", rep_clusters
        ).collect()
    }
    assert expanded == {"m1": "m1", "m2": "m1", "m3": "m1", "m4": "m4"}
