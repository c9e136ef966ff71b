"""Incremental IVF vector store: append-only upserts, partition-pruned
probes, and exact agreement with the batch IVF operator."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from blink_spark.streaming.ann_store import (
    first_items_codebook,
    probe_store_topk,
    pruned_store_scan,
    upsert_vector_batch,
)


def _vec(i: int) -> list[float]:
    # deterministic, well-spread unit-ish vectors
    return [
        float((i * 7 + 1) % 13) / 13.0,
        float((i * 5 + 2) % 11) / 11.0,
        float((i * 3 + 4) % 7) / 7.0,
        float((i + 5) % 9) / 9.0,
    ]


def _items(spark, ids):
    return spark.createDataFrame(
        [(int(i), _vec(i)) for i in ids], "item_id long, item_emb array<float>"
    )


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    """A store populated by two disjoint upsert batches; codebook fixed at
    creation from the first batch (the FAISS train-once contract)."""
    d = str(tmp_path_factory.mktemp("ann_store")) + "/vecs"
    b1, b2 = _items(spark, range(20)), _items(spark, range(20, 40))
    cents = first_items_codebook(
        b1.select("item_id", F.col("item_emb").alias("iv")), 4
    )
    upsert_vector_batch(b1, d, cents)
    files_after_b1 = set(glob.glob(os.path.join(d, "cid=*", "*.parquet")))
    upsert_vector_batch(b2, d, cents)
    return d, cents, files_after_b1


def test_upsert_is_append_only(spark, store):
    d, _cents, files_after_b1 = store
    files_now = set(glob.glob(os.path.join(d, "cid=*", "*.parquet")))
    assert files_after_b1 <= files_now, "existing files must never be rewritten"
    assert files_now - files_after_b1, "second batch must add new files"


def test_store_is_cell_partitioned_and_covers_all_rows(spark, store):
    d, _cents, _ = store
    cid_dirs = [x for x in os.listdir(d) if x.startswith("cid=")]
    assert len(cid_dirs) >= 2
    assert spark.read.parquet(d).count() == 40


def test_probe_scan_reads_only_probed_cells(spark, store):
    d, cents, _ = store
    cids = [r["cid"] for r in cents.collect()][:2]
    pruned = pruned_store_scan(spark, d, cids)
    files = [
        r["f"]
        for r in pruned.select(F.input_file_name().alias("f")).distinct().collect()
    ]
    assert files, "pruned scan read something"
    assert all(any(f"cid={c}/" in f for c in cids) for f in files), files
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cid" in plan.split("PartitionFilters")[1][:200]


def test_store_probe_matches_batch_ivf(spark, store):
    """Probing the accumulated store equals running the batch ivf_topk over
    the union of all upserted batches (same codebook, scorer, tie rules) —
    the store adds incrementality, not different ANN semantics."""
    from blink_spark.operators.ann import ivf_topk

    d, cents, _ = store
    queries = spark.createDataFrame(
        [(int(100 + i), _vec(3 * i + 1)) for i in range(5)],
        "query_id long, query_emb array<float>",
    )
    got = {
        (r["query_id"], r["rank"]): (r["item_id"], r["score"])
        for r in probe_store_topk(
            spark, d, queries, cents, k=3, nprobe=2
        ).collect()
    }
    # batch twin: first_items codebook over the union = ids 0..3 = the
    # store's codebook (batch 1 held the lowest ids)
    want = {
        (r["query_id"], r["rank"]): (r["item_id"], r["score"])
        for r in ivf_topk(
            queries, _items(spark, range(40)), k=3, n_centroids=4, nprobe=2
        ).collect()
    }
    assert got == want and len(got) == 15


def test_incremental_ann_stream_available_now(spark, tmp_path):
    """End-to-end through Structured Streaming: a parquet-source stream of
    vector batches drains into the cell-partitioned store via foreachBatch
    (availableNow), after which a probe sees every vector."""
    from blink_spark.streaming.ann_store import incremental_ann_stream

    in_dir, store_dir = str(tmp_path / "in"), str(tmp_path / "store")
    b1 = _items(spark, range(12))
    b1.write.mode("append").parquet(in_dir)
    _items(spark, range(12, 24)).write.mode("append").parquet(in_dir)
    cents = first_items_codebook(
        b1.select("item_id", F.col("item_emb").alias("iv")), 3
    )
    stream = spark.readStream.schema(
        "item_id long, item_emb array<float>"
    ).parquet(in_dir)
    q = incremental_ann_stream(
        stream, store_dir, cents, str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)
    assert spark.read.parquet(store_dir).count() == 24
    res = probe_store_topk(
        spark,
        store_dir,
        spark.createDataFrame(
            [(1, _vec(2))], "query_id long, query_emb array<float>"
        ),
        cents,
        k=5,
        nprobe=3,
    )
    assert res.count() == 5
