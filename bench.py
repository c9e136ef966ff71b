"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Headline set:
- er_pipeline      — full blocking → scoring → CC record-linkage run on the
                     deterministic synthetic mention fixture (10k docs /
                     30k mentions), checkpointed observability path,
                     comparable across rounds
- er_pipeline_100k_fused — 10x docs, fused plan: the throughput regime
                     (10k-doc runs are fixed-overhead-dominated)
- dedup_documents  — MinHash-LSH near-dup clustering of the sf documents
- ann_topk         — brute-force cosine top-k over the sf embeddings
- pricing_summary / top_orders / sessionize — generic relational ops at sf
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_FIXTURE_DIR = os.path.join(_REPO, "tests", "fixtures_bench")
BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "10000"))


def _bench_fixture_docs(n_docs: int | None = None) -> str:
    """Docs-only synthetic fixture at bench scale (no O(n^2) gold pairs)."""
    n_docs = n_docs or BENCH_DOCS
    os.makedirs(BENCH_FIXTURE_DIR, exist_ok=True)
    path = os.path.join(BENCH_FIXTURE_DIR, f"documents_{n_docs}.parquet")
    if not os.path.exists(path):
        from blink_spark.synth import make_documents_and_mentions, make_entities

        ents = make_entities(max(2000, min(n_docs // 20, 45**3 - 1)),
                             allow_large=True)
        docs, _ = make_documents_and_mentions(ents, n_docs=n_docs)
        docs.to_parquet(path, index=False, row_group_size=20_000)
    return path


def _md5_probe_worker(seed: int) -> str:
    import hashlib

    h = hashlib.md5(str(seed).encode())
    for _ in range(200_000):
        h = hashlib.md5(h.digest())
    return h.hexdigest()


def _host_health() -> dict:
    """Spark-free host canary: loadavg + md5 multiprocessing scaling ratio
    (2 -> 8 workers). Healthy is ~3.4-3.5x on this box; co-tenant bursts
    push it well below 3."""
    from multiprocessing import Pool

    def thr(nw: int) -> float:
        t0 = time.time()
        with Pool(nw) as p:
            p.map(_md5_probe_worker, range(nw * 2))
        return (nw * 2) / (time.time() - t0)

    try:
        r2, r8 = thr(2), thr(8)
        ratio = round(r8 / r2, 2)
    except Exception:  # pragma: no cover - probe must never fail the bench
        ratio = None
    try:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
    except OSError:  # pragma: no cover
        load1 = None
    return {"md5_2to8_ratio": ratio, "loadavg_1m": load1}


def main() -> None:
    import __spark_entry__ as entry_mod
    from blink_spark.pipeline import dedup_documents_pipeline, run_pipeline
    from blink_spark.session import get_spark

    # probe BEFORE Spark starts: afterwards the 1-minute loadavg still
    # carries the suite's own just-finished work and reads as noise
    host_health = _host_health()

    docs_path = _bench_fixture_docs()
    spark = get_spark("blink_spark_bench", cores=CPUS, shuffle_partitions=CPUS)

    timings: dict[str, float] = {}
    rep_detail: dict[str, list[float]] = {}

    # MIN over reps is this host's established noise-robust estimator (see
    # BENCH/BASELINE.md: co-tenant bursts inflate whole reps 30-200% for
    # minutes; the scaling bench has used min-of-N since round 2). Applying
    # it to the headline suite too means the first rep of the first query
    # also absorbs the one-time JVM JIT/codegen warmup (~2x on this box)
    # instead of billing it to the engine.
    def timed(name: str, fn, reps: int = 2) -> None:
        reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", reps))
        samples = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            samples.append(round(time.time() - t0, 3))
        rep_detail[name] = samples
        timings[name] = min(samples)

    # ER pipeline end to end (fresh output dir each run) — the checkpointed
    # observability path at 10k docs, comparable across rounds
    out_dir = os.path.join("/tmp", f"blink_bench_{os.getpid()}")

    def _fresh_pipeline(path, target, **kw):
        shutil.rmtree(target, ignore_errors=True)
        return run_pipeline(spark, path, target, **kw).count()

    timed("er_pipeline", lambda: _fresh_pipeline(docs_path, out_dir))
    shutil.rmtree(out_dir, ignore_errors=True)

    # throughput-regime run: 10x docs, fused plan, no metric scans — the
    # configuration BENCH/BASELINE.md measures scaling efficiency with.
    # 10k-doc runs are dominated by fixed per-stage overhead, not work.
    from blink_spark.pipeline import PipelineConfig

    docs_100k = _bench_fixture_docs(BENCH_DOCS * 10)
    out_dir2 = out_dir + "_tp"
    timed(
        "er_pipeline_100k_fused",
        lambda: _fresh_pipeline(
            docs_100k, out_dir2,
            config=PipelineConfig(rich_metrics=False, checkpoints=False),
        ),
    )
    shutil.rmtree(out_dir2, ignore_errors=True)

    docs_df = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    timed(
        "dedup_documents",
        lambda: dedup_documents_pipeline(spark, docs_df, "doc_id", "text").count(),
    )

    qs = entry_mod.queries()
    for name in ("ann_bruteforce_topk", "pricing_summary",
                 "top_orders_per_customer", "sessionize_events"):
        timed(name, lambda n=name: qs[n](spark, SF_DIR).count())

    total = round(sum(timings.values()), 3)
    n_mentions = BENCH_DOCS * 3
    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "estimator": "min_of_2_reps_per_query",
        "queries": timings,
        # Noise forensics for this multi-tenant host (co-tenant bursts
        # inflate whole reps 30-200% for minutes — BENCH/BASELINE.md):
        # per-rep samples expose intra-run spread; the md5 probe is a
        # Spark-free throughput canary (healthy 2->8-worker ratio is
        # ~3.4-3.5x; a low ratio or high loadavg flags a contaminated
        # window whose 'value' overstates true cost).
        "rep_seconds": rep_detail,
        "host": host_health,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "cpus": CPUS,
        "er_docs": BENCH_DOCS,
        "er_docs_per_sec": round(BENCH_DOCS / timings["er_pipeline"], 1),
        "er_mentions_per_sec": round(n_mentions / timings["er_pipeline"], 1),
        "er_100k_docs_per_sec": round(
            BENCH_DOCS * 10 / timings["er_pipeline_100k_fused"], 1
        ),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
