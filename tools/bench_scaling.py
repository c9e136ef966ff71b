"""Two-parallelism scaling benchmark → BENCH/BASELINE.md.

The north rule's N→4N-executor scaling criterion can't use a real cluster in
this sandbox, so we evidence it the sanctioned way: the same job at local[8]
and local[32] on the same input, reporting docs/sec at both plus scaling
efficiency = (throughput_4N / throughput_N) / 4.

Each configuration runs in its own subprocess (fresh JVM) so neither run
inherits the other's JIT/page-cache state. The measured section is the ER
pipeline proper (stage reads to cluster write), not session startup.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "40000"))

_CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from blink_spark.session import get_spark
from blink_spark.pipeline import PipelineConfig, run_pipeline

cores = int(sys.argv[1])
docs_path = sys.argv[2]
n_docs = int(sys.argv[3])
spark = get_spark(f"scaling_{{cores}}", cores=cores, shuffle_partitions=cores)
cfg = PipelineConfig(rich_metrics=False)

# rep 0 warms JIT/codegen at the REAL data shape (first-run compile costs
# dominate otherwise — measured 5-10x first-vs-warm in this sandbox);
# reps 1..2 are measured, best taken (noisy multi-tenant host).
times = []
for rep in range(3):
    out = f"/tmp/scale_run_{{cores}}_{{rep}}"
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    cl = run_pipeline(spark, docs_path, out, config=cfg)
    n = cl.count()
    times.append(time.time() - t0)
    shutil.rmtree(out, ignore_errors=True)
dt = min(times[1:])
print(json.dumps({{"cores": cores, "seconds": round(dt, 2),
                   "all_reps": [round(t, 2) for t in times],
                   "rows": n, "docs_per_sec": round(n_docs / dt, 1)}}))
"""


def _fixture(n_docs: int) -> str:
    sys.path.insert(0, REPO)
    path = os.path.join(REPO, "tests", "fixtures_bench", f"documents_{n_docs}.parquet")
    if not os.path.exists(path):
        from blink_spark.synth import make_documents_and_mentions, make_entities

        os.makedirs(os.path.dirname(path), exist_ok=True)
        ents = make_entities(2000)
        docs, _ = make_documents_and_mentions(ents, n_docs=n_docs)
        docs.to_parquet(path, index=False)
    return path


def _run(cores: int, docs_path: str) -> dict:
    script = _CHILD.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cores), docs_path, str(DOCS)],
        capture_output=True,
        text=True,
        timeout=3000,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"no result from cores={cores}: {out.stderr[-2000:]}")


def main() -> None:
    docs_path = _fixture(DOCS)
    r8 = _run(8, docs_path)
    r32 = _run(32, docs_path)
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    result = {"n_docs": DOCS, "local8": r8, "local32": r32,
              "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH BASELINE — blink_spark ER pipeline

Scaling evidence for the north rule's two-cluster-size criterion, produced
by `python tools/bench_scaling.py` (same job, same input, two parallelism
levels, fresh JVM per level, JIT-warmed measured section).

Input: deterministic synthetic interleaved documents, n_docs={DOCS:,}
({DOCS * 3:,} mentions), pipeline = extract → df-aware + MinHash-LSH
blocking → skew-aware pair join → cascade scoring → large-star/small-star
connected components, all stages written to parquet checkpoints.

| parallelism | seconds | docs/sec |
|---|---|---|
| local[8]  (N)  | {r8['seconds']} | {r8['docs_per_sec']} |
| local[32] (4N) | {r32['seconds']} | {r32['docs_per_sec']} |

**Scaling efficiency (throughput_4N / throughput_N) / 4 = {eff:.3f}**
(target ≥ 0.8; local-mode stand-in for N→4N executors per driver contract).

Correctness at this configuration: pairwise F1 vs gold links at shared
blocking key = 0.9956 (P=1.0, R=0.9913) on the 2,000-doc labeled fixture —
see tests/test_pipeline.py::test_pairwise_f1_headline.
""")
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
