"""Extra benchmarks for the optimization round (bench.py is FROZEN).

Per-query noop-sink isolation (guide §1.4: computes every column of every
row, no sink cost, no count-only column pruning) for the four declared
bench queries, plus optional plan dumps. Prints one JSON line.

Usage:
  python bench_extra.py                 # time the 4 declared queries, noop sink
  python bench_extra.py plans OUTDIR    # dump explain('formatted') per query
  python bench_extra.py pipeline        # stage-level er_pipeline timings

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
SPARK_GRAFT_BENCH_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))

QUERY_NAMES = (
    "ann_bruteforce_topk",
    "pricing_summary",
    "top_orders_per_customer",
    "sessionize_events",
)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def time_queries(spark) -> dict:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out: dict[str, dict] = {}
    for name in QUERY_NAMES:
        samples = []
        for r in range(REPS):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            _noop(qs[name](spark, SF_DIR))
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
    return out


def dump_plans(spark, outdir: str, suffix: str) -> None:
    import __spark_entry__ as entry_mod
    from blink_spark.plans.inspect import explain_str

    os.makedirs(outdir, exist_ok=True)
    qs = entry_mod.queries()
    for name in QUERY_NAMES:
        plan = explain_str(qs[name](spark, SF_DIR))
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)


def time_pipeline_stages(spark) -> dict:
    """Stage-level wall clock of the fused ER pipeline at bench scale
    (mirrors tools/profile_pipeline.py but uses noop sinks)."""
    import shutil

    from bench import _bench_fixture_docs

    from blink_spark.pipeline import PipelineConfig, run_pipeline

    docs_path = _bench_fixture_docs()
    out: dict[str, float] = {}
    for rep in range(max(REPS, 2)):
        out_dir = f"/tmp/bench_extra_{os.getpid()}_{rep}"
        spark.sparkContext.setJobDescription(f"er_pipeline rep{rep}")
        t0 = time.time()
        run_pipeline(spark, docs_path, out_dir).count()
        dt = round(time.time() - t0, 3)
        out[f"rep{rep}"] = dt
        shutil.rmtree(out_dir, ignore_errors=True)
    spark.sparkContext.setJobDescription(None)
    return out


def main() -> None:
    from blink_spark.session import get_spark

    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=CPUS)
    if mode == "plans":
        outdir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(_REPO, "plans", "r06")
        suffix = sys.argv[3] if len(sys.argv) > 3 else "before"
        dump_plans(spark, outdir, suffix)
        print(json.dumps({"mode": "plans", "outdir": outdir, "suffix": suffix}))
        return
    if mode == "pipeline":
        res = time_pipeline_stages(spark)
    else:
        res = time_queries(spark)
    print(json.dumps({"mode": mode, "sf": SF_DIR, "cpus": CPUS, "results": res}))


if __name__ == "__main__":
    main()
