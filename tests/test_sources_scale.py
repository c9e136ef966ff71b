"""Scale-shape regression tests for the sources (round-1 verdict: dense-id
assignment and stream sessionization used no-partition windows — the whole
input funneled through ONE task). The two-phase operators must produce
IDENTICAL outputs with no Exchange SinglePartition in the plan."""

from __future__ import annotations

import json

from pyspark.sql import Window
from pyspark.sql import functions as F

from blink_spark.operators.ids import dense_ids, partitioned_running_sum
from blink_spark.plans.inspect import has_single_partition_exchange


def test_dense_ids_matches_global_row_number(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 1000).alias("k"),
        F.concat(F.lit("t"), (F.col("id") % 7)).alias("t"),
    )
    out = dense_ids(df, [F.col("k").asc(), F.col("t").asc()], "rid")
    w = Window.orderBy(F.col("k").asc(), F.col("t").asc())
    expected = df.withColumn("rid", F.row_number().over(w) - 1)
    assert out.exceptAll(expected).count() == 0
    assert expected.exceptAll(out).count() == 0
    assert not has_single_partition_exchange(out)


def test_partitioned_running_sum_matches_global(spark):
    df = spark.range(0, 500).select(
        F.col("id").alias("line_no"), (F.col("id") % 13 == 0).cast("int").alias("m")
    ).repartition(8)
    out = partitioned_running_sum(df, "line_no", "m", "s")
    w = Window.orderBy("line_no").rowsBetween(Window.unboundedPreceding, 0)
    expected = df.withColumn("s", F.sum("m").over(w))
    assert out.exceptAll(expected).count() == 0
    assert expected.exceptAll(out).count() == 0
    assert not has_single_partition_exchange(out)


def test_entity_catalogue_plan_is_parallel(spark, tmp_path):
    from blink_spark.sources.jsonl import read_entity_catalogue

    p = tmp_path / "ents.jsonl"
    with open(p, "w") as f:
        for i in range(100):
            f.write(
                json.dumps(
                    {"title": f"entity {i:03d}", "text": f"text {i}",
                     "idx": f"https://x?curid={1000 + i}"}
                )
                + "\n"
            )
    ents = read_entity_catalogue(spark, str(p))
    rows = ents.orderBy("entity_id").collect()
    assert [r.entity_id for r in rows] == list(range(100))
    assert rows[0].wikipedia_id == 1000 and rows[99].wikipedia_id == 1099
    assert not has_single_partition_exchange(ents)


def test_conll_sessionization_plan_is_parallel(spark, tmp_path):
    from blink_spark.sources.conll import read_conll

    p = tmp_path / "c.conll"
    with open(p, "w") as f:
        for d in range(5):
            f.write(f"-DOCSTART- ({d})\n")
            for t in range(4):
                f.write(f"tok{d}_{t}\tO\n")
    toks = read_conll(spark, str(p))
    per_doc = {r.doc_id: r.n for r in toks.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}
    assert per_doc == {d: 4 for d in range(1, 6)}
    assert not has_single_partition_exchange(toks)


def test_numbered_lines_is_jvm_side_and_file_ordered(spark, tmp_path):
    """Line numbering must match a sequential enumerate() of the file AND
    stay entirely JVM-side: the prior rdd.zipWithIndex form pushed every
    line of the scan through row-at-a-time Python (Scan ExistingRDD), the
    10-100x slow path at a 100 TB dump."""
    from blink_spark.sources.lines import numbered_lines

    p = tmp_path / "lines.txt"
    expected = [f"line {i:04d}" for i in range(500)]
    p.write_text("\n".join(expected) + "\n")
    df = numbered_lines(spark, str(p))
    rows = df.orderBy("line_no").collect()
    assert [r.line_no for r in rows] == list(range(500))
    assert [r.line for r in rows] == expected
    from blink_spark.plans.inspect import explain_str

    plan = explain_str(df)
    # the text scan must be native (no per-row Python anywhere in the plan);
    # the one ExistingRDD allowed is dense_ids' O(#partitions)-row broadcast
    # offset table, which never touches scan rows
    assert "Scan text" in plan, plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert bad not in plan, f"{bad} in numbered_lines plan:\n{plan}"
    assert not has_single_partition_exchange(df)
