"""Relational data-validation primitives — the dbt-test/Great-Expectations
capability class: referential integrity, key uniqueness, and row-level
constraint checks as exact-count report rows. The reference validates its
inputs ad hoc (resolvable-label filters, candidate-arity asserts during
CSV parsing — /root/reference/blink/candidate_retrieval/dataset.py:18-69);
this is the systematic engine-level form an ingest pipeline gates on.

Scale notes (100 TB): every primitive is one keyed partial agg or one
anti-join-shaped equi-join (AQE broadcasts small parents); nothing beyond
the one-row readout crosses a single partition. All counts exact BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_orphans(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Referential-integrity check: child rows whose non-NULL key has no
    parent (NULL keys are not orphans — SQL FK semantics — and are
    counted separately so a silently-null FK column can't pass as
    'clean'). One distinct-collapse on each side + one left anti-shaped
    join, then the per-key orphan row counts fold back.

    Returns one row: (n_rows, n_null_keys, n_orphan_rows,
    n_orphan_keys).
    """
    ck = child.select(F.col(child_key).alias("k"))
    nn = ck.filter("k IS NOT NULL")
    per = nn.groupBy("k").agg(F.count(F.lit(1)).cast("long").alias("c"))
    pk = parent.select(F.col(parent_key).alias("k")).distinct()
    orph = per.join(pk, "k", "left_anti")
    tot = ck.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(F.sum(F.expr("CASE WHEN k IS NULL THEN 1 END")), F.lit(0))
        .cast("long")
        .alias("n_null_keys"),
    )
    os = orph.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_orphan_rows"),
        F.count(F.lit(1)).cast("long").alias("n_orphan_keys"),
    )
    return tot.crossJoin(F.broadcast(os))


def duplicate_keys(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key-uniqueness check: rows living in a key group of size > 1
    (the would-be primary key's duplicate mass) and how many distinct
    keys are duplicated. One key-keyed partial agg + a one-row finalize.

    Returns one row: (n_rows, n_dup_rows, n_dup_keys).
    """
    per = df.groupBy(*cols).agg(F.count(F.lit(1)).cast("long").alias("c"))
    return per.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_rows"),
        F.coalesce(F.sum(F.expr("CASE WHEN c > 1 THEN c END")), F.lit(0))
        .cast("long")
        .alias("n_dup_rows"),
        F.coalesce(
            F.sum(F.expr("CASE WHEN c > 1 THEN 1 END")), F.lit(0)
        )
        .cast("long")
        .alias("n_dup_keys"),
    )


def constraint_violations(df: DataFrame, predicate: str) -> DataFrame:
    """Row-level constraint check: a row violates unless the predicate
    is TRUE — NULL predicate results count as violations (a NULL in a
    range check is a data problem, not a pass; mirror with
    ``... IS NOT TRUE`` in any SQL twin). One global counter pair,
    map-side partials.

    Returns one row: (n_rows, n_violations).
    """
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(
            F.sum(F.expr(f"CASE WHEN ({predicate}) IS NOT TRUE THEN 1 END")),
            F.lit(0),
        )
        .cast("long")
        .alias("n_violations"),
    )


def integrity_report(checks: list[tuple[str, DataFrame]]) -> DataFrame:
    """Union a set of named one-row check results into the validation
    report an ingest gate consumes: (check_name, n_checked,
    n_violations, passed). Each input frame must expose its row count in
    its first column and its violation count in a column named by
    convention (n_orphan_rows / n_dup_rows / n_violations)."""
    out = None
    for name, d in checks:
        cols = set(d.columns)
        viol = (
            "n_orphan_rows"
            if "n_orphan_rows" in cols
            else "n_dup_rows" if "n_dup_rows" in cols else "n_violations"
        )
        row = d.select(
            F.lit(name).alias("check_name"),
            F.col("n_rows").alias("n_checked"),
            F.col(viol).cast("long").alias("n_violations"),
            (F.col(viol) == 0).alias("passed"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def table_digest(df: DataFrame, row_expr: str, table_name: str) -> DataFrame:
    """Order-insensitive table content digest — the cross-run drift
    detector: two pipeline executions (or two clusters, or pre/post a
    migration) produced the same table iff (n_rows, xor_digest,
    sum_digest) all match. ``row_expr`` must be a deterministic STRING
    rendering of the row (caller quantizes floats and formats dates —
    the column-profile rendering rules); the row hash is the first
    16 hex digits of its md5, the combiners are bit_xor (order-free,
    overflow-free) and a mod-2³² sum (catches the duplicate-pair swaps
    xor cancels; bounded by n·2³², exact to ~2e9 rows).

    Scale notes: a pure map-side projection + one scalar aggregate —
    the cheapest possible full-table check (one pass, three counters).

    Returns one row: (table_name, n_rows, xor_digest, sum_digest).
    """
    h = df.select(
        F.expr(
            f"cast(conv(substring(md5({row_expr}), 1, 15), 16, 10) as bigint)"
        ).alias("h")
    )
    return h.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.coalesce(
            F.expr("bit_xor(h)"), F.lit(0)
        ).cast("long").alias("xor_digest"),
        F.coalesce(F.sum(F.expr("h % 4294967296")), F.lit(0))
        .cast("long")
        .alias("sum_digest"),
    ).select(
        F.lit(table_name).alias("table_name"),
        "n_rows",
        "xor_digest",
        "sum_digest",
    )


def table_digests(
    frames: list[tuple[str, DataFrame, str]]
) -> DataFrame:
    """Union of ``table_digest`` rows for several (name, df, row_expr)
    triples — the one-glance drift report."""
    out = None
    for name, df, expr in frames:
        row = table_digest(df, expr, name)
        out = row if out is None else out.unionByName(row)
    return out
