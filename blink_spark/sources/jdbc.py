"""JDBC mapping-table scan / sink (the reference's sqlite mapping store).

Reference behavior: ``blink/candidate_retrieval/generate_wiki2wikidata_mappings.py:35-58``
opens a sqlite database and reads ``SELECT wikipedia_title, wikidata_id FROM
mapping`` (and the ``wikipedia_id`` variant) into in-memory dicts that later
join Wikipedia pages to Wikidata ids.

Spark-first re-expression: the mapping store is a JDBC relation.

- ``read_mapping_jdbc`` uses ``spark.read.jdbc`` with a numeric
  ``partitionColumn`` + bounds so N executors each pull a slice of the table
  concurrently — the scale path for a mapping table served by a real RDBMS
  (the reference's dict load is single-process and memory-bound). Filters
  applied on the returned frame push down into the remote query
  (``PushedFilters`` on the JDBC scan node).
- ``write_mapping_jdbc`` materializes a mapping DataFrame INTO the database
  (the ingestion direction the reference does with sqlite inserts).

The sandbox has no sqlite JDBC driver; Derby (bundled with Spark) provides
the embedded-database engine, and the code is driver-agnostic — swap
``url``/``driver`` for sqlite/postgres/mysql in production. Embedded Derby
allows one JVM at a time (same constraint as the reference's sqlite file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_path: str, create: bool = False) -> str:
    return f"jdbc:derby:{db_path}" + (";create=true" if create else "")


def write_mapping_jdbc(
    mapping: DataFrame,
    db_path: str,
    table: str = "mapping",
    mode: str = "overwrite",
) -> None:
    """Write (wikipedia_id, wikipedia_title, wikidata_id) into the database.

    ``VARCHAR`` column types are forced for the string columns: Spark's
    Derby dialect would otherwise map StringType to CLOB, which JDBC
    predicate pushdown and comparisons handle poorly.
    """
    string_cols = [
        f"{f.name} VARCHAR(512)"
        for f in mapping.schema.fields
        if f.dataType.typeName() == "string"
    ]
    writer = mapping.write.format("jdbc").options(
        url=derby_url(db_path, create=True),
        dbtable=table,
        driver=DERBY_DRIVER,
    )
    if string_cols:
        writer = writer.option("createTableColumnTypes", ", ".join(string_cols))
    writer.mode(mode).save()


def read_mapping_jdbc(
    spark: SparkSession,
    db_path: str,
    table: str = "mapping",
    partition_column: str = "wikipedia_id",
    lower_bound: int = 0,
    upper_bound: int = 1 << 31,
    num_partitions: int = 8,
) -> DataFrame:
    """Parallel partitioned scan of the mapping table.

    Each of ``num_partitions`` tasks issues its own range-bounded query
    (``partition_column BETWEEN lo AND hi``), so the read fans out across
    executors instead of funnelling through one connection — at 100-TB scale
    the mapping store is a dimension table, but a single-connection pull of
    a few hundred million rows is still the difference between minutes and
    hours. Bounds only steer the split points; rows outside them are still
    returned (Spark makes the first/last partitions unbounded).
    """
    return spark.read.jdbc(
        url=derby_url(db_path),
        table=table,
        column=partition_column,
        lowerBound=lower_bound,
        upperBound=upper_bound,
        numPartitions=num_partitions,
        properties={"driver": DERBY_DRIVER},
    )
