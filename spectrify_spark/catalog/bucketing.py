"""Bucketed tables — co-located joins and aggregations without a
shuffle.

At 100 TB the dominant cost of a fact-fact join (e.g. lineitem x
orders on orderkey) is shuffling both sides.  Writing both tables
bucketed by the join key into the session catalog lets Spark plan a
SortMergeJoin with NO Exchange on either side: each bucket pair joins
locally.  The same bucketing serves repeated groupBys on the key.

Bucketed writes must go through ``saveAsTable`` (the bucket metadata
lives in the catalog, not the files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    catalog table.  ``num_buckets`` should match downstream
    ``spark.sql.shuffle.partitions`` scale — at cluster scale, hundreds."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables; with matching bucket specs
    Catalyst elides both shuffles (verify: no Exchange in the plan)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
