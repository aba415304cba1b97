"""Catalog registration: expose the engine's tables to raw Spark SQL.

The reference's users ultimately query through SQL (Spectrum/Redshift);
this module gives the same entry point natively — register the parquet
tables once, then any ANSI SQL the reference's downstream engines could
run works via ``spark.sql`` against the same Catalyst planner the
DataFrame operators use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spectrify_spark.sources.parquet import read_table

#: Driver testdata tables (TESTDATA.md).
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Register each ``{sf_dir}/{name}.parquet`` as a temp view (nanos
    timestamps handled by read_table).  Returns the registered names."""
    names = tables or TABLES
    for name in names:
        read_table(spark, f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)
    return names


def sql(spark: SparkSession, query: str, sf_dir: str | None = None) -> DataFrame:
    """Run raw SQL; optionally (re)register the testdata views first."""
    if sf_dir is not None:
        register_tables(spark, sf_dir)
    return spark.sql(query)
