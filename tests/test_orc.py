"""ORC source/sink: round-trip fidelity, pushdown/pruning plan
properties (same bar test_plans.py sets for parquet), partitioned
layout + external-table DDL."""

from __future__ import annotations

from pyspark.sql import functions as F

from spectrify_spark.catalog import ddl as DDL
from spectrify_spark.sources.orc import read_orc, write_orc
from spectrify_spark.sources.parquet import read_table


def test_orc_roundtrip_equals_parquet_source(spark, sf_dir, tmp_path):
    src = read_table(spark, f"{sf_dir}/orders.parquet")
    dest = str(tmp_path / "orders_orc")
    write_orc(src, dest)
    back = read_orc(spark, dest)
    assert back.schema == src.schema
    assert back.count() == src.count()
    a = src.agg(F.sum("o_orderkey"), F.sum("o_totalprice")).collect()[0]
    b = back.agg(F.sum("o_orderkey"), F.sum("o_totalprice")).collect()[0]
    assert list(a) == list(b)


def test_orc_scan_pushdown_and_pruning(spark, sf_dir, tmp_path):
    """Filter must reach the ORC scan (PushedFilters) and the projection
    must prune to the referenced columns — the same scale contract the
    parquet gates pin."""
    src = read_table(spark, f"{sf_dir}/orders.parquet")
    dest = str(tmp_path / "orders_orc")
    write_orc(src, dest)
    q = (
        read_orc(spark, dest)
        .filter(F.col("o_orderkey") < 100)
        .select("o_orderkey", "o_totalprice")
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderkey" in plan
    import re

    reads = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert reads and all(len(r.split(",")) <= 2 for r in reads)


def test_orc_partitioned_layout_prunes_partitions(spark, sf_dir, tmp_path):
    src = read_table(spark, f"{sf_dir}/orders.parquet").withColumn(
        "o_year", F.year("o_orderdate")
    )
    dest = str(tmp_path / "orders_orc_part")
    write_orc(src, dest, partition_by=["o_year"])
    years = [
        r["o_year"]
        for r in read_orc(spark, dest).select("o_year").distinct().collect()
    ]
    one = read_orc(spark, dest).filter(F.col("o_year") == years[0])
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "o_year" in plan
    assert one.count() > 0


def test_orc_external_table_ddl_executes(spark, sf_dir, tmp_path):
    src = read_table(spark, f"{sf_dir}/nation.parquet")
    dest = str(tmp_path / "nation_orc")
    write_orc(src, dest)
    spark.sql("DROP TABLE IF EXISTS nation_orc_t")
    ddl = DDL.orc_table_ddl("nation_orc_t", src.schema, dest)
    assert "USING ORC" in ddl
    DDL.create(spark, ddl)
    assert spark.sql("SELECT COUNT(*) FROM nation_orc_t").collect()[0][0] == src.count()
    spark.sql("DROP TABLE IF EXISTS nation_orc_t")
