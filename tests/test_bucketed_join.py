"""Bucketed co-located join: the zero-shuffle join strategy for
repeatedly-joined big tables at 100 TB.

A fact-fact join (orders x lineitem at full scale) shuffles BOTH sides
on every query; writing the tables bucketed by the join key amortizes
that shuffle into the write — every subsequent join is Exchange-free
because matching buckets are read co-located.  This test pins the
property end-to-end: bucketed saveAsTable -> SortMergeJoin with ZERO
Exchange nodes -> row-identical result to the plain join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spectrify_spark.sources.parquet import read_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    o = read_table(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    li = read_table(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    for name, df, key in (
        ("b_orders", o, "o_orderkey"),
        ("b_lineitem", li, "l_orderkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .format("parquet")
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "b_orders", "b_lineitem"
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _join(spark, left, right):
    return (
        spark.table(left)
        .join(
            spark.table(right),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


def test_bucketed_join_is_exchange_free(spark, bucketed_tables):
    left, right = bucketed_tables
    # force the join path (not broadcast) so the bucketing does the work
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _join(spark, left, right)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "bucketed join shuffled — co-location lost:\n" + plan
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    bucketed = {(r.o_orderkey, r.n_lines, r.sum_price) for r in _join(spark, left, right).collect()}
    o = read_table(spark, f"{sf_dir}/orders.parquet")
    li = read_table(spark, f"{sf_dir}/lineitem.parquet")
    plain = {
        (r.o_orderkey, r.n_lines, r.sum_price)
        for r in (
            o.join(li, o["o_orderkey"] == li["l_orderkey"])
            .groupBy("o_orderkey")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            )
            .collect()
        )
    }
    assert bucketed == plain
