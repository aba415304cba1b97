"""Dynamic partition pruning, demonstrated: a selective dim filter must
prune the partitioned fact scan AT RUNTIME (dynamicpruningexpression in
the scan's PartitionFilters) — with a date-partitioned 100 TB fact,
this is the difference between scanning one month and scanning all of
it when the filter lives on the dimension."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spectrify_spark.sources.parquet import read_table


@pytest.fixture(scope="module")
def partitioned_orders(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dpp") / "orders_by_month")
    o = read_table(spark, f"{sf_dir}/orders.parquet").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    o.write.partitionBy("o_month").parquet(d)
    return d


def test_dim_filter_prunes_fact_partitions_at_runtime(
    spark, partitioned_orders, tmp_path
):
    fact = spark.read.parquet(partitioned_orders)
    # an INDEPENDENT dim table (DPP does not fire for dims derived from
    # the fact itself), with a selective literal filter on a
    # non-partition attribute — the textbook star-schema probe
    all_months = sorted(
        r.o_month for r in fact.select("o_month").distinct().collect()
    )
    dim_path = str(tmp_path / "month_dim")
    spark.createDataFrame(
        [(m, i) for i, m in enumerate(all_months)], "o_month string, idx int"
    ).write.parquet(dim_path)
    months = spark.read.parquet(dim_path).filter(F.col("idx") < 2)
    joined = fact.join(months, on="o_month").agg(
        F.count(F.lit(1)).alias("n")
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "dynamicpruning" in plan.lower(), (
        "fact scan not dynamically pruned:\n" + plan[:1500]
    )
