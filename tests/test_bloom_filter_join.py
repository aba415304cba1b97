"""Runtime Bloom-filter join injection, demonstrated: a selective dim
filter on a NON-partition join column injects a bloom filter into the
fact scan side (BloomFilterMightContain / bloom_filter_agg in the
plan), cutting shuffled fact rows before the join — the row-level
sibling of dynamic partition pruning for the 100 TB star join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spectrify_spark.sources.parquet import read_table


@pytest.fixture()
def bloom_confs(spark):
    keep = {
        # thresholds sized so test-scale tables qualify (defaults: 10MB
        # creation side, 10GB application-side scan)
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in keep}
    for k, v in keep.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_selective_dim_injects_bloom_filter(spark, sf_dir, bloom_confs):
    li = read_table(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    o = read_table(spark, f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).agg(
        F.count(F.lit(1)).alias("n")
    )
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0].lower()
    assert "bloomfilter" in plan or "might_contain" in plan, (
        "no runtime bloom filter injected:\n" + plan[:1500]
    )
