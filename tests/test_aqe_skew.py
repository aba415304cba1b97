"""AQE skew-join handling, demonstrated: a planted hot key must make
the runtime SPLIT the skewed partition (SortMergeJoin(skew=true) in
the final adaptive plan) — the mechanism the session factory enables
(spark.sql.adaptive.skewJoin.enabled) and the docs lean on for skew
this side of explicit salting.

Pitfall pinned here: the split is DISALLOWED when the join feeds an
operator that requires the join key's partitioning (e.g. groupBy on
the same key) — splitting would break co-partitioning.  The probe
therefore finishes with a global aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    keep = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
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


def _frames(spark):
    # fact: 200k rows, ~95% on key 0; the pad column is referenced by
    # the aggregate so it SURVIVES into the shuffle (a constant-key
    # partition of bare longs compresses to a few KB and never crosses
    # the skew threshold), and md5 keeps it incompressible
    fact = spark.range(200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.md5(F.col("id").cast("string")).alias("pad"),
    )
    dim = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    return fact, dim


def test_aqe_splits_planted_hot_key(spark, skew_confs):
    fact, dim = _frames(spark)
    joined = fact.join(dim, on="k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.length("pad")).alias("p"),
    )
    got = joined.collect()[0]
    plan = joined._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "skew=true" in plan, (
        "AQE did not split the skewed partition:\n" + plan[:2000]
    )
    # correctness unaffected by the split: a broadcast join (no skew
    # machinery at all) must produce the identical aggregate
    ref = (
        _frames(spark)[0]
        .join(F.broadcast(_frames(spark)[1]), on="k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.length("pad")).alias("p"),
        )
        .collect()[0]
    )
    assert (got.n, got.s, got.p) == (ref.n, ref.s, ref.p)
