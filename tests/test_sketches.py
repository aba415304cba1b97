"""Sketch aggregates (operators/sketches.py) and SCD2 history
(relational.scd2_history): merge losslessness, error bounds, and
interval-chain invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from spectrify_spark.operators.relational import scd2_history
from spectrify_spark.operators.sketches import (
    hll_rollup,
    hll_sketches,
    quantile_profile,
)


def test_hll_rollup_matches_exact_at_small_cardinality(spark):
    # 3 shards x 400 overlapping users; rollup must merge (not sum) —
    # summing per-shard distincts would give 1200, the truth is 600
    df = spark.range(1200).selectExpr("id % 3 AS shard", "id % 600 AS user_id")
    fine = hll_sketches(df, ["shard"], "user_id")
    merged = hll_rollup(fine, group_cols=[], estimate_col="est")
    est = merged.collect()[0]["est"]
    assert abs(est - 600) <= 0.02 * 600


def test_hll_sketch_table_is_reaggregable(spark):
    # the same fine-grain sketch table serves two different rollup axes
    df = spark.range(4000).selectExpr(
        "id % 4 AS region", "id % 5 AS day", "id % 1000 AS user_id"
    )
    fine = hll_sketches(df, ["region", "day"], "user_id")
    by_region = {
        r["region"]: r["approx_distinct"]
        for r in hll_rollup(fine, ["region"]).collect()
    }
    by_day = {
        r["day"]: r["approx_distinct"]
        for r in hll_rollup(fine, ["day"]).collect()
    }
    exact_region = {
        r["region"]: r["n"]
        for r in df.groupBy("region").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    exact_day = {
        r["day"]: r["n"]
        for r in df.groupBy("day").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for k, v in by_region.items():
        assert abs(v - exact_region[k]) <= max(2, 0.02 * exact_region[k])
    for k, v in by_day.items():
        assert abs(v - exact_day[k]) <= max(2, 0.02 * exact_day[k])


def test_quantile_profile_rank_error_bound(spark):
    df = spark.range(10_000).selectExpr("id % 2 AS g", "CAST(id AS DOUBLE) AS x")
    probs = (0.25, 0.5, 0.75)
    prof = quantile_profile(df, ["g"], "x", probs, accuracy=1000)
    rows = {r["g"]: r["quantiles"] for r in prof.collect()}
    n_per_group = 5000
    for g, qs in rows.items():
        xs = sorted(
            r["x"] for r in df.filter(F.col("g") == g).select("x").collect()
        )
        for p, q in zip(probs, qs):
            # rank error <= n/accuracy around the target rank
            rank = xs.index(q)
            assert abs(rank - p * (n_per_group - 1)) <= n_per_group / 1000 + 1


def test_scd2_intervals_chain_and_single_current(spark):
    rows = [
        (1, 10, "2024-01-01", "a"),
        (1, 11, "2024-02-01", "b"),
        (1, 12, "2024-03-01", "c"),
        (2, 20, "2024-01-15", "x"),
    ]
    df = spark.createDataFrame(
        rows, ["k", "seq", "ts", "attr"]
    ).withColumn("ts", F.to_timestamp("ts"))
    hist = scd2_history(df, key="k", ts="ts", tie_break="seq", attrs=["attr"])
    got = sorted(
        (r["k"], r["seq"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in hist.collect()
    )
    # exactly one open (current) version per key
    assert sum(1 for g in got if g[4]) == 2
    # successive versions chain: valid_to == next valid_from
    k1 = [g for g in got if g[0] == 1]
    assert [g[3] for g in k1[:-1]] == [g[2] for g in k1[1:]]
    assert k1[-1][3] is None and k1[-1][4]


def test_profile_table_approx_mode(spark):
    from spectrify_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (None, "a", None)],
        "k bigint, s string, x double",
    )
    prof = {r["column"]: r for r in profile_table(df, approx=True).collect()}
    assert prof["k"]["n_nulls"] == 1 and prof["k"]["min_val"] == 1.0
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["min_val"] is None
    assert prof["x"]["max_val"] == 2.5
    # approx distinct within HLL++ tolerance at tiny cardinality = exact
    assert prof["s"]["n_distinct"] == 1
    # one scan regardless of column count: no Expand in the approx plan
    plan = profile_table(df, approx=True)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


# ---------------------------------------------------- r8: KLL / theta / topk


def test_kll_rollup_merge_is_lossless_on_n_and_tight_on_rank(spark):
    """Per-shard KLL sketches merged globally: stream length n is exact
    (KLL tracks it losslessly), and the merged p50 estimate must sit
    within 2% rank of the true median of the UNION."""
    from spectrify_spark.operators.sketches import kll_rollup, kll_sketches

    df = spark.range(10_000).selectExpr(
        "id % 4 AS shard", "CAST(id AS DOUBLE) AS v"
    )
    fine = kll_sketches(df, ["shard"], "v", k=800)
    out = kll_rollup(fine, [], probabilities=(0.5,)).collect()[0]
    assert out["n"] == 10_000
    # true median of 0..9999 is ~4999.5; 2% rank = 200 positions
    assert abs(out["p50"] - 4999.5) <= 200


def test_kll_sketch_table_serves_multiple_rollup_axes(spark):
    from spectrify_spark.operators.sketches import kll_rollup, kll_sketches

    df = spark.range(6000).selectExpr(
        "id % 3 AS region", "id % 2 AS day", "CAST(id AS DOUBLE) AS v"
    )
    fine = kll_sketches(df, ["region", "day"], "v")
    by_region = kll_rollup(fine, ["region"], probabilities=(0.5,))
    assert {r.region: r.n for r in by_region.collect()} == {0: 2000, 1: 2000, 2: 2000}
    global_ = kll_rollup(fine, [], probabilities=(0.5,)).collect()[0]
    assert global_["n"] == 6000


def test_theta_set_estimates_exact_mode(spark):
    """Two groups with engineered overlap, cardinality << 2^lgk so the
    sketches are in exact mode: union and intersection estimates must
    be exactly right."""
    from spectrify_spark.operators.sketches import (
        theta_set_estimates,
        theta_sketches,
    )

    # group 0: users 0..599; group 1: users 400..999 -> union 1000,
    # intersection 200
    df = spark.sql(
        "SELECT 0 AS g, id AS u FROM range(0, 600) "
        "UNION ALL SELECT 1 AS g, id AS u FROM range(400, 1000)"
    )
    out = theta_set_estimates(theta_sketches(df, ["g"], "u")).collect()[0]
    assert out["union_distinct"] == 1000
    assert out["intersection_distinct"] == 200


def test_topk_rollup_exact_under_capacity_and_mergeable(spark):
    """Counts are exact when distinct items fit the tracked capacity,
    and combining per-shard states equals a direct global count."""
    from spectrify_spark.operators.sketches import topk_rollup, topk_sketches

    df = spark.range(900).selectExpr(
        "id % 3 AS shard", "CONCAT('item', id % 9) AS item_col"
    )
    fine = topk_sketches(df, ["shard"], "item_col")
    out = {r.item: r.est_count for r in topk_rollup(fine, [], k=9).collect()}
    assert out == {f"item{i}": 100 for i in range(9)}


# ---------------------------------------------------------------- count-min


def test_cm_estimates_overcount_only_and_merge_is_exact(spark):
    """CM guarantees exact <= est (never undercounts), and merging
    per-shard sketches equals the single-pass sketch exactly (counter
    additivity) — the 100 TB shard-rollup property."""
    from pyspark.sql import functions as F

    from spectrify_spark.operators.sketches import (
        cm_build,
        cm_merge,
        cm_point_estimates,
    )

    rows = [(i % 37,) for i in range(5000)] + [(999,)] * 500
    df = spark.createDataFrame(rows, "item bigint")
    sk = cm_build(df, "item", depth=4, width=16)  # narrow -> collisions
    probes = spark.createDataFrame([(0,), (5,), (999,), (12345,)], "item bigint")
    est = {r.item: r.est for r in cm_point_estimates(sk, probes, "item", width=16).collect()}
    exact = {r.item: r.n for r in df.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()}
    for item in (0, 5, 999):
        assert est[item] >= exact[item], (item, est[item], exact[item])
    assert est[12345] >= 0  # absent item: overcount-only, never negative

    # shard merge == single build
    s1 = cm_build(df.filter(F.col("item") % 2 == 0), "item", depth=4, width=16)
    s2 = cm_build(df.filter(F.col("item") % 2 == 1), "item", depth=4, width=16)
    merged = cm_merge(s1, s2)
    est_m = {r.item: r.est for r in cm_point_estimates(merged, probes, "item", width=16).collect()}
    assert est_m == est


def test_cm_build_validates():
    import pytest

    from spectrify_spark.operators.sketches import cm_build

    with pytest.raises(ValueError):
        cm_build(None, "x", depth=0)


def test_cm_point_estimates_rejects_mismatched_depth(spark):
    """A probe depth larger than the build depth would min phantom
    cnt=0 rows into a silent total undercount — must raise instead."""
    import pytest
    from pyspark.sql import functions as F

    from spectrify_spark.operators.sketches import cm_build, cm_point_estimates

    df = spark.range(100).select((F.col("id") % 10).alias("item"))
    sk = cm_build(df, "item", depth=2, width=16)
    probes = spark.range(3).select(F.col("id").alias("item"))
    with pytest.raises(ValueError, match="does not match the"):
        cm_point_estimates(sk, probes, "item", width=16, depth=4)
    # matching depth still estimates
    est = cm_point_estimates(sk, probes, "item", width=16, depth=2)
    assert est.count() == 3


def test_cm_point_estimates_rejects_mismatched_width(spark):
    """A mismatched probe width hashes items into the WRONG buckets,
    whose counters can undercut the true count — the silent break of
    the overcount-only guarantee; the width stored on the sketch by
    cm_build must match, and merged shards must agree on one width."""
    import pytest
    from pyspark.sql import functions as F

    from spectrify_spark.operators.sketches import (
        cm_build,
        cm_merge,
        cm_point_estimates,
    )

    df = spark.range(100).select((F.col("id") % 10).alias("item"))
    sk = cm_build(df, "item", depth=2, width=16)
    probes = spark.range(3).select(F.col("id").alias("item"))
    with pytest.raises(ValueError, match="build width 16"):
        cm_point_estimates(sk, probes, "item", width=32, depth=2)
    # merging shards of different widths is caught at probe time
    other = cm_build(df, "item", depth=2, width=32)
    mixed = cm_merge(sk, other)
    with pytest.raises(ValueError, match="different widths"):
        cm_point_estimates(mixed, probes, "item", width=16, depth=2)
    # a legacy sketch without the width column skips the width check
    legacy = sk.drop("width")
    est = cm_point_estimates(legacy, probes, "item", width=16, depth=2)
    assert est.count() == 3
