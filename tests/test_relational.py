"""Relational operator tests: semantics on small frames + plan-shape
assertions (pushdown, broadcast, TakeOrderedAndProject) — the plans we
rely on at 100 TB, checked at unit scale."""

import pytest

from pyspark.sql import functions as F

from spectrify_spark.operators import relational as R
from spectrify_spark.sources.parquet import read_table


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_projection_prunes_scan(spark, sf_dir):
    li = read_table(spark, f"{sf_dir}/lineitem.parquet")
    df = R.scan_project(li, ["l_orderkey", "l_extendedprice"])
    plan = _plan(df)
    readschema = [line for line in plan.splitlines() if "ReadSchema" in line]
    assert readschema and "l_orderkey" in readschema[0]
    assert "l_quantity" not in readschema[0]


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    li = read_table(spark, f"{sf_dir}/lineitem.parquet")
    df = R.filter_range(li, "l_quantity", 10.0, 20.0).select("l_orderkey")
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_quantity,10.0)" in plan


def test_broadcast_hint_in_plan(spark, sf_dir):
    c = read_table(spark, f"{sf_dir}/customer.parquet")
    n = read_table(spark, f"{sf_dir}/nation.parquet")
    df = R.equi_join(c, n, c["c_nationkey"] == n["n_nationkey"], broadcast_right=True)
    assert "BroadcastHashJoin" in _plan(df)


def test_topk_uses_take_ordered(spark, sf_dir):
    o = read_table(spark, f"{sf_dir}/orders.parquet")
    df = R.topk(o, [F.col("o_totalprice").desc(), F.col("o_orderkey")], 5)
    assert "TakeOrderedAndProject" in _plan(df)
    assert df.count() == 5


def test_semi_anti_join_semantics(spark):
    left = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    right = spark.createDataFrame([(2, "x"), (2, "y")], ["k", "v"])
    semi = R.semi_join(left, right, "k")
    anti = R.anti_join(left, right, "k")
    assert [r.k for r in semi.collect()] == [2]  # no duplication from 2 matches
    assert sorted(r.k for r in anti.collect()) == [1, 3]


def test_hash_agg_and_rollup(spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)], ["g1", "g2", "v"]
    )
    agg = R.hash_agg(df, ["g1"], {"s": F.sum("v")})
    assert {(r.g1, r.s) for r in agg.collect()} == {("a", 3), ("b", 3)}
    roll = R.rollup_agg(df, ["g1"], {"s": F.sum("v")})
    assert {(r.g1, r.s) for r in roll.collect()} == {("a", 3), ("b", 3), (None, 6)}


def test_set_ops(spark):
    a = spark.createDataFrame([(1,), (2,), (2,)], ["k"])
    b = spark.createDataFrame([(2,), (3,)], ["k"])
    assert sorted(r.k for r in R.set_union(a, b).collect()) == [1, 2, 3]
    assert [r.k for r in R.set_intersect(a, b).collect()] == [2]
    assert [r.k for r in R.set_except(a, b).collect()] == [1]


def test_global_row_numbers_match_single_sort(spark):
    df = spark.createDataFrame([(i, (i * 37) % 100) for i in range(200)], ["id", "v"])
    out = R.global_row_numbers(
        df, [F.col("v"), F.col("id")], num_partitions=5
    ).collect()
    # ids must be exactly 1..N and agree with the naive global sort
    want = sorted(((r.v, r.id) for r in out))
    got = [(r.v, r.id) for r in sorted(out, key=lambda r: r.row_id)]
    assert [r.row_id for r in sorted(out, key=lambda r: r.row_id)] == list(
        range(1, 201)
    )
    assert got == want


def test_point_in_interval_join(spark):
    import datetime

    d = datetime.datetime
    points = spark.createDataFrame(
        [
            (1, 10, d(2024, 1, 1, 0, 30)),
            (2, 10, d(2024, 1, 1, 5, 0)),   # outside any interval
            (3, 20, d(2024, 1, 1, 2, 59)),
        ],
        ["pid", "key_p", "ts"],
    )
    intervals = spark.createDataFrame(
        [
            (100, 10, d(2024, 1, 1, 0, 0), d(2024, 1, 1, 1, 0)),
            (200, 20, d(2024, 1, 1, 1, 30), d(2024, 1, 1, 3, 0)),
        ],
        ["iid", "key_i", "lo", "hi"],
    )
    out = R.point_in_interval_join(
        points, intervals, "key_p", "key_i", "ts", "lo", "hi"
    )
    assert {(r.pid, r.iid) for r in out.collect()} == {(1, 100), (3, 200)}


def test_window_rank_top_n(spark):
    df = spark.createDataFrame(
        [("u1", 10), ("u1", 30), ("u1", 20), ("u2", 5)], ["u", "v"]
    )
    top = R.window_rank(df, ["u"], [F.col("v").desc()], top_n=1)
    assert {(r.u, r.v) for r in top.collect()} == {("u1", 30), ("u2", 5)}


# ------------------------------------------------------------ table diff


def _diff_tables(spark):
    left = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k bigint, v string, x double",
    )
    right = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B2", 20.0), (3, "c", None), (5, "e", 50.0)],
        "k bigint, v string, x double",
    )
    return left, right


def test_table_diff_statuses(spark):
    from spectrify_spark.operators.relational import table_diff

    left, right = _diff_tables(spark)
    out = {r["k"]: r["diff_status"] for r in table_diff(left, right, "k").collect()}
    # k=1 identical, k=3 identical incl. NULL==NULL -> absent from diff
    assert out == {2: "changed", 4: "removed", 5: "added"}


def test_table_diff_carries_both_sides(spark):
    from spectrify_spark.operators.relational import table_diff

    left, right = _diff_tables(spark)
    row = {
        r["k"]: r for r in table_diff(left, right, "k").collect()
    }[2]
    assert (row["v_left"], row["v_right"]) == ("b", "B2")


def test_diff_summary_counts_and_identity(spark):
    from spectrify_spark.operators.relational import diff_summary

    left, right = _diff_tables(spark)
    counts = {
        r["diff_status"]: r["n"] for r in diff_summary(left, right, "k").collect()
    }
    assert counts == {"changed": 1, "removed": 1, "added": 1}
    # identical tables -> empty diff (the reconciliation gate)
    assert diff_summary(left, left, "k").count() == 0


def test_table_diff_validates_compare_cols(spark):
    from spectrify_spark.operators.relational import table_diff

    left, right = _diff_tables(spark)
    with pytest.raises(ValueError, match="compare_cols missing"):
        table_diff(left, right, "k", compare_cols=["nope"])


def test_cdc_merge_then_diff_reconciles(spark):
    """The intended composition: apply a changeset with merge_changes,
    then table_diff against the independently-built expected table —
    empty diff proves the snapshot."""
    from spectrify_spark.operators.relational import diff_summary, merge_changes

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    changes = spark.createDataFrame(
        [(2, "b2", "U"), (3, None, "D"), (4, "d", "I")],
        "k bigint, v string, op string",
    )
    snapshot = merge_changes(base, changes, key="k")
    expected = spark.createDataFrame(
        [(1, "a"), (2, "b2"), (4, "d")], "k bigint, v string"
    )
    assert diff_summary(snapshot, expected, "k").count() == 0


def test_scd2_lookup_point_in_time_contract(spark):
    """Hand-built history with an instant-boundary tie: the fact AT a
    version's valid_from sees that version (inclusive start); two
    versions at the same instant resolve to the higher tie_break; facts
    before the first version get NULLs; attrs fill from ONE version row
    (struct fill) even when an attr is NULL in the winning version."""
    import datetime

    from spectrify_spark.operators.relational import scd2_history, scd2_lookup

    d = datetime.datetime
    # change log: customer 1 has versions at t1 (seq 10), t2 (seq 20
    # AND seq 21 — same-instant pair), customer 2 one version
    log = spark.createDataFrame(
        [
            (1, 10, d(2024, 1, 1), 100.0),
            (1, 20, d(2024, 1, 5), 200.0),
            (1, 21, d(2024, 1, 5), None),   # same instant, higher seq, NULL attr
            (2, 30, d(2024, 2, 1), 999.0),
        ],
        ["cust", "seq", "vts", "price"],
    )
    hist = scd2_history(log, key="cust", ts="vts", tie_break="seq", attrs=["price"])
    facts = spark.createDataFrame(
        [
            (100, 1, d(2023, 12, 31)),  # before first version -> NULLs
            (101, 1, d(2024, 1, 1)),    # exactly at v10 -> sees v10
            (102, 1, d(2024, 1, 4)),    # between -> v10
            (103, 1, d(2024, 1, 5)),    # at the tied instant -> seq 21 (NULL price!)
            (104, 1, d(2024, 3, 1)),    # after -> seq 21
            (105, 2, d(2024, 2, 2)),    # customer 2 -> seq 30
        ],
        ["event_id", "cust", "ts"],
    )
    out = {
        r.event_id: (r.seq, r.price)
        for r in scd2_lookup(
            facts, hist, fact_key="cust", fact_ts="ts",
            attrs=["seq", "price"], tie_break="seq",
        ).collect()
    }
    assert out[100] == (None, None)
    assert out[101] == (10, 100.0)
    assert out[102] == (10, 100.0)
    # struct fill: seq 21's NULL price must NOT fall back to seq 20's 200.0
    assert out[103] == (21, None)
    assert out[104] == (21, None)
    assert out[105] == (30, 999.0)
