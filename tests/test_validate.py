"""Data-quality validation suite (operators/validate.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spectrify_spark.operators import validate as V


def _report(df, checks):
    return {r.check_name: r for r in V.validate(df, checks).collect()}


def test_validate_mixed_pass_fail(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (2, 999.0, None)],
        "id bigint, v double, flag string",
    )
    rep = _report(
        df,
        [
            V.not_null("flag"),
            V.not_null("v"),
            V.in_range("v", 0, 100),
            V.accepted_values("flag", ["A", "B"]),
            V.unique("id"),
        ],
    )
    assert rep["not_null(flag)"].passed is False
    assert abs(rep["not_null(flag)"].metric - 1 / 3) < 1e-6
    assert rep["not_null(v)"].passed is True
    assert rep["in_range(v,0,100)"].metric == 1.0  # the 999
    assert rep["accepted_values(flag)"].passed is True  # NULL not counted
    assert rep["unique(id)"].metric == 1.0  # one duplicated id row


def test_validate_not_null_threshold(spark):
    df = spark.createDataFrame([(1,), (None,), (None,), (None,)], "v int")
    rep = _report(df, [V.not_null("v", max_null_frac=0.8)])
    assert rep["not_null(v)"].passed is True
    rep = _report(df, [V.not_null("v", max_null_frac=0.5)])
    assert rep["not_null(v)"].passed is False


def test_validate_foreign_key_orphans(spark):
    fact = spark.createDataFrame([(1,), (2,), (9,), (None,)], "fk int")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    rep = _report(fact, [V.foreign_key("fk", dim, "k")])
    r = rep["foreign_key(fk->k)"]
    assert r.metric == 1.0 and r.passed is False  # only the 9; NULL exempt


def test_validate_requires_checks(spark):
    df = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError):
        V.validate(df, [])


def test_validate_single_agg_pass(spark, sf_dir):
    """All row-level checks must share ONE aggregation: the plan carries
    a single pair of partial/final aggregates over one scan."""
    from spectrify_spark.sources.parquet import read_table

    li = read_table(spark, f"{sf_dir}/lineitem.parquet")
    df = V.validate(
        li,
        [
            V.not_null("l_extendedprice"),
            V.in_range("l_quantity", 1, 50),
            V.accepted_values("l_returnflag", ["N", "A", "R"]),
        ],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
