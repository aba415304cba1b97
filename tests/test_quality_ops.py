"""Unit tests for corpus-statistics quality operators (unigram-LM
scoring, winsorization)."""

from __future__ import annotations

import math

import pytest

from spectrify_spark.operators.quality import unigram_logprob, winsorize


def test_unigram_logprob_known_corpus(spark):
    # corpus: "a a b" + "a c" -> counts a:3 b:1 c:1, total 5
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "   ")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert set(out) == {1, 2}  # whitespace-only doc dropped
    lp = lambda c: math.log(c / 5)  # noqa: E731
    assert out[1]["n_tokens"] == 3
    assert out[1]["avg_logprob"] == round((2 * lp(3) + lp(1)) / 3, 4)
    assert out[2]["n_tokens"] == 2
    assert out[2]["avg_logprob"] == round((lp(3) + lp(1)) / 2, 4)
    # the common-word doc scores higher than the rare-word doc
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]


def test_winsorize_clips_to_percentiles(spark):
    vals = list(range(1, 101))  # 1..100: p1 = 1.99, p99 = 99.01
    df = spark.createDataFrame([(v, float(v)) for v in vals], "k int, x double")
    out = {r["k"]: r["x_w"] for r in winsorize(df, "x", 0.01, 0.99).collect()}
    assert out[1] == 1.99
    assert out[100] == 99.01
    assert out[50] == 50.0  # interior untouched
    assert min(out.values()) == 1.99 and max(out.values()) == 99.01


def test_winsorize_custom_out_col(spark):
    df = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k int, x double")
    out = winsorize(df, "x", 0.0, 1.0, out_col="clipped")
    assert "clipped" in out.columns and "x" in out.columns


def test_fixed_n_per_stratum(spark):
    from spectrify_spark.operators.sampling import fixed_n_per_stratum

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(20)] + [(100, "c")]
    df = spark.createDataFrame(rows, "k bigint, s string")
    out = fixed_n_per_stratum(df, stratum_col="s", key_col="k", n=3)
    got = out.groupBy("s").count().collect()
    counts = {r["s"]: r["count"] for r in got}
    # exactly n where the stratum is big enough, the whole stratum otherwise
    assert counts == {"a": 3, "b": 3, "c": 1}
    # deterministic: same members on a second run
    again = fixed_n_per_stratum(df, stratum_col="s", key_col="k", n=3)
    assert sorted(r["k"] for r in out.collect()) == sorted(
        r["k"] for r in again.collect()
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        fixed_n_per_stratum(df, stratum_col="s", key_col="k", n=0)


def test_winsorize_validates_fractions(spark):
    from spectrify_spark.operators.quality import winsorize

    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    for lo, hi in ((-0.1, 0.5), (0.5, 1.2), (0.9, 0.1)):
        with pytest.raises(ValueError, match="winsorize requires"):
            winsorize(df, "x", lo=lo, hi=hi)


def test_winsorize_backtick_column_name(spark):
    from spectrify_spark.operators.quality import winsorize

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (100.0,)], ["odd name"]
    )
    out = winsorize(df, "odd name", lo=0.0, hi=0.5).collect()
    assert max(r["odd name_w"] for r in out) == 2.0
