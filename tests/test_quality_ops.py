"""Unit tests for corpus-statistics quality operators (unigram-LM
scoring, winsorization)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

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


# ----------------------------------------------------- distribution drift


def test_distribution_drift_zero_for_identical_corpora(spark):
    from spectrify_spark.operators.quality import distribution_drift

    a = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "gamma alpha")], "doc_id bigint, text string"
    )
    row = distribution_drift(a, a).collect()[0]
    assert row["kl_ab"] == 0.0 and row["kl_ba"] == 0.0
    assert row["js_divergence"] == 0.0 and row["total_variation"] == 0.0


def test_distribution_drift_matches_numpy_reference(spark):
    import numpy as np

    from spectrify_spark.operators.quality import distribution_drift

    texts_a = ["alpha beta beta", "gamma alpha alpha"]
    texts_b = ["beta beta delta", "delta delta gamma"]
    a = spark.createDataFrame(list(enumerate(texts_a)), "doc_id bigint, text string")
    b = spark.createDataFrame(list(enumerate(texts_b)), "doc_id bigint, text string")
    row = distribution_drift(a, b, smoothing=0.5).collect()[0]

    from collections import Counter

    ca = Counter(w for t in texts_a for w in t.split())
    cb = Counter(w for t in texts_b for w in t.split())
    vocab = sorted(set(ca) | set(cb))
    s, v = 0.5, len(vocab)
    na, nb = sum(ca.values()), sum(cb.values())
    p = np.array([(ca[w] + s) / (na + s * v) for w in vocab])
    q = np.array([(cb[w] + s) / (nb + s * v) for w in vocab])
    m = (p + q) / 2
    assert row["kl_ab"] == pytest.approx(float((p * np.log(p / q)).sum()), abs=1e-6)
    assert row["kl_ba"] == pytest.approx(float((q * np.log(q / p)).sum()), abs=1e-6)
    assert row["js_divergence"] == pytest.approx(
        float(((p * np.log(p / m) + q * np.log(q / m)) / 2).sum()), abs=1e-6
    )
    assert row["total_variation"] == pytest.approx(
        float(np.abs(p - q).sum() / 2), abs=1e-6
    )
    # JS is symmetric and bounded by ln 2; TV in [0, 1]
    assert 0 < row["js_divergence"] < 0.6932
    assert 0 < row["total_variation"] < 1


def test_distribution_drift_survives_disjoint_vocab(spark):
    from spectrify_spark.operators.quality import distribution_drift

    a = spark.createDataFrame([(1, "only in a")], "doc_id bigint, text string")
    b = spark.createDataFrame([(1, "totally different words")], "doc_id bigint, text string")
    row = distribution_drift(a, b).collect()[0]
    import math

    assert all(
        math.isfinite(row[c])
        for c in ("kl_ab", "kl_ba", "js_divergence", "total_variation")
    )
    assert row["kl_ab"] > 0


# ------------------------------------------------------- robust z-score


def test_robust_zscore_known_values(spark):
    from spectrify_spark.operators.quality import robust_zscore

    # values 1..5 + outlier 100: median 3.5? -> with 6 values exact
    # percentile(0.5) interpolates; use 7 values for a crisp median
    df = spark.createDataFrame(
        [(float(v),) for v in (1, 2, 3, 4, 5, 6, 100)], "x double"
    )
    out = {r["x"]: r["x_rz"] for r in robust_zscore(df, "x").collect()}
    # median = 4, |x-4| = [3,2,1,0,1,2,96], MAD = 2
    import pytest as _pt

    assert out[4.0] == _pt.approx(0.0)
    assert out[100.0] == _pt.approx(96 / (2 * 1.4826), rel=1e-9)
    assert out[1.0] == _pt.approx(-3 / (2 * 1.4826), rel=1e-9)
    # the outlier is flagged hard; inliers are mild
    assert abs(out[100.0]) > 10 and all(abs(out[v]) < 2 for v in (1.0, 6.0))


def test_robust_zscore_constant_column_is_null(spark):
    from spectrify_spark.operators.quality import robust_zscore

    df = spark.createDataFrame([(5.0,), (5.0,), (5.0,)], "x double")
    assert all(r["x_rz"] is None for r in robust_zscore(df, "x").collect())


def test_robust_zscore_resists_outlier_unlike_mean(spark):
    """The property that justifies MAD: the outlier's own score stays
    extreme even though it would wreck a mean/stddev z-score."""
    from spectrify_spark.operators.quality import robust_zscore

    rows = [(float(v),) for v in range(100)] + [(1e9,)]
    df = spark.createDataFrame(rows, "x double")
    out = robust_zscore(df, "x").collect()
    scores = {r["x"]: r["x_rz"] for r in out}
    assert abs(scores[1e9]) > 1000
    assert abs(scores[50.0]) < 1.0


def test_quantile_bins_equal_frequency(spark):
    from spectrify_spark.operators.quality import quantile_bins

    df = spark.range(1, 1001).select(F.col("id").cast("double").alias("v"))
    out = quantile_bins(df, "v", n_bins=4)
    counts = {r.v_bin: r.n for r in out.groupBy("v_bin").agg(F.count(F.lit(1)).alias("n")).collect()}
    # 1..1000 quartiles -> 4 bins of 250
    assert counts == {1: 250, 2: 250, 3: 250, 4: 250}


def test_quantile_bins_ties_share_a_bin(spark):
    from spectrify_spark.operators.quality import quantile_bins

    df = spark.createDataFrame([(1.0,)] * 8 + [(2.0,)] * 2, ["v"])
    out = quantile_bins(df, "v", n_bins=2)
    bins = {
        v: {r.v_bin for r in out.filter(F.col("v") == v).collect()}
        for v in (1.0, 2.0)
    }
    # all equal values land in one bin (unlike ntile's arbitrary split)
    assert len(bins[1.0]) == 1 and len(bins[2.0]) == 1
    assert bins[1.0] != bins[2.0]


def test_quantile_bins_validates_n_bins(spark):
    import pytest

    from spectrify_spark.operators.quality import quantile_bins

    df = spark.createDataFrame([(1.0,)], ["v"])
    with pytest.raises(ValueError):
        quantile_bins(df, "v", n_bins=1)


def test_winsorize_grouped_per_group_bounds(spark):
    from spectrify_spark.operators.quality import winsorize_grouped

    # group a: 1..100; group b: 1000..1100 — global bounds would mangle b
    rows = [("a", float(i)) for i in range(1, 101)] + [
        ("b", float(i)) for i in range(1000, 1101)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize_grouped(df, "v", "g", lo=0.10, hi=0.90)
    stats = {
        r.g: (r.mn, r.mx)
        for r in out.groupBy("g").agg(
            F.min("v_w").alias("mn"), F.max("v_w").alias("mx")
        ).collect()
    }
    # each group clipped within ITS OWN band
    assert 10 <= stats["a"][0] < 12 and 89 < stats["a"][1] <= 91
    assert 1009 < stats["b"][0] < 1012 and 1089 < stats["b"][1] <= 1091


def test_winsorize_grouped_validates(spark):
    from spectrify_spark.operators.quality import winsorize_grouped

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError):
        winsorize_grouped(df, "v", "g", lo=0.9, hi=0.1)
