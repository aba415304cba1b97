"""Property tests for the r6 curation operators: invariants that must
hold for ANY input, not just the fixtures."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spectrify_spark.functions import text as TX

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_texts = st.lists(
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs"), max_codepoint=0x2FF),
        max_size=60,
    ),
    min_size=1,
    max_size=8,
)


@settings(**_SETTINGS)
@given(texts=_texts)
def test_pii_redact_idempotent(spark, texts):
    """Redaction is a fixpoint: the replacement tokens themselves never
    match any PII pattern, so redact(redact(x)) == redact(x)."""
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    once = df.select(TX.pii_redact(F.col("t")).alias("r"))
    twice = once.select(TX.pii_redact(F.col("r")).alias("r"))
    assert [r.r for r in once.collect()] == [r.r for r in twice.collect()]


@settings(**_SETTINGS)
@given(
    values=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=2,
        max_size=50,
    ),
    n_bins=st.integers(min_value=2, max_value=6),
)
def test_quantile_bins_invariants(spark, values, n_bins):
    """Bins are in [1, n_bins], monotone in the value, and equal values
    share a bin."""
    from spectrify_spark.operators.quality import quantile_bins

    df = spark.createDataFrame([(v,) for v in values], ["v"])
    rows = quantile_bins(df, "v", n_bins=n_bins).collect()
    assert all(1 <= r.v_bin <= n_bins for r in rows)
    by_v = sorted(rows, key=lambda r: r.v)
    assert all(a.v_bin <= b.v_bin for a, b in zip(by_v, by_v[1:]))
    seen = {}
    for r in rows:
        assert seen.setdefault(r.v, r.v_bin) == r.v_bin


@settings(**_SETTINGS)
@given(texts=_texts)
def test_char_entropy_bounds(spark, texts):
    """0 <= H <= log2(#distinct chars); NULL only for empty text."""
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    rows = df.select("t", TX.char_entropy(F.col("t")).alias("h")).collect()
    for r in rows:
        if len(r.t) == 0:
            assert r.h is None
        else:
            assert r.h is not None and -1e-9 <= r.h
            # the operator rounds to 4 decimals — allow half-ulp slack
            assert r.h <= math.log2(max(2, len(set(r.t)))) + 5e-5
