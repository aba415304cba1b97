"""Empty-input hardening: every operator family must return an EMPTY
frame with the right schema on empty input — not crash, not NULL-row.
A 100 TB pipeline routinely hits empty partitions/date-slices; the
operator that throws on them takes the whole job down."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


def test_dedup_ops_on_empty(spark):
    from spectrify_spark.operators import dedup as D

    e = _empty_docs(spark)
    assert D.dedup_exact(e, ["doc_id"]).count() == 0
    assert D.dedup_lines(e).count() == 0
    assert D.near_dup_pairs(e, "doc_id", "text").count() == 0


def test_quality_ops_on_empty(spark):
    from spectrify_spark.operators import quality as Q

    e = _empty_docs(spark)
    assert Q.unigram_logprob(e).count() == 0
    nums = spark.createDataFrame([], "v double")
    # percentile of an empty set is NULL -> clip keeps rows (none)
    assert Q.winsorize(nums, "v").count() == 0
    assert Q.robust_zscore(nums, "v").count() == 0
    assert Q.quantile_bins(nums, "v").count() == 0
    drift = Q.distribution_drift(e, e).collect()[0]
    # empty vs empty: union vocab empty -> all sums are NULL-safe zeros
    assert drift.total_variation is None or drift.total_variation == 0.0


def test_text_exprs_on_empty(spark):
    from spectrify_spark.functions import text as TX

    e = _empty_docs(spark)
    out = e.select(
        TX.pii_redact(F.col("text")).alias("r"),
        TX.char_entropy(F.col("text")).alias("ent"),
        TX.lang_id(F.col("text")).alias("lang"),
        TX.fingerprint(F.col("text")).alias("fp"),
    )
    assert out.count() == 0 and len(out.columns) == 4


def test_relational_ops_on_empty(spark):
    from spectrify_spark.operators import relational as R

    base = spark.createDataFrame([], "k bigint, v double")
    changes = spark.createDataFrame([], "k bigint, v double, op string")
    assert R.merge_changes(base, changes, "k").count() == 0
    assert R.table_diff(base, base, "k").count() == 0


def test_validate_on_empty(spark):
    from spectrify_spark.operators import validate as V

    e = spark.createDataFrame([], "v double")
    rep = {r.check_name: r for r in V.validate(
        e, [V.not_null("v"), V.in_range("v", 0, 1), V.unique("v")]
    ).collect()}
    # no rows -> no violations; null fraction over 0 rows is NULL-safe
    assert rep["in_range(v,0,1)"].metric == 0.0
    assert rep["unique(v)"].metric == 0.0


def test_sampling_and_packing_on_empty(spark):
    from spectrify_spark.operators.packing import pack_sequences
    from spectrify_spark.operators.sampling import weighted_sample

    e = _empty_docs(spark).withColumn("source", F.lit("s"))
    assert weighted_sample(
        e, stratum_col="source", key_col="doc_id", weights={}, default_weight=1.0
    ).count() == 0
    sized = spark.createDataFrame([], "doc_id bigint, n_tokens bigint")
    assert pack_sequences(sized, [F.col("doc_id")], "n_tokens", budget=10).count() == 0


def test_null_text_rows_are_null_safe(spark):
    """NULL text must flow through the text family as NULL/dropped —
    never crash, never fabricate values."""
    from spectrify_spark.functions import text as TX
    from spectrify_spark.operators.dedup import dedup_lines
    from spectrify_spark.operators.quality import unigram_logprob

    df = spark.createDataFrame(
        [(1, None), (2, "a b\na b")], "doc_id bigint, text string"
    )
    r = {x.doc_id: x for x in df.select(
        "doc_id",
        TX.pii_redact(F.col("text")).alias("red"),
        TX.char_entropy(F.col("text")).alias("h"),
        TX.lang_id(F.col("text")).alias("lang"),
        TX.fingerprint(F.col("text")).alias("fp"),
    ).collect()}
    assert r[1].red is None and r[1].h is None and r[1].lang == "unknown"
    assert r[2].h is not None
    # dedup_lines keeps the NULL-text doc (visible, zero kept lines)
    dl = {x.doc_id: x for x in dedup_lines(df).collect()}
    assert dl[1].n_kept == 0 and dl[1].text_clean is None
    assert dl[2].text_clean == "a b"
    # token-based scoring silently drops the tokenless doc
    assert {x.doc_id for x in unigram_logprob(df).collect()} == {2}
