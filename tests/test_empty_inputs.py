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


def test_graph_ops_on_empty(spark):
    from spectrify_spark.operators.graph import hits, pagerank

    e = spark.createDataFrame([], "src bigint, dst bigint")
    assert pagerank(e, iters=2).count() == 0
    out = hits(e, iters=1)
    assert out.count() == 0
    assert set(out.columns) == {"id", "kind", "score"}


def test_layout_ops_on_empty(spark, tmp_path):
    from spectrify_spark.operators.layout import compact_parquet, zorder_layout

    e = spark.createDataFrame([], "x bigint, y bigint")
    out = zorder_layout(e, [F.col("x"), F.col("y")], bits=8, n_partitions=2)
    assert out.count() == 0 and "z" in out.columns
    src = str(tmp_path / "empty_src")
    e.write.parquet(src)
    n = compact_parquet(spark, src, str(tmp_path / "empty_dst"))
    assert n >= 1
    assert spark.read.parquet(str(tmp_path / "empty_dst")).count() == 0


def test_sketch_ops_on_empty(spark):
    from spectrify_spark.operators.sketches import (
        kll_rollup,
        kll_sketches,
        theta_set_estimates,
        theta_sketches,
        topk_rollup,
        topk_sketches,
    )

    from pyspark.sql import functions as SF

    e = spark.createDataFrame([], "g bigint, v double, s string")
    assert kll_rollup(kll_sketches(e, ["g"], "v"), ["g"]).count() == 0
    sk = theta_sketches(e, ["g"], "s")
    assert sk.count() == 0
    # the union of zero sets is the empty set (estimate 0)...
    assert (
        sk.agg(
            SF.expr("theta_sketch_estimate(theta_union_agg(theta_sketch))")
        ).collect()[0][0]
        == 0
    )
    # ...but the intersection of zero sets is the INFINITE set:
    # theta_set_estimates documents (and passes through) DataSketches'
    # refusal rather than inventing a value
    import pytest as _pytest

    with _pytest.raises(Exception, match="infinite set|SketchesState"):
        theta_set_estimates(sk).collect()
    assert topk_rollup(topk_sketches(e, ["g"], "s"), ["g"]).count() == 0


def test_timeseries_anomaly_and_negative_sample_on_empty(spark):
    from spectrify_spark.operators.sampling import negative_sample
    from spectrify_spark.operators.timeseries import count_anomalies

    ev = spark.createDataFrame([], "event_id bigint, user_id bigint, ts timestamp")
    assert count_anomalies(ev, key_col="user_id", ts_col="ts").count() == 0
    pairs = spark.createDataFrame([], "q bigint, item bigint")
    assert negative_sample(pairs, query_col="q", pos_col="item", k=3).count() == 0


def test_scd2_lookup_on_empty_sides(spark):
    from spectrify_spark.operators.relational import scd2_history, scd2_lookup

    hist = scd2_history(
        spark.createDataFrame([], "k bigint, seq bigint, vts timestamp, p double"),
        key="k", ts="vts", tie_break="seq", attrs=["p"],
    )
    facts = spark.createDataFrame([(1, 7)], "event_id bigint, k bigint").selectExpr(
        "event_id", "k", "CAST('2024-01-01' AS TIMESTAMP) AS ts"
    )
    # empty history: facts survive with NULL attrs
    out = scd2_lookup(facts, hist, fact_key="k", fact_ts="ts", attrs=["p"]).collect()
    assert len(out) == 1 and out[0].p is None
    # empty facts: empty output with the right schema
    empty_facts = facts.filter("1=0")
    out2 = scd2_lookup(empty_facts, hist, fact_key="k", fact_ts="ts", attrs=["p"])
    assert out2.count() == 0 and "p" in out2.columns


def test_band_index_probe_empty_sides(spark, tmp_path):
    """Empty corpus index probed by a real delta yields only
    delta-internal pairs; empty delta against a real index yields
    nothing — no crashes, correct schemas."""
    from pyspark.sql import functions as F

    from spectrify_spark.operators.dedup import (
        near_dup_pairs_indexed,
        write_band_index,
    )

    schema = "doc_id bigint, text string"
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "a totally different text here")],
        schema,
    )
    empty = spark.createDataFrame([], schema)
    delta = spark.createDataFrame(
        [(10, "the quick brown fox jumps"), (11, "the quick brown fox jumped")],
        schema,
    )
    p_empty = str(tmp_path / "idx_empty")
    write_band_index(empty, p_empty, n_buckets=4)
    out = near_dup_pairs_indexed(spark, p_empty, delta, threshold=0.2, n_buckets=4)
    rows = out.collect()
    assert all(r.id_a >= 10 and r.id_b >= 10 for r in rows)  # delta-internal only
    p_real = str(tmp_path / "idx_real")
    write_band_index(corpus, p_real, n_buckets=4)
    out2 = near_dup_pairs_indexed(
        spark, p_real, empty, threshold=0.2, n_buckets=4
    )
    assert out2.count() == 0 and out2.columns == ["id_a", "id_b", "jaccard"]
    spark.catalog.clearCache()


def test_cm_and_triangles_empty(spark):
    from spectrify_spark.operators.graph import triangle_count
    from spectrify_spark.operators.sketches import cm_build, cm_point_estimates

    empty_items = spark.createDataFrame([], "item bigint")
    sk = cm_build(empty_items, "item", depth=2, width=8)
    assert sk.count() == 0
    probes = spark.createDataFrame([(1,)], "item bigint")
    est = cm_point_estimates(sk, probes, "item", width=8, depth=2).collect()
    # empty sketch -> estimate 0 for every probe (never a vanished row)
    assert [(r.item, r.est) for r in est] == [(1, 0)]
    edges = spark.createDataFrame([], "src bigint, dst bigint")
    assert triangle_count(edges).collect()[0].n_triangles == 0


def test_media_features_empty_frame(spark):
    from spectrify_spark.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        video_frame_features,
    )

    empty = spark.createDataFrame([], MEDIA_SCHEMA)
    assert audio_features(empty).count() == 0
    assert video_frame_features(empty).count() == 0
