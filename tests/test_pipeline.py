"""End-to-end curation pipeline (pipelines/training_data.py): the
operators composed into one lineage behave — gates drop, dedup removes
planted copies, splits are deterministic and exhaustive."""

from __future__ import annotations

from pyspark.sql import functions as F

from spectrify_spark.pipelines import curate
from spectrify_spark.sources.parquet import read_table


def _docs(spark):
    return read_table(spark, "/root/testdata/sf0.001/documents.parquet")


def test_curate_invariants(spark):
    docs = _docs(spark)
    out = curate(docs).persist()
    n_in, n_out = docs.count(), out.count()
    assert 0 < n_out <= n_in
    # schema contract
    assert set(out.columns) == {
        "id", "text_clean", "lang", "quality", "n_tokens", "split"
    }
    # splits exhaustive and deterministic (same result twice)
    splits = {r["split"] for r in out.select("split").distinct().collect()}
    assert splits <= {"train", "valid", "test"} and "train" in splits
    again = curate(docs)
    assert again.count() == n_out
    assert (
        out.select("id", "split")
        .exceptAll(again.select("id", "split"))
        .count()
        == 0
    )
    # gates actually hold on the output
    bad = out.filter((F.col("n_tokens") < 5)).count()
    assert bad == 0
    out.unpersist()


def test_curate_drops_planted_duplicates(spark):
    docs = _docs(spark)
    # plant: an exact copy and a near copy (one token appended) of doc 0
    base = docs.filter(F.col("doc_id") == 0).select("doc_id", "text")
    planted = base.select(
        F.lit(900_001).alias("doc_id"), F.col("text")
    ).unionByName(
        base.select(
            F.lit(900_002).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        )
    )
    enlarged = docs.select("doc_id", "text").unionByName(planted)
    out = curate(enlarged)
    survivors = {
        r["id"]
        for r in out.filter(F.col("id").isin(0, 900_001, 900_002)).collect()
    }
    # the original (lowest id) survives; the exact copy is gone; the
    # near copy is gone iff LSH caught it (J ~ 0.97 >> 0.8 threshold)
    assert survivors == {0}


def test_curate_chunks_carries_annotations(spark):
    from spectrify_spark.pipelines import curate_chunks

    docs = _docs(spark)
    out = curate_chunks(docs, chunk_size=32, overlap=8).persist()
    assert set(out.columns) == {
        "id", "chunk_id", "n_tokens", "chunk_text", "lang", "quality", "split"
    }
    rows = out.count()
    n_docs = curate(docs).count()
    assert rows >= n_docs  # every surviving doc yields >= 1 chunk
    # chunk sizes bounded; every chunk non-empty
    bad = out.filter((F.col("n_tokens") < 1) | (F.col("n_tokens") > 32)).count()
    assert bad == 0
    # multi-chunk docs: consecutive chunk ids from 0
    per_doc = (
        out.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("chunk_id").alias("mx"))
        .filter(F.col("n") != F.col("mx") + 1)
        .count()
    )
    assert per_doc == 0
    out.unpersist()


def test_curate_chunks_feeds_sequence_packing(spark):
    """The full pretraining-prep lineage: curate -> chunk -> pack.
    Chunks flow straight into pack_sequences on their token counts;
    every chunk lands in exactly one shard and no shard exceeds the
    budget (chunk sizes are <= chunk_size <= budget by construction)."""
    from spectrify_spark.operators.packing import pack_sequences
    from spectrify_spark.pipelines import curate_chunks

    chunks = curate_chunks(_docs(spark), chunk_size=32, overlap=8)
    packed = pack_sequences(
        chunks.select("id", "chunk_id", "n_tokens"),
        [F.col("id"), F.col("chunk_id")],
        "n_tokens",
        budget=128,
    ).persist()
    assert packed.count() == chunks.count()  # nothing dropped
    # shard = the shard a row STARTS in (pack_sequences contract), so a
    # shard's total may overflow by at most one row (< chunk_size)
    per_shard = packed.groupBy("shard_id").agg(F.sum("n_tokens").alias("t"))
    assert per_shard.filter(F.col("t") > 128 + 31).count() == 0
    # shards are dense from 0 (no empty shards skipped)
    ids = sorted(r["shard_id"] for r in per_shard.collect())
    assert ids == list(range(len(ids)))
    packed.unpersist()


def test_curate_decontaminates_against_bench(spark):
    """A doc sharing >= 3 distinct 5-grams with the benchmark must be
    dropped; clean docs and short-overlap docs survive."""
    from spectrify_spark.pipelines import curate

    contaminated = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, contaminated),  # verbatim benchmark text
            (2, "one two three four five six seven eight nine ten"),
            (3, "alpha beta gamma other words entirely different here now ok"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame([(100, contaminated)], "doc_id bigint, text string")
    with_bench = {r["id"] for r in curate(docs, min_tokens=1, bench=bench).collect()}
    without = {r["id"] for r in curate(docs, min_tokens=1).collect()}
    assert 1 in without
    assert with_bench == without - {1}


def test_curate_redact_pii_masks_planted_pii(spark):
    docs = _docs(spark).limit(50).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" reach me at someone@example.com or 10.0.0.1"),
        ),
    )
    out = curate(docs, redact_pii=True, min_tokens=1)
    joined = out.agg(
        F.sum(F.when(F.col("text_clean").contains("<EMAIL>"), 1).otherwise(0)).alias("e"),
        F.sum(F.when(F.col("text_clean").contains("@example.com"), 1).otherwise(0)).alias("raw"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert joined.e == joined.n and joined.raw == 0


def test_curate_line_dedup_drops_boilerplate(spark):
    rows = [
        (1, "unique content alpha beta\nSHARED BOILERPLATE LINE"),
        (2, "unique content gamma delta\nSHARED BOILERPLATE LINE"),
        (3, "SHARED BOILERPLATE LINE"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.id: r for r in curate(docs, line_dedup=True, min_tokens=1).collect()}
    # doc 3 was pure boilerplate -> dropped entirely
    assert 3 not in out
    # doc 1 keeps the shared line (first occurrence), doc 2 loses it
    assert "SHARED BOILERPLATE LINE" in out[1].text_clean
    assert "SHARED BOILERPLATE" not in out[2].text_clean
    assert "gamma delta" in out[2].text_clean


def test_curate_persist_survivors_identical(spark):
    """persist_survivors=True caches the exact-dedup survivors (they
    feed both the near-dup stage and the final anti-join) — results
    must be byte-identical to the recompute default."""
    docs = _docs(spark)
    base = sorted(map(tuple, curate(docs).collect()))
    cached = curate(docs, persist_survivors=True)
    assert sorted(map(tuple, cached.collect())) == base
