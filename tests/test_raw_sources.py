"""Raw-file ingestion (sources/raw.py): binaryFile media ingest and
line-delimited text ingest."""

from __future__ import annotations

from pyspark.sql import functions as F

from spectrify_spark.sources.raw import read_media_files, read_text_docs


def test_read_media_files_kinds_and_payloads(spark, tmp_path):
    d = tmp_path / "media"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG-fake" * 10)
    (d / "b.mp3").write_bytes(b"ID3-fake" * 5)
    (d / "c.unknownext").write_bytes(b"??")
    df = read_media_files(spark, str(d))
    rows = {r.source_path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert rows["a.png"].kind == "image" and rows["a.png"].mime == "image/png"
    assert rows["b.mp3"].kind == "audio"
    # unknown extension ingests (never silently dropped), tagged binary
    assert rows["c.unknownext"].kind == "binary" and rows["c.unknownext"].mime is None
    assert bytes(rows["a.png"].payload) == b"\x89PNG-fake" * 10
    assert rows["a.png"].n_bytes == 90
    # ids deterministic across reads
    again = {r.source_path: r.media_id for r in read_media_files(spark, str(d)).collect()}
    assert all(again[r.source_path] == r.media_id for r in rows.values())


def test_read_media_files_glob_restricts_listing(spark, tmp_path):
    d = tmp_path / "media2"
    d.mkdir()
    (d / "a.png").write_bytes(b"x")
    (d / "b.wav").write_bytes(b"y")
    df = read_media_files(spark, str(d), glob="*.png")
    assert df.count() == 1 and df.collect()[0].kind == "image"


def test_read_media_metadata_projection_prunes_payload(spark, tmp_path):
    """Selecting only metadata must not read payload bytes: the scan's
    ReadSchema excludes `content`."""
    d = tmp_path / "media3"
    d.mkdir()
    (d / "a.png").write_bytes(b"z" * 1000)
    df = read_media_files(spark, str(d)).select("media_id", "n_bytes", "kind")
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "content" not in read_schema[0]


def test_read_text_docs(spark, tmp_path):
    d = tmp_path / "txt"
    d.mkdir()
    (d / "one.txt").write_text("hello world\n\nshort\n")
    (d / "two.txt").write_text("hello world\nanother doc here\n")
    df = read_text_docs(spark, str(d), min_chars=3)
    rows = df.collect()
    # empty line gated out; 'short' passes min_chars=3
    assert sorted(r.text for r in rows) == [
        "another doc here", "hello world", "hello world", "short"
    ]
    # same text in DIFFERENT files -> different ids (provenance in hash)
    ids = {(r.source.rsplit("/", 1)[-1], r.text): r.doc_id for r in rows}
    assert ids[("one.txt", "hello world")] != ids[("two.txt", "hello world")]
    # deterministic across reads
    again = read_text_docs(spark, str(d), min_chars=3).collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in rows}


def test_read_text_docs_feeds_curation(spark, tmp_path):
    from spectrify_spark.pipelines import curate

    d = tmp_path / "txt2"
    d.mkdir()
    (d / "corpus.txt").write_text(
        "\n".join(f"the quick brown fox number {i} jumps over the lazy dog" for i in range(20))
    )
    docs = read_text_docs(spark, str(d))
    out = curate(docs, min_tokens=3)
    assert 0 < out.count() <= 20
    assert set(out.columns) == {"id", "text_clean", "lang", "quality", "n_tokens", "split"}


def test_read_table_schema_memo_invalidates_on_rewrite(spark, tmp_path):
    """r18: read_table memoizes the Spark-inferred schema per
    (path, mtime) so repeated reads of an immutable table skip the
    footer-inference job.  A REWRITE of the path must invalidate the
    memo — the new schema is picked up, never the stale one."""
    from pyspark.sql import functions as F

    from spectrify_spark.sources.parquet import read_table

    p = str(tmp_path / "t")
    spark.range(5).select(F.col("id").alias("a")).write.parquet(p)
    first = read_table(spark, p)
    assert [f.name for f in first.schema.fields] == ["a"]
    # second read hits the memo, same schema + rows
    again = read_table(spark, p)
    assert again.schema == first.schema and again.count() == 5

    # rewrite with a DIFFERENT schema: the directory mtime changes,
    # the memo entry dies, and the new schema is inferred
    spark.range(3).select(
        F.col("id").alias("a"), (F.col("id") * 2).alias("b")
    ).write.mode("overwrite").parquet(p)
    new = read_table(spark, p)
    assert [f.name for f in sorted(new.schema.fields, key=lambda f: f.name)] == ["a", "b"]
    assert new.count() == 3
