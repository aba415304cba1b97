"""JSONL source/sink: typed round-trip, corrupt-line quarantine, ORC
round-trip (Spark-native columnar alternative), and strict mode."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.utils import CapturedException

from spectrify_spark.sources.jsonl import (
    CORRUPT_COL,
    read_jsonl,
    split_corrupt,
    write_jsonl,
)
from spectrify_spark.sources.parquet import read_table

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def test_jsonl_roundtrip_documents(spark, tmp_path):
    src = read_table(spark, "/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    d = str(tmp_path / "docs_jsonl")
    write_jsonl(src, d)
    # gzip shards actually written
    files = [f for root, _, fs in os.walk(d) for f in fs if f.endswith(".gz")]
    assert files
    back = read_jsonl(spark, d, DOCS_SCHEMA)
    clean, corrupt = split_corrupt(back)
    assert corrupt.count() == 0
    assert sorted(clean.collect()) == sorted(src.collect())


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    d = tmp_path / "mixed"
    d.mkdir()
    lines = [
        '{"doc_id": 1, "text": "ok", "lang": "en"}',
        "this is not json",
        '{"doc_id": 2, "text": "also ok", "lang": "de"}',
        '{"doc_id": "NOT_A_NUMBER", "text": "type clash", "lang": "fr"}',
    ]
    (d / "part-0.jsonl").write_text("\n".join(lines))
    back = read_jsonl(spark, str(d), DOCS_SCHEMA)
    clean, corrupt = split_corrupt(back)
    assert clean.count() == 2
    bad = [r[CORRUPT_COL] for r in corrupt.collect()]
    assert len(bad) == 2 and "this is not json" in bad


def test_jsonl_strict_mode_raises(spark, tmp_path):
    d = tmp_path / "strict"
    d.mkdir()
    (d / "part-0.jsonl").write_text('{"doc_id": 1}\nnot json\n')
    with pytest.raises(Exception) as exc_info:
        read_jsonl(spark, str(d), DOCS_SCHEMA, strict=True).collect()
    assert isinstance(exc_info.value, CapturedException) or "Malformed" in str(
        exc_info.value
    )


def test_orc_roundtrip(spark, tmp_path):
    """ORC is Spark-native (no extra package): same writer options
    surface as parquet; verifies the engine is not parquet-locked."""
    src = read_table(spark, "/root/testdata/sf0.001/nation.parquet")
    d = str(tmp_path / "nation_orc")
    src.write.mode("overwrite").option("compression", "zstd").orc(d)
    back = spark.read.orc(d)
    assert sorted(back.collect()) == sorted(src.collect())
