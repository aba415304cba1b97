"""JSON-lines source/sink — the interchange format training-data
pipelines actually receive (web-crawl dumps, API exports, labeling-tool
output).

Not a reference operator (the reference moves data exclusively as
UNLOAD CSV — spectrify/export.py); this extends the engine's ingest
surface the same way ``streaming/`` extends its execution modes.

Design points:

- **Explicit schema, never inference.**  ``spark.read.json`` without a
  schema runs a full inference pass over the data (a second 100 TB
  scan) and silently widens types from whatever records it happens to
  see.  Ingest contracts are declared, like the reference's
  whitelist-validated schemas.
- **Corrupt records are data, not exceptions.**  PERMISSIVE mode with a
  ``_corrupt_record`` column: malformed lines land in quarantine output
  instead of killing the 40th hour of a batch (mirrors the CSV path's
  malformed-timestamp counter).  ``strict=True`` switches to FAILFAST
  for pipelines that prefer to die.
- gzip-compressed ``.jsonl.gz`` shards are handled natively by Spark's
  text-based reader (non-splittable, one task per shard — identical
  scheduling to the reference's gzip CSV).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    strict: bool = False,
) -> DataFrame:
    """Read JSON-lines with a declared schema.

    In the default permissive mode the returned frame carries
    ``_corrupt_record`` (NULL for clean rows; the raw line for
    malformed ones) — route them with :func:`split_corrupt`.
    """
    if strict:
        return (
            spark.read.schema(schema).option("mode", "FAILFAST").json(path)
        )
    # StructType.add mutates the receiver — never .add the caller's schema
    with_corrupt = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )
    return (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, corrupt_raw_lines).

    Persists the parsed frame first: Spark refuses queries whose
    referenced columns are ONLY the corrupt-record column on a raw scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — caching the
    parse is the engine's documented pattern, and both halves share the
    single materialized parse instead of re-parsing the corpus twice.
    Call ``.unpersist()`` on the input when done with both outputs.
    """
    df = df.persist()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, corrupt


def write_jsonl(
    df: DataFrame,
    path: str,
    compression: str | None = "gzip",
    max_records_per_file: int | None = None,
) -> None:
    """JSON-lines sink (one object per line), gzip-sharded by default
    like the reference's UNLOAD transport."""
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.json(path)
