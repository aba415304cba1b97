"""Gzipped pipe-delimited CSV source/sink with the reference's transport
conventions: ``sep='|'``, backslash escape, no quoting, empty string ==
NULL, gzip codec (reference spectrify/convert.py:83, spectrify/utils/
s3.py:81-117, spectrify/export.py:10-17).

Spark-native replacements for three reference operators:

- O5 gzip-CSV streaming scan  -> ``read_unload_csv`` (codec detection,
  splitting, and task-per-file scheduling are built in; gzip stays
  non-splittable here exactly as it is for the reference — one task per
  ``.gz`` shard).
- O2 UNLOAD CSV sink          -> ``write_unload_csv`` (+ manifest).
- O6–O10 typed projection     -> the ``schema`` argument: Spark's
  vectorized CSV parser does the string->typed casts the reference runs
  per-cell in Python; the one semantic Spark's parser lacks —
  ``'t'/'f'`` booleans — is applied as a ``when()`` expression after a
  string read of those columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spectrify_spark.functions.casts import parse_bool_tf, parse_timestamp_lenient

#: Reference transport defaults (spectrify/convert.py:83).
CSV_OPTIONS = {
    "sep": "|",
    "escape": "\\",
    "quote": "",  # csv.QUOTE_NONE
    "nullValue": "",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss[.SSSSSS]",
    "dateFormat": "yyyy-MM-dd",
}


def _expr_cols_as_string_schema(
    schema: T.StructType,
) -> tuple[T.StructType, list[str], list[str]]:
    """Booleans travel as 't'/'f' which Spark's CSV parser won't cast,
    and timestamps may carry 'T' separators / UTC offsets the fixed
    ``timestampFormat`` silently NULLs; read both as strings and convert
    with expressions afterwards."""
    fields, bool_cols, ts_cols = [], [], []
    for f in schema.fields:
        if isinstance(f.dataType, T.BooleanType):
            bool_cols.append(f.name)
            fields.append(T.StructField(f.name, T.StringType(), True))
        elif isinstance(f.dataType, T.TimestampType):
            ts_cols.append(f.name)
            fields.append(T.StructField(f.name, T.StringType(), True))
        else:
            fields.append(f)
    return T.StructType(fields), bool_cols, ts_cols


def read_unload_csv(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType,
    strict_bools: bool = True,
    strict_timestamps: bool = False,
    **overrides: str,
) -> DataFrame:
    """Read UNLOAD-convention CSV (possibly gzipped) into a typed DataFrame.

    Timestamp columns go through the ciso8601-equivalent lenient parse
    (space or 'T' separator, optional fraction, optional UTC offset —
    reference spectrify/utils/timestamps.py:22-32); ``strict_timestamps``
    raises on unparseable non-empty cells, the default NULLs them (audit
    with :func:`malformed_timestamp_counts`)."""
    opts = {**CSV_OPTIONS, **overrides}
    read_schema, bool_cols, ts_cols = _expr_cols_as_string_schema(schema)
    df = spark.read.options(**opts).schema(read_schema).csv(paths)
    for c in bool_cols:
        df = df.withColumn(c, parse_bool_tf(F.col(c), strict=strict_bools))
    for c in ts_cols:
        df = df.withColumn(
            c, parse_timestamp_lenient(F.col(c), strict=strict_timestamps)
        )
    return df


def malformed_timestamp_counts(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType,
    **overrides: str,
) -> dict[str, int]:
    """Per-timestamp-column count of non-empty cells the lenient parse
    cannot read — the load-quality counter the reference surfaces as a
    ciso8601 ValueError per cell, aggregated here in one distributed
    pass (a single partial-agg job, no driver-side row iteration)."""
    opts = {**CSV_OPTIONS, **overrides}
    read_schema, _, ts_cols = _expr_cols_as_string_schema(schema)
    if not ts_cols:
        return {}
    df = spark.read.options(**opts).schema(read_schema).csv(paths)
    aggs = [
        F.count(
            F.when(
                F.nullif(F.col(c), F.lit("")).isNotNull()
                & parse_timestamp_lenient(F.col(c)).isNull(),
                1,
            )
        ).alias(c)
        for c in ts_cols
    ]
    row = df.agg(*aggs).collect()[0]
    return {c: int(row[c]) for c in ts_cols}


def write_unload_csv(
    df: DataFrame,
    path: str,
    compression: str = "gzip",
    max_records_per_file: int | None = None,
    **overrides: str,
) -> None:
    """Write UNLOAD-convention CSV shards.

    ``max_records_per_file`` approximates the reference's
    ``MAXFILESIZE 256 mb`` shard cap (reference spectrify/export.py:16)
    — at cluster scale, bound shard size so downstream per-file
    parallelism stays balanced.  Booleans are emitted as 't'/'f' to keep
    the transport round-trippable.
    """
    opts = {**CSV_OPTIONS, **overrides, "compression": compression}
    opts.pop("nullValue", None)  # writer side: null -> empty string is default
    opts["emptyValue"] = ""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, T.BooleanType):
            out = out.withColumn(
                f.name, F.when(F.col(f.name), "t").when(~F.col(f.name), "f")
            )
    writer = out.write.mode("overwrite").options(**opts)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.csv(path)
