"""ORC source/sink — a second columnar interchange format beside
parquet (sources/parquet.py).

The reference is parquet-only (spectrify/utils/parquet.py); ORC is the
other columnar format external-table consumers commonly require, and
Spark's native vectorized ORC reader/writer gives it to the engine for
free — this module is option plumbing plus the engine's conventions:

- compression default zlib (ORC's gzip-equivalent, mirroring the
  parquet sink's gzip default);
- optional hive-style ``partition_by`` layout, same as write_parquet;
- predicate pushdown / column pruning / partition pruning work exactly
  as for parquet (Catalyst treats both as v1 FileScan sources) — gated
  in tests/test_orc.py the same way test_plans.py gates parquet scans.

ORC TIMESTAMP is writer-local-time-normalized (no NTZ/LTZ split like
parquet's isAdjustedToUTC), so the parquet reader's NTZ workarounds do
not apply here; the UTC session timezone (session.py) keeps instants
stable end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_orc(
    df: DataFrame,
    path: str,
    compression: str = "zlib",
    partition_by: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as ORC with the engine's sink conventions."""
    writer = df.write.mode("overwrite").option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC table/directory (vectorized reader; pushdown and
    pruning verified in tests/test_orc.py)."""
    return spark.read.orc(path)
