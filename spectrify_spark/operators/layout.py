"""Data-layout operators: multi-dimensional clustering keys.

The reference's parquet sink writes in arrival order
(``/root/reference/spectrify/transform.py`` fans out one file per
source split); at 100 TB the WRITE ORDER is a first-class query
optimization — parquet row-group min/max statistics only prune scans
when rows with nearby key values are physically adjacent.  Sorting by
a single column clusters one dimension and destroys the others;
Z-ordering (bit-interleaving) gives every participating dimension
locality, so selective filters on ANY of them skip most row groups.
This is the same technique Delta/Iceberg expose as ``OPTIMIZE ZORDER
BY`` — here it is a plain Catalyst bit-arithmetic expression, fully
codegen'd, no UDF.

Usage at scale::

    df.repartitionByRange(N, zorder_key(...)) \\
      .sortWithinPartitions(zorder_key(...)) \\
      .write.parquet(...)

(range-partition + local sort = total order without a single-reducer
global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integer)
    column into one Z-value: bit ``b`` of column ``i`` lands at output
    position ``b * len(cols) + i``.

    Pure integer bit arithmetic (shift/and/or) — exact on every
    engine, whole-stage-codegen'd, and cheap enough to compute inline
    during a write job.  Callers bucket raw values into
    ``[0, 2**bits)`` first (modulo id, days-since-epoch, quantile
    rank, ...); with ``bits=16`` and 2 columns the key fits in 32 bits
    of a long.
    """
    n = len(cols)
    if bits * n > 63:
        raise ValueError(
            f"zorder_key: {bits} bits x {n} cols = {bits * n} interleaved "
            "bits exceeds the 63 usable bits of a signed long; reduce "
            "bits (e.g. bits=63//len(cols)) to avoid sign-bit overflow"
        )
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        cl = c.cast("long")
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cl, b).bitwiseAND(F.lit(1)),
                    b * n + i,
                )
            )
    return z


def zorder_layout(
    df: DataFrame,
    cols: list[Column],
    bits: int = 16,
    n_partitions: int | None = None,
    out_col: str = "z",
) -> DataFrame:
    """Return ``df`` with a Z-value column, range-partitioned and
    locally sorted by it — the write-side layout step.

    Range partitioning (sampled boundaries, no single reducer) plus
    ``sortWithinPartitions`` yields a global Z-order across output
    files without a global sort; each parquet file then covers a
    compact Z-range, i.e. a small hyper-rectangle of the key space,
    and min/max pruning works for filters on any interleaved column.
    """
    out = df.withColumn(out_col, zorder_key(cols, bits))
    if n_partitions:
        out = out.repartitionByRange(n_partitions, F.col(out_col))
    else:
        out = out.repartitionByRange(F.col(out_col))
    return out.sortWithinPartitions(out_col)


def compact_parquet(
    spark,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    zorder_cols: list[Column] | None = None,
    bits: int = 16,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into files of
    ~``target_file_bytes`` (the OPTIMIZE half of Delta/Iceberg's
    OPTIMIZE [ZORDER BY]).

    Small files are the silent scale killer the reference's
    one-file-per-source-shard layout produces
    (/root/reference/spectrify/convert.py writes one parquet per CSV
    shard): at 100 TB that is millions of files — NameNode/S3-listing
    pressure, a scheduler task per file, and row groups too small for
    effective column skipping.  The file count is derived from the
    dataset's ACTUAL on-disk bytes via the Hadoop FileSystem API (works
    on any FS Spark can reach), not row counts, so compressed width is
    respected.

    With ``zorder_cols`` the rewrite also Z-orders
    (:func:`zorder_layout`): compaction and multi-dimensional
    clustering in the same single pass over the data.

    Returns the target file count.
    """
    import math
    import os

    src_abs = os.path.realpath(src)
    dst_abs = os.path.realpath(dst)
    if (
        dst_abs == src_abs
        or dst_abs.startswith(src_abs + os.sep)
        or src_abs.startswith(dst_abs + os.sep)
    ):
        raise ValueError(
            f"compact_parquet: src {src!r} and dst {dst!r} overlap (equal "
            "or one nested under the other); mode('overwrite') would "
            "destroy the source dataset mid-read — write to a sibling "
            "path and swap instead"
        )

    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(src)
    fs = path.getFileSystem(hconf)
    size = fs.getContentSummary(path).getLength()
    n = max(1, math.ceil(size / float(target_file_bytes)))
    df = spark.read.parquet(src)
    if zorder_cols:
        out = zorder_layout(df, zorder_cols, bits=bits, n_partitions=n)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    return n
