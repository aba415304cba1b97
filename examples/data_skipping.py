"""Data-skipping tour: file-level min/max stats + per-file bloom
indexes on plain parquet (the r11 additions) — range probes prune by
stats, point lookups prune by bloom, and both compose with the
Z-order/compaction layout story.

    python examples/data_skipping.py /root/testdata/sf0.001 /tmp/skip_demo
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from spectrify_spark.operators.layout import (
    prune_files,
    prune_files_eq,
    pruned_scan,
    pruned_scan_eq,
    write_file_bloom,
    write_file_stats,
)
from spectrify_spark.session import get_spark
from spectrify_spark.sources.parquet import read_table


def main(sf_dir: str, work_dir: str) -> None:
    spark = get_spark("data-skipping-example")
    li = read_table(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )

    print("== range-laid layout + min/max stats index ==")
    ranged = f"{work_dir}/ranged"
    (
        li.repartitionByRange(8, F.col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(ranged)
    )
    n = write_file_stats(spark, ranged, ["l_orderkey"])
    hi = li.agg(F.max("l_orderkey")).collect()[0][0]
    lo_b, hi_b = int(hi * 0.4), int(hi * 0.45)
    keep, total = prune_files(spark, ranged, "l_orderkey", lo_b, hi_b)
    rows = pruned_scan(spark, ranged, "l_orderkey", lo_b, hi_b).count()
    print(
        f"indexed {n} files; range probe [{lo_b}, {hi_b}) reads "
        f"{len(keep)}/{total} files -> {rows} rows"
    )

    print("== hash-scattered layout + bloom index for point lookups ==")
    scattered = f"{work_dir}/scattered"
    li.repartition(8, F.col("l_orderkey")).write.mode("overwrite").parquet(
        scattered
    )
    write_file_stats(spark, scattered, ["l_orderkey"])
    write_file_bloom(spark, scattered, ["l_orderkey"], m_bits=65536)
    key = int(hi // 2)
    key = (
        li.filter(F.col("l_orderkey") <= key)
        .agg(F.max("l_orderkey"))
        .collect()[0][0]
    )
    keep_mm, total = prune_files(spark, scattered, "l_orderkey", key, key + 1)
    keep_bl, _ = prune_files_eq(spark, scattered, "l_orderkey", key)
    rows = pruned_scan_eq(spark, scattered, "l_orderkey", key).count()
    print(
        f"point lookup key={key}: min/max keeps {len(keep_mm)}/{total} "
        f"(scattered layout defeats range stats); bloom keeps "
        f"{len(keep_bl)}/{total} -> {rows} rows"
    )


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/skip_demo",
    )
