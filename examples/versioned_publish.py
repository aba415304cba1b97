"""Versioned atomic publishing tour (catalog/publish.py, r11-r13):
pointer-flip publishes, time travel, the vacuum grace window, and the
two-tier pruned reads the r13 rollup sidecars enable — version-level
min/max for range probes, version-level union blooms for point
lookups.

    python examples/versioned_publish.py /root/testdata/sf0.001 /tmp/pub_demo
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from spectrify_spark.catalog.publish import (
    current_version,
    publish,
    published_pruned_scan,
    published_pruned_scan_eq,
    read_published,
    vacuum,
)
from spectrify_spark.session import get_spark
from spectrify_spark.sources.parquet import read_table


def main(sf_dir: str, work_dir: str) -> None:
    spark = get_spark("versioned-publish-example")
    o = read_table(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    root = f"{work_dir}/orders_ds"

    # v1: half the table; v2: the full table, range-laid and
    # pre-indexed (per-file stats + blooms + both version rollups)
    publish(o.filter(F.col("o_orderkey") % 2 == 0), root)
    v2 = publish(
        o.repartitionByRange(4, F.col("o_orderkey")).sortWithinPartitions(
            "o_orderkey"
        ),
        root,
        stats_cols=["o_orderkey"],
        bloom_cols=["o_orderkey"],
    )
    print(
        f"published v{v2}; pointer={current_version(root)}; "
        f"current rows={read_published(spark, root).count()}, "
        f"time-travel v1 rows={read_published(spark, root, version=1).count()}"
    )

    # range probe: in-domain falls through to per-file pruning;
    # out-of-domain is ruled out by the version rollup (one JSON read)
    hi = o.agg(F.max("o_orderkey")).collect()[0][0]
    in_range = published_pruned_scan(spark, root, "o_orderkey", 100, 500)
    out_range = published_pruned_scan(
        spark, root, "o_orderkey", hi + 10, hi + 20
    )
    print(
        f"range probe [100,500): {in_range.count()} rows; "
        f"out-of-domain probe: {out_range.count()} rows "
        "(version ruled out by the min/max rollup)"
    )

    # point lookup: present key through both bloom tiers; absent key
    # ruled out of the whole version by the union bloom
    key = (
        o.filter(F.col("o_orderkey") <= hi / 2)
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
    )
    present = published_pruned_scan_eq(spark, root, "o_orderkey", key)
    absent = published_pruned_scan_eq(spark, root, "o_orderkey", hi + 12345)
    print(
        f"point lookup key={key}: {present.count()} row(s); "
        f"absent key: {absent.count()} rows "
        "(version ruled out by the union bloom)"
    )

    # crash safety (r13 commit markers): a version dir landed WITHOUT
    # its commit marker — a publish that died before committing — is
    # not a readable snapshot, never consumes a vacuum window slot,
    # and is swept without touching published versions
    o.limit(5).write.parquet(f"{root}/v={v2 + 1}")
    try:
        read_published(spark, root, version=v2 + 1)
    except FileNotFoundError as e:
        print(f"crashed partial v{v2 + 1} refused: {str(e)[:60]}...")

    # the grace window: keep only the newest version; v1 ages out and
    # the crashed partial is swept; the pointed version is never
    # removable
    removed = vacuum(root, keep_versions=1)
    print(
        f"vacuum(keep=1) removed versions {removed}; "
        f"current still readable: {read_published(spark, root).count()} rows"
    )


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/pub_demo",
    )
