"""Scale rehearsal for the file-stats skipping index (r11): lay
sf0.1 lineitem out as N disjoint key ranges, index it, and compare a
selective range probe as (a) a plain filtered scan of the whole
dataset vs (b) the stats-pruned scan reading only intersecting files.

On local disk with the OS page cache the I/O win is the FLOOR of the
benefit; on S3 at 100 TB the pruned scan also skips the per-file GET +
footer round-trips, which dominate listing-bound workloads.  The
rehearsal also reports the planning-side numbers that matter at scale:
files read vs total, and stats-index size vs dataset size.

Run: python tools/skipping_rehearsal.py [sf_dir] [n_files] [mult]
(``mult`` row-replicates the table to move the dataset out of the
trivially-cached regime — the crossover demonstrator).
"""

from __future__ import annotations

import glob
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from spectrify_spark.operators.layout import (
    prune_files,
    pruned_scan,
    write_file_stats,
)
from spectrify_spark.session import get_spark
from spectrify_spark.sources.parquet import read_table

RUNS = 5


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_spark("skipping-rehearsal")
    li = read_table(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
    )
    if mult > 1:
        li = li.withColumn(
            "__r", F.explode(F.array(*[F.lit(i) for i in range(mult)]))
        ).drop("__r")
    work = tempfile.mkdtemp(prefix="skip_rehearsal_") + "/ds"
    (
        li.repartitionByRange(n_files, F.col("l_orderkey"))
        .sortWithinPartitions("l_orderkey")
        .write.parquet(work)
    )
    t0 = time.monotonic()
    n_indexed = write_file_stats(spark, work, ["l_orderkey"])
    t_index = time.monotonic() - t0
    hi = li.agg(F.max("l_orderkey")).collect()[0][0]
    lo_b, hi_b = int(hi * 0.40), int(hi * 0.45)  # ~5% key range

    keep, total = prune_files(spark, work, "l_orderkey", lo_b, hi_b)
    kept_bytes = sum(os.path.getsize(f) for f in keep)
    data_bytes = sum(
        os.path.getsize(f) for f in glob.glob(f"{work}/part-*.parquet")
    )
    stats_bytes = sum(
        os.path.getsize(f)
        for f in glob.glob(f"{work}/_spectrify_file_stats/*.parquet")
    )

    def timed(fn):
        ts = []
        for _ in range(RUNS):
            t = time.monotonic()
            fn()
            ts.append(time.monotonic() - t)
        return statistics.median(ts)

    full = timed(
        lambda: spark.read.parquet(work)
        .filter((F.col("l_orderkey") >= lo_b) & (F.col("l_orderkey") < hi_b))
        .agg(F.sum("l_extendedprice"), F.count(F.lit(1)))
        .collect()
    )
    pruned = timed(
        lambda: pruned_scan(spark, work, "l_orderkey", lo_b, hi_b)
        .agg(F.sum("l_extendedprice"), F.count(F.lit(1)))
        .collect()
    )
    # equality of results, not just speed
    a = (
        spark.read.parquet(work)
        .filter((F.col("l_orderkey") >= lo_b) & (F.col("l_orderkey") < hi_b))
        .agg(
            F.sum("l_extendedprice").alias("s"), F.count(F.lit(1)).alias("n")
        )
        .collect()[0]
    )
    b = (
        pruned_scan(spark, work, "l_orderkey", lo_b, hi_b)
        .agg(
            F.sum("l_extendedprice").alias("s"), F.count(F.lit(1)).alias("n")
        )
        .collect()[0]
    )
    assert (a["s"], a["n"]) == (b["s"], b["n"]), (a, b)

    print(
        f"files: {len(keep)}/{total} read ({100 * len(keep) / total:.0f}%)  "
        f"bytes touched {kept_bytes / 1024 / 1024:.1f}/"
        f"{data_bytes / 1024 / 1024:.1f} MiB "
        f"({100 * kept_bytes / data_bytes:.0f}%)  "
        f"index build {t_index:.2f}s over {n_indexed} files  "
        f"stats {stats_bytes / 1024:.1f} KiB "
        f"({100 * stats_bytes / data_bytes:.3f}% of data)"
    )
    print(
        f"probe median wall: full-scan {full:.3f}s  pruned {pruned:.3f}s  "
        f"speedup {full / pruned:.2f}x  (results identical: "
        f"{b['n']} rows)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
