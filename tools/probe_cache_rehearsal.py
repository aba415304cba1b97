"""Scale rehearsal for the r13 probe cache (layout._read_stats_rows):
at 10^3-10^6 files the skipping decision itself becomes a metadata
workload — every probe used to re-read the whole stats/bloom table
(one row per file).  The cache keys the parsed rows on a
(name, size, mtime) fingerprint of the index parts, so only the FIRST
probe after a build/append pays the read.

This rehearsal builds a dataset with N files, indexes it, and times
``prune_files`` with the cache cleared before every run (cold) vs
primed (warm), splitting out the live-file listing cost that remains
on both paths (freshness requires it: files appended after the index
build must be kept).  On local disk the cold read is pyarrow over a
single part — already ms — so the local delta is the FLOOR of the
win; at object-store scale the cold path is hundreds of MB of GETs
per probe and the warm path is a listing plus a dict lookup.

Run: python tools/probe_cache_rehearsal.py [n_files] [rows]
"""

from __future__ import annotations

import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from spectrify_spark.operators import layout as L
from spectrify_spark.session import get_spark

RUNS = 7


def med_ms(fn) -> float:
    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1000)
    return statistics.median(ts)


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    spark = get_spark("probe-cache-rehearsal")
    work = tempfile.mkdtemp(prefix="probe_cache_") + "/ds"
    (
        spark.range(rows)
        .select(F.col("id").alias("k"))
        .repartitionByRange(n_files, F.col("k"))
        .sortWithinPartitions("k")
        .write.parquet(work)
    )
    n_indexed = L.write_file_stats(spark, work, ["k"])
    lo, hi = rows // 2, rows // 2 + rows // n_files

    def probe():
        keep, total = L.prune_files(spark, work, "k", lo, hi)
        return keep, total

    keep, total = probe()
    print(f"files={total} indexed={n_indexed} keep={len(keep)} rows={rows}")

    def cold():
        L._STATS_CACHE.clear()
        probe()

    t_cold = med_ms(cold)
    probe()  # prime
    t_warm = med_ms(probe)
    t_list = med_ms(lambda: L.list_data_files(spark, work))
    print(
        f"probe cold {t_cold:.1f} ms | warm {t_warm:.1f} ms "
        f"(x{t_cold / max(t_warm, 1e-9):.1f}) | live listing alone "
        f"{t_list:.1f} ms ({100 * t_list / max(t_warm, 1e-9):.0f}% of warm)"
    )

    # r14: the join-based cold-probe path (prune_files spark_side=True)
    # — above SPARK_PRUNE_FILE_THRESHOLD live files the disjointness
    # test runs as a Spark job + anti-join and only surviving NAMES
    # return to the driver.  Cold each run by construction (it never
    # touches _STATS_CACHE); the crossover vs the driver-side cold
    # read is what this prints.
    def spark_side():
        L.prune_files(spark, work, "k", lo, hi, spark_side=True)

    keep_s, total_s = L.prune_files(spark, work, "k", lo, hi, spark_side=True)
    assert (keep_s, total_s) == (keep, total), "spark-side prune diverged"
    t_spark = med_ms(spark_side)
    print(
        f"spark-side prune {t_spark:.1f} ms (driver cold {t_cold:.1f} ms; "
        f"identical {len(keep_s)}-file surviving set) — driver-side wins "
        "below the threshold, the join path bounds driver memory above it"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
