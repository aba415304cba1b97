"""Incremental aggregate-view maintenance end-to-end: a per-priority
orders rollup kept fresh by delta merges (corpus never rescanned),
sketch measures (avg / approx-distinct / p50) merging alongside the
additive ones, a retraction repaired by partition recompute, and the
streaming twin draining the same deltas through foreachBatch.

    python examples/incremental_rollup.py /root/testdata/sf0.001 /tmp/rollup_demo
"""

from __future__ import annotations

import shutil
import sys

from pyspark.sql import functions as F

from spectrify_spark.catalog.publish import current_version
from spectrify_spark.operators.incremental import (
    maintain_published_rollup,
    read_rollup,
    recompute_partitions,
)
from spectrify_spark.session import get_spark
from spectrify_spark.sources.parquet import read_table
from spectrify_spark.streaming.rollup import stream_rollup_publish

KEYS = ["o_orderpriority"]
SPECS = {
    "n_orders": ("count", None),
    "sum_price": ("sum", "price"),
    "avg_price": ("avg", "price"),
    "n_custs": ("approx_distinct", "o_custkey"),
    "p50_price": ("quantile", "price", 0.5),
}


def main(sf_dir: str, work: str) -> None:
    shutil.rmtree(work, ignore_errors=True)
    spark = get_spark("rollup-example")
    o = read_table(spark, f"{sf_dir}/orders.parquet").select(
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
    )
    root = f"{work}/rollup"
    cut = F.to_timestamp(F.lit("1996-01-01 00:00:00"))

    # 1. two delta refreshes: each costs one delta scan + one
    # |groups|-sized merge shuffle — the corpus is never rescanned
    v1 = maintain_published_rollup(
        spark, root, o.filter(F.col("o_orderdate") < cut), KEYS, SPECS
    )
    v2 = maintain_published_rollup(
        spark, root, o.filter(F.col("o_orderdate") >= cut), KEYS, SPECS
    )
    print(f"refreshes published v={v1}, v={v2}")
    read_rollup(spark, root, KEYS, SPECS).orderBy(*KEYS).show(truncate=False)

    # 2. a retraction: drop every even-keyed URGENT order, repair by
    # recomputing ONLY the touched group (the rest passes through)
    retract = (F.col("o_orderpriority") == "1-URGENT") & (
        F.col("o_orderkey") % 2 == 0
    )
    touched = spark.createDataFrame(
        [("1-URGENT",)], "o_orderpriority string"
    )
    v3 = recompute_partitions(
        spark, root, o.filter(~retract), touched, KEYS, SPECS
    )
    print(f"retraction repaired in v={v3} (1 group recomputed, 4 passed)")
    read_rollup(spark, root, KEYS, SPECS).orderBy(*KEYS).show(truncate=False)

    # 3. the streaming twin: the same corpus drained as micro-batches
    # into a second rollup root — replay-safe via the atomic batch-id
    # marker; the result equals the batch one-shot
    src = f"{work}/stream_src"
    o.drop("o_orderdate", "o_orderkey").repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(
            "o_orderpriority string, price decimal(18,2), o_custkey bigint"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sroot = f"{work}/stream_rollup"
    q = stream_rollup_publish(
        stream, sroot, KEYS, SPECS, checkpoint_dir=f"{work}/ckpt"
    )
    q.awaitTermination(300)
    q.stop()
    print(
        f"streamed {current_version(sroot)} micro-batch versions; "
        "final rollup:"
    )
    read_rollup(spark, sroot, KEYS, SPECS).orderBy(*KEYS).show(truncate=False)

    # 4. the copy-on-write form: refresh 2 touches ONE partition, so
    # v=2 writes one directory and the manifest carries the other four
    # over by reference — refresh cost independent of group count
    from spectrify_spark.catalog.cow import cow_partition_versions
    from spectrify_spark.operators.incremental import (
        maintain_published_rollup_cow,
        read_rollup_cow,
    )

    croot = f"{work}/cow_rollup"
    late = (F.col("o_orderpriority") == "1-URGENT") & (
        F.col("o_orderkey") % 2 == 0
    )
    maintain_published_rollup_cow(spark, croot, o.filter(~late), KEYS, SPECS)
    maintain_published_rollup_cow(spark, croot, o.filter(late), KEYS, SPECS)
    print("cow partition -> data version:", cow_partition_versions(spark, croot))
    read_rollup_cow(spark, croot, KEYS, SPECS).orderBy(*KEYS).show(
        truncate=False
    )


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rollup_demo"
    main(sf, work)
