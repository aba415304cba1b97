"""Scale toolkit tour: Z-order compaction, mergeable sketches, and
link analysis — the r8 additions in one runnable script.

    python examples/scale_toolkit.py /root/testdata/sf0.001 /tmp/scale_demo
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from spectrify_spark.operators.graph import pagerank
from spectrify_spark.operators.layout import compact_parquet
from spectrify_spark.operators.sketches import (
    kll_rollup,
    kll_sketches,
    theta_set_estimates,
    theta_sketches,
)
from spectrify_spark.session import get_spark
from spectrify_spark.sources.parquet import read_table


def main(sf_dir: str, work_dir: str) -> None:
    spark = get_spark("scale-toolkit-example")
    orders = read_table(spark, f"{sf_dir}/orders.parquet")

    print("== compact + Z-order the orders table ==")
    scattered = f"{work_dir}/scattered"
    orders.repartition(32).write.mode("overwrite").parquet(scattered)
    n = compact_parquet(
        spark,
        scattered,
        f"{work_dir}/zordered",
        target_file_bytes=64 * 1024 * 1024,
        zorder_cols=[
            F.pmod(F.col("o_custkey").cast("long"), F.lit(65536)),
            F.pmod(
                F.datediff(
                    F.col("o_orderdate").cast("date"),
                    F.lit("1992-01-01").cast("date"),
                ).cast("long"),
                F.lit(65536),
            ),
        ],
    )
    print(f"compacted 32 scattered files -> {n} z-ordered file(s)")

    print("== mergeable quantile sketch table (per month -> global) ==")
    fine = kll_sketches(
        orders.withColumn("month", F.date_trunc("month", "o_orderdate")),
        ["month"],
        "o_totalprice",
    )
    kll_rollup(fine, [], probabilities=(0.5, 0.95)).show(truncate=False)

    print("== theta set algebra: customer overlap between statuses ==")
    theta_set_estimates(
        theta_sketches(
            orders.filter(F.col("o_orderstatus").isin("F", "O")),
            ["o_orderstatus"],
            "o_custkey",
        )
    ).show()

    print("== PageRank over the supplier<->part purchase graph ==")
    li = read_table(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_suppkey", "l_partkey"
    )
    sup = F.col("l_suppkey").cast("long") * F.lit(2)
    prt = F.col("l_partkey").cast("long") * F.lit(2) + F.lit(1)
    edges = li.select(sup.alias("src"), prt.alias("dst")).unionByName(
        li.select(prt.alias("src"), sup.alias("dst"))
    )
    top = pagerank(edges, iters=3).orderBy(F.col("rank").desc()).limit(5)
    print(f"top-5 nodes by rank ({top.count()} shown)")
    top.show()


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
        sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_demo",
    )
