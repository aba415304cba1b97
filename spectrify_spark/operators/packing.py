"""Token-budget sequence packing: assign documents to contiguous
fixed-budget training shards.

Packing semantics are the deterministic *offset* variant used by
distributed data loaders: documents are laid out in a stable total
order, and a document belongs to the shard its START offset falls in
(``shard_id = floor((running_sum - size) / budget)``).  Unlike true
greedy bin-packing (inherently sequential), offset packing is
order-stable, engine-portable, and embarrassingly parallel — shard
boundaries may split a budget across two shards' worth of one doc's
tokens, which training loaders handle by sequence truncation anyway.

Scale shape: a bare ``SUM() OVER (ORDER BY ...)`` collapses to one
task; this uses the distributed-cumsum pattern (range partition ->
per-partition running sum -> tiny broadcast of per-partition totals),
the same shape as ``relational.global_row_numbers`` generalized from
row counts to sizes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_sum(
    df: DataFrame,
    order_by: Sequence[Column],
    size_col: str,
    *,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Inclusive running sum of ``size_col`` in ``order_by`` order,
    computed without a single-partition global window.

    ``order_by`` must be a total order (include a unique tie-break) for
    deterministic sums.
    """
    ranged = (
        df.repartitionByRange(num_partitions, *order_by)
        if num_partitions
        else df.repartitionByRange(*order_by)
    )
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    offsets = (
        with_pid.groupBy("__pid")
        .agg(F.sum(size_col).alias("__s"))
        .withColumn(
            "__offset",
            F.sum("__s").over(
                Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .select("__pid", F.coalesce("__offset", F.lit(0)).alias("__offset"))
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        with_pid.join(F.broadcast(offsets), "__pid")
        .withColumn(
            out_col,
            (F.sum(size_col).over(w) + F.col("__offset")).cast("bigint"),
        )
        .drop("__pid", "__offset")
    )


def pack_sequences(
    df: DataFrame,
    order_by: Sequence[Column],
    size_col: str,
    budget: int,
    *,
    shard_col: str = "shard_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``shard_col``: the fixed-budget shard each row starts in.

    ``floor(start_offset / budget)`` where ``start_offset`` is the
    exclusive running sum of ``size_col`` in ``order_by`` order.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    summed = running_sum(
        df, order_by, size_col, out_col="__cum", num_partitions=num_partitions
    )
    return summed.withColumn(
        shard_col,
        F.floor((F.col("__cum") - F.col(size_col)) / F.lit(budget)).cast("bigint"),
    ).drop("__cum")
