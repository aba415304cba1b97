"""Relational operator library — the declared query surface (SURVEY §2B
[enabled] rows): the queries the reference's pipeline exists to enable
on the SQL engines it feeds, implemented natively.

Each operator is a DataFrame -> DataFrame function; Catalyst handles
pushdown/pruning/join selection, so the functions stay declarative.
Scale notes are inline where a choice matters at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scan_project(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Projection — Catalyst prunes the parquet scan to ReadSchema of
    exactly these columns (verified via .explain in tests)."""
    return df.select(*columns)


def filter_range(df: DataFrame, col: str, lo, hi) -> DataFrame:
    """Half-open range predicate [lo, hi) — the reference's documented
    date-bounded export pattern (reference examples/weekly_partitions.py:85-87);
    pushes into the scan as PushedFilters."""
    return df.filter((F.col(col) >= F.lit(lo)) & (F.col(col) < F.lit(hi)))


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi-join; ``broadcast_right=True`` hints a map-side join for a
    small dimension (no shuffle of the fact table — at 100 TB the
    difference between a broadcast and a sort-merge join on the fact is
    the whole job)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — left rows with a match; never duplicates left rows."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — left rows with no match."""
    return left.join(right, on=on, how="left_anti")


def hash_agg(
    df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]
) -> DataFrame:
    """Grouped aggregation; Spark's HashAggregate does map-side partial
    aggregation before the shuffle, so the shuffle carries one row per
    (partition, key) — the scalable shape for high-cardinality keys."""
    return df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def rollup_agg(
    df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]
) -> DataFrame:
    return df.rollup(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def cube_agg(
    df: DataFrame, keys: Sequence[str], aggs: dict[str, Column]
) -> DataFrame:
    return df.cube(*keys).agg(*[c.alias(n) for n, c in aggs.items()])


def window_rank(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    rank_col: str = "rnk",
    method: str = "row_number",
    top_n: int | None = None,
) -> DataFrame:
    """Ranking window; with ``top_n`` it is the scalable per-group top-k
    (each group ranks inside its shuffle partition — no global sort)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[
        method
    ]
    out = df.withColumn(rank_col, fn().over(w))
    if top_n is not None:
        out = out.filter(F.col(rank_col) <= top_n)
    return out


def topk(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k.  Spark compiles orderBy().limit(k) to TakeOrderedAndProject
    — a per-partition heap + driver merge, NOT a full sort; this is the
    only safe global-order operator at 100 TB.  ``order_by`` must include
    a unique tie-break column for deterministic results."""
    return df.orderBy(*order_by).limit(k)


def set_union(a: DataFrame, b: DataFrame, distinct: bool = True) -> DataFrame:
    out = a.unionByName(b)
    return out.distinct() if distinct else out


def set_intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def set_except(a: DataFrame, b: DataFrame, keep_duplicates: bool = False) -> DataFrame:
    """EXCEPT (distinct semantics) or EXCEPT ALL."""
    return a.exceptAll(b) if keep_duplicates else a.subtract(b)
