"""As-of (point-in-time) join — an operator Spark has no primitive for,
composed from union + window (SURVEY §"custom operators" path (a)).

For each left row, attach the payload of the right row with the
greatest ``right_ts <= left_ts`` for the same key (backward as-of,
e.g. "the user's most recent order at event time").

Why union+window and not a range join: a range-condition join explodes
to O(|left| x |right-per-key|) candidate pairs before filtering; the
union form is ONE shuffle on the key, a per-key sort, and a running
``last(ignorenulls)`` — linear in input size, stable under skew, and
exactly the shape Structured Streaming's state store uses for the same
problem.  This is the 100 TB-safe formulation.

Tie rule: right rows sort before left rows at equal timestamps
(inclusive match), and among right rows with the same timestamp the
greatest ``tie_break`` (default: first payload column) wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spectrify_spark.functions.timeutil import epoch_us


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join; returns all left columns + payload columns
    (NULL when no right row at or before the left timestamp).

    ``tolerance_seconds`` bounds the lookback (pandas merge_asof
    semantics): a match older than the tolerance is nulled out.  The
    gap test runs in exact integer microseconds (the repo's event-time
    convention), still inside the same single-shuffle plan.
    """
    out_cols = left.columns + payload
    l = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__src"),
        *left.columns,
        *[F.lit(None).cast(right.schema[p].dataType).alias(p) for p in payload],
    )
    r = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__src"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        *payload,
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__src"), *[F.col(p) for p in payload])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched_ts = F.last(
        F.when(F.col("__src") == 0, F.col("__t")), ignorenulls=True
    ).over(w)
    filled_payload = [F.last(p, ignorenulls=True).over(w) for p in payload]
    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds) * 1_000_000
        in_tol = (epoch_us(F.col("__t")) - epoch_us(matched_ts)) <= F.lit(tol_us)
        filled_payload = [F.when(in_tol, c) for c in filled_payload]
    filled = u.select(
        "__src",
        *left.columns,
        *[c.alias(p) for c, p in zip(filled_payload, payload)],
    )
    return filled.filter(F.col("__src") == 1).select(*out_cols)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """Forward as-of join: for each left row, the EARLIEST right row
    with ``right_ts >= left_ts`` on the same key ("the user's next
    order after event time").  Same union + single-shuffle window shape
    as backward, mirrored: left rows sort before right rows at equal
    timestamps (inclusive), frame looks forward, ``first(ignorenulls)``
    picks the match; ties at the matched timestamp resolve to the
    smallest payload."""
    out_cols = left.columns + payload
    l = left.select(
        F.col(left_on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__src"),
        *left.columns,
        *[F.lit(None).cast(right.schema[p].dataType).alias(p) for p in payload],
    )
    r = right.select(
        F.col(right_on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__src"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        *payload,
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__src"), *[F.col(p) for p in payload])
        .rowsBetween(0, Window.unboundedFollowing)
    )
    filled = u.select(
        "__src",
        *left.columns,
        *[F.first(p, ignorenulls=True).over(w).alias(p) for p in payload],
    )
    return filled.filter(F.col("__src") == 0).select(*out_cols)
