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


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Nearest as-of join (pandas ``merge_asof(direction='nearest')``):
    for each left row, the right row minimizing ``|right_ts -
    left_ts|`` on the same key, ties resolved BACKWARD (the pandas
    rule).  Completes the backward/forward/nearest trio.

    Shape: ONE union, ONE key shuffle, and two per-key window sorts
    over the same Exchange — the backward candidate via the running
    ``last(ignorenulls)`` (right rows sort before left at equal ts,
    inclusive), the forward candidate via the mirrored
    ``first(ignorenulls)`` — then a per-row microsecond-delta
    comparison picks the closer side.  Never a range join.

    ``tolerance_seconds`` bounds BOTH directions; a row with no
    candidate inside the tolerance gets NULL payload.
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
    # backward: right(0) sorts before left(1) at equal ts -> inclusive
    wb = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t"), F.col("__src"), *[F.col(p) for p in payload])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # forward: left first at equal ts (src desc), frame looks ahead ->
    # inclusive; first right with the smallest payload wins ties
    wf = (
        Window.partitionBy("__k")
        .orderBy(
            F.col("__t"), F.col("__src").desc(), *[F.col(p) for p in payload]
        )
        .rowsBetween(0, Window.unboundedFollowing)
    )
    is_r = F.col("__src") == 0
    bts = F.last(F.when(is_r, F.col("__t")), ignorenulls=True).over(wb)
    fts = F.first(F.when(is_r, F.col("__t")), ignorenulls=True).over(wf)
    db = epoch_us(F.col("__t")) - epoch_us(bts)
    df_ = epoch_us(fts) - epoch_us(F.col("__t"))
    b_ok = bts.isNotNull()
    f_ok = fts.isNotNull()
    if tolerance_seconds is not None:
        tol_us = F.lit(int(tolerance_seconds) * 1_000_000)
        b_ok = b_ok & (db <= tol_us)
        f_ok = f_ok & (df_ <= tol_us)
    use_b = b_ok & (~f_ok | (db <= df_))
    use_f = f_ok & ~use_b
    filled = u.select(
        "__src",
        *left.columns,
        *[
            F.when(use_b, F.last(p, ignorenulls=True).over(wb))
            .when(use_f, F.first(p, ignorenulls=True).over(wf))
            .alias(p)
            for p in payload
        ],
    )
    return filled.filter(F.col("__src") == 1).select(*out_cols)
