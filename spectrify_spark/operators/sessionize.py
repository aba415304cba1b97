"""Event-time operators over the events stream table (batch forms; the
streaming twins live in spectrify_spark.streaming).

- ``tumbling_window_agg``: fixed event-time windows (F.window) — the
  batch analog of a Structured Streaming windowed aggregation.
- ``sessionize``: gap-based sessions via the classic lag -> new-session
  flag -> running-sum session id.  Window-function shaped: one shuffle
  on user_id, no driver state, SQL-expressible (oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spectrify_spark.functions.timeutil import epoch_us


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    duration: str = "1 hour",
    group_cols: list[str] | None = None,
    aggs: dict | None = None,
) -> DataFrame:
    """Fixed event-time windows; window start/end surfaced as plain
    timestamp columns (epoch-aligned, same as date_trunc for whole-unit
    durations — which is what the DuckDB oracle uses)."""
    aggs = aggs or {"n_events": F.count(F.lit(1))}
    keys = [F.window(F.col(ts_col), duration).alias("w")] + [
        F.col(c) for c in (group_cols or [])
    ]
    out = df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c != "w"],
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tie: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based session ids per user.

    Gaps are compared in exact integer microseconds (epoch_us, which is
    NTZ-tolerant) so engine and oracle (DuckDB epoch_us) see identical
    arithmetic.  One shuffle (partition by user); sessions never span
    partitions because the partition key IS the user — the property
    that lets this scale to billions of events.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_tie))
    epoch = epoch_us(ts_col)
    prev = F.lag(epoch).over(w)
    is_new = F.when(
        prev.isNull() | ((epoch - prev) > F.lit(gap_seconds * 1_000_000)), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_tie)).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("__new", is_new).withColumn(
        "session_id", F.sum("__new").over(run)
    ).drop("__new")


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tie: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Sessionize then aggregate per session: event count, start/end,
    duration in exact microseconds."""
    s = sessionize(df, user_col, ts_col, order_tie, gap_seconds)
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(epoch_us(ts_col)) - F.min(epoch_us(ts_col))).alias("duration_us"),
    )


def funnel_first_conversion(
    events: DataFrame,
    steps: list[str],
    id_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: for each id, the FIRST strictly-increasing
    completion of ``steps`` (first step-0 event, then the first step-1
    event after it, ...).  One row per id that completes every step,
    with a ``ts_<step>`` column per stage — conversion analysis /
    curriculum-event ordering.

    Greedy-first is the standard funnel semantics and is correct for
    completion: if ANY increasing assignment exists, the greedy one
    exists (earliest choices only widen later stages' windows).

    Scale shape: one id-keyed aggregate for step 0, then per later step
    one id-keyed equi-join (co-partitioned — every stage shuffles on
    the SAME key, so Exchange reuse keeps it to one real shuffle per
    side) + aggregate that keeps the min timestamp after the previous
    stage.  Never a per-id sort or a collect_list of event history, so
    an id with millions of events costs its share of an agg, not a
    driver-side array.
    """
    if not steps:
        raise ValueError("funnel requires at least one step")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(id_col)
        .agg(F.min(ts_col).alias(f"ts_{steps[0]}"))
    )
    prev_ts = f"ts_{steps[0]}"
    for step in steps[1:]:
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(id_col), F.col(ts_col).alias("__t")
        )
        cur = (
            cur.join(nxt, on=id_col)
            .filter(F.col("__t") > F.col(prev_ts))
            .groupBy(id_col, *[c for c in cur.columns if c != id_col])
            .agg(F.min("__t").alias(f"ts_{step}"))
        )
        prev_ts = f"ts_{step}"
    return cur


def cohort_retention(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity period
    (their cohort), counted as retained in each later period they are
    active — ``(cohort, period_offset, n_active)`` plus the cohort size
    for rate computation downstream.

    Scale shape: one id-keyed aggregate finds each id's cohort (its min
    event time truncated to ``period``); the events then join that
    1-col-per-id table on the SAME id key (co-partitioned — Exchange
    reuse, no second full shuffle) and a (cohort, offset)-keyed
    count-distinct finishes.  No per-id history arrays, no window sort.

    ``period_offset`` is whole calendar periods between the truncated
    cohort start and the truncated event time (``date_diff`` on the
    truncations), so offset 0 is the cohort period itself.
    """
    cohorts = events.groupBy(id_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("__cohort")
    )
    unit = {"week": 7, "day": 1}.get(period)
    if unit is None:
        raise ValueError(f"unsupported period {period!r} (use 'day' or 'week')")
    joined = events.select(id_col, F.col(ts_col)).join(cohorts, on=id_col)
    offset = (
        F.datediff(F.date_trunc(period, F.col(ts_col)), F.col("__cohort")) / unit
    ).cast("bigint")
    active = (
        joined.select(id_col, F.col("__cohort").alias("cohort"), offset.alias("period_offset"))
        .groupBy("cohort", "period_offset")
        .agg(F.count_distinct(F.col(id_col)).alias("n_active"))
    )
    sizes = (
        cohorts.groupBy(F.col("__cohort").alias("cohort"))
        .agg(F.count(F.lit(1)).alias("cohort_size"))
    )
    return active.join(sizes, on="cohort").select(
        "cohort", "period_offset", "n_active", "cohort_size"
    )
