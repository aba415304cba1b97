"""Time-series resampling — gap-fill + forward-fill, an operator Spark
has no primitive for, composed scale-safe:

1. per-key bounds (one aggregate),
2. dense time grid via sequence()+explode (rows generated distributed,
   proportional to each key's span — no driver-side calendar),
3. per-bucket "last observation" via max_by (one aggregate),
4. forward fill via last(ignorenulls) over an ordered window.

Two shuffles total (bounds+grid on key, window on key), no driver
state; each key's timeline lives in one partition, so filling scales
with keys, not with global time span.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Fixed-width grid units resample_ffill supports: sequence() stepping
#: by a variable-width unit (month, year) would misalign the grid with
#: date_trunc buckets, so only these are allowed.
SUPPORTED_UNITS = ("minute", "hour", "day", "week")


def resample_ffill(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tie: str = "event_id",
    unit: str = "hour",
) -> DataFrame:
    """Resample each key's series onto a dense per-``unit`` grid between
    that key's first and last observation; bucket value = last
    observation in the bucket (by ``order_tie``); empty buckets forward-
    fill from the previous bucket.

    Returns (key, bucket_ts, value_filled, is_observed).
    """
    if unit not in SUPPORTED_UNITS:
        raise ValueError(
            f"resample_ffill unit must be one of {SUPPORTED_UNITS}, got {unit!r}"
        )
    interval = f"INTERVAL 1 {unit.upper()}"
    bucket = F.date_trunc(unit, F.col(ts_col))

    bounds = df.groupBy(key_col).agg(
        F.date_trunc(unit, F.min(ts_col)).alias("__lo"),
        F.date_trunc(unit, F.max(ts_col)).alias("__hi"),
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.expr(interval))
        ).alias("bucket_ts"),
    )
    hourly = (
        df.select(
            key_col,
            bucket.alias("bucket_ts"),
            F.col(value_col),
            F.col(order_tie),
        )
        .groupBy(key_col, "bucket_ts")
        .agg(F.max_by(value_col, order_tie).alias("__v"))
    )
    joined = grid.join(hourly, [key_col, "bucket_ts"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        key_col,
        "bucket_ts",
        F.last("__v", ignorenulls=True).over(w).alias("value_filled"),
        F.col("__v").isNotNull().alias("is_observed"),
    )


def ewma_trailing(
    df: DataFrame,
    *,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.25,
    window_rows: int = 10,
    out_col: str = "ewma",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exponentially-weighted moving average over a TRAILING bounded
    window — the standard smoothing feature for per-entity time-series
    (load signals, engagement trends, sensor denoise).

    Within each ``key_col`` partition, rows ordered by ``order_cols``
    (include a unique tiebreaker — a timestamp alone is not total
    order) carry ``out_col`` = the recursive EWMA ``s_i = alpha*x_i +
    (1-alpha)*s_{i-1}`` seeded at the OLDEST row of the trailing
    ``window_rows``-row frame.  The bounded frame keeps state O(window)
    per row instead of O(history), which is what makes the op safe on
    unbounded per-key histories.

    NULL semantics: a NULL ``value_col`` anywhere in the trailing frame
    yields a NULL EWMA for that row (NULL propagates through the fold,
    matching DuckDB list()/list_reduce).  Without the explicit guard
    below, Spark's collect_list would silently DROP the NULL and
    shrink/shift the frame — a different answer than the SQL engines
    give (ADVICE r6).

    Implementation: collect_list over a rows-framed window (frame order
    = sort order) + a single fold with ``F.aggregate`` — no UDF, no
    per-row Python.  One shuffle (the key partition).

    Raises ``ValueError`` unless 0 < alpha <= 1 and window_rows >= 1.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if window_rows < 1:
        raise ValueError(f"window_rows must be >= 1, got {window_rows}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window_rows - 1), 0)
    )
    xs = F.collect_list(F.col(value_col).cast("double")).over(w)
    # seed = oldest element in frame; fold the rest left-to-right
    # (matches DuckDB list_reduce seeding for the oracle twin)
    ew = F.aggregate(
        F.slice(xs, 2, window_rows),
        F.element_at(xs, 1),
        lambda acc, x: F.lit(float(alpha)) * x
        + F.lit(float(1.0 - alpha)) * acc,
    )
    # NULL-in-frame guard: collect_list drops NULLs, so detect them
    # over the SAME frame and poison the result the way the SQL
    # engines' list fold would
    frame_has_null = (
        F.max(F.col(value_col).isNull().cast("int")).over(w) == 1
    )
    ew = F.when(frame_has_null, F.lit(None).cast("double")).otherwise(ew)
    if round_digits is not None:
        ew = F.round(ew, round_digits)
    return df.withColumn(out_col, ew)


def count_anomalies(
    df: DataFrame,
    *,
    key_col: str,
    ts_col: str,
    grain: str = "day",
    sigmas: float = 2.0,
    min_periods: int = 3,
) -> DataFrame:
    """Per-entity activity-burst detection: bucket events to ``grain``,
    count per (entity, bucket), and flag buckets whose count exceeds
    the ENTITY'S OWN mean + ``sigmas``·stddev — volume spikes relative
    to each entity's baseline, which a global threshold
    (``quality.robust_zscore``) cannot see because one entity's burst
    is another's idle day.

    Entities with fewer than ``min_periods`` active buckets are skipped
    (a sample stddev over 1-2 points flags noise).  Scale shape: one
    (key, bucket) count agg, one key-level stats agg over THOSE counts
    (orders of magnitude smaller than the events), joined back on the
    key — co-partitioned with the first shuffle, so AQE reuses the
    exchange.  Output: flagged buckets only — proportional to the
    anomaly rate, not the corpus.
    """
    counts = (
        df.select(key_col, F.date_trunc(grain, F.col(ts_col)).alias("bucket"))
        .groupBy(key_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    stats = counts.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("__periods"),
        F.avg("n_events").alias("mu"),
        F.stddev_samp(F.col("n_events").cast("double")).alias("sigma"),
    )
    return (
        counts.join(stats, key_col)
        .filter(
            (F.col("__periods") >= min_periods)
            & (
                F.col("n_events").cast("double")
                > F.col("mu") + F.lit(float(sigmas)) * F.col("sigma")
            )
        )
        .select(key_col, "bucket", "n_events", "mu", "sigma")
    )
