"""Gap-fill/forward-fill resampling tests (operators/timeseries.py)."""

import datetime

import pytest

from spectrify_spark.operators.timeseries import resample_ffill


def test_resample_ffill_fills_gaps(spark):
    d = datetime.datetime
    rows = [
        # user 1: observations at 00h and 03h -> 01h,02h forward-filled
        (1, 1, d(2024, 1, 1, 0, 15), 10.0),
        (2, 1, d(2024, 1, 1, 0, 45), 11.0),   # later in same bucket wins
        (3, 1, d(2024, 1, 1, 3, 30), 40.0),
        # user 2: single observation -> single bucket
        (4, 2, d(2024, 1, 1, 5, 0), 99.0),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])
    out = {
        (r.user_id, r.bucket_ts): (r.value_filled, r.is_observed)
        for r in resample_ffill(df).collect()
    }
    assert len(out) == 5  # 4 hourly buckets for user 1 + 1 for user 2
    assert out[(1, d(2024, 1, 1, 0, 0))] == (11.0, True)   # last obs in bucket
    assert out[(1, d(2024, 1, 1, 1, 0))] == (11.0, False)  # filled
    assert out[(1, d(2024, 1, 1, 2, 0))] == (11.0, False)  # filled
    assert out[(1, d(2024, 1, 1, 3, 0))] == (40.0, True)
    assert out[(2, d(2024, 1, 1, 5, 0))] == (99.0, True)


# ------------------------------------------------------------- EWMA


def test_ewma_matches_hand_recursion(spark):
    """EWMA must equal the scalar recursion s_i = a*x_i + (1-a)*s_{i-1}
    while the frame is unsaturated (window larger than history)."""
    import datetime

    from spectrify_spark.operators.timeseries import ewma_trailing

    d = datetime.datetime
    rows = [
        (1, 7, d(2024, 1, 1, 0), 10.0),
        (2, 7, d(2024, 1, 1, 1), 20.0),
        (3, 7, d(2024, 1, 1, 2), 30.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )
    out = {
        r["event_id"]: r["ewma"]
        for r in ewma_trailing(
            df, key_col="user_id", order_cols=["ts", "event_id"],
            value_col="value", alpha=0.5, window_rows=10,
        ).collect()
    }
    assert out[1] == 10.0
    assert out[2] == 0.5 * 20.0 + 0.5 * 10.0
    assert out[3] == 0.5 * 30.0 + 0.5 * (0.5 * 20.0 + 0.5 * 10.0)


def test_ewma_window_bounds_history(spark):
    """A window_rows=1 EWMA is the value itself: the trailing frame,
    not the full history, feeds the fold."""
    import datetime

    from spectrify_spark.operators.timeseries import ewma_trailing

    d = datetime.datetime
    df = spark.createDataFrame(
        [(i, 1, d(2024, 1, 1, i), float(i * 10)) for i in range(1, 5)],
        "event_id bigint, user_id bigint, ts timestamp, value double",
    )
    out = ewma_trailing(
        df, key_col="user_id", order_cols=["ts", "event_id"],
        value_col="value", alpha=0.3, window_rows=1,
    ).collect()
    for r in out:
        assert r["ewma"] == r["value"]


def test_ewma_null_in_frame_poisons_result(spark):
    """A NULL value anywhere in the trailing frame must yield a NULL
    EWMA for that row (DuckDB list_reduce parity — collect_list would
    otherwise silently drop the NULL and shift the frame, ADVICE r6).
    Rows whose frame has slid past the NULL recover."""
    import datetime

    from spectrify_spark.operators.timeseries import ewma_trailing

    d = datetime.datetime
    rows = [
        (1, 7, d(2024, 1, 1, 0), 10.0),
        (2, 7, d(2024, 1, 1, 1), None),
        (3, 7, d(2024, 1, 1, 2), 30.0),
        (4, 7, d(2024, 1, 1, 3), 40.0),
        (5, 7, d(2024, 1, 1, 4), 50.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp, value double"
    )
    out = {
        r["event_id"]: r["ewma"]
        for r in ewma_trailing(
            df, key_col="user_id", order_cols=["ts", "event_id"],
            value_col="value", alpha=0.5, window_rows=2,
        ).collect()
    }
    assert out[1] == 10.0
    assert out[2] is None  # NULL enters the frame
    assert out[3] is None  # frame = [NULL, 30.0]
    assert out[4] == 0.5 * 40.0 + 0.5 * 30.0  # frame slid past the NULL
    assert out[5] == 0.5 * 50.0 + 0.5 * 40.0


def test_ewma_validates_params(spark):
    from spectrify_spark.operators.timeseries import ewma_trailing

    df = spark.createDataFrame([(1, 1, 1.0)], "e bigint, u bigint, v double")
    import pytest

    with pytest.raises(ValueError):
        ewma_trailing(df, key_col="u", order_cols=["e"], value_col="v",
                      alpha=0.0)
    with pytest.raises(ValueError):
        ewma_trailing(df, key_col="u", order_cols=["e"], value_col="v",
                      window_rows=0)


def test_count_anomalies_flags_burst_only(spark):
    """User 1: stable 2-events/day baseline for 5 days plus one 10-event
    burst day -> exactly the burst is flagged.  User 2: only 2 active
    days -> excluded by min_periods regardless of spread."""
    import datetime

    from spectrify_spark.operators.timeseries import count_anomalies

    d = datetime.datetime
    rows = []
    eid = 0
    for day in range(1, 6):  # user 1 baseline: 2 events/day
        for j in range(2):
            eid += 1
            rows.append((eid, 1, d(2024, 1, day, 10 + j)))
    for j in range(10):  # user 1 burst on day 6
        eid += 1
        rows.append((eid, 1, d(2024, 1, 6, 8 + j)))
    for day, n in [(1, 1), (2, 50)]:  # user 2: huge spread, 2 days only
        for j in range(n):
            eid += 1
            rows.append((eid, 2, d(2024, 2, day, 1, j)))
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = count_anomalies(
        df, key_col="user_id", ts_col="ts", grain="day",
        sigmas=2.0, min_periods=3,
    ).collect()
    assert [(r.user_id, r.bucket.day, r.n_events) for r in out] == [(1, 6, 10)]
    # mu/sigma are over ALL 6 active days of user 1: mean 10/3... no —
    # counts [2,2,2,2,2,10]: mu = 20/6, sigma = sample stddev
    import statistics

    r = out[0]
    assert r.mu == pytest.approx(statistics.mean([2, 2, 2, 2, 2, 10]))
    assert r.sigma == pytest.approx(statistics.stdev([2, 2, 2, 2, 2, 10]))


def test_count_anomalies_constant_counts_never_flag(spark):
    """sigma = 0 on a constant baseline: n > mu + 0 is false for every
    day — no flags, no NULL leakage."""
    import datetime

    from spectrify_spark.operators.timeseries import count_anomalies

    d = datetime.datetime
    rows = [
        (i * 10 + j, 1, d(2024, 1, i, 6 + j)) for i in range(1, 5) for j in range(3)
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = count_anomalies(df, key_col="user_id", ts_col="ts").collect()
    assert out == []
