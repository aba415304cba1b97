"""Gap-fill/forward-fill resampling tests (operators/timeseries.py)."""

import datetime

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
