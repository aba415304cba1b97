"""Event-time operator tests with hand-built timelines."""

import datetime

from pyspark.sql import functions as F

from spectrify_spark.operators import sessionize as S


def _events(spark):
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: two sessions separated by a 2h gap
        (1, 1, base),
        (2, 1, base + datetime.timedelta(minutes=10)),
        (3, 1, base + datetime.timedelta(minutes=20)),
        (4, 1, base + datetime.timedelta(hours=2, minutes=20)),
        # user 2: one session
        (5, 2, base + datetime.timedelta(minutes=5)),
        (6, 2, base + datetime.timedelta(minutes=34)),
    ]
    return spark.createDataFrame(rows, ["event_id", "user_id", "ts"])


def test_sessionize_gap_splits(spark):
    out = S.sessionize(_events(spark), gap_seconds=1800)
    sess = {r.event_id: r.session_id for r in out.collect()}
    assert sess[1] == sess[2] == sess[3] == 1
    assert sess[4] == 2
    assert sess[5] == sess[6] == 1  # 29-min gap stays in session


def test_session_stats(spark):
    out = S.session_stats(_events(spark), gap_seconds=1800)
    rows = {(r.user_id, r.session_id): r for r in out.collect()}
    assert rows[(1, 1)].n_events == 3
    assert rows[(1, 1)].duration_us == 20 * 60 * 1_000_000
    assert rows[(1, 2)].n_events == 1
    assert rows[(2, 1)].n_events == 2


def test_tumbling_window_alignment(spark):
    out = S.tumbling_window_agg(_events(spark), duration="1 hour")
    rows = sorted(
        (r.window_start, r.n_events) for r in out.collect()
    )
    assert rows[0][0] == datetime.datetime(2024, 1, 1, 0, 0)
    assert rows[0][1] == 5
    assert rows[1][0] == datetime.datetime(2024, 1, 1, 2, 0)
    assert rows[1][1] == 1


def test_funnel_first_conversion(spark):
    from spectrify_spark.operators.sessionize import funnel_first_conversion

    rows = [
        # user 1 converts: s@1, c@3 (first click after s), p@5
        (1, 1, "signup"), (1, 2, "click"), (1, 3, "click"),
        (1, 5, "purchase"),
        # user 2: purchase BEFORE click -> no conversion
        (2, 1, "signup"), (2, 5, "click"), (2, 3, "purchase"),
        # user 3: never signed up
        (3, 1, "click"), (3, 2, "purchase"),
        # user 4: click at the same instant as signup is NOT after it
        (4, 1, "signup"), (4, 1, "click"), (4, 2, "purchase"),
    ]
    df = spark.createDataFrame(
        [(u, float(t), k) for u, t, k in rows], "user_id bigint, ts double, event_type string"
    )
    out = {r.user_id: r for r in funnel_first_conversion(
        df, ["signup", "click", "purchase"]
    ).collect()}
    assert set(out) == {1}
    assert (out[1].ts_signup, out[1].ts_click, out[1].ts_purchase) == (1.0, 2.0, 5.0)


def test_funnel_greedy_completes_when_any_order_exists(spark):
    from spectrify_spark.operators.sessionize import funnel_first_conversion

    # s@1, c@2, p@3 plus an earlier decoy click@0 (before signup)
    df = spark.createDataFrame(
        [(1, 0.0, "click"), (1, 1.0, "signup"), (1, 2.0, "click"), (1, 3.0, "purchase")],
        "user_id bigint, ts double, event_type string",
    )
    assert funnel_first_conversion(df, ["signup", "click", "purchase"]).count() == 1


def test_cohort_retention_matrix(spark):
    from spectrify_spark.operators.sessionize import cohort_retention

    # user 1 first seen day 0 (Mon 2024-01-01), active weeks 0 and 2
    # user 2 first seen week 0, active only week 0
    # user 3 first seen week 2
    rows = [
        (1, "2024-01-01"), (1, "2024-01-02"), (1, "2024-01-16"),
        (2, "2024-01-03"),
        (3, "2024-01-17"),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, d string").select(
        "user_id", F.to_timestamp("d").alias("ts")
    )
    out = {(str(r.cohort.date()), r.period_offset): (r.n_active, r.cohort_size)
           for r in cohort_retention(df).collect()}
    assert out[("2024-01-01", 0)] == (2, 2)   # users 1,2 in week-0 cohort
    assert out[("2024-01-01", 2)] == (1, 2)   # only user 1 back in week 2
    assert out[("2024-01-15", 0)] == (1, 1)   # user 3's own cohort
    assert ("2024-01-01", 1) not in out       # nobody active in week 1
