"""Event-time operator tests with hand-built timelines."""

import datetime

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
