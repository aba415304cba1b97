"""End-to-end guard for tz-naive producer parquet (the r4 regression).

pandas ``to_parquet`` writes timestamps with ``isAdjustedToUTC=false``
by default; Spark 3.4+ infers those as TIMESTAMP_NTZ unless
``spark.sql.parquet.inferTimestampNTZ.enabled`` is off.  Two layers are
under test:

1. ``read_table`` (and the session factory conf) must yield
   TimestampType (LTZ) from such files — the engine's convention.
2. The event-time operators must ALSO survive a caller-supplied NTZ
   frame that never went through ``read_table`` (epoch_us casts).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F

from spectrify_spark.operators.asof import asof_join_backward
from spectrify_spark.operators.relational import point_in_interval_join
from spectrify_spark.operators.sessionize import session_stats, sessionize
from spectrify_spark.sources.parquet import NTZ_INFER_CONF, read_table


@pytest.fixture(scope="module")
def ntz_events_path(tmp_path_factory):
    """Events-shaped table written by pandas with tz-NAIVE timestamps —
    the default producer behavior that broke r4."""
    base = dt.datetime(2024, 3, 1, 12, 0, 0)  # naive on purpose
    rows = []
    for uid in (1, 2):
        for i in range(6):
            # two sessions per user: 5-minute steps, then a 2-hour gap
            off = dt.timedelta(minutes=5 * i) if i < 3 else dt.timedelta(
                hours=2, minutes=5 * (i - 3)
            )
            rows.append(
                {"event_id": uid * 100 + i, "user_id": uid, "ts": base + off}
            )
    pdf = pd.DataFrame(rows)
    assert pdf["ts"].dt.tz is None
    path = str(tmp_path_factory.mktemp("ntz") / "events.parquet")
    # µs precision = the driver testdata's layout (tz-naive TIMESTAMP(MICROS));
    # pandas-default ns files additionally exercise the nanosAsLong path,
    # covered in test_parquet_compat.
    pdf.to_parquet(path, coerce_timestamps="us")
    return path


@pytest.fixture(scope="module")
def ntz_orders_path(tmp_path_factory):
    base = dt.datetime(2024, 3, 1, 11, 0, 0)
    pdf = pd.DataFrame(
        {
            "o_orderkey": [10, 11, 12],
            "o_custkey": [1, 1, 2],
            "o_ts": [base, base + dt.timedelta(hours=1, minutes=7), base],
        }
    )
    path = str(tmp_path_factory.mktemp("ntz") / "orders.parquet")
    pdf.to_parquet(path, coerce_timestamps="us")
    return path


def _ntz_frame(spark, path):
    """Read with NTZ inference ON (simulating a caller who bypassed both
    the factory and read_table)."""
    prev = spark.conf.get(NTZ_INFER_CONF, None)
    spark.conf.set(NTZ_INFER_CONF, "true")
    try:
        df = spark.read.parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(NTZ_INFER_CONF)
        else:
            spark.conf.set(NTZ_INFER_CONF, prev)
    return df


def test_read_table_yields_ltz(spark, ntz_events_path):
    # the file really is tz-naive at the parquet level
    import pyarrow.parquet as pq

    col = pq.read_schema(ntz_events_path).field("ts").type
    assert col.tz is None
    df = read_table(spark, ntz_events_path)
    assert dict(df.dtypes)["ts"] == "timestamp"  # LTZ, not timestamp_ntz


def test_session_factory_conf_reads_ltz(spark, ntz_events_path):
    """The factory session's default read (no read_table) also lands on
    LTZ because session.py sets the conf session-wide."""
    assert spark.conf.get(NTZ_INFER_CONF) == "false"
    df = spark.read.parquet(ntz_events_path)
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_sessionize_on_ntz_frame(spark, ntz_events_path):
    ev = _ntz_frame(spark, ntz_events_path)
    assert dict(ev.dtypes)["ts"] == "timestamp_ntz"  # the hostile input
    out = sessionize(ev, gap_seconds=1800)
    got = {
        (r["user_id"], r["event_id"]): r["session_id"] for r in out.collect()
    }
    for uid in (1, 2):
        assert [got[(uid, uid * 100 + i)] for i in range(6)] == [1, 1, 1, 2, 2, 2]

    stats = session_stats(ev, gap_seconds=1800)
    rows = {(r["user_id"], r["session_id"]): r for r in stats.collect()}
    assert rows[(1, 1)]["n_events"] == 3
    assert rows[(1, 1)]["duration_us"] == 10 * 60 * 1_000_000


def test_asof_tolerance_on_ntz_frames(spark, ntz_events_path, ntz_orders_path):
    ev = _ntz_frame(spark, ntz_events_path)
    orders = _ntz_frame(spark, ntz_orders_path)
    out = asof_join_backward(
        ev,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_ts="ts",
        right_ts="o_ts",
        payload=["o_orderkey"],
        tolerance_seconds=3600,
    )
    got = {r["event_id"]: r["o_orderkey"] for r in out.collect()}
    # events for user 1: 12:00,12:05,12:10 then 14:00,14:05,14:10
    # orders for cust 1: 11:00 (key 10), 12:07 (key 11); tolerance 1h
    assert got[100] == 10  # 12:00 vs 11:00, exactly 1h (inclusive)
    assert got[101] is None  # 12:05 vs 11:00, 65 min > tolerance
    assert got[102] == 11  # 12:10 vs 12:07
    assert got[103] is None and got[104] is None and got[105] is None  # >1h gap
    # user 2: single order at 11:00; only the 12:00 event is within 1h
    assert got[200] == 12
    assert got[201] is None


def test_interval_join_on_ntz_frame(spark, ntz_events_path):
    ev = _ntz_frame(spark, ntz_events_path)
    sessions = session_stats(ev, gap_seconds=1800).select(
        "user_id", "session_id", "session_start", "session_end"
    )
    points = ev.select("event_id", F.col("user_id").alias("p_user"), "ts")
    joined = point_in_interval_join(
        points,
        sessions,
        point_key="p_user",
        interval_key="user_id",
        ts_col="ts",
        start_col="session_start",
        end_col="session_end",
    )
    # every event falls in exactly one of its user's sessions
    assert joined.count() == 12
    by_event = {r["event_id"]: r["session_id"] for r in joined.collect()}
    assert by_event[100] == 1 and by_event[105] == 2
