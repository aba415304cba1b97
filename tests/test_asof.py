"""As-of join operator tests (operators/asof.py)."""

import datetime

from spectrify_spark.operators.asof import asof_join_backward, asof_join_forward


def test_asof_backward_semantics(spark):
    d = datetime.datetime
    left = spark.createDataFrame(
        [
            (1, 10, d(2024, 1, 5)),
            (2, 10, d(2024, 1, 1)),   # before any right row
            (3, 10, d(2024, 1, 3)),   # exactly at a right timestamp -> inclusive
            (4, 20, d(2024, 1, 9)),
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (10, d(2024, 1, 3), 100),
            (10, d(2024, 1, 3), 101),  # same ts: greatest payload wins
            (10, d(2024, 1, 4), 102),
            (20, d(2024, 1, 2), 200),
        ],
        ["k", "rts", "o_orderkey"],
    )
    out = asof_join_backward(
        left, right,
        left_on="user_id", right_on="k",
        left_ts="ts", right_ts="rts",
        payload=["o_orderkey"],
    )
    got = {r.event_id: r.o_orderkey for r in out.collect()}
    assert got == {1: 102, 2: None, 3: 101, 4: 200}
    assert out.count() == 4  # left join semantics: every left row survives


def test_asof_backward_tolerance(spark):
    d = datetime.datetime
    left = spark.createDataFrame(
        [
            (1, 10, d(2024, 1, 5)),    # match at 1/4: 1 day old -> kept
            (2, 10, d(2024, 1, 10)),   # match at 1/4: 6 days old -> nulled
            (3, 10, d(2024, 1, 6)),    # exactly 2 days old -> inclusive, kept
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(10, d(2024, 1, 4), 100)], ["k", "rts", "o_orderkey"]
    )
    out = asof_join_backward(
        left, right,
        left_on="user_id", right_on="k",
        left_ts="ts", right_ts="rts",
        payload=["o_orderkey"],
        tolerance_seconds=2 * 86400,
    )
    got = {r.event_id: r.o_orderkey for r in out.collect()}
    assert got == {1: 100, 2: None, 3: 100}


def test_asof_forward_semantics(spark):
    d = datetime.datetime
    left = spark.createDataFrame(
        [
            (1, 10, d(2024, 1, 2)),   # next right row is 1/3
            (2, 10, d(2024, 1, 3)),   # equal ts -> inclusive; smallest payload
            (3, 10, d(2024, 1, 5)),   # after every right row -> NULL
            (4, 20, d(2024, 1, 1)),
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (10, d(2024, 1, 3), 101),
            (10, d(2024, 1, 3), 100),  # same ts: smallest payload wins
            (10, d(2024, 1, 4), 102),
            (20, d(2024, 1, 2), 200),
        ],
        ["k", "rts", "o_orderkey"],
    )
    out = asof_join_forward(
        left, right,
        left_on="user_id", right_on="k",
        left_ts="ts", right_ts="rts",
        payload=["o_orderkey"],
    )
    got = {r.event_id: r.o_orderkey for r in out.collect()}
    assert got == {1: 100, 2: 100, 3: None, 4: 200}
