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


def test_asof_nearest_picks_closer_side(spark):
    import datetime

    from spectrify_spark.operators.asof import asof_join_nearest

    t = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 1, t("2024-01-01 12:00:00")),   # back@11:00 (1h) vs fwd@12:30 (30m) -> fwd
         (2, 1, t("2024-01-01 10:50:00")),   # back@... none before? back none -> fwd 11:00
         (3, 1, t("2024-01-01 23:00:00")),   # only backward exists
         (4, 2, t("2024-01-01 12:00:00"))],  # no right rows for key 2
        "id bigint, k bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, t("2024-01-01 11:00:00"), 100),
         (1, t("2024-01-01 12:30:00"), 200)],
        "k bigint, rts timestamp, payload bigint",
    )
    out = {r.id: r.payload for r in asof_join_nearest(
        left, right, "k", "k", "ts", "rts", ["payload"]
    ).collect()}
    assert out[1] == 200
    assert out[2] == 100
    assert out[3] == 200
    assert out[4] is None


def test_asof_nearest_tie_resolves_backward(spark):
    import datetime

    from spectrify_spark.operators.asof import asof_join_nearest

    t = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 1, t("2024-01-01 12:00:00"))], "id bigint, k bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t("2024-01-01 11:00:00"), 100),
         (1, t("2024-01-01 13:00:00"), 200)],
        "k bigint, rts timestamp, payload bigint",
    )
    out = asof_join_nearest(left, right, "k", "k", "ts", "rts", ["payload"]).collect()
    assert out[0].payload == 100  # equidistant -> backward (pandas rule)


def test_asof_nearest_tolerance(spark):
    import datetime

    from spectrify_spark.operators.asof import asof_join_nearest

    t = lambda s: datetime.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, 1, t("2024-01-01 12:00:00"))], "id bigint, k bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, t("2024-01-01 10:00:00"), 100)], "k bigint, rts timestamp, payload bigint"
    )
    hit = asof_join_nearest(left, right, "k", "k", "ts", "rts", ["payload"],
                            tolerance_seconds=3 * 3600).collect()[0]
    miss = asof_join_nearest(left, right, "k", "k", "ts", "rts", ["payload"],
                             tolerance_seconds=3600).collect()[0]
    assert hit.payload == 100 and miss.payload is None


def test_asof_nearest_matches_pandas(spark):
    import numpy as np
    import pandas as pd

    from spectrify_spark.operators.asof import asof_join_nearest

    rng = np.random.default_rng(11)
    base = pd.Timestamp("2024-01-01")
    lpd = pd.DataFrame({
        "k": rng.integers(0, 5, 120),
        "ts": base + pd.to_timedelta(rng.integers(0, 10_000, 120), unit="s"),
    }).sort_values("ts").reset_index(drop=True)
    lpd["id"] = lpd.index
    rpd = pd.DataFrame({
        "k": rng.integers(0, 5, 60),
        "rts": base + pd.to_timedelta(rng.integers(0, 10_000, 60), unit="s"),
        "payload": rng.integers(0, 1_000_000, 60),
    }).sort_values("rts").reset_index(drop=True)
    # pandas nearest needs unique (k, rts) for a deterministic payload
    rpd = rpd.drop_duplicates(["k", "rts"])

    expected = pd.merge_asof(
        lpd, rpd, left_on="ts", right_on="rts", by="k", direction="nearest"
    )
    got = asof_join_nearest(
        spark.createDataFrame(lpd), spark.createDataFrame(rpd),
        "k", "k", "ts", "rts", ["payload"],
    ).toPandas().sort_values("id").reset_index(drop=True)
    exp = expected.sort_values("id").reset_index(drop=True)
    assert (got["payload"].fillna(-1) == exp["payload"].fillna(-1)).all()
