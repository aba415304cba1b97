"""Property tests: the as-of join trio must match pandas merge_asof on
ARBITRARY timelines — not just the fixture seeds.  pandas is the
semantics oracle here (the operator docstrings promise merge_asof
behavior); DuckDB twins check engine parity separately."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spectrify_spark.operators.asof import (
    asof_join_backward,
    asof_join_forward,
    asof_join_nearest,
)

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small key space + dense integer seconds force plenty of equal-ts
# collisions (the tie rules are where implementations diverge)
_timeline = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50)),
    min_size=1,
    max_size=30,
)


def _frames(spark, lrows, rrows):
    base = pd.Timestamp("2024-01-01")
    lpd = pd.DataFrame(
        {"k": [k for k, _ in lrows],
         "ts": [base + pd.Timedelta(seconds=s) for _, s in lrows]}
    ).sort_values("ts").reset_index(drop=True)
    lpd["id"] = lpd.index
    rpd = pd.DataFrame(
        {"k": [k for k, _ in rrows],
         "rts": [base + pd.Timedelta(seconds=s) for _, s in rrows]}
    ).drop_duplicates(["k", "rts"]).sort_values("rts").reset_index(drop=True)
    # unique payload per (k, rts) so every engine's tie rule agrees
    rpd["payload"] = rpd.index * 10
    return lpd, rpd


def _compare(spark, lrows, rrows, direction, fn):
    lpd, rpd = _frames(spark, lrows, rrows)
    exp = pd.merge_asof(
        lpd, rpd, left_on="ts", right_on="rts", by="k", direction=direction
    ).sort_values("id")["payload"].fillna(-1).tolist()
    got_df = fn(
        spark.createDataFrame(lpd), spark.createDataFrame(rpd),
        "k", "k", "ts", "rts", ["payload"],
    ).toPandas().sort_values("id")
    got = got_df["payload"].fillna(-1).tolist()
    assert got == exp, f"{direction}: {got} != {exp}"


@settings(**_SETTINGS)
@given(l=_timeline, r=_timeline)
def test_backward_matches_pandas(spark, l, r):
    _compare(spark, l, r, "backward", asof_join_backward)


@settings(**_SETTINGS)
@given(l=_timeline, r=_timeline)
def test_forward_matches_pandas(spark, l, r):
    _compare(spark, l, r, "forward", asof_join_forward)


@settings(**_SETTINGS)
@given(l=_timeline, r=_timeline)
def test_nearest_matches_pandas(spark, l, r):
    _compare(spark, l, r, "nearest", asof_join_nearest)
