"""Empty-input and degenerate-shape robustness: every composite
operator must return an EMPTY result with the right schema — not throw —
when a side is empty, and a property test pins as-of semantics to
pandas merge_asof on random data."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from spectrify_spark.operators.asof import asof_join_backward
from spectrify_spark.operators.dedup import dedup_exact, near_dup_pairs
from spectrify_spark.operators.relational import scd2_history
from spectrify_spark.operators.sessionize import sessionize
from spectrify_spark.operators.sketches import hll_rollup, hll_sketches
from spectrify_spark.operators.skew import salted_join


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id bigint, text string")


def _empty_events(spark):
    return spark.createDataFrame(
        [], "event_id bigint, user_id bigint, ts timestamp"
    )


def test_dedup_ops_on_empty_input(spark):
    docs = _empty_docs(spark)
    assert dedup_exact(docs, ["text"]).count() == 0
    assert near_dup_pairs(docs, id_col="doc_id", text_col="text").count() == 0


def test_sessionize_on_empty_input(spark):
    ev = _empty_events(spark)
    out = sessionize(ev, user_col="user_id", ts_col="ts")
    assert out.count() == 0


def test_asof_on_empty_right_yields_null_payload(spark):
    left = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1))], "k bigint, ts timestamp"
    )
    right = spark.createDataFrame([], "k bigint, ts timestamp, v double")
    out = asof_join_backward(
        left, right, "k", "k", "ts", "ts", payload=["v"]
    ).collect()
    assert len(out) == 1 and out[0]["v"] is None


def test_scd2_single_version_is_current(spark):
    df = spark.createDataFrame(
        [(1, 1, datetime.datetime(2024, 1, 1))], "k bigint, seq bigint, ts timestamp"
    )
    out = scd2_history(df, key="k", ts="ts", tie_break="seq").collect()
    assert len(out) == 1 and out[0]["is_current"] and out[0]["valid_to"] is None


def test_salted_join_empty_fact(spark):
    fact = spark.createDataFrame([], "fk bigint, x double")
    dim = spark.createDataFrame([(1, "a")], "dk bigint, name string")
    assert salted_join(fact, dim, "fk", "dk").count() == 0


def test_hll_rollup_empty_input(spark):
    df = spark.createDataFrame([], "g bigint, v bigint")
    assert hll_rollup(hll_sketches(df, ["g"], "v"), ["g"]).count() == 0


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=30,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000), st.integers(0, 99)),
        max_size=30,
    ),
)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    """Backward as-of join equals pandas merge_asof (by=key) on random
    keyed integer timelines — including empty right sides, duplicate
    timestamps on the left, and keys present on only one side.

    Right-side duplicate timestamps are dropped (keep last by value)
    because merge_asof's intra-tie winner is positional while ours is
    by tie-break column — both 'last', but only comparable when the
    (key, ts) pair is unique."""
    epoch = datetime.datetime(2024, 1, 1)

    def ts(s):
        return epoch + datetime.timedelta(seconds=s)

    right_dedup = {}
    for k, t, v in sorted(right, key=lambda x: (x[0], x[1], x[2])):
        right_dedup[(k, t)] = v
    rrows = [(k, ts(t), float(v)) for (k, t), v in right_dedup.items()]

    ldf = spark.createDataFrame(
        [(k, ts(t)) for k, t in left], "k bigint, ts timestamp"
    )
    rdf = spark.createDataFrame(
        rrows or [], "k bigint, ts timestamp, v double"
    )
    got = sorted(
        (r["k"], r["ts"], r["v"])
        for r in asof_join_backward(
            ldf, rdf, "k", "k", "ts", "ts", payload=["v"]
        ).collect()
    )

    lpd = pd.DataFrame(sorted(left), columns=["k", "s"])
    lpd["ts"] = lpd["s"].map(ts)
    rpd = pd.DataFrame(
        sorted((k, t, float(v)) for (k, t), v in right_dedup.items()),
        columns=["k", "s", "v"],
    )
    if len(rpd):
        rpd["ts"] = rpd["s"].map(ts)
        merged = pd.merge_asof(
            lpd.sort_values("ts", kind="stable"),
            rpd[["k", "ts", "v"]].sort_values("ts", kind="stable"),
            on="ts",
            by="k",
            direction="backward",
        )
        want = sorted(
            (int(r.k), r.ts.to_pydatetime(), None if pd.isna(r.v) else float(r.v))
            for r in merged.itertuples()
        )
    else:
        want = sorted((k, ts(t), None) for k, t in left)
    assert got == want


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 20_000)),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    gap=st.sampled_from([60, 600, 3600]),
)
def test_sessionize_matches_reference_scan(spark, events, gap):
    """Gap sessionization equals the obvious sequential per-user scan on
    random (user, second-offset) events — session ids are 1-based,
    contiguous, and break exactly when the gap is exceeded."""
    import datetime as _dt

    from spectrify_spark.operators.sessionize import sessionize

    epoch = _dt.datetime(2024, 1, 1)
    rows = [
        (i, u, epoch + _dt.timedelta(seconds=s))
        for i, (u, s) in enumerate(sorted(events))
    ]
    df = spark.createDataFrame(rows, "event_id bigint, user_id bigint, ts timestamp")
    got = {
        (r["user_id"], r["event_id"]): r["session_id"]
        for r in sessionize(df, gap_seconds=gap).collect()
    }

    want = {}
    by_user: dict[int, list[tuple[int, int]]] = {}
    for i, (u, s) in enumerate(sorted(events)):
        by_user.setdefault(u, []).append((s, i))
    for u, evs in by_user.items():
        sid, prev = 0, None
        for s, i in sorted(evs):
            if prev is None or s - prev > gap:
                sid += 1
            want[(u, i)] = sid
            prev = s
    assert got == want


def test_cli_curate_writes_partitioned_corpus(spark, tmp_path):
    from spectrify_spark import cli

    dest = str(tmp_path / "curated")
    rc = cli.main(
        [
            "curate",
            "/root/testdata/sf0.001/documents.parquet",
            dest,
            "--partition-by-split",
        ]
    )
    assert rc == 0
    back = spark.read.parquet(dest)
    assert back.count() > 0
    assert {r["split"] for r in back.select("split").distinct().collect()} <= {
        "train", "valid", "test"
    }


def test_cli_search_prints_bm25_hits(spark, capsys):
    from spectrify_spark import cli

    rc = cli.main(
        [
            "search",
            "/root/testdata/sf0.001/documents.parquet",
            "vector",
            "stream",
            "-k",
            "5",
        ]
    )
    assert rc == 0
    lines = [
        ln for ln in capsys.readouterr().out.strip().splitlines() if "\t" in ln
    ]
    assert len(lines) == 5
    # scores are descending
    scores = [float(ln.split("\t")[1]) for ln in lines]
    assert scores == sorted(scores, reverse=True)


def test_cli_pack_assigns_contiguous_shards(spark, tmp_path):
    from spectrify_spark import cli

    dest = str(tmp_path / "packed")
    rc = cli.main(
        [
            "pack",
            "/root/testdata/sf0.001/documents.parquet",
            dest,
            "--budget",
            "500",
        ]
    )
    assert rc == 0
    back = spark.read.parquet(dest)
    assert {"doc_id", "n_tokens", "shard_id"} <= set(back.columns)
    rows = sorted(
        ((r["doc_id"], r["shard_id"]) for r in back.collect())
    )
    shards = [s for _, s in rows]
    # shard ids are non-decreasing in doc order and start at 0
    assert shards[0] == 0
    assert all(a <= b for a, b in zip(shards, shards[1:]))
    assert back.count() == spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).count()


def test_cli_diff_identical_and_drifted(spark, tmp_path, capsys):
    from spectrify_spark import cli

    src = "/root/testdata/sf0.001/nation.parquet"
    rc = cli.main(["diff", src, src, "n_nationkey"])
    assert rc == 0
    assert "identical" in capsys.readouterr().out
    drifted = str(tmp_path / "nation2")
    spark.read.parquet(src).filter("n_nationkey < 20").write.parquet(drifted)
    rc = cli.main(["diff", src, drifted, "n_nationkey"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "removed\t5" in out


def test_cli_drift_prints_metrics(spark, capsys):
    from spectrify_spark import cli

    src = "/root/testdata/sf0.001/documents.parquet"
    rc = cli.main(["drift", src, src])
    assert rc == 0
    out = dict(
        ln.split("\t") for ln in capsys.readouterr().out.strip().splitlines()
    )
    # identical corpora: all four metrics exactly zero
    assert {k: float(v) for k, v in out.items()} == {
        "kl_ab": 0.0,
        "kl_ba": 0.0,
        "js_divergence": 0.0,
        "total_variation": 0.0,
    }


def test_cli_validate_reports_and_strict_gates(capsys):
    import pytest as _pytest

    from spectrify_spark import cli

    src = "/root/testdata/sf0.001/lineitem.parquet"
    rc = cli.main([
        "validate", src,
        "--not-null", "l_extendedprice",
        "--in-range", "l_quantity:1:50",
        "--fk", "l_orderkey=/root/testdata/sf0.001/orders.parquet:o_orderkey",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ok   not_null(l_extendedprice)" in out
    assert "FAIL" not in out
    # --strict turns a failing check into a nonzero exit
    with _pytest.raises(SystemExit):
        cli.main(["validate", src, "--unique", "l_orderkey", "--strict"])


def test_cli_compact_with_zorder(spark, tmp_path, capsys):
    import glob

    from spectrify_spark import cli

    src = str(tmp_path / "scattered")
    dest = str(tmp_path / "compacted")
    spark.range(5000).selectExpr(
        "id", "CAST(id % 50 AS LONG) AS a", "CAST(id % 31 AS LONG) AS b"
    ).repartition(32).write.parquet(src)
    rc = cli.main(
        ["compact", src, dest, "--target-mb", "64", "--zorder", "a", "b", "--bits", "8"]
    )
    assert rc == 0
    assert "file(s)" in capsys.readouterr().out
    assert len(glob.glob(f"{dest}/part-*.parquet")) < 32
    out = spark.read.parquet(dest)
    assert out.count() == 5000 and "z" in out.columns


def test_s3a_credentials_conf_mapping(spark):
    """Credential plumbing (reference export.py:36-53 get_credentials,
    utils/redshift.py:4-27 env resolution): env vars map to public
    fs.s3a.* keys, a session token switches the provider, and
    apply_to_session lands them on the live JVM hadoop conf."""
    from spectrify_spark.sources.credentials import (
        apply_to_session,
        as_spark_conf,
        s3a_conf,
        s3a_conf_from_env,
    )

    env = {
        "AWS_ACCESS_KEY_ID": "AKIATEST",
        "AWS_SECRET_ACCESS_KEY": "sekrit",
        "AWS_SESSION_TOKEN": "tok",
        "AWS_DEFAULT_REGION": "us-east-1",
    }
    conf = s3a_conf_from_env(env)
    assert conf["fs.s3a.access.key"] == "AKIATEST"
    assert conf["fs.s3a.secret.key"] == "sekrit"
    assert conf["fs.s3a.session.token"] == "tok"
    assert conf["fs.s3a.endpoint.region"] == "us-east-1"
    assert conf["fs.s3a.aws.credentials.provider"].endswith(
        "TemporaryAWSCredentialsProvider"
    )
    # no token -> default provider chain (key absent)
    assert "fs.s3a.aws.credentials.provider" not in s3a_conf(
        access_key="a", secret_key="b"
    )
    assert as_spark_conf({"fs.s3a.access.key": "x"}) == {
        "spark.hadoop.fs.s3a.access.key": "x"
    }
    apply_to_session(spark, {"fs.s3a.test.marker": "present"})
    jconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert jconf.get("fs.s3a.test.marker") == "present"


def test_cli_conf_passthrough(spark, tmp_path, capsys):
    """--conf KEY=VALUE reaches the live session (hadoop keys land on
    the JVM conf even when getOrCreate returns the running session)."""
    from spectrify_spark import cli

    src = str(tmp_path / "n.parquet")
    spark.range(2).write.parquet(src)
    rc = cli.main(
        [
            "--conf",
            "spark.hadoop.fs.s3a.endpoint.region=eu-west-1",
            "export",
            src,
            str(tmp_path / "csv"),
        ]
    )
    assert rc == 0
    capsys.readouterr()
    jconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert jconf.get("fs.s3a.endpoint.region") == "eu-west-1"


def test_cli_components_writes_labels(spark, tmp_path, capsys):
    from spectrify_spark import cli

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["src", "dst"]
    )
    src = str(tmp_path / "edges")
    edges.write.parquet(src)
    dest = str(tmp_path / "comp")
    rc = cli.main(["components", src, dest])
    assert rc == 0
    assert "2 component(s)" in capsys.readouterr().out
    got = {
        (r.id, r.component) for r in spark.read.parquet(dest).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
