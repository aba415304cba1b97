"""Incremental aggregate-view maintenance (operators/incremental.py):
merge-of-partials algebra, published-refresh lifecycle, insert-only
contract guards."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spectrify_spark.operators.incremental import (
    finalize_rollup,
    maintain_published_rollup,
    merge_rollup,
    read_rollup,
    recompute_partitions,
    rollup_delta,
)

SPECS = {
    "n": ("count", None),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _rows(spark, data):
    return spark.createDataFrame(data, "k string, v bigint")


def test_merge_equals_full_recompute(spark):
    """The whole point: partial-agg of each slice + merge must equal
    the one-shot aggregate over the union — including new keys in the
    delta, keys absent from the delta, and NULL measure values."""
    base_rows = _rows(
        spark,
        [("a", 1), ("a", 5), ("b", 7), ("c", None), ("c", 2)],
    )
    delta_rows = _rows(
        spark, [("a", 3), ("c", None), ("d", 9), ("d", -1)]
    )
    base = rollup_delta(base_rows, ["k"], SPECS)
    delta = rollup_delta(delta_rows, ["k"], SPECS)
    merged = {
        tuple(r)
        for r in merge_rollup(base, delta, ["k"], SPECS).collect()
    }
    full = {
        tuple(r)
        for r in rollup_delta(
            base_rows.unionByName(delta_rows), ["k"], SPECS
        ).collect()
    }
    assert merged == full and len(full) == 4


def test_merge_is_associative_across_splits(spark):
    """Merge order must not matter: ((b+d1)+d2) == (b+(d1+d2)) == full
    — the property that lets refreshes batch or stream arbitrarily."""
    import random

    rng = random.Random(3)
    rows = [(f"k{rng.randrange(5)}", rng.randrange(-50, 50)) for _ in range(90)]
    slices = [
        _rows(spark, rows[:30]),
        _rows(spark, rows[30:60]),
        _rows(spark, rows[60:]),
    ]
    parts = [rollup_delta(s, ["k"], SPECS) for s in slices]
    left = merge_rollup(
        merge_rollup(parts[0], parts[1], ["k"], SPECS), parts[2], ["k"], SPECS
    )
    right = merge_rollup(
        parts[0], merge_rollup(parts[1], parts[2], ["k"], SPECS), ["k"], SPECS
    )
    full = rollup_delta(_rows(spark, rows), ["k"], SPECS)
    want = {tuple(r) for r in full.collect()}
    assert {tuple(r) for r in left.collect()} == want
    assert {tuple(r) for r in right.collect()} == want


def test_maintain_published_rollup_lifecycle(spark, tmp_path):
    """Published refresh loop: first refresh publishes the partial,
    later ones merge with the POINTED version and flip; the previous
    rollup stays time-travelable; result equals full recompute after
    every step."""
    from spectrify_spark.catalog.publish import read_published

    root = str(tmp_path / "rollup")
    d1 = _rows(spark, [("a", 1), ("b", 2)])
    d2 = _rows(spark, [("a", 10), ("c", 3)])
    v1 = maintain_published_rollup(spark, root, d1, ["k"], SPECS)
    assert v1 == 1
    got1 = {tuple(r) for r in read_published(spark, root).collect()}
    assert got1 == {("a", 1, 1, 1, 1), ("b", 1, 2, 2, 2)}

    v2 = maintain_published_rollup(spark, root, d2, ["k"], SPECS)
    assert v2 == 2
    got2 = {tuple(r) for r in read_published(spark, root).collect()}
    want2 = {
        tuple(r)
        for r in rollup_delta(d1.unionByName(d2), ["k"], SPECS).collect()
    }
    assert got2 == want2
    # time travel: the pre-refresh rollup is intact
    assert {
        tuple(r) for r in read_published(spark, root, version=1).collect()
    } == got1


def test_unknown_kind_and_empty_specs_refused(spark):
    with pytest.raises(ValueError, match="unknown kind"):
        rollup_delta(_rows(spark, [("a", 1)]), ["k"], {"x": ("median", "v")})
    with pytest.raises(ValueError, match="at least one measure"):
        rollup_delta(_rows(spark, [("a", 1)]), ["k"], {})
    with pytest.raises(ValueError, match="needs a source column"):
        rollup_delta(_rows(spark, [("a", 1)]), ["k"], {"x": ("avg", None)})
    with pytest.raises(ValueError, match="0 < p < 1"):
        rollup_delta(
            _rows(spark, [("a", 1)]), ["k"], {"x": ("quantile", "v")}
        )
    with pytest.raises(ValueError, match="0 < p < 1"):
        rollup_delta(
            _rows(spark, [("a", 1)]), ["k"], {"x": ("quantile", "v", 1.5)}
        )


# ----------------------------- mergeable-sketch measures (r17)

SKETCH_SPECS = {
    "n": ("count", None),
    "mean_v": ("avg", "v"),
    "nd_v": ("approx_distinct", "v"),
    "p50_v": ("quantile", "v", 0.5),
}


def test_sketch_measures_merge_equals_recompute(spark):
    """avg / approx_distinct / quantile: partial-of-slices + merge,
    finalized, must equal the finalized one-shot aggregate — theta is
    in exact mode at these cardinalities and KLL stores small streams
    exactly, so equality is exact, not approximate."""
    base_rows = _rows(
        spark,
        [("a", 1), ("a", 5), ("a", 5), ("b", 7), ("c", None), ("c", 2)],
    )
    delta_rows = _rows(
        spark, [("a", 3), ("c", None), ("d", 9), ("d", -1), ("d", 9)]
    )
    merged = finalize_rollup(
        merge_rollup(
            rollup_delta(base_rows, ["k"], SKETCH_SPECS),
            rollup_delta(delta_rows, ["k"], SKETCH_SPECS),
            ["k"],
            SKETCH_SPECS,
        ),
        ["k"],
        SKETCH_SPECS,
    )
    full = finalize_rollup(
        rollup_delta(
            base_rows.unionByName(delta_rows), ["k"], SKETCH_SPECS
        ),
        ["k"],
        SKETCH_SPECS,
    )
    got = {tuple(r) for r in merged.collect()}
    want = {tuple(r) for r in full.collect()}
    assert got == want and len(want) == 4
    by_k = {r["k"]: r for r in merged.collect()}
    # spot-check semantics: a: [1,5,5,3] -> avg 3.5, 3 distinct, p50 3
    assert by_k["a"]["mean_v"] == pytest.approx(3.5)
    assert by_k["a"]["nd_v"] == 3


def test_sketch_measures_null_semantics(spark):
    """SQL aggregate NULL rules survive the partial/merge round trip:
    an all-NULL group has avg NULL, approx_distinct 0, quantile NULL
    (the empty-KLL guard — reading a quantile from an empty sketch
    would otherwise throw)."""
    rows = _rows(spark, [("z", None), ("z", None), ("a", 4)])
    out = finalize_rollup(
        merge_rollup(
            rollup_delta(rows, ["k"], SKETCH_SPECS),
            rollup_delta(_rows(spark, [("z", None)]), ["k"], SKETCH_SPECS),
            ["k"],
            SKETCH_SPECS,
        ),
        ["k"],
        SKETCH_SPECS,
    )
    by_k = {r["k"]: r for r in out.collect()}
    assert by_k["z"]["n"] == 3
    assert by_k["z"]["mean_v"] is None
    assert by_k["z"]["nd_v"] == 0
    assert by_k["z"]["p50_v"] is None
    assert by_k["a"]["mean_v"] == pytest.approx(4.0)


def test_sketch_measures_associative(spark):
    """Merge order must not matter for the sketch kinds either —
    the property that lets refreshes batch or stream arbitrarily."""
    import random

    rng = random.Random(7)
    rows = [(f"k{rng.randrange(4)}", rng.randrange(0, 30)) for _ in range(120)]
    parts = [
        rollup_delta(_rows(spark, rows[i : i + 40]), ["k"], SKETCH_SPECS)
        for i in (0, 40, 80)
    ]
    left = merge_rollup(
        merge_rollup(parts[0], parts[1], ["k"], SKETCH_SPECS),
        parts[2],
        ["k"],
        SKETCH_SPECS,
    )
    right = merge_rollup(
        parts[0],
        merge_rollup(parts[1], parts[2], ["k"], SKETCH_SPECS),
        ["k"],
        SKETCH_SPECS,
    )
    fin = lambda d: {
        tuple(r)
        for r in finalize_rollup(d, ["k"], SKETCH_SPECS).collect()
    }
    want = fin(rollup_delta(_rows(spark, rows), ["k"], SKETCH_SPECS))
    assert fin(left) == want
    assert fin(right) == want


def test_published_sketch_rollup_roundtrip(spark, tmp_path):
    """The sketch partials survive the parquet publish round trip
    (binary sketch columns + hidden avg pair persist and re-merge):
    two published refreshes read back via read_rollup equal the
    one-shot finalized aggregate."""
    root = str(tmp_path / "rollup")
    d1 = _rows(spark, [("a", 1), ("a", 2), ("b", 5)])
    d2 = _rows(spark, [("a", 2), ("b", None), ("c", 8)])
    maintain_published_rollup(spark, root, d1, ["k"], SKETCH_SPECS)
    maintain_published_rollup(spark, root, d2, ["k"], SKETCH_SPECS)
    got = {
        tuple(r)
        for r in read_rollup(spark, root, ["k"], SKETCH_SPECS).collect()
    }
    want = {
        tuple(r)
        for r in finalize_rollup(
            rollup_delta(d1.unionByName(d2), ["k"], SKETCH_SPECS),
            ["k"],
            SKETCH_SPECS,
        ).collect()
    }
    assert got == want


# ----------------------------- retraction recompute (r17)


def test_recompute_partitions_matches_full_recompute(spark, tmp_path):
    """The deletes story the insert-only contract points at: apply a
    retraction to the base, recompute ONLY the touched key-groups, and
    the refreshed rollup must equal a full recompute over the
    corrected base — including a group whose rows were ALL retracted
    (it disappears)."""
    root = str(tmp_path / "rollup")
    base0 = _rows(
        spark,
        [("a", 1), ("a", 5), ("b", 7), ("b", 2), ("gone", 9), ("c", 4)],
    )
    maintain_published_rollup(spark, root, base0, ["k"], SPECS)
    # retract: one of b's rows and ALL of gone's rows
    base1 = base0.filter(
        ~((F.col("k") == "b") & (F.col("v") == 7))
        & (F.col("k") != "gone")
    )
    touched = spark.createDataFrame([("b",), ("gone",)], "k string")
    v = recompute_partitions(
        spark, root, base1, touched, ["k"], SPECS
    )
    assert v == 2
    from spectrify_spark.catalog.publish import read_published

    got = {tuple(r) for r in read_published(spark, root).collect()}
    want = {
        tuple(r) for r in rollup_delta(base1, ["k"], SPECS).collect()
    }
    assert got == want
    assert not any(r[0] == "gone" for r in got)
    # untouched groups passed through (a, c intact)
    assert ("a", 2, 6, 1, 5) in got and ("c", 1, 4, 4, 4) in got


def test_recompute_partitions_sketch_measures(spark, tmp_path):
    """Retraction recompute composes with the sketch measures: the
    touched group's sketches are rebuilt from base, untouched groups'
    persisted sketches pass through byte-identical."""
    root = str(tmp_path / "rollup")
    base0 = _rows(
        spark, [("a", 1), ("a", 1), ("a", 3), ("b", 5), ("b", 6)]
    )
    maintain_published_rollup(spark, root, base0, ["k"], SKETCH_SPECS)
    base1 = base0.filter(~((F.col("k") == "a") & (F.col("v") == 3)))
    touched = spark.createDataFrame([("a",)], "k string")
    recompute_partitions(
        spark, root, base1, touched, ["k"], SKETCH_SPECS
    )
    got = {
        tuple(r)
        for r in read_rollup(spark, root, ["k"], SKETCH_SPECS).collect()
    }
    want = {
        tuple(r)
        for r in finalize_rollup(
            rollup_delta(base1, ["k"], SKETCH_SPECS),
            ["k"],
            SKETCH_SPECS,
        ).collect()
    }
    assert got == want


def test_refresh_cost_is_delta_sized(spark, tmp_path):
    """The scale property, pinned on the plan: the second refresh's
    merged frame scans the PUBLISHED ROLLUP (|groups| rows) and the
    DELTA — the base corpus parquet never appears among its input
    files."""
    from spectrify_spark.catalog.publish import current_path, read_published
    from spectrify_spark.operators.incremental import (
        merge_rollup,
        rollup_delta,
    )

    corpus = str(tmp_path / "corpus")
    _rows(spark, [("a", i) for i in range(1000)]).write.parquet(corpus)
    root = str(tmp_path / "rollup")
    maintain_published_rollup(
        spark, root, spark.read.parquet(corpus), ["k"], SPECS
    )
    delta_path = str(tmp_path / "delta")
    _rows(spark, [("a", 5), ("b", 6)]).write.parquet(delta_path)
    delta = spark.read.parquet(delta_path)
    merged = merge_rollup(
        read_published(spark, root),
        rollup_delta(delta, ["k"], SPECS),
        ["k"],
        SPECS,
    )
    dirs = {f.rsplit("/", 1)[0].replace("file:", "") for f in merged.inputFiles()}
    assert not any(d.endswith("/corpus") for d in dirs), dirs
    assert any("/rollup/v=" in d for d in dirs) and any(
        d.endswith("/delta") for d in dirs
    ), dirs
    # and the merge is still exact
    got = {tuple(r) for r in merged.collect()}
    want = {
        tuple(r)
        for r in rollup_delta(
            spark.read.parquet(corpus).unionByName(delta), ["k"], SPECS
        ).collect()
    }
    assert got == want
    assert current_path(root)  # published version resolvable


def test_rollup_cli_refresh_and_read(spark, tmp_path, capsys):
    """CLI surface (r17): rollup-refresh merges a delta parquet into
    the published rollup; rollup-read prints the finalized JSON lines
    (avg quotient + theta estimate derived at read time)."""
    import json

    from spectrify_spark import cli

    d1 = str(tmp_path / "d1")
    d2 = str(tmp_path / "d2")
    _rows(spark, [("a", 1), ("a", 3), ("b", 5)]).write.parquet(d1)
    _rows(spark, [("a", 2), ("c", 7)]).write.parquet(d2)
    root = str(tmp_path / "rollup")
    measures = [
        "n=count", "total=sum:v", "mean_v=avg:v",
        "nd=approx_distinct:v", "p50=quantile:v:0.5",
    ]
    for delta in (d1, d2):
        assert (
            cli.main(
                ["rollup-refresh", delta, root, "--keys", "k",
                 "--measures", *measures]
            )
            == 0
        )
    capsys.readouterr()
    assert (
        cli.main(
            ["rollup-read", root, "--keys", "k", "--measures", *measures]
        )
        == 0
    )
    lines = [
        json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    by_k = {r["k"]: r for r in lines}
    assert by_k["a"]["n"] == 3 and by_k["a"]["total"] == 6
    assert by_k["a"]["mean_v"] == pytest.approx(2.0)
    assert by_k["a"]["nd"] == 3
    assert by_k["c"]["n"] == 1 and by_k["c"]["p50"] == pytest.approx(7.0)

    # syntax errors are refused with a clean message
    with pytest.raises(SystemExit, match="OUT=KIND"):
        cli.main(["rollup-refresh", d1, root, "--keys", "k",
                  "--measures", "bogus"])


def test_theta_union_carries_spec_lgk(spark):
    """r17 10x-rehearsal find: theta_union_agg's DEFAULT nominal k is
    smaller than the sketches' lgk — merging two exact-mode sketches
    through it DOWNSAMPLED them into estimation mode, so the merged
    distinct went approximate while the one-shot recompute stayed
    exact (q_incr_distinct's merge-parity boolean caught it at
    /tmp/sf1).  The merge now passes the spec's lgk through: at 9000
    distincts (> the default union's k, < 2^14) the merged estimate
    must equal the exact count."""
    specs = {"nd": ("approx_distinct", "v")}
    d1 = spark.range(6000).select(
        F.lit("a").alias("k"), F.col("id").alias("v")
    )
    d2 = spark.range(3000, 9000).select(
        F.lit("a").alias("k"), F.col("id").alias("v")
    )
    merged = finalize_rollup(
        merge_rollup(
            rollup_delta(d1, ["k"], specs),
            rollup_delta(d2, ["k"], specs),
            ["k"],
            specs,
        ),
        ["k"],
        specs,
    )
    assert merged.collect()[0]["nd"] == 9000
