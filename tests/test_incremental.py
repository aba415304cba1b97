"""Incremental aggregate-view maintenance (operators/incremental.py):
merge-of-partials algebra, published-refresh lifecycle, insert-only
contract guards."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spectrify_spark.operators.incremental import (
    maintain_published_rollup,
    merge_rollup,
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
        rollup_delta(_rows(spark, [("a", 1)]), ["k"], {"x": ("avg", "v")})
    with pytest.raises(ValueError, match="at least one measure"):
        rollup_delta(_rows(spark, [("a", 1)]), ["k"], {})


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
