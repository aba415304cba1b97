"""Versioned atomic publish (catalog/publish.py): pointer-flip
protocol, time travel, vacuum grace window, crash-orphan handling."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from spectrify_spark.catalog.publish import (
    CURRENT_POINTER,
    current_version,
    publish,
    read_published,
    vacuum,
)


def _df(spark, n, tag):
    return spark.range(n).select(
        F.col("id").alias("k"), F.lit(tag).alias("tag")
    )


def test_publish_flip_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "ds")
    assert current_version(root) is None
    with pytest.raises(FileNotFoundError):
        read_published(spark, root)

    v1 = publish(_df(spark, 10, "a"), root)
    assert v1 == 1 and current_version(root) == 1
    assert read_published(spark, root).count() == 10

    v2 = publish(_df(spark, 20, "b"), root)
    assert v2 == 2 and current_version(root) == 2
    cur = read_published(spark, root)
    assert cur.count() == 20 and cur.select("tag").first().tag == "b"
    # time travel: v1 still scannable inside the keep window
    old = read_published(spark, root, version=1)
    assert old.count() == 10 and old.select("tag").first().tag == "a"


def test_reader_resolved_before_publish_is_undisturbed(spark, tmp_path):
    """The protocol's point: a DataFrame resolved against version N
    keeps reading N's immutable directory while N+1 publishes and
    flips — no rename ever touches a directory a reader scans."""
    root = str(tmp_path / "ds")
    publish(_df(spark, 10, "a"), root)
    reader = read_published(spark, root)  # resolved at v1
    publish(_df(spark, 20, "b"), root, keep_versions=2)
    assert reader.count() == 10  # unchanged mid-flight view
    assert read_published(spark, root).count() == 20  # new resolution


def test_vacuum_keeps_window_and_never_current(spark, tmp_path):
    root = str(tmp_path / "ds")
    for i in range(4):
        publish(_df(spark, i + 1, f"t{i}"), root, keep_versions=2)
    # keep_versions=2 -> only v3, v4 remain
    assert current_version(root) == 4
    assert sorted(
        int(d[2:]) for d in os.listdir(root) if d.startswith("v=")
    ) == [3, 4]
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        read_published(spark, root, version=1)
    # explicit vacuum never removes the pointed version
    assert vacuum(root, keep_versions=1) == [3]
    assert read_published(spark, root).count() == 4


def test_crash_orphan_is_invisible_and_ages_out(spark, tmp_path):
    """A version dir landed by a crashed publish (pointer never
    flipped) is invisible to readers and numbering continues past it;
    vacuum eventually removes it."""
    root = str(tmp_path / "ds")
    publish(_df(spark, 5, "a"), root)
    # simulate a crash: v=2 landed, pointer still at 1
    _df(spark, 99, "crash").write.parquet(os.path.join(root, "v=2"))
    assert current_version(root) == 1
    assert read_published(spark, root).count() == 5
    # next publish numbers PAST the orphan and flips to it
    v = publish(_df(spark, 7, "c"), root, keep_versions=1)
    assert v == 3 and read_published(spark, root).count() == 7
    assert sorted(
        int(d[2:]) for d in os.listdir(root) if d.startswith("v=")
    ) == [3]


def test_partitioned_publish_and_validation(spark, tmp_path):
    root = str(tmp_path / "ds")
    df = _df(spark, 10, "a").withColumn("p", F.col("k") % 2)
    publish(df, root, partition_by=["p"])
    out = read_published(spark, root)
    assert out.count() == 10 and set(out.columns) == {"k", "tag", "p"}
    with pytest.raises(ValueError, match="keep_versions"):
        publish(df, root, keep_versions=0)
    # pointer file is hidden from scans by the underscore convention
    assert CURRENT_POINTER.startswith("_")
    assert json.load(open(os.path.join(root, CURRENT_POINTER)))["version"] == 1


def test_publish_with_skipping_indexes(spark, tmp_path):
    """stats_cols/bloom_cols build the file-skipping indexes INSIDE
    the version dir before the flip: the published version arrives
    pre-indexed and immutable, so pruned probes work immediately."""
    from spectrify_spark.catalog.publish import current_path
    from spectrify_spark.operators.layout import (
        prune_files,
        prune_files_eq,
        pruned_scan,
    )

    root = str(tmp_path / "ds")
    df = (
        _df(spark, 1000, "a")
        .repartitionByRange(4, F.col("k"))
        .sortWithinPartitions("k")
    )
    publish(df, root, stats_cols=["k"], bloom_cols=["k"])
    path = current_path(root)
    keep, total = prune_files(spark, path, "k", 100, 300)
    assert total == 4 and len(keep) <= 2
    assert pruned_scan(spark, path, "k", 100, 300).count() == 200
    keep_bl, _ = prune_files_eq(spark, path, "k", 150)
    assert 1 <= len(keep_bl) <= total


def test_publish_rejects_overlapping_source(spark, tmp_path):
    """Review regression (r11): publishing a dataset INTO its own
    source directory would land v=N inside it — later plain scans
    discover v=N as a phantom partition and duplicate rows.  Reading
    from a version dir under the SAME root (incremental republish)
    stays allowed."""
    import pytest

    from pyspark.sql import functions as F

    src = str(tmp_path / "plain")
    _df(spark, 10, "a").write.parquet(src)
    df = spark.read.parquet(src)
    with pytest.raises(ValueError, match="source directory"):
        publish(df, src)
    with pytest.raises(ValueError, match="source directory"):
        publish(df, src + "/sub")

    # legitimate: republish a transformation of the current version
    root = str(tmp_path / "ds")
    publish(df, root)
    cur = read_published(spark, root)
    v2 = publish(cur.withColumn("tag", F.lit("b")), root)
    assert v2 == 2 and read_published(spark, root).count() == 10
