"""Streaming incremental-rollup maintenance (streaming/rollup.py):
stream/batch parity, atomic batch-id marker, replay skip."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spectrify_spark.catalog.publish import (
    current_path,
    current_version,
    read_published,
)
from spectrify_spark.operators.incremental import (
    finalize_rollup,
    read_rollup,
    rollup_delta,
)
from spectrify_spark.streaming.rollup import (
    BATCH_MARKER,
    last_merged_batch_id,
    stream_rollup_publish,
)

SPECS = {
    "n": ("count", None),
    "total": ("sum", "v"),
    "mean_v": ("avg", "v"),
    "nd_v": ("approx_distinct", "v"),
}


def _write_source(spark, path: str) -> None:
    rows = [(f"k{i % 3}", i % 7) for i in range(60)]
    df = spark.createDataFrame(rows, "k string, v bigint")
    df.repartition(4).write.mode("overwrite").parquet(path)


def _drain(spark, src: str, root: str, ckpt: str) -> None:
    stream = (
        spark.readStream.schema("k string, v bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_rollup_publish(
        stream, root, ["k"], SPECS, keep_versions=2, checkpoint_dir=ckpt
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()


def test_streamed_rollup_equals_batch_oneshot(spark, tmp_path):
    """Multiple micro-batches merged through the published rollup must
    equal the one-shot batch aggregate (the twin property), and the
    marker rides the pointed version."""
    src = str(tmp_path / "src")
    root = str(tmp_path / "rollup")
    _write_source(spark, src)
    _drain(spark, src, root, str(tmp_path / "ckpt"))

    got = {
        tuple(r) for r in read_rollup(spark, root, ["k"], SPECS).collect()
    }
    want = {
        tuple(r)
        for r in finalize_rollup(
            rollup_delta(spark.read.parquet(src), ["k"], SPECS),
            ["k"],
            SPECS,
        ).collect()
    }
    assert got == want and len(want) == 3
    # several micro-batches landed (maxFilesPerTrigger=1 over 4 files)
    assert current_version(root) >= 2
    # the batch-id marker commits WITH the data inside the version dir
    assert os.path.isfile(os.path.join(current_path(root), BATCH_MARKER))
    assert last_merged_batch_id(spark, root) is not None


def test_replayed_batch_ids_skip_not_double_count(spark, tmp_path):
    """The exactly-once guard: re-draining the same source from a
    FRESH checkpoint replays batch ids the pointed marker already
    covers — every one is skipped, the rollup does not double-count,
    and no new version is published."""
    src = str(tmp_path / "src")
    root = str(tmp_path / "rollup")
    _write_source(spark, src)
    _drain(spark, src, root, str(tmp_path / "ckpt1"))
    v1 = current_version(root)
    before = {
        tuple(r) for r in read_published(spark, root).collect()
    }
    # fresh checkpoint: Structured Streaming re-issues ids from 0
    _drain(spark, src, root, str(tmp_path / "ckpt2"))
    assert current_version(root) == v1
    after = {tuple(r) for r in read_published(spark, root).collect()}
    assert after == before


def test_stream_rollup_sketches_match_exact(spark, tmp_path):
    """The sketch measures stay exact across micro-batch merges at
    these cardinalities: avg and distinct equal the SQL aggregates."""
    src = str(tmp_path / "src")
    root = str(tmp_path / "rollup")
    _write_source(spark, src)
    _drain(spark, src, root, str(tmp_path / "ckpt"))
    got = {
        (r["k"], r["mean_v"], r["nd_v"])
        for r in read_rollup(spark, root, ["k"], SPECS).collect()
    }
    want = {
        (r["k"], r["mean_v"], r["nd_v"])
        for r in spark.read.parquet(src)
        .groupBy("k")
        .agg(
            F.avg("v").alias("mean_v"),
            F.countDistinct("v").alias("nd_v"),
        )
        .collect()
    }
    assert got == want
