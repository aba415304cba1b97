"""Streaming incremental-rollup maintenance — the thirteenth
streaming/batch twin (r17 — VERDICT r16 item 3): a continuous
training-data pipeline's derived views (per-source doc counts, per-day
token totals, distinct-id counts) maintained per micro-batch through
the SAME merge algebra as the batch path
(operators/incremental.py::maintain_published_rollup), so the streamed
drain must equal the batch one-shot aggregate by construction.

Unlike the upsert twins (stream_apply_changes_published,
stream_curate_dedup_publish) a rollup merge is NOT idempotent — a
replayed micro-batch would double-count into sums.  Exactly-once here
rides the publish protocol itself: each refresh lands the merged
rollup AND a batch-id marker (:data:`BATCH_MARKER`) in ONE immutable
version directory behind the atomic pointer flip, so "which batch is
merged in" commits atomically with the data.  On restart,
``foreachBatch`` replays the last uncommitted micro-batch; the sink
reads the pointed version's marker first and SKIPS any batch id it
already covers — no double merge, no lost batch.  (Batch ids are
per-checkpoint: keep one checkpoint dir per rollup root, as with
every streaming sink — and do not interleave batch
``maintain_published_rollup`` refreshes into a LIVE stream's root: a
batch-path version carries no marker, so a stream replay landing
right after one cannot prove its batch was already merged.  Batch
backfills belong before the stream starts or after it stops.)

State story: the stream side holds NO state at all — each micro-batch
partial-aggregates (|batch-groups| rows) and merges against the
pointed rollup (|groups| rows); the corpus is never rescanned and no
state store grows with it.  Insert-only, like the batch contract;
single writer per rollup root.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: per-version marker naming the highest micro-batch id merged into
#: that version — committed atomically with the data by the pointer
#: flip (underscore prefix keeps it invisible to parquet scans)
BATCH_MARKER = "_spectrify_stream_batch.json"


def last_merged_batch_id(spark, root: str) -> "int | None":
    """The batch id the POINTED rollup version covers, or None when
    nothing is published yet or the dataset was built by the batch
    path (no marker)."""
    from spectrify_spark.catalog.publish import current_version, _join
    from spectrify_spark.operators._sidecar import read_json_sidecar

    v = current_version(root, spark)
    if v is None:
        return None
    payload = read_json_sidecar(spark, _join(root, f"v={v}"), BATCH_MARKER)
    return None if payload is None else int(payload["batch_id"])


def stream_rollup_publish(
    stream_df: DataFrame,
    root: str,
    keys: list[str],
    specs: dict,
    keep_versions: int = 2,
    checkpoint_dir: "str | None" = None,
    available_now: bool = True,
):
    """Maintain the published rollup at ``root`` from a streaming
    source: per micro-batch, ``rollup_delta`` partial-aggregates the
    batch, ``merge_rollup`` folds it into the pointed version, and the
    result + batch-id marker land as the next immutable version behind
    the atomic pointer flip (``publish_dir``).  ``specs`` is the
    incremental-rollup measure dict (count/sum/min/max/avg/
    approx_distinct/quantile — the sketch measures merge across
    batches exactly like the batch path); read back with
    ``operators.incremental.read_rollup``.  Returns the started
    StreamingQuery."""
    from spectrify_spark.catalog.publish import (
        current_version,
        publish_dir,
        read_published,
    )
    from spectrify_spark.operators._sidecar import write_json_sidecar
    from spectrify_spark.operators.incremental import (
        _check_specs,
        merge_rollup,
        rollup_delta,
    )

    _check_specs(specs)

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        last = last_merged_batch_id(spark, root)
        if last is not None and batch_id <= last:
            return  # replayed micro-batch: already committed atomically
        # r18 (guide §1.2): every action on a foreachBatch frame
        # re-executes the micro-batch plan from the source — the
        # emptiness guard plus the publish write used to run it twice
        # per batch.  Persist once, hand the cached blocks to both.
        batch = batch.persist()
        try:
            # count() (not take(1)) as the guard: the count job
            # materializes the WHOLE cache in one pass, so the state
            # operator runs in exactly one job and every later
            # consumer reads pure cached blocks (a take(1) guard
            # split the cache fill across two jobs, double-counting
            # state-store checkouts in the progress metrics)
            if batch.count() == 0:
                return
            part = rollup_delta(batch, keys, specs)
            if current_version(root, spark) is not None:
                # the published rollup's schema is the delta's own
                # (merge_rollup keeps it) — skip footer inference (r18)
                part = merge_rollup(
                    read_published(spark, root, schema=part.schema),
                    part, keys, specs,
                )
            # the merged frame reads the pointed version v=N while build
            # lands v=N+1 — safe: versions are immutable, land runs
            # BEFORE the tail vacuum, and the pointer path was resolved
            # above

            def build(vdir: str) -> None:
                part.write.mode("overwrite").parquet(vdir)
                write_json_sidecar(
                    spark, vdir, BATCH_MARKER, {"batch_id": int(batch_id)}
                )

            publish_dir(root, build, keep_versions=keep_versions, spark=spark)
        finally:
            batch.unpersist()

    writer = stream_df.writeStream.foreachBatch(apply_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
