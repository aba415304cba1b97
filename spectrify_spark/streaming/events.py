"""Structured Streaming twins of the batch event-time operators.

The reference is batch-only; these extend the engine to continuous
ingestion of the same events schema.  The transformations are shared
with the batch forms (same F.window expressions), so a query validated
against the batch oracle runs unchanged on a stream — the Structured
Streaming model's core promise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """File-source stream over parquet event shards (swap for Kafka in
    production — the downstream plan is identical)."""
    import os

    reader = spark.readStream.schema(EVENTS_SCHEMA).option(
        "maxFilesPerTrigger", str(max_files_per_trigger)
    )
    if os.path.isfile(path):
        # FileStreamSource requires a directory basePath: stream the
        # parent directory restricted to exactly this basename via
        # pathGlobFilter.  (A bare `path + '*'` prefix glob would also
        # match siblings sharing the prefix — events.parquet.bak,
        # events.parquet2 — silently streaming foreign rows.)
        parent, base = os.path.split(os.path.abspath(path))
        # escape glob metacharacters so a literal basename stays literal
        base = "".join("[" + c + "]" if c in "*?[]{}^\\" else c for c in base)
        reader = reader.option("pathGlobFilter", base)
        path = parent
    return reader.parquet(path)


def windowed_counts(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str = "2 hours",
    aggs: dict | None = None,
) -> DataFrame:
    """Event-time tumbling-window counts with a late-data watermark —
    state is bounded by (watermark / duration) windows per key.

    ``aggs`` overrides the default count/sum pair (name -> Column), e.g.
    a decimal-typed sum when the consumer needs order-independent exact
    results (float addition order varies across microbatches)."""
    aggs = aggs or {
        "n_events": F.count(F.lit(1)),
        "sum_value": F.sum("value"),
    }
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration), F.col("event_type"))
        .agg(*[c.alias(n) for n, c in aggs.items()])
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            *aggs.keys(),
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """True streaming sessionization via session_window (gap-based,
    state managed by the engine; the batch twin is
    operators.sessionize.sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window(F.col("ts"), gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


def running_user_totals(
    events: DataFrame, timeout_minutes: int | None = None
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running event count + value sum; with ``timeout_minutes``
    set, state is evicted after that much processing-time inactivity
    (note: a processing-time timeout makes the query trigger continuous
    state-cleanup batches — processAllAvailable() then never settles, so
    tests and drain-style runs should use the NoTimeout default).

    This is the engine's template for operators Structured Streaming's
    built-ins can't express (bespoke accumulators, model state, CEP):
    Arrow-batched per-group pandas with explicit GroupState.

    (Spark 4.1's arbitrary-state v2 — ``transformWithStateInPandas``
    with typed value/list/map state, timers and TTL — was evaluated as
    the successor surface, but its state protocol requires protobuf at
    runtime, which this environment does not ship; the v1 GroupState
    API above is the supported custom-state path here and carries the
    same semantics.)
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, n_events bigint, sum_value double"
    state_schema = "n bigint, s double"

    def update(key, pdf_iter, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        if timeout_minutes is not None:
            state.setTimeoutDuration(60_000 * timeout_minutes)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_minutes is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup of at-least-once ingestion: drop re-deliveries
    of the same ``keys`` (default event_id) arriving within the watermark.

    ``dropDuplicatesWithinWatermark`` keeps first-seen state only until
    the event-time watermark passes it, so state is bounded by the
    redelivery horizon — the property plain ``dropDuplicates`` on a
    stream lacks (its state grows forever).  The batch twin is
    ``operators.dedup.exact_dedup``; a drained availableNow run equals
    the batch dedup whenever inter-duplicate lag < watermark (asserted
    in tests/test_streaming.py).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    interval: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join on ``key`` within an event-time interval:
    right rows match left rows with ``l.ts <= r.ts <= l.ts + interval``
    (attribution joins: click -> purchase within the hour).

    Both sides are watermarked and the join condition bounds event time
    in BOTH directions, so the engine can evict matched/expired state —
    the requirements for a state-bounded stream-stream join.  The batch
    twin is ``operators.relational.point_in_interval_join``'s
    bucketized range join.
    """
    l = left.withWatermark("ts", watermark).select(
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {interval}")),
        "inner",
    )


def stream_convert_csv(
    spark: SparkSession,
    csv_dir: str,
    schema,
    parquet_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuous convert stage: the reference's batch CSV->Parquet
    conversion as a Structured Streaming job — new UNLOAD shards landing
    in ``csv_dir`` are converted to parquet exactly once (checkpointed),
    replacing cron-driven re-runs of the batch pipeline.

    Uses the same UNLOAD CSV conventions as sources/csv.py; booleans
    ('t'/'f') must be post-processed by the caller if present (streaming
    reader takes the schema as-is).
    """
    from spectrify_spark.sources.csv import CSV_OPTIONS

    src = spark.readStream.options(**CSV_OPTIONS).schema(schema).csv(csv_dir)
    writer = (
        src.writeStream.format("parquet")
        .option("path", parquet_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_static_enrich(
    stream_df: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
) -> DataFrame:
    """Stream-static enrichment join: each microbatch of the stream is
    joined against a STATIC dimension table (``on`` is a join Column
    expression or key-name list), with a broadcast hint on the dim.

    This is the third streaming-join shape next to the stream-stream
    interval join (both sides moving, state-store-backed) and the CDC
    foreachBatch merge (static side mutated): here the static side is
    read-only per microbatch, so the join needs NO state store and no
    watermark — the stream side flows map-side through a broadcast
    hash join, the shape that survives any throughput.  The static
    plan is re-resolved per microbatch, so a file-backed dim picks up
    replaced data on the next batch (the slowly-changing-dimension
    refresh pattern without restarts).  Only ``inner`` and
    ``left_outer`` (stream side preserved) are supported by the
    engine for stream-static joins — validated HERE so an unsupported
    mode fails immediately with a clear error instead of Spark's late
    AnalysisException at stream start; chain calls to enrich against a
    star schema of several dims.
    """
    if how.lower() not in ("inner", "left_outer", "left", "leftouter"):
        # Spark's join how is case-insensitive; match that so the
        # eager guard never rejects a mode the engine accepts
        raise ValueError(
            "stream_static_enrich: stream-static joins support only "
            f"'inner' and 'left_outer' (stream side preserved); got {how!r}"
        )
    return stream_df.join(F.broadcast(dim), on, how)


def run_to_memory_sink(
    stream_df: DataFrame, query_name: str, output_mode: str = "update"
) -> "pyspark.sql.streaming.StreamingQuery":  # noqa: F821
    """Drive a streaming plan into an in-memory sink (test harness)."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .start()
    )
