"""Streaming ingest curation — the curation pipeline's stateless head
(pipelines/training_data.py::annotate_gate) applied to a Structured
Streaming source.

At continuous-ingest scale the quality/length gate belongs at the EDGE:
every row it drops never pays downstream shuffle, state-store, or
storage cost.  Because the head is pure per-row Catalyst expressions
(clean -> lang-id -> quality -> token count -> gate -> split
assignment), the streaming plan has NO state store and NO watermark —
nothing to size, nothing to evict, per-micro-batch cost strictly
proportional to arriving bytes.  The STATEFUL curation stages compose
downstream on the gated stream: exact/near dedup via
``streaming/events.py::dedup_within_watermark`` (q_stream_dedup's
watermark-bounded state) or as periodic batch compactions committed
through the versioned publish (streaming/cdc.py).

Batch/stream parity is structural, not re-implemented: both forms call
the SAME ``annotate_gate`` projection, so the streamed drain must equal
the batch run row-for-row (q_stream_curate's oracle is exactly the
batch SQL replica of those stages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spectrify_spark.functions import text as TX
from spectrify_spark.pipelines.training_data import annotate_gate


def stream_curate(
    docs_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.0,
    min_tokens: int = 5,
    split_weights: tuple[int, int, int] = (90, 5, 5),
    redact_pii: bool = False,
    carry_cols: "list[str] | None" = None,
) -> DataFrame:
    """Curate a streaming documents source: returns a STREAMING frame
    ``(id, text_clean, lang, quality, n_tokens, split)`` — one row per
    arriving doc that passes the quality/length gate, with the same
    deterministic md5-bucket split as the batch pipeline (a doc's
    split never depends on when it arrived).  ``carry_cols`` pass
    through untouched (the event-time column for a downstream
    watermark-bounded stage).

    Stateless by construction: safe in ``append`` mode with no
    watermark, restarts are trivially exactly-once given an
    idempotent sink (the projection is deterministic per row).
    """
    carry = list(carry_cols or [])
    gated = annotate_gate(
        docs_stream,
        id_col=id_col,
        text_col=text_col,
        min_quality=min_quality,
        min_tokens=min_tokens,
        redact_pii=redact_pii,
        carry_cols=carry,
    )
    n_train, n_valid, _ = split_weights
    bucket = TX.hash_bucket(F.col("id"), sum(split_weights))
    return gated.select(
        "id",
        "text_clean",
        "lang",
        "quality",
        "n_tokens",
        F.when(bucket < n_train, F.lit("train"))
        .when(bucket < n_train + n_valid, F.lit("valid"))
        .otherwise(F.lit("test"))
        .alias("split"),
        *carry,
    )
