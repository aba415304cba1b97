"""Document chunking for context-window preparation.

Splits each document's token stream into fixed-size chunks with a
configurable overlap (stride = size - overlap) — the step that turns a
cleaned corpus into model-ready context windows (RAG passage tables,
pretraining sequence inputs before packing).

Spark-first shape: pure Catalyst expressions — split/filter for
tokenization, ``sequence`` for chunk starts, one ``explode`` for the
fan-out, ``slice``/``array_join`` for the chunk text.  No shuffle at
all: chunking is embarrassingly parallel per document, so the plan is a
single map-side stage whose output feeds the next shuffle (dedup,
packing) directly.  Row amplification is ~n_tokens/stride per doc,
bounded and predictable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_tokens(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    overlap: int = 16,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Explode each document into overlapping token chunks.

    Output: ``(id_col, chunk_id, n_tokens, chunk_text, *carry_cols)``;
    chunk_id is the 0-based chunk ordinal.  The final chunk may be
    shorter than ``chunk_size``; a chunk consisting ONLY of overlap
    (fully contained in the previous chunk) is never emitted — starts
    stop before ``n_tokens - overlap``.  Empty/whitespace documents
    yield no rows.  ``carry_cols`` replicate per-doc annotations onto
    every chunk inside the same map-side explode (no join, no second
    pass over the corpus).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    carry = list(carry_cols or [])
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )
    # starts = 0, stride, 2*stride, ... < max(n_tokens - overlap, 1)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(F.col("__toks")) - F.lit(overlap), F.lit(1)) - F.lit(1),
        F.lit(stride),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_size)
    return (
        df.select(F.col(id_col), toks.alias("__toks"), *carry)
        .select(id_col, "__toks", F.explode(starts).alias("__start"), *carry)
        .select(
            id_col,
            (F.col("__start") / stride).cast("bigint").alias("chunk_id"),
            F.size(chunk).cast("bigint").alias("n_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
            *carry,
        )
        .filter(F.col("n_tokens") > 0)
    )
