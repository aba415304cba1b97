"""Benchmark decontamination: flag / drop training documents whose text
overlaps a held-out evaluation set's n-grams.

The standard LLM-pretraining hygiene step (n-gram collision against
benchmark suites), re-expressed Spark-first:

    corpus --tokenize--> per-doc DISTINCT n-gram array
            (``array_distinct`` BEFORE the explode: per-doc dedup is a
            map-side expression, never a shuffle)
    bench  --same--> global distinct gram set -> ``broadcast``
            (benchmarks are MBs even when the corpus is 100 TB)
    explode corpus grams -> broadcast inner join -> groupBy(doc_id)

Scale shape: the broadcast join filters the exploded gram stream
map-side, so the only shuffle is the final groupBy over *hit* rows —
at 100 TB that hit set is tiny relative to the corpus (contamination
rates are <<1%).  No all-pairs step anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spectrify_spark.functions.text import shingles


def ngram_overlap(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_overlap: int = 1,
) -> DataFrame:
    """Per-corpus-doc count of DISTINCT word n-grams shared with the
    benchmark set.

    Returns ``(id_col, n_overlap)`` for docs with at least
    ``min_overlap`` overlapping grams; docs with zero hits never leave
    the join, so the output is proportional to the contaminated slice,
    not the corpus.
    """
    corpus_grams = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), k=n))).alias("gram"),
    )
    bench_grams = (
        bench.select(
            F.explode(F.array_distinct(shingles(F.col(text_col), k=n))).alias("gram")
        )
        .distinct()
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    n: int = 5,
    min_overlap: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop corpus docs sharing >= ``min_overlap`` distinct n-grams with
    the benchmark.  The flagged-id side is usually small (sub-percent
    contamination) but is NOT hinted broadcast — its size scales with
    corpus duplication, so AQE decides the anti-join strategy."""
    flagged = ngram_overlap(
        corpus,
        bench,
        n=n,
        id_col=id_col,
        text_col=text_col,
        min_overlap=min_overlap,
    ).select(id_col)
    return corpus.join(flagged, id_col, "left_anti")
