"""Mergeable-sketch aggregation — the pre-aggregation pattern that makes
100 TB distinct-count / quantile rollups cheap.

The reference engine has no sketch support (its only aggregate path is
the Spectrum-side SQL it generates); this module is part of the
training-data-pipeline surface: distinct-user counts per shard merged to
global, quantile profiles of document lengths, etc., computed once at a
fine grain and re-aggregated WITHOUT touching raw rows again.

Spark ships Apache DataSketches HLL natively (``hll_sketch_agg`` /
``hll_union_agg`` / ``hll_sketch_estimate``, JVM-side, mergeable binary
sketches) and a Greenwald-Khanna-style quantile summary
(``approx_percentile``).  Both are algebraic aggregates: partial
(map-side) combine happens for free, and persisted fine-grain sketch
tables can be rolled up along any dimension hierarchy — the classic
OLAP cube trick for non-additive measures.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_sketches(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = 14,
) -> DataFrame:
    """Per-group HLL sketches of ``value_col`` (binary, mergeable).

    ``lgk`` = log2 of the number of HLL buckets: 14 (the function's
    ceiling-accuracy default) gives ~0.8% relative standard error at
    ~16 KB per sketch.  The output is the materializable "sketch table"
    — at scale, write it partitioned by the finest grain and serve every
    coarser rollup from it via :func:`hll_rollup`.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, lgk).alias("hll_sketch")
    )


def hll_rollup(
    sketches: DataFrame,
    group_cols: Sequence[str],
    estimate_col: str = "approx_distinct",
) -> DataFrame:
    """Merge fine-grain sketches up to ``group_cols`` and estimate.

    Union of HLL sketches is lossless (the merged sketch equals the
    sketch of the unioned inputs), so rolling up a (day, shard) sketch
    table to monthly or global distincts reads only sketches — never the
    raw 100 TB — and still carries the same error bound.
    """
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias(estimate_col)
    )


def quantile_profile(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles as one array column.

    ``approx_percentile`` is Spark's bounded-memory quantile summary:
    rank error <= 1/accuracy regardless of input size, partials merge
    map-side.  The exact alternative (``percentile``) buffers per-group
    values and dies at fact-table scale; keep it for small-N validation
    only (see ``q_quantile_sketch``'s self-check).
    """
    probs = "array(" + ",".join(repr(float(p)) for p in probabilities) + ")"
    return df.groupBy(*group_cols).agg(
        F.expr(
            f"approx_percentile({value_col}, {probs}, {accuracy})"
        ).alias("quantiles")
    )
