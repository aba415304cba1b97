"""Deterministic weighted domain sampling — the "data mixture" step of
a training pipeline: each stratum (source/domain) keeps a stable
hash-fraction of its rows per a target weight.

Determinism comes from the engine-portable md5 hash bucket
(``functions.text.hash_bucket``): a row's membership depends only on
its key, so the sample is reproducible across runs, engines, and
corpus growth — properties ``df.sample()``'s RNG cannot give.

Scale shape: pure map-side filter (a literal map lookup + md5 of the
key); no shuffle, no UDF, fully pushdown-friendly upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spectrify_spark.functions.text import hash_bucket


def weighted_sample(
    df: DataFrame,
    *,
    stratum_col: str,
    key_col: str,
    weights: dict[str, float],
    default_weight: float = 0.0,
    buckets: int = 10_000,
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows.

    ``weights`` maps stratum value -> target keep-fraction in [0, 1];
    strata not listed keep ``default_weight``.  Fractions are resolved
    at bucket granularity (1/buckets), identically in any engine that
    can md5 a string.
    """
    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {s!r} must be in [0,1], got {w}")
    if not 0.0 <= default_weight <= 1.0:
        raise ValueError(f"default_weight must be in [0,1], got {default_weight}")
    if weights:
        mapping = F.create_map(
            *[F.lit(x) for kv in sorted(weights.items()) for x in kv]
        )
        w = F.coalesce(mapping[F.col(stratum_col)], F.lit(float(default_weight)))
    else:
        w = F.lit(float(default_weight))
    b = hash_bucket(F.col(key_col), buckets)
    # strict < : weight 0.0 keeps nothing, 1.0 keeps everything
    return df.filter(b < (w * buckets))
