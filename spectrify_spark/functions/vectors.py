"""Vector (embedding) column expressions over ``array<float>`` columns.

Expression-only (F.zip_with / F.aggregate -> JVM codegen): dot product,
norms, cosine.  These are the primitives for similarity search and
embedding near-dup at scale — no Python per-row, no pyspark.ml Vector
conversion needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array<numeric> columns (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL when either norm is zero."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom)


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double"))
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def normalize(a: Column) -> Column:
    """Unit-normalize an array<float> (double elements out); NULL-safe.

    The norm is bound ONCE as a lambda-variable struct field: an outer
    computed expression referenced inside a higher-order-function
    lambda is re-evaluated per element, so the naive
    ``transform(a, v -> v / norm(a))`` recomputes the O(d) norm
    aggregate for every element — O(d²) per row (cf. text.shingles)."""
    return F.element_at(
        F.transform(
            F.array(F.struct(a.alias("v"), norm(a).alias("n"))),
            lambda s: F.when(
                s.getField("n") > 0,
                F.transform(
                    s.getField("v"),
                    lambda x: x.cast("double") / s.getField("n"),
                ),
            ),
        ),
        1,
    )


def cosine_pandas_udf(query_vec: list[float]):
    """Arrow-batched Pandas UDF scoring cosine against a fixed query —
    the sanctioned slow path when expression-only scoring isn't enough
    (e.g. calling into numpy/faiss-style kernels).  ~10-100x faster than
    a row-at-a-time Python UDF; still slower than the pure-expression
    ``cosine`` above, which is the default."""
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    @pandas_udf("double")
    def score(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.apply(lambda v: np.asarray(v, dtype=np.float64)))
        norms = np.linalg.norm(m, axis=1) * qn
        out = (m @ q) / np.where(norms == 0, np.nan, norms)
        return pd.Series(out)

    return score


def embedding_centroids(df, group_col: str = "label", vec_col: str = "embedding"):
    """Per-group embedding centroid via applyInPandas (grouped-map Arrow
    path): numpy mean over the stacked group matrix.  The idiomatic slot
    for per-group native-library computation (sklearn/faiss kernels)."""

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.vstack(pdf[vec_col].apply(lambda v: np.asarray(v, dtype=np.float64)))
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "centroid": [m.mean(axis=0).tolist()],
                "n_vecs": [len(pdf)],
            }
        )

    out_schema = (
        f"{group_col} int, centroid array<double>, n_vecs bigint"
    )
    return df.select(group_col, vec_col).groupBy(group_col).applyInPandas(
        centroid, out_schema
    )


def simhash_bits(a: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane SimHash: one bit per plane (sign of dot product),
    packed into a bigint.  ``planes`` is a deterministic driver-side list
    (tiny), broadcast into the plan as literals — the scale path for
    embedding near-dup bucketing."""
    bits = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(a, p) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bits = bits + F.shiftleft(bit, i)
    return bits


def standardize_embeddings(df, vec_col: str = "embedding"):
    """Per-DIMENSION z-score standardization of an embedding column:
    each coordinate is centered on its corpus mean and scaled by its
    corpus sample stddev — the feature-prep step before distance-based
    ops when dimensions live on different scales.  Constant dimensions
    (sd = 0) standardize to 0.0 rather than dividing by zero.

    Scale shape: posexplode -> one (pos)-keyed mean/std aggregate
    (dim-count rows, tiny) -> repacked into two position-ordered arrays
    in a 1-ROW aggregate -> broadcast cross join -> the normalization
    itself is a map-side zip_with.  The corpus is scanned twice (stats
    pass + normalize pass) — inherent, the stats ARE a global reduce —
    but never shuffled, and the second pass is expression-only.

    Returns the input frame plus ``<vec_col>_std`` (array<double>).
    """
    dims = (
        df.select(F.posexplode(F.col(vec_col)).alias("__pos", "__x"))
        .groupBy("__pos")
        .agg(
            F.avg(F.col("__x").cast("double")).alias("__mu"),
            F.stddev_samp(F.col("__x").cast("double")).alias("__sd"),
        )
    )
    packed = dims.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "__mu"))),
            lambda s: s["__mu"],
        ).alias("__mus"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "__sd"))),
            lambda s: s["__sd"],
        ).alias("__sds"),
    )
    centered = F.zip_with(
        F.col(vec_col), F.col("__mus"), lambda x, m: x.cast("double") - m
    )
    scaled = F.zip_with(
        centered,
        F.col("__sds"),
        lambda d, s: F.when(s > 0, d / s).otherwise(F.lit(0.0)),
    )
    return (
        df.crossJoin(F.broadcast(packed))
        .withColumn(f"{vec_col}_std", scaled)
        .drop("__mus", "__sds")
    )
