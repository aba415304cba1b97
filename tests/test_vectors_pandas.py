"""Arrow-batched Pandas UDF paths agree with the expression paths."""

from pyspark.sql import functions as F

from spectrify_spark.functions.vectors import (
    cosine,
    cosine_pandas_udf,
    embedding_centroids,
)


def test_pandas_cosine_matches_expression(spark):
    vecs = [(i, [float(i), 1.0, 2.0]) for i in range(1, 6)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    q = [0.5, 1.0, -1.0]
    udf_score = cosine_pandas_udf(q)
    qcol = F.array(*[F.lit(x) for x in q])
    out = df.select(
        "vec_id",
        F.round(udf_score("embedding"), 10).alias("pandas_cos"),
        F.round(cosine(F.col("embedding"), qcol), 10).alias("expr_cos"),
    ).collect()
    for r in out:
        assert r.pandas_cos == r.expr_cos


def test_embedding_centroids_grouped_map(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (1, [3.0, 2.0]),
            (2, [5.0, 5.0]),
        ],
        ["label", "embedding"],
    )
    out = {r.label: r for r in embedding_centroids(df).collect()}
    assert out[1].centroid == [2.0, 1.0]
    assert out[1].n_vecs == 2
    assert out[2].centroid == [5.0, 5.0]


def test_standardize_embeddings_zero_mean_unit_std(spark):
    import numpy as np

    from spectrify_spark.functions.vectors import standardize_embeddings

    rng = np.random.default_rng(7)
    # dim 0 ~ N(100, 5), dim 1 ~ N(-3, 0.1), dim 2 constant
    raw = [(i, [float(rng.normal(100, 5)), float(rng.normal(-3, 0.1)), 42.0])
           for i in range(200)]
    df = spark.createDataFrame(raw, "vec_id bigint, embedding array<double>")
    out = standardize_embeddings(df)
    mat = np.array([r.embedding_std for r in out.collect()])
    # standardized dims: mean ~0, sample std ~1
    assert abs(mat[:, 0].mean()) < 1e-9 and abs(mat[:, 1].mean()) < 1e-9
    assert abs(mat[:, 0].std(ddof=1) - 1) < 1e-9
    assert abs(mat[:, 1].std(ddof=1) - 1) < 1e-9
    # constant dim -> exactly 0, not NaN/inf
    assert (mat[:, 2] == 0.0).all()
