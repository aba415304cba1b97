"""Similarity-search operator tests."""

from spectrify_spark.operators import similarity as SIM

VECS = [
    (0, [1.0, 0.0, 0.0]),
    (1, [0.9, 0.1, 0.0]),
    (2, [0.0, 1.0, 0.0]),
    (3, [0.0, 0.0, 1.0]),
    (4, [0.7, 0.7, 0.0]),
]


def _df(spark):
    return spark.createDataFrame(VECS, ["vec_id", "embedding"])


def test_brute_force_topk_order(spark):
    out = SIM.brute_force_topk(_df(spark), [1.0, 0.0, 0.0], k=3)
    ids = [r.vec_id for r in out.collect()]
    assert ids == [0, 1, 4]


def test_knn_join_topk_per_query(spark):
    corpus = _df(spark)
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0])], ["q_id", "q_vec"]
    )
    out = SIM.knn_join_topk(corpus, queries, k=2)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r.q_id, []).append(r.vec_id)
    assert by_q[100] == [0, 1]
    assert by_q[200][0] == 2


def test_ivf_full_probe_matches_brute_force(spark):
    df = _df(spark)
    cents = SIM.choose_centroids(df, n_centroids=3)
    assigned = SIM.assign_partitions(df, cents)
    exact = [r.vec_id for r in SIM.brute_force_topk(df, [1.0, 0.0, 0.0], k=2).collect()]
    approx = [
        r.vec_id
        for r in SIM.ivf_topk(assigned, cents, [1.0, 0.0, 0.0], k=2, nprobe=3).collect()
    ]
    assert approx == exact  # probing every cell == exact search


def test_ivf_partial_probe_is_subset_scan(spark):
    df = _df(spark)
    cents = SIM.choose_centroids(df, n_centroids=3)
    assigned = SIM.assign_partitions(df, cents)
    out = SIM.ivf_topk(assigned, cents, [1.0, 0.0, 0.0], k=5, nprobe=1)
    assert 0 < out.count() <= 5
