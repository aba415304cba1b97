"""Scale-strategy operators: salted joins, bucketed co-located joins,
partitioned IVF index.  Semantics checked on small data; the *plan
shape* (no Exchange, partition pruning) is asserted directly, because
the plan is what holds at 100 TB."""

from pyspark.sql import functions as F

from spectrify_spark.catalog.bucketing import bucketed_join, write_bucketed
from spectrify_spark.operators import similarity as SIM
from spectrify_spark.operators.skew import explain_skew, salted_join


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_matches_plain_join(spark):
    fact = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d")], ["k", "v"]
    )
    dim = spark.createDataFrame([(1, "X"), (2, "Y")], ["dk", "name"])
    plain = {(r.k, r.v, r.name) for r in fact.join(dim, fact.k == dim.dk).collect()}
    salted = {
        (r.k, r.v, r.name)
        for r in salted_join(fact, dim, "k", "dk", num_salts=4).collect()
    }
    assert salted == plain


def test_explain_skew_finds_hot_key(spark):
    df = spark.createDataFrame([(1,)] * 50 + [(2,)] * 3, ["k"])
    top = explain_skew(df, "k", top_n=1).collect()
    assert top[0].k == 1 and top[0].n_rows == 50


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    li = spark.createDataFrame(
        [(i % 10, i) for i in range(100)], ["orderkey", "x"]
    )
    o = spark.createDataFrame([(i, f"o{i}") for i in range(10)], ["orderkey", "status"])
    try:
        write_bucketed(li, "b_lineitem", ["orderkey"], num_buckets=4)
        write_bucketed(o, "b_orders", ["orderkey"], num_buckets=4)
        # force a sort-merge join so bucketing (not broadcast) is what
        # saves the shuffle — that's the fact-fact case bucketing exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_lineitem", "b_orders", ["orderkey"])
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # buckets already co-located
        assert joined.count() == 100
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_ivf_index_partition_pruning(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, [float(i % 3), float((i + 1) % 3), 1.0]) for i in range(30)],
        ["vec_id", "embedding"],
    )
    cents = SIM.choose_centroids(df, n_centroids=3)
    path = str(tmp_path / "ivf")
    SIM.write_ivf_index(df, cents, path)
    idx = SIM.read_ivf_index(spark, path)
    out = SIM.ivf_topk(idx, cents, [1.0, 0.0, 1.0], k=5, nprobe=1)
    plan = _plan(out)
    assert "PartitionFilters" in plan and "ivf_cell" in plan
    assert out.count() == 5
