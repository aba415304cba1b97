"""AQE skew-join handling, demonstrated: a planted hot key must make
the runtime SPLIT the skewed partition (SortMergeJoin(skew=true) in
the final adaptive plan) — the mechanism the session factory enables
(spark.sql.adaptive.skewJoin.enabled) and the docs lean on for skew
this side of explicit salting.

Pitfall pinned here: the split is DISALLOWED when the join feeds an
operator that requires the join key's partitioning (e.g. groupBy on
the same key) — splitting would break co-partitioning.  The probe
therefore finishes with a global aggregate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_confs(spark):
    keep = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    prev = {k: spark.conf.get(k, None) for k in keep}
    for k, v in keep.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _frames(spark):
    # fact: 200k rows, ~95% on key 0; the pad column is referenced by
    # the aggregate so it SURVIVES into the shuffle (a constant-key
    # partition of bare longs compresses to a few KB and never crosses
    # the skew threshold), and md5 keeps it incompressible
    fact = spark.range(200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.md5(F.col("id").cast("string")).alias("pad"),
    )
    dim = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    return fact, dim


def test_aqe_splits_planted_hot_key(spark, skew_confs):
    fact, dim = _frames(spark)
    joined = fact.join(dim, on="k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.length("pad")).alias("p"),
    )
    got = joined.collect()[0]
    plan = joined._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "skew=true" in plan, (
        "AQE did not split the skewed partition:\n" + plan[:2000]
    )
    # correctness unaffected by the split: a broadcast join (no skew
    # machinery at all) must produce the identical aggregate
    ref = (
        _frames(spark)[0]
        .join(F.broadcast(_frames(spark)[1]), on="k")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.length("pad")).alias("p"),
        )
        .collect()[0]
    )
    assert (got.n, got.s, got.p) == (ref.n, ref.s, ref.p)


def _skew_rehearsal_module():
    """The rehearsal tool and this regression test MUST exercise the
    same pathological distribution, or a fixture tweak silently
    decouples the BENCH_NOTES tables from what the test pins — so the
    corpus builder has ONE home (tools/knn_skew_rehearsal.py) and the
    test imports it (tools/ is not a package; importlib loads the
    file directly)."""
    import importlib.util
    import pathlib

    p = pathlib.Path(__file__).resolve().parent.parent / (
        "tools/knn_skew_rehearsal.py"
    )
    spec = importlib.util.spec_from_file_location("knn_skew_rehearsal", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _hot_cell_corpus(spark, n_rows=120_000, hot_share=0.9):
    """Pathological IVF cell distribution — ``hot_share`` of the
    vectors in one centroid cell, per-row hash noise keeping pq codes
    varied (a constant hot partition would compress under the skew
    threshold and hide the very condition under test).  Shared with
    the rehearsal tool; see :func:`_skew_rehearsal_module`."""
    return _skew_rehearsal_module().corpus(spark, n_rows, hot_share)


def _basis_centroids(dim=8):
    return [
        (c, [1.0 if j == c else 0.0 for j in range(dim)]) for c in range(dim)
    ]


def test_knn_shuffle_arm_skew_split(spark, skew_confs, tmp_path):
    """r14 VERDICT item 4: the shuffle arm's (cell, query) equi-join
    inherits IVF cell imbalance — with ~90% of the corpus in ONE cell,
    the hot cell is one shuffle partition and one straggler task.
    Pins that AQE's skew machinery actually engages on THIS join shape
    (SortMergeJoin(skew=true) in the final adaptive plan — the window
    that follows partitions by query_id, not the join key, so the
    split is allowed), and that the skew-split results stay identical
    to the broadcast arm's.

    Two make-or-break preconditions, both discovered by this test
    failing without them (they are the production lessons):
    - AQE splits a skewed reduce partition by MAPPER ranges, so a hot
      cell written as ONE file (the writers' old fixed
      repartition(cell)) is one mapper and cannot be split at all —
      the index must be built with ``shards_per_cell`` > 1 on skewed
      distributions (at 100 TB the hot cell spans many files anyway;
      the single-file collapse is the small-scale artifact);
    - the scan must not re-merge those files into one input task
      (files.maxPartitionBytes small enough here; at real scale file
      sizes exceed it naturally)."""
    from spectrify_spark.operators import quantization as Q

    files_confs = {
        "spark.sql.files.maxPartitionBytes": "32KB",
        "spark.sql.files.openCostInBytes": "0",
    }
    prev = {k: spark.conf.get(k, None) for k in files_confs}
    for k, v in files_confs.items():
        spark.conf.set(k, v)
    try:
        _run_knn_skew_probe(spark, tmp_path, Q)
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _run_knn_skew_probe(spark, tmp_path, Q):
    corpus = _hot_cell_corpus(spark)
    cents = _basis_centroids()
    books = Q.deterministic_codebooks(2, 16, 4)
    path = str(tmp_path / "ivfpq")
    Q.write_ivfpq_index(corpus, cents, books, path, shards_per_cell=16)

    # sanity: the distribution IS pathological (>= 90% in cell 0)
    sizes = {
        int(r.ivf_cell): r.n
        for r in spark.read.parquet(path)
        .groupBy("ivf_cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sizes[0] / sum(sizes.values()) >= 0.9

    # 8 queries all probing the hot cell (plus one cold neighbour)
    queries = spark.range(8).select(
        F.col("id").alias("q_id"),
        F.array(
            *[
                (F.lit(1.0 if j == 0 else 0.01)).cast("float")
                for j in range(8)
            ]
        ).alias("q_vec"),
    )
    shuf = Q.ivfpq_knn_join(
        spark, path, queries, k=5, nprobe=2, broadcast_queries=False
    )
    rows_shuf = sorted(
        (r.q_id, r.vec_id, r.adc_dist) for r in shuf.collect()
    )
    plan = shuf._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "skew=true" in plan, (
        "AQE did not split the hot IVF cell on the shuffle knn arm:\n"
        + plan[:2000]
    )

    bro = Q.ivfpq_knn_join(
        spark, path, queries, k=5, nprobe=2, broadcast_queries=True
    )
    rows_bro = sorted((r.q_id, r.vec_id, r.adc_dist) for r in bro.collect())
    assert rows_shuf == rows_bro
