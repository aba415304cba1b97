"""Scale rehearsal for the r14 batched-knn-join shuffle arm
(quantization._index_knn_join): the broadcast arm ships the whole
query batch (with per-query PQ LUTs) to every executor and evaluates
array_contains per (code, query) pair; the shuffle arm explodes the
queries to (cell, query) rows and equi-joins the cell-partitioned
codes — no broadcast-budget bound on the batch.

This rehearsal builds an IVF-PQ index over the sf embeddings, then
times ivfpq_knn_join on BOTH arms at a base query batch and at 10x /
100x that batch (synthetic queries: the corpus vectors re-labeled, so
batch growth is pure query-side growth against a fixed index).  The
result sets are asserted identical per batch before timing.

Run: python tools/knn_shuffle_rehearsal.py [sf_dir] [base_queries]
"""

from __future__ import annotations

import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from spectrify_spark.operators import quantization as Q
from spectrify_spark.operators import similarity as SIM
from spectrify_spark.session import get_spark
from spectrify_spark.sources.parquet import read_table

RUNS = 3


def med_s(fn) -> float:
    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    base_q = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("knn-shuffle-rehearsal")
    e = read_table(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n_corpus = e.count()
    cents = SIM.kmeans_refine(e, SIM.choose_centroids(e, 16), iters=1)
    books = Q.pq_train(e, m_subspaces=4, n_codes=32, iters=1)
    idx = tempfile.mkdtemp(prefix="knn_rehearsal_") + "/idx"
    Q.write_ivfpq_index(e, cents, books, idx)
    print(f"corpus={n_corpus} cells=16 index={idx}")

    for mult in (1, 10, 100):
        n_q = base_q * mult
        # synthetic batch: corpus vectors re-labeled (mod-cycled), so
        # every size probes realistic vectors against the same index
        qs = (
            e.limit(n_q)
            .select(
                F.col("vec_id").alias("q_id"),
                F.col("embedding").alias("q_vec"),
            )
            if n_q <= n_corpus
            else e.crossJoin(
                spark.range((n_q + n_corpus - 1) // n_corpus).select(
                    F.col("id").alias("rep")
                )
            )
            .select(
                (F.col("vec_id") + F.col("rep") * n_corpus).alias("q_id"),
                F.col("embedding").alias("q_vec"),
            )
            .limit(n_q)
        )
        qs = qs.persist()
        qs.count()

        def run(arm: bool):
            Q.ivfpq_knn_join(
                spark, idx, qs, k=10, nprobe=4, broadcast_queries=arm
            ).count()

        got_bc = sorted(
            (r.q_id, r.vec_id, r.adc_dist)
            for r in Q.ivfpq_knn_join(
                spark, idx, qs, k=10, nprobe=4, broadcast_queries=True
            ).collect()
        )
        got_sh = sorted(
            (r.q_id, r.vec_id, r.adc_dist)
            for r in Q.ivfpq_knn_join(
                spark, idx, qs, k=10, nprobe=4, broadcast_queries=False
            ).collect()
        )
        assert got_bc == got_sh, f"arm divergence at {n_q} queries"
        t_bc = med_s(lambda: run(True))
        t_sh = med_s(lambda: run(False))
        print(
            f"queries={n_q:>6}: broadcast {t_bc:.2f}s | shuffle {t_sh:.2f}s "
            f"(x{t_sh / max(t_bc, 1e-9):.2f}) | identical {len(got_bc)} rows"
        )
        qs.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
