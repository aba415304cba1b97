"""Recall-vs-cost rehearsal for IVF-PQ exact re-ranking (VERDICT r10
item 4): sweep nprobe x rerank_factor on the sf0.01 embeddings and
measure recall@k against brute-force exact L2, plus probe wall time —
the FAISS trade-off table for this index, on this engine.

Expected shape (and what r11 measured — PERF_NOTES r11):
- rerank removes QUANTIZATION error only: at fixed nprobe, recall
  rises with rerank_factor and saturates at the "every true neighbour
  that survived cell selection" ceiling;
- the nprobe=C column isolates pure PQ error (no cell loss): rerank
  with a large enough factor reaches recall 1.0 there by construction
  (the rehearsal asserts this);
- cost scales with the candidate pool (k*factor ids IN-pruned against
  the vector table), NOT the corpus — wall time should stay near the
  pure-ADC probe's.

Run: python tools/ivfpq_rerank_rehearsal.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from spectrify_spark.operators import quantization as Q
from spectrify_spark.operators import similarity as SIM
from spectrify_spark.session import get_spark
from spectrify_spark.sources.parquet import read_table

K = 10
N_QUERIES = 20
N_CENTROIDS = 8


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ivfpq-rerank-rehearsal")
    e = read_table(spark, f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    n = e.count()
    cents = SIM.kmeans_refine(
        e, SIM.choose_centroids(e, n_centroids=N_CENTROIDS), iters=1
    )
    books = Q.pq_train(e, 4, 16, iters=1)
    work = tempfile.mkdtemp(prefix="ivfpq_rr_")
    Q.write_ivfpq_index(e, cents, books, f"{work}/idx")

    V = {r.vec_id: np.array(r.embedding, np.float64) for r in e.collect()}
    qids = sorted(V)[:N_QUERIES]
    truth = {}
    for qid in qids:
        d = {i: float(((v - V[qid]) ** 2).sum()) for i, v in V.items()}
        truth[qid] = set(sorted(d, key=lambda i: (d[i], i))[:K])

    print(f"n={n} queries={N_QUERIES} k={K} C={N_CENTROIDS}")
    print("nprobe  factor  recall@10  med_wall_s")
    results = {}
    for nprobe in (2, 4, N_CENTROIDS):
        for factor in (None, 2, 4, 8, 16):
            hits, walls = 0, []
            for qid in qids:
                qv = [float(x) for x in V[qid]]
                t0 = time.monotonic()
                if factor is None:
                    got = Q.ivfpq_topk(spark, f"{work}/idx", qv, k=K, nprobe=nprobe)
                else:
                    got = Q.ivfpq_topk(
                        spark, f"{work}/idx", qv, k=K, nprobe=nprobe,
                        rerank_with=e, rerank_factor=factor,
                    )
                ids = {r[0] for r in got.collect()}
                walls.append(time.monotonic() - t0)
                hits += len(ids & truth[qid])
            recall = hits / (K * len(qids))
            med = sorted(walls)[len(walls) // 2]
            tag = "adc" if factor is None else str(factor)
            results[(nprobe, tag)] = recall
            print(f"{nprobe:6d}  {tag:>6}  {recall:9.3f}  {med:10.3f}")

    # invariants: rerank never hurts recall at the same nprobe, and at
    # nprobe=C a corpus-covering factor reaches exact recall
    for nprobe in (2, 4, N_CENTROIDS):
        assert results[(nprobe, "16")] >= results[(nprobe, "adc")] - 1e-9
    full = None
    hits = 0
    for qid in qids:
        qv = [float(x) for x in V[qid]]
        got = Q.ivfpq_topk(
            spark, f"{work}/idx", qv, k=K, nprobe=N_CENTROIDS,
            rerank_with=e, rerank_factor=(n // K) + 1,
        )
        hits += len({r[0] for r in got.collect()} & truth[qid])
    full = hits / (K * len(qids))
    print(f"nprobe=C, corpus-covering factor: recall={full:.3f}")
    assert full == 1.0, "nprobe=C + corpus-covering rerank must be exact"
    print("ok")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
