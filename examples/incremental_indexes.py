"""The daily-increment maintenance loop for both materialized index
families — the 100 TB operating shape where the corpus is processed
ONCE and every delta after that is probe -> append -> (periodic)
compact:

1. MinHash band index: near-dup pairs a text delta introduces, via a
   partition-pruned index probe (never a corpus re-shingle), then the
   delta's banded rows appended into the same partition grid.
2. IVF-PQ ANN index: vector deltas assigned with the index's OWN
   stored model and appended; probes scan nprobe/C cell partitions of
   4-byte codes.

    python examples/incremental_indexes.py /root/testdata/sf0.001 /tmp/idx_demo
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from spectrify_spark.operators import dedup, quantization as Q, similarity as SIM
from spectrify_spark.session import get_spark
from spectrify_spark.sources.parquet import read_table


def main(sf_dir: str, work: str) -> None:
    spark = get_spark("incremental-indexes-example")

    # ---- text: banded MinHash index, probed + appended per delta
    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") < 300)
    day1 = docs.filter((F.col("doc_id") >= 300) & (F.col("doc_id") < 400))
    day2 = docs.filter(F.col("doc_id") >= 400)

    band_idx = f"{work}/band_index"
    dedup.write_band_index(corpus, band_idx, n_buckets=16)
    for name, delta in (("day1", day1), ("day2", day2)):
        pairs = dedup.near_dup_pairs_indexed(spark, band_idx, delta, threshold=0.8)
        print(f"{name}: {pairs.count()} new near-dup pairs")
        dedup.write_band_index(delta, band_idx, n_buckets=16, mode="append")
        spark.catalog.clearCache()
    # periodic OPTIMIZE: fold per-append files to one per (band, pbucket)
    dedup.compact_band_index(spark, band_idx, f"{work}/band_index_c")
    print("band index params:", dedup.read_index_params(spark, band_idx))

    # ---- vectors: IVF-PQ index, appended with the stored model
    vecs = read_table(spark, f"{sf_dir}/embeddings.parquet")
    base = vecs.filter(F.col("vec_id") < 400)
    delta = vecs.filter(F.col("vec_id") >= 400)
    cents = SIM.kmeans_refine(base, SIM.choose_centroids(base, 8), iters=1)
    books = Q.pq_train(base, 4, 16, iters=1)
    ann_idx = f"{work}/ivfpq_index"
    Q.write_ivfpq_index(base, cents, books, ann_idx)
    # the delta is assigned + encoded with the index's OWN stored
    # model (loaded from the sidecar) — an increment cannot drift
    Q.append_ivfpq_index(delta, ann_idx)
    qv = [float(x) for x in vecs.filter(F.col("vec_id") == 450).first().embedding]
    hits = Q.ivfpq_topk(spark, ann_idx, qv, k=5, nprobe=2)
    print("ANN probe (nprobe=2) for an APPENDED vector (450 finds itself):")
    hits.show()

    # ---- periodic FULL REBUILD, reader-safe: write_ivfpq_index
    # overwrites a live dir (a concurrent probe could catch it
    # half-deleted), so rebuilds go through the versioned publish —
    # each build lands as an immutable v=N, probes resolve the
    # pointer first, and the keep window leaves the previous index
    # intact for in-flight readers (catalog/publish.py::publish_dir).
    from spectrify_spark.catalog.publish import current_path, publish_dir

    ann_root = f"{work}/ivfpq_published"
    cents2 = SIM.kmeans_refine(vecs, SIM.choose_centroids(vecs, 8), iters=1)
    books2 = Q.pq_train(vecs, 4, 16, iters=1)
    v = publish_dir(
        ann_root, lambda d: Q.write_ivfpq_index(vecs, cents2, books2, d)
    )
    print(f"published rebuilt index as v={v}; probing through the pointer:")
    Q.ivfpq_topk(spark, current_path(ann_root), qv, k=5, nprobe=2).show()
    # no spark.stop(): get_spark() returns the process-wide shared
    # session (tests/test_examples.py runs this in-process — stopping
    # the context here killed every test after it in the suite)


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/idx_demo"
    main(sf, out)
