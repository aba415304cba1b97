"""Scale rehearsal for the end-to-end curation pipeline
(pipelines/training_data.py::curate): wall clock and docs/s at
increasing corpus sizes, recompute vs persist_survivors, and the
plan-shape invariants that make the answer transferable to 100 TB.

The pipeline's wide ops are FIXED IN NUMBER (exact-dedup fingerprint
window, LSH signature groupBy, band-bucket pair join, victim
distinct + anti join) — corpus growth adds rows per task, never new
shuffles — so throughput should hold roughly flat as the corpus
scales, and the persist_survivors knob should save approximately one
annotate pass (its value grows with the gate's pass-rate).

Run: python tools/curate_rehearsal.py [sf_dir ...]
Defaults: /root/testdata/sf0.1 (5k docs) and /tmp/sf1 (50k docs,
built by tools/make_sf.py) when present.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from spectrify_spark.pipelines.training_data import curate
from spectrify_spark.session import get_spark
from spectrify_spark.sources.parquet import read_table


def run(spark, sf_dir: str, persist: bool, reps: int = 3):
    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    n_in = docs.count()
    walls = []
    n_out = None
    for _ in range(reps):
        t0 = time.time()
        out = curate(
            docs,
            min_quality=0.5,
            min_tokens=10,
            near_dup_threshold=0.8,
            persist_survivors=persist,
        )
        n_out = out.count()
        walls.append(time.time() - t0)
        spark.catalog.clearCache()  # each rep pays the full pipeline
    w = statistics.median(walls)
    return n_in, n_out, w


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        d
        for d in ("/root/testdata/sf0.1", "/tmp/sf1")
        if os.path.exists(f"{d}/documents.parquet")
    ]
    spark = get_spark("curate-rehearsal")
    for sf_dir in sf_dirs:
        for persist in (False, True):
            n_in, n_out, w = run(spark, sf_dir, persist)
            print(
                f"{sf_dir:25s} persist={str(persist):5s} "
                f"docs_in={n_in:7d} survivors={n_out:6d} "
                f"median_wall={w:6.2f}s  ({n_in / w:,.0f} docs/s)"
            )


if __name__ == "__main__":
    main()
