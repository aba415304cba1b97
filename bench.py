"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full execution with a count-style action (no
driver-side collect of large results).  Timings include plan + execute.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E
from spectrify_spark.session import get_spark

HEADLINE = [
    "q_agg_hash",
    "q_scan_project",
    "q_join_inner",
    "q_join_broadcast",
    "q_join_multi",
    "q_join_star",
    "q_asof_join",
    "q_agg_distinct",
    "q_window_rank",
    "q_topk",
    "q_events_sessionize",
    "q_events_window",
    "q_text_stats",
    "q_text_tokens",
    "q_dedup_exact",
    "q_dedup_near",
    "q_sim_topk",
    "q_multimodal_cols",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("spectrify-bench")
    qs = E.queries()

    # warm the JVM + parquet footers once (excluded from per-query timing)
    qs["q_scan_project"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
