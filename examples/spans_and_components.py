"""Tour of the late-r10 operators: duplicated-span coverage over a
corpus, topology-independent connected components, and stream-static
broadcast enrichment.

    python examples/spans_and_components.py /root/testdata/sf0.001
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from spectrify_spark.operators.dedup import duplicate_span_stats
from spectrify_spark.operators.graph import (
    connected_components,
    cooccurrence_edges,
)
from spectrify_spark.session import get_spark
from spectrify_spark.sources.parquet import read_table
from spectrify_spark.streaming.events import (
    read_event_stream,
    run_to_memory_sink,
    stream_static_enrich,
)


def main(sf_dir: str) -> None:
    spark = get_spark("spans-components-example")

    # 1. Duplicated-span coverage: which docs are mostly boilerplate?
    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    spans = duplicate_span_stats(docs, window=5, min_docs=2)
    print("== most boilerplate-covered docs ==")
    spans.orderBy(F.desc("dup_frac"), "doc_id").show(5, truncate=False)
    flagged = spans.filter(F.col("dup_frac") >= 0.8).count()
    print(f"{flagged} docs over the 0.8 duplicated-coverage gate")

    # 2. Connected components over the part co-occurrence graph
    li = read_table(spark, f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", min_count=2)
    comp = connected_components(edges)
    print("== component size distribution ==")
    comp.groupBy("component").count().groupBy("count").agg(
        F.count(F.lit(1)).alias("n_components")
    ).orderBy("count").show()

    # 3. Stream-static enrichment: the event stream joined per
    #    microbatch against broadcast dims (no state store)
    cust = read_table(spark, f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    stream = read_event_stream(spark, f"{sf_dir}/events.parquet").select(
        "event_id", "user_id"
    )
    enriched = stream_static_enrich(
        stream, cust, stream["user_id"] == cust["c_custkey"]
    )
    q = run_to_memory_sink(enriched, "enrich_demo", output_mode="append")
    q.processAllAvailable()
    progress = q.lastProgress  # None when no microbatch ran
    assert progress is not None and not progress["stateOperators"], (
        "stateless by design"
    )
    q.stop()
    print("== enriched events per segment ==")
    spark.sql(
        "SELECT c_mktsegment, COUNT(*) n FROM enrich_demo GROUP BY 1 ORDER BY 1"
    ).show()


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    main(sf)
