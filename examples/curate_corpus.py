"""End-to-end training-corpus curation.

Mirrors the reference's examples/ pattern (a runnable script over the
library): raw documents -> line dedup -> PII redaction -> quality/lang
gates -> exact + MinHash near dedup -> benchmark decontamination ->
deterministic split -> context-window chunks, written as one
partitioned parquet dataset.

    python examples/curate_corpus.py /root/testdata/sf0.001 /tmp/corpus_out
"""

from __future__ import annotations

import sys

from spectrify_spark.pipelines import curate_chunks
from spectrify_spark.session import get_spark
from spectrify_spark.sources.parquet import read_table, write_parquet


def main(sf_dir: str, dest: str) -> None:
    spark = get_spark("curate-example")
    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    # a stand-in eval set to decontaminate against (fixed, small)
    bench = docs.filter("doc_id % 97 = 0").select("text")
    out = curate_chunks(
        docs,
        chunk_size=256,
        overlap=32,
        min_tokens=5,
        near_dup_threshold=0.8,
        bench=bench,
        line_dedup=False,   # corpus has no line structure; flip for web text
        redact_pii=True,
    )
    write_parquet(out, dest, partition_by=["split"])
    n = spark.read.parquet(dest).count()
    print(f"{n} chunks written to {dest}")


if __name__ == "__main__":
    main(*sys.argv[1:3])
