"""Exchange-layer rehearsal for the multimodal decode path (r11):
mapInPandas (payloads boxed as Python bytes via pandas object dtype)
vs mapInArrow (zero-copy memoryviews off the RecordBatch value
buffer), same per-buffer math (`_feature_triplet`), parity-pinned by
tests/test_multimodal.py.

Run: python tools/arrow_decode_rehearsal.py [n_rows] [payload_kb]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from spectrify_spark.multimodal.binary_cols import (
    decode_images,
    decode_images_arrow,
)
from spectrify_spark.session import get_spark

RUNS = 5


def main() -> int:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    kb = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("arrow-decode-rehearsal")
    media = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("media_id"),
            F.lit("image").alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            # deterministic pseudo-random payload, JVM-side
            F.repeat(F.sha2(F.col("id").cast("string"), 512), kb * 1024 // 128)
            .cast("binary")
            .alias("payload"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        )
        .persist()
    )
    media.count()

    def timed(fn):
        ts = []
        for _ in range(RUNS):
            t = time.monotonic()
            fn().agg(F.sum(F.col("content_hash") % 1_000_003)).collect()
            ts.append(time.monotonic() - t)
        return statistics.median(ts)

    t_pandas = timed(lambda: decode_images(media))
    t_arrow = timed(lambda: decode_images_arrow(media))
    mb = n_rows * kb / 1024
    print(
        f"{n_rows} rows x {kb} KiB ({mb:.0f} MiB): "
        f"mapInPandas {t_pandas:.3f}s ({mb / t_pandas:.0f} MiB/s)  "
        f"mapInArrow {t_arrow:.3f}s ({mb / t_arrow:.0f} MiB/s)  "
        f"speedup {t_pandas / t_arrow:.2f}x"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
