"""Round-9 surface tour: real multimodal codecs, the materialized LSH
band index, count-min frequency sketches, and triangle counting — one
runnable script.

    python examples/media_and_index.py /root/testdata/sf0.001 /tmp/media_demo
"""

from __future__ import annotations

import sys

import numpy as np
from pyspark.sql import functions as F

from spectrify_spark.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    decode_images,
    video_frame_features,
)
from spectrify_spark.multimodal.codecs import encode_png, encode_wav, encode_y4m
from spectrify_spark.operators.dedup import (
    near_dup_pairs_indexed,
    write_band_index,
)
from spectrify_spark.operators.graph import triangle_count
from spectrify_spark.operators.sketches import (
    cm_build,
    cm_merge,
    cm_point_estimates,
)
from spectrify_spark.session import get_spark
from spectrify_spark.sources.parquet import read_table


def main(sf_dir: str, work_dir: str) -> None:
    spark = get_spark("media-index-example")
    docs = read_table(spark, f"{sf_dir}/documents.parquet")
    li = read_table(spark, f"{sf_dir}/lineitem.parquet")

    print("== real codecs: PNG image, WAV audio, Y4M video ==")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (8, 8, 3), np.uint8)
    wav = np.tile(np.array([2000, -2000], np.int32), 800)[:, None]
    vid = rng.randint(0, 256, (6, 4, 4, 1), np.uint8)
    media = spark.createDataFrame(
        [
            (1, "image", "image/png", bytearray(encode_png(img, filter_type=4)), 8, 8, None),
            (2, "audio", "audio/wav", bytearray(encode_wav(wav, 16000, 16)), None, None, 100),
            (3, "video", "video/y4m", bytearray(encode_y4m(vid)), 4, 4, 240),
        ],
        MEDIA_SCHEMA,
    )
    decode_images(media.filter(F.col("kind") == "image"), codec="real").show()
    audio_features(media.filter(F.col("kind") == "audio")).show()
    video_frame_features(media.filter(F.col("kind") == "video"), every_n=3).show()

    print("== materialized band index + incremental near-dup probe ==")
    corpus = docs.filter(F.col("doc_id") < 400)
    delta = docs.filter(F.col("doc_id") >= 400)
    idx = f"{work_dir}/band_index"
    write_band_index(corpus, idx, n_buckets=4)
    pairs = near_dup_pairs_indexed(spark, idx, delta, threshold=0.8, n_buckets=4)
    print(f"new near-dup pairs introduced by the delta: {pairs.count()}")
    spark.catalog.clearCache()

    print("== count-min sketch: per-shard build, merged estimates ==")
    s1 = cm_build(li.filter(F.col("l_orderkey") % 2 == 0), "l_partkey")
    s2 = cm_build(li.filter(F.col("l_orderkey") % 2 == 1), "l_partkey")
    probes = li.select("l_partkey").distinct().limit(5)
    cm_point_estimates(cm_merge(s1, s2), probes, "l_partkey").show()

    print("== triangle count over the part co-occurrence graph ==")
    x, y = li.alias("x"), li.alias("y")
    edges = x.join(
        y,
        (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
        & (F.col("x.l_partkey") < F.col("y.l_partkey")),
    ).select(F.col("x.l_partkey").alias("src"), F.col("y.l_partkey").alias("dst"))
    triangle_count(edges).show()
    print("media_and_index done")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
