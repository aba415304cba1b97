"""Multimodal (image/audio/video) column handling.

Media travels as opaque ``binary`` columns plus typed metadata —
the only representation that scales: bytes stay columnar in parquet,
metadata predicates prune scans without touching payloads.

Decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages (one Python worker per partition, whole
record-batches across the boundary — never per-row Python).  At real
payload sizes, size the Arrow batches to the media, not the default:
``spark.sql.execution.arrow.maxRecordsPerBatch`` (10k rows default)
means 10k decoded images per batch in worker memory — set it so
batch_rows x payload_bytes fits the Python worker (e.g. 64-256 for
multi-MB images/video chunks).  Two codecs plug into the same batch
contract: ``codec="fake"`` is the deterministic byte-level stand-in
(oracle-replicable, used by the driver keys), ``codec="real"`` decodes
actual PNG (stdlib zlib inflate + scanline unfilter) and binary
PPM/PGM via :mod:`codecs` — no external image library required; PIL /
ffmpeg slot in by replacing ``codecs.decode_image``.  The Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is shared
and golden-image tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media-table schema: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_hash", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def media_metadata(df: DataFrame) -> DataFrame:
    """Payload-free metadata projection — Catalyst prunes the binary
    column out of the parquet scan entirely (ReadSchema excludes it)."""
    return df.select(
        "media_id",
        "kind",
        "mime",
        F.length("payload").alias("payload_bytes"),
        "width",
        "height",
    )


def _feature_triplet(buf, n_features: int):
    """The per-buffer math both exchange paths share (pandas
    :func:`fake_decode_batch` and Arrow :func:`decode_images_arrow`),
    factored out so they cannot drift: (n_bytes, content_hash,
    features).  ``buf`` is anything ``np.frombuffer`` accepts —
    bytes or a zero-copy memoryview."""
    import numpy as np

    arr = np.frombuffer(buf, dtype=np.uint8)
    n = len(arr)
    h = int(arr.sum()) * 2654435761 % (2**63)
    chunks = np.array_split(arr.astype(np.float32), n_features) if n else []
    feats = [float(c.mean()) if len(c) else 0.0 for c in chunks] + [
        0.0
    ] * max(0, n_features - len(chunks))
    return n, h, feats


def fake_decode_batch(payload: pd.Series, n_features: int = 8) -> pd.DataFrame:
    """Deterministic stand-in for a codec: 'features' derived from byte
    content (length + positional byte sums).  Replace with PIL/ffmpeg
    in a real deployment; signature and batch shape are the contract."""
    feats, hashes, sizes = [], [], []
    for buf in payload:
        if buf is None:
            feats.append(None)
            hashes.append(None)
            sizes.append(None)
            continue
        n, h, fs = _feature_triplet(bytes(buf), n_features)
        sizes.append(n)
        hashes.append(h)
        feats.append(fs)
    return pd.DataFrame(
        {"n_bytes": sizes, "content_hash": hashes, "features": feats}
    )


def real_decode_batch(payload: pd.Series, n_features: int = 8) -> pd.DataFrame:
    """REAL codec batch: PNG (zlib inflate + scanline unfilter) or
    binary PPM/PGM via :mod:`codecs` — stdlib-only, no PIL needed.

    Output contract matches :func:`fake_decode_batch`, computed over
    the DECODED pixel buffer instead of the raw payload: ``n_bytes`` is
    the decoded byte count (h*w*c), ``content_hash``/``features`` the
    same byte-sum hash and positional chunk means over the pixels.
    NULL payloads pass through as NULL; undecodable bytes raise
    (strict, like the reference's per-cell casts — route through a
    quarantine split upstream if partial failure is acceptable)."""
    from spectrify_spark.multimodal.codecs import decode_image

    decoded = pd.Series(
        [
            None if buf is None else decode_image(bytes(buf))[3].tobytes()
            for buf in payload
        ]
    )
    return fake_decode_batch(decoded, n_features)


def decode_images(df: DataFrame, codec: str = "fake", batch_features: int = 8) -> DataFrame:
    """Decode stage: binary payload -> features, via mapInPandas.

    ``codec="real"`` decodes actual image bytes (PNG / binary PPM —
    stdlib zlib, see :mod:`codecs`); ``codec="fake"`` is the
    deterministic byte-level stand-in the oracle-backed driver key
    uses.  Swap in PIL/torchvision by replacing
    :func:`codecs.decode_image` — batch shape and schema are the
    contract either way.
    """
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec {codec!r} (want 'fake' or 'real')")
    batch_fn = real_decode_batch if codec == "real" else fake_decode_batch

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = batch_fn(pdf["payload"], batch_features)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return df.select("media_id", "payload").mapInPandas(decode, _DECODED_SCHEMA)


def decode_images_arrow(
    df: DataFrame, codec: str = "fake", batch_features: int = 8
) -> DataFrame:
    """Arrow-native twin of :func:`decode_images` via ``mapInArrow``:
    payload bytes are consumed as ZERO-COPY memoryviews straight off
    the Arrow RecordBatch's value buffer (offset slicing — no pandas
    object-dtype boxing of megabyte payloads on either side of the
    exchange) and results are built as Arrow arrays.

    Output is bit-identical to the pandas path (parity-pinned by
    ``tests/test_multimodal.py``; both share :func:`_feature_triplet`
    / :func:`codecs.decode_image`).  Prefer this variant when payloads
    are large relative to rows — the pandas path materializes every
    payload as a Python ``bytes`` twice (Arrow->pandas, then
    ``bytes(buf)``), which at media sizes is pure copy overhead."""
    import pyarrow as pa

    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec {codec!r} (want 'fake' or 'real')")
    real = codec == "real"

    def _views(arr: "pa.Array"):
        """Per-row zero-copy memoryview (or None) over a Binary or
        LargeBinary array's value buffer."""
        import numpy as np

        dt = np.int64 if pa.types.is_large_binary(arr.type) else np.int32
        offs = np.frombuffer(arr.buffers()[1], dtype=dt)[
            arr.offset : arr.offset + len(arr) + 1
        ]
        data = memoryview(arr.buffers()[2])
        nulls = arr.is_null().to_numpy(zero_copy_only=False)
        for i in range(len(arr)):
            yield None if nulls[i] else data[offs[i] : offs[i + 1]]

    def decode(batches):
        from spectrify_spark.multimodal.codecs import decode_image

        for rb in batches:
            sizes, hashes, feats = [], [], []
            for view in _views(rb.column(1).combine_chunks() if isinstance(
                rb.column(1), pa.ChunkedArray) else rb.column(1)):
                if view is None:
                    sizes.append(None)
                    hashes.append(None)
                    feats.append(None)
                    continue
                buf = decode_image(bytes(view))[3].tobytes() if real else view
                n, h, fs = _feature_triplet(buf, batch_features)
                sizes.append(n)
                hashes.append(h)
                feats.append(fs)
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0),
                    pa.array(sizes, pa.int32()),
                    pa.array(hashes, pa.int64()),
                    pa.array(feats, pa.list_(pa.float32())),
                ],
                names=["media_id", "n_bytes", "content_hash", "features"],
            )

    return df.select("media_id", "payload").mapInArrow(decode, _DECODED_SCHEMA)


def extract_features(df: DataFrame, n_features: int = 8) -> DataFrame:
    """Feature-extraction alias of the decode stage (same plumbing)."""
    return decode_images(df, codec="fake", batch_features=n_features)


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("thumb", T.BinaryType(), True),
    ]
)


def resize_images(
    df: DataFrame, out_width: int = 8, out_height: int = 8, codec: str = "fake"
) -> DataFrame:
    """Resize/thumbnail stage: payload -> fixed (out_width x out_height)
    thumbnail bytes via Arrow-batched mapInPandas — the same plumbing
    contract as decode_images.  ``codec="fake"`` stride-samples the raw
    source bytes into exactly out_width*out_height bytes
    (deterministic, NULL payloads pass through as NULL);
    ``codec="real"`` decodes PNG / binary PPM (stdlib, see
    :mod:`codecs`) and nearest-neighbor-resamples the actual 2-D image,
    so ``thumb`` is out_height*out_width*channels interleaved bytes."""
    if out_width <= 0 or out_height <= 0:
        raise ValueError(f"need positive dims, got {out_width}x{out_height}")
    if codec not in ("fake", "real"):
        raise ValueError(f"unknown codec {codec!r} (want 'fake' or 'real')")
    n_out = out_width * out_height
    real = codec == "real"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if real:
            from spectrify_spark.multimodal.codecs import (
                decode_image,
                resize_nearest,
            )

        for pdf in batches:
            thumbs = []
            for buf in pdf["payload"]:
                if buf is None:
                    thumbs.append(None)
                    continue
                if real:
                    _, _, _, pixels = decode_image(bytes(buf))
                    thumbs.append(
                        resize_nearest(pixels, out_width, out_height).tobytes()
                    )
                    continue
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                if len(arr) == 0:
                    thumbs.append(b"\x00" * n_out)
                    continue
                idx = (np.arange(n_out) * len(arr)) // n_out
                thumbs.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "out_width": out_width,
                    "out_height": out_height,
                    "thumb": thumbs,
                }
            )

    return df.select("media_id", "payload").mapInPandas(resize, _RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, id_col: str = "media_id"
) -> DataFrame:
    """Frame sampling for video rows: emit one (media_id, frame_ts_ms)
    row per sampled instant — pure expression (sequence + explode), the
    decode of each frame would chain a mapInPandas stage after it."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            id_col,
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


_AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """Audio feature extraction over WAV payloads: REAL stdlib RIFF/PCM
    decode (:func:`codecs.decode_wav`) in the Arrow-batched mapInPandas
    worker, then per-clip features computed on the decoded samples —
    sample rate, frame count, RMS amplitude (exact integer
    sum-of-squares, one float divide+sqrt), strict zero-crossing count
    (``s[i] * s[i+1] < 0``).  Multi-channel clips are averaged to mono
    BEFORE features (integer floor-div mixdown, deterministic).  NULL
    payloads pass through as NULL; undecodable bytes raise (strict —
    quarantine upstream for partial tolerance).  The librosa/ffmpeg
    slot is :func:`codecs.decode_wav` — swap it, keep the contract."""
    from spectrify_spark.multimodal.codecs import decode_wav

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rates, counts, rmss, zcs = [], [], [], []
            for buf in pdf["payload"]:
                if buf is None:
                    rates.append(None)
                    counts.append(None)
                    rmss.append(None)
                    zcs.append(None)
                    continue
                rate, _ch, _bits, samples = decode_wav(bytes(buf))
                mono = samples.sum(axis=1) // samples.shape[1]
                n = len(mono)
                rates.append(rate)
                counts.append(n)
                s2 = int((mono.astype(np.int64) ** 2).sum())
                rmss.append(float(np.sqrt(s2 / n)) if n else 0.0)
                zcs.append(int(((mono[:-1] * mono[1:]) < 0).sum()) if n > 1 else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "sample_rate": rates,
                    "n_samples": counts,
                    "rms": rmss,
                    "zero_crossings": zcs,
                }
            )

    return df.select("media_id", "payload").mapInPandas(feats, _AUDIO_SCHEMA)


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def video_frame_features(df: DataFrame, every_n: int = 1) -> DataFrame:
    """Per-sampled-frame features over Y4M video payloads: REAL stdlib
    YUV4MPEG2 decode (:func:`codecs.decode_y4m`) in the mapInPandas
    worker, emitting one row per kept frame (``frame_idx % every_n ==
    0``) with its mean luma (first plane; exact integer sum, one float
    divide).  This is :func:`sample_frames`'s metadata-only sampling
    upgraded to a decode-and-measure stage — the scene-filter /
    thumbnail-selection primitive of a video curation pipeline.  NULL
    payloads yield no rows; undecodable bytes raise (strict)."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    from spectrify_spark.multimodal.codecs import decode_y4m

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, lumas, ws, hs = [], [], [], [], []
            for mid, buf in zip(pdf["media_id"], pdf["payload"]):
                if buf is None:
                    continue
                w, h, _cs, frames = decode_y4m(bytes(buf))
                for i in range(0, len(frames), every_n):
                    luma = frames[i][:, :, 0].astype(np.int64)
                    ids.append(mid)
                    idxs.append(i)
                    lumas.append(float(int(luma.sum()) / luma.size))
                    ws.append(w)
                    hs.append(h)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "mean_luma": lumas,
                    "width": ws,
                    "height": hs,
                }
            )

    return df.select("media_id", "payload").mapInPandas(feats, _FRAMES_SCHEMA)
