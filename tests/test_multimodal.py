"""Multimodal binary-column plumbing tests (decode step is a
deterministic fake — see spectrify_spark/multimodal/binary_cols.py)."""

import pytest

from spectrify_spark.multimodal import (
    MEDIA_SCHEMA,
    decode_images,
    media_metadata,
    sample_frames,
)

ROWS = [
    (1, "image", "image/png", bytearray(b"\x89PNG fake bytes here"), 64, 64, None),
    (2, "image", "image/jpeg", bytearray(b"\xff\xd8 other fake bytes"), 32, 32, None),
    (3, "video", "video/mp4", bytearray(b"\x00 mp4"), None, None, 3500),
    (4, "image", "image/png", None, None, None, None),
]


def _media(spark):
    return spark.createDataFrame(ROWS, MEDIA_SCHEMA)


def test_metadata_projection_drops_payload(spark):
    out = media_metadata(_media(spark))
    assert "payload" not in out.columns
    sizes = {r.media_id: r.payload_bytes for r in out.collect()}
    assert sizes[1] == 20 and sizes[4] is None


def test_fake_decode_batch_shapes(spark):
    out = decode_images(_media(spark))
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 4
    assert len(rows[1].features) == 8
    assert rows[1].n_bytes == 20
    assert rows[4].features is None  # NULL payload passes through
    # deterministic: same payload -> same hash
    again = {r.media_id: r for r in decode_images(_media(spark)).collect()}
    assert again[1].content_hash == rows[1].content_hash


def test_unknown_codec_rejected(spark):
    with pytest.raises(ValueError, match="unknown codec"):
        decode_images(_media(spark), codec="pil")


def test_binary_payload_parquet_roundtrip(spark, tmp_path):
    """Media rows survive parquet storage byte-exactly, and the metadata
    projection prunes the payload column out of the scan."""
    path = str(tmp_path / "media")
    _media(spark).write.parquet(path)
    back = spark.read.parquet(path)
    payloads = {r.media_id: bytes(r.payload) if r.payload else None for r in back.collect()}
    assert payloads[1] == b"\x89PNG fake bytes here"
    assert payloads[4] is None
    # a payload-free projection prunes the binary column from the scan
    plan = (
        back.select("media_id", "kind", "mime")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    readschema = next(
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    ).split("ReadSchema: ", 1)[1]
    assert "payload" not in readschema
    assert decode_images(back).count() == 4


def test_sample_frames(spark):
    out = sample_frames(_media(spark), every_ms=1000)
    frames = sorted(r.frame_ts_ms for r in out.collect())
    assert frames == [0, 1000, 2000, 3000]


def test_resize_images_fixed_output_shape(spark):
    from spectrify_spark.multimodal import resize_images

    out = {r["media_id"]: r for r in resize_images(_media(spark), 4, 3).collect()}
    assert set(out) == {1, 2, 3, 4}
    for mid in (1, 2, 3):
        r = out[mid]
        assert (r["out_width"], r["out_height"]) == (4, 3)
        assert len(bytes(r["thumb"])) == 12  # exactly out_w*out_h bytes
    assert out[4]["thumb"] is None  # NULL payload passes through


def test_resize_images_deterministic(spark):
    from spectrify_spark.multimodal import resize_images

    a = sorted(
        (r["media_id"], bytes(r["thumb"]) if r["thumb"] else None)
        for r in resize_images(_media(spark), 8, 8).collect()
    )
    b = sorted(
        (r["media_id"], bytes(r["thumb"]) if r["thumb"] else None)
        for r in resize_images(_media(spark), 8, 8).collect()
    )
    assert a == b


def test_resize_images_validates(spark):
    from spectrify_spark.multimodal import resize_images

    with pytest.raises(ValueError, match="positive dims"):
        resize_images(_media(spark), 0, 4)
    with pytest.raises(ValueError, match="unknown codec"):
        resize_images(_media(spark), 4, 4, codec="pil")


# ---------------------------------------------------------------- real codec


def test_png_roundtrip_every_filter_type():
    """encode_png(filter f) -> decode_png must be pixel-identical for
    all five scanline filters — each unfilter branch checked against
    its exact inverse."""
    import numpy as np

    from spectrify_spark.multimodal.codecs import decode_png, encode_png

    rng = np.random.RandomState(7)
    for channels in (1, 2, 3, 4):
        img = rng.randint(0, 256, size=(5, 7, channels), dtype=np.uint8)
        for f in range(5):
            w, h, c, out = decode_png(encode_png(img, filter_type=f))
            assert (w, h, c) == (7, 5, channels), (f, channels)
            assert np.array_equal(out, img), f"filter {f}, {channels}ch"


def test_ppm_roundtrip_and_sniff():
    import numpy as np

    from spectrify_spark.multimodal.codecs import (
        decode_image,
        decode_ppm,
        encode_ppm,
    )

    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, size=(4, 6, 1), dtype=np.uint8)
    for img in (rgb, gray):
        buf = encode_ppm(img)
        w, h, c, out = decode_ppm(buf)
        assert (w, h, c) == (6, 4, img.shape[2])
        assert np.array_equal(out, img)
        # decode_image sniffs the magic
        assert np.array_equal(decode_image(buf)[3], img)


def test_png_rejects_unsupported():
    import pytest

    from spectrify_spark.multimodal.codecs import decode_image, decode_png

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"GIF89a....")


def test_decode_images_real_codec_spark(spark):
    """codec='real' end-to-end through mapInPandas: PNG and PPM
    payloads in one media frame, features golden-checked against a
    local decode of the same pixels."""
    import numpy as np

    from spectrify_spark.multimodal import decode_images
    from spectrify_spark.multimodal.binary_cols import fake_decode_batch
    from spectrify_spark.multimodal.codecs import encode_png, encode_ppm

    rng = np.random.RandomState(11)
    img1 = rng.randint(0, 256, size=(8, 8, 3), dtype=np.uint8)
    img2 = rng.randint(0, 256, size=(6, 10, 1), dtype=np.uint8)
    rows = [
        (1, "image", "image/png", bytearray(encode_png(img1, filter_type=4)), 8, 8, None),
        (2, "image", "image/x-portable-graymap", bytearray(encode_ppm(img2)), 10, 6, None),
        (3, "image", "image/png", None, None, None, None),
    ]
    from spectrify_spark.multimodal import MEDIA_SCHEMA

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in decode_images(df, codec="real").collect()}
    import pandas as pd

    expected = fake_decode_batch(
        pd.Series([img1.tobytes(), img2.tobytes()]), 8
    )
    assert got[1].n_bytes == 8 * 8 * 3
    assert got[2].n_bytes == 6 * 10 * 1
    assert got[1].content_hash == expected["content_hash"][0]
    assert got[2].content_hash == expected["content_hash"][1]
    assert got[1].features == [pytest.approx(x) for x in expected["features"][0]]
    assert got[3].n_bytes is None and got[3].features is None


def test_resize_images_real_codec_spark(spark):
    """codec='real' resize: nearest-neighbor thumb bytes must equal a
    local resize of the decoded pixels."""
    import numpy as np

    from spectrify_spark.multimodal import MEDIA_SCHEMA, resize_images
    from spectrify_spark.multimodal.codecs import encode_png, resize_nearest

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, size=(16, 12, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, "image", "image/png", bytearray(encode_png(img, filter_type=2)), 12, 16, None)],
        MEDIA_SCHEMA,
    )
    r = resize_images(df, out_width=4, out_height=4, codec="real").collect()[0]
    assert (r.out_width, r.out_height) == (4, 4)
    assert bytes(r.thumb) == resize_nearest(img, 4, 4).tobytes()


def test_wav_roundtrip_and_rejects():
    import numpy as np

    from spectrify_spark.multimodal.codecs import decode_wav, encode_wav

    rng = np.random.RandomState(2)
    for bits in (8, 16):
        for ch in (1, 2):
            lo, hi = (-120, 120) if bits == 8 else (-30000, 30000)
            s = rng.randint(lo, hi, (441, ch)).astype(np.int32)
            r, c, b, out = decode_wav(encode_wav(s, 22050, bits))
            assert (r, c, b) == (22050, ch, bits)
            assert np.array_equal(out, s)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not audio at all...")


def test_audio_features_spark(spark):
    """audio_features end-to-end: a synthesized square wave has exact,
    hand-computable RMS and zero-crossing count."""
    import numpy as np

    from spectrify_spark.multimodal import MEDIA_SCHEMA, audio_features
    from spectrify_spark.multimodal.codecs import encode_wav

    # 100-sample square wave +/-1000, period 4 -> 50 strict crossings... compute
    sq = np.tile(np.array([1000, 1000, -1000, -1000], np.int32), 25)
    wav = encode_wav(sq[:, None], 8000, 16)
    df = spark.createDataFrame(
        [(1, "audio", "audio/wav", bytearray(wav), None, None, 12500),
         (2, "audio", "audio/wav", None, None, None, None)],
        MEDIA_SCHEMA,
    )
    rows = {r.media_id: r for r in audio_features(df).collect()}
    r1 = rows[1]
    assert (r1.sample_rate, r1.n_samples) == (8000, 100)
    assert r1.rms == pytest.approx(1000.0)
    expected_zc = int(((sq[:-1] * sq[1:]) < 0).sum())
    assert r1.zero_crossings == expected_zc
    assert rows[2].rms is None and rows[2].n_samples is None


def test_y4m_roundtrip_and_rejects():
    import numpy as np

    from spectrify_spark.multimodal.codecs import decode_y4m, encode_y4m

    rng = np.random.RandomState(4)
    for c in (1, 3):
        f = rng.randint(0, 256, (5, 4, 6, c), np.uint8)
        w, h, cs, out = decode_y4m(encode_y4m(f))
        assert (w, h) == (6, 4) and np.array_equal(out, f)
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"not video")
    with pytest.raises(ValueError, match="colorspace"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C420jpeg\nFRAME\n\x00\x00\x00\x00\x00\x00")


def test_video_frame_features_spark(spark):
    """Every-2nd-frame sampling with known per-frame luma."""
    import numpy as np

    from spectrify_spark.multimodal import MEDIA_SCHEMA, video_frame_features
    from spectrify_spark.multimodal.codecs import encode_y4m

    frames = np.stack(
        [np.full((2, 3, 1), v, np.uint8) for v in (10, 20, 30, 40, 50)]
    )
    df = spark.createDataFrame(
        [(7, "video", "video/y4m", bytearray(encode_y4m(frames)), 3, 2, 200),
         (8, "video", "video/y4m", None, None, None, None)],
        MEDIA_SCHEMA,
    )
    rows = sorted(
        video_frame_features(df, every_n=2).collect(), key=lambda r: r.frame_idx
    )
    assert [(r.media_id, r.frame_idx, r.mean_luma) for r in rows] == [
        (7, 0, 10.0), (7, 2, 30.0), (7, 4, 50.0)
    ]
    assert rows[0].width == 3 and rows[0].height == 2


def test_decode_images_arrow_parity_fake_and_real(spark):
    """The Arrow-native decode twin (mapInArrow, zero-copy payload
    views) must be BIT-IDENTICAL to the pandas path for both codecs —
    they share _feature_triplet / codecs.decode_image, and this pins
    the exchange-layer rewrite to the same results."""
    from pyspark.sql import functions as F

    from spectrify_spark.multimodal.binary_cols import decode_images_arrow

    def rows(df):
        return {
            r.media_id: (
                r.n_bytes,
                r.content_hash,
                None if r.features is None else tuple(r.features),
            )
            for r in df.collect()
        }

    media = _media(spark)
    assert rows(decode_images_arrow(media)) == rows(decode_images(media))

    # real codec over genuine PGM payloads (the q_multimodal_real shape)
    from spectrify_spark.multimodal import MEDIA_SCHEMA

    pgm = bytes("P5\n8 8\n255\n", "ascii") + bytes(range(64))
    real_rows = [
        (1, "image", "image/x-portable-graymap", bytearray(pgm), 8, 8, None),
        (2, "image", "image/x-portable-graymap", None, None, None, None),
    ]
    m = spark.createDataFrame(real_rows, MEDIA_SCHEMA)
    assert rows(decode_images_arrow(m, codec="real")) == rows(
        decode_images(m, codec="real")
    )

    with pytest.raises(ValueError, match="unknown codec"):
        decode_images_arrow(media, codec="pil")
