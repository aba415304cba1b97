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


def test_real_codec_is_explicit_stub(spark):
    with pytest.raises(NotImplementedError):
        decode_images(_media(spark), codec="real")


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


def test_resize_images_validates_and_stubs(spark):
    from spectrify_spark.multimodal import resize_images

    with pytest.raises(ValueError, match="positive dims"):
        resize_images(_media(spark), 0, 4)
    with pytest.raises(NotImplementedError):
        resize_images(_media(spark), 4, 4, codec="real")
