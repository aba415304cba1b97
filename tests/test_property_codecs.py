"""Property tests for the stdlib image codecs (no Spark session —
pure worker-side code, so hypothesis can hammer it cheaply)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from spectrify_spark.multimodal.codecs import (
    decode_image,
    decode_png,
    encode_png,
    encode_ppm,
    resize_nearest,
)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    c=st.integers(1, 4),
    f=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(w, h, c, f, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w, c), np.uint8)
    ww, hh, cc, out = decode_png(encode_png(img, filter_type=f))
    assert (ww, hh, cc) == (w, h, c)
    assert np.array_equal(out, img)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    gray=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_ppm_roundtrip_property(w, h, gray, seed):
    c = 1 if gray else 3
    img = np.random.RandomState(seed).randint(0, 256, (h, w, c), np.uint8)
    assert np.array_equal(decode_image(encode_ppm(img))[3], img)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 10),
    h=st.integers(1, 10),
    ow=st.integers(1, 10),
    oh=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
)
def test_resize_nearest_shape_and_membership(w, h, ow, oh, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)
    out = resize_nearest(img, ow, oh)
    assert out.shape == (oh, ow, 3)
    # every output pixel is an input pixel (nearest-neighbor, no blending)
    flat_in = {tuple(p) for p in img.reshape(-1, 3)}
    assert all(tuple(p) in flat_in for p in out.reshape(-1, 3))


@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    n=st.integers(1, 16),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None)
def test_png_palette_roundtrip_property(w, h, n, seed):
    """Color-type-3 PNGs decode to the palette-expanded RGB pixels."""
    from spectrify_spark.multimodal.codecs import decode_png, encode_png_palette

    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, size=(h, w), dtype=np.uint8)
    dw, dh, dc, px = decode_png(encode_png_palette(idx, palette))
    assert (dw, dh, dc) == (w, h, 3)
    assert np.array_equal(px, palette[idx])


def test_png_unsupported_features_raise_typed():
    """Every rejected PNG class raises ValueError naming the feature:
    16-bit depth, interlace, unknown color type, palette+tRNS,
    palette missing PLTE, out-of-range palette index."""
    import pytest
    import struct
    import zlib

    from spectrify_spark.multimodal.codecs import (
        _PNG_SIG,
        decode_png,
        encode_png_palette,
    )

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def png(depth=8, color=0, interlace=0, extra=b"", plte=None, idat=None):
        ihdr = struct.pack(">IIBBBBB", 1, 1, depth, color, 0, 0, interlace)
        body = chunk(b"IHDR", ihdr)
        if plte is not None:
            body += chunk(b"PLTE", plte)
        body += extra
        body += chunk(b"IDAT", zlib.compress(idat if idat is not None else b"\x00\x00"))
        return _PNG_SIG + body + chunk(b"IEND", b"")

    with pytest.raises(ValueError, match="bit depth"):
        decode_png(png(depth=16))
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(png(interlace=1))
    with pytest.raises(ValueError, match="color type"):
        decode_png(png(color=5))
    with pytest.raises(ValueError, match="tRNS"):
        decode_png(
            png(color=3, plte=b"\x00\x00\x00", extra=chunk(b"tRNS", b"\x00"))
        )
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(png(color=3))
    with pytest.raises(ValueError, match="index out of range"):
        # 1x1 image whose single index (3) exceeds a 2-entry palette
        buf = encode_png_palette(
            np.array([[3]], dtype=np.uint8),
            np.zeros((2, 3), dtype=np.uint8),
        )
        decode_png(buf)
