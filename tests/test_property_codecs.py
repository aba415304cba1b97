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
