"""Real (stdlib-only) image codecs for the multimodal decode path.

The container has no PIL/ffmpeg, but PNG is just zlib (stdlib) plus
per-scanline unfiltering, and PPM is a header plus raw bytes — so the
``codec="real"`` slot in :mod:`binary_cols` can decode actual image
formats instead of raising NotImplementedError (VERDICT r8 item 4).

Supported:

- **PNG**: non-interlaced, 8-bit depth, color types 0 (gray),
  2 (RGB), 3 (palette, expanded to RGB; tRNS alpha rejected),
  4 (gray+alpha), 6 (RGBA); all five scanline filters
  (None/Sub/Up/Average/Paeth).  The encoder can apply any single
  filter type, which gives the round-trip test coverage of every
  unfilter branch against its exact inverse.
- **PPM/PGM** binary (``P6``/``P5``), maxval 255.

These run INSIDE the Arrow-batched ``mapInPandas`` workers — per-image
Python cost is amortized over record batches, and the sequential
byte-dependency in Sub/Average/Paeth unfiltering is confined to one
scanline at a time (Up is fully vectorized).  At 100 TB the real
lever is still the batch sizing note in :mod:`binary_cols`; the codec
itself is pluggable (swap in PIL where available — identical
``(w, h, c, pixels)`` contract).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """PNG bytes -> ``(width, height, channels, pixels[h, w, c] uint8)``.

    Supported subset: non-interlaced, 8-bit samples, color types
    0 (gray), 2 (RGB), 3 (palette -> expanded to RGB), 4 (gray+alpha),
    6 (RGBA).  Raises ValueError naming the unsupported feature on
    anything else (interlaced, 16-bit, palette-with-tRNS) — fail loud,
    never garbage pixels.

    Practical size ceiling: None/Sub/Up rows are fully vectorized (Sub
    is a per-channel-lane ``cumsum % 256``), but Average/Paeth rows
    unavoidably recurse on the just-decoded left pixel, so they run a
    per-PIXEL Python loop (vectorized across channels).  Fine for the
    thumbnail-scale fixtures this slot is exercised with; for
    megapixel photo corpora swap in PIL where available — the
    ``(w, h, c, pixels)`` contract is identical and
    :mod:`binary_cols` takes the codec as a parameter.
    """
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos, width = 8, None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth} (need 8)")
            if color not in _PNG_CHANNELS and color != 3:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            # palette images carry ONE index sample per pixel in the
            # filtered stream; expansion to RGB happens after unfilter
            channels = 1 if color == 3 else _PNG_CHANNELS[color]
        elif ctype == b"PLTE":
            if len(data) % 3 or not data:
                raise ValueError("bad PLTE length")
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            if color == 3:
                raise ValueError("palette PNG with tRNS alpha not supported")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if color == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE chunk")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (1 + stride):
        raise ValueError("PNG IDAT size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        f = raw[y * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).copy()
        if f == 0:
            pass
        elif f == 1:  # Sub: out[i] = in[i] + out[i-bpp] is a prefix sum
            # per channel lane -> one vectorized cumsum mod 256
            line = (
                line.reshape(width, bpp).cumsum(axis=0, dtype=np.int64) & 0xFF
            ).astype(np.uint8).reshape(stride)
        elif f == 2:  # Up: fully vectorized
            line = (line.astype(np.int16) + prev).astype(np.uint8)
        elif f == 3:  # Average: left-recurrence -> per-pixel loop,
            # vectorized across the bpp channel lane
            lane = line.reshape(width, bpp).astype(np.int16)
            plane = prev.reshape(width, bpp).astype(np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            for x in range(width):
                lane[x] = (lane[x] + (left + plane[x]) // 2) & 0xFF
                left = lane[x]
            line = lane.astype(np.uint8).reshape(stride)
        elif f == 4:  # Paeth: same left-recurrence shape as Average
            lane = line.reshape(width, bpp).astype(np.int16)
            plane = prev.reshape(width, bpp).astype(np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            ul = np.zeros(bpp, dtype=np.int16)
            for x in range(width):
                up = plane[x]
                p = left + up - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                )
                lane[x] = (lane[x] + pred) & 0xFF
                left, ul = lane[x], up
            line = lane.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = line
        prev = out[y]
    if color == 3:
        idx = out.reshape(height, width)
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("PLTE index out of range")
        return width, height, 3, palette[idx]
    return width, height, channels, out.reshape(height, width, channels)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """``pixels[h, w, c] uint8`` -> PNG bytes, applying one scanline
    ``filter_type`` (0-4) to every row — the inverse pairs with
    :func:`decode_png`'s unfilter branches for exact round-trip tests."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    stride, bpp = w * c, c
    flat = pixels.reshape(h, stride).astype(np.uint8)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = flat[y]
        enc = line.astype(np.int16)
        if filter_type == 1:
            left = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp].astype(np.int16)])
            enc = enc - left
        elif filter_type == 2:
            enc = enc - prev
        elif filter_type == 3:
            left = np.concatenate([np.zeros(bpp, np.int16), line[:-bpp].astype(np.int16)])
            enc = enc - (left + prev.astype(np.int16)) // 2
        elif filter_type == 4:
            enc = enc.copy()
            for i in range(stride):
                left = int(line[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                enc[i] = int(line[i]) - _paeth(left, int(prev[i]), ul)
        raw.append(filter_type)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = line
    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_png_palette(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """``indices[h, w] uint8`` + ``palette[n, 3] uint8`` -> color-type-3
    PNG bytes (filter 0 rows) — the round-trip fixture generator for
    :func:`decode_png`'s palette-expansion path."""
    h, w = indices.shape
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(indices[y].astype(np.uint8).tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"PLTE", palette.astype(np.uint8).tobytes())
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def decode_ppm(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Binary PPM (``P6``, RGB) / PGM (``P5``, gray) -> the same
    ``(width, height, channels, pixels)`` contract as decode_png."""
    magic = buf[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError(f"not a binary PPM/PGM: magic {magic!r}")
    channels = 3 if magic == b"P6" else 1
    # header tokens: magic, width, height, maxval — '#' comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (need 255)")
    n = width * height * channels
    pixels = np.frombuffer(buf, dtype=np.uint8, count=n, offset=pos)
    return width, height, channels, pixels.reshape(height, width, channels).copy()


def encode_ppm(pixels: np.ndarray) -> bytes:
    """``pixels[h, w, {1|3}] uint8`` -> binary PGM/PPM bytes."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    magic = {1: b"P5", 3: b"P6"}[c]
    return magic + f"\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def decode_image(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """Sniff the magic and decode: PNG or binary PPM/PGM."""
    if buf[:8] == _PNG_SIG:
        return decode_png(buf)
    if buf[:2] in (b"P6", b"P5"):
        return decode_ppm(buf)
    raise ValueError("unrecognized image format (supported: PNG, P6/P5 PPM)")


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample ``pixels[h, w, c]`` to
    ``[out_h, out_w, c]`` — pure integer index math, deterministic on
    every platform (the property the hash-verified tests need)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pixels[ys][:, xs]


def decode_wav(buf: bytes) -> tuple[int, int, int, np.ndarray]:
    """RIFF WAV (PCM, 8/16-bit) -> ``(sample_rate, n_channels,
    bits_per_sample, samples[n, channels] int32)``.

    Stdlib-only RIFF chunk walk: validates the header, reads ``fmt ``
    (audio format must be 1 = linear PCM), concatenates ``data``
    chunks.  8-bit PCM is unsigned (offset 128 per the spec), 16-bit
    is signed little-endian; both normalize into int32 samples so
    downstream features are format-independent.  Raises ValueError on
    anything outside the subset (compressed, float, 24-bit) — fail
    loud, never garbage audio.
    """
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = bytearray()
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV format code {audio_fmt} (need PCM=1)")
            if bits not in (8, 16):
                raise ValueError(f"unsupported WAV bit depth {bits} (need 8/16)")
            fmt = (rate, channels, bits)
        elif cid == b"data":
            data.extend(body)
    if fmt is None:
        raise ValueError("WAV missing fmt chunk")
    rate, channels, bits = fmt
    if bits == 8:
        samples = np.frombuffer(bytes(data), dtype=np.uint8).astype(np.int32) - 128
    else:
        n = len(data) // 2 * 2
        samples = np.frombuffer(bytes(data[:n]), dtype="<i2").astype(np.int32)
    n_frames = len(samples) // channels
    return rate, channels, bits, samples[: n_frames * channels].reshape(
        n_frames, channels
    )


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, bits: int = 16
) -> bytes:
    """``samples[n, channels]`` int -> RIFF WAV PCM bytes (inverse of
    :func:`decode_wav`, for round-trip tests and fixtures)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    if bits == 8:
        payload = (samples.astype(np.int32) + 128).clip(0, 255).astype(np.uint8).tobytes()
    elif bits == 16:
        payload = samples.astype("<i2").tobytes()
    else:
        raise ValueError(f"bits must be 8 or 16, got {bits}")
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_y4m(buf: bytes) -> tuple[int, int, str, np.ndarray]:
    """YUV4MPEG2 (Y4M) -> ``(width, height, colorspace,
    frames[n, h, w, c] uint8)`` — the real VIDEO slot of the codec
    family.  Y4M is the standard uncompressed interchange container
    (ffmpeg/mplayer): one ASCII stream header, then per-frame
    ``FRAME\\n`` markers with raw planar YUV.

    Supported colorspaces: ``Cmono`` (1 plane) and ``C444``
    (3 full-res planes, returned interleaved as the last axis).
    Subsampled 420/422 raise ValueError — fail loud, never garbage
    frames (the same strict-subset contract as decode_png/decode_wav).
    """
    nl = buf.find(b"\n")
    if nl < 0 or not buf.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = None
    cspace = "420"  # Y4M default when no C tag
    for tok in buf[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            width = int(t[1:])
        elif t.startswith("H"):
            height = int(t[1:])
        elif t.startswith("C"):
            cspace = t[1:]
    if width is None or height is None:
        raise ValueError("Y4M missing W/H header tags")
    if cspace == "mono":
        channels = 1
    elif cspace == "444":
        channels = 3
    else:
        raise ValueError(f"unsupported Y4M colorspace C{cspace} (need mono/444)")
    frame_bytes = width * height * channels
    pos, frames = nl + 1, []
    while pos < len(buf):
        fnl = buf.find(b"\n", pos)
        if fnl < 0 or buf[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M corrupt FRAME marker")
        pos = fnl + 1
        raw = np.frombuffer(buf, dtype=np.uint8, count=frame_bytes, offset=pos)
        if len(raw) < frame_bytes:
            raise ValueError("Y4M truncated frame")
        # planar -> interleaved (h, w, c)
        frames.append(
            raw.reshape(channels, height, width).transpose(1, 2, 0).copy()
        )
        pos += frame_bytes
    return width, height, cspace, np.stack(frames) if frames else np.zeros(
        (0, height, width, channels), np.uint8
    )


def encode_y4m(frames: np.ndarray, cspace: str | None = None) -> bytes:
    """``frames[n, h, w, c] uint8`` -> Y4M bytes (c=1 -> Cmono,
    c=3 -> C444); inverse of :func:`decode_y4m` for tests/fixtures."""
    if frames.ndim == 3:
        frames = frames[:, :, :, None]
    n, h, w, c = frames.shape
    cspace = cspace or ("mono" if c == 1 else "444")
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{cspace}\n".encode())
    for i in range(n):
        out += b"FRAME\n"
        out += frames[i].transpose(2, 0, 1).astype(np.uint8).tobytes()
    return bytes(out)
