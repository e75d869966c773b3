"""Minimal pure-stdlib PNG codec (zlib + struct — no dependencies).

Why this exists: the multimodal tier's real-decode path
(functions/multimodal.py) should not be dead code in environments
without pillow.  PNG is a simple, fully-specified lossless format
(RFC 2083): 8-bit grayscale/RGB/RGBA decode with all five scanline
filters is ~100 lines of stdlib Python, which makes the decode →
featurize → resize pipeline genuinely executable (and testable in CI)
everywhere.  PIL remains the preferred tier when importable — it is
faster and covers JPEG/WebP/...; this codec covers the single most
common lossless training-data format as the guaranteed floor.

Scope: bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), no interlace.  Anything else raises ValueError — callers
(multimodal.decode tiers) treat that as "not decodable here" and fall
back, never silently mis-decode.
"""

from __future__ import annotations

import struct
import zlib

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

# decode-size ceiling (pixels).  This guards CPU as well as memory:
# the Average/Paeth scanline filters carry a left-neighbor dependency
# and unfilter byte-at-a-time in Python (Sub/Up are numpy-vectorized
# below), so the cap must keep the worst-case interpreted loop in
# seconds, not minutes — 4 MP RGBA is ~16M loop iterations ≈ a few
# seconds, vs ~256M (minutes of one stalled executor task) at the old
# 64 MP cap.  4 MP also far exceeds any legitimate corpus
# thumbnail/preview; callers with genuinely larger trusted images pass
# ``max_pixels`` explicitly.
_MAX_PIXELS = 4_000_000

try:  # numpy vectorizes the two filters without sequential dependency
    import numpy as _np
except ImportError:  # pragma: no cover - numpy is baked into the env
    _np = None


def encode_png(pixels: bytes, width: int, height: int,
               channels: int = 1) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``width*height*channels``
    bytes; channels 1=gray, 2=gray+alpha, 3=RGB, 4=RGBA) as a valid
    PNG (filter 0 on every scanline).  Deterministic: fixed zlib
    level, no ancillary chunks — same pixels, same bytes."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{width}x{height}x{channels}")
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride:(y + 1) * stride] for y in range(height))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (PNG_MAGIC
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 6))
            + chunk(b"IEND", b""))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes,
               max_pixels: int = _MAX_PIXELS) -> tuple[int, int, int, bytes]:
    """Decode a PNG to (width, height, channels, raw 8-bit pixels,
    row-major).  Supports bit depth 8, color types 0/2/4/6, no
    interlace, all five scanline filters; raises ValueError on
    anything else (or corrupt data) so callers can fall back.

    ``max_pixels`` bounds both the raw allocation AND the per-byte
    unfilter CPU for the left-dependent filters (Average/Paeth) — the
    default keeps a crafted worst-case payload to seconds per task;
    raise it only for trusted inputs."""
    if not data or not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_MAGIC)
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        pos += 12 + length  # len + tag + body + crc
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[color_type]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    # decompression-bomb guard: validate declared dimensions BEFORE
    # allocating, and hard-cap inflation at the exact raw size the
    # header implies — a few-KB adversarial IDAT (zlib ~1000:1) or a
    # forged IHDR must not let one corpus row allocate gigabytes on an
    # executor
    stride = width * channels
    expected = (stride + 1) * height
    if width * height > max_pixels:
        raise ValueError(f"image too large: {width}x{height}")
    d = zlib.decompressobj()
    # expected+1 so an over-long stream shows up as a length mismatch
    # instead of being silently truncated to the expected size
    raw = d.decompress(bytes(idat), expected + 1)
    if len(raw) != expected:
        raise ValueError("decompressed size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        row = bytearray(raw[row_start + 1:row_start + 1 + stride])
        if ftype == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp]
            if _np is not None:
                # per-lane prefix sum mod 256 — uint8 cumsum wraps
                # exactly like the byte arithmetic it replaces
                a = _np.frombuffer(bytes(row), dtype=_np.uint8)
                a = a.reshape(width, channels)
                row = bytearray(
                    _np.cumsum(a, axis=0, dtype=_np.uint8).tobytes())
            else:
                for i in range(channels, stride):
                    row[i] = (row[i] + row[i - channels]) & 0xFF
        elif ftype == 2:  # Up: recon[x] = filt[x] + recon_prev[x]
            if _np is not None:
                a = _np.frombuffer(bytes(row), dtype=_np.uint8)
                b = _np.frombuffer(bytes(prev), dtype=_np.uint8)
                row = bytearray((a + b).tobytes())
            else:
                for i in range(stride):
                    row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter {ftype}")
        out[y * stride:(y + 1) * stride] = row
        prev = row
    return width, height, channels, bytes(out)


def decode_gray(data: bytes,
                max_pixels: int = _MAX_PIXELS) -> tuple[int, int, list[int]]:
    """Decode a PNG and collapse to 8-bit grayscale (ITU-R 601-2
    luminance for color, PIL's convert('L') formula with truncation),
    returning (width, height, row-major luminance values).
    ``max_pixels`` passes through to `decode_png` so trusted callers
    can raise the CPU/memory cap."""
    width, height, channels, px = decode_png(data, max_pixels=max_pixels)
    if channels == 1:
        return width, height, list(px)
    if channels == 2:  # gray + alpha
        return width, height, list(px[0::2])
    step = channels  # 3 or 4; alpha ignored, as convert('L') does
    lum = [(px[i] * 299 + px[i + 1] * 587 + px[i + 2] * 114) // 1000
           for i in range(0, len(px), step)]
    return width, height, lum


def resize_nearest(data: bytes, target_w: int, target_h: int,
                   max_pixels: int = _MAX_PIXELS) -> bytes:
    """Nearest-neighbor PNG resize entirely in stdlib: decode, index-map
    (src = floor(dst * src_dim / dst_dim) — PIL NEAREST's convention),
    re-encode with the same channel count.  ``max_pixels`` passes
    through to `decode_png`."""
    width, height, channels, px = decode_png(data, max_pixels=max_pixels)
    stride = width * channels
    out = bytearray(target_w * target_h * channels)
    for ty in range(target_h):
        sy = ty * height // target_h
        for tx in range(target_w):
            sx = tx * width // target_w
            s = sy * stride + sx * channels
            d = (ty * target_w + tx) * channels
            out[d:d + channels] = px[s:s + channels]
    return encode_png(bytes(out), target_w, target_h, channels)
