"""Full stdlib PNG decoder (and RGB encode helper) for the multimodal
path.

The repo already ships a PNG *encoder* (sources/tiledir_export.encode_png,
S7 parity with mapchete/formats/default/png.py); this module adds the
matching decoder so ``extract_media_features`` can run on REAL image
bytes instead of the documented stub — the reference reads images
through rasterio/PIL (mapchete/formats/default/png.py:93-118), which
this container lacks, so the codec is implemented from the public PNG
spec (RFC 2083 / W3C PNG 1.2) on zlib alone.

Supported: bit depth 8, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), all five scanline filters (None/Sub/Up/Average/Paeth),
non-interlaced. That covers everything the repo's own encoder emits
plus RGB, and the common web-PNG baseline.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"

# color type -> channel count (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, h: int, w: int, channels: int) -> np.ndarray:
    """Reverse per-scanline filtering; returns (h, w*channels) uint8."""
    bpp = channels  # bytes per pixel at depth 8
    stride = w * channels
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += 1 + stride
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 2:  # Up
            cur = line + prev  # uint8 wraps mod 256, per spec
        else:
            # Sub/Average/Paeth recur on the just-reconstructed left
            # byte, so go sequential (int arithmetic, small rows)
            cur = np.empty(stride, dtype=np.uint8)
            lf = line.tolist()
            pv = prev.tolist()
            cl = cur  # direct indexed writes
            if ftype == 1:  # Sub
                for x in range(stride):
                    left = int(cl[x - bpp]) if x >= bpp else 0
                    cl[x] = (lf[x] + left) & 0xFF
            elif ftype == 3:  # Average
                for x in range(stride):
                    left = int(cl[x - bpp]) if x >= bpp else 0
                    cl[x] = (lf[x] + ((left + pv[x]) >> 1)) & 0xFF
            elif ftype == 4:  # Paeth
                for x in range(stride):
                    left = int(cl[x - bpp]) if x >= bpp else 0
                    ul = int(pv[x - bpp]) if x >= bpp else 0
                    cl[x] = (lf[x] + _paeth(left, pv[x], ul)) & 0xFF
            else:
                raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out


def decode_png(buf: bytes) -> np.ndarray:
    """Decode a PNG byte string to uint8 ndarray: (h, w) for grayscale,
    (h, w, channels) otherwise."""
    if buf[:8] != _MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    color_type = depth = interlace = None
    idat = []
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise ValueError(f"unsupported PNG bit depth {depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    channels = _CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    expected = h * (1 + w * channels)
    if len(raw) != expected:
        raise ValueError(f"PNG stream length {len(raw)} != expected {expected}")
    arr = _unfilter(raw, h, w, channels)
    if channels == 1:
        return arr.reshape(h, w)
    return arr.reshape(h, w, channels)


def encode_png_rgb(arr: np.ndarray) -> bytes:
    """Color-type-2 (RGB) companion to tiledir_export.encode_png (which
    covers gray / gray+alpha / RGBA); filter 0 scanlines."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_png_rgb wants (h, w, 3) uint8")
    h, w = arr.shape[:2]
    lines = arr.reshape(h, -1)
    stream = b"".join(b"\x00" + lines[i].tobytes() for i in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(stream, 6))
        + chunk(b"IEND", b"")
    )
