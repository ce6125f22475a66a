"""Pure-stdlib PNG codec (zlib + struct + numpy) — a REAL decode path.

The container has no PIL/libjpeg/ffmpeg, but PNG needs only zlib (stdlib):
this module gives the multimodal stages an actual bytes→pixels decode
instead of a stub. Scope: 8-bit, non-interlaced, color types 0 (gray),
2 (RGB) and 6 (RGBA); all five scanline filters (None/Sub/Up/Average/
Paeth) are implemented on the decode side. The encoder writes filter-0
scanlines. Anything outside that scope raises ``ValueError`` so callers
can fall back to an injected codec (PIL) where one exists.

Row unfiltering is numpy-vectorized along the pixel axis where the filter
permits (Up is fully vectorized; Sub/Average/Paeth carry a sequential
dependency along x, run per-pixel-column in C-order numpy ops per row).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def is_png(payload: bytes) -> bool:
    return payload[:8] == _SIG


def _chunk(tag: bytes, data: bytes) -> bytes:
    c = tag + data
    return struct.pack(">I", len(data)) + c + struct.pack(
        ">I", zlib.crc32(c) & 0xFFFFFFFF)


def png_encode(img: np.ndarray, *, level: int = 6) -> bytes:
    """Encode HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8 → PNG bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, channels = 0, 1
        img = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color, channels = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        color, channels = 6, 4
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w = img.shape[:2]
    # filter byte 0 prepended to every scanline
    raw = np.empty((h, 1 + w * channels), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * channels)
    return (_SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color,
                                          0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(raw.tobytes(), level))
            + _chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a pixel row (int16 workspace)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc_ = np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a,
                   np.where(pb <= pc_, b, c))
    return out.astype(np.uint8)


def png_decode(payload: bytes) -> np.ndarray:
    """Decode PNG bytes → HxWxC uint8 (C = 1, 3 or 4; gray returns HxWx1
    squeezed to HxW for PIL parity)."""
    if not is_png(payload):
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, []
    w = h = depth = color = interlace = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data[:13])
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("no IHDR chunk")
    if depth != 8 or color not in _CHANNELS or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} "
            f"interlace={interlace}); inject a full codec (PIL)")
    channels = _CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = 1 + w * channels
    if len(raw) != h * stride:
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    filters = raw[:, 0]
    lines = raw[:, 1:].reshape(h, w, channels)
    out = np.zeros((h, w, channels), dtype=np.uint8)
    zero_row = np.zeros((w, channels), dtype=np.uint8)
    for y in range(h):
        f = filters[y]
        cur = lines[y]
        prior = out[y - 1] if y else zero_row
        if f == 0:                     # None
            out[y] = cur
        elif f == 2:                   # Up — vectorized
            out[y] = cur + prior
        elif f == 1:                   # Sub — sequential in x
            rec = out[y]
            rec[0] = cur[0]
            for x in range(1, w):
                rec[x] = cur[x] + rec[x - 1]
        elif f == 3:                   # Average
            rec = out[y]
            rec[0] = cur[0] + (prior[0] // 2)
            for x in range(1, w):
                rec[x] = cur[x] + ((rec[x - 1].astype(np.int16)
                                    + prior[x]) // 2).astype(np.uint8)
        elif f == 4:                   # Paeth
            rec = out[y]
            rec[0] = cur[0] + _paeth(zero_row[0], prior[0], zero_row[0])
            for x in range(1, w):
                rec[x] = cur[x] + _paeth(rec[x - 1], prior[x],
                                         prior[x - 1])
        else:
            raise ValueError(f"bad PNG filter type {f}")
    return out[:, :, 0] if channels == 1 else out
