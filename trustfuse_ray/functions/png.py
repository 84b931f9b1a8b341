"""Minimal pure-stdlib PNG codec (zlib + struct, no external libraries).

Implements the public PNG specification (RFC 2083 / W3C PNG) for
non-interlaced 8-bit grayscale / gray+alpha / RGB / RGBA images with all
five scanline filters (None, Sub, Up, Average, Paeth).  This upgrades the
multimodal decode stage from an environment stub to a REAL codec path: the
container ships no image libraries, but PNG needs only DEFLATE, which the
standard library provides.

Scale note: decode cost is linear in pixels and runs inside actor-pool
``map_batches`` workers (stages/multimodal.py) — the driver never touches
payload bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_TO_NCH = {0: 1, 2: 3, 4: 2, 6: 4}
_NCH_TO_COLOR = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(typ: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(typ + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + typ + body + struct.pack(">I", crc)


def _iter_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos:pos + 8])
        yield typ, data[pos + 8:pos + 8 + ln]
        pos += 12 + ln


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb and pa_ <= pc_:
        return a
    return b if pb <= pc_ else c


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """uint8 ndarray (h, w) or (h, w, c∈{1,2,3,4}) → PNG bytes.

    ``filter_type`` applies one scanline filter to every row (0=None,
    1=Sub, 2=Up, 3=Average, 4=Paeth) — exercised by the round-trip tests;
    production encodes default to 0 and let DEFLATE do the work."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _NCH_TO_COLOR:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w, nch = a.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    stride = w * nch
    flat = a.reshape(h, stride)
    prev = np.zeros(stride, np.uint8)
    lines = []
    for y in range(h):
        row = flat[y]
        if filter_type == 0:
            enc = row
        elif filter_type == 1:      # Sub
            left = np.zeros(stride, np.uint8)
            left[nch:] = row[:-nch]
            enc = row - left
        elif filter_type == 2:      # Up
            enc = row - prev
        elif filter_type == 3:      # Average
            enc = np.empty(stride, np.uint8)
            rec = row.astype(np.int32)
            for x in range(stride):
                left = int(row[x - nch]) if x >= nch else 0
                enc[x] = (rec[x] - (left + int(prev[x])) // 2) & 0xFF
        elif filter_type == 4:      # Paeth
            enc = np.empty(stride, np.uint8)
            for x in range(stride):
                left = int(row[x - nch]) if x >= nch else 0
                up = int(prev[x])
                ul = int(prev[x - nch]) if x >= nch else 0
                enc[x] = (int(row[x]) - _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad filter {filter_type}")
        lines.append(bytes([filter_type]) + enc.tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _NCH_TO_COLOR[nch], 0, 0, 0)
    idat = zlib.compress(b"".join(lines), 6)
    return (_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 ndarray (h, w) for grayscale, (h, w, c) otherwise.

    Supports non-interlaced 8-bit depth, color types 0/2/4/6, and all five
    scanline filters."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    ihdr, idat = None, []
    for typ, body in _iter_chunks(data):
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced PNGs supported "
            f"(depth={depth}, interlace={interlace})")
    if color not in _COLOR_TO_NCH:
        raise NotImplementedError(f"color type {color} (palette?) "
                                  "not supported")
    nch = _COLOR_TO_NCH[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != h * (stride + 1):
        raise ValueError("truncated pixel data")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    pos = 0
    for y in range(h):
        ft = raw[pos]
        pos += 1
        row = np.frombuffer(raw, np.uint8, stride, pos).copy()
        pos += stride
        if ft == 0:
            rec = row
        elif ft == 1:       # Sub: per-channel-phase prefix sum mod 256
            rec = row
            for c in range(nch):
                rec[c::nch] = (np.cumsum(rec[c::nch], dtype=np.uint64)
                               & 0xFF).astype(np.uint8)
        elif ft == 2:       # Up: uint8 addition wraps as the spec requires
            rec = row + prev
        elif ft == 3:       # Average (sequential left-dependency)
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                left = int(rec[x - nch]) if x >= nch else 0
                rec[x] = (int(row[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif ft == 4:       # Paeth (sequential left-dependency)
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                left = int(rec[x - nch]) if x >= nch else 0
                up = int(prev[x])
                ul = int(prev[x - nch]) if x >= nch else 0
                rec[x] = (int(row[x]) + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad scanline filter {ft}")
        out[y] = rec
        prev = rec
    arr = out.reshape(h, w, nch)
    return arr[:, :, 0] if nch == 1 else arr
