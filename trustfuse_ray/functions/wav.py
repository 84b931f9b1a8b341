"""Pure-stdlib RIFF/WAVE PCM codec (public WAV container spec).

16-bit little-endian mono PCM encode/decode via ``struct`` + numpy — no
external audio libraries, which is the point: together with
``functions/png.py`` it lets the multimodal ``codec="real"`` path do REAL
byte-level decoding inside this container.  The decoder is a proper chunk
walker (chunk id + size, even-byte padding), so WAVs with extra chunks
(LIST/INFO, fact, cue) decode correctly, not just our own encoder's output.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """1-D int16 samples → RIFF/WAVE bytes (PCM, mono, 16-bit LE)."""
    if samples.ndim != 1:
        raise ValueError("encode_wav expects a 1-D sample array")
    if sample_rate <= 0:
        raise ValueError("sample_rate must be positive")
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * 2          # mono × 2 bytes/sample
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1,
                      sample_rate, byte_rate, 2, 16)
    body = b"WAVE" + fmt + struct.pack("<4sI", b"data", len(data)) + data
    if len(data) % 2:                    # RIFF chunks are even-padded
        body += b"\x00"
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes → (int16 sample array, sample_rate).

    Walks the chunk list; requires a PCM (format tag 1) 16-bit mono
    ``fmt `` chunk before ``data``.  Raises ValueError on anything that
    is not such a WAV (wrong magic, truncated chunk, missing fmt/data,
    unsupported format)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    sample_rate = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        pos += 8
        if pos + size > end:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            tag, channels, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", payload, pos)
            if tag != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: tag={tag} ch={channels} bits={bits} "
                    "(only PCM 16-bit mono)")
            sample_rate = rate
        elif cid == b"data":
            if sample_rate is None:
                raise ValueError("data chunk before fmt chunk")
            if size % 2:
                raise ValueError("odd data-chunk size for 16-bit samples")
            samples = np.frombuffer(payload, dtype="<i2",
                                    count=size // 2, offset=pos)
            return samples.astype(np.int16, copy=False), sample_rate
        pos += size + (size % 2)         # skip unknown chunks, even-padded
    raise ValueError("no data chunk found")
