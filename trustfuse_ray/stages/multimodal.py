"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by actor-pool map_batches stages.

Codecs: PNG and WAV decode are REAL — pure-stdlib implementations of the
public specs (functions/png.py: zlib DEFLATE + all five scanline filters;
functions/wav.py: RIFF chunk walker, PCM 16-bit mono) drive
:func:`png_features` and :func:`wav_features` end-to-end, each with a full
DuckDB oracle recomputing the expected pixel/sample statistics from the
generating text.  JPEG/video codecs are not available in this container,
so ``DecoderPool(codec="real")`` still raises NotImplementedError for
those; ``codec="fake"`` (default) applies a deterministic header-parse
decode.
Everything around the codecs — Arrow binary schema, per-actor setup,
batch sizing for large payloads, struct/list outputs — is real and tested.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA = pa.schema([
    pa.field("media_id", pa.int64()),
    pa.field("kind", pa.string()),          # image|audio|video
    pa.field("payload", pa.binary()),       # opaque encoded bytes
    pa.field("width", pa.int32()),          # typed metadata
    pa.field("height", pa.int32()),
    pa.field("duration_ms", pa.int32()),
])


def synth_media_from_docs(docs, kind: str = "image"):
    """Deterministic fake media table derived from a documents table: the
    payload is a tagged header + the utf-8 text bytes (stands in for encoded
    pixels/samples)."""

    def _b(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        payloads, w, h, d = [], [], [], []
        for t in texts:
            data = (t or "").encode()
            wd = 16 + len(data) % 64
            ht = 16 + (len(data) // 64) % 64
            payloads.append(struct.pack("<4sII", b"FAKE", wd, ht) + data)
            w.append(wd)
            h.append(ht)
            d.append(len(data))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array([kind] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "duration_ms": pa.array(d, pa.int32()),
        })

    return docs.map_batches(_b, batch_format="pyarrow", zero_copy_batch=True)


class DecoderPool:
    """Actor-pool decode/feature-extract stage.

    ``__init__`` is the once-per-actor model/codec load; ``__call__`` runs
    per (small!) batch — large binary payloads need small batch_size so
    batch x concurrency fits worker heaps (pass batch_size=32..256).
    """

    def __init__(self, codec: str = "fake", feature_dim: int = 16):
        if codec not in ("fake", "real"):
            raise ValueError(codec)
        self.codec = codec
        self.dim = feature_dim
        # once-per-actor setup (stands in for model/codec load)
        self._proj_seed = 1234567

    def _decode_raw(self, payload: bytes) -> np.ndarray:
        """Quantized (uint16) pseudo-features from an md5 chain over the
        body — md5 (not blake2b) so the driver's DuckDB oracle can recompute
        the exact values in SQL (`multimodal_features_long`)."""
        if self.codec == "real":
            raise NotImplementedError(
                "DecoderPool's generic payloads have no real codec; use "
                "png_features / wav_features for the REAL stdlib PNG/WAV "
                "decode paths, or codec='fake' here (JPEG/video codecs "
                "are not present in this environment)")
        tag, w, h = struct.unpack("<4sII", payload[:12])
        body = payload[12:]
        dg = b""
        i = 0
        while len(dg) < self.dim * 2:
            dg += hashlib.md5(str(i).encode() + body).digest()
            i += 1
        return np.frombuffer(dg[:self.dim * 2], dtype="<u2")

    def _decode(self, payload: bytes) -> np.ndarray:
        return self._decode_raw(payload).astype(np.float32) / 65535.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        payloads = batch["payload"].to_pylist()
        feats = [self._decode(p).tolist() for p in payloads]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": batch["kind"],
            "features": pa.array(feats, pa.list_(pa.float32())),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        })


def extract_media_features(media, concurrency=(1, 4), batch_size: int = 128,
                           codec: str = "fake"):
    return media.map_batches(
        DecoderPool, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
        fn_constructor_kwargs={"codec": codec})


def synth_png_media_from_docs(docs):
    """Deterministic REAL-PNG media table from a documents table: each
    doc's utf-8 bytes become the grayscale pixel plane of a
    ``(16 + len%13) × (16 + len%17)`` image (zero-padded / truncated),
    encoded with the pure-stdlib PNG encoder.  The generating rule is
    SQL-replayable, so downstream decode correctness has a full oracle."""
    from trustfuse_ray.functions.png import encode_png

    def _b(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        payloads, ws, hs = [], [], []
        for t in texts:
            data = (t or "").encode()
            w = 16 + len(data) % 17
            h = 16 + len(data) % 13
            px = np.zeros(w * h, np.uint8)
            k = min(len(data), w * h)
            px[:k] = np.frombuffer(data, np.uint8, k)
            payloads.append(encode_png(px.reshape(h, w)))
            ws.append(w)
            hs.append(h)
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["image"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "duration_ms": pa.array([0] * len(ids), pa.int32()),
        })

    return docs.map_batches(_b, batch_format="pyarrow", zero_copy_batch=True)


class PngFeaturePool:
    """Actor-pool REAL-decode stage: payload → pixels via the stdlib PNG
    decoder (once-per-actor import in ``__init__``), then integer pixel
    statistics — exactly recomputable by the SQL oracle from the
    generating text, which makes this a full end-to-end correctness gate
    for the codec itself."""

    def __init__(self):
        from trustfuse_ray.functions.png import decode_png
        self._decode = decode_png

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids = batch["media_id"].to_pylist()
        out = {"media_id": [], "width": [], "height": [],
               "px_sum": [], "px_nonzero": []}
        for mid, p in zip(mids, batch["payload"].to_pylist()):
            a = self._decode(p)
            out["media_id"].append(mid)
            out["height"].append(a.shape[0])
            out["width"].append(a.shape[1])
            out["px_sum"].append(int(a.sum(dtype=np.int64)))
            out["px_nonzero"].append(int((a > 0).sum()))
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "width": pa.array(out["width"], pa.int64()),
            "height": pa.array(out["height"], pa.int64()),
            "px_sum": pa.array(out["px_sum"], pa.int64()),
            "px_nonzero": pa.array(out["px_nonzero"], pa.int64()),
        })


def png_features(media, concurrency=(1, 4), batch_size: int = 256):
    return media.map_batches(
        PngFeaturePool, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


def synth_wav_media_from_docs(docs):
    """Deterministic REAL-WAV media table from a documents table: each
    doc's utf-8 bytes become int16 PCM samples via the SQL-replayable rule
    ``s_i = ((byte_i*37 + (i-1)*11) % 256 - 128) * 256`` (varied signs so
    zero-crossing stats are non-trivial), mono at
    ``8000 + (len % 4) * 2000`` Hz, encoded with the pure-stdlib RIFF
    encoder.  Downstream decode correctness therefore has a full oracle."""
    from trustfuse_ray.functions.wav import encode_wav

    def _b(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        payloads, rates, durs = [], [], []
        for t in texts:
            data = np.frombuffer((t or "").encode(), np.uint8)
            idx = np.arange(len(data), dtype=np.int64)
            s = ((data.astype(np.int64) * 37 + idx * 11) % 256 - 128) * 256
            rate = 8000 + (len(data) % 4) * 2000
            payloads.append(encode_wav(s.astype(np.int16), rate))
            rates.append(rate)
            durs.append(int(len(data) * 1000 / rate))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "kind": pa.array(["audio"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array([0] * len(ids), pa.int32()),
            "height": pa.array([0] * len(ids), pa.int32()),
            "duration_ms": pa.array(durs, pa.int32()),
        })

    return docs.map_batches(_b, batch_format="pyarrow", zero_copy_batch=True)


class WavFeaturePool:
    """Actor-pool REAL-decode stage: payload → PCM samples via the stdlib
    RIFF/WAVE chunk walker (once-per-actor import in ``__init__``), then
    integer sample statistics — amplitude sum, peak, zero crossings —
    exactly recomputable by the SQL oracle from the generating text."""

    def __init__(self):
        from trustfuse_ray.functions.wav import decode_wav
        self._decode = decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids = batch["media_id"].to_pylist()
        out = {"media_id": [], "n_samples": [], "sample_rate": [],
               "amp_sum": [], "peak": [], "zero_cross": []}
        for mid, p in zip(mids, batch["payload"].to_pylist()):
            s, rate = self._decode(p)
            a = np.abs(s.astype(np.int64))
            out["media_id"].append(mid)
            out["n_samples"].append(len(s))
            out["sample_rate"].append(rate)
            out["amp_sum"].append(int(a.sum()))
            out["peak"].append(int(a.max()) if len(s) else 0)
            out["zero_cross"].append(
                int((s[:-1].astype(np.int64) * s[1:] < 0).sum())
                if len(s) > 1 else 0)
        return pa.table({
            "media_id": pa.array(out["media_id"], pa.int64()),
            "n_samples": pa.array(out["n_samples"], pa.int64()),
            "sample_rate": pa.array(out["sample_rate"], pa.int64()),
            "amp_sum": pa.array(out["amp_sum"], pa.int64()),
            "peak": pa.array(out["peak"], pa.int64()),
            "zero_cross": pa.array(out["zero_cross"], pa.int64()),
        })


def wav_features(media, concurrency=(1, 4), batch_size: int = 256):
    return media.map_batches(
        WavFeaturePool, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency)


def frame_sample(media, every_n_bytes: int = 1024, max_frames: int = 8):
    """Video frame-sampling analog over opaque payloads: emit up to
    ``max_frames`` evenly spaced byte-window 'frames' per payload
    (flat_map-style row expansion)."""

    def _b(batch: pa.Table) -> pa.Table:
        mids, fidx, frames = [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            body = payload[12:]
            n = max(1, min(max_frames, len(body) // every_n_bytes + 1))
            step = max(1, len(body) // n)
            for i in range(n):
                mids.append(mid)
                fidx.append(i)
                frames.append(body[i * step:i * step + 64])
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "frame_idx": pa.array(fidx, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })

    return media.map_batches(_b, batch_format="pyarrow", zero_copy_batch=True)


def media_dedup(media, n_parts: int = 32):
    """Content-hash dedup over binary media payloads: md5 of the DECODED
    content body (payload minus the codec header — re-encodes of the same
    content dedup together), duplicates keep the smallest media_id.  The
    payload-parsing path is the real binary plumbing; only (media_id, fp)
    rows enter the winner exchange — the media bytes never shuffle.

    Returns (media_id, fp, keep)."""
    import hashlib

    from trustfuse_ray.stages.common import hash_group_apply

    def _fp(batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        fps = [hashlib.md5(p[12:]).hexdigest()
               for p in batch["payload"].to_pylist()]
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "fp": pa.array(fps, pa.string())})

    fps = media.select_columns(["media_id", "payload"]).map_batches(
        _fp, batch_format="pyarrow", zero_copy_batch=True)

    def _keep(group: pa.Table) -> pa.Table:
        ids = group["media_id"].to_pylist()
        lo = min(ids)
        return pa.table({
            "media_id": group["media_id"],
            "fp": group["fp"],
            "keep": pa.array([1 if i == lo else 0 for i in ids],
                             pa.int64())})

    return hash_group_apply(
        fps, ["fp"], _keep, n_parts=n_parts,
        plasma_schema=pa.schema([("media_id", pa.int64()),
                                 ("fp", pa.string()),
                                 ("keep", pa.int64())]))
