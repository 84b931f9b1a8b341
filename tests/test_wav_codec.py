"""Pure-stdlib RIFF/WAVE PCM codec: round-trips, chunk walking, error
paths, and the actor-pool decode stage over Ray."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from trustfuse_ray.functions.wav import decode_wav, encode_wav


@pytest.mark.parametrize("n", [0, 1, 2, 17, 4096])
@pytest.mark.parametrize("rate", [8000, 44100])
def test_round_trip(n, rate):
    rng = np.random.default_rng(n * 7 + rate)
    s = rng.integers(-32768, 32768, size=n).astype(np.int16)
    out, r = decode_wav(encode_wav(s, rate))
    assert r == rate
    assert np.array_equal(out, s)


def test_decoder_walks_extra_chunks():
    # a LIST chunk between fmt and data must be skipped, including the
    # odd-size even-padding rule
    s = np.array([100, -200, 300], np.int16)
    payload = bytearray(encode_wav(s, 8000))
    # splice an odd-sized junk chunk right before 'data'
    data_at = bytes(payload).index(b"data")
    junk = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    patched = bytes(payload[:data_at]) + junk + bytes(payload[data_at:])
    # fix the RIFF size field
    patched = (patched[:4] + struct.pack("<I", len(patched) - 8)
               + patched[8:])
    out, r = decode_wav(patched)
    assert r == 8000 and np.array_equal(out, s)


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)


def test_stereo_rejected():
    payload = bytearray(encode_wav(np.zeros(4, np.int16), 8000))
    # channels field sits at RIFF(12) + 'fmt '+size(8) + tag(2)
    struct.pack_into("<H", payload, 22, 2)
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bytes(payload))


def test_truncated_data_rejected():
    payload = encode_wav(np.zeros(16, np.int16), 8000)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(payload[:-8])


def test_missing_fmt_rejected():
    s = np.zeros(2, np.int16)
    data = s.tobytes()
    body = b"WAVE" + struct.pack("<4sI", b"data", len(data)) + data
    payload = struct.pack("<4sI", b"RIFF", len(body)) + body
    with pytest.raises(ValueError, match="fmt"):
        decode_wav(payload)


def test_wav_features_stage(ray_session):
    import ray.data as rd

    from trustfuse_ray.stages.multimodal import (synth_wav_media_from_docs,
                                                 wav_features)

    texts = {0: "hello world", 1: "", 2: "abc " * 300}
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
    }))
    out = wav_features(synth_wav_media_from_docs(docs)).to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    for _, row in out.iterrows():
        data = np.frombuffer(texts[row["media_id"]].encode(), np.uint8)
        idx = np.arange(len(data), dtype=np.int64)
        v = ((data.astype(np.int64) * 37 + idx * 11) % 256 - 128) * 256
        assert row["n_samples"] == len(data)
        assert row["sample_rate"] == 8000 + (len(data) % 4) * 2000
        assert row["amp_sum"] == int(np.abs(v).sum())
        assert row["peak"] == (int(np.abs(v).max()) if len(v) else 0)
        assert row["zero_cross"] == (int((v[:-1] * v[1:] < 0).sum())
                                     if len(v) > 1 else 0)


def test_round_trip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @settings(max_examples=60, deadline=None)
    @given(arrays(np.int16, st.integers(0, 300)),
           st.integers(1, 192_000))
    def _prop(s, rate):
        out, r = decode_wav(encode_wav(s, rate))
        assert r == rate
        assert np.array_equal(out, s)

    _prop()


def test_quantization_matches_duckdb_round():
    """The engine's half-away-from-zero _quant_fx must agree with DuckDB
    round() on adversarial values (exact .5 boundaries, negatives)."""
    import duckdb

    from trustfuse_ray.stages.ann import _quant_fx

    vals = np.array([0.0000005, -0.0000005, 0.0000015, -0.0000015,
                     0.1234565, -0.1234565, 0.5, -0.5, 1e-7, -1e-7,
                     0.9999995, -0.9999995], np.float64)
    ours = _quant_fx(vals.reshape(1, -1), 1_000_000).ravel()
    con = duckdb.connect()
    theirs = [con.execute(
        "SELECT CAST(CASE WHEN ? >= 0 THEN floor(? * 1000000 + 0.5) "
        "ELSE -floor(-? * 1000000 + 0.5) END AS BIGINT)",
        [float(v)] * 3).fetchone()[0] for v in vals]
    assert ours.tolist() == theirs
