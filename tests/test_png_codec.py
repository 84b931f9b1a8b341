"""Pure-stdlib PNG codec: round-trips, filters, error paths, and the
actor-pool decode stage over Ray."""

import numpy as np
import pyarrow as pa
import pytest

from trustfuse_ray.functions.png import decode_png, encode_png


@pytest.mark.parametrize("shape", [(5, 7), (16, 16, 3), (9, 4, 4),
                                   (3, 3, 2), (1, 1), (64, 33, 3)])
@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_round_trip(shape, filter_type):
    rng = np.random.default_rng(sum(shape) * 10 + filter_type)
    a = rng.integers(0, 256, size=shape, dtype=np.uint8)
    b = decode_png(encode_png(a, filter_type=filter_type))
    assert b.shape == a.shape
    assert np.array_equal(b, a)


def test_gradient_images_compress_and_round_trip():
    # smooth gradients are where Sub/Up/Paeth filters actually help
    x = np.arange(256, dtype=np.uint8)
    img = np.add.outer(x[:64], x[:128]).astype(np.uint8)
    for ft in range(5):
        assert np.array_equal(decode_png(encode_png(img, filter_type=ft)),
                              img)


def test_bad_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + b"\x00" * 64)


def test_empty_image_rejected():
    with pytest.raises(ValueError):
        encode_png(np.zeros((0, 4), np.uint8))


def test_truncated_pixel_data_rejected():
    data = bytearray(encode_png(np.zeros((4, 4), np.uint8)))
    # corrupt the IHDR height so the decompressed size no longer matches
    # height field sits at offset 8 (sig) + 8 (len+type) + 4 (width)
    data[20] = 9
    with pytest.raises(ValueError):
        decode_png(bytes(data))


def test_png_features_stage(ray_session):
    import ray.data as rd

    from trustfuse_ray.stages.multimodal import (png_features,
                                                 synth_png_media_from_docs)

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["hello world", "", "abc " * 300], pa.string()),
    }))
    out = png_features(synth_png_media_from_docs(docs)).to_pandas()
    out = out.sort_values("media_id").reset_index(drop=True)
    texts = {0: "hello world", 1: "", 2: "abc " * 300}
    for _, row in out.iterrows():
        data = texts[row["media_id"]].encode()
        w, h = 16 + len(data) % 17, 16 + len(data) % 13
        k = min(len(data), w * h)
        assert row["width"] == w and row["height"] == h
        assert row["px_sum"] == sum(data[:k])
        assert row["px_nonzero"] == k
