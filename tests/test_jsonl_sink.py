"""JSONL sharded export sink: determinism across block layouts, manifest
integrity, round-trip readability."""

import glob
import hashlib
import json
import os

import pyarrow as pa


def _docs(n=40):
    return pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array([f"doc {i} body" for i in range(n)], pa.string()),
    })


def test_export_round_trip_and_manifests(ray_session, tmp_path):
    import ray.data as rd

    from trustfuse_ray.sources.jsonl import export_jsonl_sharded

    out = str(tmp_path / "exp")
    man = export_jsonl_sharded(rd.from_arrow(_docs()), out, "doc_id",
                               n_shards=4).to_pandas()
    assert man["rows"].sum() == 40
    seen = []
    for d in sorted(glob.glob(os.path.join(out, "shard=*"))):
        body = open(os.path.join(d, "part.jsonl"), "rb").read()
        m = json.load(open(os.path.join(d, "manifest.json")))
        assert hashlib.md5(body).hexdigest() == m["md5"]
        lines = [ln for ln in body.decode().splitlines() if ln]
        assert len(lines) == m["rows"]
        seen += [json.loads(ln)["doc_id"] for ln in lines]
    assert sorted(seen) == list(range(40))


def test_export_deterministic_across_layouts(ray_session, tmp_path):
    import ray.data as rd

    from trustfuse_ray.sources.jsonl import export_jsonl_sharded

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    export_jsonl_sharded(rd.from_arrow(_docs()), a, "doc_id",
                         n_shards=4).materialize()
    export_jsonl_sharded(rd.from_arrow(_docs()).repartition(7), b,
                         "doc_id", n_shards=4).materialize()
    for d in sorted(os.listdir(a)):
        pa_ = open(os.path.join(a, d, "part.jsonl"), "rb").read()
        pb_ = open(os.path.join(b, d, "part.jsonl"), "rb").read()
        assert pa_ == pb_
