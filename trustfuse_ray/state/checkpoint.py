"""Per-partition checkpoint manifests (north rule: resumable from
per-partition checkpoints with lineage + metrics).

The reference's only persistence is a whole-object pickle
(`/root/reference/trustfuse/conflicting_dataset/dataset.py:172-175`).  Here
every stage writes Parquet per input partition plus a ``_MANIFEST.json``
recording the input fingerprint, row/byte counts and wall time; a resumed
run skips partitions whose manifest is complete AND whose input fingerprint
still matches (changed input → recompute, not silent staleness).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

def partition_dir(root: str, part: int) -> str:
    return os.path.join(root, f"part={part:05d}")


def manifest_path(root: str, part: int) -> str:
    # manifests live OUTSIDE the data partitions so parquet readers never
    # see non-parquet files
    return os.path.join(root, "_manifests", f"part-{part:05d}.json")


def read_manifest(root: str, part: int) -> dict | None:
    p = manifest_path(root, part)
    if not os.path.exists(p):
        return None
    try:
        return json.loads(Path(p).read_text())
    except (json.JSONDecodeError, OSError):
        return None


def is_complete(root: str, part: int, input_fingerprint: str) -> bool:
    m = read_manifest(root, part)
    return bool(m and m.get("status") == "complete"
                and m.get("input_fingerprint") == input_fingerprint)


def write_manifest(root: str, part: int, input_fingerprint: str,
                   rows: int, wall_secs: float,
                   metrics: dict | None = None,
                   data_dir: str | None = None) -> None:
    # data_dir overrides the default part=%05d layout (e.g. the
    # hive-partitioned shard=N triple output)
    d = data_dir or partition_dir(root, part)
    os.makedirs(d, exist_ok=True)
    os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
    nbytes = sum(f.stat().st_size for f in Path(d).glob("*.parquet"))
    payload = {
        "status": "complete",
        "input_fingerprint": input_fingerprint,
        "rows": rows,
        "bytes": nbytes,
        "wall_secs": round(wall_secs, 3),
        "written_at": time.time(),
        "metrics": metrics or {},
    }
    mp = manifest_path(root, part)
    Path(mp + ".tmp").write_text(json.dumps(payload, indent=1))
    os.replace(mp + ".tmp", mp)


def file_fingerprint(path: str) -> str:
    st = os.stat(path)
    return f"{os.path.basename(path)}:{st.st_size}"
