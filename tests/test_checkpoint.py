"""Resume/lineage fixture (FIXTURES.md F6): kill after k partitions, rerun,
assert identical output and that completed partitions were not recomputed."""

import json
import shutil
from pathlib import Path

import pyarrow.parquet as pq

from trustfuse_ray.pipelines.kg import run_kg_pipeline_resumable


def _triples_set(out_dir):
    # hash-partitioned output: one __shard=N dir per entity key range
    # (pyarrow dataset discovery skips the _manifests/ sidecar)
    t = pq.read_table(str(Path(out_dir) / "triples"))
    return sorted(zip(t["entity"].to_pylist(), t["attr"].to_pylist(),
                      t["value_str"].to_pylist()))


def test_resume_skips_completed_partitions(synth_dir, tmp_path):
    out1 = str(tmp_path / "run1")
    out2 = str(tmp_path / "run2")

    # full fresh run → reference output
    s_full = run_kg_pipeline_resumable(synth_dir, out2, model="Voting")
    assert s_full["status"] == "complete"

    # partial run (simulated kill after 3 partitions)
    s_part = run_kg_pipeline_resumable(synth_dir, out1, model="Voting",
                                       max_partitions=3)
    assert s_part["status"] == "partial"
    assert len(s_part["claims_partitions_done"]) == 3

    # record manifest timestamps of the completed partitions
    stamps = {}
    for p in s_part["claims_partitions_done"]:
        m = json.loads((Path(out1) / "claims" / "_manifests" /
                        f"part-{p:05d}.json").read_text())
        stamps[p] = m["written_at"]

    # resumed run completes the rest
    s_res = run_kg_pipeline_resumable(synth_dir, out1, model="Voting")
    assert s_res["status"] == "complete"
    assert set(s_res["claims_partitions_skipped"]) >= set(stamps)

    # completed partitions were NOT recomputed (manifests untouched)
    for p, ts in stamps.items():
        m = json.loads((Path(out1) / "claims" / "_manifests" /
                        f"part-{p:05d}.json").read_text())
        assert m["written_at"] == ts

    # identical fused output
    assert _triples_set(out1) == _triples_set(out2)

    # re-running a complete pipeline is a no-op for fusion too
    s_again = run_kg_pipeline_resumable(synth_dir, out1, model="Voting")
    assert s_again.get("triples_skipped") is True

    # hash-partitioned output lineage: 16 shard manifests whose row
    # counts sum to the fused total; shard 0 carries the model metrics
    manifests = [json.loads(p.read_text()) for p in sorted(
        (Path(out1) / "triples" / "_manifests").glob("part-*.json"))]
    assert len(manifests) == 16
    assert sum(m["rows"] for m in manifests) == len(_triples_set(out1))
    assert "source_weights" in manifests[0]["metrics"]

    # corrupting an input fingerprint forces recompute of that partition
    mpath = Path(out1) / "claims" / "_manifests" / "part-00000.json"
    m = json.loads(mpath.read_text())
    m["input_fingerprint"] = "stale"
    mpath.write_text(json.dumps(m))
    s_dirty = run_kg_pipeline_resumable(synth_dir, out1, model="Voting")
    assert 0 in s_dirty["claims_partitions_done"]
    shutil.rmtree(out1)
