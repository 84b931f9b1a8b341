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
    # bundle_bytes=1 → one file per bundle (the finest resumable grain)
    out1 = str(tmp_path / "run1")
    out2 = str(tmp_path / "run2")

    # full fresh run → reference output
    s_full = run_kg_pipeline_resumable(synth_dir, out2, model="Voting",
                                       bundle_bytes=1)
    assert s_full["status"] == "complete"

    # partial run (simulated kill after 3 partitions)
    s_part = run_kg_pipeline_resumable(synth_dir, out1, model="Voting",
                                       max_partitions=3, bundle_bytes=1)
    assert s_part["status"] == "partial"
    assert len(s_part["claims_partitions_done"]) == 3

    # record manifest timestamps of the completed partitions
    stamps = {}
    for p in s_part["claims_partitions_done"]:
        m = json.loads((Path(out1) / "claims" / "_manifests" /
                        f"part-{p:05d}.json").read_text())
        stamps[p] = m["written_at"]

    # resumed run completes the rest
    s_res = run_kg_pipeline_resumable(synth_dir, out1, model="Voting",
                                      bundle_bytes=1)
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
    s_again = run_kg_pipeline_resumable(synth_dir, out1, model="Voting",
                                        bundle_bytes=1)
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
    s_dirty = run_kg_pipeline_resumable(synth_dir, out1, model="Voting",
                                        bundle_bytes=1)
    assert 0 in s_dirty["claims_partitions_done"]
    shutil.rmtree(out1)


def test_resume_bundled_layout(synth_dir, tmp_path):
    """Bundled stage-A grain (multiple input files per partition): kill
    after 2 bundles, resume skips exactly those bundles, output matches the
    per-file-grain run, and a stale bundle fingerprint forces recompute."""
    import glob
    import os

    from trustfuse_ray.pipelines.kg import bundle_files

    files = sorted(glob.glob(os.path.join(synth_dir, "transcripts",
                                          "*.parquet")))
    # target just above the largest file -> greedy packs 2 files per bundle
    target = max(os.stat(f).st_size for f in files) + 1
    bundles = bundle_files(files, target)
    assert len(bundles) < len(files) and all(len(b) >= 2 for b in bundles[:-1])
    assert [f for b in bundles for f in b] == files  # order-preserving

    out1 = str(tmp_path / "b1")
    out2 = str(tmp_path / "b2")
    s_full = run_kg_pipeline_resumable(synth_dir, out2, model="Voting",
                                       bundle_bytes=1)
    s_part = run_kg_pipeline_resumable(synth_dir, out1, model="Voting",
                                       max_partitions=2, bundle_bytes=target)
    assert s_part["status"] == "partial"
    assert len(s_part["claims_partitions_done"]) == 2

    stamps = {}
    for p in s_part["claims_partitions_done"]:
        m = json.loads((Path(out1) / "claims" / "_manifests" /
                        f"part-{p:05d}.json").read_text())
        stamps[p] = m["written_at"]
        assert len(m["metrics"]["input_files"]) >= 2

    s_res = run_kg_pipeline_resumable(synth_dir, out1, model="Voting",
                                      bundle_bytes=target)
    assert s_res["status"] == "complete"
    assert set(s_res["claims_partitions_skipped"]) >= set(stamps)
    assert s_res["total_partitions"] == len(bundles)
    for p, ts in stamps.items():
        m = json.loads((Path(out1) / "claims" / "_manifests" /
                        f"part-{p:05d}.json").read_text())
        assert m["written_at"] == ts

    # bundled-grain output == per-file-grain output
    assert _triples_set(out1) == _triples_set(out2)

    # stale bundle fingerprint -> that bundle (and only it) recomputes
    mpath = Path(out1) / "claims" / "_manifests" / "part-00001.json"
    m = json.loads(mpath.read_text())
    m["input_fingerprint"] = "stale"
    mpath.write_text(json.dumps(m))
    s_dirty = run_kg_pipeline_resumable(synth_dir, out1, model="Voting",
                                        bundle_bytes=target)
    assert s_dirty["claims_partitions_done"] == [1]
    shutil.rmtree(out1)
