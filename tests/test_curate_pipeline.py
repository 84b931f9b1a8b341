"""Composed curation pipeline: filter + dedup + pack interplay."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from trustfuse_ray.pipelines.curate import curate_documents


def test_curate_filters_dedups_packs():
    rows = [
        # kept, unique
        (0, "alpha beta gamma delta epsilon zeta", "s0"),
        # exact duplicate of doc 0 (after lower/trim) -> dropped by dedup
        (1, "  ALPHA beta gamma delta epsilon zeta ", "s0"),
        # degenerate repetition: dup_trigram_frac = 1.0 -> filtered
        (2, "spam spam spam spam spam spam spam spam", "s0"),
        # kept, other source
        (3, "one two three four five six seven", "s1"),
    ]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    }))
    out = {r["doc_id"]: r for r in curate_documents(docs, cap=10).take_all()}
    assert set(out) == {0, 3}                  # 1 deduped, 2 filtered
    assert out[0]["source"] == "s0" and out[0]["n_tokens"] == 6
    assert out[0]["seq_id"] == 0 and out[0]["seq_pos"] == 0
    assert out[3]["n_tokens"] == 7


def test_curate_pack_respects_cap_across_survivors():
    # 5 surviving docs of 4 tokens each in one source, cap 8 -> 3 seqs
    rows = [(i, f"w{i}a w{i}b w{i}c w{i}d", "s") for i in range(5)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    }))
    out = sorted(curate_documents(docs, cap=8).take_all(),
                 key=lambda r: r["doc_id"])
    assert [r["seq_id"] for r in out] == [0, 0, 1, 1, 2]
    assert [r["seq_pos"] for r in out] == [0, 1, 0, 1, 0]


def test_pretrain_dataset_end_to_end():
    import hashlib
    import struct

    from trustfuse_ray.pipelines.curate import pretrain_dataset

    def md5_64(s):
        return struct.unpack("<Q",
                             hashlib.md5(s.encode()).digest()[8:16])[0]

    rows = []
    for i in range(100):
        text = f"doc {i % 40} body tok{i % 7} end"  # 40 distinct texts
        rows.append((i, text, f"s{i % 2}"))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })).repartition(5)
    got = pretrain_dataset(ds, frac_train=0.8, n_shards=4).to_pandas()
    # dedup keeps min doc_id per text → 40 docs; 0.8 cut per source
    reps = {}
    for i, text, src in rows:
        key = text.strip().lower()
        if key not in reps or i < reps[key][0]:
            reps[key] = (i, src)
    per_src = {}
    for i, src in reps.values():
        per_src.setdefault(src, []).append(i)
    want_ids = set()
    for src, ids in per_src.items():
        ids.sort(key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(),
                                d))
        want_ids |= set(ids[:int(np.floor(0.8 * len(ids)))])
    assert set(got["doc_id"].astype(int)) == want_ids
    # shard assignment + dense in-shard ranks
    for sh, grp in got.groupby("shard"):
        assert all(md5_64(str(d)) % 4 == sh for d in grp["doc_id"])
        assert sorted(grp["pos"]) == list(range(len(grp)))
    # determinism across partitionings
    again = pretrain_dataset(ds.repartition(1), frac_train=0.8,
                             n_shards=4).to_pandas()
    a = got.sort_values("doc_id").reset_index(drop=True)
    b = again.sort_values("doc_id").reset_index(drop=True)
    assert (a["shard"] == b["shard"]).all() and (a["pos"] == b["pos"]).all()


def _write_sharded_docs(root, n_docs=200, n_shards=4):
    import pyarrow.parquet as pq

    rows = []
    for i in range(n_docs):
        text = f"doc {i % 80} body tok{i % 11} end tok{i % 5}"
        rows.append((i, text, f"s{i % 3}"))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    })
    root.mkdir(parents=True, exist_ok=True)
    step = -(-n_docs // n_shards)
    for s in range(n_shards):
        pq.write_table(tbl.slice(s * step, step),
                       str(root / f"part-{s:05d}.parquet"))
    return tbl


def test_pretrain_resumable_skips_completed_partitions(tmp_path):
    import json
    from pathlib import Path

    import pyarrow.parquet as pq

    from trustfuse_ray.pipelines.curate import (pretrain_dataset,
                                                pretrain_dataset_resumable)

    docs_dir = tmp_path / "docs"
    _write_sharded_docs(docs_dir)
    kw = dict(frac_train=0.8, n_shards=4, n_parts=8)

    def keep_rows(out_dir):
        parts = sorted((Path(out_dir) / "pretrain").glob("part=*"))
        t = pa.concat_tables([pq.read_table(str(p)) for p in parts])
        return sorted(zip(t["doc_id"].to_pylist(), t["shard"].to_pylist(),
                          t["pos"].to_pylist()))

    out1, out2 = str(tmp_path / "run1"), str(tmp_path / "run2")
    full = pretrain_dataset_resumable(str(docs_dir), out2, **kw)
    assert full["status"] == "complete" and full["rows"] > 0

    # simulated kill after 2 signal partitions
    part = pretrain_dataset_resumable(str(docs_dir), out1,
                                      max_partitions=2, **kw)
    assert part["status"] == "partial"
    assert len(part["signals_partitions_done"]) == 2
    stamps = {}
    for p in part["signals_partitions_done"]:
        m = json.loads((Path(out1) / "signals" / "_manifests" /
                        f"part-{p:05d}.json").read_text())
        stamps[p] = m["written_at"]

    # resume completes without recomputing finished partitions
    res = pretrain_dataset_resumable(str(docs_dir), out1, **kw)
    assert res["status"] == "complete"
    assert set(res["signals_partitions_skipped"]) >= set(stamps)
    for p, ts in stamps.items():
        m = json.loads((Path(out1) / "signals" / "_manifests" /
                        f"part-{p:05d}.json").read_text())
        assert m["written_at"] == ts

    # identical output, and identical to the streaming pipeline
    assert keep_rows(out1) == keep_rows(out2)
    stream = pretrain_dataset(rd.read_parquet(str(docs_dir)),
                              **kw).to_pandas()
    want = sorted(zip(stream["doc_id"].astype(int),
                      stream["shard"].astype(int),
                      stream["pos"].astype(int)))
    assert keep_rows(out1) == want

    # re-running a complete pipeline is a no-op for the final write
    again = pretrain_dataset_resumable(str(docs_dir), out1, **kw)
    assert again.get("pretrain_skipped") is True

    # per-shard manifests carry the token-total lineage
    m0 = json.loads((Path(out1) / "pretrain" / "_manifests" /
                     "part-00000.json").read_text())
    assert m0["metrics"]["tokens"] > 0


def test_sft_dataset_dedup_and_gates():
    import pyarrow as pa
    import ray.data as rd

    from trustfuse_ray.pipelines.curate import sft_dataset

    long_resp = "r" * 40
    turns = []
    # c1 and c2 are exact duplicate conversations -> c1 survives
    for cid in ("c1", "c2"):
        turns += [(cid, 0, "user", "hello"),
                  (cid, 1, "assistant", long_resp)]
    # c3 unique but its response is too short to pass the gate
    turns += [("c3", 0, "user", "hi"), ("c3", 1, "assistant", "short")]
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([t[0] for t in turns], pa.string()),
        "turn_idx": pa.array([t[1] for t in turns], pa.int32()),
        "role": pa.array([t[2] for t in turns], pa.string()),
        "text": pa.array([t[3] for t in turns], pa.string()),
    })).repartition(3)
    out = sft_dataset(ds, min_response_chars=30, max_prompt_chars=2000,
                      n_parts=4).take_all()
    assert len(out) == 1
    r = out[0]
    assert r["conv_id"] == "c1" and r["response"] == long_resp
    assert r["prompt"] == "user: hello"
    assert 0 <= r["shard"] < 8


def test_dpo_pairs_cyclic_negative():
    import pyarrow as pa
    import ray.data as rd

    from trustfuse_ray.pipelines.curate import dpo_pairs

    turns = []
    for cid, resp in (("c1", "r1"), ("c2", "r2"), ("c3", "r3")):
        turns += [(cid, 0, "user", "q"), (cid, 1, "assistant", resp)]
    turns += [("c4", 0, "user", "q"), ("c4", 3, "assistant", "solo")]
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([t[0] for t in turns], pa.string()),
        "turn_idx": pa.array([t[1] for t in turns], pa.int32()),
        "role": pa.array([t[2] for t in turns], pa.string()),
        "text": pa.array([t[3] for t in turns], pa.string()),
    })).repartition(3)
    out = {r["conv_id"]: (r["chosen"], r["rejected"])
           for r in dpo_pairs(ds, n_parts=4).take_all()}
    # cyclic shift at turn 1; c4's position-3 singleton is dropped
    assert out == {"c1": ("r1", "r2"), "c2": ("r2", "r3"),
                   "c3": ("r3", "r1")}
