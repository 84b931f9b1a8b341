"""Flagship end-to-end KG-construction pipeline (north star):

read transcripts → triple extraction (actor pool) → entity linking +
canonicalization (actor pool, broadcast alias index) → fusion (conflict
resolution per canonical entity via the single packed-fact shuffle) →
fused triple Parquet with per-partition lineage.

Reference lifecycle analog: `/root/reference/fusion_pipeline.py:30-109`
re-targeted from Wikidata revisions to conversation transcripts
(SURVEY.md §3.3).
"""

from __future__ import annotations

import json
import os

import ray.data

from trustfuse_ray import synth
from trustfuse_ray.fuse import make_model, run_fusion
from trustfuse_ray.stages.extract import extract_triples
from trustfuse_ray.stages.link import link_and_canonicalize


def read_transcripts(data_dir: str):
    """Parquet transcripts reader; one file per conv-hash partition.

    Read tasks run at 0.25 CPU: the downstream extract/link actor pool
    reserves most of the cluster, and full-CPU read tasks would serialize
    behind it (reads are I/O-bound decode, not compute).

    Block count is pinned to max(files, 2×CPUs) instead of Ray's auto-split
    (~6×CPUs): every downstream all-to-all (the pack shuffle) pays
    O(map_blocks × reduce_blocks) scheduling/transfer overhead, so fewer,
    larger blocks win as long as per-CPU parallelism is preserved."""
    path = os.path.join(data_dir, "transcripts")
    n_files = len([f for f in os.listdir(path) if f.endswith(".parquet")])
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return ray.data.read_parquet(
        path, ray_remote_args={"num_cpus": 0.25},
        override_num_blocks=max(n_files, 2 * cpus))


def build_claims(data_dir: str, concurrency: int | tuple | None = None):
    """transcripts → canonical long claim table (fused extract+link stage)."""
    from trustfuse_ray.stages.link import extract_link_canonicalize

    with open(os.path.join(data_dir, "attr_types.json")) as fh:
        attr_types = json.load(fh)
    transcripts = read_transcripts(data_dir)
    return extract_link_canonicalize(
        transcripts, os.path.join(data_dir, "aliases.parquet"), attr_types,
        concurrency=concurrency)


def bundle_files(files: list[str], target_bytes: int) -> list[list[str]]:
    """Group sorted input files into partition bundles of ~``target_bytes``
    each (greedy fill, order-preserving).  At 10⁵ input files a per-file
    partition grain means 10⁵ pipeline launches and 10⁵ manifests; bundling
    to ~256 MB–1 GB keeps the resumable unit a few seconds-to-minutes of
    work while the bundle's internal read still parallelizes via Parquet
    row-group blocks."""
    bundles: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for f in files:
        cur.append(f)
        cur_bytes += os.stat(f).st_size
        if cur_bytes >= target_bytes:
            bundles.append(cur)
            cur, cur_bytes = [], 0
    if cur:
        bundles.append(cur)
    return bundles


def run_kg_pipeline_resumable(data_dir: str, out_dir: str, model: str = "CRH",
                              concurrency: int | tuple | None = None,
                              max_partitions: int | None = None,
                              resolve: bool = False,
                              bundle_bytes: int = 256 * 1024 * 1024,
                              **model_kwargs) -> dict:
    """Checkpointed flagship pipeline.

    Stage A (embarrassingly parallel per input BUNDLE — a group of
    transcript files totalling ~``bundle_bytes``): extract + link →
    ``out_dir/claims/part={p}`` + manifest.  A resumed run skips bundles
    whose manifest is complete for the same input files (manifests are
    checked in parallel — a serial scan is itself a bottleneck at 10⁵
    partitions).  ``max_partitions`` lets tests simulate a mid-run kill;
    ``bundle_bytes=1`` degenerates to one file per bundle.

    Stage B (global): fusion over all completed claim partitions →
    ``out_dir/triples`` + manifest carrying triple counts + source weights
    (weights are global across partitions, as in the reference).
    Returns a summary dict.
    """
    import glob
    import time as _time

    from trustfuse_ray.state import checkpoint as ckpt

    from concurrent.futures import ThreadPoolExecutor

    from trustfuse_ray.stages.link import extract_link_canonicalize

    with open(os.path.join(data_dir, "attr_types.json")) as fh:
        attr_types = json.load(fh)
    alias_path = os.path.join(data_dir, "aliases.parquet")
    files = sorted(glob.glob(os.path.join(data_dir, "transcripts",
                                          "*.parquet")))
    bundles = bundle_files(files, bundle_bytes)
    claims_root = os.path.join(out_dir, "claims")

    def _bundle_fp(bundle: list[str]) -> str:
        return "|".join(ckpt.file_fingerprint(f) for f in bundle)

    n_check = len(bundles) if max_partitions is None \
        else min(max_partitions, len(bundles))
    with ThreadPoolExecutor(max_workers=16) as pool:
        fps = list(pool.map(_bundle_fp, bundles[:n_check]))
        complete = list(pool.map(
            lambda a: ckpt.is_complete(claims_root, a[0], a[1]),
            enumerate(fps)))
    done, skipped, pending = [], [], []
    for p in range(n_check):
        if complete[p]:
            skipped.append(p)
        else:
            pending.append((p, bundles[p], fps[p]))

    def _do_partition(job):
        p, bundle, fp = job
        t0 = _time.perf_counter()
        ds = ray.data.read_parquet(bundle)
        claims = extract_link_canonicalize(
            ds, alias_path, attr_types,
            concurrency=concurrency or (1, 4)).materialize()
        claims.write_parquet(ckpt.partition_dir(claims_root, p))
        ckpt.write_manifest(
            claims_root, p, fp, rows=claims.count(),
            wall_secs=_time.perf_counter() - t0,
            metrics={"input_files": [os.path.basename(f) for f in bundle]})
        return p

    # a few concurrent partition pipelines keep the cluster busy while
    # preserving per-partition manifests (each partition stays an
    # independently restartable unit)
    if pending:
        from trustfuse_ray.stages.common import ensure_fsspec_http_stub
        ensure_fsspec_http_stub()
        with ThreadPoolExecutor(max_workers=4) as pool:
            done = sorted(pool.map(_do_partition, pending))

    summary = {"claims_partitions_done": done,
               "claims_partitions_skipped": skipped,
               "total_partitions": len(bundles)}
    if max_partitions is not None and \
            len(done) + len(skipped) < len(bundles):
        summary["status"] = "partial"
        return summary

    triples_root = os.path.join(out_dir, "triples")
    all_fp = "|".join(ckpt.file_fingerprint(f) for f in files)
    if resolve:
        all_fp += "|resolved"  # flag change invalidates the fusion stage
    n_out = 16  # output key-range shards (resumable-output grain)
    if all(ckpt.is_complete(triples_root, s, all_fp)
           for s in range(n_out)):
        summary["status"] = "complete"
        summary["triples_skipped"] = True
        return summary
    t0 = _time.perf_counter()
    # directory read; the _manifests/ sidecar is ignored (underscore prefix)
    claims_all = ray.data.read_parquet(claims_root)
    if resolve:
        claims_all = apply_entity_resolution(claims_all)
    triples, weights = run_fusion(claims_all,
                                  make_model(model, **model_kwargs))

    # hash-partitioned output: one directory per entity key range, so a
    # downstream consumer (or a re-run after a partial write) addresses
    # shards independently — never one giant file
    from trustfuse_ray.stages.common import fnv64

    def _shard(batch):
        import pyarrow as _pa

        sh = [fnv64(e or "") % n_out
              for e in batch["entity"].to_pylist()]
        return batch.append_column("shard", _pa.array(sh, _pa.int32()))

    triples = triples.map_batches(_shard, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
    triples.write_parquet(triples_root, partition_cols=["shard"])
    shard_rows = {int(r["shard"]): int(r["count()"]) for r in
                  triples.groupby("shard").count().take_all()}
    wall = _time.perf_counter() - t0
    for sh in range(n_out):
        metrics = {"rows": shard_rows.get(sh, 0)}
        if sh == 0:
            metrics.update({
                "model": model,
                "source_weights": {str(b): w for b, w in weights.items()}})
        ckpt.write_manifest(
            triples_root, sh, all_fp, rows=shard_rows.get(sh, 0),
            wall_secs=wall, metrics=metrics,
            data_dir=os.path.join(triples_root, f"shard={sh}"))
    summary["status"] = "complete"
    summary["triples"] = triples.count()
    return summary


def apply_entity_resolution(claims, threshold: float = 0.9,
                            block_len: int = 4, cap: int = 500,
                            n_parts: int = 32):
    """Optional fuzzy-canonicalization step between linking and fusion:
    near-identical entity surface forms (`link.resolve_entities`) rewrite
    to their cluster's canonical entity so they vote together.

    Shape: a co-partitioned hash join — claims ⋈ mapping on ``entity``,
    ``entity ← coalesce(canon, entity)`` — over the same two-wave plasma
    exchange the CC/translate stages use.  The mapping stays a Dataset
    end-to-end (never ``take_all``'d to the driver, never broadcast): on a
    100-TB corpus with a hot dirty entity space the clustered vocabulary
    is itself huge, so both sides shuffle on ``hash(entity) % n_parts``
    and each partition task sees only its slice of the mapping.  The
    per-partition rewrite is vectorized (``pc.index_in`` + ``pc.take`` +
    ``pc.if_else``), not a Python dict probe per row."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from trustfuse_ray.stages.common import _add_part, plasma_exchange
    from trustfuse_ray.stages.link import resolve_entities

    mapping = resolve_entities(claims, threshold=threshold,
                               block_len=block_len, cap=cap,
                               n_parts=n_parts)
    claims = claims.materialize()
    sch = claims.schema()
    base = pa.schema(list(zip(sch.names, sch.types)))
    # shared exchange schema: claim columns + nullable __canon + __part.
    # Mapping rows carry (entity, __canon) with the other claim columns
    # null; claim rows carry __canon=null — validity of __canon is the
    # side tag inside a partition (canon is never null by construction).
    union = base.append(pa.field("__canon", pa.string())).append(
        pa.field("__part", pa.int32()))

    def _claim_side(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "__canon", pa.nulls(len(batch), pa.string()))
        return _add_part(batch, keys=["entity"], n_parts=n_parts)

    def _map_side(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {}
        for f in base:
            cols[f.name] = (batch["entity"].cast(pa.string())
                            if f.name == "entity" else pa.nulls(n, f.type))
        t = pa.table(cols).append_column(
            "__canon", batch["canon"].cast(pa.string()))
        return _add_part(t, keys=["entity"], n_parts=n_parts)

    def _join(tbl: pa.Table) -> pa.Table:
        is_map = pc.is_valid(tbl["__canon"])
        crows = tbl.filter(pc.invert(is_map))
        mrows = tbl.filter(is_map)
        out = crows
        if len(mrows) and len(crows):
            idx = pc.index_in(crows["entity"],
                              value_set=mrows["entity"].combine_chunks())
            canon = pc.take(mrows["__canon"].combine_chunks(), idx)
            ent = pc.if_else(pc.is_valid(canon), canon,
                             crows["entity"]).cast(pa.string())
            i = crows.schema.get_field_index("entity")
            out = crows.set_column(i, "entity", ent)
        return out.drop_columns(["__canon"])

    cside = claims.map_batches(_claim_side, batch_format="pyarrow",
                               zero_copy_batch=True)
    mside = mapping.map_batches(_map_side, batch_format="pyarrow",
                                zero_copy_batch=True)
    return plasma_exchange([cside, mside], _join, n_parts,
                           part_col="__part", empty_schema=union)


def run_kg_pipeline(sf_dir: str, model: str = "CRH", out_dir: str | None = None,
                    concurrency: int | tuple | None = None,
                    resolve: bool = False, **model_kwargs):
    """Full pipeline over the synthetic corpus for ``sf_dir``.

    ``resolve=True`` inserts the fuzzy entity-resolution step between
    linking and fusion.  Returns (triples Dataset, weights dict). If
    ``out_dir`` is given the triples are written as Parquet with a
    source-weights sidecar.
    """
    data_dir = synth.generate(sf_dir)
    claims = build_claims(data_dir, concurrency=concurrency)
    if resolve:
        claims = apply_entity_resolution(claims)
    triples, weights = run_fusion(claims, make_model(model, **model_kwargs))
    if out_dir:
        triples = triples.materialize()
        triples.write_parquet(os.path.join(out_dir, "triples"))
        with open(os.path.join(out_dir, "source_weights.json"), "w") as fh:
            json.dump({str(b): w for b, w in weights.items()}, fh, indent=1)
    return triples, weights
