"""Composed document-curation pipeline: signals → quality filter → exact
dedup → sequence packing, as ONE streaming Dataset program.

The 100-TB shape: the text column is read once, reduced to per-doc
signals + a fingerprint inside the first ``map_batches``, and NEVER enters
a shuffle — the dedup exchange moves (doc_id, source, fp, n_tokens) rows
(~60 B each) and the pack exchange moves (doc_id, source, n_tokens).  The
final training-data writer would semi-join the surviving doc_ids back
against the columnar corpus at rest (partition-pruned), which is the
standard keep-list emit for curation pipelines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from trustfuse_ray.stages.common import hash_group_apply
from trustfuse_ray.stages.curation import (_tokens_flat,
                                           dup_trigram_counts,
                                           pack_counted)
from trustfuse_ray.stages.text import canonical_text

import hashlib


def _signals_filter(batch: pa.Table, *, max_dup_frac: float,
                    text_col: str, id_col: str) -> pa.Table:
    """One pass over the batch: tokenize once, compute token count +
    duplicate-trigram fraction + md5 fingerprint, drop failing docs, and
    drop the text column before anything shuffles."""
    n = len(batch)
    docix, code = _tokens_flat(batch[text_col])
    n_tokens = np.bincount(docix, minlength=n).astype(np.int64)

    # shared Gopher dup-trigram kernel (curation.dup_trigram_counts) so
    # q_doc_repetition and this filter can never drift apart
    dup_trigram_n = dup_trigram_counts(docix, code, n)
    n_tri = np.maximum(n_tokens - 2, 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        dup_frac = np.where(n_tri > 0, dup_trigram_n / n_tri, 0.0)

    canon = canonical_text(batch[text_col]).to_pylist()
    fps = [hashlib.md5((t or "").encode()).hexdigest() for t in canon]

    keep = pa.array(dup_frac <= max_dup_frac)
    out = pa.table({
        id_col: batch[id_col],
        "source": batch["source"],
        "fp": pa.array(fps, pa.string()),
        "n_tokens": pa.array(n_tokens, pa.int64()),
    })
    return out.filter(keep)


def _first_by_id(group: pa.Table, *, id_col: str) -> pa.Table:
    order = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
    return group.take(order[:1])


def curate_documents(docs, cap: int = 512, max_dup_frac: float = 0.5,
                     text_col: str = "text", id_col: str = "doc_id",
                     n_parts: int = 32):
    """documents → packed training sequences (source, doc_id, n_tokens,
    seq_id, seq_pos).  Stages: per-batch signals+filter (text dropped),
    exact dedup (min doc_id per fingerprint), greedy 512-token packing per
    source.  Two small-row shuffles total."""
    sig = docs.select_columns([id_col, "source", text_col]).map_batches(
        lambda b: _signals_filter(b, max_dup_frac=max_dup_frac,
                                  text_col=text_col, id_col=id_col),
        batch_format="pyarrow", zero_copy_batch=True)
    import functools

    deduped = hash_group_apply(
        sig, ["fp"], functools.partial(_first_by_id, id_col=id_col),
        n_parts=n_parts,
        plasma_schema=pa.schema([(id_col, pa.int64()),
                                 ("source", pa.string()),
                                 ("fp", pa.string()),
                                 ("n_tokens", pa.int64())]))
    return pack_counted(deduped.drop_columns(["fp"]), cap=cap,
                        id_col=id_col, n_parts=n_parts)


def _split_cut_group(group: pa.Table, *, id_col: str,
                     frac_train: float) -> pa.Table:
    """Per-source md5-ranked cut: keep the first floor(frac·n) docs
    (shared ranking rule: curation.md5_rank_sorted)."""
    from trustfuse_ray.stages.curation import md5_rank_sorted

    g = md5_rank_sorted(group, id_col)
    n_train = int(np.floor(frac_train * len(g)))
    return g.slice(0, n_train)


def _shard_rank_group(group: pa.Table, *, id_col: str) -> pa.Table:
    from trustfuse_ray.stages.curation import md5_rank_sorted

    g = md5_rank_sorted(group, id_col)
    return g.append_column(
        "pos", pa.array(np.arange(len(g), dtype=np.int64)))


def _pretrain_finalize(sig, frac_train: float, n_shards: int,
                       id_col: str, n_parts: int):
    """Post-signals stages shared by the streaming and the checkpointed
    pretraining pipelines: exact dedup (min doc_id per fingerprint) →
    deterministic md5-ranked train cut per source → shard assignment with
    in-shard rank.  Three small-row exchanges; text never enters."""
    import functools

    from trustfuse_ray.stages.dedup import _md5_token64

    row_schema = pa.schema([(id_col, pa.int64()), ("source", pa.string()),
                            ("fp", pa.string()), ("n_tokens", pa.int64())])
    deduped = hash_group_apply(
        sig, ["fp"], functools.partial(_first_by_id, id_col=id_col),
        n_parts=n_parts, plasma_schema=row_schema).drop_columns(["fp"])
    cut_schema = pa.schema([(id_col, pa.int64()), ("source", pa.string()),
                            ("n_tokens", pa.int64())])
    train = hash_group_apply(
        deduped, ["source"],
        functools.partial(_split_cut_group, id_col=id_col,
                          frac_train=frac_train),
        n_parts=n_parts, plasma_schema=cut_schema)

    def _shard_key(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.string()).to_pylist()
        h = np.fromiter((_md5_token64(s or "") for s in ids),
                        dtype=np.uint64, count=len(ids))
        return batch.append_column(
            "shard", pa.array((h % n_shards).astype(np.int64), pa.int64()))

    keyed = train.map_batches(_shard_key, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema([(id_col, pa.int64()), ("source", pa.string()),
                            ("n_tokens", pa.int64()),
                            ("shard", pa.int64()), ("pos", pa.int64())])
    return hash_group_apply(
        keyed, ["shard"],
        functools.partial(_shard_rank_group, id_col=id_col),
        n_parts=n_parts, plasma_schema=out_schema)


def pretrain_dataset(docs, frac_train: float = 0.8, n_shards: int = 8,
                     max_dup_frac: float = 0.5, text_col: str = "text",
                     id_col: str = "doc_id", n_parts: int = 32):
    """End-to-end pretraining-set construction as ONE streaming program:
    per-batch quality signals + filter (text dropped immediately) → exact
    dedup → md5-ranked train cut per source → shard assignment with
    in-shard rank.  Output (doc_id, source, n_tokens, shard, pos) is the
    keep-list a writer semi-joins against the corpus at rest."""
    sig = docs.select_columns([id_col, "source", text_col]).map_batches(
        lambda b: _signals_filter(b, max_dup_frac=max_dup_frac,
                                  text_col=text_col, id_col=id_col),
        batch_format="pyarrow", zero_copy_batch=True)
    return _pretrain_finalize(sig, frac_train, n_shards, id_col, n_parts)


def pretrain_dataset_resumable(docs_files, out_dir: str,
                               frac_train: float = 0.8, n_shards: int = 8,
                               max_dup_frac: float = 0.5,
                               text_col: str = "text",
                               id_col: str = "doc_id", n_parts: int = 32,
                               max_partitions: int | None = None) -> dict:
    """Checkpointed pretraining-set construction with per-partition
    lineage (mirrors ``run_kg_pipeline_resumable``).

    Stage A — embarrassingly parallel per input shard, independently
    restartable: signals + quality filter (text dropped inside the first
    ``map_batches``) → ``out_dir/signals/part={p}`` + manifest keyed on
    the input file's fingerprint.  A resumed run skips partitions whose
    manifest matches the same input bytes.

    Stage B — global over all completed signal partitions: exact dedup →
    train cut → shard + rank, then ONE materialize of the small keep-list
    and a per-output-shard write ``out_dir/pretrain/part={shard}`` with a
    manifest per shard carrying rows + token totals (the resumable-output
    lineage).  Keyed on the combined input fingerprint, so a complete
    final write is a no-op on re-run and any input change recomputes.

    At 100 TB the signal rows are ~60 B/doc — Stage B's exchanges and the
    keep-list materialize stay ~1e-5 of corpus bytes.
    """
    import glob
    import os
    import time as _time

    import ray
    import ray.data

    from trustfuse_ray.state import checkpoint as ckpt

    if isinstance(docs_files, str):
        docs_files = sorted(glob.glob(os.path.join(docs_files, "*.parquet")))
    sig_root = os.path.join(out_dir, "signals")
    done, skipped, pending = [], [], []
    for p, f in enumerate(docs_files):
        if max_partitions is not None and len(done) + len(skipped) \
                + len(pending) >= max_partitions:
            break
        fp = ckpt.file_fingerprint(f)
        if ckpt.is_complete(sig_root, p, fp):
            skipped.append(p)
        else:
            pending.append((p, f, fp))

    for p, f, fp in pending:
        t0 = _time.perf_counter()
        sig = ray.data.read_parquet(f) \
            .select_columns([id_col, "source", text_col]) \
            .map_batches(
                lambda b: _signals_filter(b, max_dup_frac=max_dup_frac,
                                          text_col=text_col, id_col=id_col),
                batch_format="pyarrow", zero_copy_batch=True).materialize()
        sig.write_parquet(ckpt.partition_dir(sig_root, p))
        ckpt.write_manifest(sig_root, p, fp, rows=sig.count(),
                            wall_secs=_time.perf_counter() - t0,
                            metrics={"input_file": os.path.basename(f)})
        done.append(p)

    summary = {"signals_partitions_done": sorted(done),
               "signals_partitions_skipped": sorted(skipped),
               "total_partitions": len(docs_files)}
    if max_partitions is not None \
            and len(done) + len(skipped) < len(docs_files):
        summary["status"] = "partial"
        return summary

    out_root = os.path.join(out_dir, "pretrain")
    all_fp = "|".join(ckpt.file_fingerprint(f) for f in docs_files)
    if all(ckpt.is_complete(out_root, s, all_fp) for s in range(n_shards)):
        summary["status"] = "complete"
        summary["pretrain_skipped"] = True
        return summary
    t0 = _time.perf_counter()
    sig_all = ray.data.read_parquet(sig_root)  # _manifests/ ignored
    final = _pretrain_finalize(sig_all, frac_train, n_shards, id_col,
                               n_parts).materialize()
    import pyarrow.parquet as pq

    out_schema = pa.schema([(id_col, pa.int64()), ("source", pa.string()),
                            ("n_tokens", pa.int64()),
                            ("shard", pa.int64()), ("pos", pa.int64())])
    blocks = [t for t in ray.get(final.to_arrow_refs()) if t.num_rows]
    keep = (pa.concat_tables([t.select(out_schema.names) for t in blocks])
            if blocks else out_schema.empty_table())
    wall = _time.perf_counter() - t0
    for s in range(n_shards):
        part = keep.filter(pc.equal(keep["shard"], s))
        pdir = ckpt.partition_dir(out_root, s)
        os.makedirs(pdir, exist_ok=True)
        pq.write_table(part, os.path.join(pdir, "keep.parquet"))
        ckpt.write_manifest(
            out_root, s, all_fp, rows=len(part), wall_secs=wall,
            metrics={"tokens": int(pc.sum(part["n_tokens"]).as_py() or 0)})
    summary["status"] = "complete"
    summary["rows"] = len(keep)
    return summary


def sft_dataset(transcripts, min_response_chars: int = 30,
                max_prompt_chars: int = 2000, n_shards: int = 8,
                n_parts: int = 32):
    """Composed SFT dataset build — the transcript-corpus analog of
    :func:`pretrain_dataset`: conversation-grain exact dedup →
    instruction-pair assembly over SURVIVING conversations → length
    gates → deterministic shard assignment.

    Shape: the dedup winner list rejoins the turn stream through the
    SAME conv_id co-partition that assembles pairs (tagged union — one
    exchange does semi-join + assembly; the keep list is never a driver
    set); gates and shard ids are one streaming pass
    (md5_64 == DuckDB md5_number_lower, so the full build replays in
    SQL).  Returns SFT pairs + ``shard``."""
    from trustfuse_ray.stages.assemble import (SFT_PAIR_SCHEMA,
                                               conversation_dedup)
    from trustfuse_ray.stages.dedup import _md5_token64

    winners = (conversation_dedup(transcripts, n_parts=n_parts)
               .filter(expr="keep == 1").select_columns(["conv_id"]))

    def _tag_turns(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": batch["conv_id"].cast(pa.string()),
            "turn_idx": batch["turn_idx"].cast(pa.int32()),
            "role": batch["role"].cast(pa.string()),
            "text": batch["text"].cast(pa.string()),
            "side": pa.array(np.zeros(len(batch), np.int8))})

    def _tag_keep(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "conv_id": batch["conv_id"].cast(pa.string()),
            "turn_idx": pa.array(np.zeros(n, np.int32)),
            "role": pa.array([""] * n, pa.string()),
            "text": pa.array([""] * n, pa.string()),
            "side": pa.array(np.ones(n, np.int8))})

    tagged = transcripts.select_columns(
        ["conv_id", "turn_idx", "role", "text"]).map_batches(
        _tag_turns, batch_format="pyarrow", zero_copy_batch=True).union(
        winners.map_batches(_tag_keep, batch_format="pyarrow"))

    def _gated_pairs(group: pa.Table) -> pa.Table:
        side = group["side"]
        if pc.sum(side).as_py() == 0:  # no winner marker: deduped away
            return SFT_PAIR_SCHEMA.empty_table()
        turns = group.filter(pc.equal(side, 0))
        if len(turns) == 0:
            return SFT_PAIR_SCHEMA.empty_table()
        # gate INSIDE the group with a running length counter so an
        # over-budget prompt (quadratic in conversation length) is never
        # materialized — the wall-clock killer at sf0.1 was building
        # full-context strings destined for the length filter
        order = pc.sort_indices(turns,
                                sort_keys=[("turn_idx", "ascending")])
        g = turns.take(order)
        roles = g["role"].to_pylist()
        texts = g["text"].to_pylist()
        tix = g["turn_idx"].to_pylist()
        cid = g["conv_id"][0].as_py()
        out = {k: [] for k in ("turn_idx", "prompt", "response",
                               "n_context_turns")}
        parts: list[str] = []
        run_len = 0  # == len("\n".join(parts))
        for i, (r, t) in enumerate(zip(roles, texts)):
            if r == "assistant" and parts:
                resp = t or ""
                if (len(resp) >= min_response_chars
                        and run_len <= max_prompt_chars):
                    out["turn_idx"].append(tix[i])
                    out["prompt"].append("\n".join(parts))
                    out["response"].append(resp)
                    out["n_context_turns"].append(i)
            piece = f"{r}: {t or ''}"
            run_len += len(piece) + (1 if parts else 0)
            parts.append(piece)
        if not out["turn_idx"]:
            return SFT_PAIR_SCHEMA.empty_table()
        prompts = pa.array(out["prompt"], pa.string())
        resps = pa.array(out["response"], pa.string())
        n = len(out["turn_idx"])
        return pa.table({
            "conv_id": pa.array([cid] * n, pa.string()),
            "turn_idx": pa.array(out["turn_idx"], pa.int32()),
            "prompt": prompts,
            "response": resps,
            "n_context_turns": pa.array(out["n_context_turns"],
                                        pa.int64()),
            "prompt_chars": pc.utf8_length(prompts).cast(pa.int64()),
            "response_chars": pc.utf8_length(resps).cast(pa.int64())})

    pairs = hash_group_apply(tagged, ["conv_id"], _gated_pairs,
                             n_parts=n_parts,
                             plasma_schema=SFT_PAIR_SCHEMA)

    def _finalize(batch: pa.Table) -> pa.Table:
        shard = [_md5_token64(f"{c}#{i}") % n_shards
                 for c, i in zip(batch["conv_id"].to_pylist(),
                                 batch["turn_idx"].to_pylist())]
        return batch.append_column("shard", pa.array(shard, pa.int64()))

    return pairs.map_batches(_finalize, batch_format="pyarrow",
                             zero_copy_batch=True)


def dpo_pairs(transcripts, n_parts: int = 32):
    """Preference-pair construction (DPO-style): every SFT example
    becomes (prompt, chosen, rejected) where ``rejected`` is another
    conversation's assistant response at the SAME turn position — the
    deterministic cyclic-shift negative (next conv_id in order, wrapping)
    that gives each example a plausible-but-wrong completion without any
    RNG.  Positions with a single conversation are dropped (no distinct
    negative exists).

    Shape: pairs assemble in the conv_id exchange (:func:`sft_pairs`);
    the negative pick is ONE turn_idx co-partition with an in-group sort
    by conv_id and a cyclic shift.  turn_idx is a low-cardinality key —
    the in-group sort assumes one position's examples fit a task, the
    documented partitioning assumption (salt by prompt-hash ranges if a
    position outgrows it)."""
    from trustfuse_ray.stages.assemble import sft_pairs

    pairs = sft_pairs(transcripts, n_parts=n_parts)

    def _neg(group: pa.Table) -> pa.Table:
        empty = pa.schema([
            ("conv_id", pa.string()), ("turn_idx", pa.int32()),
            ("prompt", pa.string()), ("chosen", pa.string()),
            ("rejected", pa.string())]).empty_table()
        if len(group) < 2:
            return empty
        order = pc.sort_indices(group,
                                sort_keys=[("conv_id", "ascending")])
        g = group.take(order)
        resp = g["response"].to_pylist()
        rejected = resp[1:] + resp[:1]
        return pa.table({
            "conv_id": g["conv_id"],
            "turn_idx": g["turn_idx"],
            "prompt": g["prompt"],
            "chosen": g["response"],
            "rejected": pa.array(rejected, pa.string())})

    return hash_group_apply(
        pairs.select_columns(["conv_id", "turn_idx", "prompt",
                              "response"]),
        ["turn_idx"], _neg, n_parts=min(n_parts, 16),
        plasma_schema=pa.schema([
            ("conv_id", pa.string()), ("turn_idx", pa.int32()),
            ("prompt", pa.string()), ("chosen", pa.string()),
            ("rejected", pa.string())]))
