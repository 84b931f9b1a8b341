"""Per-conversation turn reassembly.

North-rule requirement: ``groupby(conv_id)`` with explicit sort on
``turn_idx``, preserving the per-turn text-equality invariant (the input
files store turns shuffled within a conversation).  Reference analog: the
global timestamp sort before bucketization
(`/root/reference/dataset_generation/generate_buckets.py:156-157`) — here the
sort is *per conversation inside its group task*, never a global sort.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


class TurnOrderError(ValueError):
    pass


def _reassemble_group(batch: pa.Table) -> pa.Table:
    order = pc.sort_indices(batch, sort_keys=[("turn_idx", "ascending")])
    batch = batch.take(order)
    conv_id = batch["conv_id"][0].as_py()
    idx = batch["turn_idx"].to_pylist()
    if len(set(idx)) != len(idx):
        raise TurnOrderError(f"duplicate turn_idx in {conv_id}")
    texts = batch["text"].to_pylist()
    if any(t is None for t in texts):
        raise TurnOrderError(f"null turn text in {conv_id}")
    transcript = "\n".join(texts)
    # per-turn text-equality fingerprint: hash over (turn_idx, text) in order
    h = hashlib.sha256()
    for i, t in zip(idx, texts):
        h.update(str(i).encode())
        h.update(b"\x00")
        h.update(t.encode())
        h.update(b"\x01")
    return pa.table(
        {
            "conv_id": pa.array([conv_id], pa.string()),
            "n_turns": pa.array([len(idx)], pa.int32()),
            "first_ts": pa.array([batch["ts"][0].as_py()], pa.timestamp("us")),
            "last_ts": pa.array([batch["ts"][-1].as_py()], pa.timestamp("us")),
            "transcript": pa.array([transcript], pa.string()),
            "turn_fingerprint": pa.array([h.hexdigest()], pa.string()),
        }
    )


def assemble_conversations(transcripts):
    """transcripts Dataset → one row per conversation, turn order restored.

    The shuffle key is ``conv_id``; conversations are small (≤ dozens of
    turns) so per-group work is trivial and skew-free.
    """
    return transcripts.groupby("conv_id").map_groups(
        _reassemble_group, batch_format="pyarrow"
    )


def turn_fingerprints(transcripts):
    """Order-insensitive per-conversation fingerprint computed WITHOUT the
    shuffle (vectorized xor-of-row-hashes inside map_batches) — used by tests
    to verify the reassembly path did not mutate any turn text."""

    def _batch(batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_pylist()
        idx = batch["turn_idx"].to_pylist()
        txt = batch["text"].to_pylist()
        out_c, out_h = [], []
        for c, i, t in zip(conv, idx, txt):
            d = hashlib.sha256(f"{i}\x00{t}".encode()).digest()[:8]
            out_c.append(c)
            out_h.append(int.from_bytes(d, "big") & 0x7FFFFFFFFFFFFFFF)
        return pa.table({"conv_id": pa.array(out_c, pa.string()),
                         "h": pa.array(out_h, pa.int64())})

    per_turn = transcripts.map_batches(_batch, batch_format="pyarrow")
    return per_turn.groupby("conv_id").sum("h")


def conversation_profile(transcripts, n_parts: int = 32):
    """Per-conversation structural profile: turn count, distinct roles,
    tool-call turns (non-empty ``tool``), max turn index and the
    timestamp span in microseconds — the corpus-health stats a transcript
    ingestion pipeline reports per partition.

    Shape: the text column is dropped in the first projection (only turn
    metadata moves); ONE hash exchange on conv_id; stats reduce
    vectorized inside the group."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _meta(batch: pa.Table) -> pa.Table:
        return batch.select(["conv_id", "turn_idx", "role", "tool", "ts"])

    def _prof(group: pa.Table) -> pa.Table:
        roles = group["role"].to_pylist()
        tools = group["tool"].to_pylist()
        tix = np.asarray(group["turn_idx"], dtype=np.int64)
        ts = np.asarray(group["ts"].cast(pa.int64()), dtype=np.int64)
        return pa.table({
            "conv_id": group["conv_id"][:1],
            "n_turns": pa.array([len(group)], pa.int64()),
            "n_roles": pa.array([len(set(roles))], pa.int64()),
            "n_tool_turns": pa.array(
                [sum(1 for t in tools if t)], pa.int64()),
            "max_turn_idx": pa.array([int(tix.max())], pa.int64()),
            "span_us": pa.array([int(ts.max() - ts.min())], pa.int64())})

    prof_schema = pa.schema([
        ("conv_id", pa.string()), ("n_turns", pa.int64()),
        ("n_roles", pa.int64()), ("n_tool_turns", pa.int64()),
        ("max_turn_idx", pa.int64()), ("span_us", pa.int64())])
    return hash_group_apply(
        transcripts.map_batches(_meta, batch_format="pyarrow",
                                zero_copy_batch=True),
        ["conv_id"], _prof, n_parts=n_parts, plasma_schema=prof_schema)


def conversation_dedup(transcripts, n_parts: int = 32):
    """Conversation-level exact dedup: each conversation assembles in
    stable turn order (the per-turn text-equality invariant), fingerprints
    with md5, and duplicates keep the lexicographically smallest conv_id —
    document-level dedup lifted to the conversation grain (training
    corpora of transcripts dedup whole dialogues, not turns).

    Shape: full text NEVER enters an exchange — every turn collapses to
    a 32-char md5 map-side, the conv_id exchange carries only (conv_id,
    turn_idx, turn_md5) and folds them in turn order into the
    conversation fingerprint ``md5(join(turn_md5s))``, and the winner
    exchange carries (conv_id, fp) only.  Equally collision-free, ~10×
    less exchanged bytes than shipping the dialogue text.
    Returns (conv_id, fp, keep)."""
    import functools
    import hashlib

    import numpy as np

    from trustfuse_ray.stages.common import _add_part, plasma_exchange

    fp_schema = pa.schema([("conv_id", pa.string()), ("fp", pa.string())])
    out_schema = pa.schema([("conv_id", pa.string()), ("fp", pa.string()),
                            ("keep", pa.int64())])

    def _turn_hash(batch: pa.Table) -> pa.Table:
        th = [hashlib.md5((t or "").encode()).hexdigest()
              for t in batch["text"].to_pylist()]
        return pa.table({
            "conv_id": batch["conv_id"].cast(pa.string()),
            "turn_idx": batch["turn_idx"].cast(pa.int32()),
            "th": pa.array(th, pa.string())})

    hashed = transcripts.select_columns(
        ["conv_id", "turn_idx", "text"]).map_batches(
        _turn_hash, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        functools.partial(_add_part, keys=["conv_id"], n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    def _run_starts(col) -> tuple[np.ndarray, np.ndarray, int]:
        # boundaries of equal-value runs in an ALREADY-SORTED column
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes = pc.dictionary_encode(col).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        n = len(codes)
        new = np.empty(n, bool)
        new[0] = True
        new[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(new)
        return starts, np.append(starts[1:], n), n

    def _fp_part(tbl: pa.Table) -> pa.Table:
        # partition-level vectorized kernel: ONE sort per partition and a
        # run-boundary scan instead of a per-conversation table slice/sort
        # (the per-group route cost ~6 s at sf0.1 just in Python overhead
        # across 128k conversations)
        if len(tbl) == 0:
            return fp_schema.empty_table()
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        g = tbl.take(pc.sort_indices(
            tbl, sort_keys=[("conv_id", "ascending"),
                            ("turn_idx", "ascending")]))
        conv = g["conv_id"]
        if isinstance(conv, pa.ChunkedArray):
            conv = conv.combine_chunks()
        starts, ends, _ = _run_starts(conv)
        th = g["th"].to_pylist()
        fps = [hashlib.md5("\n".join(th[s:e]).encode()).hexdigest()
               for s, e in zip(starts, ends)]
        return pa.table({
            "conv_id": conv.take(pa.array(starts, pa.int64())),
            "fp": pa.array(fps, pa.string())})

    fps = plasma_exchange([hashed], _fp_part, n_parts, part_col="__part",
                          empty_schema=pa.schema(
                              [("conv_id", pa.string()),
                               ("turn_idx", pa.int32()),
                               ("th", pa.string()),
                               ("__part", pa.int32())]))

    keyed = fps.map_batches(
        functools.partial(_add_part, keys=["fp"], n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    def _keep_part(tbl: pa.Table) -> pa.Table:
        # sorted by (fp, conv_id): the first row of each fp run is the
        # lexicographically-smallest conv_id, i.e. the winner
        if len(tbl) == 0:
            return out_schema.empty_table()
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        g = tbl.take(pc.sort_indices(
            tbl, sort_keys=[("fp", "ascending"), ("conv_id", "ascending")]))
        fp = g["fp"]
        if isinstance(fp, pa.ChunkedArray):
            fp = fp.combine_chunks()
        starts, _, n = _run_starts(fp)
        keep = np.zeros(n, np.int64)
        keep[starts] = 1
        return pa.table({"conv_id": g["conv_id"], "fp": fp,
                         "keep": pa.array(keep, pa.int64())})

    return plasma_exchange([keyed], _keep_part, n_parts, part_col="__part",
                           empty_schema=pa.schema(
                               [("conv_id", pa.string()),
                                ("fp", pa.string()),
                                ("__part", pa.int32())]))


def assembled_conv_docs(transcripts, n_parts: int = 32):
    """Conversations as documents: turn-ordered assembled text keyed by
    the numeric conv id — the input shape the document-grain dedup/
    similarity operators expect (``doc_id``, ``text``)."""
    from trustfuse_ray.stages.common import hash_group_apply

    def _asm(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group,
                                sort_keys=[("turn_idx", "ascending")])
        g = group.take(order)
        txt = "\n".join(t or "" for t in g["text"].to_pylist())
        cid = g["conv_id"][0].as_py() or ""
        did = int("".join(ch for ch in cid if ch.isdigit()) or 0)
        return pa.table({"doc_id": pa.array([did], pa.int64()),
                         "text": pa.array([txt], pa.string())})

    return hash_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "text"]),
        ["conv_id"], _asm, n_parts=n_parts,
        plasma_schema=pa.schema([("doc_id", pa.int64()),
                                 ("text", pa.string())]))


SFT_PAIR_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("prompt", pa.string()), ("response", pa.string()),
    ("n_context_turns", pa.int64()), ("prompt_chars", pa.int64()),
    ("response_chars", pa.int64())])


def _sft_pairs_group(group: pa.Table) -> pa.Table:
    """One conversation's turns → its (prompt, response) pairs; shared by
    :func:`sft_pairs` and the composed SFT dataset build."""
    order = pc.sort_indices(group, sort_keys=[("turn_idx", "ascending")])
    g = group.take(order)
    roles = g["role"].to_pylist()
    texts = g["text"].to_pylist()
    tix = g["turn_idx"].to_pylist()
    cid = g["conv_id"][0].as_py()
    out = {k: [] for k in ("turn_idx", "prompt", "response",
                           "n_context_turns")}
    parts: list[str] = []
    for i, (r, t) in enumerate(zip(roles, texts)):
        if r == "assistant" and parts:
            out["turn_idx"].append(tix[i])
            out["prompt"].append("\n".join(parts))
            out["response"].append(t or "")
            out["n_context_turns"].append(i)
        parts.append(f"{r}: {t or ''}")
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
        "n_context_turns": pa.array(out["n_context_turns"], pa.int64()),
        "prompt_chars": pc.utf8_length(prompts).cast(pa.int64()),
        "response_chars": pc.utf8_length(resps).cast(pa.int64())})


def sft_pairs(transcripts, n_parts: int = 32):
    """Supervised-fine-tuning pair assembly: for every assistant turn with
    at least one preceding turn, emit (prompt = all prior turns rendered
    ``role: text`` joined by newline, response = the assistant turn's
    text) plus context/length stats — the transform that turns a raw
    transcript corpus into instruction-tuning examples.

    Shape: ONE conv_id hash exchange; the cumulative prompt is built
    inside the group with a single running join (conversations are ≤
    dozens of turns, so the per-group quadratic string growth is bounded
    and never crosses tasks).  The ``tool`` column is dropped before the
    exchange — only (conv_id, turn_idx, role, text) moves."""
    from trustfuse_ray.stages.common import hash_group_apply

    return hash_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "role", "text"]),
        ["conv_id"], _sft_pairs_group, n_parts=n_parts,
        plasma_schema=SFT_PAIR_SCHEMA)


def role_transitions(transcripts, n_parts: int = 32):
    """Turn-taking profile: counts of (role_from, role_to) transitions
    across consecutive turns within each conversation — the Markov
    dialogue-structure statistic (who follows whom) a transcript corpus
    reports before SFT-pair extraction.

    Shape: text is never read; one conv_id exchange of (conv_id,
    turn_idx, role); in-group sort + shifted zip, then a tiny
    (role_from, role_to) groupby."""
    from trustfuse_ray.stages.common import hash_group_apply

    def _pairs(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group,
                                sort_keys=[("turn_idx", "ascending")])
        # null roles normalize to "" (the role:tool convention) so pair
        # counting never drops null-keyed groups
        roles = [r or "" for r in group["role"].take(order).to_pylist()]
        if len(roles) < 2:
            return pa.schema([("role_from", pa.string()),
                              ("role_to", pa.string()),
                              ("n", pa.int64())]).empty_table()
        t = pa.table({"role_from": pa.array(roles[:-1], pa.string()),
                      "role_to": pa.array(roles[1:], pa.string())})
        return (t.group_by(["role_from", "role_to"])
                .aggregate([("role_to", "count")])
                .rename_columns(["role_from", "role_to", "n"]))

    partials = hash_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "role"]),
        ["conv_id"], _pairs, n_parts=n_parts,
        plasma_schema=pa.schema([("role_from", pa.string()),
                                 ("role_to", pa.string()),
                                 ("n", pa.int64())]))
    return (partials.groupby(["role_from", "role_to"]).sum("n")
            .rename_columns({"sum(n)": "n"}))


def response_boilerplate(transcripts, min_repeats: int = 2,
                         n_parts: int = 32):
    """Boilerplate-completion audit over the SFT pair stream: assistant
    responses whose exact text recurs across ≥ ``min_repeats`` examples
    (templated answers — a label-noise signal for instruction tuning).
    Returns (response_fp, n_pairs, n_convs) per recurring response.

    Shape: pairs assemble in the conv_id exchange (:func:`sft_pairs`);
    responses collapse to md5 fingerprints map-side, so the audit
    exchange carries (fp, conv_id) only — never response text."""
    import hashlib

    from trustfuse_ray.stages.common import hash_group_apply

    pairs = sft_pairs(transcripts, n_parts=n_parts)

    def _fp(batch: pa.Table) -> pa.Table:
        fps = [hashlib.md5((t or "").encode()).hexdigest()
               for t in batch["response"].to_pylist()]
        return pa.table({"response_fp": pa.array(fps, pa.string()),
                         "conv_id": batch["conv_id"]})

    def _audit(group: pa.Table) -> pa.Table:
        n = len(group)
        empty = pa.schema([("response_fp", pa.string()),
                           ("n_pairs", pa.int64()),
                           ("n_convs", pa.int64())]).empty_table()
        if n < min_repeats:
            return empty
        convs = set(group["conv_id"].to_pylist())
        return pa.table({
            "response_fp": group["response_fp"][:1],
            "n_pairs": pa.array([n], pa.int64()),
            "n_convs": pa.array([len(convs)], pa.int64())})

    return hash_group_apply(
        pairs.map_batches(_fp, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["response_fp"], _audit, n_parts=n_parts,
        plasma_schema=pa.schema([("response_fp", pa.string()),
                                 ("n_pairs", pa.int64()),
                                 ("n_convs", pa.int64())]))


def conv_lead_summary(transcripts, n_parts: int = 32):
    """Extractive conversation summarization (lead-sentence baseline):
    per conversation, the first sentence of the FIRST turn and of the
    LAST turn plus length stats — the deterministic extractive rule
    (lead-N) that anchors summarization-quality evals before any model
    runs.  A learned abstractive summarizer drops into the same
    actor-pool slot; this baseline is exactly SQL-replayable.

    Sentence rule: text up to and including the first '.', or the whole
    turn if it has none.  One conv_id exchange; only first/last turns'
    text leaves the group."""
    from trustfuse_ray.stages.common import hash_group_apply

    def _first_sentence(t: str) -> str:
        i = t.find(".")
        return t[:i + 1] if i >= 0 else t

    def _summ(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group,
                                sort_keys=[("turn_idx", "ascending")])
        g = group.take(order)
        texts = [t or "" for t in g["text"].to_pylist()]
        return pa.table({
            "conv_id": g["conv_id"][:1],
            "n_turns": pa.array([len(texts)], pa.int64()),
            "lead": pa.array([_first_sentence(texts[0])], pa.string()),
            "tail_lead": pa.array([_first_sentence(texts[-1])],
                                  pa.string()),
            "total_chars": pa.array([sum(len(t) for t in texts)],
                                    pa.int64())})

    return hash_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "text"]),
        ["conv_id"], _summ, n_parts=n_parts,
        plasma_schema=pa.schema([("conv_id", pa.string()),
                                 ("n_turns", pa.int64()),
                                 ("lead", pa.string()),
                                 ("tail_lead", pa.string()),
                                 ("total_chars", pa.int64())]))


def assistant_latency(transcripts, n_parts: int = 32):
    """Assistant response-latency profile: for every assistant turn with
    a preceding user turn in its conversation, the elapsed time since
    the latest-timestamped preceding user turn, log2-bucketed
    (bucket = bit_length(seconds + 1)) and counted per tool — the
    support-ops latency histogram at exact integer precision.

    Shape: ONE conv_id exchange of (turn_idx, role, tool, ts); the
    last-user scan is a single ordered pass per conversation; the
    exchange out is the tiny (tool, bucket) count table."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _lat(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group,
                                sort_keys=[("turn_idx", "ascending")])
        g = group.take(order)
        roles = g["role"].to_pylist()
        tools = g["tool"].to_pylist()
        ts = np.asarray(g["ts"].cast(pa.int64()), dtype=np.int64)
        empty = pa.schema([("tool", pa.string()),
                           ("bucket", pa.int64()),
                           ("n", pa.int64())]).empty_table()
        out_tool, out_bucket = [], []
        last_user = None
        for r, t, tus in zip(roles, tools, ts):
            if r == "user":
                # max ts over preceding user turns (robust to
                # non-monotone clocks; the oracle's window-max rule)
                last_user = (int(tus) if last_user is None
                             else max(last_user, int(tus)))
            elif r == "assistant" and last_user is not None:
                secs = (int(tus) - last_user) // 1_000_000
                out_tool.append(t or "")
                out_bucket.append(int(secs + 1).bit_length())
        if not out_tool:
            return empty
        t = pa.table({"tool": pa.array(out_tool, pa.string()),
                      "bucket": pa.array(out_bucket, pa.int64())})
        return (t.group_by(["tool", "bucket"])
                .aggregate([("bucket", "count")])
                .rename_columns(["tool", "bucket", "n"]))

    partials = hash_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "role",
                                    "tool", "ts"]),
        ["conv_id"], _lat, n_parts=n_parts,
        plasma_schema=pa.schema([("tool", pa.string()),
                                 ("bucket", pa.int64()),
                                 ("n", pa.int64())]))
    return (partials.groupby(["tool", "bucket"]).sum("n")
            .rename_columns({"sum(n)": "n"}))


def conv_token_usage(transcripts, n_parts: int = 32):
    """Usage metering at conversation grain: whitespace-token counts per
    role (user / assistant / tool) plus turns — the per-dialogue cost
    report quota and billing pipelines aggregate.

    Shape: tokens count map-side per turn (text never shuffles); the
    conv rollup exchanges only (conv_id, role, n) partials."""
    import re

    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    def _counts(batch: pa.Table) -> pa.Table:
        toks = [len([w for w in re.split(r"\s+", (t or "").strip()) if w])
                for t in batch["text"].to_pylist()]
        return pa.table({
            "conv_id": batch["conv_id"],
            "role": batch["role"],
            "tok": pa.array(np.asarray(toks, dtype=np.int64))})

    def _roll(group: pa.Table) -> pa.Table:
        roles = [r or "" for r in group["role"].to_pylist()]
        toks = np.asarray(group["tok"], dtype=np.int64)
        by = {"user": 0, "assistant": 0, "tool": 0}
        for r, t in zip(roles, toks):
            if r in by:
                by[r] += int(t)
        return pa.table({
            "conv_id": group["conv_id"][:1],
            "n_turns": pa.array([len(roles)], pa.int64()),
            "user_tokens": pa.array([by["user"]], pa.int64()),
            "assistant_tokens": pa.array([by["assistant"]], pa.int64()),
            "tool_tokens": pa.array([by["tool"]], pa.int64())})

    return hash_group_apply(
        transcripts.select_columns(["conv_id", "role", "text"])
        .map_batches(_counts, batch_format="pyarrow",
                     zero_copy_batch=True),
        ["conv_id"], _roll, n_parts=n_parts,
        plasma_schema=pa.schema([("conv_id", pa.string()),
                                 ("n_turns", pa.int64()),
                                 ("user_tokens", pa.int64()),
                                 ("assistant_tokens", pa.int64()),
                                 ("tool_tokens", pa.int64())]))


def conv_tool_paths(transcripts, n_parts: int = 32):
    """Agent-trajectory profile: each conversation's ordered sequence of
    tool invocations (non-empty ``tool`` in turn order) as a path
    string, counted across the corpus — which tool chains actually run,
    the input to router/planner tuning.

    Shape: text never read; (conv_id, turn_idx, tool) exchanges once;
    path counts reduce in a tiny second groupby."""
    from trustfuse_ray.stages.common import hash_group_apply

    def _path(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group,
                                sort_keys=[("turn_idx", "ascending")])
        tools = [t for t in group["tool"].take(order).to_pylist() if t]
        if not tools:
            return pa.schema([("path", pa.string()),
                              ("n", pa.int64())]).empty_table()
        return pa.table({"path": pa.array(["->".join(tools)],
                                          pa.string()),
                         "n": pa.array([1], pa.int64())})

    partials = hash_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "tool"]),
        ["conv_id"], _path, n_parts=n_parts,
        plasma_schema=pa.schema([("path", pa.string()),
                                 ("n", pa.int64())]))
    return (partials.groupby("path").sum("n")
            .rename_columns({"sum(n)": "n_convs"}))


def tool_transitions(transcripts, n_parts: int = 32):
    """Router table for agent planning: (tool_from, tool_to) counts over
    consecutive tool invocations within a conversation (empty-tool turns
    skipped) — the first-order Markov model behind next-tool prediction.

    Shape: text never read; one conv_id exchange of (turn_idx, tool);
    in-group shifted zip over the non-empty tool sequence; tiny pair
    groupby."""
    from trustfuse_ray.stages.common import hash_group_apply

    def _pairs(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group,
                                sort_keys=[("turn_idx", "ascending")])
        tools = [t for t in group["tool"].take(order).to_pylist() if t]
        empty = pa.schema([("tool_from", pa.string()),
                           ("tool_to", pa.string()),
                           ("n", pa.int64())]).empty_table()
        if len(tools) < 2:
            return empty
        t = pa.table({"tool_from": pa.array(tools[:-1], pa.string()),
                      "tool_to": pa.array(tools[1:], pa.string())})
        return (t.group_by(["tool_from", "tool_to"])
                .aggregate([("tool_to", "count")])
                .rename_columns(["tool_from", "tool_to", "n"]))

    partials = hash_group_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "tool"]),
        ["conv_id"], _pairs, n_parts=n_parts,
        plasma_schema=pa.schema([("tool_from", pa.string()),
                                 ("tool_to", pa.string()),
                                 ("n", pa.int64())]))
    return (partials.groupby(["tool_from", "tool_to"]).sum("n")
            .rename_columns({"sum(n)": "n"}))


_REFUSAL_PAT = (r"(i can't|i cannot|i'm unable|i am unable|"
                r"cannot assist|can't help with)")
_HEDGE_PAT = r"(let me check|i will verify)"
_ASSERT_PAT = r"(here is what i found|that matches)"


def refusal_hedge_profile(transcripts):
    """Assistant response-style profile per tool: refusal, hedging and
    assertive lead-in phrase rates — the standard training-data safety /
    style gate (refusal filtering) plus corpus style telemetry.  One
    vectorized RE2 pass per class per batch (patterns compile once in
    Arrow), per-tool partial counts collapse map-side, one tiny exchange;
    text never shuffles."""

    def _partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        t = batch.filter(pc.equal(batch["role"], "assistant"))
        low = pc.utf8_lower(pc.cast(t["text"], pa.string()))
        tool = pc.fill_null(pc.cast(t["tool"], pa.string()), "")
        one = pa.scalar(1, pa.int64())
        zero = pa.scalar(0, pa.int64())
        g = pa.table({
            "tool": tool,
            "n_turns": pa.array(np.ones(len(t), np.int64)),
            "n_refusal": pc.if_else(
                pc.match_substring_regex(low, _REFUSAL_PAT), one, zero),
            "n_hedge": pc.if_else(
                pc.match_substring_regex(low, _HEDGE_PAT), one, zero),
            "n_assert": pc.if_else(
                pc.match_substring_regex(low, _ASSERT_PAT), one, zero)})
        return (pa.TableGroupBy(g, "tool", use_threads=False)
                .aggregate([("n_turns", "sum"), ("n_refusal", "sum"),
                            ("n_hedge", "sum"), ("n_assert", "sum")])
                .rename_columns(["tool", "n_turns", "n_refusal",
                                 "n_hedge", "n_assert"]))

    agg = (transcripts
           .map_batches(_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("tool")
           .sum(["n_turns", "n_refusal", "n_hedge", "n_assert"]))

    def _shape(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch["sum(n_turns)"], pa.int64())
        nr = pc.cast(batch["sum(n_refusal)"], pa.int64())
        nh = pc.cast(batch["sum(n_hedge)"], pa.int64())
        return pa.table({
            "tool": batch["tool"],
            "n_turns": n,
            "n_refusal": nr,
            "n_hedge": nh,
            "n_assert": pc.cast(batch["sum(n_assert)"], pa.int64()),
            "refusal_rate": pc.divide(pc.cast(nr, pa.float64()),
                                      pc.cast(n, pa.float64())),
            "hedge_rate": pc.divide(pc.cast(nh, pa.float64()),
                                    pc.cast(n, pa.float64()))})

    return agg.map_batches(_shape, batch_format="pyarrow",
                           zero_copy_batch=True)
