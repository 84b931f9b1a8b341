"""Triple extraction: transcript turns → candidate (mention, attr, raw_value).

Reference analog: the dataset-construction side of TrustFuse extracts typed
claims from Wikidata revision diffs
(`/root/reference/dataset_generation/generate_conflicting_dataset.py:233-441`,
``get_values``/``compare_revisions``).  In the transcript graft the extraction
source is the turn text; the rule table (compiled regexes) is per-worker state
loaded once per actor (north-star requirement: stateful extraction as
map_batches over zero-copy Arrow batches on actor pools).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from trustfuse_ray.synth import CLAIM_SENTENCE_RE


def _fnv_fold(h: int, s: str) -> int:
    """Extend an FNV-1a state ``h`` with the bytes of ``s`` (unmasked)."""
    for ch in s.encode():
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def fnv64(s: str) -> int:
    """Stable 63-bit FNV-1a hash (no PYTHONHASHSEED dependence)."""
    return _fnv_fold(0xCBF29CE484222325, s) & 0x7FFFFFFFFFFFFFFF


_SEQ_STRS = tuple(str(i) for i in range(256))


def fnv64_batch(arr) -> pa.Array:
    """Vectorized ``fnv64`` over a pyarrow string array.

    The FNV-1a left fold is re-expressed as ``maxlen`` masked numpy passes
    over a padded (n × maxlen) uint8 matrix — key strings here are ~20 bytes,
    so this is a handful of vectorized sweeps instead of a per-row Python
    byte loop.  uint64 arithmetic wraps mod 2**64 natively.  Bit-identical
    to the scalar ``fnv64`` (tested)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return pa.array([], pa.int64())
    offs = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset:arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    lens = offs[1:] - offs[:-1]
    maxlen = int(lens.max()) if n else 0
    col = np.arange(maxlen)
    valid = col[None, :] < lens[:, None]
    pos = offs[:-1, None] + col[None, :]
    padded = np.zeros((n, maxlen), np.uint8)
    padded[valid] = data[pos[valid]]
    h = np.full(n, 0xCBF29CE484222325, np.uint64)
    prime = np.uint64(0x100000001B3)
    for j in range(maxlen):
        m = valid[:, j]
        h[m] = (h[m] ^ padded[:, j][m].astype(np.uint64)) * prime
    return pa.array((h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64))


_VEC_GROUP_PATTERN = (
    r"The (?P<attr>[a-z_]+) of (?P<mention>[A-Za-z0-9_ ]+?)"
    r" is (?P<val>[A-Za-z0-9_, ]+?)$"
)


def _empty_mentions() -> pa.Table:
    return pa.table({
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
        "source": pa.array([], pa.string()),
        "mention": pa.array([], pa.string()),
        "attr": pa.array([], pa.string()),
        "raw_value": pa.array([], pa.string()),
        "claim_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
    })


class TripleExtractor:
    """Actor-pool batch extractor.

    ``__init__`` compiles the rule table once per actor; ``__call__`` runs per
    Arrow batch (zero-copy) and emits one output row per extracted claim.
    Rows whose text cannot contain a claim are pruned vectorized
    (``pc.match_substring_regex``) before the per-match Python loop.
    """

    def __init__(self, pattern: str = CLAIM_SENTENCE_RE,
                 claim_roles: tuple[str, ...] = ("assistant", "tool")):
        self.rx = re.compile(pattern)
        self.claim_roles = set(claim_roles)
        self.prefilter = pattern
        # The default claim grammar ("The <attr> of <mention> is <value>.")
        # admits a fully Arrow-vectorized plan: sentence-split on the literal
        # terminator, one RE2 extract over the flattened fragments, segmented
        # numpy for per-turn claim sequence numbers, and a batched FNV fold
        # for claim ids.  Custom rule patterns keep the generic findall loop.
        self.vectorized = pattern == CLAIM_SENTENCE_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.vectorized:
            return self._call_vectorized(batch)
        return self._call_loop(batch)

    def _call_vectorized(self, batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.match_substring_regex(batch["text"], self.prefilter),
            pc.is_in(batch["role"],
                     value_set=pa.array(sorted(self.claim_roles))))
        batch = batch.filter(mask)
        if len(batch) == 0:
            return _empty_mentions()
        text = batch["text"].combine_chunks()
        frags = pc.split_pattern(text, ".")
        counts = pc.list_value_length(frags).to_numpy().astype(np.int64)
        flat = pc.list_flatten(frags)
        row_idx = np.repeat(np.arange(len(batch)), counts)
        # a claim sentence must be TERMINATED by '.', so the fragment after
        # the last '.' (always emitted by split) can never match
        pos = np.arange(len(flat)) - np.repeat(
            np.concatenate([[0], np.cumsum(counts[:-1])]), counts)
        not_last = pos != np.repeat(counts - 1, counts)
        ext = pc.extract_regex(flat, _VEC_GROUP_PATTERN)
        ok = pc.is_valid(ext).to_numpy(zero_copy_only=False) & not_last
        hit = np.flatnonzero(ok)
        if len(hit) == 0:
            return _empty_mentions()
        hit_pa = pa.array(hit)
        ext_hit = ext.take(hit_pa)
        rows = row_idx[hit]
        rows_pa = pa.array(rows)
        # per-turn claim sequence: rows is sorted, so a segmented cumcount
        uniq, inv, cnts = np.unique(rows, return_inverse=True,
                                    return_counts=True)
        seg_starts = np.concatenate([[0], np.cumsum(cnts[:-1])])
        seq = np.arange(len(rows)) - seg_starts[inv]
        conv = batch["conv_id"].take(rows_pa)
        turn = batch["turn_idx"].take(rows_pa)
        keys = pc.binary_join_element_wise(
            conv, pc.cast(turn, pa.string()),
            pa.array(seq.astype("U"), pa.string()), "|")
        claim_id = fnv64_batch(keys)
        source = pc.binary_join_element_wise(
            batch["role"].take(rows_pa),
            pc.coalesce(batch["tool"].take(rows_pa), ""), ":")
        return pa.table({
            "conv_id": conv,
            "turn_idx": turn,
            "source": source,
            "mention": pc.struct_field(ext_hit, "mention"),
            "attr": pc.struct_field(ext_hit, "attr"),
            "raw_value": pc.struct_field(ext_hit, "val"),
            "claim_id": claim_id,
            "ts": batch["ts"].take(rows_pa).combine_chunks()
                  .cast(pa.timestamp("us")),
        })

    def _call_loop(self, batch: pa.Table) -> pa.Table:
        mask = pc.match_substring_regex(batch["text"], self.prefilter)
        batch = batch.filter(mask)
        conv = batch["conv_id"].to_pylist()
        turn = batch["turn_idx"].to_pylist()
        role = batch["role"].to_pylist()
        tool = batch["tool"].to_pylist()
        text = batch["text"].to_pylist()
        ts = batch["ts"].to_pylist()

        o_conv, o_turn, o_src, o_mention, o_attr, o_val, o_cid, o_ts = \
            [], [], [], [], [], [], [], []
        findall = self.rx.findall
        fold = _fnv_fold
        seq_strs = _SEQ_STRS
        for c, t, r, tl, tx, tstamp in zip(conv, turn, role, tool, text, ts):
            if r not in self.claim_roles:
                continue
            matches = findall(tx)
            if not matches:
                continue
            n = len(matches)
            # claim_id = fnv64(f"{c}|{t}|{seq}"): FNV-1a is a left fold, so
            # hash the shared "{c}|{t}|" prefix once per turn and extend
            # with each claim's seq digits only
            hp = fold(0xCBF29CE484222325, f"{c}|{t}|")
            attrs, mentions, raws = zip(*matches)
            o_attr.extend(attrs)
            o_mention.extend(mentions)
            o_val.extend(raws)
            o_conv.extend([c] * n)
            o_turn.extend([t] * n)
            o_src.extend([f"{r}:{tl or ''}"] * n)
            o_ts.extend([tstamp] * n)
            seqs = seq_strs[:n] if n <= len(seq_strs) else \
                [str(i) for i in range(n)]
            o_cid.extend((fold(hp, s) & 0x7FFFFFFFFFFFFFFF) for s in seqs)
        return pa.table(
            {
                "conv_id": pa.array(o_conv, pa.string()),
                "turn_idx": pa.array(o_turn, pa.int32()),
                "source": pa.array(o_src, pa.string()),
                "mention": pa.array(o_mention, pa.string()),
                "attr": pa.array(o_attr, pa.string()),
                "raw_value": pa.array(o_val, pa.string()),
                "claim_id": pa.array(o_cid, pa.int64()),
                "ts": pa.array(o_ts, pa.timestamp("us")),
            }
        )


def extract_triples(transcripts, concurrency: int | tuple | None = None,
                    batch_size: int = 2048):
    """transcripts Dataset → mentions Dataset (actor pool, Arrow batches)."""
    if concurrency is None:
        from trustfuse_ray.stages.common import auto_pool
        concurrency = auto_pool()
    return transcripts.map_batches(
        TripleExtractor,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def re_training_pairs(claims, transcripts, n_parts: int = 32):
    """Distant-supervision training pairs for relation extraction: every
    canonical claim joined back to its source turn's text →
    (text, relation, entity, value) examples — the labelled-sentence
    export an RE model trains on (the claim stream itself provides the
    distant labels).

    Shape: claims collapse map-side to distinct
    (conv_id, turn_idx, attr, entity, value_str); ONE (conv_id,
    turn_idx) co-partition attaches turn text (text moves once, only
    for turns that yielded claims)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from trustfuse_ray.stages.common import hash_group_apply

    def _cl(batch: pa.Table) -> pa.Table:
        keep = pc.is_valid(batch["value_str"])
        t = batch.filter(keep).select(
            ["conv_id", "turn_idx", "attr", "entity", "value_str"])
        t = t.group_by(
            ["conv_id", "turn_idx", "attr", "entity",
             "value_str"]).aggregate([])
        n = len(t)
        return pa.table({
            "conv_id": t["conv_id"].cast(pa.string()),
            "turn_idx": t["turn_idx"].cast(pa.int32()),
            "attr": t["attr"].cast(pa.string()),
            "entity": t["entity"].cast(pa.string()),
            "value_str": t["value_str"].cast(pa.string()),
            "text": pa.array([""] * n, pa.string()),
            "side": pa.array(np.zeros(n, np.int8))})

    def _tx(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "conv_id": batch["conv_id"].cast(pa.string()),
            "turn_idx": batch["turn_idx"].cast(pa.int32()),
            "attr": pa.array([""] * n, pa.string()),
            "entity": pa.array([""] * n, pa.string()),
            "value_str": pa.array([""] * n, pa.string()),
            "text": pc.fill_null(batch["text"].cast(pa.string()), ""),
            "side": pa.array(np.ones(n, np.int8))})

    tagged = claims.map_batches(_cl, batch_format="pyarrow",
                                zero_copy_batch=True).union(
        transcripts.select_columns(["conv_id", "turn_idx", "text"])
        .map_batches(_tx, batch_format="pyarrow", zero_copy_batch=True))

    out_schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int32()),
        ("text", pa.string()), ("relation", pa.string()),
        ("entity", pa.string()), ("value_str", pa.string())])

    def _join(group: pa.Table) -> pa.Table:
        side = np.asarray(group["side"], dtype=np.int8)
        tx = ""
        for i in np.flatnonzero(side == 1):
            tx = group["text"][int(i)].as_py() or ""
            break
        cl = np.flatnonzero(side == 0)
        if len(cl) == 0:
            return out_schema.empty_table()
        sel = pa.array(cl)
        n = len(cl)
        return pa.table({
            "conv_id": group["conv_id"].take(sel),
            "turn_idx": group["turn_idx"].take(sel),
            "text": pa.array([tx] * n, pa.string()),
            "relation": group["attr"].take(sel),
            "entity": group["entity"].take(sel),
            "value_str": group["value_str"].take(sel)})

    return hash_group_apply(tagged, ["conv_id", "turn_idx"], _join,
                            n_parts=n_parts, plasma_schema=out_schema)
