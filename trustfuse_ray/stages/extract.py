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

    def __call__(self, batch: pa.Table) -> pa.Table:
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
