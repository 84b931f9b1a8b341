"""Reverse mapping: fused triples → original (pre-canonicalization) values.

The reference rebuilds a pandas MultiIndex over the preprocessed claims and
positionally looks up the seed (raw) value
(`/root/reference/trustfuse/conflicting_dataset/dataset.py:191-256`).  The
engine instead carries ``claim_id`` through every transform; the fusion
winner keeps its claim_id, so reverse mapping is a hash join
``triples ⋈ claims ON winner_claim_id = claim_id`` — no index gymnastics,
and it distributes (SURVEY.md §2.4).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def reverse_map(triples, claims, num_partitions: int = 16):
    """Adds the original surface form (raw_value) and lineage
    (conv_id, turn_idx) of the winning claim to each fused triple —
    the reference's ``fmt_fused_data``."""
    seed = claims.select_columns(
        ["claim_id", "raw_value", "conv_id", "turn_idx"])
    return triples.join(
        seed, join_type="left_outer", num_partitions=num_partitions,
        on=("winner_claim_id",), right_on=("claim_id",))


def fused_provenance(claims, n_parts: int = 32):
    """Per-fused-triple provenance: for every CATEGORICAL fused triple
    (majority value per (entity, attr), ties to the lexicographically
    smallest — voting semantics, `fuse/voting.py`), the sorted distinct
    list of sources that asserted the winning value plus its support
    count.  The triple-level lineage record the north-star's
    "per-partition lineage + metrics" asks for at the finest grain.

    Shape: map-side distinct of (source, entity, attr, value_str) bounds
    the exchange by per-block distinct claims (the voting combiner's
    trick), then ONE hash exchange on (entity, attr); winner selection
    and the source string_agg happen inside the group.  Returns
    (entity, attr, value_str, n_sources, sources)."""
    import functools

    from trustfuse_ray.stages.common import hash_group_apply

    def _distinct(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.not_equal(batch["value_type"], "quantity"),
                       pc.is_valid(batch["value_str"]))
        t = batch.filter(keep).select(
            ["source", "entity", "attr", "value_str"])
        return t.group_by(
            ["source", "entity", "attr", "value_str"]).aggregate([])

    def _prov(group: pa.Table) -> pa.Table:
        # the map-side distinct is per BLOCK; finish the global distinct
        # over (source, value) here before counting support
        pairs = set(zip(group["source"].to_pylist(),
                        group["value_str"].to_pylist()))
        srcs, vals = (list(t) for t in zip(*sorted(pairs)))
        counts: dict[str, int] = {}
        for v in vals:
            counts[v] = counts.get(v, 0) + 1
        win = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        ss = sorted({s for s, v in zip(srcs, vals) if v == win})
        return pa.table({
            "entity": group["entity"][:1],
            "attr": group["attr"][:1],
            "value_str": pa.array([win], pa.string()),
            "n_sources": pa.array([len(ss)], pa.int64()),
            "sources": pa.array([",".join(ss)], pa.string())})

    prov_schema = pa.schema([("entity", pa.string()), ("attr", pa.string()),
                             ("value_str", pa.string()),
                             ("n_sources", pa.int64()),
                             ("sources", pa.string())])
    return hash_group_apply(
        claims.map_batches(_distinct, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["entity", "attr"], _prov, n_parts=n_parts,
        plasma_schema=prov_schema)
