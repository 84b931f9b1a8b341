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


def reverse_map(triples, claims, num_partitions: int = 16):
    """Adds the original surface form (raw_value) and lineage
    (conv_id, turn_idx) of the winning claim to each fused triple —
    the reference's ``fmt_fused_data``."""
    seed = claims.select_columns(
        ["claim_id", "raw_value", "conv_id", "turn_idx"])
    return triples.join(
        seed, join_type="left_outer", num_partitions=num_partitions,
        on=("winner_claim_id",), right_on=("claim_id",))
