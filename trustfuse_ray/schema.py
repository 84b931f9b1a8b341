"""Arrow schemas for every table that flows through the engine.

The reference (Orange-OpenSource/trustfuse) keeps claims as wide pandas
DataFrames, one row per (source, entity) snapshot
(`/root/reference/trustfuse/conflicting_dataset/dataset.py:299-334`).  We use a
*long* claim table instead — one row per (source, entity, attr, value) claim —
which maps 1:1 onto the reference claim matrix
`model_input[bid] = [index, fact, count]`
(`/root/reference/trustfuse/models/model.py:66-187`) while staying Arrow-native
and shuffle-friendly (the fact key (bucket_id, entity, attr) is the groupby
key instead of a dict index).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Transcript input (BASELINE.json input_hint): one row per conversation turn.
# ---------------------------------------------------------------------------
TRANSCRIPTS = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# ---------------------------------------------------------------------------
# Raw extracted mentions (pre entity-linking / canonicalization).
# ---------------------------------------------------------------------------
MENTIONS = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("source", pa.string()),  # "{role}:{tool}" — the claiming source
        pa.field("mention", pa.string()),  # surface form of the subject
        pa.field("attr", pa.string()),  # predicate
        pa.field("raw_value", pa.string()),  # surface form of the object
    ]
)

# ---------------------------------------------------------------------------
# Canonical long claim table (engine IR; SURVEY.md §1.3).
# value_str: canonical string form for categorical comparison;
# value_num: populated when value_type == "quantity" (else null).
# ---------------------------------------------------------------------------
CLAIMS = pa.schema(
    [
        pa.field("claim_id", pa.int64()),
        pa.field("bucket_id", pa.int32()),
        pa.field("source", pa.string()),
        pa.field("entity", pa.string()),
        pa.field("attr", pa.string()),
        pa.field("value_str", pa.string()),
        pa.field("value_num", pa.float64()),
        pa.field("value_type", pa.string()),  # string|quantity|entity|time|coordinates
        pa.field("raw_value", pa.string()),
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
    ]
)

# ---------------------------------------------------------------------------
# Packed facts: one row per (bucket_id, entity, attr) group — the distributed
# equivalent of one entry of the reference claim matrix (index[i], fact[i]).
# Produced once by a single shuffle; every fusion iteration then runs as a
# stateless map_batches over this table (SURVEY.md §7.4).
# ---------------------------------------------------------------------------
PACKED_FACTS = pa.schema(
    [
        pa.field("bucket_id", pa.int32()),
        pa.field("entity", pa.string()),
        pa.field("attr", pa.string()),
        pa.field("value_type", pa.string()),
        pa.field("sources", pa.list_(pa.string())),
        pa.field("values_str", pa.list_(pa.string())),
        pa.field("values_num", pa.list_(pa.float64())),
        pa.field("claim_ids", pa.list_(pa.int64())),
    ]
)

# ---------------------------------------------------------------------------
# Fused triples (the reference's unified_result["truth"] nested dict,
# `/root/reference/trustfuse/models/model.py:194-231`, flattened).
# Multi-truth models (LTM) emit one row per accepted value.
# ---------------------------------------------------------------------------
TRIPLES = pa.schema(
    [
        pa.field("bucket_id", pa.int32()),
        pa.field("entity", pa.string()),  # subj
        pa.field("attr", pa.string()),  # pred
        pa.field("value_str", pa.string()),  # obj (canonical string form)
        pa.field("value_num", pa.float64()),
        pa.field("value_type", pa.string()),
        pa.field("conf", pa.float64()),
        pa.field("n_claims", pa.int32()),
        pa.field("winner_claim_id", pa.int64()),  # for reverse mapping to raw values
    ]
)

# unified_result["weights"] (`model.py:228-229`) flattened.
SOURCE_WEIGHTS = pa.schema(
    [
        pa.field("bucket_id", pa.int32()),
        pa.field("source", pa.string()),
        pa.field("weight", pa.float64()),
    ]
)

ATTRIBUTE_TYPES = ("string", "quantity", "entity", "time", "coordinates")
