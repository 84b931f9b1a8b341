"""WikiConflict dynamic-dataset source — the engine form of the reference's
``DynamicDataset`` (`/root/reference/trustfuse/conflicting_dataset/
dataset.py:337-434`): a pickled ``buckets_by_qid`` dict of per-bucket
claim/GT DataFrames with *cumulative* bucket semantics (bucket b includes
all previous buckets) and per-attribute partial-order specificity lists.

The engine never materializes the cumulative windows: claims keep their
ORIGINAL bucket id and a window over bucket_id ≤ b (``window_claims``)
reproduces the reference's concat — predicate instead of the reference's
quadratic physical copies (SURVEY.md §7.5).

The curated pickles are tiny (hundreds of rows); loading them driver-side
and re-emitting long-form Arrow is the right scale call — the 10^12-turn
analog of this source is the transcript Parquet table.
"""

from __future__ import annotations

import pickle

import pyarrow as pa

import ray.data


def load_wikiconflict(path: str, entity_as: str = "string"):
    """→ (claims Dataset, gt Table, partial_orders {attr: {value: coeff}}).

    Claims are long-form with ORIGINAL bucket ids and order-preserving
    claim ids ((bucket·2^30 + row)·64 + attr_idx)·256 matching the
    reference's concat row order; GT list cells are exploded to one row
    per accepted value (multi-truth).
    """
    with open(path, "rb") as fh:
        buckets = pickle.load(fh)
    key = "value" if entity_as == "string" else "qid"

    c_rows = {k: [] for k in ("claim_id", "bucket_id", "source", "entity",
                              "attr", "value_str", "value_num", "value_type",
                              "raw_value", "conv_id", "turn_idx")}
    g_rows = {k: [] for k in ("bucket_id", "entity", "attr", "value_str")}
    attr_index: dict[str, int] = {}
    tuple_attrs: set[str] = set()

    for bid in sorted(buckets):
        df = buckets[bid]["data"][key]
        attrs = [c for c in df.columns if c not in ("Source", "Entity")]
        for a in attrs:
            attr_index.setdefault(a, len(attr_index))
        for row_i, row in enumerate(df.itertuples(index=False)):
            rec = dict(zip(df.columns, row))
            for a in attrs:
                v = rec[a]
                if v is None or (isinstance(v, float) and v != v):
                    continue
                if isinstance(v, tuple):
                    tuple_attrs.add(a)
                cid = ((bid * (1 << 30) + row_i) * 64
                       + attr_index[a]) * 256
                c_rows["claim_id"].append(cid)
                c_rows["bucket_id"].append(bid)
                c_rows["source"].append(str(rec["Source"]))
                c_rows["entity"].append(str(rec["Entity"]))
                c_rows["attr"].append(a)
                c_rows["value_str"].append(str(v))
                c_rows["value_num"].append(None)
                c_rows["value_type"].append(
                    "coordinates" if isinstance(v, tuple) else "string")
                c_rows["raw_value"].append(str(v))
                c_rows["conv_id"].append("")
                c_rows["turn_idx"].append(0)

        gt = buckets[bid]["GT"][key]
        for row in gt.itertuples(index=False):
            rec = dict(zip(gt.columns, row))
            for a in attrs:
                vals = rec.get(a)
                if vals is None or (isinstance(vals, float)
                                    and vals != vals):
                    continue
                if not isinstance(vals, (list, tuple)):
                    vals = [vals]
                for v in vals:
                    if v is None:
                        continue
                    g_rows["bucket_id"].append(bid)
                    g_rows["entity"].append(str(rec["Entity"]))
                    g_rows["attr"].append(a)
                    g_rows["value_str"].append(str(v))

    # partial orders: nested specificity lists → {attr: {value: coeff}},
    # coeff = depth / max_depth (dataset.py:398-434 node attributes);
    # later buckets inherit earlier attrs' orders (dataset.py:381-385)
    partial_orders: dict[str, dict[str, float]] = {}
    for bid in sorted(buckets):
        vo = buckets[bid]["GT"].get("value_order", {}) or {}
        for attr, orders in vo.items():
            if not orders:
                continue
            po = partial_orders.setdefault(attr, {})
            for chain in orders:
                max_depth = max(1, len(chain) - 1)
                for depth, values in enumerate(chain):
                    for v in values:
                        po[str(v)] = depth / max_depth

    claims_tbl = pa.table({
        "claim_id": pa.array(c_rows["claim_id"], pa.int64()),
        "bucket_id": pa.array(c_rows["bucket_id"], pa.int32()),
        "source": pa.array(c_rows["source"], pa.string()),
        "entity": pa.array(c_rows["entity"], pa.string()),
        "attr": pa.array(c_rows["attr"], pa.string()),
        "value_str": pa.array(c_rows["value_str"], pa.string()),
        "value_num": pa.array(c_rows["value_num"], pa.float64()),
        "value_type": pa.array(c_rows["value_type"], pa.string()),
        "raw_value": pa.array(c_rows["raw_value"], pa.string()),
        "conv_id": pa.array(c_rows["conv_id"], pa.string()),
        "turn_idx": pa.array(c_rows["turn_idx"], pa.int32()),
    })
    gt_tbl = pa.table({
        "bucket_id": pa.array(g_rows["bucket_id"], pa.int32()),
        "entity": pa.array(g_rows["entity"], pa.string()),
        "attr": pa.array(g_rows["attr"], pa.string()),
        "value_str": pa.array(g_rows["value_str"], pa.string()),
    })
    claims = ray.data.from_arrow(claims_tbl)
    return claims, gt_tbl, partial_orders, tuple_attrs


def window_claims(claims, up_to_bucket: int):
    """Cumulative window b (claims with bucket_id ≤ b, re-labeled to one
    fusion bucket) — the reference's physical concat as a predicate."""
    import pyarrow.compute as pc

    def _w(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less_equal(batch["bucket_id"], up_to_bucket))
        n = len(batch)
        return batch.set_column(
            batch.schema.get_field_index("bucket_id"), "bucket_id",
            pa.array([up_to_bucket] * n, pa.int32()))

    return claims.map_batches(_w, batch_format="pyarrow",
                              zero_copy_batch=True)
