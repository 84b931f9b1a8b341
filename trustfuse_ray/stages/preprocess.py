"""Config-driven preprocessing driver — the engine form of the reference's
``data_preprocessing`` (`/root/reference/trustfuse/conflicting_dataset/
preprocessing.py:57-83`) and its JSON configs
(`/root/reference/data/configurations/crh/*/preprocess_configuration.json`):
two phases, ``modify_structure`` (kernels that return lists → explode rows)
then ``modify_data`` (scalar kernels), applied to configured attributes by
name or by declared type.

Operates on the LONG claim IR: "apply kernel K to attribute a" means
"transform value_str/value_num of rows where attr == a" — the vectorized
unpivoted equivalent of the reference's per-column ``df[attr].apply``.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from trustfuse_ray.stages.canon import SCALAR_KERNELS


def focus_attributes(claims, attributes: list[str] | None = None,
                     types: list[str] | None = None):
    """`preprocessing.py:10-54` focus_on_attributes as a predicate on the
    long claim table: keep rows whose attr (or declared value_type) is in
    the selection ('repeat'/'custom' → by name, 'type_selection' → by
    type)."""

    def _f(batch: pa.Table) -> pa.Table:
        mask = None
        if attributes is not None:
            mask = pc.is_in(batch["attr"],
                            value_set=pa.array(attributes, pa.string()))
        if types is not None:
            m2 = pc.is_in(batch["value_type"],
                          value_set=pa.array(types, pa.string()))
            mask = m2 if mask is None else pc.and_(mask, m2)
        return batch if mask is None else batch.filter(mask)

    return claims.map_batches(_f, batch_format="pyarrow",
                              zero_copy_batch=True)


def _apply_step(batch: pa.Table, *, kernel_name: str, attrs: set[str],
                modify_structure: bool) -> pa.Table:
    fn = SCALAR_KERNELS[kernel_name]
    sel = np.array([a in attrs for a in batch["attr"].to_pylist()])
    if not sel.any():
        return batch
    cols = {c: batch[c].to_pylist() for c in batch.column_names}
    n = len(batch)
    out = {c: [] for c in cols}
    for i in range(n):
        if not sel[i]:
            for c in cols:
                out[c].append(cols[c][i])
            continue
        v = fn(cols["value_str"][i])
        values = v if (modify_structure and isinstance(v, list)) else [v]
        for j, vv in enumerate(values):
            for c in cols:
                if c == "value_str":
                    out[c].append(None if vv is None else str(vv))
                elif c == "value_num":
                    out[c].append(float(vv) if isinstance(vv, (int, float))
                                  and not isinstance(vv, bool) else None)
                elif c == "claim_id" and len(values) > 1:
                    # keep exploded values order-adjacent and distinct
                    out[c].append(cols[c][i] + j)
                else:
                    out[c].append(cols[c][i])
    return pa.table({c: pa.array(out[c], batch.schema.field(c).type)
                     for c in cols})


def apply_preprocessing(claims, config: list[dict],
                        attr_types: dict[str, str] | None = None):
    """Apply a preprocessing configuration to a long claim Dataset.

    ``config`` entries mirror the reference JSON:
    ``{"function": "extract_authors", "attributes": ["Authors"],
       "action": "default"|"type_selection", "modify_structure": bool}``.
    With action="type_selection", ``attributes`` lists TYPE names and
    ``attr_types`` maps attribute → type.  List-returning kernels with
    modify_structure=True explode rows (the reference's DataFrame.explode).
    """
    for step in config:
        name = step["function"]
        if name not in SCALAR_KERNELS:
            raise KeyError(f"unknown preprocessing function: {name}")
        if step.get("action", "default") == "type_selection":
            if attr_types is None:
                raise ValueError("type_selection requires attr_types")
            attrs = {a for a, t in attr_types.items()
                     if t in set(step["attributes"])}
        else:
            attrs = set(step["attributes"])
        claims = claims.map_batches(
            functools.partial(
                _apply_step, kernel_name=name, attrs=attrs,
                modify_structure=bool(step.get("modify_structure"))),
            batch_format="pyarrow", zero_copy_batch=True)
    return claims


def apply_scale_units(claims, attributes: list[str],
                      lower_factor: float = -0.8, upper_factor: float = 0.8,
                      max_itr: int = 10, n_parts: int = 64):
    """`preprocessing.py:176-225` scale_units as a distributed group stage:
    per (bucket, entity, attr) group, iteratively multiply values by 10/0.1
    until all lie within 10^±0.8 of the group median (unit harmonization —
    the reference Stock config's metadata preprocessor).  Order/group-
    sensitive → one hash-partitioned shuffle on the group key
    (SURVEY.md §7.5)."""
    from trustfuse_ray.stages.canon import scale_units_group
    from trustfuse_ray.stages.common import hash_group_apply

    attrs = set(attributes)

    def _grp(group: pa.Table) -> pa.Table:
        if not len(group) or group["attr"][0].as_py() not in attrs:
            return group
        vals = np.array(group["value_str"].to_pylist(), dtype=object)
        scaled = scale_units_group(vals, lower_factor=lower_factor,
                                   upper_factor=upper_factor,
                                   max_itr=max_itr)
        vs, vn = [], []
        for x in scaled:
            if x is None:
                vs.append(None)
                vn.append(None)
            else:
                f = float(x)
                vs.append(str(int(f)) if f.is_integer() else repr(f))
                vn.append(f)
        group = group.set_column(
            group.schema.get_field_index("value_str"), "value_str",
            pa.array(vs, pa.string()))
        return group.set_column(
            group.schema.get_field_index("value_num"), "value_num",
            pa.array(vn, pa.float64()))

    return hash_group_apply(claims, ["bucket_id", "entity", "attr"], _grp,
                            n_parts=n_parts)


def complete_gt(gt, entity_col: str = "entity", bucket_col: str = "bucket_id"):
    """`dataset.py:36-51` complete_gt: fill an entity's missing GT attrs in
    bucket b from earlier buckets (last-non-null coalesce over ordered
    buckets) — one groupby(entity) with an in-group forward fill."""

    def _fill(batch: pa.Table) -> pa.Table:
        order = pc.sort_indices(batch, sort_keys=[(bucket_col, "ascending")])
        batch = batch.take(order)
        attrs = batch["attr"].to_pylist()
        vals = batch["value_str"].to_pylist()
        last: dict[str, str] = {}
        out = []
        for a, v in zip(attrs, vals):
            if v is None:
                out.append(last.get(a))
            else:
                last[a] = v
                out.append(v)
        return batch.set_column(
            batch.schema.get_field_index("value_str"), "value_str",
            pa.array(out, pa.string()))

    return gt.groupby(entity_col).map_groups(_fill, batch_format="pyarrow")


def gt_as_of(gt, bucket: int, entity_col: str = "entity",
             bucket_col: str = "bucket_id", n_parts: int = 32):
    """Effective GT for cumulative window ``bucket`` — the reference's
    entity-level carry-forward mask (`conflicting_dataset/dataset.py:368-373`:
    prev-bucket GT rows anti-joined on entities re-stated in the current GT,
    concatenated per bucket) + the complete_gt coalesce, expressed over the
    long GT table as one window predicate + per-(entity, attr) latest-bucket
    fold — no physical concat chain, so window b never re-copies windows
    < b.

    Deviation (documented): the reference coalesces missing attrs from
    earlier buckets only for each bucket's *current* entity
    (`dataset.py:374`); re-stated entities lose attrs their latest row left
    NaN.  Here every entity keeps the latest non-null statement per attr —
    strictly more complete, and identical whenever each bucket's GT states
    one entity (the WikiConflict shape)."""
    from trustfuse_ray.stages.common import hash_group_apply

    def _w(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less_equal(batch[bucket_col], bucket))

    win = gt.map_batches(_w, batch_format="pyarrow", zero_copy_batch=True)

    def _latest(group: pa.Table) -> pa.Table:
        mb = pc.max(group[bucket_col]).as_py()
        group = group.filter(pc.equal(group[bucket_col], mb))
        return group.set_column(
            group.schema.get_field_index(bucket_col), bucket_col,
            pa.array([bucket] * len(group), pa.int32()))

    return hash_group_apply(win, [entity_col, "attr"], _latest,
                            n_parts=n_parts)
