"""Evaluation metrics — distributed re-expression of
`/root/reference/trustfuse/evaluation/evaluation.py:121-349` (``get_metrics``)
with the same set semantics and edge cases:

* tuples = distinct (entity, value) pairs per (bucket, attr), list cells
  exploded (``col2tuples``, evaluation.py:108-118);
* IT and DPP restricted to entities present in GT (evaluation.py:191-196);
* tp = |GT∩IT|, fp = |IT−GT|, tn = |(DPP−GT)−IT|, fn = |(DPP−IT)∩GT|
  (evaluation.py:211-214) — note fn requires the tuple to have been claimed;
* precision = 1 when fp == 0 (evaluation.py:72-74); recall/accuracy/F1 with
  zero-denominator → 0; completion rate = |IT∩GT|/|GT| (evaluation.py:240-244);
* per-attr and per-bucket metrics, dataset micro totals, median/var/mean of
  per-bucket P and R (evaluation.py:281-312);
* specificity from partial-order coefficient tables, wrong values −1 in
  "negative" mode (evaluation.py:24-58).

Distributed shape: one union of flagged tuple tables → groupby(tuple).max
flags → vectorized per-tuple contribution → groupby(bucket, attr).sum →
tiny per-attr table on the driver for rollups.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _flagged(ds, flag: str, cols: dict[str, str]) -> "ray.data.Dataset":
    """Project ds to (bucket_id, attr, entity, value, gt/it/dpp flags)."""

    def _b(batch: pa.Table) -> pa.Table:
        n = len(batch)
        bucket = (batch[cols["bucket_id"]] if cols.get("bucket_id")
                  else pa.array([0] * n, pa.int32()))
        val = pc.cast(batch[cols["value"]], pa.string())
        out = pa.table({
            "bucket_id": pc.cast(bucket, pa.int32()),
            "attr": batch[cols["attr"]],
            "entity": batch[cols["entity"]],
            "value": val,
        })
        for f in ("gt", "it", "dpp"):
            out = out.append_column(
                f, pa.array(np.full(n, 1 if f == flag else 0, np.int8)))
        return out.filter(pc.is_valid(val))

    return ds.map_batches(_b, batch_format="pyarrow", zero_copy_batch=True)


def _counts_per_attr(flags) -> list[dict]:
    """(bucket, attr, entity, value, gt|it|dpp) rows → per (bucket, attr)
    tp/fp/tn/fn/gt_size/hit counts."""
    tuples = flags.groupby(["bucket_id", "attr", "entity", "value"]).max(
        ["gt", "it", "dpp"])

    def _contrib(batch: pa.Table) -> pa.Table:
        g = np.asarray(batch["max(gt)"], dtype=bool)
        i = np.asarray(batch["max(it)"], dtype=bool)
        d = np.asarray(batch["max(dpp)"], dtype=bool)
        return pa.table({
            "bucket_id": batch["bucket_id"],
            "attr": batch["attr"],
            "tp": pa.array((g & i).astype(np.int64)),
            "fp": pa.array((i & ~g).astype(np.int64)),
            "tn": pa.array((d & ~g & ~i).astype(np.int64)),
            "fn": pa.array((d & ~i & g).astype(np.int64)),
            "gt_n": pa.array(g.astype(np.int64)),
            "hit": pa.array((g & i).astype(np.int64)),
        })

    per_attr = (tuples.map_batches(_contrib, batch_format="pyarrow")
                .groupby(["bucket_id", "attr"])
                .sum(["tp", "fp", "tn", "fn", "gt_n", "hit"]))
    # the groupby.sum above IS the tree aggregation — what reaches the
    # driver here is one row per (bucket, attr), the same cardinality as
    # the metrics dict being built
    return per_attr.take_all()


def compute_precision(tp, fp):
    return 1 if fp == 0 else tp / (tp + fp)


def compute_recall(tp, fn):
    return tp / (tp + fn) if (tp + fn) > 0 else 0


def compute_accuracy(tp, fp, tn, fn):
    tot = tp + tn + fp + fn
    return (tp + tn) / tot if tot > 0 else 0


def compute_f1(r, p):
    return 2 * r * p / (r + p) if (r + p) > 0 else 0


def get_metrics(triples, gt, claims,
                triples_cols=None, gt_cols=None, claims_cols=None,
                partial_orders: dict | None = None,
                specificity_mode: str = "negative") -> dict:
    """triples/gt/claims Datasets → nested metrics dict (reference shape).

    ``gt`` drives the entity restriction: IT/DPP tuples whose entity is not
    in GT are dropped (broadcast entity set — GT is curated/small by
    construction).  ``partial_orders``: {attr: {value: coeff}} for the
    specificity metric.
    """
    triples_cols = triples_cols or {"bucket_id": "bucket_id", "attr": "attr",
                                    "entity": "entity", "value": "value_str"}
    gt_cols = gt_cols or {"bucket_id": None, "attr": "attr",
                          "entity": "entity", "value": "value_str"}
    claims_cols = claims_cols or {"bucket_id": "bucket_id", "attr": "attr",
                                  "entity": "entity", "value": "value_str"}

    gt_f = _flagged(gt, "gt", gt_cols).materialize()
    gt_entities = pa.array(gt_f.unique("entity"))

    def _restrict(ds):
        def _b(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.is_in(batch["entity"], value_set=gt_entities))
        return ds.map_batches(_b, batch_format="pyarrow",
                              zero_copy_batch=True)

    it_f = _restrict(_flagged(triples, "it", triples_cols))
    dpp_f = _restrict(_flagged(claims, "dpp", claims_cols))
    flags = gt_f.union(it_f).union(dpp_f)
    rows = _counts_per_attr(flags)

    # specificity needs the IT−GT split per attr.  The tuple table is
    # unbounded (one row per distinct claimed tuple), so the per-tuple
    # contributions are computed INSIDE map_batches against the broadcast
    # partial-order dict and tree-summed to (bucket, attr) — only that
    # bounded rollup reaches the driver.
    spec_rows = None
    if partial_orders:
        import ray as _ray

        po_ref = _ray.put(partial_orders)
        neg = specificity_mode == "negative"

        def _spec_contrib(batch: pa.Table) -> pa.Table:
            po_all = _ray.get(po_ref)
            b = batch.filter(pc.equal(batch["max(it)"], 1))
            g = np.asarray(b["max(gt)"], dtype=bool)
            attrs = b["attr"].to_pylist()
            vals = b["value"].to_pylist()
            spec = np.zeros(len(b), np.float64)
            nord = np.zeros(len(b), np.int64)
            for i, (a, v) in enumerate(zip(attrs, vals)):
                if not g[i]:
                    if neg:
                        spec[i] = -1.0
                    continue
                po = po_all.get(a)
                if po is not None and v in po:
                    spec[i] = po[v]
                    nord[i] = 1
            return pa.table({
                "bucket_id": b["bucket_id"], "attr": b["attr"],
                "spec": pa.array(spec), "n_ord": pa.array(nord),
                "seen": pa.array(np.ones(len(b), np.int64))})

        tuples = flags.groupby(["bucket_id", "attr", "entity", "value"]).max(
            ["gt", "it"])
        agg = (tuples.map_batches(_spec_contrib, batch_format="pyarrow")
               .groupby(["bucket_id", "attr"])
               .sum(["spec", "n_ord", "seen"]).take_all())
        spec_acc: dict[tuple, list] = {}
        for t in agg:
            if not t["sum(seen)"]:
                continue
            spec_acc[(t["bucket_id"], t["attr"])] = [
                float(t["sum(spec)"]), int(t["sum(n_ord)"])]
        spec_rows = spec_acc

    metrics = {"buckets": {}}
    ov = dict(tp=0, fp=0, tn=0, fn=0)
    per_bucket: dict[int, dict] = {}
    for r in rows:
        bid, attr = r["bucket_id"], r["attr"]
        b = per_bucket.setdefault(
            bid, {"attributes": {}, "tp": 0, "fp": 0, "tn": 0, "fn": 0,
                  "c_rate": 0.0, "spec": 0.0, "spec_n": 0})
        tp, fp = r["sum(tp)"], r["sum(fp)"]
        tn, fn = r["sum(tn)"], r["sum(fn)"]
        p = compute_precision(tp, fp)
        rc = compute_recall(tp, fn)
        c_rate = (r["sum(hit)"] / r["sum(gt_n)"]) if r["sum(gt_n)"] else 0
        attr_spec = None
        if spec_rows is not None and (bid, attr) in spec_rows:
            s, n_ord = spec_rows[(bid, attr)]
            attr_spec = s / n_ord if n_ord > 0 else None
            if attr_spec is not None:
                b["spec"] += s / n_ord
                b["spec_n"] += n_ord
        b["attributes"][attr] = {
            "p": p, "r": rc,
            "acc": compute_accuracy(tp, fp, tn, fn),
            "f1_score": compute_f1(rc, p),
            "c_rate": c_rate,
            "specificity": attr_spec,
        }
        for k, v in (("tp", tp), ("fp", fp), ("tn", tn), ("fn", fn)):
            b[k] += v
            ov[k] += v
        b["c_rate"] += c_rate

    for bid, b in per_bucket.items():
        n_attr = len(b["attributes"])
        b_p = compute_precision(b["tp"], b["fp"])
        b_r = compute_recall(b["tp"], b["fn"])
        metrics["buckets"][bid] = {
            "attributes": b["attributes"],
            "b_p": b_p, "b_r": b_r,
            "b_acc": compute_accuracy(b["tp"], b["fp"], b["tn"], b["fn"]),
            "b_f1_score": compute_f1(b_r, b_p),
            "c_rate": b["c_rate"] / n_attr if n_attr else 0,
            "specificity": (b["spec"] / b["spec_n"]
                            if b["spec_n"] > 0 else None),
        }

    ov_p = compute_precision(ov["tp"], ov["fp"])
    ov_r = compute_recall(ov["tp"], ov["fn"])
    bp = [metrics["buckets"][b]["b_p"] for b in metrics["buckets"]] or [0]
    br = [metrics["buckets"][b]["b_r"] for b in metrics["buckets"]] or [0]
    metrics.update({
        "ov_p": ov_p, "ov_r": ov_r,
        "ov_acc": compute_accuracy(ov["tp"], ov["fp"], ov["tn"], ov["fn"]),
        "ov_f1_score": compute_f1(ov_r, ov_p),
        "c_rate": (sum(metrics["buckets"][b]["c_rate"]
                       for b in metrics["buckets"])
                   / len(metrics["buckets"])) if metrics["buckets"] else 0,
        "ov_p_median": float(np.median(bp)),
        "ov_p_var": float(np.var(bp)),
        "ov_p_avg": float(np.mean(bp)),
        "ov_r_median": float(np.median(br)),
        "ov_r_var": float(np.var(br)),
        "ov_r_avg": float(np.mean(br)),
    })
    return metrics


def _attr_runs(batch: pa.Table):
    """(attrs, err-chunks) for one (attr, err) batch: group the batch's
    error values by attr vectorized (sort + run boundaries)."""
    if len(batch) == 0:
        return [], []
    g = batch.take(pc.sort_indices(batch, sort_keys=[("attr", "ascending")]))
    attr = g["attr"]
    if isinstance(attr, pa.ChunkedArray):
        attr = attr.combine_chunks()
    codes = pc.dictionary_encode(attr).indices.to_numpy(
        zero_copy_only=False).astype(np.int64)
    n = len(codes)
    new = np.empty(n, bool)
    new[0] = True
    new[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], n)
    errs = np.asarray(g["err"], dtype=np.float64)
    attrs = attr.take(pa.array(starts, pa.int64())).to_pylist()
    return attrs, [errs[s:e] for s, e in zip(starts, ends)]


def compute_mnad(triples, gt, attribute_types: dict[str, str]) -> float | None:
    """Mean Normalized Absolute Distance for quantity attributes
    (evaluation.py:355-385 semantics: per attr, MAE of GT vs fused values on
    common entities, normalized by the variance of the absolute errors;
    var == 0 → plain MAE).  The reference's ``ts_arr = ts_arr[0]`` scalar
    collapse (evaluation.py:375) only runs without crashing for single-row
    merges; we compute the element-wise form.

    Distributed shape: GT is curated/small → broadcast as an Arrow table
    (``ray.put`` once, read per task); the fused-triple table STREAMS
    through ``map_batches``, each batch inner-joining against the GT table
    (Acero hash join — one error row per GT row × fused row) and emitting
    only (attr, err) rows.  The error stream is bounded by
    |GT| × fused-rows-per-key, so collecting it on the driver is safe, and
    the per-attr variance is then the exact two-pass ``np.var`` the
    reference uses — including its ``var == 0`` → plain-MAE branch (no
    one-pass round-off threshold)."""
    import ray

    qattrs = [a for a, t in attribute_types.items() if t == "quantity"]
    # GT is curated/small by construction — gather its Arrow blocks
    # zero-copy (no per-row dict conversion) to build the broadcast table
    g_blocks = [t for t in ray.get(
        gt.select_columns(["entity", "attr", "value_num"]).to_arrow_refs())
        if t.num_rows]
    g_tbl = (pa.concat_tables(g_blocks) if g_blocks
             else pa.schema([("entity", pa.string()), ("attr", pa.string()),
                             ("value_num", pa.float64())]).empty_table())
    if len(g_tbl) == 0 or not qattrs:
        return None
    g_tbl = g_tbl.filter(
        pc.and_(pc.is_in(g_tbl["attr"], value_set=pa.array(qattrs)),
                pc.is_valid(g_tbl["value_num"])))
    g_tbl = pa.table({
        "entity": g_tbl["entity"], "attr": g_tbl["attr"],
        "gv": pc.cast(g_tbl["value_num"], pa.float64())})
    if len(g_tbl) == 0:
        return None
    gref = ray.put(g_tbl)

    def _errs(batch: pa.Table) -> pa.Table:
        g = ray.get(gref)
        b = batch.filter(pc.is_valid(batch["value_num"]))
        b = pa.table({"entity": b["entity"], "attr": b["attr"],
                      "fv": pc.cast(b["value_num"], pa.float64())})
        # inner-merge semantics: one error per (GT row × fused row)
        j = b.join(g, keys=["entity", "attr"], join_type="inner")
        err = pc.abs(pc.subtract(j["gv"], j["fv"]))
        return pa.table({"attr": j["attr"], "err": err})

    err_ds = (triples.select_columns(["entity", "attr", "value_num"])
              .map_batches(_errs, batch_format="pyarrow",
                           zero_copy_batch=True))
    # the error stream is |GT|-bounded (see docstring); accumulate it as
    # numpy arrays per attr from Arrow batches — the exact sorted two-pass
    # np.var (incl. the var == 0 → plain-MAE branch) needs the raw errors
    by_attr: dict[str, list] = {}
    for b in err_ds.iter_batches(batch_format="pyarrow"):
        for a, chunk in zip(*_attr_runs(b)):
            by_attr.setdefault(a, []).append(chunk)
    mae_tot, n_attr = 0.0, 0
    for chunks in by_attr.values():
        err = np.sort(np.concatenate(chunks)) if chunks else np.array([])
        if err.size == 0:
            continue
        mae = float(np.mean(err))
        var = float(np.var(err))
        mae_tot += mae if var == 0 else mae / var
        n_attr += 1
    return mae_tot / n_attr if n_attr else None
