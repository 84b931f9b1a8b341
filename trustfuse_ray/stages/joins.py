"""As-of (temporal) join — an operator Ray Data's Dataset API lacks.

Semantics: for every LEFT event, attach the timestamp of the most recent
RIGHT event with the same key and ``right.ts <= left.ts`` (DuckDB
``ASOF LEFT JOIN`` semantics; the driver oracle uses exactly that).

Expressed as a composition the streaming executor can pipeline: one hash
shuffle on the key, then a per-partition in-group timestamp sort and a
vectorized ``np.searchsorted`` merge — never a global sort.  Partitioning
assumption (documented per the north-star): one key's history must fit in a
partition task; keys are independent, so skew is bounded by the hottest
single key, same as sessionize.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from trustfuse_ray.stages.common import hash_group_apply


def _asof_group(batch: pa.Table, *, key_col: str, ts_col: str,
                type_col: str, left_type: str, right_type: str,
                id_col: str) -> pa.Table | None:
    is_left = pc.equal(batch[type_col], left_type)
    left = batch.filter(is_left)
    if not len(left):
        # schema-stable empty output (a group of only right-type rows, and
        # the group-apply empty-partition fallback, both land here)
        return pa.table({
            id_col: pa.array([], pa.int64()),
            key_col: pa.array([], batch.schema.field(key_col).type),
            ts_col: pa.array([], pa.timestamp("us")),
            "asof_ts": pa.array([], pa.timestamp("us")),
        })
    right = batch.filter(pc.equal(batch[type_col], right_type))
    lts = left[ts_col].cast(pa.int64()).to_numpy()
    out_ts = np.full(len(left), np.iinfo(np.int64).min, dtype=np.int64)
    if len(right):
        rts = np.sort(right[ts_col].cast(pa.int64()).to_numpy())
        idx = np.searchsorted(rts, lts, side="right") - 1
        hit = idx >= 0
        out_ts[hit] = rts[idx[hit]]
    matched = pa.array(out_ts != np.iinfo(np.int64).min)
    asof_ts = pc.if_else(matched,
                         pa.array(out_ts, pa.int64()).cast(pa.timestamp("us")),
                         pa.nulls(len(left), pa.timestamp("us")))
    return pa.table({
        id_col: left[id_col],
        key_col: left[key_col],
        ts_col: left[ts_col],
        "asof_ts": asof_ts,
    })


def asof_join_last(events, left_type: str = "purchase",
                   right_type: str = "click", key_col: str = "user_id",
                   ts_col: str = "ts", type_col: str = "event_type",
                   id_col: str = "event_id", n_parts: int = 64):
    """events → one row per ``left_type`` event with ``asof_ts`` = ts of the
    latest ``right_type`` event at or before it for the same key (NULL when
    none).  Columns are pruned before the shuffle."""
    def _prefilter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(
            batch[type_col], value_set=pa.array([left_type, right_type])))

    pruned = events.select_columns(
        [id_col, key_col, ts_col, type_col]).map_batches(
        _prefilter, batch_format="pyarrow", zero_copy_batch=True)
    return hash_group_apply(
        pruned, [key_col],
        functools.partial(_asof_group, key_col=key_col, ts_col=ts_col,
                          type_col=type_col, left_type=left_type,
                          right_type=right_type, id_col=id_col),
        n_parts=n_parts)


def _range_count_group(batch: pa.Table, *, key_col: str, ts_col: str,
                       type_col: str, left_type: str, right_type: str,
                       id_col: str, window_us: int) -> pa.Table:
    is_left = pc.equal(batch[type_col], left_type)
    left = batch.filter(is_left)
    if not len(left):
        return pa.table({
            id_col: pa.array([], pa.int64()),
            key_col: pa.array([], batch.schema.field(key_col).type),
            ts_col: pa.array([], pa.timestamp("us")),
            "n_right": pa.array([], pa.int64()),
        })
    right = batch.filter(pc.equal(batch[type_col], right_type))
    lts = left[ts_col].cast(pa.int64()).to_numpy()
    if len(right):
        rts = np.sort(right[ts_col].cast(pa.int64()).to_numpy())
        # count of right ts in [left.ts − window, left.ts)
        n = (np.searchsorted(rts, lts, side="left")
             - np.searchsorted(rts, lts - window_us, side="left"))
    else:
        n = np.zeros(len(left), np.int64)
    return pa.table({
        id_col: left[id_col],
        key_col: left[key_col],
        ts_col: left[ts_col],
        "n_right": pa.array(n.astype(np.int64), pa.int64()),
    })


def range_join_count(events, window_us: int = 3_600_000_000,
                     left_type: str = "purchase", right_type: str = "click",
                     key_col: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type", id_col: str = "event_id",
                     n_parts: int = 64):
    """Range (interval) join — counts, for every ``left_type`` event, the
    ``right_type`` events of the same key with ts in
    ``[left.ts − window, left.ts)``.  Same composition and partitioning
    assumption as :func:`asof_join_last` (one key per task, vectorized
    double-searchsorted instead of an all-pairs interval probe)."""
    def _prefilter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(
            batch[type_col], value_set=pa.array([left_type, right_type])))

    pruned = events.select_columns(
        [id_col, key_col, ts_col, type_col]).map_batches(
        _prefilter, batch_format="pyarrow", zero_copy_batch=True)
    return hash_group_apply(
        pruned, [key_col],
        functools.partial(_range_count_group, key_col=key_col,
                          ts_col=ts_col, type_col=type_col,
                          left_type=left_type, right_type=right_type,
                          id_col=id_col, window_us=window_us),
        n_parts=n_parts)


# --------------------------------------------------------------------------
# Semi / anti join (EXISTS / NOT EXISTS)
# --------------------------------------------------------------------------

def semi_join(left, right, left_key: str, right_key: str | None = None,
              payload_cols: list[str] | None = None, anti: bool = False,
              n_parts: int = 64):
    """Distributed semi join (``anti=True`` → anti join): emit the left
    rows whose key does (does not) appear on the right — SQL ``EXISTS`` /
    ``NOT EXISTS``.

    Shape: the right side collapses to its per-block DISTINCT keys before
    the exchange (combiner — the probe side never ships payload or
    duplicate keys), both sides union under one schema and co-partition
    with ONE hash exchange; each key group then answers membership
    locally.  Exchange volume = left rows + distinct right keys per
    block."""
    right_key = right_key or left_key
    payload_cols = payload_cols or [
        n for n in left.schema().base_schema.names if n != left_key]
    lschema = left.schema().base_schema
    ptypes = [(c, lschema.field(c).type) for c in payload_cols]
    ktype = lschema.field(left_key).type

    def _tag_left(batch: pa.Table) -> pa.Table:
        cols = {left_key: batch[left_key]}
        cols.update({c: batch[c] for c in payload_cols})
        cols["__side"] = pa.array(np.zeros(len(batch), np.int8))
        return pa.table(cols)

    def _tag_right(batch: pa.Table) -> pa.Table:
        # SQL EXISTS semantics: a NULL key never matches — drop it from
        # the probe side
        keys = pc.drop_null(pc.unique(
            batch[right_key].combine_chunks()
            if isinstance(batch[right_key], pa.ChunkedArray)
            else batch[right_key])).cast(ktype)
        n = len(keys)
        cols = {left_key: keys}
        cols.update({c: pa.nulls(n, t) for c, t in ptypes})
        cols["__side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    tagged = (left.select_columns([left_key] + payload_cols)
              .map_batches(_tag_left, batch_format="pyarrow",
                           zero_copy_batch=True)
              .union(right.select_columns([right_key])
                     .map_batches(_tag_right, batch_format="pyarrow",
                                  zero_copy_batch=True)))

    def _resolve(group: pa.Table) -> pa.Table:
        side = np.asarray(group["__side"], dtype=np.int8)
        has_right = bool((side == 1).any())
        # NULL left keys never satisfy EXISTS (kept only by NOT EXISTS)
        if not group[left_key][0].is_valid:
            has_right = False
        keep = group.filter(pc.equal(group["__side"],
                                     pa.scalar(0, pa.int8())))
        if has_right == anti or len(keep) == 0:
            return keep.drop_columns(["__side"]).slice(0, 0)
        return keep.drop_columns(["__side"])

    out_schema = pa.schema([(left_key, ktype)] + ptypes)
    return hash_group_apply(tagged, [left_key], _resolve, n_parts=n_parts,
                            plasma_schema=out_schema)


# --------------------------------------------------------------------------
# Left outer aggregate join (zero-filled enrichment)
# --------------------------------------------------------------------------

def left_outer_agg_join(left, right_agg, left_key: str, right_key: str,
                        agg_cols: list[str], fill: int = 0,
                        n_parts: int = 64):
    """LEFT OUTER join of pre-aggregated per-key stats onto a dimension
    table, zero-filling keys with no match (SQL ``LEFT JOIN … coalesce``).
    ``right_agg`` must already be one row per key (the caller runs the
    map-side partial + groupby — the standard aggregate shape), so the
    exchange moves left rows + one row per right key and each key group
    resolves locally.  No broadcast: both sides can grow with scale."""
    lschema = left.schema().base_schema
    payload = [n for n in lschema.names if n != left_key]
    ptypes = [(c, lschema.field(c).type) for c in payload]
    ktype = lschema.field(left_key).type

    def _tag_left(batch: pa.Table) -> pa.Table:
        cols = {left_key: batch[left_key]}
        cols.update({c: batch[c] for c in payload})
        cols.update({c: pa.nulls(len(batch), pa.int64())
                     for c in agg_cols})
        cols["__side"] = pa.array(np.zeros(len(batch), np.int8))
        return pa.table(cols)

    def _tag_right(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {left_key: batch[right_key].cast(ktype)}
        cols.update({c: pa.nulls(n, t) for c, t in ptypes})
        cols.update({c: batch[c].cast(pa.int64()) for c in agg_cols})
        cols["__side"] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    tagged = (left.map_batches(_tag_left, batch_format="pyarrow",
                               zero_copy_batch=True)
              .union(right_agg.map_batches(_tag_right,
                                           batch_format="pyarrow",
                                           zero_copy_batch=True)))

    def _resolve(group: pa.Table) -> pa.Table:
        side = np.asarray(group["__side"], dtype=np.int8)
        lmask = side == 0
        if not lmask.any():        # right key with no dimension row
            return None
        lrows = group.filter(pa.array(lmask))
        vals = {}
        # read the right value straight from Arrow int64 — a pandas
        # round-trip would coerce the nullable column to float64 and lose
        # exactness above 2^53
        rmask = ~lmask
        for c in agg_cols:
            v = fill
            if rmask.any():
                sc = group[c].combine_chunks().take(
                    pa.array(np.flatnonzero(rmask)[:1]))[0]
                v = sc.as_py() if sc.is_valid else fill
            vals[c] = np.full(len(lrows), int(v), np.int64)
        out = {left_key: lrows[left_key]}
        out.update({c: lrows[c] for c in payload})
        out.update({c: pa.array(vals[c], pa.int64()) for c in agg_cols})
        return pa.table(out)

    out_schema = pa.schema([(left_key, ktype)] + ptypes
                           + [(c, pa.int64()) for c in agg_cols])
    return hash_group_apply(tagged, [left_key], _resolve, n_parts=n_parts,
                            plasma_schema=out_schema)


# --------------------------------------------------------------------------
# Blocked fuzzy (Jaro) self-join
# --------------------------------------------------------------------------

def fuzzy_self_join(ds, col: str, threshold: float = 0.9,
                    block_len: int = 2, cap: int = 500, scale: int = 10 ** 9,
                    n_parts: int = 32):
    """Entity-resolution-style similarity self-join: pairs of DISTINCT
    values of ``col`` with Jaro similarity ≥ ``threshold``, blocked on the
    ``block_len``-char prefix (standard ER blocking: only same-prefix
    pairs compare; blocks above ``cap`` are skipped as stop-blocks — both
    rules are SQL-expressible so the oracle replays the exact pair set).

    Shape: per-block distinct combine → one exchange on the prefix →
    per-group pair verify with the reference-parity Jaro kernel
    (`functions/similarity.py`, bit-matched against DuckDB
    ``jaro_similarity``).  Pair work is bounded by cap² per block."""
    from trustfuse_ray.functions.similarity import jaro_similarity

    def _distinct(batch: pa.Table) -> pa.Table:
        vals = pc.unique(batch[col].combine_chunks()
                         if isinstance(batch[col], pa.ChunkedArray)
                         else batch[col]).cast(pa.string())
        return pa.table({
            "val": vals,
            "blk": pc.utf8_slice_codeunits(vals, 0, block_len)})

    def _pairs(group: pa.Table) -> pa.Table:
        # per-block distinct happened map-side; finish the global distinct
        # here (same prefix ⇒ same group), then cap and verify
        vals = sorted(set(group["val"].to_pylist()))
        n = len(vals)
        if n < 2 or n > cap:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "sim_fx": pa.array([], pa.int64())})
        outa, outb, outs = [], [], []
        for i in range(n):
            for j in range(i + 1, n):
                s = jaro_similarity(vals[i], vals[j])
                if s >= threshold:
                    outa.append(vals[i])
                    outb.append(vals[j])
                    outs.append(int(round(s * scale)))
        return pa.table({"a": pa.array(outa, pa.string()),
                         "b": pa.array(outb, pa.string()),
                         "sim_fx": pa.array(outs, pa.int64())})

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                             ("sim_fx", pa.int64())])
    return hash_group_apply(
        ds.select_columns([col]).map_batches(
            _distinct, batch_format="pyarrow", zero_copy_batch=True),
        ["blk"], _pairs, n_parts=n_parts, plasma_schema=pair_schema)


# --------------------------------------------------------------------------
# Skew-aware large-large equi-join
# --------------------------------------------------------------------------


def skew_join(left, right, left_key: str, right_key: str,
              left_cols: list[str], right_cols: list[str],
              hot_threshold: int = 1_000_000, n_parts: int = 64):
    """Inner equi-join of two LARGE datasets with explicit hot-key
    handling.  Cold keys co-partition with one hash exchange and join
    per-partition (pyarrow Acero — vectorized, partition-local); keys
    whose LEFT row count exceeds ``hot_threshold`` instead take a
    broadcast path: their right rows ship once via ``ray.put`` and the
    matching left rows join map-side, so one hot key (a celebrity user,
    a default value) can never concentrate its rows in one shuffle
    partition.  The hot set only changes the PLAN, never the result —
    any threshold (including "no hot keys") yields identical output.

    The hot-key detector is a map-side partial count: each left block
    emits (key, block_count) only for keys repeated within the block, the
    partials sum in one tiny aggregate, and keys over the threshold —
    few by definition — are the only thing the driver ever holds.
    Exchange volume for the broadcast side is (hot keys × right rows per
    key); for a dimension-style right that is rows, not gigabytes.
    """
    import ray
    from trustfuse_ray.stages.common import _add_part, plasma_exchange

    lk_type = left.schema().base_schema.field(left_key).type
    lt = {c: left.schema().base_schema.field(c).type for c in left_cols}
    rt = {c: right.schema().base_schema.field(c).type for c in right_cols}
    out_schema = pa.schema([(left_key, lk_type)]
                           + [(c, lt[c]) for c in left_cols]
                           + [(c, rt[c]) for c in right_cols])

    # ---- hot-key detection (map-side partials -> one tiny aggregate) ----
    def _partials(batch: pa.Table) -> pa.Table:
        vc = batch[left_key].combine_chunks().value_counts()
        keys = vc.field("values")
        cnt = vc.field("counts")
        keep = pc.and_(pc.greater(cnt, 1), pc.is_valid(keys))
        return pa.table({"k": keys.filter(keep),
                         "c": cnt.filter(keep).cast(pa.int64())})

    partials = left.select_columns([left_key]).map_batches(
        _partials, batch_format="pyarrow", zero_copy_batch=True)
    totals = partials.groupby("k").sum("c")
    hot_rows = totals.map_batches(
        lambda b: b.filter(pc.greater_equal(
            b["sum(c)"], pa.scalar(int(hot_threshold), pa.int64()))),
        batch_format="pyarrow", zero_copy_batch=True).take_all()
    hot_keys = pa.array([r["k"] for r in hot_rows], lk_type)

    def _sel_left(batch: pa.Table) -> pa.Table:
        cols = {left_key: batch[left_key]}
        cols.update({c: batch[c] for c in left_cols})
        return pa.table(cols)

    def _sel_right(batch: pa.Table) -> pa.Table:
        cols = {left_key: batch[right_key].cast(lk_type)}
        cols.update({c: batch[c] for c in right_cols})
        return pa.table(cols)

    lsel = left.select_columns([left_key] + left_cols).map_batches(
        _sel_left, batch_format="pyarrow", zero_copy_batch=True)
    rsel = right.select_columns([right_key] + right_cols).map_batches(
        _sel_right, batch_format="pyarrow", zero_copy_batch=True)

    # ---- broadcast path for hot keys ----
    hot_out = None
    if len(hot_keys) > 0:
        hot_right = rsel.map_batches(
            lambda b: b.filter(pc.is_in(b[left_key], value_set=hot_keys)),
            batch_format="pyarrow", zero_copy_batch=True)
        refs = hot_right.to_arrow_refs()
        tbls = [t for t in ray.get(refs) if len(t)] if refs else []
        hot_tbl = (pa.concat_tables(tbls) if tbls
                   else pa.schema([(left_key, lk_type)]
                                  + [(c, rt[c]) for c in right_cols]
                                  ).empty_table())
        hot_ref = ray.put(hot_tbl)

        def _hot_join(batch: pa.Table) -> pa.Table:
            small = ray.get(hot_ref)
            mine = batch.filter(pc.is_in(batch[left_key],
                                         value_set=hot_keys))
            if len(mine) == 0 or len(small) == 0:
                return out_schema.empty_table()
            return mine.join(small, keys=[left_key],
                             join_type="inner").select(out_schema.names)

        hot_out = lsel.map_batches(_hot_join, batch_format="pyarrow",
                                   zero_copy_batch=True)

    # ---- co-partition exchange + per-partition Acero join (cold keys) ----
    def _drop_hot(batch: pa.Table) -> pa.Table:
        if len(hot_keys) == 0:
            return batch.filter(pc.is_valid(batch[left_key]))
        keep = pc.and_(pc.is_valid(batch[left_key]),
                       pc.invert(pc.is_in(batch[left_key],
                                          value_set=hot_keys)))
        return batch.filter(keep)

    def _tag(side: int, names: list[str], types: dict):
        def _t(batch: pa.Table) -> pa.Table:
            batch = _drop_hot(batch)
            n = len(batch)
            cols = {left_key: batch[left_key]}
            cols.update({c: batch[c] if c in batch.column_names
                         else pa.nulls(n, lt.get(c) or rt[c])
                         for c in left_cols + right_cols})
            cols["__side"] = pa.array(np.full(n, side, np.int8))
            return pa.table(cols)
        return _t

    uni_schema = pa.schema([(left_key, lk_type)]
                           + [(c, lt[c]) for c in left_cols]
                           + [(c, rt[c]) for c in right_cols]
                           + [("__side", pa.int8()), ("__part", pa.int32())])

    def _part_join(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return out_schema.empty_table()
        side = np.asarray(tbl["__side"], dtype=np.int8)
        l_t = tbl.filter(pa.array(side == 0)) \
            .select([left_key] + left_cols)
        r_t = tbl.filter(pa.array(side == 1)) \
            .select([left_key] + right_cols)
        if len(l_t) == 0 or len(r_t) == 0:
            return out_schema.empty_table()
        return l_t.join(r_t, keys=[left_key],
                        join_type="inner").select(out_schema.names)

    tagged = (lsel.map_batches(_tag(0, left_cols, lt),
                               batch_format="pyarrow", zero_copy_batch=True)
              .union(rsel.map_batches(_tag(1, right_cols, rt),
                                      batch_format="pyarrow",
                                      zero_copy_batch=True)))
    keyed = tagged.map_batches(
        functools.partial(_add_part, keys=[left_key], n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True)
    cold_out = plasma_exchange([keyed], _part_join, n_parts,
                               part_col="__part", empty_schema=uni_schema)
    return cold_out.union(hot_out) if hot_out is not None else cold_out


# ---------------------------------------------------------------------------
# Market-basket co-purchase pairs (within-order part co-occurrence)
# ---------------------------------------------------------------------------

_COPURCH_IN = pa.schema([("okey", pa.int64()), ("pkey", pa.int64()),
                         ("__part", pa.int32())])


def part_copurchase(lineitem, min_support: int = 2,
                    order_col: str = "l_orderkey",
                    part_col_: str = "l_partkey", n_parts: int = 32):
    """Market-basket analysis over orders: for every unordered part pair
    bought together in the SAME order, the number of orders containing
    both, filtered to ``support >= min_support`` — the co-purchase table
    recommendation and assortment analyses read.

    Scale shape: one order-keyed exchange of (orderkey, partkey) ints;
    the per-partition kernel sorts once, dedups (order, part) rows, and
    expands within-order pairs with the vectorized run-index arithmetic
    (no per-order Python) — pair volume is Σ C(|order|, 2), bounded by
    the small order sizes; a tiny pair groupby + support filter ends."""
    import functools

    from trustfuse_ray.stages.common import _add_part, plasma_exchange

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table({"okey": batch[order_col].cast(pa.int64()),
                         "pkey": batch[part_col_].cast(pa.int64())})

    keyed = lineitem.select_columns([order_col, part_col_]).map_batches(
        _project, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        functools.partial(_add_part, keys=["okey"], n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True)

    def _pairs(tbl: pa.Table) -> pa.Table:
        empty = pa.schema([("part_a", pa.int64()), ("part_b", pa.int64()),
                           ("n", pa.int64())]).empty_table()
        if len(tbl) == 0:
            return empty
        ok = np.asarray(tbl["okey"], dtype=np.int64)
        pk = np.asarray(tbl["pkey"], dtype=np.int64)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        # dedup repeated (order, part) rows
        keep = np.ones(len(ok), dtype=bool)
        keep[1:] = (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])
        ok, pk = ok[keep], pk[keep]
        head = np.ones(len(ok), dtype=bool)
        head[1:] = ok[1:] != ok[:-1]
        run_id = np.cumsum(head) - 1
        run_start = np.flatnonzero(head)
        run_len = np.diff(np.append(run_start, len(ok)))
        # within each run, pair (i, j) for i < j: expand vectorized
        li = run_len[run_id]                     # run length per row
        pos = np.arange(len(ok)) - run_start[run_id]
        rep = li - pos - 1                       # partners after each row
        m = rep > 0
        if not m.any():
            return empty
        src = np.flatnonzero(m)
        rep = rep[m]
        total = int(rep.sum())
        out_a = np.repeat(src, rep)
        starts = np.concatenate(([0], np.cumsum(rep)[:-1]))
        out_b = out_a + (np.arange(total) - np.repeat(starts, rep)) + 1
        return pa.table({
            "part_a": pa.array(pk[out_a], pa.int64()),
            "part_b": pa.array(pk[out_b], pa.int64()),
            "n": pa.array(np.ones(total, np.int64)),
        })

    pairs = plasma_exchange([keyed], _pairs, n_parts, part_col="__part",
                            empty_schema=_COPURCH_IN)
    agg = (pairs.groupby(["part_a", "part_b"]).sum("n")
           .rename_columns({"sum(n)": "n"}))
    return agg.filter(expr=f"n >= {min_support}")


def part_rules(lineitem, min_support: int = 2,
               order_col: str = "l_orderkey",
               part_col_: str = "l_partkey", n_parts: int = 32):
    """Directed association rules from the co-purchase table:
    ``antecedent → consequent`` with exact integer support counts and
    confidence as a permille (``1000·n_both // n_antecedent``).  Rules
    are emitted in BOTH directions for each surviving pair (support
    filter applies to the pair).

    Scale shape: reuses :func:`part_copurchase`'s one order-keyed
    exchange; the per-part order counts are a second tiny reduce, and
    the confidence join co-partitions the two small tables on the
    antecedent part id — items, not orders, bound every exchange."""
    import functools

    from trustfuse_ray.stages.common import _add_part, plasma_exchange

    pairs = part_copurchase(lineitem, min_support=min_support,
                            order_col=order_col, part_col_=part_col_,
                            n_parts=n_parts)

    def _project(batch: pa.Table) -> pa.Table:
        return pa.table({"okey": batch[order_col].cast(pa.int64()),
                         "pkey": batch[part_col_].cast(pa.int64())})

    counts = (lineitem.select_columns([order_col, part_col_])
              .map_batches(_project, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(["okey", "pkey"]).count()
              .drop_columns(["count()"])
              .groupby("pkey").count()
              .rename_columns({"count()": "n_ant"}))

    rule_in = pa.schema([("ant", pa.int64()), ("cons", pa.int64()),
                         ("n_both", pa.int64()), ("n_ant", pa.int64()),
                         ("side", pa.int8()), ("__part", pa.int32())])

    def _both_dirs(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["part_a"], dtype=np.int64)
        b = np.asarray(batch["part_b"], dtype=np.int64)
        n = np.asarray(batch["n"], dtype=np.int64)
        m = len(a)
        return pa.table({
            "ant": pa.array(np.concatenate([a, b]), pa.int64()),
            "cons": pa.array(np.concatenate([b, a]), pa.int64()),
            "n_both": pa.array(np.concatenate([n, n]), pa.int64()),
            "n_ant": pa.array(np.zeros(2 * m, np.int64)),
            "side": pa.array(np.zeros(2 * m, np.int8)),
        })

    def _count_rows(batch: pa.Table) -> pa.Table:
        k = len(batch)
        return pa.table({
            "ant": batch["pkey"].cast(pa.int64()),
            "cons": pa.array(np.zeros(k, np.int64)),
            "n_both": pa.array(np.zeros(k, np.int64)),
            "n_ant": batch["n_ant"].cast(pa.int64()),
            "side": pa.array(np.ones(k, np.int8)),
        })

    keyed_rules = pairs.map_batches(
        _both_dirs, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(functools.partial(_add_part, keys=["ant"],
                                    n_parts=n_parts),
                  batch_format="pyarrow", zero_copy_batch=True)
    keyed_counts = counts.map_batches(
        _count_rows, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(functools.partial(_add_part, keys=["ant"],
                                    n_parts=n_parts),
                  batch_format="pyarrow", zero_copy_batch=True)

    def _join(tbl: pa.Table) -> pa.Table:
        empty = pa.schema([
            ("antecedent", pa.int64()), ("consequent", pa.int64()),
            ("n_both", pa.int64()), ("n_ant", pa.int64()),
            ("confidence_permille", pa.int64())]).empty_table()
        if len(tbl) == 0:
            return empty
        side = np.asarray(tbl["side"], dtype=np.int8)
        ant = np.asarray(tbl["ant"], dtype=np.int64)
        cmask = side == 1
        lut = dict(zip(ant[cmask].tolist(),
                       np.asarray(tbl["n_ant"],
                                  dtype=np.int64)[cmask].tolist()))
        rmask = side == 0
        if not rmask.any():
            return empty
        r_ant = ant[rmask]
        n_ant = np.array([lut.get(int(x), 0) for x in r_ant], np.int64)
        n_both = np.asarray(tbl["n_both"], dtype=np.int64)[rmask]
        return pa.table({
            "antecedent": pa.array(r_ant, pa.int64()),
            "consequent": pa.array(
                np.asarray(tbl["cons"], dtype=np.int64)[rmask],
                pa.int64()),
            "n_both": pa.array(n_both, pa.int64()),
            "n_ant": pa.array(n_ant, pa.int64()),
            "confidence_permille": pa.array(
                n_both * 1000 // np.maximum(n_ant, 1), pa.int64()),
        })

    return plasma_exchange([keyed_rules, keyed_counts], _join, n_parts,
                           part_col="__part", empty_schema=rule_in)
