"""Temporal windowing operators.

Reference analog: bucketization of the Wikidata modification stream —
per-entity session windows with a close rule and self-correction grace
(`/root/reference/dataset_generation/generate_buckets.py:71-74,171-242`;
SURVEY.md §2.9).  Expressed as ``groupby(key).map_groups`` with an in-group
timestamp sort — never a global sort.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _sessionize_group(batch: pa.Table, *, ts_col: str, key_col: str,
                      id_col: str, gap_us: int) -> pa.Table:
    order = pc.sort_indices(batch, sort_keys=[(ts_col, "ascending"),
                                              (id_col, "ascending")])
    batch = batch.take(order)
    key = batch[key_col][0].as_py()
    ts = batch[ts_col].cast(pa.int64()).to_numpy()
    brk = np.ones(len(ts), dtype=np.int64)
    if len(ts) > 1:
        brk[1:] = (np.diff(ts) > gap_us).astype(np.int64)
    sid = np.cumsum(brk)  # 1-based session ids, per key
    # sessions are contiguous runs in ts order: segment bounds, not a
    # per-session mask loop
    starts = np.flatnonzero(brk)
    ends = np.append(starts[1:], len(ts)) - 1
    return pa.table({
        key_col: pa.array([key] * len(starts)),
        "session_id": pa.array(sid[starts], pa.int64()),
        "n_events": pa.array(ends - starts + 1, pa.int64()),
        "start_ts": pa.array(ts[starts], pa.int64()).cast(
            pa.timestamp("us")),
        "end_ts": pa.array(ts[ends], pa.int64()).cast(pa.timestamp("us")),
    })


def sessionize(events, key_col: str = "user_id", ts_col: str = "ts",
               id_col: str = "event_id", gap_minutes: float = 30.0):
    """Per-key session windows: a session closes when the gap to the next
    event exceeds ``gap_minutes``.  One shuffle on ``key_col``."""
    return events.groupby(key_col).map_groups(
        functools.partial(_sessionize_group, ts_col=ts_col, key_col=key_col,
                          id_col=id_col,
                          gap_us=int(gap_minutes * 60 * 1_000_000)),
        batch_format="pyarrow")


def _bucketize_group(batch: pa.Table, *, entity_col: str, source_col: str,
                     attr_col: str, ts_col: str, delta_us: int,
                     alpha_us: int) -> pa.Table:
    """Reference bucket-closing rule per entity
    (`generate_buckets.py:171-242`): replay modifications in ts order; a
    bucket closes when a source re-asserts a property it already populated
    in the open bucket AND the elapsed time since the bucket opened exceeds
    ``delta`` — unless the re-assertion is the source correcting itself
    within the ``alpha`` grace window (update-in-place, no close)."""
    # deterministic replay order: ts ties broken by (source, attr) — rows
    # equal on all three are interchangeable for the rule's state, so this
    # fixes the output without changing the semantics (and lets the DuckDB
    # oracle reproduce the exact same scan)
    order = pc.sort_indices(batch, sort_keys=[
        (ts_col, "ascending"), (source_col, "ascending"),
        (attr_col, "ascending")])
    batch = batch.take(order)
    ts = batch[ts_col].cast(pa.int64()).to_numpy()
    srcs = batch[source_col].to_pylist()
    attrs = batch[attr_col].to_pylist()
    bucket = np.zeros(len(ts), dtype=np.int32)
    cur = 0
    open_ts = ts[0] if len(ts) else 0
    seen: dict[tuple[str, str], int] = {}  # (source, attr) -> last ts
    for i in range(len(ts)):
        key = (srcs[i], attrs[i])
        if key in seen:
            if ts[i] - seen[key] <= alpha_us:
                pass  # self-correction grace: stay in bucket
            elif ts[i] - open_ts > delta_us:
                cur += 1
                open_ts = ts[i]
                seen = {}
        bucket[i] = cur
        seen[key] = ts[i]
    out = batch.append_column("bucket_id_w", pa.array(bucket, pa.int32()))
    return out


def bucketize_claims(claims, delta_days: float = 730.0,
                     alpha_days: float = 10.0, entity_col: str = "entity",
                     source_col: str = "source", attr_col: str = "attr",
                     ts_col: str = "ts"):
    """Assign session-window bucket ids per entity (reference §2.9
    semantics); adds a ``bucket_id_w`` column."""
    day_us = 86_400_000_000
    return claims.groupby(entity_col).map_groups(
        functools.partial(_bucketize_group, entity_col=entity_col,
                          source_col=source_col, attr_col=attr_col,
                          ts_col=ts_col, delta_us=int(delta_days * day_us),
                          alpha_us=int(alpha_days * day_us)),
        batch_format="pyarrow")


def cumulative_known_entities(claims, value_col: str = "entity",
                              bucket_col: str = "bucket_id"):
    """`dataset.py:84-95` compute_known_entities re-expressed: per bucket,
    the distinct values; cumulative union = all values with
    min(bucket) < b.  Returns (value, first_bucket) — membership test is
    ``first_bucket < b`` (predicate, never a materialized cumulative set)."""
    return (claims.groupby(value_col).min(bucket_col)
            .rename_columns({f"min({bucket_col})": "first_bucket"}))


def _flag_group(group: pa.Table, *, value_col: str,
                bucket_col: str) -> pa.Table:
    buckets = np.unique(np.asarray(group[bucket_col], dtype=np.int64))
    n = len(buckets)
    return pa.table({
        value_col: pa.array([group[value_col][0].as_py()] * n,
                            group.schema.field(value_col).type),
        bucket_col: pa.array(buckets, pa.int64()),
        "is_known": pa.array(buckets > buckets[0]),
    })


def known_entity_flags(ds, value_col: str = "entity",
                       bucket_col: str = "bucket_id", n_parts: int = 64):
    """(value, bucket, is_known) for every distinct (value, bucket) pair:
    ``is_known`` = the value appeared in an EARLIER bucket (the exact form
    of the reference's cumulative known-entity set).  One block-level dedup
    combiner + one hash shuffle on the value."""
    import functools as _ft

    from trustfuse_ray.stages.common import hash_group_apply

    def _dedup_block(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select([value_col, bucket_col]),
                            [value_col, bucket_col],
                            use_threads=False).aggregate([])
        return g

    d = ds.map_batches(_dedup_block, batch_format="pyarrow",
                       zero_copy_batch=True)
    return hash_group_apply(
        d, [value_col],
        _ft.partial(_flag_group, value_col=value_col,
                    bucket_col=bucket_col), n_parts=n_parts)


def known_entity_flags_bloom(ds, frontier_bucket: int,
                             value_col: str = "entity",
                             bucket_col: str = "bucket_id",
                             n_bits: int = 1 << 20, k: int = 4):
    """Streaming-scale variant of :func:`known_entity_flags` for ONE
    frontier: flag rows of ``frontier_bucket`` by membership in a
    fixed-size Bloom filter built from all earlier buckets
    (`stages/bloom.py`).  At 100 TB the distinct-value table grows with
    the corpus; the filter stays ``n_bits/8`` bytes regardless, at a
    documented false-positive rate (never false negatives)."""
    import pyarrow.compute as pc

    from trustfuse_ray.stages.bloom import build_bloom

    earlier = ds.filter(expr=f"{bucket_col} < {int(frontier_bucket)}")
    bf = build_bloom(earlier, value_col, n_bits=n_bits, k=k)
    bits, nb, kk = bf.bits, bf.n_bits, bf.k

    def _flag(batch: pa.Table) -> pa.Table:
        from trustfuse_ray.stages.bloom import BloomFilter

        f = BloomFilter(nb, kk, bits=bits)
        col = batch[value_col]
        known = f.contains(col.combine_chunks()
                           if isinstance(col, pa.ChunkedArray) else col)
        return batch.append_column("is_known", pa.array(known))

    frontier = ds.filter(expr=f"{bucket_col} == {int(frontier_bucket)}")
    return frontier.map_batches(_flag, batch_format="pyarrow",
                                zero_copy_batch=True)


def _window_partial(batch: pa.Table, *, key_col: str, ts_col: str,
                    value_col: str, window_us: int,
                    fx_scale: int) -> pa.Table:
    """Map-side partial for the tumbling-window aggregate: derive the window
    id and pre-aggregate (count, fixed-point sum) INSIDE the block, so the
    shuffle moves one row per (key, window) per block — not one per event.
    Fixed-point sums make the global combine order-independent (same trick
    as q1_pricing_summary; float sums drift with block order)."""
    ts_us = batch[ts_col].cast(pa.int64())
    win = pc.multiply(pc.divide(ts_us, pa.scalar(window_us, pa.int64())),
                      pa.scalar(window_us, pa.int64()))
    v_fx = pc.cast(pc.round(
        pc.multiply(batch[value_col], pa.scalar(float(fx_scale))),
        round_mode="half_towards_infinity"), pa.int64())
    t = pa.table({key_col: batch[key_col], "window_us": win,
                  "v_fx": v_fx,
                  "n": pa.array(np.ones(len(batch), dtype=np.int64))})
    return (pa.TableGroupBy(t, [key_col, "window_us"])
            .aggregate([("v_fx", "sum"), ("n", "sum")])
            .rename_columns([key_col, "window_us", "v_fx", "n"]))


def windowed_aggregate(events, key_col: str = "user_id", ts_col: str = "ts",
                       value_col: str = "value", window_s: int = 3600,
                       fx_scale: int = 10_000):
    """Tumbling-window aggregate per key: (key, window_us, n_events,
    sum_value).  One small shuffle over pre-aggregated partials — the
    100-TB shape (the wide exchange carries at most
    #keys × #windows × #blocks rows, not #events)."""
    partial = events.select_columns(
        [key_col, ts_col, value_col]).map_batches(
        functools.partial(_window_partial, key_col=key_col, ts_col=ts_col,
                          value_col=value_col,
                          window_us=int(window_s) * 1_000_000,
                          fx_scale=fx_scale),
        batch_format="pyarrow", zero_copy_batch=True)
    agg = partial.groupby([key_col, "window_us"]).sum(["v_fx", "n"])

    def _finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch[key_col],
            "window_us": batch["window_us"],
            "n_events": batch["sum(n)"],
            "sum_value": pc.divide(
                pc.cast(batch["sum(v_fx)"], pa.float64()),
                pa.scalar(float(fx_scale))),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")


def _running_group(group: pa.Table, *, key_col: str, ts_col: str,
                   id_col: str, fx_scale: int) -> pa.Table:
    order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending"),
                                              (id_col, "ascending")])
    group = group.take(order)
    n = len(group)
    fx = np.asarray(group["v_fx"], dtype=np.int64)
    return pa.table({
        key_col: group[key_col],
        id_col: group[id_col],
        "running_n": pa.array(np.arange(1, n + 1, dtype=np.int64)),
        "running_value": pa.array(np.cumsum(fx) / float(fx_scale),
                                  pa.float64()),
    })


def running_totals(events, key_col: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id", value_col: str = "value",
                   fx_scale: int = 10_000, n_parts: int = 32):
    """Per-key running (cumulative) aggregates in (ts, id) order — the
    window-function surface (SQL ``sum(...) OVER (PARTITION BY key ORDER
    BY ts)``).  The key group is the locality unit: one hash exchange on
    the key, an in-group sort, a cumsum — never a global sort.  Sums are
    fixed-point so the prefix is exact and partition-invariant."""

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch[key_col],
            id_col: batch[id_col].cast(pa.int64()),
            ts_col: batch[ts_col].cast(pa.timestamp("us")),
            "v_fx": pc.cast(pc.round(
                pc.multiply(batch[value_col], pa.scalar(float(fx_scale))),
                round_mode="half_towards_infinity"), pa.int64()),
        })

    from trustfuse_ray.stages.common import hash_group_apply

    keyed = events.select_columns(
        [key_col, id_col, ts_col, value_col]).map_batches(
        _prep, batch_format="pyarrow", zero_copy_batch=True)
    key_type = events.schema().base_schema.field(key_col).type
    out_schema = pa.schema([(key_col, key_type), (id_col, pa.int64()),
                            ("running_n", pa.int64()),
                            ("running_value", pa.float64())])
    return hash_group_apply(
        keyed, [key_col],
        functools.partial(_running_group, key_col=key_col, ts_col=ts_col,
                          id_col=id_col, fx_scale=fx_scale),
        n_parts=n_parts, plasma_schema=out_schema)


def _hopping_partial(batch: pa.Table, *, key_col: str, ts_col: str,
                     value_col: str, window_us: int, hop_us: int,
                     fx_scale: int) -> pa.Table:
    """Map-side partial for the hopping-window aggregate.  An event at t
    belongs to exactly ``m = window/hop`` overlapping windows with starts
    ``(t//hop - i) * hop, i in 0..m-1`` — expand to (event × m) INSIDE the
    block and pre-aggregate, so the shuffle still carries one row per
    (key, window) per block, never per event."""
    m = int(window_us // hop_us)
    ts = np.asarray(batch[ts_col].cast(pa.int64()), dtype=np.int64)
    v_fx = np.asarray(pc.cast(pc.round(
        pc.multiply(batch[value_col], pa.scalar(float(fx_scale))),
        round_mode="half_towards_infinity"), pa.int64()), dtype=np.int64)
    n = len(ts)
    idx = np.repeat(np.arange(n, dtype=np.int64), m)
    off = np.tile(np.arange(m, dtype=np.int64), n)
    starts = ((ts // hop_us)[idx] - off) * hop_us
    keys = batch[key_col].combine_chunks().take(pa.array(idx))
    t = pa.table({key_col: keys,
                  "window_us": pa.array(starts, pa.int64()),
                  "v_fx": pa.array(v_fx[idx], pa.int64()),
                  "n": pa.array(np.ones(n * m, dtype=np.int64))})
    return (pa.TableGroupBy(t, [key_col, "window_us"])
            .aggregate([("v_fx", "sum"), ("n", "sum")])
            .rename_columns([key_col, "window_us", "v_fx", "n"]))


def hopping_window_aggregate(events, key_col: str = "event_type",
                             ts_col: str = "ts", value_col: str = "value",
                             window_s: int = 3600, hop_s: int = 900,
                             fx_scale: int = 10_000):
    """Hopping (sliding) window aggregate: fixed window ``window_s``
    advancing by ``hop_s`` (window must be a multiple of hop).  Same
    100-TB shape as the tumbling form — the wide exchange moves
    pre-combined (key, window) partials with exact fixed-point sums;
    the m-fold expansion never leaves the block that produced it."""
    window_us = int(window_s) * 1_000_000
    hop_us = int(hop_s) * 1_000_000
    if window_us % hop_us:
        raise ValueError("window_s must be a multiple of hop_s")
    partial = events.select_columns(
        [key_col, ts_col, value_col]).map_batches(
        functools.partial(_hopping_partial, key_col=key_col, ts_col=ts_col,
                          value_col=value_col, window_us=window_us,
                          hop_us=hop_us, fx_scale=fx_scale),
        batch_format="pyarrow", zero_copy_batch=True)
    agg = partial.groupby([key_col, "window_us"]).sum(["v_fx", "n"])

    def _finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch[key_col],
            "window_us": batch["window_us"],
            "n_events": batch["sum(n)"],
            "sum_value": pc.divide(
                pc.cast(batch["sum(v_fx)"], pa.float64()),
                pa.scalar(float(fx_scale))),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")


def _funnel_group(group: pa.Table, *, key_col: str, ts_col: str,
                  steps: tuple[str, ...], type_col: str) -> pa.Table:
    ts = np.asarray(group[ts_col].cast(pa.int64()), dtype=np.int64)
    et = np.asarray(group[type_col].to_pylist(), dtype=object)
    cur = np.iinfo(np.int64).min
    out: list = []
    reached = 0
    for step in steps:
        m = et == step
        cand = ts[m]
        cand = cand[cand >= cur] if cur != np.iinfo(np.int64).min else cand
        if len(cand) == 0:
            # the chain is broken: every LATER step is unmet too (the SQL
            # oracle joins each step through the previous step's CTE)
            out.extend([None] * (len(steps) - len(out)))
            break
        cur = int(cand.min())
        out.append(cur)
        reached += 1
    cols = {key_col: group[key_col].slice(0, 1)}
    for s, v in zip(steps, out):
        cols[f"{s}_us"] = pa.array([v], pa.int64())
    cols["stage"] = pa.array([reached], pa.int64())
    return pa.table(cols)


def funnel_steps(events, steps: tuple[str, ...] = ("view", "click",
                                                   "purchase"),
                 key_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type", n_parts: int = 32):
    """Ordered funnel per key: earliest time of step 1, then the earliest
    step-2 event at or after it, and so on (classic funnel semantics —
    each stage's timestamp is the min over events of that type not before
    the previous stage).  One hash exchange on the key; per-group work is
    O(events · steps) numpy.  ``stage`` counts completed steps, and a
    later stage missing leaves NULLs (matching the SQL chained min
    formulation)."""

    def _prep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(batch[type_col],
                        value_set=pa.array(list(steps)))
        batch = batch.filter(mask)
        return pa.table({key_col: batch[key_col],
                         ts_col: batch[ts_col].cast(pa.timestamp("us")),
                         type_col: batch[type_col]})

    from trustfuse_ray.stages.common import hash_group_apply

    keyed = events.select_columns(
        [key_col, ts_col, type_col]).map_batches(
        _prep, batch_format="pyarrow", zero_copy_batch=True)
    key_type = events.schema().base_schema.field(key_col).type
    out_schema = pa.schema([(key_col, key_type)]
                           + [(f"{s}_us", pa.int64()) for s in steps]
                           + [("stage", pa.int64())])
    # keep only keys whose first step exists: groups without step-1
    # events emit stage 0 rows — drop them to mirror the SQL inner chain
    out = hash_group_apply(
        keyed, [key_col],
        functools.partial(_funnel_group, key_col=key_col, ts_col=ts_col,
                          steps=tuple(steps), type_col=type_col),
        n_parts=n_parts, plasma_schema=out_schema)

    def _first_step_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_valid(batch[f"{steps[0]}_us"]))

    return out.map_batches(_first_step_only, batch_format="pyarrow",
                           zero_copy_batch=True)


def weekly_retention(events, key_col: str = "user_id", ts_col: str = "ts",
                     week_us: int = 604_800_000_000, n_parts: int = 32):
    """Cohort retention curve: for each key, week offsets relative to its
    first active week; output (week_offset, n_users) counts.  Per-block
    distinct (key, week) combine → one exchange on the key → per-group
    offsets → tiny count groupby."""
    import pyarrow.compute as pc

    def _weeks(batch: pa.Table) -> pa.Table:
        # numpy floor division (SQL `//` semantics) — Arrow's divide
        # truncates toward zero, which flips pre-1970 timestamps
        wk = np.asarray(batch[ts_col].cast(pa.int64()),
                        dtype=np.int64) // week_us
        t = pa.table({key_col: batch[key_col],
                      "wk": pa.array(wk, pa.int64())})
        return pa.TableGroupBy(t, [key_col, "wk"],
                               use_threads=False).aggregate([])

    def _offsets(group: pa.Table) -> pa.Table:
        wk = np.unique(np.asarray(group["wk"], dtype=np.int64))
        off = wk - wk.min()
        return pa.table({"week_offset": pa.array(off, pa.int64()),
                         "n": pa.array(np.ones(len(off), np.int64))})

    from trustfuse_ray.stages.common import hash_group_apply

    keyed = events.select_columns([key_col, ts_col]).map_batches(
        _weeks, batch_format="pyarrow", zero_copy_batch=True)
    out_schema = pa.schema([("week_offset", pa.int64()),
                            ("n", pa.int64())])
    per_user = hash_group_apply(keyed, [key_col], _offsets,
                                n_parts=n_parts,
                                plasma_schema=out_schema)
    return (per_user.groupby("week_offset").sum("n")
            .rename_columns({"sum(n)": "n_users"}))


def _ntile_group(group: pa.Table, *, key_col: str, value_col: str,
                 id_col: str, n_tiles: int) -> pa.Table:
    order = pc.sort_indices(group, sort_keys=[(value_col, "ascending"),
                                              (id_col, "ascending")])
    group = group.take(order)
    n = len(group)
    # SQL NTILE: first (n % k) tiles get ceil(n/k) rows, the rest floor
    size, rem = divmod(n, n_tiles)
    r = np.arange(n, dtype=np.int64)
    big = rem * (size + 1)
    tile = np.where(r < big,
                    r // max(size + 1, 1),
                    rem + (r - big) // max(size, 1)) + 1
    return pa.table({
        id_col: group[id_col],
        key_col: group[key_col],
        value_col: group[value_col],
        "tile": pa.array(tile.astype(np.int64), pa.int64()),
    })


def ntile_per_key(events, n_tiles: int = 4, key_col: str = "event_type",
                  value_col: str = "value", id_col: str = "event_id",
                  n_parts: int = 16):
    """SQL ``NTILE(k) OVER (PARTITION BY key ORDER BY value, id)``: each
    key's rows split into k near-equal tiles (first ``n mod k`` tiles one
    row larger — exact NTILE semantics).  One hash exchange on the key,
    in-group sort, pure index arithmetic."""
    from trustfuse_ray.stages.common import hash_group_apply

    keyed = events.select_columns([id_col, key_col, value_col])
    out_schema = pa.schema([(id_col, pa.int64()), (key_col, pa.string()),
                            (value_col, pa.float64()),
                            ("tile", pa.int64())])
    return hash_group_apply(
        keyed, [key_col],
        functools.partial(_ntile_group, key_col=key_col,
                          value_col=value_col, id_col=id_col,
                          n_tiles=n_tiles),
        n_parts=n_parts, plasma_schema=out_schema)


def _path_group(group: pa.Table, *, key_col: str, ts_col: str,
                id_col: str, type_col: str, sep: str) -> pa.Table:
    order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending"),
                                              (id_col, "ascending")])
    group = group.take(order)
    path = sep.join(group[type_col].to_pylist())
    return pa.table({key_col: group[key_col].slice(0, 1),
                     "n_events": pa.array([len(group)], pa.int64()),
                     "path": pa.array([path], pa.string())})


def ordered_path(events, key_col: str = "user_id", ts_col: str = "ts",
                 id_col: str = "event_id", type_col: str = "event_type",
                 sep: str = ">", n_parts: int = 32):
    """Per-key ordered sequence assembly — SQL ``string_agg(type, sep
    ORDER BY ts, id)``.  The behavioural-path / clickstream primitive:
    one hash exchange on the key, in-group sort, one join per group."""
    from trustfuse_ray.stages.common import hash_group_apply

    keyed = events.select_columns([key_col, ts_col, id_col, type_col])
    key_type = events.schema().base_schema.field(key_col).type
    out_schema = pa.schema([(key_col, key_type), ("n_events", pa.int64()),
                            ("path", pa.string())])
    return hash_group_apply(
        keyed, [key_col],
        functools.partial(_path_group, key_col=key_col, ts_col=ts_col,
                          id_col=id_col, type_col=type_col, sep=sep),
        n_parts=n_parts, plasma_schema=out_schema)


def _rolling_group(group: pa.Table, *, key_col: str, ts_col: str,
                   id_col: str, w: int, fx_scale: int) -> pa.Table:
    order = pc.sort_indices(group, sort_keys=[(ts_col, "ascending"),
                                              (id_col, "ascending")])
    group = group.take(order)
    fx = np.asarray(group["v_fx"], dtype=np.int64)
    cs = np.concatenate(([0], np.cumsum(fx)))
    n = len(fx)
    lo = np.maximum(np.arange(n) - w + 1, 0)
    win_sum = cs[np.arange(1, n + 1)] - cs[lo]
    win_n = np.arange(n) - lo + 1
    return pa.table({
        key_col: group[key_col],
        id_col: group[id_col],
        "win_n": pa.array(win_n.astype(np.int64), pa.int64()),
        "win_avg": pa.array(
            (win_sum / float(fx_scale)) / win_n, pa.float64()),
    })


def rolling_stats(events, w: int = 5, key_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  value_col: str = "value", fx_scale: int = 10_000,
                  n_parts: int = 32):
    """Per-key moving average over the last ``w`` events in (ts, id)
    order — SQL ``avg(v) OVER (… ROWS BETWEEN w-1 PRECEDING AND CURRENT
    ROW)``.  The window sum is an exact fixed-point cumsum difference;
    the only float op is the final (sum/scale)/n division, identical on
    both engines."""
    from trustfuse_ray.stages.common import hash_group_apply

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            key_col: batch[key_col],
            id_col: batch[id_col].cast(pa.int64()),
            ts_col: batch[ts_col].cast(pa.timestamp("us")),
            "v_fx": pc.cast(pc.round(
                pc.multiply(batch[value_col], pa.scalar(float(fx_scale))),
                round_mode="half_towards_infinity"), pa.int64()),
        })

    keyed = events.select_columns(
        [key_col, id_col, ts_col, value_col]).map_batches(
        _prep, batch_format="pyarrow", zero_copy_batch=True)
    key_type = events.schema().base_schema.field(key_col).type
    out_schema = pa.schema([(key_col, key_type), (id_col, pa.int64()),
                            ("win_n", pa.int64()),
                            ("win_avg", pa.float64())])
    return hash_group_apply(
        keyed, [key_col],
        functools.partial(_rolling_group, key_col=key_col, ts_col=ts_col,
                          id_col=id_col, w=w, fx_scale=fx_scale),
        n_parts=n_parts, plasma_schema=out_schema)


# --------------------------------------------------------------------------
# Global row numbering (total-order ordinal assignment)
# --------------------------------------------------------------------------

def global_row_number(ds, sort_keys, pos_col: str = "pos"):
    """SQL ``row_number() OVER (ORDER BY …)`` — a total-order ordinal an
    operator Ray Data lacks.  ONE range-partitioned sort (the unavoidable
    all-to-all), then ordinals derive without further data movement:
    per-block row counts come from O(#blocks) metadata-sized remote
    calls, the exclusive prefix sum is computed on the driver (ints, one
    per block), and each block appends ``offset + arange`` in place.

    ``sort_keys`` must be a total order (unique key tuples) for the
    ordinals to be deterministic across partitionings."""
    import ray
    import ray.data as rd

    mat = ds.sort(sort_keys).materialize()
    try:
        # block lengths straight from block METADATA — nothing fetches
        pairs = [blk for bundle in mat.iter_internal_ref_bundles()
                 for blk in bundle.blocks]
        refs = [r for r, _ in pairs]
        lens = [m.num_rows for _, m in pairs]
        if any(n is None for n in lens):
            raise ValueError("missing row counts")
    except Exception:
        # fallback if the bundle API shifts: count via per-block tasks
        refs = mat.to_arrow_refs()

        @ray.remote
        def _nrows(t: pa.Table) -> int:
            return t.num_rows

        lens = ray.get([_nrows.remote(r) for r in refs])
    if not refs:
        return mat

    @ray.remote
    def _tag(t, off: int) -> pa.Table:
        import ray.data.block as _blk

        t = _blk.BlockAccessor.for_block(t).to_arrow()
        return t.append_column(
            pos_col, pa.array(off + np.arange(t.num_rows, dtype=np.int64)))

    offs = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return rd.from_arrow_refs(
        [_tag.remote(r, int(o)) for r, o in zip(refs, offs)])


def anomaly_windows(events, key_col: str = "event_type",
                    ts_col: str = "ts", window_us: int = 86_400_000_000,
                    k: int = 3, n_parts: int = 16):
    """Windowed anomaly detection: tumbling per-key window counts, then
    flag windows whose count deviates from the key's mean by more than
    ``k`` standard deviations — decided by the EXACT integer z² test
    ``(n·c − S)² > k²·(n·Q − S²)`` (no float stddev; the group_outliers
    rule applied to window counts), so the whole detector replays in
    SQL.  Only windows PRESENT in the data participate (empty windows
    are not imputed — documented semantic).

    Shape: per-block (key, window, n) combine → one (key) co-partition
    computes the stats and flags in-group.  Returns
    (key, window, cnt, is_anomaly)."""
    import functools

    from trustfuse_ray.stages.common import hash_group_apply

    def _partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch[ts_col].cast(pa.int64()), dtype=np.int64)
        win = ts // np.int64(window_us)
        t = pa.table({key_col: batch[key_col],
                      "window": pa.array(win, pa.int64())})
        return (t.group_by([key_col, "window"])
                .aggregate([("window", "count")])
                .rename_columns([key_col, "window", "n"]))

    def _flag(group: pa.Table) -> pa.Table:
        wins = np.asarray(group["window"], dtype=np.int64)
        ns = np.asarray(group["n"], dtype=np.int64)
        # finish the global per-window combine
        order = np.argsort(wins, kind="stable")
        wins, ns = wins[order], ns[order]
        starts = np.nonzero(np.concatenate(([True],
                                            wins[1:] != wins[:-1])))[0]
        uw = wins[starts]
        cnt = np.add.reduceat(ns, starts)
        n = len(uw)
        s = int(cnt.sum())
        q = int((cnt.astype(object) ** 2).sum())
        lhs = (n * cnt.astype(object) - s) ** 2
        rhs = (k * k) * (n * q - s * s)
        flag = np.array([int(a > rhs) for a in lhs], dtype=np.int64)
        return pa.table({
            key_col: pa.array([group[key_col][0].as_py()] * n,
                              pa.string()),
            "window": pa.array(uw, pa.int64()),
            "cnt": pa.array(cnt.astype(np.int64)),
            "is_anomaly": pa.array(flag)})

    return hash_group_apply(
        events.select_columns([key_col, ts_col]).map_batches(
            _partial, batch_format="pyarrow", zero_copy_batch=True),
        [key_col], _flag, n_parts=n_parts,
        plasma_schema=pa.schema([(key_col, pa.string()),
                                 ("window", pa.int64()),
                                 ("cnt", pa.int64()),
                                 ("is_anomaly", pa.int64())]))


def active_users(events, user_col: str = "user_id", ts_col: str = "ts",
                 day_us: int = 86_400_000_000):
    """Daily + weekly active users: distinct ``user_col`` per tumbling
    day and per 7-day week (week = day // 7 — exact integer µs
    arithmetic).  Per-block distinct (period, user) combiners bound the
    exchange by active users per block; two small groupbys finish.
    Returns (period_kind, period, n_active)."""
    def _partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch[ts_col].cast(pa.int64()), dtype=np.int64)
        day = ts // np.int64(day_us)
        t = pa.table({
            "kind": pa.array(["day"] * len(ts) + ["week"] * len(ts),
                             pa.string()),
            "period": pa.array(np.concatenate([day, day // 7]),
                               pa.int64()),
            "user": pa.array(np.concatenate([
                np.asarray(batch[user_col].cast(pa.int64()),
                           dtype=np.int64)] * 2)),
        })
        return t.group_by(["kind", "period", "user"]).aggregate([])

    distinct = (events.select_columns([user_col, ts_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["kind", "period", "user"]).count()
        .drop_columns(["count()"]))

    def _count(batch: pa.Table) -> pa.Table:
        t = pa.table({"period_kind": batch["kind"],
                      "period": batch["period"]})
        return (t.group_by(["period_kind", "period"])
                .aggregate([("period", "count")])
                .rename_columns(["period_kind", "period", "n"]))

    return (distinct.map_batches(_count, batch_format="pyarrow",
                                 zero_copy_batch=True)
            .groupby(["period_kind", "period"]).sum("n")
            .rename_columns({"sum(n)": "n_active"}))


def rolling_active_users(events, window_days: int = 7,
                         user_col: str = "user_id", ts_col: str = "ts",
                         day_us: int = 86_400_000_000):
    """Rolling ``window_days``-day active users per day: for each day d,
    distinct users active in (d − window + 1 .. d).  Exact (no sketch):
    each distinct (day, user) pair fans out to the ``window_days`` window
    days it contributes to, and a second distinct+count finishes — the
    exchange is bounded by (active users per day) × window, never by raw
    events.  Days with no active window are absent.  Returns
    (day, n_active)."""
    def _partial(batch: pa.Table) -> pa.Table:
        ts = np.asarray(batch[ts_col].cast(pa.int64()), dtype=np.int64)
        day = ts // np.int64(day_us)
        t = pa.table({
            "day": pa.array(day, pa.int64()),
            "user": pa.array(np.asarray(batch[user_col].cast(pa.int64()),
                                        dtype=np.int64))})
        return t.group_by(["day", "user"]).aggregate([])

    day_user = (events.select_columns([user_col, ts_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "user"]).count().drop_columns(["count()"]))

    def _fanout(batch: pa.Table) -> pa.Table:
        day = np.asarray(batch["day"], dtype=np.int64)
        user = np.asarray(batch["user"], dtype=np.int64)
        w = np.arange(window_days, dtype=np.int64)
        wday = (day[:, None] + w[None, :]).ravel()
        wuser = np.repeat(user, window_days)
        return pa.table({"day": pa.array(wday, pa.int64()),
                         "user": pa.array(wuser, pa.int64())})

    windowed = (day_user.map_batches(_fanout, batch_format="pyarrow",
                                     zero_copy_batch=True)
                .groupby(["day", "user"]).count().drop_columns(["count()"]))

    def _count(batch: pa.Table) -> pa.Table:
        return (batch.select(["day"]).group_by(["day"])
                .aggregate([("day", "count")])
                .rename_columns(["day", "n"]))

    return (windowed.map_batches(_count, batch_format="pyarrow",
                                 zero_copy_batch=True)
            .groupby("day").sum("n")
            .rename_columns({"sum(n)": "n_active"}))


def event_dedup_window(events, window_s: int = 600,
                       user_col: str = "user_id",
                       type_col: str = "event_type", ts_col: str = "ts",
                       id_col: str = "event_id"):
    """At-least-once delivery compaction: events of the same
    (user, type) inside one tumbling ``window_s`` window are duplicates;
    the smallest event_id survives — the idempotency-window dedup every
    ingestion pipeline runs before sessionization.  Pure hash-shuffle
    min-combine (groupby min), no sort.  Returns
    (user_id, event_type, w, event_id)."""
    win_us = int(window_s) * 1_000_000

    def _key(batch: pa.Table) -> pa.Table:
        w = pc.divide(batch[ts_col].cast(pa.int64()),
                      pa.scalar(win_us, pa.int64()))
        return pa.table({user_col: batch[user_col],
                         type_col: batch[type_col],
                         "w": w,
                         id_col: batch[id_col]})

    return (events.select_columns([user_col, type_col, ts_col, id_col])
            .map_batches(_key, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby([user_col, type_col, "w"]).min(id_col)
            .rename_columns({f"min({id_col})": id_col}))


def session_type_pairs(events, gap_minutes: float = 30.0,
                       key_col: str = "user_id", ts_col: str = "ts",
                       id_col: str = "event_id",
                       type_col: str = "event_type", n_parts: int = 16):
    """Within-session behaviour co-occurrence (market-basket over
    sessions): for every unordered pair of event types observed in the
    SAME session, the number of sessions containing both.  The "what do
    users do together" analytic feeding funnel design.

    Shape: sessionization stays per-key in-group (one user exchange,
    sessions numbered per key); distinct types per session emit
    O(|types|²) pair partials (event-type domain is tiny); one tiny pair
    groupby finishes."""
    def _pairs_group(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[
            (ts_col, "ascending"), (id_col, "ascending")])
        g = group.take(order)
        ts = g[ts_col].cast(pa.int64()).to_numpy()
        gap_us = int(gap_minutes * 60 * 1_000_000)
        brk = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            brk[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(brk)
        types = g[type_col].to_pylist()
        per_session: dict[int, set] = {}
        for s, t in zip(sid, types):
            per_session.setdefault(int(s), set()).add(t)
        a_out, b_out = [], []
        for tset in per_session.values():
            tl = sorted(tset)
            for i, x in enumerate(tl):
                for y in tl[i + 1:]:
                    a_out.append(x)
                    b_out.append(y)
        return pa.table({
            "type_a": pa.array(a_out, pa.string()),
            "type_b": pa.array(b_out, pa.string()),
            "n": pa.array(np.ones(len(a_out), np.int64))})

    from trustfuse_ray.stages.common import hash_group_apply

    partials = hash_group_apply(
        events.select_columns([key_col, ts_col, id_col, type_col]),
        [key_col], _pairs_group, n_parts=n_parts,
        plasma_schema=pa.schema([("type_a", pa.string()),
                                 ("type_b", pa.string()),
                                 ("n", pa.int64())]))
    return (partials.groupby(["type_a", "type_b"]).sum("n")
            .rename_columns({"sum(n)": "n_sessions"}))


def gap_histogram(events, user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts",
                  id_col: str = "event_id", n_parts: int = 16):
    """Burstiness profile: per event type, the log2-bucketed histogram
    of inter-arrival gaps between a user's consecutive events of that
    type (bucket = bit_length(gap_seconds + 1)) — the arrival-process
    fingerprint capacity planning and anomaly baselines read.

    Shape: ONE user co-partition; gaps derive from a single lexsort by
    (type, ts, id) inside the group (runs per type, vectorized diff);
    the exchange out is the tiny (type, bucket) count table."""
    def _gaps(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[
            (type_col, "ascending"), (ts_col, "ascending"),
            (id_col, "ascending")])
        g = group.take(order)
        types = g[type_col].to_pandas().to_numpy(dtype=object)
        ts = np.asarray(g[ts_col].cast(pa.int64()), dtype=np.int64)
        n = len(ts)
        empty = pa.schema([(type_col, pa.string()),
                           ("bucket", pa.int64()),
                           ("n", pa.int64())]).empty_table()
        if n < 2:
            return empty
        same = types[1:] == types[:-1]
        if not same.any():
            return empty
        gaps_s = (ts[1:] - ts[:-1])[same] // 1_000_000
        buckets = np.array([int(x + 1).bit_length() for x in gaps_s],
                           dtype=np.int64)
        t = pa.table({type_col: pa.array(types[1:][same]),
                      "bucket": pa.array(buckets, pa.int64())})
        return (t.group_by([type_col, "bucket"])
                .aggregate([("bucket", "count")])
                .rename_columns([type_col, "bucket", "n"]))

    from trustfuse_ray.stages.common import hash_group_apply

    partials = hash_group_apply(
        events.select_columns([user_col, type_col, ts_col, id_col]),
        [user_col], _gaps, n_parts=n_parts,
        plasma_schema=pa.schema([(type_col, pa.string()),
                                 ("bucket", pa.int64()),
                                 ("n", pa.int64())]))
    return (partials.groupby([type_col, "bucket"]).sum("n")
            .rename_columns({"sum(n)": "n"}))


def peak_windows(events, window_s: int = 3600,
                 type_col: str = "event_type", ts_col: str = "ts",
                 n_parts: int = 8):
    """Peak detection: per event type, the single busiest tumbling
    ``window_s`` window (most events; ties to the earliest window) —
    the capacity-planning headline next to the full anomaly scan.

    Shape: (type, window) counts reduce from per-block partials; the
    per-type argmax runs in a tiny type co-partition."""
    win_us = int(window_s) * 1_000_000

    def _key(batch: pa.Table) -> pa.Table:
        w = pc.divide(batch[ts_col].cast(pa.int64()),
                      pa.scalar(win_us, pa.int64()))
        t = pa.table({type_col: batch[type_col], "w": w})
        return (t.group_by([type_col, "w"])
                .aggregate([("w", "count")])
                .rename_columns([type_col, "w", "n"]))

    counts = (events.select_columns([type_col, ts_col]).map_batches(
        _key, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([type_col, "w"]).sum("n")
        .rename_columns({"sum(n)": "n"}))

    def _best(group: pa.Table) -> pa.Table:
        ws = np.asarray(group["w"], dtype=np.int64)
        ns = np.asarray(group["n"], dtype=np.int64)
        best = None
        for w, n in zip(ws, ns):
            if best is None or n > best[1] or (n == best[1]
                                              and w < best[0]):
                best = (int(w), int(n))
        return pa.table({
            type_col: group[type_col][:1],
            "peak_window": pa.array([best[0]], pa.int64()),
            "n_events": pa.array([best[1]], pa.int64())})

    from trustfuse_ray.stages.common import hash_group_apply

    return hash_group_apply(
        counts, [type_col], _best, n_parts=n_parts,
        plasma_schema=pa.schema([(type_col, pa.string()),
                                 ("peak_window", pa.int64()),
                                 ("n_events", pa.int64())]))


def user_gap_median(events, user_col: str = "user_id", ts_col: str = "ts",
                    id_col: str = "event_id", n_parts: int = 16):
    """Per-user exact inter-arrival median: gaps (µs) between a user's
    consecutive events ordered by (ts, id), reduced to the LOWER
    order-statistic median (0-based rank ``(n−1)//2`` of the sorted
    gaps) — deterministic, no interpolation, so the audit is
    bit-replayable by SQL.  Users with fewer than two events are
    omitted.  Returns ``(user_id, n_gaps, med_gap_us)``.

    Scale shape: ONE user co-partition; gap derivation, gap sort and the
    order-stat pick all happen inside the group (vectorized diff +
    np.partition), and the exchange out is one row per user."""
    def _med(group: pa.Table) -> pa.Table:
        empty = pa.schema([(user_col, pa.int64()),
                           ("n_gaps", pa.int64()),
                           ("med_gap_us", pa.int64())]).empty_table()
        if len(group) < 2:
            return empty
        order = pc.sort_indices(group, sort_keys=[
            (ts_col, "ascending"), (id_col, "ascending")])
        g = group.take(order)
        ts = np.asarray(g[ts_col].cast(pa.int64()), dtype=np.int64)
        gaps = ts[1:] - ts[:-1]
        k = (len(gaps) - 1) // 2
        med = int(np.partition(gaps, k)[k])
        return pa.table({
            user_col: g[user_col][:1].cast(pa.int64()),
            "n_gaps": pa.array([len(gaps)], pa.int64()),
            "med_gap_us": pa.array([med], pa.int64()),
        })

    from trustfuse_ray.stages.common import hash_group_apply

    return hash_group_apply(
        events.select_columns([user_col, ts_col, id_col]),
        [user_col], _med, n_parts=n_parts,
        plasma_schema=pa.schema([(user_col, pa.int64()),
                                 ("n_gaps", pa.int64()),
                                 ("med_gap_us", pa.int64())]))


def user_mad_outliers(events, user_col: str = "user_id",
                      value_col: str = "value", k: int = 3,
                      n_parts: int = 32):
    """Robust per-user anomaly profile: lower-median and lower-MAD of
    the user's value stream in exact int64 cents, plus how many of the
    user's events sit more than ``k``·MAD from the median — the
    outlier screen that, unlike z-scores, one whale event cannot
    poison.

    Shape: one (user) co-partition of (user, cents); both order
    statistics and the outlier count compute in-group with one numpy
    sort — no global sort, one row out per user."""
    from trustfuse_ray.stages.common import hash_group_apply

    def _cents(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col], dtype=np.float64) * 100.0
        cents = np.where(v >= 0, np.floor(v + 0.5),
                         -np.floor(-v + 0.5)).astype(np.int64)
        return pa.table({user_col: batch[user_col].cast(pa.int64()),
                         "cents": pa.array(cents, pa.int64())})

    out_schema = pa.schema([(user_col, pa.int64()),
                            ("n_events", pa.int64()),
                            ("med_cents", pa.int64()),
                            ("mad_cents", pa.int64()),
                            ("n_outliers", pa.int64())])

    def _stats(group: pa.Table) -> pa.Table:
        x = np.sort(np.asarray(group["cents"], dtype=np.int64))
        n = len(x)
        med = int(x[(n - 1) // 2])
        dev = np.sort(np.abs(x - med))
        mad = int(dev[(n - 1) // 2])
        n_out = int((np.abs(x - med) > k * mad).sum())
        return pa.table({
            user_col: group[user_col][:1],
            "n_events": pa.array([n], pa.int64()),
            "med_cents": pa.array([med], pa.int64()),
            "mad_cents": pa.array([mad], pa.int64()),
            "n_outliers": pa.array([n_out], pa.int64())})

    return hash_group_apply(
        events.select_columns([user_col, value_col]).map_batches(
            _cents, batch_format="pyarrow", zero_copy_batch=True),
        [user_col], _stats, n_parts=n_parts, plasma_schema=out_schema)


def purchase_attribution(events, window_us: int = 7 * 86_400_000_000,
                         conv_type: str = "purchase",
                         touch_type: str = "click", n_parts: int = 32):
    """First/last-touch attribution: for every conversion event, the
    first and last touch event by the same user inside the lookback
    window (ties on ts break by event_id) plus the touch count — the
    credit-assignment join behind funnel ROI reports.

    Shape: one user co-partition; in-group the touches sort once by
    (ts, id) and every conversion finds its window with two
    searchsorted probes — no per-(conversion, touch) blowup leaves the
    group.  Conversions with no touch keep -1 sentinels."""
    import pyarrow.compute as pc

    from trustfuse_ray.stages.common import hash_group_apply

    def _slim(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array([conv_type, touch_type]))
        t = batch.filter(keep)
        return pa.table({
            "user_id": t["user_id"].cast(pa.int64()),
            "event_id": t["event_id"].cast(pa.int64()),
            "ts_us": t["ts"].cast(pa.int64()),
            "is_conv": pc.equal(t["event_type"], conv_type)})

    out_schema = pa.schema([("purchase_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("n_touches", pa.int64()),
                            ("first_touch_id", pa.int64()),
                            ("last_touch_id", pa.int64())])

    def _attr(group: pa.Table) -> pa.Table:
        conv = np.asarray(group["is_conv"], dtype=bool)
        ids = np.asarray(group["event_id"], dtype=np.int64)
        ts = np.asarray(group["ts_us"], dtype=np.int64)
        if not conv.any():
            return out_schema.empty_table()
        cts, cid = ts[conv], ids[conv]
        tts, tid = ts[~conv], ids[~conv]
        order = np.lexsort((tid, tts))
        tts, tid = tts[order], tid[order]
        if len(tid):
            lo = np.searchsorted(tts, cts - window_us, side="left")
            hi = np.searchsorted(tts, cts, side="right")
            n = (hi - lo).astype(np.int64)
            has = n > 0
            first = np.where(has, tid[np.minimum(lo, len(tid) - 1)], -1)
            last = np.where(has, tid[np.maximum(hi - 1, 0)], -1)
        else:
            n = np.zeros(len(cid), np.int64)
            first = np.full(len(cid), -1, np.int64)
            last = np.full(len(cid), -1, np.int64)
        corder = np.lexsort((cid,))
        return pa.table({
            "purchase_id": pa.array(cid[corder], pa.int64()),
            "user_id": pa.array(
                np.full(len(cid), int(group["user_id"][0].as_py()),
                        np.int64)),
            "n_touches": pa.array(n[corder], pa.int64()),
            "first_touch_id": pa.array(first[corder], pa.int64()),
            "last_touch_id": pa.array(last[corder], pa.int64())})

    return hash_group_apply(
        events.select_columns(["user_id", "event_id", "ts",
                               "event_type"]).map_batches(
            _slim, batch_format="pyarrow", zero_copy_batch=True),
        ["user_id"], _attr, n_parts=n_parts, plasma_schema=out_schema)
