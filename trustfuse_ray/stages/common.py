"""Shared distributed-grouping helper.

``hash_group_apply`` is the engine's standard replacement for
``groupby(keys).map_groups(fn)`` when the number of groups is large: it
shuffles once on ``hash(keys) % n_parts`` and applies ``fn`` to each
key-group *inside* a partition task, amortizing per-group Arrow/table
overhead (Ray's map_groups builds one pa.Table per group — ~1ms each, which
dominates wall time at 10^4+ groups)."""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def ensure_fsspec_http_stub() -> None:
    """Make ``from fsspec.implementations.http import HTTPFileSystem`` safe
    under concurrent threads.

    This environment has fsspec but no aiohttp, so that import fails with
    ModuleNotFoundError — which Ray's path resolution catches — but a failed
    import is retried on EVERY call, and two threads racing the retry can
    observe a partially-initialized module and raise a bare ImportError that
    Ray does NOT catch.  Installing a sentinel module (class never
    instantiated without HTTP paths) makes the import idempotent."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ModuleNotFoundError:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # pragma: no cover - sentinel only
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod
    except ImportError:
        pass  # partially imported by a concurrent thread; leave as is


def auto_pool(lo: int | None = None) -> tuple[int, int]:
    """Default actor-pool bounds: max scales to the cluster's CPUs; min is
    a quarter of that so heavy stages don't wait on autoscaler ramp-up."""
    try:
        import ray
        n = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        n = 8
    if lo is None:
        lo = max(1, n // 4)
    return (lo, max(4, n))


def fnv64(s: str) -> int:
    h = 0xCBF29CE484222325
    for ch in s.encode():
        h = ((h ^ ch) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h & 0x7FFFFFFFFFFFFFFF


def _add_part(batch: pa.Table, *, keys: list[str], n_parts: int) -> pa.Table:
    # vectorized stable partition hash (pandas SipHash with a fixed key over
    # the "|"-joined key string) — same pattern as fuse.base._add_partition_col
    import pandas as pd

    joined = None
    for k in keys:
        col = batch[k].cast(pa.string()).to_pandas().astype(str)
        joined = col if joined is None else joined.str.cat(col, sep="|")
    part = (pd.util.hash_array(joined.to_numpy(dtype=object))
            % np.uint64(n_parts)).astype(np.int32)
    return batch.append_column("__part", pa.array(part, pa.int32()))


def _apply_groups(batch: pa.Table, *, keys: list[str], fn,
                  min_group_size: int = 1) -> pa.Table:
    if "__part" in batch.column_names:
        batch = batch.drop_columns(["__part"])
    order = pc.sort_indices(
        batch, sort_keys=[(k, "ascending") for k in keys])
    batch = batch.take(order)
    n = len(batch)
    if n == 0:
        return fn(batch)
    # vectorized group-boundary detection: a row starts a new group when ANY
    # key column differs from the previous row (column-wise compare — no
    # joined-string collisions possible)
    neq = np.zeros(n - 1, dtype=bool)
    for k in keys:
        col = np.asarray(batch[k].to_pandas(), dtype=object)
        neq |= col[1:] != col[:-1]
    starts = np.concatenate(([0], np.nonzero(neq)[0] + 1))
    ends = np.concatenate((starts[1:], [n]))
    outs = []
    for s, e in zip(starts, ends):
        if e - s >= min_group_size:
            outs.append(fn(batch.slice(s, e - s)))
    outs = [o for o in outs if o is not None and len(o)]
    if not outs:
        return fn(batch.slice(0, 0))
    return pa.concat_tables(outs)


def list_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, dim) ndarray from a fixed-width list column — one flatten (offset
    -safe, unlike ``.values``) + reshape instead of a per-row
    ``to_pylist``/``np.stack`` Python loop."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    return np.asarray(col.flatten(), dtype=dtype).reshape(n, -1)


def sqdist(m: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Squared euclidean distance matrix (n, k) in the matmul form
    ``|m|^2 - 2 m.c^T + |c|^2`` — never allocates the (n, k, dim) broadcast
    tensor (~6 GB at 4k batch x 256 lists x dim 768)."""
    d = ((m * m).sum(axis=1)[:, None] - 2.0 * (m @ c.T)
         + (c * c).sum(axis=1)[None, :])
    np.maximum(d, 0.0, out=d)
    return d


def hash_group_apply(ds, keys: list[str], fn, n_parts: int = 64,
                     min_group_size: int = 1,
                     plasma_schema: pa.Schema | None = None):
    """groupby(keys).map_groups(fn) with one hash shuffle and partition-level
    group iteration.  ``fn`` receives one pa.Table per key group; groups
    smaller than ``min_group_size`` are skipped (e.g. singleton LSH buckets
    can never produce a pair).

    ``plasma_schema`` (fn's OUTPUT schema) opts into the plasma task
    exchange instead of Ray's sample+sort groupby: the ``__part`` id is
    already computed, so the sort and its ~1-2 s fixed cost per call are
    pure overhead.  Plasma gathers every partition — including empty ones,
    which the groupby route never materializes — so the output schema must
    be declared up front to type them."""
    keyed = ds.map_batches(
        functools.partial(_add_part, keys=keys, n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True)
    if plasma_schema is not None:
        def _fn_typed(g: pa.Table) -> pa.Table:
            if len(g) == 0:
                return plasma_schema.empty_table()
            return fn(g)

        def _apply(tbl: pa.Table) -> pa.Table:
            if len(tbl) == 0:
                return plasma_schema.empty_table()
            return _apply_groups(tbl, keys=keys, fn=_fn_typed,
                                 min_group_size=min_group_size)

        mat = keyed.materialize()
        sch = mat.schema()
        in_schema = (pa.schema(list(zip(sch.names, sch.types)))
                     if sch is not None and sch.names else None)
        return plasma_exchange([mat], _apply, n_parts,
                               part_col="__part", empty_schema=in_schema)
    return keyed.groupby("__part").map_groups(
        functools.partial(_apply_groups, keys=keys, fn=fn,
                          min_group_size=min_group_size),
        batch_format="pyarrow")


def plasma_exchange(inputs, fn, n_parts: int, part_col: str = "__p",
                    empty_schema: pa.Schema | None = None):
    """Hand-rolled hash exchange for PRE-PARTITIONED rows: ``inputs`` is a
    list of Datasets whose rows already carry ``part_col`` in [0, n_parts);
    returns a Dataset of ``fn(partition_table)`` outputs.
    ``empty_schema`` (the static input-row schema, including ``part_col``)
    makes empty/schema-less blocks — an empty corpus materializes to zero
    blocks, or to blocks with no columns — flow through as typed empty
    tables instead of crashing the split/gather tasks.

    Ray Data's ``groupby`` runs a sample+sort exchange with ~1-2 s fixed
    cost per call; when the partition id is already computed this two-wave
    task exchange (split each block → ``ray.put`` pieces into plasma →
    gather+apply per partition) does the same data movement with plain
    tasks and no sort.  The pieces are plasma-put explicitly — small task
    returns would live in the driver's in-process store and every gather
    fetch would serialize through the driver (the pack-exchange lesson,
    fuse/base.py::_make_split_task)."""
    import ray
    import ray.data as rd

    @ray.remote
    def _split(tbl: pa.Table):
        import pyarrow.compute as pc_

        if part_col not in tbl.column_names:
            # schema-less empty block (a filter that dropped every row can
            # emit zero-column tables); only legal when actually empty
            if len(tbl):
                raise ValueError(f"non-empty block missing {part_col}")
            tbl = (empty_schema if empty_schema is not None
                   else pa.schema([(part_col, pa.int32())])).empty_table()
        order = pc_.sort_indices(tbl, sort_keys=[(part_col, "ascending")])
        tbl = tbl.take(order)
        parr = np.asarray(tbl[part_col], dtype=np.int64)
        bounds = np.searchsorted(parr, np.arange(n_parts + 1))
        # Ownership: these plasma objects are owned by this (short-lived)
        # task's worker.  That is safe because the gather wave is submitted
        # immediately after the split wave resolves and fetches every piece
        # exactly once; workers are reused between waves, so the owner
        # stays alive for the pieces' whole lifetime.  If this exchange is
        # ever made multi-wave/lazy, put with _owner= a long-lived actor.
        return [ray.put(tbl.slice(bounds[i], bounds[i + 1] - bounds[i]))
                for i in range(n_parts)]

    @ray.remote
    def _gather(piece_refs):
        # every piece is a (possibly empty) slice carrying the full schema,
        # so fn always sees a typed table and returns a typed result.
        # Pieces from schema-less empty blocks may carry only the part
        # column — anchor on the widest schema and drop the (empty)
        # mismatched pieces
        tables = ray.get(list(piece_refs))
        base = max(tables, key=lambda t: t.num_columns)
        good = [t.cast(base.schema) for t in tables
                if t.num_columns == base.num_columns]
        tbl = pa.concat_tables(good)
        if part_col in tbl.column_names:
            tbl = tbl.drop_columns([part_col])
        return fn(tbl)

    mats = [ds.materialize() for ds in inputs]
    block_refs = []
    for m in mats:
        block_refs.extend(m.to_arrow_refs())
    if not block_refs:
        # zero-block input (e.g. empty corpus): feed every partition one
        # schema-typed empty table so fn still sees typed columns
        sch = empty_schema
        if sch is None:
            for m in mats:
                s = m.schema()
                if s is not None and s.names:
                    sch = (s.base_schema if hasattr(s, "base_schema")
                           else pa.schema(list(zip(s.names, s.types))))
                    break
        if sch is None:
            sch = pa.schema([(part_col, pa.int64())])
        empty_ref = ray.put(sch.empty_table())
        piece_lists = [[empty_ref] * n_parts]
    else:
        piece_lists = ray.get([_split.remote(r) for r in block_refs])
    out_refs = [_gather.remote([pl[p] for pl in piece_lists])
                for p in range(n_parts)]
    return rd.from_arrow_refs(out_refs)


def pairwise_cluster_metrics(labeled, pred_col: str, truth_col: str,
                             count_name: str = "n_items"):
    """Exact pairwise cluster-evaluation counts — the standard
    record-linkage / dedup metric: over one row per item carrying a
    predicted group label and a truth group label, a pair of items is
    predicted-same when labels in ``pred_col`` match and truth-same when
    labels in ``truth_col`` match.  Pair totals are sums of C(n,2) per
    group (exact int64); precision/recall are the two BIGINT→DOUBLE
    divisions DuckDB performs bit-identically.

    Shape: the input materializes ONCE; each of the three rollups
    (pred / truth / pred×truth) is a groupby-count whose map-side
    combine reduces the item stream to group sizes, then a C(n,2) map
    and a scalar sum — nothing larger than the item table shuffles, and
    only counts reach the driver.

    Returns a ONE-ROW pa.Table: <count_name>, n_pred_pairs,
    n_true_pairs, n_correct_pairs, pair_precision, pair_recall."""
    mm = labeled.materialize()

    def _pairs(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["count()"], dtype=np.int64)
        return pa.table({"pairs": pa.array(n * (n - 1) // 2, pa.int64())})

    def _pair_sum(keys: list[str]) -> int:
        s = (mm.groupby(keys).count()
             .map_batches(_pairs, batch_format="pyarrow",
                          zero_copy_batch=True).sum("pairs"))
        return int(s or 0)

    n_pred = _pair_sum([pred_col])
    n_true = _pair_sum([truth_col])
    n_corr = _pair_sum([pred_col, truth_col])
    n_items = mm.count()
    return pa.table({
        count_name: pa.array([n_items], pa.int64()),
        "n_pred_pairs": pa.array([n_pred], pa.int64()),
        "n_true_pairs": pa.array([n_true], pa.int64()),
        "n_correct_pairs": pa.array([n_corr], pa.int64()),
        "pair_precision": pa.array(
            [float(n_corr) / float(n_pred) if n_pred else None],
            pa.float64()),
        "pair_recall": pa.array(
            [float(n_corr) / float(n_true) if n_true else None],
            pa.float64()),
    })

