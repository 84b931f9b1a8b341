"""Distributed fusion infrastructure (SURVEY.md §7.4).

The reference's fusion models all share one shape
(`/root/reference/trustfuse/models/model.py:49-63`): a claim matrix grouped by
fact = (entity, attr), plus a *global per-source* weight vector, co-iterated
≤ ~10–100 rounds.  The distributed re-expression:

1. ONE shuffle packs the long claim table into per-fact rows
   (``pack_facts``: hash(bucket_id, entity) partitioning → one packed row
   per (entity, attr)), materialized once and reused by every round of
   every model (``FusionSession``).
2. Each round recomputes the per-fact truth from the broadcast global
   state — truth is a pure function of the weights, so it is never
   stored — and pre-combines per-source partial statistics inside the
   shard (combiner): one tiny (N_CHANNELS × n_sources) matrix per shard.
3. The driver sums the KB-scale partials, applies the model's reduce step
   and broadcasts the new state into the next round.  Small packed tables
   iterate on the driver; large ones on a persistent pool of fact-shard
   actors (the documented raw-actor exception for iterative global state —
   a round is one ms-scale RPC per shard, not a streaming-executor launch).
4. A final pass over the shards emits the fused triple table back into a
   Dataset.

Claims within a fact are kept in ascending ``claim_id`` order — the engine's
deterministic stand-in for the reference's nondeterministic ``set()``
iteration order (SURVEY.md §7.5 tie-breaking).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

N_CHANNELS = 4  # per-source partial-stat channels (models use a prefix)


@dataclass
class Fact:
    bucket_id: int
    entity: str
    attr: str
    vtype: str
    src_idx: np.ndarray      # int32, per claim
    values: np.ndarray       # object (str) or float64, per claim
    claim_ids: np.ndarray    # int64, per claim
    # per-fact kernel memo (round-invariant precomputations, e.g.
    # TruthFinder's pairwise similarity matrix).  Facts are parsed once per
    # FusionSession and live for all rounds, so anything that depends only
    # on the claim values is computed exactly once here.
    cache: dict = field(default_factory=dict, compare=False, repr=False)

    @property
    def is_numeric(self) -> bool:
        return self.values.dtype.kind == "f"


class FusionModel:
    """Protocol for reference-faithful fusion models.

    State is a dict per bucket (tiny: O(#sources) numpy arrays).  Rounds run
    until ``n_rounds`` or until ``reduce`` reports convergence.
    """

    name: str = "base"
    numeric_only: bool = False
    n_rounds: int = 1

    def initial_state(self, sources: list[str], counts: np.ndarray) -> dict:
        raise NotImplementedError

    def accumulate(self, fact: Fact, state: dict, out: np.ndarray) -> None:
        """Add this fact's per-source partials into ``out``
        (shape (N_CHANNELS, n_sources))."""
        raise NotImplementedError

    def reduce(self, state: dict, stats: np.ndarray, counts: np.ndarray,
               round_no: int) -> tuple[dict, bool]:
        """Combine global stats → new state; returns (state, converged)."""
        raise NotImplementedError

    def fact_truth(self, fact: Fact, state: dict) -> tuple[list, float]:
        """Final truth values (list, multi-truth capable) + confidence."""
        raise NotImplementedError

    def weights(self, state: dict) -> np.ndarray:
        return state["w"]


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def _numeric_claims_only(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.and_(pc.equal(batch["value_type"], "quantity"),
                                pc.is_valid(batch["value_num"])))


def _quantity_facts_only(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.equal(batch["value_type"], "quantity"))


_PACKED_ORDER = ("bucket_id", "entity", "attr", "value_type", "sources",
                 "values_str", "values_num", "claim_ids")


def _pack_partition(batch: pa.Table, dedup: bool = True) -> pa.Table:
    """One entity-hash partition → packed rows for every (bucket_id, entity,
    attr) fact it contains — fully Arrow-native (sort + ordered hash
    group-by with list/first aggregation; no per-row Python).

    Dedups exact repeated (source, value) assertions keeping the lowest
    claim_id (reference dedups identical re-assertions at dataset
    construction, `/root/reference/dataset_generation/generate_buckets.py:182-189`);
    claims within a fact are ordered by ascending claim_id (deterministic
    stand-in for the reference's insertion order — ``use_threads=False``
    makes the group-by scan order-preserving)."""
    if "fact_part" in batch.column_names:
        batch = batch.drop_columns(["fact_part"])
    batch = batch.take(
        pc.sort_indices(batch, sort_keys=[("claim_id", "ascending")]))
    if dedup:
        batch = pa.TableGroupBy(
            batch, ["bucket_id", "entity", "attr", "source", "value_str"],
            use_threads=False,
        ).aggregate([("value_num", "first"), ("value_type", "first"),
                     ("claim_id", "first")])
        batch = batch.rename_columns(
            [c.removesuffix("_first") for c in batch.column_names])
        batch = batch.take(
            pc.sort_indices(batch, sort_keys=[("claim_id", "ascending")]))
    g = pa.TableGroupBy(
        batch, ["bucket_id", "entity", "attr"], use_threads=False,
    ).aggregate([("value_type", "first"), ("source", "list"),
                 ("value_str", "list"), ("value_num", "list"),
                 ("claim_id", "list")])
    _renames = {
        "value_type_first": "value_type", "source_list": "sources",
        "value_str_list": "values_str", "value_num_list": "values_num",
        "claim_id_list": "claim_ids"}
    g = g.rename_columns([_renames.get(c, c) for c in g.column_names])
    g = g.take(pc.sort_indices(
        g, sort_keys=[("bucket_id", "ascending"), ("entity", "ascending"),
                      ("attr", "ascending")]))
    return g.select(list(_PACKED_ORDER))


def _add_partition_col(batch: pa.Table, *, n_parts: int) -> pa.Table:
    # vectorized stable hash (pandas SipHash with a fixed key) over the
    # (bucket, entity) shuffle key — a per-row Python hash is ~10x slower
    import pandas as pd

    ent = batch["entity"].to_pandas().astype(str)
    key = batch["bucket_id"].to_pandas().astype(str).str.cat(ent, sep="|")
    part = (pd.util.hash_array(key.to_numpy(dtype=object))
            % np.uint64(n_parts)).astype(np.int32)
    return batch.append_column("fact_part", pa.array(part, pa.int32()))


PACK_COLS = ("claim_id", "bucket_id", "source", "entity", "attr",
             "value_str", "value_num", "value_type")


def _project_pack_cols(batch: pa.Table) -> pa.Table:
    """Prune to the columns packing needs BEFORE the shuffle — lineage
    columns (raw_value, conv_id, turn_idx, ts) never leave the map side;
    reverse mapping recovers them later via the claim_id join."""
    return batch.select([c for c in PACK_COLS if c in batch.column_names])


def _combine_dedup(batch: pa.Table) -> pa.Table:
    """Per-block combiner: dedup (bucket, source, entity, attr, value) keeping
    the lowest claim_id BEFORE the pack shuffle.  This is the hot-entity skew
    guard: a source spamming the same triple millions of times contributes at
    most one row per block to the shuffle, so post-shuffle fact sizes are
    bounded by #sources x #distinct-values regardless of input skew
    (SURVEY.md §7.3 salting note; exact dedup per
    `/root/reference/dataset_generation/generate_buckets.py:182-189`)."""
    cols = batch.column_names
    keys = ["bucket_id", "source", "entity", "attr", "value_str"]
    batch = batch.take(
        pc.sort_indices(batch, sort_keys=[("claim_id", "ascending")]))
    out = pa.TableGroupBy(batch, keys, use_threads=False).aggregate(
        [(c, "first") for c in cols if c not in keys])
    out = out.rename_columns(
        [c.removesuffix("_first") for c in out.column_names])
    return out.select(cols)


def pack_facts(claims, numeric_only: bool = False, n_parts: int = 128,
               dedup_claims: bool = True):
    """Long claims Dataset → packed facts Dataset (the single fusion shuffle).

    The shuffle key is hash(bucket_id, entity) bucketed into ``n_parts``
    partitions — every fact's claims land in one partition, and partition-
    level packing amortizes per-group overhead over hundreds of entities.
    At cluster scale ``n_parts`` should be ~2-4x total cores.

    ``numeric_only`` mirrors ``focus_on_attributes(action="type_selection")``
    for numeric models (`/root/reference/trustfuse/models/model.py:41-45`):
    only quantity attrs with parseable numbers enter the claim matrix.

    ``dedup_claims``: the engine's default drops exact repeated
    (source, value) assertions (the reference's own dataset-construction
    dedup, `generate_buckets.py:182-189`, and the hot-entity skew guard).
    The reference's STATIC corpora (Book/Flight/Stock) keep duplicates in
    fusion — pass False for exact static-corpus parity (duplicates then
    boost truth votes while the fancy-index collapse still drops them from
    per-source weight sums, exactly as in the reference).
    """
    if numeric_only:
        claims = claims.map_batches(_numeric_claims_only,
                                    batch_format="pyarrow",
                                    zero_copy_batch=True)
    # a null value is "no claim" (the reference skips NaN cells,
    # model.py:145)
    claims = claims.map_batches(
        lambda b: b.filter(pc.is_valid(b["value_str"])),
        batch_format="pyarrow", zero_copy_batch=True)
    claims = claims.map_batches(_project_pack_cols, batch_format="pyarrow",
                                zero_copy_batch=True)
    if dedup_claims:
        claims = claims.map_batches(_combine_dedup, batch_format="pyarrow",
                                    zero_copy_batch=True)
    keyed = claims.map_batches(
        functools.partial(_add_partition_col, n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True)
    return keyed.groupby("fact_part").map_groups(
        functools.partial(_pack_partition, dedup=dedup_claims),
        batch_format="pyarrow")


def _batched_stats(facts, model, state, n_sources, cache: dict):
    """Shard-level vectorized stats for models exposing a batched kernel
    (fuse/vectorized.py); returns None → caller falls back to the per-fact
    accumulate loop.  Structures are built once per (model hyperparams,
    bucket) and reused across all rounds."""
    if getattr(model, "build_batch", None) is None:
        return None
    key = model.batch_key()
    structs = cache.get(key)
    if structs is None:
        by_bid: dict[int, list] = {}
        for f in facts:
            if model.numeric_only and not f.is_numeric:
                continue
            by_bid.setdefault(f.bucket_id, []).append(f)
        structs = cache[key] = {bid: model.build_batch(fl)
                                for bid, fl in by_bid.items()}
    outs = {bid: np.zeros((N_CHANNELS, n), dtype=np.float64)
            for bid, n in n_sources.items()}
    for bid, st in structs.items():
        if st is not None:
            model.accumulate_batch(st, state[bid], outs[bid])
    return outs


def iter_facts(batch: pa.Table, src_index: dict[int, dict[str, int]]
               ) -> Iterator[Fact]:
    """Packed rows → Fact structs, via ONE flat decode per column (list
    columns flatten to contiguous numpy/python arrays; the per-fact work is
    O(1) slicing — the old per-row to_pylist parse was the FusionSession's
    dominant setup cost)."""
    n = len(batch)
    if n == 0:
        return
    bids = np.asarray(batch["bucket_id"])
    ent_col = batch["entity"].to_pylist()
    attr_col = batch["attr"].to_pylist()
    vt_col = batch["value_type"].to_pylist()
    src_la = batch["sources"].combine_chunks()
    offs = np.asarray(src_la.offsets, dtype=np.int64)
    # Sliced ListArrays keep absolute offsets into the full child array.
    # Normalize: slice every child to the used window [lo, hi) and shift
    # offsets to start at 0 (no-op view when unsliced).  The pack stage
    # builds all four list columns with ALIGNED offsets, so one window
    # applies to all of them.
    lo, hi = int(offs[0]), int(offs[-1])
    offs = offs - lo
    lens = np.diff(offs)
    flat_src = src_la.values.slice(lo, hi - lo).to_pylist()
    vn_vals = batch["values_num"].combine_chunks().values.slice(lo, hi - lo)
    vn_flat = vn_vals.to_numpy(zero_copy_only=False)
    vn_valid = pc.is_valid(vn_vals).to_numpy(zero_copy_only=False)
    vs_flat = (batch["values_str"].combine_chunks().values
               .slice(lo, hi - lo).to_pylist())
    cid_flat = np.asarray(
        batch["claim_ids"].combine_chunks().values.slice(lo, hi - lo),
        dtype=np.int64)

    # per-claim source index: C-level hash-map lookup per bucket segment
    import pandas as pd
    src_ser = pd.Series(flat_src, dtype=object)
    ubids = np.unique(bids)
    if len(ubids) == 1:
        src_idx_flat = src_ser.map(src_index[int(ubids[0])]).to_numpy(
            dtype=np.int32)
    else:
        flat_bid = np.repeat(bids, lens)
        src_idx_flat = np.empty(len(src_ser), dtype=np.int32)
        for b in ubids:
            m = flat_bid == b
            src_idx_flat[m] = src_ser[m].map(src_index[int(b)]).to_numpy(
                dtype=np.int32)

    is_q = np.array([v == "quantity" for v in vt_col])
    # fact is numeric iff quantity-typed AND every claim parsed to a number
    # (cumsum difference instead of reduceat: safe for empty segments and
    # an empty trailing segment, where reduceat would misread/raise)
    cs = np.concatenate(([0], np.cumsum(vn_valid.astype(np.int64))))
    nvalid_per_fact = cs[offs[1:]] - cs[offs[:-1]]
    numeric = is_q & (nvalid_per_fact == lens)

    for i in range(n):
        s, e = offs[i], offs[i + 1]
        vals = (vn_flat[s:e] if numeric[i]
                else np.array(vs_flat[s:e], dtype=object))
        yield Fact(int(bids[i]), ent_col[i], attr_col[i], vt_col[i],
                   src_idx_flat[s:e], vals, cid_flat[s:e])


def _counts_table(t: pa.Table) -> dict[tuple[int, str], list]:
    """(bid, source) -> [facts_all, facts_quantity_numeric] for one packed
    table — the reference's fancy-index collapse (+1 per fact per DISTINCT
    source, model.py:178-182) as one segmented pass: flatten the sources
    list column, dictionary-encode, dedup (fact, source) occurrence pairs
    with one np.unique, then bincount by (bucket, source)."""
    n = len(t)
    if n == 0:
        return {}
    bids = np.asarray(t["bucket_id"], dtype=np.int64)
    src_col = t["sources"].combine_chunks()
    lens = np.asarray(pc.list_value_length(src_col), dtype=np.int64)
    enc = pc.dictionary_encode(pc.list_flatten(src_col))
    codes = np.asarray(enc.indices, dtype=np.int64)
    uniq_src = enc.dictionary.to_pylist()
    ncodes = max(len(uniq_src), 1)
    if not len(codes):
        return {}
    fact_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    # distinct (fact, source) pairs
    pairs = np.unique(fact_idx * ncodes + codes)
    pf, pcode = pairs // ncodes, pairs % ncodes
    # fact is quantity-numeric iff type == quantity and EVERY value parsed
    is_qf = np.asarray(pc.equal(t["value_type"], "quantity"),
                       dtype=bool)
    flat_valid = np.asarray(
        pc.is_valid(pc.list_flatten(t["values_num"].combine_chunks())),
        dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    nz = lens > 0
    validcnt = np.zeros(n, dtype=np.int64)
    if nz.any():
        validcnt[nz] = np.add.reduceat(flat_valid, starts[nz])
    is_q = is_qf & (validcnt == lens)
    # aggregate pair counts by (bucket, source)
    bkey = bids[pf] * ncodes + pcode
    ub, inv = np.unique(bkey, return_inverse=True)
    c_all = np.bincount(inv).astype(np.float64)
    c_q = np.bincount(inv, weights=is_q[pf].astype(np.float64))
    return {(int(k // ncodes), uniq_src[int(k % ncodes)]):
            [float(c_all[i]), float(c_q[i])] for i, k in enumerate(ub)}


def _emit_facts(facts, model: FusionModel, state: dict[int, dict],
                cache: dict | None = None) -> pa.Table:
    """Final truth emission.  Models exposing ``emit_batch`` (CRH,
    TruthFinder, Voting) run one segmented-numpy pass per bucket — same
    summation order as their round kernels — with structs reused from
    ``cache`` (the shard/session _vcache); everything else falls back to
    the per-fact loop."""
    if getattr(model, "emit_batch", None) is not None:
        facts = facts if isinstance(facts, list) else list(facts)
        by_bid: dict[int, list] = {}
        for f in facts:
            if model.numeric_only and not f.is_numeric:
                continue
            by_bid.setdefault(f.bucket_id, []).append(f)
        if cache is None:
            cache = {}
        tables = [t for t in (model.emit_batch(fl, state[bid], bid, cache)
                              for bid, fl in by_bid.items())
                  if t is not None and len(t)]
        if tables:
            return pa.concat_tables(tables)
        return _emit_facts_loop([], model, state)
    return _emit_facts_loop(facts, model, state)


def _emit_facts_loop(facts, model: FusionModel,
                     state: dict[int, dict]) -> pa.Table:
    rows = {k: [] for k in ("bucket_id", "entity", "attr", "value_str",
                            "value_num", "value_type", "conf", "n_claims",
                            "winner_claim_id")}
    for fact in facts:
        if model.numeric_only and not fact.is_numeric:
            continue
        values, conf = model.fact_truth(fact, state[fact.bucket_id])
        for v in values:
            if v is None:
                continue
            if isinstance(v, (int, float, np.floating)):
                vs, vn = _fmt_num(float(v)), float(v)
            else:
                vs, vn = str(v), None
            # lineage: the winning claim's id (first claim asserting v)
            win = -1
            for cid, cv in zip(fact.claim_ids, fact.values):
                if (cv == v) if not isinstance(v, float) else (
                        isinstance(cv, float) and cv == v):
                    win = int(cid)
                    break
            rows["bucket_id"].append(fact.bucket_id)
            rows["entity"].append(fact.entity)
            rows["attr"].append(fact.attr)
            rows["value_str"].append(vs)
            rows["value_num"].append(vn)
            rows["value_type"].append(fact.vtype)
            rows["conf"].append(float(conf))
            rows["n_claims"].append(len(fact.claim_ids))
            rows["winner_claim_id"].append(win)
    return pa.table(
        {
            "bucket_id": pa.array(rows["bucket_id"], pa.int32()),
            "entity": pa.array(rows["entity"], pa.string()),
            "attr": pa.array(rows["attr"], pa.string()),
            "value_str": pa.array(rows["value_str"], pa.string()),
            "value_num": pa.array(rows["value_num"], pa.float64()),
            "value_type": pa.array(rows["value_type"], pa.string()),
            "conf": pa.array(rows["conf"], pa.float64()),
            "n_claims": pa.array(rows["n_claims"], pa.int32()),
            "winner_claim_id": pa.array(rows["winner_claim_id"], pa.int64()),
        }
    )


def _fmt_num(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else repr(v)


def _prep_claims_block(tbl: pa.Table, dedup: bool) -> pa.Table:
    """Map-side claim preparation: column projection, null-claim filter,
    per-block exact-dedup combiner (the skew guard)."""
    tbl = _project_pack_cols(tbl)
    tbl = tbl.filter(pc.is_valid(tbl["value_str"]))
    if dedup:
        tbl = _combine_dedup(tbl)
    return tbl


def _split_claims_block(tbl: pa.Table, n_parts: int, dedup: bool) -> tuple:
    """Map side of the session's hand-rolled pack exchange: prepare the
    block, then split it into ``n_parts`` fact-hash sub-tables (one per
    shard actor).  A plain Ray task with ``num_returns=n_parts`` — each
    shard fetches only its piece, and there is no sort-sampling pass,
    no intermediate materialization, and no second block fetch (the
    Dataset sort shuffle costs seconds of fixed overhead per exchange)."""
    tbl = _prep_claims_block(tbl, dedup)
    tbl = _add_partition_col(tbl, n_parts=n_parts)
    order = pc.sort_indices(tbl, sort_keys=[("fact_part", "ascending")])
    tbl = tbl.take(order)
    parr = np.asarray(tbl["fact_part"])
    bounds = np.searchsorted(parr, np.arange(n_parts + 1))
    pieces = tuple(
        tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
        .drop_columns(["fact_part"]) for i in range(n_parts))
    return pieces if n_parts > 1 else pieces[0]


_SPLIT_TASK = None


def _make_split_task():
    global _SPLIT_TASK
    if _SPLIT_TASK is None:
        import ray

        @ray.remote
        def split_claims_block(tbl, n_parts, dedup):
            pieces = _split_claims_block(tbl, n_parts, dedup)
            if n_parts == 1:
                pieces = (pieces,)
            # ray.put each piece into PLASMA explicitly.  Returned via
            # num_returns they would be "small" objects living in the
            # DRIVER's in-process store, and the n_blocks × n_actors piece
            # fetches would all serialize through the driver's RPC thread —
            # measured ~16 s of the pack exchange at 64×32.  Plasma-put
            # pieces are fetched straight from shared memory.
            # Ownership: the pieces are owned by this task's worker, which
            # stays alive (workers are reused) until the shard actors'
            # load_pieces wave — submitted immediately after this wave —
            # has fetched every piece.  If the exchange ever becomes
            # lazy/multi-wave, put with _owner= a long-lived actor.
            return [ray.put(p) for p in pieces]

        _SPLIT_TASK = split_claims_block
    return _SPLIT_TASK


def _make_fact_shard():
    """Lazily define the shard actor (keeps module import ray-free)."""
    import ray

    @ray.remote(num_cpus=0)
    class FactShard:
        """Holds one shard of packed fact blocks for a whole FusionSession.

        Memory model: the shard keeps only the packed ARROW tables plus the
        per-model segmented numpy structs (fuse/vectorized.py).  ``Fact``
        objects are streamed per bucket while building structs and then
        dropped — the ~5×-Arrow Python-object layer never persists.  Only
        models WITHOUT a batched round kernel (CATD/KDEm per-fact math)
        lazily materialize the full Fact list, because their rounds walk it
        every iteration.

        num_cpus=0: the pool is the ONLY computation running during fusion
        rounds, and reserving CPUs would deadlock any Dataset execution the
        caller runs while the session is open."""

        def __init__(self, block_refs=None):
            self.tables = []
            self.facts = None           # lazy; loop-path models only
            self.src_index = None
            self._vcache: dict = {}
            if block_refs is not None:
                self.load(block_refs)

        def load(self, block_refs) -> int:
            import ray as _r
            self.tables = [t for t in _r.get(list(block_refs)) if len(t)]
            return len(self.tables)

        def load_pieces(self, piece_refs, dedup=True) -> int:
            """Reduce side of the hand-rolled pack exchange: fetch this
            shard's fact-hash pieces from every map block, concat, and pack
            locally (the Arrow group-by pack runs inside the actor — the
            packed table never transits the object store)."""
            import ray as _r
            tables = [t for t in _r.get(list(piece_refs)) if len(t)]
            if tables:
                tbl = pa.concat_tables(
                    [t.cast(tables[0].schema) for t in tables])
                packed = _pack_partition(tbl, dedup=dedup)
                self.tables = [packed] if len(packed) else []
            else:
                self.tables = []
            return sum(len(t) for t in self.tables)

        def counts(self) -> dict:
            """(bid, source) -> [facts_all, facts_quantity_numeric]
            (vectorized; see :func:`_counts_table`)."""
            acc: dict[tuple[int, str], list] = {}
            for t in self.tables:
                for k, v in _counts_table(t).items():
                    c = acc.setdefault(k, [0.0, 0.0])
                    c[0] += v[0]
                    c[1] += v[1]
            return acc

        def parse(self, src_index) -> int:
            """Bind the source index and normalize tables to ONE bucket-
            contiguous table so bucket groups can stream (packed tables are
            already sorted by bucket_id; a stable sort keeps the original
            relative fact order after concat — same summation order as the
            old eager list parse)."""
            self.src_index = src_index
            self.facts = None
            self._vcache = {}
            if len(self.tables) > 1:
                tbl = pa.concat_tables(
                    [t.cast(self.tables[0].schema) for t in self.tables])
                tbl = tbl.take(pc.sort_indices(
                    tbl, sort_keys=[("bucket_id", "ascending")]))
                self.tables = [tbl]
            return sum(len(t) for t in self.tables)

        def _iter_groups(self, numeric_only: bool):
            """Stream (bucket_id, [Fact…]) groups; Facts live only for the
            duration of one group's struct/emit build."""
            cur_bid, cur, seen = None, [], set()
            for t in self.tables:
                for f in iter_facts(t, self.src_index):
                    if numeric_only and not f.is_numeric:
                        continue
                    if f.bucket_id != cur_bid and cur:
                        yield cur_bid, cur
                        seen.add(cur_bid)
                        cur = []
                    if f.bucket_id in seen:   # table not bucket-contiguous
                        raise AssertionError(
                            f"bucket {f.bucket_id} split across groups")
                    cur_bid = f.bucket_id
                    cur.append(f)
            if cur:
                yield cur_bid, cur

        def _ensure_facts(self) -> list:
            if self.facts is None:
                self.facts = []
                for t in self.tables:
                    self.facts.extend(iter_facts(t, self.src_index))
            return self.facts

        def _structs(self, model) -> dict:
            key = model.batch_key()
            structs = self._vcache.get(key)
            if structs is None:
                structs = self._vcache[key] = {}
                prep = getattr(model, "prepare_emit", None)
                for bid, fl in self._iter_groups(model.numeric_only):
                    structs[bid] = model.build_batch(fl)
                    if prep is not None:
                        # emit metadata built in the SAME pass — the final
                        # emit then never re-parses Facts from Arrow
                        prep(fl, bid, self._vcache)
            return structs

        def stats(self, model, state, n_sources) -> dict:
            outs = {bid: np.zeros((N_CHANNELS, n), dtype=np.float64)
                    for bid, n in n_sources.items()}
            if getattr(model, "build_batch", None) is not None:
                for bid, st in self._structs(model).items():
                    if st is not None:
                        model.accumulate_batch(st, state[bid], outs[bid])
                return outs
            for fact in self._ensure_facts():
                if model.numeric_only and not fact.is_numeric:
                    continue
                model.accumulate(fact, state[fact.bucket_id],
                                 outs[fact.bucket_id])
            return outs

        def emit(self, model, state) -> pa.Table:
            if getattr(model, "emit_batch", None) is not None:
                groups = None
                key_fn = getattr(model, "batch_key", None)
                if key_fn is not None:
                    key = key_fn()
                    structs = self._vcache.get(key)
                    emeta = self._vcache.get(("emit",) + key)
                    if (structs is not None and emeta is not None
                            and set(structs) <= set(emeta)):
                        # structs + emit meta fully cached by the rounds'
                        # streaming pass: no Fact re-parse needed at all
                        groups = ((bid, []) for bid in structs)
                if groups is None and self.facts is not None:
                    by: dict[int, list] = {}
                    for f in self.facts:
                        if model.numeric_only and not f.is_numeric:
                            continue
                        by.setdefault(f.bucket_id, []).append(f)
                    groups = by.items()
                if groups is None:
                    groups = self._iter_groups(model.numeric_only)
                tables = [t for t in (
                    model.emit_batch(fl, state[bid], bid, self._vcache)
                    for bid, fl in groups)
                    if t is not None and len(t)]
                if tables:
                    return pa.concat_tables(tables)
                return _emit_facts_loop([], model, state)
            return _emit_facts(self._ensure_facts(), model, state,
                               self._vcache)

    return FactShard


class FusionSession:
    """Pack once, fuse many models (the reference UI's compare-models loop,
    `/root/reference/app.py:660-687`, without re-shuffling).

    Size-adaptive iterate strategy:

    * ≤ ``local_threshold`` facts: the packed table is pulled to the driver
      once; rounds are plain loops (no per-round task overhead).
    * larger: the packed blocks are dealt once to a pool of raw Ray
      fact-shard actors (the documented raw-actor exception for iterative
      global state) — every round is one ms-scale RPC per shard returning a
      tiny per-source matrix, avoiding a fresh streaming-executor launch
      (~0.5 s fixed) per round.

    Both paths run identical model code; tests assert equality.
    """

    def __init__(self, packed=None, local_threshold: int = 20_000,
                 materialize: bool = True, *, claims=None,
                 dedup_claims: bool = True):
        import ray

        if (packed is None) == (claims is None):
            raise ValueError("pass exactly one of packed= or claims=")

        # spin the (num_cpus=0) shard pool up CONCURRENTLY with the pack
        # exchange — actor process startup costs seconds and needs no data
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        FactShard = _make_fact_shard()
        warm = [FactShard.remote() for _ in range(n_cpus)]

        self.actors = []
        self._tbl = None
        self._facts = None

        if claims is not None:
            # fast path: claims go straight into the shard actors through a
            # hand-rolled fact-hash exchange (plain Ray tasks with
            # num_returns=n_actors) — no Dataset sort shuffle, no
            # intermediate materialization, packing happens inside each
            # actor.  (Numeric-only models need the claim-level numeric
            # projection — use the packed path for those.)
            claims = claims.materialize()
            n_rows = claims.count()
            self.use_actors = n_rows > local_threshold
            if self.use_actors:
                refs = claims.to_arrow_refs()
                n_actors = max(1, n_cpus)
                split = _make_split_task()
                # each split task plasma-puts its pieces and returns the
                # (tiny) ref list; the driver only relays refs, never data
                piece_refs = ray.get([
                    split.remote(r, n_actors, dedup_claims) for r in refs])
                self.actors = warm[:n_actors]
                for a in warm[n_actors:]:
                    ray.kill(a)
                counts_f = ray.get([
                    a.load_pieces.remote([pr[i] for pr in piece_refs],
                                         dedup_claims)
                    for i, a in enumerate(self.actors)])
                self.n_facts = int(sum(counts_f))
                agg = self._agg_from_actors(ray)
            else:
                for a in warm:
                    ray.kill(a)
                blocks = [t for t in ray.get(claims.to_arrow_refs())
                          if len(t)]
                if blocks:
                    tbl = pa.concat_tables(
                        [t.cast(blocks[0].schema) for t in blocks])
                    self._tbl = _pack_partition(
                        _prep_claims_block(tbl, dedup_claims),
                        dedup=dedup_claims)
                else:
                    self._tbl = _empty_packed()
                self.n_facts = len(self._tbl)
                agg = self._agg_local()
        else:
            if materialize:
                packed = packed.materialize()
            self.packed = packed
            self.n_facts = packed.count()
            self.use_actors = self.n_facts > local_threshold
            if self.use_actors:
                refs = packed.to_arrow_refs()
                n_actors = max(1, min(n_cpus, len(refs)))
                self.actors = warm[:n_actors]
                for a in warm[n_actors:]:
                    ray.kill(a)
                shards = [refs[i::n_actors] for i in range(n_actors)]
                ray.get([a.load.remote(sh)
                         for a, sh in zip(self.actors, shards)])
                agg = self._agg_from_actors(ray)
            else:
                for a in warm:  # local path: the warm pool is not needed
                    ray.kill(a)
                blocks = [t for t in ray.get(packed.to_arrow_refs())
                          if len(t)]
                if blocks:
                    # unify list-field naming (item vs element)
                    self._tbl = pa.concat_tables(
                        [t.cast(blocks[0].schema) for t in blocks])
                else:
                    self._tbl = _empty_packed()
                agg = self._agg_local()

        self.sources: dict[int, list[str]] = {}
        for bid, src in agg:
            self.sources.setdefault(bid, []).append(src)
        for bid in self.sources:
            self.sources[bid] = sorted(set(self.sources[bid]))
        self.src_index = {bid: {s: i for i, s in enumerate(srcs)}
                          for bid, srcs in self.sources.items()}
        self.n_sources = {bid: len(srcs)
                          for bid, srcs in self.sources.items()}
        self.counts_all = {bid: np.array([agg[(bid, s)][0] for s in srcs])
                           for bid, srcs in self.sources.items()}
        self.counts_q = {bid: np.array([agg[(bid, s)][1] for s in srcs])
                         for bid, srcs in self.sources.items()}
        if self.use_actors:
            ray.get([a.parse.remote(self.src_index) for a in self.actors])
        else:
            self._facts = (list(iter_facts(self._tbl, self.src_index))
                           if len(self._tbl) else [])

    # -- internals --------------------------------------------------------
    def _agg_from_actors(self, ray) -> dict:
        parts = ray.get([a.counts.remote() for a in self.actors])
        agg: dict[tuple, list] = {}
        for part in parts:
            for k, v in part.items():
                c = agg.setdefault(k, [0.0, 0.0])
                c[0] += v[0]
                c[1] += v[1]
        return agg

    def _agg_local(self) -> dict:
        return _counts_table(self._tbl)

    def _round_stats(self, model, state):
        import ray

        if self.use_actors:
            parts = ray.get([a.stats.remote(model, state, self.n_sources)
                             for a in self.actors])
        else:
            if not hasattr(self, "_vcache"):
                self._vcache = {}
            outs = _batched_stats(self._facts, model, state,
                                  self.n_sources, self._vcache)
            if outs is None:
                outs = {bid: np.zeros((N_CHANNELS, n), dtype=np.float64)
                        for bid, n in self.n_sources.items()}
                for fact in self._facts:
                    if model.numeric_only and not fact.is_numeric:
                        continue
                    model.accumulate(fact, state[fact.bucket_id],
                                     outs[fact.bucket_id])
            parts = [outs]
        stats = {bid: np.zeros((N_CHANNELS, n))
                 for bid, n in self.n_sources.items()}
        for part in parts:
            for bid, m in part.items():
                stats[bid] += m
        return stats

    def run(self, model: FusionModel):
        """→ (triples Dataset, weights {bucket: {source: w}}).

        For numeric-only models the per-source ``count`` vector and the
        reported weights cover only sources with ≥1 numeric quantity fact —
        the reference's source set after ``focus_on_attributes``
        type-selection (model.py:41-45)."""
        import ray
        import ray.data as rd

        counts = self.counts_q if model.numeric_only else self.counts_all
        state = {bid: model.initial_state(self.sources[bid], counts[bid])
                 for bid in self.sources}
        for r in range(model.n_rounds):
            stats = self._round_stats(model, state)
            all_conv = True
            for bid in state:
                state[bid], conv = model.reduce(state[bid], stats[bid],
                                                counts[bid], r)
                all_conv = all_conv and conv
            if all_conv:
                break

        if self.use_actors:
            refs = [a.emit.remote(model, state) for a in self.actors]
            ray.wait(refs, num_returns=len(refs))
            triples = rd.from_arrow_refs(refs)
        else:
            if not hasattr(self, "_vcache"):
                self._vcache = {}
            triples = rd.from_arrow(
                _emit_facts(self._facts, model, state, self._vcache))
        weights = {
            bid: {s: float(model.weights(state[bid])[i])
                  for s, i in self.src_index[bid].items()
                  if counts[bid][i] > 0}
            for bid in self.src_index
        }
        return triples, weights

    def close(self):
        import ray

        for a in self.actors:
            ray.kill(a)
        self.actors = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _empty_packed() -> pa.Table:
    return _pack_partition(pa.table({
        "claim_id": pa.array([], pa.int64()),
        "bucket_id": pa.array([], pa.int32()),
        "entity": pa.array([], pa.string()),
        "attr": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
        "value_str": pa.array([], pa.string()),
        "value_num": pa.array([], pa.float64()),
        "value_type": pa.array([], pa.string()),
    }))


def run_fusion(claims, model: FusionModel, materialize: bool = True,
               local_threshold: int = 20_000, dedup_claims: bool = True):
    """claims Dataset + model → (triples Dataset, weights per bucket).

    Returns ``(triples_ds, weights)`` where weights is
    ``{bucket_id: {source: weight}}`` (the reference's
    ``unified_result["weights"]``, `model.py:228-229`).

    Non-numeric models take the session's direct claims exchange (pack
    inside the shard actors); numeric-only models need the claim-level
    quantity projection first (`model.py:41-45`) and go through the
    Dataset pack."""
    if model.numeric_only:
        packed = pack_facts(claims, numeric_only=True,
                            dedup_claims=dedup_claims)
        return run_fusion_packed(packed, model, materialize=materialize,
                                 local_threshold=local_threshold)
    with FusionSession(claims=claims, local_threshold=local_threshold,
                       dedup_claims=dedup_claims) as session:
        return session.run(model)


def run_fusion_packed(packed, model: FusionModel, materialize: bool = True,
                      local_threshold: int = 20_000):
    """One-shot fusion over a pre-packed fact Dataset (see FusionSession
    for the pack-once / fuse-many-models form)."""
    if model.numeric_only:
        packed = packed.map_batches(_quantity_facts_only,
                                    batch_format="pyarrow",
                                    zero_copy_batch=True)
    with FusionSession(packed, local_threshold=local_threshold,
                       materialize=materialize) as session:
        return session.run(model)
