"""Entity linking + value canonicalization: mentions → canonical claims IR.

Reference analog: the QID/label LMDB hashmap lookup used during dataset
construction (`/root/reference/dataset_generation/generate_conflicting_dataset.py:496-515`,
`/root/reference/trustfuse/models/utils.py:19-24`) — a side index loaded once
per worker.  Here the alias index is broadcast once via ``ray.put`` and each
actor of the pool dereferences it in ``__init__`` (never re-shipped per
batch); value canonicalization applies the type-driven kernels from
``canon.py`` (the reference's config-driven ``data_preprocessing``,
`preprocessing.py:57-83`).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from trustfuse_ray.stages import canon


def load_alias_map(path: str) -> dict[str, str]:
    t = pq.read_table(path)
    return dict(zip(t["alias"].to_pylist(), t["entity"].to_pylist()))


class EntityLinkerCanon:
    """Actor-pool stage: alias-dict linking + type-driven canonicalization.

    State (alias index, attribute-type map) is resolved once per actor in
    ``__init__``.  Ray Data stores actor-pool constructor args in the object
    store once and each actor fetches them at construction — that IS the
    broadcast path (never re-shipped per batch).  Passing an ObjectRef and
    calling ``ray.get`` inside ``__init__`` deadlocks under the actor-pool
    operator (ray#53727), so the index is passed by value or by path.
    """

    def __init__(self, alias_ref, attr_types: dict[str, str],
                 bucket_id: int = 0):
        if isinstance(alias_ref, str):
            alias_ref = load_alias_map(alias_ref)
        self.alias_map = alias_ref
        self.attr_types = dict(attr_types)
        self.bucket_id = bucket_id
        # Arrow-native lookup tables (index_in + take is a C-level hash
        # probe over the Arrow strings — no to_pylist/pandas round-trip)
        self._alias_keys = pa.array(list(alias_ref.keys()), pa.string())
        self._alias_vals = pa.array(list(alias_ref.values()), pa.string())
        self._attr_keys = pa.array(list(self.attr_types.keys()),
                                   pa.string())
        self._attr_vals = pa.array(list(self.attr_types.values()),
                                   pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        mention = pc.utf8_trim_whitespace(batch["mention"])
        if isinstance(mention, pa.ChunkedArray):
            mention = mention.combine_chunks()
        # alias-dict linking, miss → surface form
        linked = pc.take(self._alias_vals,
                         pc.index_in(mention, value_set=self._alias_keys))
        entity = pc.if_else(pc.is_valid(linked), linked, mention)

        attr = batch["attr"]
        raw = batch["raw_value"]
        trimmed = pc.utf8_trim_whitespace(raw)

        attr_arr = attr.combine_chunks() if isinstance(
            attr, pa.ChunkedArray) else attr
        vt = pc.take(self._attr_vals,
                     pc.index_in(attr_arr, value_set=self._attr_keys))
        vtype = pc.if_else(pc.is_valid(vt), vt, "string")
        is_q = pc.equal(vtype, "quantity")

        # quantity: strip thousands separators, parse float
        no_commas = pc.replace_substring(trimmed, ",", "")
        value_num = canon.extract_number_with_commas(trimmed)
        value_str = pc.if_else(is_q, no_commas, trimmed)
        value_num = pc.if_else(is_q, value_num,
                               pa.nulls(len(batch), pa.float64()))

        return pa.table(
            {
                "claim_id": batch["claim_id"],
                "bucket_id": pa.array([self.bucket_id] * len(batch), pa.int32()),
                "source": batch["source"],
                "entity": entity,
                "attr": attr,
                "value_str": value_str,
                "value_num": value_num,
                "value_type": vtype,
                "raw_value": raw,
                "conv_id": batch["conv_id"],
                "turn_idx": batch["turn_idx"],
                "ts": batch["ts"],
            }
        )


class ExtractLinkCanon:
    """Fused actor-pool stage: triple extraction + linking/canonicalization
    in ONE pass over transcript batches.

    Fusing the two stateful stages halves the object-store traffic and —
    decisive on small clusters — keeps the plan at a single actor-pool
    operator (two chained pools can starve each other's resource budget in
    Ray Data's streaming executor at very low CPU counts)."""

    def __init__(self, alias_ref, attr_types: dict[str, str],
                 bucket_id: int = 0, pattern: str | None = None):
        from trustfuse_ray.stages.extract import TripleExtractor

        kw = {"pattern": pattern} if pattern else {}
        self.extract = TripleExtractor(**kw)
        self.link = EntityLinkerCanon(alias_ref, attr_types, bucket_id)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.link(self.extract(batch))


_LINKER_CACHE: dict = {}


def _extract_link_batch(batch: pa.Table, *, alias_path: str,
                        attr_types_json: str, bucket_id: int,
                        pattern: str | None) -> pa.Table:
    """Warm-task-pool form of the fused stage: the state (alias index, rule
    regexes) is built once per WORKER PROCESS and memoized, exactly like an
    actor's ``__init__`` — but Ray's pre-started task workers are already
    warm, so the stage pays zero actor-pool spin-up (measured ~2-6 s per
    session at 8-32 CPUs, the dominant fixed cost of the scaling legs)."""
    import json as _json

    key = (alias_path, attr_types_json, bucket_id, pattern)
    st = _LINKER_CACHE.get(key)
    if st is None:
        st = _LINKER_CACHE[key] = ExtractLinkCanon(
            alias_path, _json.loads(attr_types_json), bucket_id, pattern)
    return st(batch)


def extract_link_canonicalize(transcripts, alias_src,
                              attr_types: dict[str, str],
                              bucket_id: int = 0,
                              concurrency: int | tuple | None = None,
                              batch_size: int = 2048,
                              pattern: str | None = None):
    """transcripts Dataset → canonical CLAIMS Dataset in one fused stage.

    A string ``alias_src`` is passed through as a PATH: each worker loads the
    side index directly (parallel, zero driver-side pickle of a ~100k-entry
    dict per plan submission — measured ~2 s at sf0.1).  With a path the
    stage runs on the warm TASK pool (per-process memoized state — no actor
    spin-up); with an in-memory alias dict it falls back to the actor pool,
    whose constructor-arg path is the broadcast."""
    import functools
    import json as _json

    if isinstance(alias_src, str):
        return transcripts.map_batches(
            functools.partial(
                _extract_link_batch, alias_path=alias_src,
                attr_types_json=_json.dumps(attr_types, sort_keys=True),
                bucket_id=bucket_id, pattern=pattern),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
    if concurrency is None:
        from trustfuse_ray.stages.common import auto_pool
        concurrency = auto_pool()
    return transcripts.map_batches(
        ExtractLinkCanon,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.75,
        fn_constructor_kwargs={
            "alias_ref": alias_src,
            "attr_types": attr_types,
            "bucket_id": bucket_id,
        },
    )


def link_and_canonicalize(mentions, alias_src, attr_types: dict[str, str],
                          bucket_id: int = 0,
                          concurrency: int | tuple | None = None,
                          batch_size: int = 4096):
    """mentions Dataset → canonical CLAIMS Dataset (broadcast side index)."""
    if concurrency is None:
        from trustfuse_ray.stages.common import auto_pool
        concurrency = auto_pool()
    if isinstance(alias_src, str):
        alias_src = load_alias_map(alias_src)
    return mentions.map_batches(
        EntityLinkerCanon,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={
            "alias_ref": alias_src,
            "attr_types": attr_types,
            "bucket_id": bucket_id,
        },
    )


# --------------------------------------------------------------------------
# Entity resolution: fuzzy-cluster canonicalization over claim entities
# --------------------------------------------------------------------------

def resolve_entities(claims, threshold: float = 0.9, block_len: int = 2,
                     cap: int = 500, n_parts: int = 32):
    """Entity-resolution canonicalization: cluster near-identical claim
    entities (Jaro >= ``threshold`` within ``block_len``-char-prefix ER
    blocks, stop-blocks above ``cap`` skipped) and map every clustered
    entity to its cluster's lexicographically smallest member.

    Reference analog: the alias/label canonicalization step of dataset
    construction (`/root/reference/dataset_generation/generate_conflicting_dataset.py:496-515`)
    handles only EXACT alias hits; this closes the near-miss gap
    (typos / formatting variants of the same entity) the fuzzy way ER
    systems do — blocking + verify + transitive closure.

    Shape: fuzzy pair discovery is block-bucketed (`joins.fuzzy_self_join`,
    never all-pairs), clusters come from the distributed min-label CC
    rounds (`graph.connected_components` — one plasma exchange per round),
    and the id->entity translation co-partitions on the node hash.  Edge
    node ids are the md5-low64 of the entity (>>1 to stay in int64) —
    the same DuckDB-replayable hash the dedup operators use; a 64-bit
    collision would spuriously merge two clusters (~2^-64/pair,
    accepted).  Only entities in >=2-entity clusters appear; the
    mapping includes the representative row (canon, canon).

    Returns Dataset(entity, canon).
    """
    import functools

    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply, plasma_exchange
    from trustfuse_ray.stages.dedup import _md5_token64
    from trustfuse_ray.stages.graph import connected_components
    from trustfuse_ray.stages.joins import fuzzy_self_join

    pairs = fuzzy_self_join(claims, "entity", threshold=threshold,
                            block_len=block_len, cap=cap,
                            n_parts=n_parts).materialize()

    def _hash_ids(strs: list[str]) -> np.ndarray:
        return np.fromiter((_md5_token64(s or "") >> 1 for s in strs),
                           dtype=np.int64, count=len(strs))

    def _edges(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_pylist()
        b = batch["b"].to_pylist()
        return pa.table({"src": pa.array(_hash_ids(a)),
                         "dst": pa.array(_hash_ids(b))})

    cc = connected_components(
        pairs.map_batches(_edges, batch_format="pyarrow",
                          zero_copy_batch=True),
        src="src", dst="dst", n_parts=n_parts)

    # (node, entity, label) co-partition: both sides share one nullable
    # schema so the exchange gather can concat them; label rows translate
    # node->label, entity rows translate node->entity.
    joined_schema = pa.schema([("node", pa.int64()),
                               ("entity", pa.string()),
                               ("label", pa.int64()),
                               ("__part", pa.int32())])

    def _part_of(node: np.ndarray) -> pa.Array:
        from trustfuse_ray.stages.graph import _mix64
        return pa.array((_mix64(node.astype(np.uint64))
                         % np.uint64(n_parts)).astype(np.int32))

    def _emap_side(batch: pa.Table) -> pa.Table:
        ents = sorted(set(batch["a"].to_pylist())
                      | set(batch["b"].to_pylist()))
        node = _hash_ids(ents)
        return pa.table({"node": pa.array(node),
                         "entity": pa.array(ents, pa.string()),
                         "label": pa.array([None] * len(ents), pa.int64()),
                         "__part": _part_of(node)})

    def _cc_side(batch: pa.Table) -> pa.Table:
        node = np.asarray(batch["node"], dtype=np.int64)
        return pa.table({"node": batch["node"],
                         "entity": pa.array([None] * len(node), pa.string()),
                         "label": batch["label"],
                         "__part": _part_of(node)})

    def _translate(tbl: pa.Table) -> pa.Table:
        lbl = tbl.filter(pc.is_valid(tbl["label"]))
        ent = tbl.filter(pc.is_valid(tbl["entity"]))
        if not len(lbl) or not len(ent):
            return pa.table({"entity": pa.array([], pa.string()),
                             "label": pa.array([], pa.int64())})
        ln = np.asarray(lbl["node"], dtype=np.int64)
        lv = np.asarray(lbl["label"], dtype=np.int64)
        order = np.argsort(ln)
        ln, lv = ln[order], lv[order]
        en = np.asarray(ent["node"], dtype=np.int64)
        # the emap side deduped per block, not globally — collapse here
        pos = np.searchsorted(ln, en)
        return pa.table({"entity": ent["entity"],
                         "label": pa.array(lv[pos])})

    emap = pairs.map_batches(_emap_side, batch_format="pyarrow",
                             zero_copy_batch=True)
    ccs = cc.map_batches(_cc_side, batch_format="pyarrow",
                         zero_copy_batch=True)
    labeled = plasma_exchange([ccs, emap], _translate, n_parts,
                              part_col="__part",
                              empty_schema=joined_schema)

    def _canon_group(group: pa.Table) -> pa.Table:
        ents = sorted(set(group["entity"].to_pylist()))
        canon = ents[0]
        return pa.table({"entity": pa.array(ents, pa.string()),
                         "canon": pa.array([canon] * len(ents),
                                           pa.string())})

    return hash_group_apply(
        labeled, ["label"], _canon_group, n_parts=n_parts,
        plasma_schema=pa.schema([("entity", pa.string()),
                                 ("canon", pa.string())]))


def alias_table(claims, threshold: float = 0.9, block_len: int = 4,
                cap: int = 500, n_parts: int = 32):
    """ER product as a consumable artifact: per canonical entity, the
    sorted member list and its size — the alias dictionary downstream
    linkers load (`resolve_entities` gives the per-entity mapping; this
    rolls it up cluster-wise).  One canon co-partition over the
    mapping; member strings aggregate in-group."""
    import pyarrow as pa

    from trustfuse_ray.stages.common import hash_group_apply

    mapping = resolve_entities(claims, threshold=threshold,
                               block_len=block_len, cap=cap,
                               n_parts=n_parts)

    def _roll(group: pa.Table) -> pa.Table:
        members = sorted(set(group["entity"].to_pylist()))
        return pa.table({
            "canon": group["canon"][:1],
            "n_members": pa.array([len(members)], pa.int64()),
            "members": pa.array([",".join(members)], pa.string())})

    return hash_group_apply(
        mapping, ["canon"], _roll, n_parts=n_parts,
        plasma_schema=pa.schema([("canon", pa.string()),
                                 ("n_members", pa.int64()),
                                 ("members", pa.string())]))


def er_pair_quality(mentions, alias_tbl: pa.Table, threshold: float = 0.9,
                    block_len: int = 4, cap: int = 500, n_parts: int = 32):
    """Record-linkage evaluation: pairwise precision/recall of the ER
    clustering against the alias ground truth — the standard cluster
    metric (a pair of distinct mention strings is predicted-same when ER
    maps both to one canon; truth-same when the alias table maps both to
    one entity).  All pair counts are exact integers (sum of C(n,2) per
    group); precision/recall are the two BIGINT/BIGINT divisions DuckDB
    performs identically.

    Reference analog: the reference evaluates fusion with get_metrics
    (`/root/reference/trustfuse/evaluation/evaluation.py:121-200`) but has
    no linkage-quality metric; this closes that gap for the ER stage.

    Shape: ER runs over DISTINCT mention strings (one groupby); the
    mapping joins back mention-side (left-outer, unmapped mentions stay
    singletons, i.e. canon = mention); truth labels attach via the
    broadcast alias index (never re-shipped per batch); the three
    group-size rollups (canon / entity / canon x entity) each reduce a
    distinct-mention stream to counts map-side.  Nothing larger than the
    distinct-mention table ever shuffles.

    Returns a ONE-ROW pa.Table: n_mentions, n_pred_pairs, n_true_pairs,
    n_correct_pairs, pair_precision, pair_recall.
    """

    alias_arr = alias_tbl["alias"].combine_chunks()
    ent_arr = alias_tbl["entity"].combine_chunks()

    distinct = (mentions.select_columns(["mention"])
                .groupby("mention").count().drop_columns(["count()"]))

    def _as_entity(batch: pa.Table) -> pa.Table:
        return pa.table({"entity": pc.cast(batch["mention"], pa.string())})

    mapping = resolve_entities(
        distinct.map_batches(_as_entity, batch_format="pyarrow",
                             zero_copy_batch=True),
        threshold=threshold, block_len=block_len, cap=cap, n_parts=n_parts)

    joined = distinct.join(mapping, join_type="left_outer",
                           num_partitions=8, on=("mention",),
                           right_on=("entity",))

    def _label(batch: pa.Table) -> pa.Table:
        m = pc.cast(batch["mention"], pa.string())
        canon = pc.coalesce(batch["canon"], m)
        idx = pc.index_in(m, value_set=alias_arr)
        return pa.table({"mention": m, "canon": canon,
                         "truth": pc.take(ent_arr, idx)})

    from trustfuse_ray.stages.common import pairwise_cluster_metrics

    mm = joined.map_batches(_label, batch_format="pyarrow",
                            zero_copy_batch=True)
    return pairwise_cluster_metrics(mm, "canon", "truth",
                                    count_name="n_mentions")
