"""Distributed connected components over an edge Dataset.

Used by near-dup clustering (`dedup.minhash_clusters`): the pair list of a
100-TB corpus can itself be huge (adversarial duplicate mass), so the
union-find must not live on the driver.  This is iterative min-label
propagation expressed join-free with ONE hash exchange per round:

* state rows share one schema ``(node, other, label, kind)`` and are
  pre-partitioned on ``hash(node)``: adjacency rows (kind 0, one per edge
  direction, re-emitted every round), the node's current label (kind 1),
  and incoming label candidates from neighbours (kind 2);
* per round each partition computes, fully vectorized (sort +
  ``np.minimum.reduceat``), ``new_label = min(candidates, own label,
  node id)`` per node, then emits the adjacency unchanged, the new label
  row, and one candidate ``(neighbour, new_label)`` per adjacency row;
* convergence: labels only ever DECREASE, so ``sum(label)`` strictly
  decreases until the fixpoint — one tiny aggregate per round replaces a
  change-detection join.

Rounds needed = graph diameter; dup clusters are near-cliques (diameter
≤ ~3).  ``max_rounds`` bounds adversarial chains.  Per-round traffic is
O(edges) candidate rows — the corpus itself never moves.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

_SENT = np.iinfo(np.int64).max  # adjacency rows carry no label


def _mix64(x: np.ndarray) -> np.ndarray:
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _state(node, other, label, kind, n_parts: int) -> pa.Table:
    part = (_mix64(node.astype(np.uint64)) % np.uint64(n_parts)).astype(
        np.int32)
    return pa.table({
        "node": pa.array(node), "other": pa.array(other),
        "label": pa.array(label), "kind": pa.array(kind),
        "__part": pa.array(part),
    })


def _init_state(batch: pa.Table, *, src: str, dst: str,
                n_parts: int) -> pa.Table:
    a = np.asarray(batch[src], dtype=np.int64)
    b = np.asarray(batch[dst], dtype=np.int64)
    node = np.concatenate([a, b])
    other = np.concatenate([b, a])
    n = len(node)
    return _state(node, other, np.full(n, _SENT, dtype=np.int64),
                  np.zeros(n, dtype=np.int8), n_parts)


def _cc_round(part: pa.Table, *, n_parts: int) -> pa.Table:
    if "__part" in part.column_names:
        part = part.drop_columns(["__part"])
    node = part["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    if not len(node):
        return _state(node, node, node, np.zeros(0, np.int8), n_parts)
    other = part["other"].to_numpy(zero_copy_only=False).astype(np.int64)
    label = part["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    kind = part["kind"].to_numpy(zero_copy_only=False).astype(np.int8)

    order = np.argsort(node, kind="stable")
    node, other, label, kind = (node[order], other[order], label[order],
                                kind[order])
    starts = np.nonzero(np.concatenate(([True],
                                        node[1:] != node[:-1])))[0]
    uniq = node[starts]
    counts = np.diff(np.concatenate((starts, [len(node)])))
    new_lbl = np.minimum(np.minimum.reduceat(label, starts), uniq)

    adj = kind == 0
    # per-row label of the row's node, aligned with the sorted layout
    row_lbl = np.repeat(new_lbl, counts)
    out_node = np.concatenate([node[adj], uniq, other[adj]])
    out_other = np.concatenate([other[adj], np.zeros(len(uniq), np.int64),
                                np.zeros(int(adj.sum()), np.int64)])
    out_label = np.concatenate([np.full(int(adj.sum()), _SENT, np.int64),
                                new_lbl, row_lbl[adj]])
    out_kind = np.concatenate([np.zeros(int(adj.sum()), np.int8),
                               np.ones(len(uniq), np.int8),
                               np.full(int(adj.sum()), 2, np.int8)])
    return _state(out_node, out_other, out_label, out_kind, n_parts)


def connected_components(edges, src: str = "src", dst: str = "dst",
                         max_rounds: int = 10, n_parts: int = 32):
    """edges(src,dst) → Dataset(node, label) where label = min node id of
    the component.  Nodes only appear if they occur in an edge."""
    from trustfuse_ray.stages.common import plasma_exchange

    cc_schema = pa.schema([("node", pa.int64()), ("other", pa.int64()),
                           ("label", pa.int64()), ("kind", pa.int8()),
                           ("__part", pa.int32())])
    state = edges.map_batches(
        functools.partial(_init_state, src=src, dst=dst, n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True)
    prev_sum = None
    for _ in range(max_rounds):
        # __part is precomputed — the plasma task exchange skips Ray
        # groupby's per-round sample+sort fixed cost
        state = plasma_exchange(
            [state], functools.partial(_cc_round, n_parts=n_parts),
            n_parts, part_col="__part", empty_schema=cc_schema)
        cur_sum = state.filter(expr="kind == 1").sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return (state.filter(expr="kind == 1")
            .select_columns(["node", "label"]))


def bfs_hops(edges, seeds: list[str], k: int = 3, src: str = "src",
             dst: str = "dst", n_parts: int = 16):
    """Min-hop BFS from ``seeds`` over a string-node edge Dataset (directed;
    union reversed edges first for undirected reach).  Returns
    ``(node, hops)`` for every node within ``k`` hops.

    Scale shape: the frontier is a DATASET, never a driver set — each round
    is one plasma exchange co-partitioning the frontier with the adjacency
    on the node key, plus one min-combine groupby.  Like the CC/PageRank
    rounds, the adjacency is re-exchanged every round, so per-round
    traffic is O(total edges) + O(frontier) — the adjacency partition ids
    are computed ONCE outside the loop; only the frontier re-hashes per
    round.  Seeds are a query input (small by definition)."""
    import ray.data as rd

    def _tag_edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "node": batch[src].cast(pa.string()),
            "other": batch[dst].cast(pa.string()),
            "hops": pa.array(np.full(n, -1, np.int64)),
            "side": pa.array(np.zeros(n, np.int8)),
        })

    def _frontier_rows(tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        return pa.table({
            "node": tbl["node"].cast(pa.string()),
            "other": pa.array([""] * n, pa.string()),
            "hops": tbl["hops"].cast(pa.int64()),
            "side": pa.array(np.ones(n, np.int8)),
        })

    cand_schema = pa.schema([("node", pa.string()), ("hops", pa.int64())])

    def _expand_part(tbl: pa.Table) -> pa.Table:
        # fully vectorized over the partition: per node-run, adjacency rows
        # (side 0) emit (other, min frontier hop in run + 1).  One lexsort;
        # no per-node Python.
        if len(tbl) == 0:
            return cand_schema.empty_table()
        node = tbl["node"].to_pandas().to_numpy(dtype=object)
        side = np.asarray(tbl["side"], dtype=np.int8)
        hops = np.asarray(tbl["hops"], dtype=np.int64)
        order = np.lexsort((side, node))  # frontier rows (side 1) last
        ns, ss, hs = node[order], side[order], hops[order]
        n = len(ns)
        head = np.ones(n, dtype=bool)
        head[1:] = ns[1:] != ns[:-1]
        run_id = np.cumsum(head) - 1
        nruns = int(run_id[-1]) + 1
        # min frontier hop per run (runs without a frontier row stay SENT)
        fmin = np.full(nruns, _SENT, np.int64)
        fr = ss == 1
        if fr.any():
            np.minimum.at(fmin, run_id[fr], hs[fr])
        adj = (ss == 0) & (fmin[run_id] != _SENT)
        if not adj.any():
            return cand_schema.empty_table()
        sel = order[adj]
        return pa.table({
            "node": tbl["other"].take(pa.array(sel)),
            "hops": pa.array(fmin[run_id[adj]] + 1, pa.int64()),
        })

    from trustfuse_ray.stages.common import _add_part, plasma_exchange

    # hash-partition the adjacency ONCE; rounds only re-key the frontier
    keyed_edges = edges.map_batches(_tag_edges, batch_format="pyarrow",
                                    zero_copy_batch=True).map_batches(
        functools.partial(_add_part, keys=["node"], n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    dist = rd.from_arrow(pa.table({
        "node": pa.array(sorted(set(seeds)), pa.string()),
        "hops": pa.array([0] * len(set(seeds)), pa.int64()),
    }))
    uni_schema = pa.schema([("node", pa.string()), ("other", pa.string()),
                            ("hops", pa.int64()), ("side", pa.int8()),
                            ("__part", pa.int32())])
    frontier = dist
    for r in range(1, k + 1):
        keyed_frontier = frontier.map_batches(
            _frontier_rows, batch_format="pyarrow").map_batches(
            functools.partial(_add_part, keys=["node"], n_parts=n_parts),
            batch_format="pyarrow", zero_copy_batch=True)
        cand = plasma_exchange([keyed_edges, keyed_frontier],
                               _expand_part, n_parts,
                               part_col="__part", empty_schema=uni_schema)
        dist = (dist.union(cand).groupby("node").min("hops")
                .rename_columns({"min(hops)": "hops"}).materialize())
        frontier = dist.filter(expr=f"hops == {r}").materialize()
        if frontier.count() == 0:
            break
    return dist


def property_graph_edges(triples, entity_col: str = "entity",
                         attr_col: str = "attr"):
    """Fused triples → property-graph edge table, the data-processing half
    of the reference's ``visualization.visualize``
    (`/root/reference/trustfuse/visualization/visualization.py:80-126`):
    entity node → per-(entity, attribute) intermediate node → value node.

    Deviation (documented): node ids are deterministic strings (``entity``,
    ``entity + '#' + attr``, the value itself) instead of the reference's
    enumeration-order integer concat, which depends on Python set iteration
    order.  Pure map over the triple stream — no shuffle, no driver-side
    graph object; rendering (networkx/pyvis) stays a small-result,
    driver-side option (`to_networkx`)."""
    import pyarrow.compute as pc

    def _edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        ent = batch[entity_col].cast(pa.string())
        attr = batch[attr_col].cast(pa.string())
        anode = pc.binary_join_element_wise(ent, attr, "#")
        layer1 = pa.table({
            "src": ent, "dst_str": anode,
            "dst_num": pa.nulls(n, pa.float64()),
            "attribute": attr,
            "layer": pa.array(np.full(n, 1, dtype=np.int32)),
        })
        layer2 = pa.table({
            "src": anode, "dst_str": batch["value_str"],
            "dst_num": batch["value_num"],
            "attribute": attr,
            "layer": pa.array(np.full(n, 2, dtype=np.int32)),
        })
        return pa.concat_tables([layer1, layer2])

    return triples.map_batches(_edges, batch_format="pyarrow",
                               zero_copy_batch=True)


def to_networkx(edges: pa.Table):
    """Small-result driver-side graph build (import-gated): mirrors the
    reference's nx.DiGraph assembly for rendering/inspection.  pyvis HTML
    rendering is out of scope in this environment (module absent)."""
    import networkx as nx

    g = nx.DiGraph()
    for row in edges.to_pylist():
        dst = (row["dst_str"] if row["dst_str"] is not None
               else repr(row["dst_num"]))
        g.add_edge(row["src"], dst, attribute=row["attribute"],
                   layer=row["layer"])
    return g


# --------------------------------------------------------------------------
# PageRank (fixed-point integer arithmetic, join-free rounds)
# --------------------------------------------------------------------------

_PR_SCHEMA_COLS = ("node", "other", "value", "kind")


def _part_of_str(col, n_parts: int) -> pa.Array:
    """Deterministic partition id per string node: md5-keyed (same hash
    family as the SQL-replayable operators), computed once per DISTINCT
    value in the batch via dictionary-encode."""
    import pyarrow.compute as pc

    from trustfuse_ray.stages.dedup import _md5_token64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = pc.dictionary_encode(col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    uh = np.fromiter((_md5_token64(t) for t in enc.dictionary.to_pylist()),
                     dtype=np.uint64, count=len(enc.dictionary))
    part = (uh % np.uint64(n_parts)).astype(np.int32)
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.array(part[idx], pa.int32())


def _pr_state(node, other, value, kind, n_parts: int) -> pa.Table:
    return pa.table({"node": node, "other": other, "value": value,
                     "kind": kind,
                     "__part": _part_of_str(node, n_parts)})


def _pr_empty(n_parts: int) -> pa.Table:
    return pa.table({"node": pa.array([], pa.string()),
                     "other": pa.array([], pa.string()),
                     "value": pa.array([], pa.int64()),
                     "kind": pa.array([], pa.int8()),
                     "__part": pa.array([], pa.int32())})


def _seed_mask(arr: pa.Array, seeds: tuple[str, ...] | None) -> np.ndarray:
    import pyarrow.compute as pc

    if seeds is None:
        return np.ones(len(arr), dtype=bool)
    return np.asarray(pc.is_in(arr, value_set=pa.array(list(seeds),
                                                       pa.string())),
                      dtype=bool)


def _pr_init(batch: pa.Table, *, src: str, dst: str, n_parts: int,
             scale: int, seeds: tuple[str, ...] | None) -> pa.Table:
    if len(batch) == 0:
        return _pr_empty(n_parts)
    s = batch[src].cast(pa.string())
    d = batch[dst].cast(pa.string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    n = len(s)
    empty = pa.array([""] * n, pa.string())
    edges = pa.table({"node": s, "other": d,
                      "value": pa.array(np.zeros(n, np.int64)),
                      "kind": pa.array(np.zeros(n, np.int8))})
    # r_0 = scale on seeds (all nodes when seeds is None)
    rk_s = pa.table({"node": s, "other": empty,
                     "value": pa.array(
                         np.where(_seed_mask(s, seeds), scale, 0)
                         .astype(np.int64)),
                     "kind": pa.array(np.ones(n, np.int8))})
    rk_d = pa.table({"node": d, "other": empty,
                     "value": pa.array(
                         np.where(_seed_mask(d, seeds), scale, 0)
                         .astype(np.int64)),
                     "kind": pa.array(np.ones(n, np.int8))})
    t = pa.concat_tables([edges, rk_s, rk_d]).combine_chunks()
    return _pr_state(t["node"], t["other"], t["value"], t["kind"], n_parts)


def _pr_round(part: pa.Table, *, n_parts: int, scale: int,
              first: bool, seeds: tuple[str, ...] | None = None
              ) -> pa.Table:
    """One PageRank pass over one hash partition, fully vectorized:
    ``r_new(v) = base + (85 · Σ candidates(v)) // 100`` (or the carried
    rank on the first pass), then re-emit adjacency, the new rank row and
    one candidate ``(dst, r_new // outdeg)`` per out-edge.  All arithmetic
    is int64 floor division — exact, partition-invariant, and replayable
    by the SQL-unrolled oracle."""
    import pyarrow.compute as pc

    if "__part" in part.column_names:
        part = part.drop_columns(["__part"])
    if len(part) == 0:
        return _pr_empty(n_parts)
    node = part["node"].combine_chunks()
    other = part["other"].combine_chunks()
    enc = pc.dictionary_encode(node)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    value = np.asarray(part["value"], dtype=np.int64)
    kind = np.asarray(part["kind"], dtype=np.int8)

    order = np.argsort(codes, kind="stable")
    codes_s = codes[order]
    value_s = value[order]
    kind_s = kind[order]
    node_s = node.take(pa.array(order))
    other_s = other.take(pa.array(order))

    starts = np.nonzero(np.concatenate(
        ([True], codes_s[1:] != codes_s[:-1])))[0]
    counts = np.diff(np.concatenate((starts, [len(codes_s)])))

    uniq_pre = node_s.take(pa.array(starts))
    seed_m = _seed_mask(uniq_pre, seeds)
    cand_sum = np.add.reduceat(np.where(kind_s == 2, value_s, 0), starts)
    r_old = np.maximum.reduceat(np.where(kind_s == 1, value_s, -1), starts)
    # restart mass lands only on seeds (uniform PR when seeds is None)
    base = np.where(seed_m, (15 * scale) // 100, 0).astype(np.int64)
    if first:
        new_r = np.where(r_old >= 0, r_old,
                         np.where(seed_m, scale, 0)).astype(np.int64)
    else:
        new_r = base + (85 * cand_sum) // 100

    edge_mask = kind_s == 0
    n_edges = int(edge_mask.sum())
    deg = np.add.reduceat(edge_mask.astype(np.int64), starts)
    row_new_r = np.repeat(new_r, counts)
    row_deg = np.repeat(deg, counts)
    contrib = (row_new_r[edge_mask]
               // np.maximum(row_deg[edge_mask], 1))

    uniq_nodes = node_s.take(pa.array(starts))
    edges_out = pa.table({
        "node": node_s.filter(pa.array(edge_mask)),
        "other": other_s.filter(pa.array(edge_mask)),
        "value": pa.array(np.zeros(n_edges, np.int64)),
        "kind": pa.array(np.zeros(n_edges, np.int8))})
    ranks_out = pa.table({
        "node": uniq_nodes,
        "other": pa.array([""] * len(uniq_nodes), pa.string()),
        "value": pa.array(new_r, pa.int64()),
        "kind": pa.array(np.ones(len(uniq_nodes), np.int8))})
    cands_out = pa.table({
        "node": other_s.filter(pa.array(edge_mask)),
        "other": pa.array([""] * n_edges, pa.string()),
        "value": pa.array(contrib, pa.int64()),
        "kind": pa.array(np.full(n_edges, 2, np.int8))})
    t = pa.concat_tables([edges_out, ranks_out, cands_out]).combine_chunks()
    return _pr_state(t["node"], t["other"], t["value"], t["kind"], n_parts)


def pagerank(edges, rounds: int = 5, src: str = "src", dst: str = "dst",
             scale: int = 1_000_000, n_parts: int = 32,
             seeds: list[str] | None = None):
    """Distributed PageRank with damping 0.85 over ``rounds`` fixed
    iterations, in integer fixed-point (``scale`` = rank 1.0):
    ``r_0 = scale``, ``r_{i+1}(v) = 0.15·scale + (85 · Σ_{u→v}
    (r_i(u) // outdeg(u))) // 100``.  Dangling mass is dropped
    (documented deviation from the redistribute variant).

    Shape (same as :func:`connected_components`): state rows co-partition
    on hash(node) so each pass sees ALL of a node's edges (out-degree is
    counted in-segment — no degree join), ranks, and incoming candidates;
    ONE exchange per round carries O(edges) rows; nothing touches the
    driver.  Exact integer arithmetic makes the result independent of
    partitioning/order and lets the oracle unroll the rounds in SQL.

    ``seeds`` switches to PERSONALIZED PageRank: the restart mass (and
    the initial rank) lands only on the seed nodes, so ranks measure
    relevance to the seed set rather than global centrality."""
    from trustfuse_ray.stages.common import plasma_exchange

    seed_t = tuple(seeds) if seeds is not None else None

    state_schema = pa.schema([("node", pa.string()),
                              ("other", pa.string()),
                              ("value", pa.int64()), ("kind", pa.int8()),
                              ("__part", pa.int32())])
    state = edges.map_batches(
        functools.partial(_pr_init, src=src, dst=dst, n_parts=n_parts,
                          scale=scale, seeds=seed_t),
        batch_format="pyarrow", zero_copy_batch=True)
    for i in range(rounds + 1):
        # __part is precomputed — the plasma task exchange skips the
        # sample+sort fixed cost Ray's groupby pays every round
        state = plasma_exchange(
            [state.materialize()],
            functools.partial(_pr_round, n_parts=n_parts, scale=scale,
                              first=(i == 0), seeds=seed_t),
            n_parts, part_col="__part", empty_schema=state_schema)

    def _finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        batch = batch.filter(pc.equal(batch["kind"],
                                      pa.scalar(1, pa.int8())))
        return pa.table({"node": batch["node"],
                         "pagerank_fx": batch["value"]})

    return state.map_batches(_finish, batch_format="pyarrow",
                             zero_copy_batch=True)


# --------------------------------------------------------------------------
# Triangle counting (degree-oriented wedge check)
# --------------------------------------------------------------------------

def triangle_count(edges, src: str = "src", dst: str = "dst",
                   n_parts: int = 32):
    """Exact triangle count of the undirected simple graph induced by the
    edge Dataset (duplicates and self-loops dropped).

    The classic degree-orientation algorithm, expressed as co-partitioned
    exchanges: orient each edge from its (degree, id)-smaller endpoint to
    the larger, emit wedges only between a node's ORIENTED out-neighbours
    (total wedges bounded by O(m^1.5) regardless of hub skew), and close
    each wedge against the oriented edge set by co-partitioning wedges
    with edges on the pair key.  Five bounded exchanges, nothing on the
    driver but the final one-row sum."""
    import pyarrow.compute as pc

    from trustfuse_ray.stages.common import hash_group_apply

    # 1. canonical distinct edges (a < b)
    def _canon(batch: pa.Table) -> pa.Table:
        s = batch[src].cast(pa.string())
        d = batch[dst].cast(pa.string())
        keep = pc.not_equal(s, d)
        s, d = s.filter(keep), d.filter(keep)
        lt = pc.less(s, d)
        t = pa.table({"a": pc.if_else(lt, s, d), "b": pc.if_else(lt, d, s)})
        return pa.TableGroupBy(t, ["a", "b"],
                               use_threads=False).aggregate([])

    pair_schema = pa.schema([("a", pa.string()), ("b", pa.string())])
    dedup = hash_group_apply(
        edges.map_batches(_canon, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["a", "b"], lambda g: g.slice(0, 1).select(["a", "b"]),
        n_parts=n_parts, plasma_schema=pair_schema)

    # 2. degrees (per-block combine, one small groupby)
    def _deg_partial(batch: pa.Table) -> pa.Table:
        node = pa.concat_arrays([batch["a"].combine_chunks(),
                                 batch["b"].combine_chunks()])
        enc = pc.dictionary_encode(node)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(idx, minlength=len(enc.dictionary))
        return pa.table({"node": enc.dictionary,
                         "deg": pa.array(cnt, pa.int64())})

    degs = (dedup.map_batches(_deg_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("node").sum("deg")
            .rename_columns({"sum(deg)": "deg"}))

    # 3. attach degree to each endpoint: two co-partitioning passes
    def _edge_rows(batch: pa.Table, key: str, other: str) -> pa.Table:
        return pa.table({"node": batch[key], "other": batch[other],
                         "deg": pa.array(np.full(len(batch), -1, np.int64)),
                         "odeg": (batch["odeg"] if "odeg" in
                                  batch.column_names else
                                  pa.array(np.full(len(batch), -1,
                                                   np.int64)))})

    def _deg_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({"node": batch["node"],
                         "other": pa.array([""] * n, pa.string()),
                         "deg": batch["deg"],
                         "odeg": pa.array(np.full(n, -1, np.int64))})

    def _attach(group: pa.Table) -> pa.Table:
        deg = np.asarray(group["deg"], dtype=np.int64)
        dmask = deg >= 0
        if not dmask.any():
            return pa.table({"node": pa.array([], pa.string()),
                             "other": pa.array([], pa.string()),
                             "deg": pa.array([], pa.int64()),
                             "odeg": pa.array([], pa.int64())})
        dval = int(deg[dmask][0])
        emask = pa.array(~dmask)
        sub = group.filter(emask)
        n = len(sub)
        # emit keyed on the OTHER endpoint, carrying this node's degree
        return pa.table({"node": sub["other"],
                         "other": sub["node"],
                         "deg": pa.array(np.full(n, -1, np.int64)),
                         "odeg": pa.array(np.full(n, dval, np.int64))})

    row_schema = pa.schema([("node", pa.string()), ("other", pa.string()),
                            ("deg", pa.int64()), ("odeg", pa.int64())])
    pass_a = hash_group_apply(
        dedup.map_batches(functools.partial(_edge_rows, key="a", other="b"),
                          batch_format="pyarrow", zero_copy_batch=True)
        .union(degs.map_batches(_deg_rows, batch_format="pyarrow")),
        ["node"], _attach, n_parts=n_parts, plasma_schema=row_schema)
    # pass_a rows: node=b, other=a, odeg=deg(a).  Attach deg(b) the same
    # way, then orient.

    def _attach_b(group: pa.Table) -> pa.Table:
        deg = np.asarray(group["deg"], dtype=np.int64)
        dmask = deg >= 0
        if not dmask.any():
            return pa.table({"u": pa.array([], pa.string()),
                             "v": pa.array([], pa.string()),
                             "vdeg": pa.array([], pa.int64())})
        dval = int(deg[dmask][0])
        sub = group.filter(pa.array(~dmask))
        a = sub["other"]          # the other endpoint
        b = sub["node"]           # this node (deg = dval)
        adeg = np.asarray(sub["odeg"], dtype=np.int64)
        bdeg = np.full(len(sub), dval, np.int64)
        # orient from (deg, id)-smaller to larger
        a_first = (adeg < bdeg) | ((adeg == bdeg)
                                   & (np.asarray(
                                       pc.less(a.combine_chunks()
                                               if isinstance(
                                                   a, pa.ChunkedArray)
                                               else a,
                                               b.combine_chunks()
                                               if isinstance(
                                                   b, pa.ChunkedArray)
                                               else b), dtype=bool)))
        am = pa.array(a_first)
        u = pa.concat_arrays([
            (a.combine_chunks() if isinstance(a, pa.ChunkedArray)
             else a).filter(am),
            (b.combine_chunks() if isinstance(b, pa.ChunkedArray)
             else b).filter(pc.invert(am))])
        v = pa.concat_arrays([
            (b.combine_chunks() if isinstance(b, pa.ChunkedArray)
             else b).filter(am),
            (a.combine_chunks() if isinstance(a, pa.ChunkedArray)
             else a).filter(pc.invert(am))])
        vdeg = np.concatenate([bdeg[a_first], adeg[~a_first]])
        return pa.table({"u": u, "v": v,
                         "vdeg": pa.array(vdeg, pa.int64())})

    oriented_schema = pa.schema([("u", pa.string()), ("v", pa.string()),
                                 ("vdeg", pa.int64())])
    oriented = hash_group_apply(
        pass_a.union(degs.map_batches(_deg_rows, batch_format="pyarrow")),
        ["node"], _attach_b, n_parts=n_parts,
        plasma_schema=oriented_schema)

    # 4. wedges between oriented out-neighbours, ordered by (deg, id)
    def _wedges(group: pa.Table) -> pa.Table:
        if len(group) < 2:
            return pa.table({"x": pa.array([], pa.string()),
                             "y": pa.array([], pa.string())})
        vd = np.asarray(group["vdeg"], dtype=np.int64)
        vs = (group["v"].combine_chunks()
              if isinstance(group["v"], pa.ChunkedArray) else group["v"])
        vlist = np.asarray(vs.to_pylist(), dtype=object)
        order = np.lexsort((vlist, vd))
        vlist = vlist[order]
        i, j = np.triu_indices(len(vlist), k=1)
        return pa.table({"x": pa.array(vlist[i], pa.string()),
                         "y": pa.array(vlist[j], pa.string())})

    wedge_schema = pa.schema([("x", pa.string()), ("y", pa.string())])
    wedges = hash_group_apply(oriented, ["u"], _wedges, n_parts=n_parts,
                              plasma_schema=wedge_schema)

    # 5. close wedges against the oriented edge set on the pair key
    def _wedge_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"x": batch["x"], "y": batch["y"],
                         "is_edge": pa.array(
                             np.zeros(len(batch), np.int8))})

    def _edge_pair_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"x": batch["u"], "y": batch["v"],
                         "is_edge": pa.array(np.ones(len(batch), np.int8))})

    def _close(group: pa.Table) -> pa.Table:
        e = np.asarray(group["is_edge"], dtype=np.int8)
        n_w = int((e == 0).sum())
        n_tri = n_w if (e == 1).any() else 0
        return pa.table({"n": pa.array([n_tri], pa.int64())})

    close_schema = pa.schema([("n", pa.int64())])
    closed = hash_group_apply(
        wedges.map_batches(_wedge_rows, batch_format="pyarrow",
                           zero_copy_batch=True)
        .union(oriented.map_batches(_edge_pair_rows,
                                    batch_format="pyarrow",
                                    zero_copy_batch=True)),
        ["x", "y"], _close, n_parts=n_parts, plasma_schema=close_schema)
    total = closed.sum("n")
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "n_triangles": pa.array([int(total or 0)], pa.int64())}))


# --------------------------------------------------------------------------
# KG-embedding training data: deterministic negative sampling
# --------------------------------------------------------------------------

def kg_negative_samples(triples, k: int = 2, n_parts: int = 32):
    """Corrupt-tail negative sampling for KG-embedding training (the
    TransE-style contrastive pairs): for each categorical fused triple
    (entity, attr, value) emit ``k`` negatives whose corrupted value is
    picked DETERMINISTICALLY from the attr's sorted value vocabulary by
    ``md5_64(entity|attr|j) % n`` (collision with the true value steps to
    the next index, so a negative never equals the positive).  Attrs with
    a single-value vocabulary are skipped.

    Shape: the per-attr value vocabulary is collected once (small for
    categorical attrs — the broadcast-side assumption, documented) and
    ``ray.put``-broadcast; sampling is one streaming ``map_batches`` pass
    over the triples, no shuffle.  md5_64 == DuckDB ``md5_number_lower``,
    so the full sample replays in SQL.

    Returns (entity, attr, value_str, j, neg_value)."""
    import ray
    import pyarrow.compute as pc

    from trustfuse_ray.stages.dedup import _md5_token64

    def _cat_only(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.and_(pc.not_equal(batch["value_type"], "quantity"),
                    pc.is_valid(batch["value_str"])))

    cat = triples.map_batches(_cat_only, batch_format="pyarrow",
                              zero_copy_batch=True)
    pool_rows = (cat.select_columns(["attr", "value_str"])
                 .groupby(["attr", "value_str"]).count().take_all())
    pools: dict[str, list[str]] = {}
    for r in pool_rows:
        pools.setdefault(r["attr"], []).append(r["value_str"])
    pools = {a: sorted(vs) for a, vs in pools.items() if len(vs) >= 2}
    pools_ref = ray.put(pools)

    _memo: dict = {}

    def _sample(batch: pa.Table) -> pa.Table:
        # one plasma fetch + deserialize per worker process, then memoized
        pl = _memo.get("p")
        if pl is None:
            pl = _memo["p"] = ray.get(pools_ref)
        ents = batch["entity"].to_pylist()
        attrs = batch["attr"].to_pylist()
        vals = batch["value_str"].to_pylist()
        oe, oa, ov, oj, on = [], [], [], [], []
        for e, a, v in zip(ents, attrs, vals):
            pool = pl.get(a)
            if pool is None:
                continue
            n = len(pool)
            for j in range(1, k + 1):
                idx = _md5_token64(f"{e}|{a}|{j}") % n
                if pool[idx] == v:
                    idx = (idx + 1) % n
                oe.append(e)
                oa.append(a)
                ov.append(v)
                oj.append(j)
                on.append(pool[idx])
        return pa.table({
            "entity": pa.array(oe, pa.string()),
            "attr": pa.array(oa, pa.string()),
            "value_str": pa.array(ov, pa.string()),
            "j": pa.array(oj, pa.int64()),
            "neg_value": pa.array(on, pa.string())})

    return cat.map_batches(_sample, batch_format="pyarrow",
                           zero_copy_batch=True)


def degree_histogram(edges, node_col: str = "src"):
    """Degree distribution of an edge Dataset: (degree, n_nodes) — the
    shape-of-the-graph profile (hub detection, skew planning for the
    per-key graph rounds).  Per-block (node, n) combine → one node
    groupby-sum → O(distinct degrees) histogram partials → tiny final
    sum.  Nothing scales with edge count past the first combine."""
    import pyarrow.compute as pc

    def _partial(batch: pa.Table) -> pa.Table:
        col = batch[node_col]
        enc = pc.dictionary_encode(col.combine_chunks()
                                   if isinstance(col, pa.ChunkedArray)
                                   else col)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.bincount(idx, minlength=len(enc.dictionary))
        return pa.table({"node": enc.dictionary,
                         "n": pa.array(counts, pa.int64())})

    deg = (edges.select_columns([node_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node").sum("n"))

    def _hist(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["sum(n)"], dtype=np.int64)
        uniq, cnt = np.unique(d, return_counts=True)
        return pa.table({"degree": pa.array(uniq, pa.int64()),
                         "n_nodes": pa.array(cnt.astype(np.int64))})

    return (deg.map_batches(_hist, batch_format="pyarrow",
                            zero_copy_batch=True)
            .groupby("degree").sum("n_nodes")
            .rename_columns({"sum(n_nodes)": "n_nodes"}))


def export_ntriples(triples, out_dir: str):
    """Materialize fused triples as N-Triples text shards (one ``.nt``
    file per block, written inside the map task — no driver collection):
    ``<kg:entity> <kg:attr> "value" .`` with minimal N-Triples escaping.
    The interchange-format sibling of the Parquet triple tables.

    Returns the number of shards written."""
    import os

    import pyarrow.compute as pc

    os.makedirs(out_dir, exist_ok=True)

    def _esc(s: str) -> str:
        return (s.replace("\\", "\\\\").replace('"', '\\"')
                .replace("\n", "\\n"))

    def _write(batch: pa.Table) -> pa.Table:
        import uuid

        ents = batch["entity"].to_pylist()
        attrs = batch["attr"].to_pylist()
        vs = batch["value_str"].to_pylist()
        vn = batch["value_num"].to_pylist()
        lines = []
        for e, a, s, n in zip(ents, attrs, vs, vn):
            if s is not None:
                obj = f'"{_esc(s)}"'
            elif n is not None:
                obj = (f'"{n!r}"^^'
                       "<http://www.w3.org/2001/XMLSchema#double>")
            else:
                continue
            lines.append(f"<kg:{_esc(e)}> <kg:{_esc(a)}> {obj} .")
        if lines:
            path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.nt")
            with open(path, "w") as fh:
                fh.write("\n".join(lines) + "\n")
        return pa.table({"n": pa.array([len(lines)], pa.int64())})

    counts = triples.map_batches(_write, batch_format="pyarrow",
                                 zero_copy_batch=True).take_all()
    return sum(1 for r in counts if r["n"])


def kcore(edges, k: int = 3, rounds: int = 8, src: str = "src",
          dst: str = "dst", n_parts: int = 32):
    """k-core decomposition by iterative peeling: repeatedly drop nodes of
    degree < k until stable (≤ ``rounds`` rounds — the SQL oracle unrolls
    the same fixed count, and a converged peel makes the remaining rounds
    no-ops, so early exit never changes the result).  Returns
    (node, degree) over the final core-induced subgraph.

    Scale shape: ONE plasma exchange per round — the adjacency is
    hash-partitioned by DST once (static, materialized), and each round
    co-partitions only the alive set against it, counting per-SRC edges
    whose dst is alive.  Filtering the src side is unnecessary during
    iteration: peeling is monotone (alive only shrinks), so a dropped
    node's recomputed degree can only shrink and it can never re-enter
    — the per-round degree of an alive node equals the both-ends-alive
    degree the oracle computes.  The final output pass adds one alive
    semi-join so reported rows are exactly the core-induced subgraph.
    Input must carry both directions of each undirected edge (as
    `und_edges_from_triples` emits)."""
    import ray.data as rd
    import pyarrow.compute as pc

    from trustfuse_ray.stages.common import _add_part, plasma_exchange

    ex_schema = pa.schema([("node", pa.string()), ("other", pa.string()),
                           ("side", pa.int8()), ("__part", pa.int32())])

    def _by_dst(batch: pa.Table) -> pa.Table:
        # keyed by dst; "other" carries the src whose degree the row feeds
        return pa.table({
            "node": batch[dst].cast(pa.string()),
            "other": batch[src].cast(pa.string()),
            "side": pa.array(np.zeros(len(batch), np.int8))})

    def _alive_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "node": batch["node"].cast(pa.string()),
            "other": pa.array([""] * n, pa.string()),
            "side": pa.array(np.ones(n, np.int8))})

    def _keyed(ds):
        return ds.map_batches(
            functools.partial(_add_part, keys=["node"], n_parts=n_parts),
            batch_format="pyarrow", zero_copy_batch=True)

    def _count_part(tbl: pa.Table) -> pa.Table:
        """Partial per-src counts of adjacency rows whose dst-run holds an
        alive row."""
        out_schema = pa.schema([("node", pa.string()),
                                ("n", pa.int64())])
        if len(tbl) == 0:
            return out_schema.empty_table()
        node = tbl["node"].to_pandas().to_numpy(dtype=object)
        side = np.asarray(tbl["side"], dtype=np.int8)
        order = np.lexsort((side, node))
        ns, ss = node[order], side[order]
        n = len(ns)
        head = np.ones(n, dtype=bool)
        head[1:] = ns[1:] != ns[:-1]
        run_id = np.cumsum(head) - 1
        has_alive = np.zeros(int(run_id[-1]) + 1, dtype=bool)
        has_alive[run_id[ss == 1]] = True
        adj = (ss == 0) & has_alive[run_id]
        if not adj.any():
            return out_schema.empty_table()
        srcs = tbl["other"].take(pa.array(order[adj]))
        t = pa.table({"node": srcs})
        return (t.group_by(["node"]).aggregate([("node", "count")])
                .rename_columns(["node", "n"]))

    keyed_edges = _keyed(edges.map_batches(
        _by_dst, batch_format="pyarrow", zero_copy_batch=True)
    ).materialize()
    alive = (edges.groupby(src).count()
             .map_batches(lambda b: pa.table(
                 {"node": b[src].cast(pa.string())}),
                 batch_format="pyarrow"))
    alive = alive.materialize()
    n_alive = alive.count()

    def _round_degrees(al):
        parts = plasma_exchange(
            [keyed_edges, _keyed(al.map_batches(
                _alive_rows, batch_format="pyarrow"))],
            _count_part, n_parts, part_col="__part",
            empty_schema=ex_schema)
        return (parts.groupby("node").sum("n")
                .rename_columns({"sum(n)": "degree"}))

    deg = None
    for _ in range(rounds):
        deg = _round_degrees(alive).materialize()
        nxt = (deg.filter(expr=f"degree >= {int(k)}")
               .select_columns(["node"]).materialize())
        cur = nxt.count()
        alive = nxt
        if cur == n_alive:
            break
        n_alive = cur
    # final: degrees against the final alive set, reported only for
    # alive nodes (one tagged co-partition semi-join)
    final_deg = _round_degrees(alive)

    def _deg_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["node"].cast(pa.string()),
            "other": batch["degree"].cast(pa.int64()).cast(pa.string()),
            "side": pa.array(np.zeros(len(batch), np.int8))})

    def _semi_out(tbl: pa.Table) -> pa.Table:
        out_schema = pa.schema([("node", pa.string()),
                                ("degree", pa.int64())])
        if len(tbl) == 0:
            return out_schema.empty_table()
        node = tbl["node"].to_pandas().to_numpy(dtype=object)
        side = np.asarray(tbl["side"], dtype=np.int8)
        order = np.lexsort((side, node))
        ns, ss = node[order], side[order]
        n = len(ns)
        head = np.ones(n, dtype=bool)
        head[1:] = ns[1:] != ns[:-1]
        run_id = np.cumsum(head) - 1
        has_alive = np.zeros(int(run_id[-1]) + 1, dtype=bool)
        has_alive[run_id[ss == 1]] = True
        keep = (ss == 0) & has_alive[run_id]
        if not keep.any():
            return out_schema.empty_table()
        sel = pa.array(order[keep])
        return pa.table({
            "node": tbl["node"].take(sel),
            "degree": pc.cast(pc.cast(tbl["other"].take(sel),
                                      pa.float64()), pa.int64())})

    return plasma_exchange(
        [_keyed(final_deg.map_batches(_deg_rows,
                                      batch_format="pyarrow")),
         _keyed(alive.map_batches(_alive_rows, batch_format="pyarrow"))],
        _semi_out, n_parts, part_col="__part", empty_schema=ex_schema)


def link_candidates(edges, min_common: int = 2, hub_cap: int = 64,
                    src: str = "src", dst: str = "dst", n_parts: int = 32):
    """Link-prediction candidates by common-neighbor mining: unordered
    node pairs sharing ≥ ``min_common`` neighbors that are NOT already
    connected — the KG-completion shortlist.  Nodes with more than
    ``hub_cap`` neighbors are skipped as common neighbors (hubs connect
    everything and convey no signal — the standard heuristic, and the
    O(deg²) pair fan-out stop-cap; same rule in the SQL oracle).

    Shape: one co-partition on the shared-neighbor node emits its
    O(min(deg, cap)²) pair partials; a second (a, b) co-partition sums
    counts and anti-joins the tagged existing-edge stream.  Input must
    carry both directions of each undirected edge."""
    import ray.data as rd
    import pyarrow.compute as pc

    from trustfuse_ray.stages.common import hash_group_apply

    def _node_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch[src].cast(pa.string()),
                         "other": batch[dst].cast(pa.string())})

    def _pairs(group: pa.Table) -> pa.Table:
        empty = pa.schema([("a", pa.string()), ("b", pa.string()),
                           ("n", pa.int64()),
                           ("side", pa.int8())]).empty_table()
        nbrs = sorted(set(group["other"].to_pylist()))
        if len(nbrs) < 2 or len(nbrs) > hub_cap:
            return empty
        a, b = [], []
        for i, x in enumerate(nbrs):
            for y in nbrs[i + 1:]:
                a.append(x)
                b.append(y)
        n = len(a)
        return pa.table({"a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string()),
                         "n": pa.array(np.ones(n, np.int64)),
                         "side": pa.array(np.zeros(n, np.int8))})

    partials = hash_group_apply(
        edges.map_batches(_node_rows, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["node"], _pairs, n_parts=n_parts,
        plasma_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                                 ("n", pa.int64()), ("side", pa.int8())]))

    def _edge_rows(batch: pa.Table) -> pa.Table:
        s = batch[src].cast(pa.string())
        d = batch[dst].cast(pa.string())
        lo = pc.min_element_wise(s, d)
        hi = pc.max_element_wise(s, d)
        n = len(batch)
        return pa.table({"a": lo, "b": hi,
                         "n": pa.array(np.zeros(n, np.int64)),
                         "side": pa.array(np.ones(n, np.int8))})

    tagged = partials.union(edges.map_batches(
        _edge_rows, batch_format="pyarrow", zero_copy_batch=True))

    def _reduce(group: pa.Table) -> pa.Table:
        empty = pa.schema([("a", pa.string()), ("b", pa.string()),
                           ("n_common", pa.int64())]).empty_table()
        side = np.asarray(group["side"], dtype=np.int8)
        if (side == 1).any():  # already connected
            return empty
        total = int(np.asarray(group["n"], dtype=np.int64).sum())
        if total < min_common:
            return empty
        return pa.table({"a": group["a"][:1], "b": group["b"][:1],
                         "n_common": pa.array([total], pa.int64())})

    return hash_group_apply(
        tagged, ["a", "b"], _reduce, n_parts=n_parts,
        plasma_schema=pa.schema([("a", pa.string()), ("b", pa.string()),
                                 ("n_common", pa.int64())]))


def rule_inference_2hop(triples, attr: str = "neighbor",
                        n_parts: int = 32):
    """Rule-based KG inference: compose a relation with itself —
    ``attr(x, y) ∧ attr(y, z) ∧ x ≠ z → derived(x, z)`` — emitting each
    derived pair with the number of distinct witnesses y.  The simplest
    Datalog-style rule pass (neighbor-of-neighbor), the building block
    of KG completion pipelines.

    Shape: fused triples of ``attr`` co-partition on the MIDDLE node y
    (each y holds its in/out lists; fan-out is deg_in × deg_out, the
    hub-bounded rule cost); a second (x, z) groupby counts witnesses."""
    import numpy as np
    import pyarrow.compute as pc

    def _rel(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(batch["attr"], attr),
                       pc.is_valid(batch["value_str"]))
        t = batch.filter(keep)
        return pa.table({"x": t["entity"].cast(pa.string()),
                         "y": t["value_str"].cast(pa.string())})

    rel = triples.map_batches(_rel, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _mid_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.schema([("mid", pa.string()),
                              ("other", pa.string()),
                              ("side", pa.int8())]).empty_table()
        # row into y's group twice: as incoming (x -> y) and outgoing
        # (y -> z); side 0 = incoming, 1 = outgoing
        return pa.concat_tables([
            pa.table({"mid": batch["y"], "other": batch["x"],
                      "side": pa.array(np.zeros(n, np.int8))}),
            pa.table({"mid": batch["x"], "other": batch["y"],
                      "side": pa.array(np.ones(n, np.int8))}),
        ]).combine_chunks()

    from trustfuse_ray.stages.common import hash_group_apply

    def _compose(group: pa.Table) -> pa.Table:
        side = np.asarray(group["side"], dtype=np.int8)
        others = group["other"].to_pylist()
        xs = sorted({o for o, sd in zip(others, side) if sd == 0})
        zs = sorted({o for o, sd in zip(others, side) if sd == 1})
        a, b = [], []
        for x in xs:
            for z in zs:
                if x != z:
                    a.append(x)
                    b.append(z)
        return pa.table({"x": pa.array(a, pa.string()),
                         "z": pa.array(b, pa.string()),
                         "n": pa.array(np.ones(len(a), np.int64))})

    pairs = hash_group_apply(
        rel.map_batches(_mid_rows, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["mid"], _compose, n_parts=n_parts,
        plasma_schema=pa.schema([("x", pa.string()), ("z", pa.string()),
                                 ("n", pa.int64())]))
    return (pairs.groupby(["x", "z"]).sum("n")
            .rename_columns({"sum(n)": "n_witnesses"}))


# --------------------------------------------------------------------------
# HITS (hubs & authorities) — alternating co-partitioned exchanges
# --------------------------------------------------------------------------

_HK_EOUT, _HK_HUB, _HK_AUTH, _HK_CONTRIB, _HK_EIN = 0, 1, 2, 3, 4


def _hits_empty(n_parts: int) -> pa.Table:
    return _pr_empty(n_parts)


def _hits_init(batch: pa.Table, *, src: str, dst: str,
               n_parts: int) -> pa.Table:
    if len(batch) == 0:
        return _hits_empty(n_parts)
    s = batch[src].cast(pa.string())
    d = batch[dst].cast(pa.string())
    if isinstance(s, pa.ChunkedArray):
        s = s.combine_chunks()
    if isinstance(d, pa.ChunkedArray):
        d = d.combine_chunks()
    n = len(s)
    zero = pa.array(np.zeros(n, np.int64))
    eo = pa.table({"node": s, "other": d, "value": zero,
                   "kind": pa.array(np.full(n, _HK_EOUT, np.int8))})
    ei = pa.table({"node": d, "other": s, "value": zero,
                   "kind": pa.array(np.full(n, _HK_EIN, np.int8))})
    t = pa.concat_tables([eo, ei]).combine_chunks()
    return _pr_state(t["node"], t["other"], t["value"], t["kind"], n_parts)


def _node_sums(node: pa.Array, value: np.ndarray):
    """(unique nodes, per-node int64 sums) — dictionary-encode + reduceat."""
    import pyarrow.compute as pc

    enc = pc.dictionary_encode(node)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nk = len(enc.dictionary)
    sums = np.zeros(nk, np.int64)
    np.add.at(sums, codes, value)
    return enc.dictionary, sums, codes


def _hits_half(part: pa.Table, *, n_parts: int, scale: int,
               edge_kind: int, score_kind: int, first: bool,
               norm_max: int) -> pa.Table:
    """One HITS half-round over one hash partition: sum the incoming
    contributions (each normalized ``v·scale // norm_max``) into this
    side's new score, emit the opposite side's contributions (one per
    resident edge, carrying the raw new score), re-emit the resident
    edges, and pass the other side's rows through untouched.  All
    arithmetic is int64 floor division — partition-invariant and
    SQL-replayable."""
    import pyarrow.compute as pc

    if "__part" in part.column_names:
        part = part.drop_columns(["__part"])
    if len(part) == 0:
        return _hits_empty(n_parts)
    kind = np.asarray(part["kind"], dtype=np.int8)

    keep = (kind != score_kind) & (kind != _HK_CONTRIB) & (kind != edge_kind)
    through = part.filter(pa.array(keep))

    edges = part.filter(pa.array(kind == edge_kind))
    if len(edges) == 0:
        t = through.combine_chunks()
        return _pr_state(t["node"], t["other"], t["value"], t["kind"],
                         n_parts)
    enode = edges["node"].combine_chunks()

    if first:
        nodes, _, codes = _node_sums(enode, np.zeros(len(enode), np.int64))
        new = np.full(len(nodes), scale, np.int64)
    else:
        contribs = part.filter(pa.array(kind == _HK_CONTRIB))
        cval = (np.asarray(contribs["value"], np.int64) * scale
                // max(norm_max, 1))
        cn, csum, _ = _node_sums(contribs["node"].combine_chunks(), cval)
        # map each edge's node to its summed score; every edge-owning
        # node received exactly one contribution per resident edge, so a
        # miss is a correctness bug — fail loudly
        nodes, _, codes = _node_sums(enode, np.zeros(len(enode), np.int64))
        ix = pc.index_in(nodes, value_set=cn).to_numpy(
            zero_copy_only=False)
        if np.any(np.isnan(ix.astype(np.float64))):
            raise ValueError("hits: edge node missing its contributions")
        new = csum[ix.astype(np.int64)]

    n_e = len(enode)
    score_rows = pa.table({
        "node": nodes,
        "other": pa.array([""] * len(nodes), pa.string()),
        "value": pa.array(new, pa.int64()),
        "kind": pa.array(np.full(len(nodes), score_kind, np.int8))})
    contrib_rows = pa.table({
        "node": edges["other"].combine_chunks(),
        "other": pa.array([""] * n_e, pa.string()),
        "value": pa.array(new[codes], pa.int64()),
        "kind": pa.array(np.full(n_e, _HK_CONTRIB, np.int8))})
    edge_rows = edges.select(["node", "other", "value", "kind"])
    t = pa.concat_tables([
        through.combine_chunks(), edge_rows.combine_chunks(),
        score_rows, contrib_rows]).combine_chunks()
    return _pr_state(t["node"], t["other"], t["value"], t["kind"], n_parts)


def _hits_finish(part: pa.Table, *, scale: int, h_max: int,
                 a_max: int) -> pa.Table:
    import pyarrow.compute as pc

    kind = np.asarray(part["kind"], dtype=np.int8) if len(part) else \
        np.zeros(0, np.int8)
    out_schema = pa.schema([("node", pa.string()),
                            ("hub_fx", pa.int64()),
                            ("auth_fx", pa.int64())])
    if len(part) == 0:
        return out_schema.empty_table()
    scores = part.filter(pa.array((kind == _HK_HUB) | (kind == _HK_AUTH)))
    if len(scores) == 0:
        return out_schema.empty_table()
    node = scores["node"].combine_chunks()
    k = np.asarray(scores["kind"], np.int8)
    v = np.asarray(scores["value"], np.int64)
    hub = np.where(k == _HK_HUB, v * scale // max(h_max, 1), 0)
    auth = np.where(k == _HK_AUTH, v * scale // max(a_max, 1), 0)
    enc = pc.dictionary_encode(node)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nk = len(enc.dictionary)
    hsum = np.zeros(nk, np.int64)
    asum = np.zeros(nk, np.int64)
    np.add.at(hsum, codes, hub)
    np.add.at(asum, codes, auth)
    return pa.table({"node": enc.dictionary,
                     "hub_fx": pa.array(hsum, pa.int64()),
                     "auth_fx": pa.array(asum, pa.int64())})


def _kind_max(state, kind: int) -> int:
    import pyarrow.compute as pc

    def _m(b: pa.Table) -> pa.Table:
        vals = b["value"].filter(pc.equal(b["kind"],
                                          pa.scalar(kind, pa.int8())))
        m = pc.max(vals).as_py() if len(vals) else None
        return pa.table({"m": pa.array([m if m is not None else 0],
                                       pa.int64())})

    rows = state.map_batches(_m, batch_format="pyarrow",
                             zero_copy_batch=True).take_all()
    return max((r["m"] for r in rows), default=0)


def hits(edges, rounds: int = 2, src: str = "src", dst: str = "dst",
         scale: int = 1_000_000, n_parts: int = 32):
    """Distributed HITS (Kleinberg hubs & authorities) over a DIRECTED
    edge Dataset, ``rounds`` full hub↔authority iterations in exact int64
    fixed point: per round, auth(v) = Σ_{u→v} hub_norm(u) then hub(u) =
    Σ_{u→v} auth_norm(v), where ``x_norm = x·scale // max(x)`` (global
    max — one tiny driver reduce per half-round; floor division keeps
    every value partition-invariant and lets the oracle unroll the rounds
    in SQL).

    Shape mirrors :func:`pagerank`: edge rows live co-partitioned on
    hash(src) (hub side) and hash(dst) (auth side); each half-round is ONE
    plasma exchange carrying O(edges) rows, alternating partition key;
    nothing but the per-half max scalar touches the driver.  Returns
    (node, hub_fx, auth_fx) — 0 where a node has no out-/in-edges."""
    from trustfuse_ray.stages.common import plasma_exchange

    state_schema = pa.schema([("node", pa.string()),
                              ("other", pa.string()),
                              ("value", pa.int64()), ("kind", pa.int8()),
                              ("__part", pa.int32())])
    state = edges.map_batches(
        functools.partial(_hits_init, src=src, dst=dst, n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True)
    a_max = scale
    h_max = scale
    for r in range(rounds):
        state = plasma_exchange(
            [state.materialize()],
            functools.partial(_hits_half, n_parts=n_parts, scale=scale,
                              edge_kind=_HK_EOUT, score_kind=_HK_HUB,
                              first=(r == 0), norm_max=a_max),
            n_parts, part_col="__part", empty_schema=state_schema
        ).materialize()
        h_max = _kind_max(state, _HK_HUB)
        state = plasma_exchange(
            [state],
            functools.partial(_hits_half, n_parts=n_parts, scale=scale,
                              edge_kind=_HK_EIN, score_kind=_HK_AUTH,
                              first=False, norm_max=h_max),
            n_parts, part_col="__part", empty_schema=state_schema
        ).materialize()
        a_max = _kind_max(state, _HK_AUTH)
    return plasma_exchange(
        [state],
        functools.partial(_hits_finish, scale=scale, h_max=h_max,
                          a_max=a_max),
        n_parts, part_col="__part", empty_schema=state_schema)


# ---------------------------------------------------------------------------
# Depth-bounded all-pairs reachability (transitive closure up to k hops)
# ---------------------------------------------------------------------------

_RCH_SCHEMA = pa.schema([("node", pa.string()), ("other", pa.string()),
                         ("root", pa.string()), ("hops", pa.int64()),
                         ("side", pa.int8()), ("__part", pa.int32())])
_RCH_CAND = pa.schema([("root", pa.string()), ("node", pa.string()),
                       ("hops", pa.int64())])


def reachability(edges, k: int = 2, src: str = "src", dst: str = "dst",
                 n_parts: int = 16):
    """Depth-bounded transitive closure: every ``(root, node, hops)`` with
    ``1 <= hops <= k`` and hops = the MINIMUM path length, over a directed
    string-node edge Dataset (union reversed edges first for undirected
    closure).  Semi-naive: round r expands only the hop-(r-1) frontier.

    Scale shape: like :func:`bfs_hops`, but the frontier carries a
    ``root`` column so ALL sources expand in the same exchanges — per
    round one plasma exchange co-partitions frontier and adjacency on the
    node key, and the per-partition expansion is a vectorized run
    cross-product (each frontier row x its node's adjacency rows; no
    per-node Python).  Output size is sum-over-nodes |N_k(v)| — callers
    must bound it with k and a degree-capped edge set (the co-occurrence
    graph's stop-value cap does this).  The closure itself never touches
    the driver."""
    import ray.data as rd

    from trustfuse_ray.stages.common import _add_part, plasma_exchange

    def _tag_edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "node": batch[src].cast(pa.string()),
            "other": batch[dst].cast(pa.string()),
            "root": pa.array([""] * n, pa.string()),
            "hops": pa.array(np.full(n, -1, np.int64)),
            "side": pa.array(np.zeros(n, np.int8)),
        })

    def _frontier_rows(tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        return pa.table({
            "node": tbl["node"].cast(pa.string()),
            "other": pa.array([""] * n, pa.string()),
            "root": tbl["root"].cast(pa.string()),
            "hops": tbl["hops"].cast(pa.int64()),
            "side": pa.array(np.ones(n, np.int8)),
        })

    def _expand_part(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return _RCH_CAND.empty_table()
        node = tbl["node"].to_pandas().to_numpy(dtype=object)
        side = np.asarray(tbl["side"], dtype=np.int8)
        order = np.lexsort((side, node))      # adjacency (side 0) first
        ns, ss = node[order], side[order]
        n = len(ns)
        head = np.ones(n, dtype=bool)
        head[1:] = ns[1:] != ns[:-1]
        run_id = np.cumsum(head) - 1
        nruns = int(run_id[-1]) + 1
        run_start = np.flatnonzero(head)
        na = np.zeros(nruns, np.int64)        # adjacency rows per run
        np.add.at(na, run_id[ss == 0], 1)
        f_mask = ss == 1
        f_pos = np.flatnonzero(f_mask)        # frontier rows, sorted order
        rep = na[run_id[f_pos]]               # pair count per frontier row
        keep = rep > 0
        f_pos, rep = f_pos[keep], rep[keep]
        if len(f_pos) == 0:
            return _RCH_CAND.empty_table()
        total = int(rep.sum())
        out_f = np.repeat(f_pos, rep)         # sorted-order frontier index
        starts = np.concatenate(([0], np.cumsum(rep)[:-1]))
        within = np.arange(total) - np.repeat(starts, rep)
        out_a = run_start[run_id[out_f]] + within   # adjacency rows lead
        sel_f = order[out_f]
        sel_a = order[out_a]
        return pa.table({
            "root": tbl["root"].take(pa.array(sel_f)),
            "node": tbl["other"].take(pa.array(sel_a)),
            "hops": pa.array(
                np.asarray(tbl["hops"], np.int64)[sel_f] + 1, pa.int64()),
        })

    keyed_edges = edges.map_batches(
        _tag_edges, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        functools.partial(_add_part, keys=["node"], n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    def _roots(batch: pa.Table) -> pa.Table:
        nodes = pc_unique_str(batch[src], batch[dst])
        return pa.table({"root": nodes, "node": nodes,
                         "hops": pa.array(np.zeros(len(nodes), np.int64))})

    dist = (edges.map_batches(_roots, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby(["root", "node"]).min("hops")
            .rename_columns({"min(hops)": "hops"}).materialize())
    frontier = dist
    for r in range(1, k + 1):
        keyed_frontier = frontier.map_batches(
            _frontier_rows, batch_format="pyarrow").map_batches(
            functools.partial(_add_part, keys=["node"], n_parts=n_parts),
            batch_format="pyarrow", zero_copy_batch=True)
        cand = plasma_exchange([keyed_edges, keyed_frontier],
                               _expand_part, n_parts,
                               part_col="__part", empty_schema=_RCH_SCHEMA)
        dist = (dist.union(cand).groupby(["root", "node"]).min("hops")
                .rename_columns({"min(hops)": "hops"}).materialize())
        frontier = dist.filter(expr=f"hops == {r}").materialize()
        if frontier.count() == 0:
            break
    return dist.filter(expr="hops >= 1")


def pc_unique_str(*cols) -> pa.Array:
    """Distinct union of string columns within one batch (map-side dedup;
    the cross-block dedup is the caller's groupby)."""
    import pyarrow.compute as pc

    parts = []
    for c in cols:
        a = c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c
        parts.append(a.cast(pa.string()))
    return pc.unique(pa.concat_arrays(parts))


# ---------------------------------------------------------------------------
# Deterministic synchronous label propagation (community detection)
# ---------------------------------------------------------------------------

_LP_SCHEMA = pa.schema([("node", pa.string()), ("other", pa.string()),
                        ("label", pa.string()), ("side", pa.int8()),
                        ("__part", pa.int32())])
_LP_VOTE = pa.schema([("node", pa.string()), ("label", pa.string()),
                      ("c", pa.int64())])


def label_propagation(edges, rounds: int = 3, src: str = "src",
                      dst: str = "dst", n_parts: int = 16):
    """Synchronous label propagation over a directed string-node edge
    Dataset (union reversed edges first for the usual undirected variant):
    labels start as the node id; each round every node adopts the MODE of
    its in-neighbours' labels, ties broken by the lexicographically
    smallest label — fully deterministic, unlike classic async LP.

    Scale shape: per round, one plasma exchange co-partitions the label
    table with the (once-keyed) adjacency on the source node and emits
    ``(dst, label)`` votes map-side pre-counted per partition; the global
    mode is a ``groupby(node, label).sum`` followed by a per-node argmax
    inside a hash_group_apply.  Per-round traffic is O(edges) vote rows;
    isolated nodes (no in-edges) keep their current label."""
    import pyarrow.compute as pc

    from trustfuse_ray.stages.common import (_add_part, hash_group_apply,
                                             plasma_exchange)

    def _tag_edges(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "node": batch[src].cast(pa.string()),
            "other": batch[dst].cast(pa.string()),
            "label": pa.array([""] * n, pa.string()),
            "side": pa.array(np.zeros(n, np.int8)),
        })

    def _label_rows(tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        return pa.table({
            "node": tbl["node"].cast(pa.string()),
            "other": pa.array([""] * n, pa.string()),
            "label": tbl["label"].cast(pa.string()),
            "side": pa.array(np.ones(n, np.int8)),
        })

    def _vote_part(tbl: pa.Table) -> pa.Table:
        # each adjacency row inherits its source node's (single) label row
        if len(tbl) == 0:
            return _LP_VOTE.empty_table()
        node = tbl["node"].to_pandas().to_numpy(dtype=object)
        side = np.asarray(tbl["side"], dtype=np.int8)
        order = np.lexsort((side, node))      # adjacency first, label last
        ns, ss = node[order], side[order]
        n = len(ns)
        head = np.ones(n, dtype=bool)
        head[1:] = ns[1:] != ns[:-1]
        run_id = np.cumsum(head) - 1
        nruns = int(run_id[-1]) + 1
        lab_row = np.full(nruns, -1, np.int64)
        lmask = ss == 1
        lab_row[run_id[lmask]] = np.flatnonzero(lmask)
        adj = (ss == 0) & (lab_row[run_id] >= 0)
        if not adj.any():
            return _LP_VOTE.empty_table()
        sel_a = order[np.flatnonzero(adj)]
        sel_l = order[lab_row[run_id[adj]]]
        votes = pa.table({
            "node": tbl["other"].take(pa.array(sel_a)),
            "label": tbl["label"].take(pa.array(sel_l)),
        })
        # map-side pre-count: collapse duplicate (node, label) votes
        return (pa.TableGroupBy(votes, ["node", "label"],
                                use_threads=False)
                .aggregate([([], "count_all")])
                .rename_columns(["node", "label", "c"]))

    def _mode_group(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("c", "descending"),
                                                ("label", "ascending")])
        top = group.take(idx[:1])
        return pa.table({"node": top["node"], "label": top["label"]})

    keyed_edges = edges.map_batches(
        _tag_edges, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        functools.partial(_add_part, keys=["node"], n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    def _init_labels(batch: pa.Table) -> pa.Table:
        nodes = pc_unique_str(batch[src], batch[dst])
        return pa.table({"node": nodes, "label": nodes})

    labels = (edges.map_batches(_init_labels, batch_format="pyarrow",
                                zero_copy_batch=True)
              .groupby("node").min("label")
              .rename_columns({"min(label)": "label"}).materialize())
    vote_out = pa.schema([("node", pa.string()), ("label", pa.string()),
                          ("c", pa.int64()), ("__part", pa.int32())])
    for _ in range(rounds):
        keyed_labels = labels.map_batches(
            _label_rows, batch_format="pyarrow").map_batches(
            functools.partial(_add_part, keys=["node"], n_parts=n_parts),
            batch_format="pyarrow", zero_copy_batch=True)
        votes = plasma_exchange([keyed_edges, keyed_labels], _vote_part,
                                n_parts, part_col="__part",
                                empty_schema=_LP_SCHEMA)
        counted = (votes.groupby(["node", "label"]).sum("c")
                   .rename_columns({"sum(c)": "c"}))
        labels = hash_group_apply(
            counted, ["node"], _mode_group, n_parts=n_parts,
            plasma_schema=pa.schema([("node", pa.string()),
                                     ("label", pa.string())])).materialize()
    return labels


def resource_allocation(edges, min_common: int = 2, hub_cap: int = 64,
                        src: str = "src", dst: str = "dst",
                        n_parts: int = 32):
    """Weighted link prediction: Resource-Allocation index (Zhou/Lü/Zhang
    2009) over unordered non-adjacent node pairs — each common neighbour
    z contributes 1/deg(z), so promiscuous connectors count less than
    exclusive ones.  Exact fixed point: the contribution is the integer
    ``1_000_000 // deg(z)``, identical in the SQL oracle.

    Same two-exchange shape as :func:`link_candidates` (which this
    refines): co-partition on the shared neighbour emits its
    O(min(deg, cap)²) weighted pair partials; a second (a, b)
    co-partition sums scores and anti-joins the tagged existing-edge
    stream.  Nodes above ``hub_cap`` neighbours are skipped both as the
    O(deg²) stop-cap and because their 1/deg weight is noise anyway.
    Input must carry both directions of each undirected edge."""
    import pyarrow.compute as pc

    from trustfuse_ray.stages.common import hash_group_apply

    def _node_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch[src].cast(pa.string()),
                         "other": batch[dst].cast(pa.string())})

    part_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                             ("n", pa.int64()), ("ra", pa.int64()),
                             ("side", pa.int8())])

    def _pairs(group: pa.Table) -> pa.Table:
        nbrs = sorted(set(group["other"].to_pylist()))
        deg = len(nbrs)
        if deg < 2 or deg > hub_cap:
            return part_schema.empty_table()
        w = 1_000_000 // deg
        a, b = [], []
        for i, x in enumerate(nbrs):
            for y in nbrs[i + 1:]:
                a.append(x)
                b.append(y)
        n = len(a)
        return pa.table({"a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string()),
                         "n": pa.array(np.ones(n, np.int64)),
                         "ra": pa.array(np.full(n, w, np.int64)),
                         "side": pa.array(np.zeros(n, np.int8))})

    partials = hash_group_apply(
        edges.map_batches(_node_rows, batch_format="pyarrow",
                          zero_copy_batch=True),
        ["node"], _pairs, n_parts=n_parts, plasma_schema=part_schema)

    def _edge_rows(batch: pa.Table) -> pa.Table:
        s = batch[src].cast(pa.string())
        d = batch[dst].cast(pa.string())
        n = len(batch)
        z = pa.array(np.zeros(n, np.int64))
        return pa.table({"a": pc.min_element_wise(s, d),
                         "b": pc.max_element_wise(s, d),
                         "n": z, "ra": z,
                         "side": pa.array(np.ones(n, np.int8))})

    tagged = partials.union(edges.map_batches(
        _edge_rows, batch_format="pyarrow", zero_copy_batch=True))

    out_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                            ("n_common", pa.int64()),
                            ("ra_score", pa.int64())])

    def _reduce(group: pa.Table) -> pa.Table:
        side = np.asarray(group["side"], dtype=np.int8)
        if (side == 1).any():  # already connected
            return out_schema.empty_table()
        n = np.asarray(group["n"], dtype=np.int64)
        total = int(n.sum())
        if total < min_common:
            return out_schema.empty_table()
        ra = int(np.asarray(group["ra"], dtype=np.int64).sum())
        return pa.table({"a": group["a"][:1], "b": group["b"][:1],
                         "n_common": pa.array([total], pa.int64()),
                         "ra_score": pa.array([ra], pa.int64())})

    return hash_group_apply(tagged, ["a", "b"], _reduce,
                            n_parts=n_parts, plasma_schema=out_schema)


def clustering_coefficient(edges, hub_cap: int = 64,
                           src: str = "src", dst: str = "dst",
                           n_parts: int = 32):
    """Per-node local clustering coefficient (exact permille): the share
    of a node's neighbour pairs that are themselves connected —
    coeff = 2·closed_wedges // (deg·(deg−1)).  The bridge-vs-clique
    audit: pure-clique members score 1000, entities spanning clusters
    score lower.  Nodes above ``hub_cap`` neighbours are skipped (the
    O(deg²) wedge stop-cap, same rule as link_candidates; documented in
    the SQL oracle).

    Shape: wedge partials per center on a neighbour co-partition, closed
    against the tagged canonical edge stream on the (a, b) pair key,
    per-center closed counts re-keyed once, degree joined by one more
    co-partition — all exchanges bounded by capped wedges + edges."""
    import pyarrow.compute as pc

    from trustfuse_ray.stages.common import hash_group_apply

    def _node_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch[src].cast(pa.string()),
                         "other": batch[dst].cast(pa.string())})

    nodes = edges.map_batches(_node_rows, batch_format="pyarrow",
                              zero_copy_batch=True)

    wedge_schema = pa.schema([("a", pa.string()), ("b", pa.string()),
                              ("center", pa.string()),
                              ("side", pa.int8())])

    def _wedges(group: pa.Table) -> pa.Table:
        nbrs = sorted(set(group["other"].to_pylist()))
        deg = len(nbrs)
        if deg < 2 or deg > hub_cap:
            return wedge_schema.empty_table()
        center = group["node"][0].as_py()
        a, b = [], []
        for i, x in enumerate(nbrs):
            for y in nbrs[i + 1:]:
                a.append(x)
                b.append(y)
        n = len(a)
        return pa.table({"a": pa.array(a, pa.string()),
                         "b": pa.array(b, pa.string()),
                         "center": pa.array([center] * n, pa.string()),
                         "side": pa.array(np.zeros(n, np.int8))})

    wedges = hash_group_apply(nodes, ["node"], _wedges, n_parts=n_parts,
                              plasma_schema=wedge_schema)

    def _edge_rows(batch: pa.Table) -> pa.Table:
        s = batch[src].cast(pa.string())
        d = batch[dst].cast(pa.string())
        return pa.table({"a": pc.min_element_wise(s, d),
                         "b": pc.max_element_wise(s, d),
                         "center": pa.nulls(len(batch), pa.string()),
                         "side": pa.array(np.ones(len(batch), np.int8))})

    tagged = wedges.union(edges.map_batches(
        _edge_rows, batch_format="pyarrow", zero_copy_batch=True))

    closed_schema = pa.schema([("center", pa.string()),
                               ("closed", pa.int64())])

    def _close(group: pa.Table) -> pa.Table:
        side = np.asarray(group["side"], dtype=np.int8)
        if not (side == 1).any():
            return closed_schema.empty_table()
        centers = [c for c, s in zip(group["center"].to_pylist(), side)
                   if s == 0]
        if not centers:
            return closed_schema.empty_table()
        return pa.table({"center": pa.array(centers, pa.string()),
                         "closed": pa.array(
                             np.ones(len(centers), np.int64))})

    closed = hash_group_apply(tagged, ["a", "b"], _close,
                              n_parts=n_parts,
                              plasma_schema=closed_schema)

    deg_schema = pa.schema([("center", pa.string()),
                            ("deg", pa.int64()), ("closed", pa.int64())])

    def _deg(group: pa.Table) -> pa.Table:
        nbrs = set(group["other"].to_pylist())
        deg = len(nbrs)
        if deg < 2 or deg > hub_cap:
            return deg_schema.empty_table()
        return pa.table({"center": group["node"][:1],
                         "deg": pa.array([deg], pa.int64()),
                         "closed": pa.array([0], pa.int64())})

    degs = hash_group_apply(nodes, ["node"], _deg, n_parts=n_parts,
                            plasma_schema=deg_schema)

    # join-free combine: deg rows carry closed=0, closed partials carry
    # deg=0 — one groupby sums both sides (every closed center has a deg
    # row because wedges only ever come from cap-passing centers)
    def _closed_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"center": batch["center"],
                         "deg": pa.array(
                             np.zeros(len(batch), np.int64)),
                         "closed": batch["closed"]})

    both = degs.union(closed.map_batches(
        _closed_rows, batch_format="pyarrow", zero_copy_batch=True))
    agg = (both.groupby("center").sum(["deg", "closed"])
           .rename_columns({"sum(deg)": "deg",
                            "sum(closed)": "closed"}))

    def _shape(batch: pa.Table) -> pa.Table:
        deg = np.asarray(batch["deg"], dtype=np.int64)
        cl = np.asarray(batch["closed"], dtype=np.int64)
        keep = deg > 1
        deg, cl = deg[keep], cl[keep]
        coeff = 2000 * cl // (deg * (deg - 1))
        return pa.table({"node": batch["center"].filter(pa.array(keep)),
                         "deg": pa.array(deg, pa.int64()),
                         "closed_wedges": pa.array(cl, pa.int64()),
                         "coeff_permille": pa.array(coeff, pa.int64())})

    return agg.map_batches(_shape, batch_format="pyarrow",
                           zero_copy_batch=True)
