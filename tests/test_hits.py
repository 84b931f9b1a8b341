"""HITS (stages/graph.py::hits): distributed trajectory equals a
sequential fixed-point reference; hub/authority structure on a planted
bipartite graph; partitioning invariance."""

import numpy as np
import pyarrow as pa
import pytest


def _seq_hits(edges, rounds=2, scale=1_000_000):
    """Sequential mirror of the exact int64 HITS trajectory."""
    srcs = sorted({s for s, _ in edges})
    dsts = sorted({d for _, d in edges})
    h = {u: scale for u in srcs}
    a: dict = {}
    a_max = scale
    h_max = scale
    for r in range(rounds):
        if r > 0:
            h = {u: 0 for u in srcs}
            for s, d in edges:
                h[s] += a[d] * scale // max(a_max, 1)
        h_max = max(h.values()) if h else 0
        a = {v: 0 for v in dsts}
        for s, d in edges:
            a[d] += h[s] * scale // max(h_max, 1)
        a_max = max(a.values()) if a else 0
    out = {}
    for u in set(srcs) | set(dsts):
        out[u] = (h.get(u, 0) * scale // max(h_max, 1),
                  a.get(u, 0) * scale // max(a_max, 1))
    return out


EDGES = [("u1", "v1"), ("u1", "v2"), ("u1", "v3"),
         ("u2", "v1"), ("u2", "v2"),
         ("u3", "v3"), ("v3", "u1")]


def _edge_ds(edges):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "src": pa.array([s for s, _ in edges], pa.string()),
        "dst": pa.array([d for _, d in edges], pa.string())}))


def test_matches_sequential_reference(ray_session):
    from trustfuse_ray.stages.graph import hits

    out = hits(_edge_ds(EDGES), rounds=2, n_parts=4).to_pandas()
    got = {r["node"]: (r["hub_fx"], r["auth_fx"])
           for _, r in out.iterrows()}
    assert got == _seq_hits(EDGES)


def test_partitioning_invariance(ray_session):
    from trustfuse_ray.stages.graph import hits

    a = hits(_edge_ds(EDGES), rounds=2, n_parts=2).to_pandas()
    b = hits(_edge_ds(EDGES).repartition(5), rounds=2,
             n_parts=16).to_pandas()
    a = a.sort_values("node").reset_index(drop=True)
    b = b.sort_values("node").reset_index(drop=True)
    assert a.equals(b)


def test_bipartite_hub_authority_structure(ray_session):
    from trustfuse_ray.stages.graph import hits

    # star: u_big → v1..v4, u_small → v1; v1 is the strongest authority,
    # u_big the strongest hub
    edges = [("u_big", f"v{i}") for i in range(1, 5)] + [("u_small", "v1")]
    out = hits(_edge_ds(edges), rounds=3, n_parts=4).to_pandas()
    d = {r["node"]: r for _, r in out.iterrows()}
    assert d["u_big"]["hub_fx"] == max(out["hub_fx"])
    assert d["v1"]["auth_fx"] == max(out["auth_fx"])
    # pure sinks have no hub score; pure sources no authority score
    assert d["v2"]["hub_fx"] == 0
    assert d["u_big"]["auth_fx"] == 0
