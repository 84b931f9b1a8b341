"""Round-5 wave 6: inequality / fraud / privacy audits and weighted link
prediction — planted-case checks against hand-computed expectations plus
partitioning invariance for the pair miner."""

import numpy as np
import pyarrow as pa


def _docs_ds(rows, parts=None):
    import ray.data as rd
    ds = rd.from_arrow(pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([r[2] for r in rows], pa.int64())}))
    return ds.repartition(parts) if parts else ds


def test_l_diversity_planted():
    from trustfuse_ray.stages.profile import l_diversity_audit

    # group (s1, bucket 0): 3 docs, 1 lang  -> at risk (l=2)
    # group (s2, bucket 1): 2 docs, 2 langs -> safe
    rows = [("s1", "en", 10), ("s1", "en", 20), ("s1", "en", 30),
            ("s2", "en", 150), ("s2", "fr", 180)]
    out = {(r["source"], r["len_bucket"]): r
           for r in l_diversity_audit(_docs_ds(rows), l=2).take_all()}
    g1 = out[("s1", 0)]
    assert (g1["group_n"], g1["l_distinct"], g1["at_risk"]) == (3, 1, True)
    g2 = out[("s2", 1)]
    assert (g2["group_n"], g2["l_distinct"], g2["at_risk"]) == (2, 2, False)


def test_benford_planted():
    import ray.data as rd

    from trustfuse_ray.stages.profile import BENFORD_PERMILLE, benford_audit

    # amounts 1.00, 1.50, 2.00, 9.99 in one group: digit 1 ×2, 2 ×1, 9 ×1
    ds = rd.from_arrow(pa.table({
        "o_orderpriority": pa.array(["P"] * 4, pa.string()),
        "o_totalprice": pa.array([1.00, 1.50, 2.00, 9.99], pa.float64())}))
    out = {r["digit"]: r for r in benford_audit(ds).take_all()}
    assert out[1]["n"] == 2 and out[1]["obs_permille"] == 500
    assert out[2]["n"] == 1 and out[2]["obs_permille"] == 250
    assert out[9]["n"] == 1
    assert out[1]["benford_permille"] == BENFORD_PERMILLE[0] == 301
    assert out[1]["dev_permille"] == abs(500 - 301)


def test_gini_planted_and_uniform():
    import ray.data as rd

    from trustfuse_ray.stages.profile import gini_by_group

    # uniform group -> gini 0; concentrated group -> (n-1)/n ceiling-ish
    rows = [("u", i, 100) for i in range(4)] + \
           [("c", 10, 0), ("c", 11, 0), ("c", 12, 0), ("c", 13, 1000)]
    ds = rd.from_arrow(pa.table({
        "grp": pa.array([r[0] for r in rows], pa.string()),
        "member": pa.array([r[1] for r in rows], pa.int64()),
        "amount": pa.array([r[2] for r in rows], pa.int64())}))
    out = {r["grp"]: r for r in
           gini_by_group(ds, "grp", "member", "amount").take_all()}
    assert out["u"]["gini_permille"] == 0
    assert out["u"]["n_members"] == 4 and out["u"]["total"] == 400
    # one holder of everything among 4: G = (2*4*1000 - 5*1000)/(4*1000)
    assert out["c"]["gini_permille"] == 750


def test_gini_tie_order_free():
    import ray.data as rd

    from trustfuse_ray.stages.profile import gini_by_group

    # equal amounts with different member ids: rank assignment within the
    # tie block must not change the statistic
    for perm in ([1, 2, 3], [3, 1, 2]):
        ds = rd.from_arrow(pa.table({
            "grp": pa.array(["g"] * 3, pa.string()),
            "member": pa.array(perm, pa.int64()),
            "amount": pa.array([5, 5, 20], pa.int64())}))
        out = gini_by_group(ds, "grp", "member", "amount").take_all()
        assert out[0]["gini_permille"] == 333


def _bip_edges(pairs, parts=None):
    import ray.data as rd
    sym = pairs + [(b, a) for a, b in pairs]
    ds = rd.from_arrow(pa.table({
        "src": pa.array([s for s, _ in sym], pa.string()),
        "dst": pa.array([d for _, d in sym], pa.string())}))
    return ds.repartition(parts) if parts else ds


def test_resource_allocation_planted():
    from trustfuse_ray.stages.graph import resource_allocation

    # bipartite: e1,e2 share v1 (deg 2) and v2 (deg 3); e3 only v2
    pairs = [("e1", "v1"), ("e2", "v1"),
             ("e1", "v2"), ("e2", "v2"), ("e3", "v2")]
    out = {(r["a"], r["b"]): r for r in resource_allocation(
        _bip_edges(pairs), min_common=1, hub_cap=20).take_all()
        if r["a"].startswith("e")}
    r12 = out[("e1", "e2")]
    assert r12["n_common"] == 2
    assert r12["ra_score"] == 1_000_000 // 2 + 1_000_000 // 3
    assert out[("e1", "e3")]["ra_score"] == 1_000_000 // 3
    assert out[("e2", "e3")]["ra_score"] == 1_000_000 // 3


def test_resource_allocation_skips_connected_and_hubs():
    from trustfuse_ray.stages.graph import resource_allocation

    # triangle a-b-c: every wedge pair is already an edge -> no output;
    # star center with deg > hub_cap contributes nothing
    tri = [("a", "b"), ("b", "c"), ("a", "c")]
    out = resource_allocation(_bip_edges(tri), min_common=1,
                              hub_cap=20).take_all()
    assert out == []
    star = [("hub", f"n{i:02d}") for i in range(6)]
    out2 = resource_allocation(_bip_edges(star), min_common=1,
                               hub_cap=5).take_all()
    assert out2 == []


def test_resource_allocation_partition_invariance():
    from trustfuse_ray.stages.graph import resource_allocation

    rng = np.random.default_rng(7)
    pairs = sorted({(f"e{int(a)}", f"v{int(b)}")
                    for a, b in zip(rng.integers(0, 12, 60),
                                    rng.integers(0, 8, 60))})
    want = None
    for parts in (1, 7):
        got = sorted(
            (r["a"], r["b"], r["n_common"], r["ra_score"])
            for r in resource_allocation(_bip_edges(pairs, parts),
                                         min_common=1,
                                         hub_cap=20).take_all())
        if want is None:
            want = got
            assert len(want) > 0
        else:
            assert got == want
