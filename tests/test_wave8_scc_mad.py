"""Round-5 wave 8: bounded-SCC mutual reachability, robust MAD outlier
profile, per-doc keyword extraction — planted cases."""

import pyarrow as pa


def test_directed_cycle_mutual_pairs():
    """Directed 3-cycle a->b->c->a plus pendant c->d: within k=3 every
    ordered pair of the cycle is reachable, d reaches nothing back."""
    import ray.data as rd

    from trustfuse_ray.stages.graph import reachability

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in edges], pa.string()),
        "dst": pa.array([e[1] for e in edges], pa.string())}))
    cl = {(r["root"], r["node"]): r["hops"]
          for r in reachability(ds, k=3).take_all()}
    mutual = sorted({tuple(sorted((a, b)))
                     for (a, b) in cl if (b, a) in cl})
    assert mutual == [("a", "b"), ("a", "c"), ("b", "c")]
    assert cl[("a", "b")] == 1 and cl[("b", "a")] == 2
    assert ("d", "a") not in cl       # d has no out-edges
    assert cl[("a", "d")] == 3


def test_user_mad_outliers_planted():
    import ray.data as rd

    from trustfuse_ray.stages.windows import user_mad_outliers

    # user 1: cents 100,100,102,104,10000 -> med 102 (lower), devs
    # sorted 0(->|100-102|=2,2,0,2,9898) = [0,2,2,2,9898] -> mad 2,
    # outliers beyond 3*2=6: 100s dev 2 no, 10000 dev 9898 yes -> 1
    vals = [1.00, 1.00, 1.02, 1.04, 100.00]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1] * len(vals), pa.int64()),
        "value": pa.array(vals, pa.float64())}))
    out = user_mad_outliers(ds, k=3).take_all()
    r = out[0]
    assert r["n_events"] == 5
    assert r["med_cents"] == 102
    assert r["mad_cents"] == 2
    assert r["n_outliers"] == 1


def test_user_mad_outliers_constant_stream():
    import ray.data as rd

    from trustfuse_ray.stages.windows import user_mad_outliers

    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "value": pa.array([2.0, 2.0, 2.0], pa.float64())}))
    r = user_mad_outliers(ds).take_all()[0]
    assert r["mad_cents"] == 0 and r["n_outliers"] == 0


def test_doc_keywords_cap_and_idf_zero():
    """A token present in every doc has idf 0 -> score 0; the per-doc
    output is capped at 3 rows."""
    import ray.data as rd

    from trustfuse_ray.stages.profile import tfidf_top_terms

    rows = [("1", "alpha shared shared"), ("2", "beta shared"),
            ("3", "gamma delta epsilon zeta shared")]
    ds = rd.from_arrow(pa.table({
        "doc": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string())}))
    out = tfidf_top_terms(ds, group_col="doc", k=3).take_all()
    per_doc: dict = {}
    for r in out:
        per_doc.setdefault(r["doc"], []).append(r)
    assert all(len(v) <= 3 for v in per_doc.values())
    shared = [r for r in out if r["token"] == "shared"]
    assert all(r["score"] == 0 and r["df"] == 3 for r in shared)
    assert len(per_doc["3"]) == 3     # 5 candidates, capped at 3
