"""Round-5 wave 13: leave-one-out source influence — planted cases."""

import pyarrow as pa


def _claims(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "entity": pa.array([r[1] for r in rows], pa.string()),
        "attr": pa.array([r[2] for r in rows], pa.string()),
        "value_str": pa.array([r[3] for r in rows], pa.string()),
        "value_type": pa.array(["string"] * len(rows), pa.string())}))


def test_source_influence_decisive_vote():
    from trustfuse_ray.reverse import source_influence

    # fact (e, a): s1,s2 -> "x"; s3 -> "y".  Winner "x" (2-1).
    # remove s1: 1-1 tie -> "x" still wins (value asc) -> no flip.
    # remove s3: winner stays "x" -> no flip.
    rows = [("s1", "e", "a", "x"), ("s2", "e", "a", "x"),
            ("s3", "e", "a", "y")]
    out = {r["source"]: r
           for r in source_influence(_claims(rows)).take_all()}
    assert out["s1"]["n_flips"] == 0
    assert out["s3"]["n_flips"] == 0
    assert all(r["n_facts"] == 1 for r in out.values())


def test_source_influence_flip():
    from trustfuse_ray.reverse import source_influence

    # fact: s1,s2 -> "z"; s3 -> "a".  Winner "z" (2-1).
    # remove s2: 1-1 tie -> "a" wins (value asc) -> s2 flips.
    rows = [("s1", "e", "a", "z"), ("s2", "e", "a", "z"),
            ("s3", "e", "a", "a")]
    out = {r["source"]: r
           for r in source_influence(_claims(rows)).take_all()}
    assert out["s2"]["n_flips"] == 1
    assert out["s2"]["influence_permille"] == 1000
    assert out["s3"]["n_flips"] == 0


def test_source_influence_sole_source():
    from trustfuse_ray.reverse import source_influence

    # single source: removal drops its value's count to 0 but the rule
    # still picks over the fact's value set -> same winner, no flip
    rows = [("s1", "e", "a", "only")]
    out = source_influence(_claims(rows)).take_all()
    assert out[0]["n_flips"] == 0 and out[0]["n_facts"] == 1
