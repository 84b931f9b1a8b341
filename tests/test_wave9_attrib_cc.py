"""Round-5 wave 9: first/last-touch attribution and per-node clustering
coefficient — planted cases."""

import datetime

import pyarrow as pa


def _events(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array([datetime.datetime(2024, 1, r[3], r[4])
                        for r in rows], pa.timestamp("us"))}))


def test_attribution_planted():
    from trustfuse_ray.stages.windows import purchase_attribution

    rows = [
        (1, 9, "click", 1, 8),      # inside window
        (2, 9, "click", 1, 10),     # inside window, later
        (3, 9, "purchase", 1, 12),
        (4, 9, "click", 1, 14),     # after the purchase -> ignored
        (5, 9, "purchase", 1, 15),  # credits clicks 1, 2, 4
        (6, 8, "purchase", 2, 1),   # user with no clicks at all
    ]
    out = {r["purchase_id"]: r
           for r in purchase_attribution(_events(rows)).take_all()}
    p3 = out[3]
    assert (p3["first_touch_id"], p3["last_touch_id"],
            p3["n_touches"]) == (1, 2, 2)
    p5 = out[5]
    assert (p5["first_touch_id"], p5["last_touch_id"],
            p5["n_touches"]) == (1, 4, 3)
    p6 = out[6]
    assert (p6["first_touch_id"], p6["last_touch_id"],
            p6["n_touches"]) == (-1, -1, 0)


def test_attribution_window_cutoff():
    from trustfuse_ray.stages.windows import purchase_attribution

    # click 9 days before the purchase falls outside the 7-day lookback
    rows = [(1, 5, "click", 1, 0), (2, 5, "purchase", 10, 0)]
    out = purchase_attribution(_events(rows)).take_all()
    assert out[0]["n_touches"] == 0
    assert out[0]["first_touch_id"] == -1


def _sym_edges(pairs):
    import ray.data as rd
    sym = pairs + [(b, a) for a, b in pairs]
    return rd.from_arrow(pa.table({
        "src": pa.array([s for s, _ in sym], pa.string()),
        "dst": pa.array([d for _, d in sym], pa.string())}))


def test_clustering_coeff_planted():
    from trustfuse_ray.stages.graph import clustering_coefficient

    # triangle a-b-c plus pendant chain c-d: a, b are pure-clique
    # members (coeff 1000); c bridges (1 closed of 3 wedges -> 333);
    # d has deg 1 -> excluded
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    out = {r["node"]: r for r in clustering_coefficient(
        _sym_edges(pairs), hub_cap=64).take_all()}
    assert out["a"]["coeff_permille"] == 1000
    assert out["b"]["coeff_permille"] == 1000
    c = out["c"]
    assert (c["deg"], c["closed_wedges"], c["coeff_permille"]) == (3, 1,
                                                                   333)
    assert "d" not in out


def test_clustering_coeff_no_triangles():
    from trustfuse_ray.stages.graph import clustering_coefficient

    # path graph: every interior node has coeff 0
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    out = {r["node"]: r for r in clustering_coefficient(
        _sym_edges(pairs)).take_all()}
    assert out["b"]["coeff_permille"] == 0
    assert out["c"]["closed_wedges"] == 0
