"""Tumbling-window aggregate + as-of join unit tests (hand-computed
expectations on crafted event tables)."""

import pyarrow as pa
import ray.data as rd

US = 1_000_000
HOUR = 3600 * US


def _events(rows):
    return rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()).cast(
            pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    }))


def test_windowed_aggregate_basic():
    from trustfuse_ray.stages.windows import windowed_aggregate

    ev = _events([
        (1, 10 * US, 7, "view", 1.5),
        (2, 20 * US, 7, "view", 2.25),
        (3, HOUR + 5 * US, 7, "view", 4.0),   # next window
        (4, 30 * US, 9, "view", 10.0),        # other key, first window
    ])
    out = {(r["user_id"], r["window_us"]): (r["n_events"], r["sum_value"])
           for r in windowed_aggregate(ev).take_all()}
    assert out == {
        (7, 0): (2, 3.75),
        (7, HOUR): (1, 4.0),
        (9, 0): (1, 10.0),
    }


def test_windowed_aggregate_partials_merge_across_blocks():
    """The same (key, window) split across input blocks must merge to one
    row — exercises the map-side partial + global combine."""
    from trustfuse_ray.stages.windows import windowed_aggregate

    rows = [(i, (i % 5) * US, 1, "view", 1.0) for i in range(100)]
    ev = _events(rows).repartition(8)
    out = windowed_aggregate(ev).take_all()
    assert len(out) == 1
    assert out[0]["n_events"] == 100
    assert out[0]["sum_value"] == 100.0


def test_asof_join_last():
    from trustfuse_ray.stages.joins import asof_join_last

    ev = _events([
        (1, 10 * US, 7, "click", 0.0),
        (2, 20 * US, 7, "purchase", 5.0),   # -> click at 10
        (3, 30 * US, 7, "click", 0.0),
        (4, 30 * US, 7, "purchase", 5.0),   # tie: click at SAME ts counts
        (5, 40 * US, 9, "purchase", 5.0),   # no click for user 9 -> NULL
        (6, 50 * US, 8, "click", 0.0),      # user with clicks only: no row
    ])
    out = {r["event_id"]: r["asof_ts"]
           for r in asof_join_last(ev).take_all()}
    as_us = {k: (None if v is None else
                 int(v.timestamp() * US) if hasattr(v, "timestamp") else v)
             for k, v in out.items()}
    assert set(out) == {2, 4, 5}
    assert as_us[2] == 10 * US
    assert as_us[4] == 30 * US
    assert as_us[5] is None


def test_connected_components_chain_and_clique():
    import pyarrow as pa
    from trustfuse_ray.stages.graph import connected_components

    # chain 1-2-3-4 (needs >1 propagation round) + clique {10,11,12} + edge
    # 20-21; component label must be the min node id of the component
    edges = rd.from_arrow(pa.table({
        "src": pa.array([2, 3, 4, 10, 10, 11, 21], pa.int64()),
        "dst": pa.array([1, 2, 3, 11, 12, 12, 20], pa.int64()),
    }))
    labels = {r["node"]: r["label"]
              for r in connected_components(edges).take_all()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1,
                      10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_property_graph_edges_and_networkx():
    import pyarrow as pa
    from trustfuse_ray.stages.graph import property_graph_edges, to_networkx

    triples = rd.from_arrow(pa.table({
        "entity": ["Paris", "Paris", "Lyon"],
        "attr": ["country", "population", "country"],
        "value_str": ["France", None, "France"],
        "value_num": [None, 2.1e6, None],
    }))
    edges = property_graph_edges(triples).to_pandas()
    assert len(edges) == 6  # 2 layers x 3 triples
    l1 = edges[edges.layer == 1]
    assert set(l1.src) == {"Paris", "Lyon"}
    assert "Paris#country" in set(l1.dst_str)
    l2 = edges[edges.layer == 2]
    pop = l2[l2.src == "Paris#population"].iloc[0]
    assert pop.dst_num == 2.1e6 and pop.dst_str is None
    g = to_networkx(pa.Table.from_pandas(edges))
    # entity -> attr-node -> value chain exists
    assert g.has_edge("Paris", "Paris#country")
    assert g.has_edge("Paris#country", "France")


def test_bloom_filter_membership():
    """No false negatives ever; false positives below 10x the analytic
    bound on a disjoint probe set."""
    import numpy as np
    import pyarrow as pa

    from trustfuse_ray.stages.bloom import BloomFilter

    members = pa.array([f"ent_{i}" for i in range(5000)])
    probes = pa.array([f"other_{i}" for i in range(20000)])
    f = BloomFilter(n_bits=1 << 18, k=4)
    f.add(members)
    assert f.contains(members).all()          # zero false negatives
    fp = f.contains(probes).mean()
    bound = (4 * 5000 / (1 << 18)) ** 4       # (kn/m)^k ~ 3.4e-5
    assert fp <= 10 * bound + 1e-9
    # fixed-size serialization round-trip + OR-merge
    g = BloomFilter.from_bytes(f.to_bytes(), k=4)
    h = BloomFilter(n_bits=1 << 18, k=4)
    h.add(pa.array(["zzz"]))
    g.union_(h)
    assert g.contains(pa.array(["zzz", "ent_1"])).all()


def test_known_entity_flags_bloom_matches_exact():
    """The fixed-size Bloom path must agree with the exact predicate form
    on every frontier bucket (filter sized so FPs are ~impossible at this
    scale)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from trustfuse_ray.stages.windows import (known_entity_flags,
                                              known_entity_flags_bloom)

    rng = np.random.default_rng(2)
    rows = []
    for b in range(4):
        for _ in range(300):
            rows.append({"entity": f"e{int(rng.integers(0, 120))}",
                         "bucket_id": b})
    ds = rd.from_items(rows)
    exact = {(r["entity"], r["bucket_id"]): r["is_known"]
             for r in known_entity_flags(ds, n_parts=8).take_all()}
    for b in range(1, 4):
        flagged = known_entity_flags_bloom(ds, b, n_bits=1 << 16).take_all()
        assert flagged, f"bucket {b} empty"
        for r in flagged:
            assert r["is_known"] == exact[(r["entity"], b)], (r, b)


def test_range_join_count_exact():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from trustfuse_ray.stages.joins import range_join_count

    # user 1: purchase at t=100; clicks at 40..99 (in window of 60) and
    # at 100 (excluded: half-open) and 39 (excluded)
    us = 1
    rows = [("purchase", 1, 100), ("click", 1, 39), ("click", 1, 40),
            ("click", 1, 99), ("click", 1, 100),
            ("purchase", 2, 50), ("click", 3, 49)]  # no same-user clicks
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "event_type": pa.array([r[0] for r in rows]),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[2] for r in rows], np.int64),
                       pa.timestamp("us")),
    })
    out = {r["event_id"]: r["n_right"]
           for r in range_join_count(rd.from_arrow(tbl),
                                     window_us=60).take_all()}
    assert out == {0: 2, 5: 0}


def test_semi_and_anti_join():
    from trustfuse_ray.stages.joins import semi_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "tag": pa.array(list("abcde")),
    })).repartition(3)
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 2, 4, 9], pa.int64()),
    })).repartition(2)
    semi = semi_join(left, right, "k", "rk").to_pandas()
    assert sorted(semi["k"]) == [2, 4]
    assert set(semi.columns) == {"k", "tag"}
    anti = semi_join(left, right, "k", "rk", anti=True).to_pandas()
    assert sorted(anti["k"]) == [1, 3, 5]


def test_semi_join_empty_sides():
    from trustfuse_ray.stages.joins import semi_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "tag": pa.array(["a", "b"]),
    }))
    empty = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    assert len(semi_join(left, empty, "k", "rk").to_pandas()) == 0
    anti = semi_join(left, empty, "k", "rk", anti=True).to_pandas()
    assert sorted(anti["k"]) == [1, 2]


def test_fuzzy_self_join_blocked():
    from trustfuse_ray.functions.similarity import jaro_similarity
    from trustfuse_ray.stages.joins import fuzzy_self_join

    vals = ["martha", "marhta", "martin", "zed", "zeb", "qq",
            "martha", "dwayne", "duane"]  # duplicate collapses
    ds = rd.from_arrow(pa.table({"name": pa.array(vals)})).repartition(3)
    got = fuzzy_self_join(ds, "name", threshold=0.8,
                          block_len=2).to_pandas()
    uniq = sorted(set(vals))
    want = []
    for i in range(len(uniq)):
        for j in range(i + 1, len(uniq)):
            a, b = uniq[i], uniq[j]
            if a[:2] != b[:2]:
                continue
            s = jaro_similarity(a, b)
            if s >= 0.8:
                want.append((a, b, int(round(s * 1e9))))
    got_set = {(r.a, r.b, r.sim_fx) for r in got.itertuples(index=False)}
    assert got_set == set(want)
    assert ("marhta", "martha", 944444444) in got_set
    # 'dwayne'/'duane' similar but blocked apart (dw vs du) — excluded
    assert not any(a == "duane" or b == "duane" for a, b, _ in got_set)


def test_fuzzy_self_join_stop_block_cap():
    from trustfuse_ray.stages.joins import fuzzy_self_join

    vals = [f"aa{i:03d}" for i in range(30)]
    ds = rd.from_arrow(pa.table({"name": pa.array(vals)}))
    got = fuzzy_self_join(ds, "name", threshold=0.0, cap=10).to_pandas()
    assert len(got) == 0  # block of 30 > cap → skipped entirely


def test_semi_join_null_keys_never_match():
    """Regression: SQL EXISTS never matches NULL = NULL."""
    from trustfuse_ray.stages.joins import semi_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, None, 3], pa.int64()),
        "tag": pa.array(["a", "b", "c"]),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([None, 3], pa.int64()),
    }))
    semi = semi_join(left, right, "k", "rk").to_pandas()
    assert sorted(semi["k"].dropna()) == [3] and len(semi) == 1
    anti = semi_join(left, right, "k", "rk", anti=True).to_pandas()
    # NOT EXISTS keeps the NULL-key row and k=1
    assert len(anti) == 2
    assert sorted(anti["k"].dropna()) == [1]


def test_skew_join_plan_equivalence():
    """The hot-key threshold changes the plan (broadcast vs co-partition),
    never the result: planted skew (one key with 200 left rows) must give
    identical output at every threshold, including 'everything cold'."""
    from trustfuse_ray.stages.joins import skew_join

    import numpy as np
    rng = np.random.default_rng(7)
    keys = np.concatenate([np.full(200, 5, np.int64),     # hot key
                           rng.integers(0, 40, size=300)])
    left = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "lv": pa.array(np.arange(len(keys), dtype=np.int64)),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array(np.arange(40, dtype=np.int64)),
        "rv": pa.array([f"v{i}" for i in range(40)]),
    }))

    def run(threshold):
        out = skew_join(left, right, "k", "rk", ["lv"], ["rv"],
                        hot_threshold=threshold, n_parts=8).take_all()
        return sorted((r["k"], r["lv"], r["rv"]) for r in out)

    cold_only = run(10**9)          # no hot keys
    assert run(50) == cold_only     # key 5 broadcast
    assert run(2) == cold_only      # many keys broadcast
    # sequential oracle
    rmap = {i: f"v{i}" for i in range(40)}
    want = sorted((int(k), i, rmap[int(k)])
                  for i, k in enumerate(keys) if int(k) in rmap)
    assert cold_only == want


def test_skew_join_null_keys_and_no_match():
    from trustfuse_ray.stages.joins import skew_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, None, 99], pa.int64()),
        "lv": pa.array([10, 20, 30], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([1, 2, None], pa.int64()),
        "rv": pa.array(["a", "b", "c"]),
    }))
    out = skew_join(left, right, "k", "rk", ["lv"], ["rv"],
                    n_parts=4).take_all()
    assert sorted((r["k"], r["lv"], r["rv"]) for r in out) == [(1, 10, "a")]


def test_resolve_entities_clusters_and_canon():
    from trustfuse_ray.stages.link import resolve_entities

    # two fuzzy clusters sharing a prefix block, one chained (a-b, b-c
    # connect; a-c alone may not) plus unrelated singletons
    ents = ["paris", "pariss", "parisss",       # chained cluster
            "london", "londonn",                # pair cluster
            "tokyo", "berlin"]                  # singletons -> absent
    claims = rd.from_arrow(pa.table({
        "entity": pa.array(ents * 3, pa.string()),   # duplicates collapse
    }))
    out = sorted((r["entity"], r["canon"])
                 for r in resolve_entities(claims, threshold=0.9,
                                           n_parts=4).take_all())
    assert out == [("london", "london"), ("londonn", "london"),
                   ("paris", "paris"), ("pariss", "paris"),
                   ("parisss", "paris")]

    # determinism across partitionings
    again = sorted((r["entity"], r["canon"])
                   for r in resolve_entities(
                       rd.from_arrow(pa.table({
                           "entity": pa.array(ents * 3, pa.string())}))
                       .repartition(5), threshold=0.9,
                       n_parts=2).take_all())
    assert again == out


def test_resolve_entities_empty_and_no_pairs():
    from trustfuse_ray.stages.link import resolve_entities

    nopairs = rd.from_arrow(pa.table({
        "entity": pa.array(["alpha", "zebra"], pa.string())}))
    assert resolve_entities(nopairs, n_parts=2).count() == 0


def test_global_row_number_total_order():
    from trustfuse_ray.stages.windows import global_row_number

    t = pa.table({
        "k": pa.array([5, 3, 9, 1, 7, 0, 2], pa.int64()),
        "v": pa.array(list("abcdefg"), pa.string()),
    })
    out = sorted((r["k"], r["pos"]) for r in global_row_number(
        rd.from_arrow(t).repartition(3), ["k"]).take_all())
    ks = sorted([5, 3, 9, 1, 7, 0, 2])
    assert out == [(k, i) for i, k in enumerate(ks)]
    # empty input flows through
    assert global_row_number(
        rd.from_arrow(t.slice(0, 0)), ["k"]).count() == 0


def test_mixture_order_prefix_proportions():
    from trustfuse_ray.stages.curation import mixture_order

    # 30 docs of source A (weight 3) and 10 of B (weight 1): any prefix
    # holds ~3:1 A:B, and positions are a dense permutation
    rows = [(i, "A") for i in range(30)] + [(100 + i, "B")
                                            for i in range(10)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(4)
    out = sorted((r["pos"], r["source"], r["doc_id"])
                 for r in mixture_order(docs, {"A": 3, "B": 1},
                                        n_parts=4).take_all())
    assert [p for p, _, _ in out] == list(range(40))
    # prefix of 12 → 9 A + 3 B (exact for the (r+1)/w rule)
    first12 = [s for _, s, _ in out[:12]]
    assert first12.count("A") == 9 and first12.count("B") == 3
    # determinism across partitionings
    again = sorted((r["pos"], r["source"], r["doc_id"])
                   for r in mixture_order(docs.repartition(1),
                                          {"A": 3, "B": 1},
                                          n_parts=2).take_all())
    assert again == out


def test_anomaly_windows_exact_z2():
    from trustfuse_ray.stages.windows import anomaly_windows

    DAY = 86_400_000_000
    # type t: 10 windows of count 5 plus one spike of 50
    rows = []
    for w in range(10):
        rows += [("t", w * DAY + i) for i in range(5)]
    rows += [("t", 10 * DAY + i) for i in range(50)]
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })).repartition(4)
    out = {r["window"]: (r["cnt"], r["is_anomaly"])
           for r in anomaly_windows(ds, n_parts=2).take_all()}
    assert out[10] == (50, 1)
    assert all(v == (5, 0) for w, v in out.items() if w < 10)


def test_active_users_dau_wau():
    from trustfuse_ray.stages.windows import active_users

    DAY = 86_400_000_000
    rows = [(1, 0), (2, 0), (1, 0), (1, DAY), (3, 8 * DAY)]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })).repartition(3)
    got = sorted((r["period_kind"], r["period"], r["n_active"])
                 for r in active_users(ds).take_all())
    assert got == [("day", 0, 2), ("day", 1, 1), ("day", 8, 1),
                   ("week", 0, 2), ("week", 1, 1)]


def test_kcore_peels_pendants():
    from trustfuse_ray.stages.graph import kcore

    # triangle a-b-c, pendant d-a, and a 2-chain d-e hanging off it
    und = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("d", "e")]
    rows = und + [(y, x) for x, y in und]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([r[0] for r in rows], pa.string()),
        "dst": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(3)
    out = {r["node"]: r["degree"]
           for r in kcore(edges, k=2, rounds=8, n_parts=4).take_all()}
    # e peels first (deg 1), then d (deg 1 after e left) -> triangle only
    assert out == {"a": 2, "b": 2, "c": 2}


def test_rolling_active_users_window():
    import numpy as np

    from trustfuse_ray.stages.windows import rolling_active_users

    day = 86_400_000_000
    rows = [  # (day, user): u1 active d0; u2 active d0,d8; u3 active d2
        (0, 1), (0, 2), (2, 3), (8, 2), (0, 1),  # dup event same day
    ]
    events = rd.from_arrow(pa.table({
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[0] * day for r in rows],
                                dtype="datetime64[us]")),
    })).repartition(2)
    out = {r["day"]: r["n_active"]
           for r in rolling_active_users(events, window_days=7).take_all()}
    assert out[0] == 2          # u1, u2
    assert out[2] == 3          # u1, u2 (d0 in window), u3
    assert out[6] == 3          # d0..d6 all in window
    assert out[7] == 1          # only u3 (d2); d0 aged out
    assert out[8] == 2          # u3 (d2) + u2 (d8)
    assert out[14] == 1 and 15 not in out  # d8+6 last day u2 counts


def test_event_dedup_window_keeps_min_id():
    import numpy as np

    from trustfuse_ray.stages.windows import event_dedup_window

    m = 1_000_000
    rows = [  # u1/click: two in window 0, one in window 1; u2 separate
        (5, 1, "click", 30 * m), (3, 1, "click", 500 * m),
        (9, 1, "click", 700 * m), (7, 2, "click", 30 * m),
        (8, 1, "view", 30 * m),
    ]
    events = rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array(np.array([r[3] for r in rows],
                                dtype="datetime64[us]")),
    })).repartition(2)
    out = {(r["user_id"], r["event_type"], r["w"]): r["event_id"]
           for r in event_dedup_window(events, window_s=600).take_all()}
    assert out == {(1, "click", 0): 3, (1, "click", 1): 9,
                   (2, "click", 0): 7, (1, "view", 0): 8}


def test_link_candidates_common_neighbors():
    from trustfuse_ray.stages.graph import link_candidates

    # a-n1-b and a-n2-b paths: (a,b) share {n1,n2}; (n1,n2) share {a,b};
    # the direct a-c edge keeps (a,c) out of the candidate list
    und = [("a", "n1"), ("n1", "b"), ("a", "n2"), ("n2", "b"), ("a", "c"),
           ("c", "n1")]
    rows = und + [(y, x) for x, y in und]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([r[0] for r in rows], pa.string()),
        "dst": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(3)
    out = {(r["a"], r["b"]): r["n_common"]
           for r in link_candidates(edges, min_common=2, hub_cap=64,
                                    n_parts=4).take_all()}
    # (a,b): {n1,n2}; (n1,n2): {a,b}; (b,c): {a? no - a-b not edge;
    # n1 yes, a no} -> {n1} only 1 -> excluded; (a,c) adjacent -> excluded
    assert out == {("a", "b"): 2, ("n1", "n2"): 2}


def test_session_type_pairs_cooccurrence():
    import numpy as np

    from trustfuse_ray.stages.windows import session_type_pairs

    m = 60_000_000
    rows = [  # u1 session1: A,B ; u1 session2 (2h later): B,C ; u2: A,B
        (1, 1, "A", 0), (2, 1, "B", 5 * m),
        (3, 1, "B", 200 * m), (4, 1, "C", 205 * m),
        (5, 2, "A", 0), (6, 2, "B", 10 * m), (7, 2, "A", 12 * m),
    ]
    events = rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array(np.array([r[3] for r in rows],
                                dtype="datetime64[us]")),
    })).repartition(2)
    out = {(r["type_a"], r["type_b"]): r["n_sessions"]
           for r in session_type_pairs(events, n_parts=4).take_all()}
    assert out == {("A", "B"): 2, ("B", "C"): 1}


def test_rule_inference_2hop_witnesses():
    from trustfuse_ray.stages.graph import rule_inference_2hop

    rows = [  # a->b->c (witness b), a->d->c (witness d), a->b only path
        ("a", "neighbor", "b"), ("b", "neighbor", "c"),
        ("a", "neighbor", "d"), ("d", "neighbor", "c"),
        ("x", "color", "red"),  # other attr ignored
        ("c", "neighbor", "a"),  # c->a: composes c->a->{b,d}
    ]
    triples = rd.from_arrow(pa.table({
        "entity": pa.array([r[0] for r in rows], pa.string()),
        "attr": pa.array([r[1] for r in rows], pa.string()),
        "value_str": pa.array([r[2] for r in rows], pa.string()),
    })).repartition(2)
    out = {(r["x"], r["z"]): r["n_witnesses"]
           for r in rule_inference_2hop(triples, n_parts=4).take_all()}
    # a->c via b AND d; b->a via c; d->a via c; c->b, c->d via a
    assert out == {("a", "c"): 2, ("b", "a"): 1, ("d", "a"): 1,
                   ("c", "b"): 1, ("c", "d"): 1}


def test_kcore_property_vs_brute_peel():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from trustfuse_ray.stages.graph import kcore

    @settings(max_examples=10, deadline=None)
    @given(st.lists(st.tuples(st.integers(0, 7), st.integers(0, 7)),
                    min_size=1, max_size=16), st.integers(1, 3))
    def _check(raw, k):
        und = {(f"n{a}", f"n{b}") for a, b in raw if a != b}
        if not und:
            return
        rows = sorted(und | {(y, x) for x, y in und})
        edges = rd.from_arrow(pa.table({
            "src": pa.array([r[0] for r in rows], pa.string()),
            "dst": pa.array([r[1] for r in rows], pa.string()),
        })).repartition(2)
        got = {r["node"]: r["degree"]
               for r in kcore(edges, k=k, rounds=16, n_parts=4).take_all()}

        # brute peel
        adj = {}
        for a, b in rows:
            adj.setdefault(a, set()).add(b)
        alive = set(adj)
        while True:
            drop = {n for n in alive
                    if len(adj[n] & alive) < k}
            if not drop:
                break
            alive -= drop
        want = {n: len(adj[n] & alive) for n in alive
                if len(adj[n] & alive) > 0}
        assert got == want

    _check()


def test_gap_histogram_buckets():
    import numpy as np

    from trustfuse_ray.stages.windows import gap_histogram

    s = 1_000_000
    rows = [  # u1 A at 0s, 1s, 9s -> gaps 1s (bucket 1), 8s (bucket 4?)
        (1, 1, "A", 0), (2, 1, "A", 1 * s), (3, 1, "A", 9 * s),
        (4, 1, "B", 0),  # single B: no gap
        (5, 2, "A", 100 * s),  # different user: no cross-user gap
    ]
    events = rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array(np.array([r[3] for r in rows],
                                dtype="datetime64[us]")),
    })).repartition(2)
    out = {(r["event_type"], r["bucket"]): r["n"]
           for r in gap_histogram(events, n_parts=4).take_all()}
    # gap 1s -> bitlen(2)=2; gap 8s -> bitlen(9)=4
    assert out == {("A", 2): 1, ("A", 4): 1}
