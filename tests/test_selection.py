"""Round-3 wave-3 operators: hopping-window aggregate, DSIR importance
weights, stratified train/val/test split."""

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data as rd

from trustfuse_ray.stages.curation import stratified_split
from trustfuse_ray.stages.selection import dsir_importance
from trustfuse_ray.stages.windows import hopping_window_aggregate


def _md5_64(s: str) -> int:
    return struct.unpack("<Q", hashlib.md5(s.encode()).digest()[8:16])[0]


# ---------------------------------------------------------------------------
# hopping_window_aggregate
# ---------------------------------------------------------------------------

def _events(rows):
    return rd.from_arrow(pa.table({
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    }))


def test_hopping_window_matches_bruteforce():
    rng = np.random.default_rng(7)
    rows = [(f"t{int(rng.integers(3))}", int(rng.integers(0, 10 ** 10)),
             float(rng.uniform(0, 100))) for _ in range(400)]
    window_us, hop_us = 3600 * 10 ** 6, 900 * 10 ** 6
    want: dict[tuple, list] = {}
    for k, ts, v in rows:
        base = ts // hop_us
        for i in range(window_us // hop_us):
            start = (base - i) * hop_us
            agg = want.setdefault((k, start), [0, 0])
            agg[0] += 1
            agg[1] += int(round(v * 10_000))
    got = hopping_window_aggregate(
        _events(rows).repartition(7), window_s=3600, hop_s=900).to_pandas()
    assert len(got) == len(want)
    for _, r in got.iterrows():
        n, fx = want[(r["event_type"], int(r["window_us"]))]
        assert r["n_events"] == n
        assert abs(r["sum_value"] - fx / 10_000.0) < 1e-9


def test_hopping_window_rejects_nonmultiple():
    import pytest

    with pytest.raises(ValueError):
        hopping_window_aggregate(_events([("a", 0, 1.0)]),
                                 window_s=3600, hop_s=700)


def test_hopping_window_empty():
    got = hopping_window_aggregate(_events([])).to_pandas()
    assert len(got) == 0


# ---------------------------------------------------------------------------
# dsir_importance
# ---------------------------------------------------------------------------

def _docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
    }))


def _dsir_oracle(rows, n_buckets=1024, target="en"):
    raw = np.zeros(n_buckets, np.int64)
    tgt = np.zeros(n_buckets, np.int64)
    toks = {}
    for doc_id, text, lang in rows:
        import re
        # match the engine's \s+ split over the trimmed string
        tl = re.split(r"\s+", text.strip())
        toks[doc_id] = tl
        for t in tl:
            b = _md5_64(t) & (n_buckets - 1)
            raw[b] += 1
            if lang == target:
                tgt[b] += 1
    out = {}
    for doc_id, _, _ in rows:
        s = 0
        for t in toks[doc_id]:
            b = _md5_64(t) & (n_buckets - 1)
            s += (int(tgt[b]) + 1).bit_length() - (int(raw[b]) + 1).bit_length()
        out[doc_id] = s
    return out


def test_dsir_matches_sequential_oracle():
    rng = np.random.default_rng(11)
    vocab_en = ["the", "quick", "fox", "jumps", "data", "model"]
    vocab_fr = ["le", "renard", "rapide", "saute", "donnée"]
    rows = []
    for i in range(120):
        en = bool(rng.integers(2))
        v = vocab_en if en else vocab_fr
        words = [v[int(j)] for j in rng.integers(0, len(v), size=12)]
        rows.append((i, " ".join(words), "en" if en else "fr"))
    want = _dsir_oracle(rows)
    got = dsir_importance(_docs(rows).repartition(5)).to_pandas()
    assert len(got) == len(rows)
    for _, r in got.iterrows():
        assert int(r["dsir_score"]) == want[int(r["doc_id"])]
    # target-language docs should score higher on average
    gm = got.set_index("doc_id")["dsir_score"]
    en_ids = [i for i, _, l in rows if l == "en"]
    fr_ids = [i for i, _, l in rows if l == "fr"]
    assert gm.loc[en_ids].mean() > gm.loc[fr_ids].mean()


def test_dsir_partition_invariant():
    rows = [(i, f"tok{i % 7} tok{i % 3} shared", "en" if i % 2 else "fr")
            for i in range(40)]
    a = dsir_importance(_docs(rows).repartition(1)).to_pandas()
    b = dsir_importance(_docs(rows).repartition(9)).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["dsir_score"] == b["dsir_score"]).all()


def test_dsir_empty():
    got = dsir_importance(_docs([])).to_pandas()
    assert len(got) == 0


# ---------------------------------------------------------------------------
# stratified_split
# ---------------------------------------------------------------------------

def _split_docs(n_per_group, groups=("a", "b", "c")):
    rows = []
    i = 0
    for g in groups:
        for _ in range(n_per_group):
            rows.append((i, g))
            i += 1
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows], pa.string()),
    }))


def test_stratified_split_fractions_and_determinism():
    ds = _split_docs(50)
    got = stratified_split(ds).to_pandas()
    assert len(got) == 150
    for g, grp in got.groupby("source"):
        c = grp["split"].value_counts()
        assert c.get("train", 0) == 40  # floor(0.8*50)
        assert c.get("val", 0) == 5
        assert c.get("test", 0) == 5
    # per-group cut replays the md5 rank rule exactly
    for g, grp in got.groupby("source"):
        order = sorted(grp["doc_id"],
                       key=lambda d: (hashlib.md5(str(d).encode())
                                      .hexdigest(), d))
        lab = {d: ("train" if i < 40 else "val" if i < 45 else "test")
               for i, d in enumerate(order)}
        for _, r in grp.iterrows():
            assert r["split"] == lab[r["doc_id"]]


def test_stratified_split_partition_invariant():
    a = stratified_split(_split_docs(21).repartition(1)).to_pandas()
    b = stratified_split(_split_docs(21).repartition(8)).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert (a["split"] == b["split"]).all()


def test_stratified_split_bad_fracs():
    import pytest

    with pytest.raises(ValueError):
        stratified_split(_split_docs(3), fracs=(0.5, 0.2))


# ---------------------------------------------------------------------------
# running_totals
# ---------------------------------------------------------------------------

def _events_rt(rows):
    return rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64()),
    }))


def test_running_totals_matches_bruteforce():
    from trustfuse_ray.stages.windows import running_totals

    rng = np.random.default_rng(3)
    rows = [(i, int(rng.integers(5)), int(rng.integers(0, 10 ** 8)),
             float(rng.uniform(-5, 5))) for i in range(300)]
    got = running_totals(_events_rt(rows).repartition(6)).to_pandas()
    assert len(got) == 300
    want = {}
    by_user: dict[int, list] = {}
    for eid, uid, ts, v in rows:
        by_user.setdefault(uid, []).append((ts, eid, v))
    for uid, evs in by_user.items():
        evs.sort()
        cum_fx = 0
        for rank, (ts, eid, v) in enumerate(evs, start=1):
            cum_fx += int(np.round(v * 10_000))
            want[eid] = (rank, cum_fx / 10_000.0)
    for _, r in got.iterrows():
        rn, rv = want[int(r["event_id"])]
        assert int(r["running_n"]) == rn
        assert abs(float(r["running_value"]) - rv) < 1e-9


def test_running_totals_partition_invariant():
    from trustfuse_ray.stages.windows import running_totals

    rows = [(i, i % 3, 1000 * (i % 7), float(i)) for i in range(60)]
    a = running_totals(_events_rt(rows).repartition(1)).to_pandas()
    b = running_totals(_events_rt(rows).repartition(9)).to_pandas()
    a = a.sort_values("event_id").reset_index(drop=True)
    b = b.sort_values("event_id").reset_index(drop=True)
    assert (a["running_n"] == b["running_n"]).all()
    assert (a["running_value"] == b["running_value"]).all()


# ---------------------------------------------------------------------------
# rollup_counts
# ---------------------------------------------------------------------------

def test_rollup_counts_matches_pandas():
    from trustfuse_ray.stages.profile import rollup_counts

    rows = [(i, f"s{i % 3}", "en" if i % 2 else "fr", 10 + i)
            for i in range(90)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array([r[2] for r in rows], pa.string()),
        "n_chars": pa.array([r[3] for r in rows], pa.int64()),
    })).repartition(7)
    got = rollup_counts(ds).to_pandas()
    import pandas as pd

    df = pd.DataFrame(rows, columns=["doc_id", "source", "lang", "n_chars"])
    fine = df.groupby(["source", "lang"]).agg(
        n=("doc_id", "size"), v=("n_chars", "sum"))
    mid = df.groupby("source").agg(n=("doc_id", "size"),
                                   v=("n_chars", "sum"))
    # 3*2 fine + 3 mid + 1 total
    assert len(got) == len(fine) + len(mid) + 1
    gm = {(r["source"], r["lang"]): (r["n_rows"], r["value_sum"])
          for _, r in got.iterrows()}
    for (s, l), r in fine.iterrows():
        assert gm[(s, l)] == (r["n"], r["v"])
    for s, r in mid.iterrows():
        assert gm[(s, "ALL")] == (r["n"], r["v"])
    assert gm[("ALL", "ALL")] == (len(df), df["n_chars"].sum())


def test_rollup_counts_empty():
    from trustfuse_ray.stages.profile import rollup_counts

    ds = rd.from_arrow(pa.table({
        "source": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64()),
    }))
    assert len(rollup_counts(ds).to_pandas()) == 0


# ---------------------------------------------------------------------------
# dsir_select
# ---------------------------------------------------------------------------

def test_dsir_select_threshold_semantics():
    from trustfuse_ray.stages.selection import dsir_select

    rows = [(i, f"tok{i % 7} tok{i % 3} shared body words",
             "en" if i % 3 == 0 else "fr") for i in range(120)]
    scores = _dsir_oracle(rows)
    vals = np.array(sorted(scores.values(), reverse=True))
    k = int(np.ceil(0.25 * len(vals)))
    thr = int(vals[k - 1])
    want_ids = {i for i, s in scores.items() if s >= thr}
    got = dsir_select(_docs(rows).repartition(5), frac=0.25).to_pandas()
    assert set(got["doc_id"].astype(int)) == want_ids
    assert len(got) >= k  # ties at the cutoff included


def test_dsir_select_empty():
    from trustfuse_ray.stages.selection import dsir_select

    got = dsir_select(_docs([])).to_pandas()
    assert len(got) == 0


# ---------------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------------

def test_pagerank_matches_sequential():
    from trustfuse_ray.stages.graph import pagerank

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"),
             ("e", "a"), ("c", "e")]
    ds = rd.from_arrow(pa.table({
        "src": [e[0] for e in edges],
        "dst": [e[1] for e in edges]})).repartition(3)
    K, SCALE = 5, 1_000_000
    got = {r["node"]: r["pagerank_fx"]
           for r in pagerank(ds, rounds=K).to_pandas().to_dict("records")}
    nodes = sorted({x for e in edges for x in e})
    deg: dict[str, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {n: SCALE for n in nodes}
    base = (15 * SCALE) // 100
    for _ in range(K):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = {n: base + (85 * s[n]) // 100 for n in nodes}
    assert got == r


def test_pagerank_partition_invariant_and_dangling():
    from trustfuse_ray.stages.graph import pagerank

    # star into a sink: 'z' has no out-edges (dangling mass dropped)
    edges = [(f"n{i}", "z") for i in range(10)] + [("z0", "n0")]
    ds = rd.from_arrow(pa.table({
        "src": [e[0] for e in edges],
        "dst": [e[1] for e in edges]}))
    a = pagerank(ds.repartition(1), rounds=3).to_pandas()
    b = pagerank(ds.repartition(7), rounds=3).to_pandas()
    a = a.sort_values("node").reset_index(drop=True)
    b = b.sort_values("node").reset_index(drop=True)
    assert (a["pagerank_fx"] == b["pagerank_fx"]).all()
    am = dict(zip(a["node"], a["pagerank_fx"]))
    assert am["z"] > am["n1"]  # the sink accumulates rank


def test_pagerank_empty():
    from trustfuse_ray.stages.graph import pagerank

    ds = rd.from_arrow(pa.table({"src": pa.array([], pa.string()),
                                 "dst": pa.array([], pa.string())}))
    assert len(pagerank(ds, rounds=2).to_pandas()) == 0


def test_triangle_count_matches_bruteforce():
    import itertools

    from trustfuse_ray.stages.graph import triangle_count

    rng = np.random.default_rng(5)
    n, p = 30, 0.2
    edges = [(f"n{i}", f"n{j}") for i in range(n) for j in range(n)
             if i != j and rng.random() < p]
    und = {tuple(sorted(e)) for e in edges}
    adj: dict[str, set] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = sum(1 for a, b, c in itertools.combinations(sorted(adj), 3)
               if b in adj[a] and c in adj[a] and c in adj[b])
    ds = rd.from_arrow(pa.table({
        "src": [e[0] for e in edges],
        "dst": [e[1] for e in edges]})).repartition(4)
    got = int(triangle_count(ds).to_pandas()["n_triangles"][0])
    assert got == want


def test_triangle_count_empty_and_trianglefree():
    from trustfuse_ray.stages.graph import triangle_count

    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.string()),
                                    "dst": pa.array([], pa.string())}))
    assert int(triangle_count(empty).to_pandas()["n_triangles"][0]) == 0
    # a path graph has no triangles; duplicate + reversed edges ignored
    path = rd.from_arrow(pa.table({
        "src": ["a", "b", "c", "b", "a"],
        "dst": ["b", "c", "d", "a", "b"]}))
    assert int(triangle_count(path).to_pandas()["n_triangles"][0]) == 0


# ---------------------------------------------------------------------------
# weighted_hash_sample / group_outliers
# ---------------------------------------------------------------------------

def test_weighted_hash_sample_exact_and_monotone():
    from trustfuse_ray.stages.curation import weighted_hash_sample

    rows = [(i, (i * 137) % 2500, f"s{i % 2}") for i in range(500)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_chars": pa.array([r[1] for r in rows], pa.int64()),
        "source": pa.array([r[2] for r in rows], pa.string()),
    }))
    got = weighted_hash_sample(ds.repartition(4)).to_pandas()
    want = set()
    for i, w, _ in rows:
        h = _md5_64(str(i))
        if (h >> 32) * 2000 < (min(w, 2000) << 32):
            want.add(i)
    assert set(got["doc_id"].astype(int)) == want
    # weight-2000+ rows are always kept; weight-0 rows never
    full = {i for i, w, _ in rows if w >= 2000}
    zero = {i for i, w, _ in rows if w == 0}
    assert full <= want and not (zero & want)


def test_group_outliers_matches_exact_z2():
    from trustfuse_ray.stages.profile import group_outliers

    rng = np.random.default_rng(13)
    rows = []
    for i in range(200):
        g = f"s{i % 3}"
        v = int(rng.integers(90, 110))
        rows.append((i, g, v))
    rows.append((900, "s0", 10_000))  # planted outlier
    rows.append((901, "s1", 1))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "source": pa.array([r[1] for r in rows], pa.string()),
        "n_chars": pa.array([r[2] for r in rows], pa.int64()),
    })).repartition(5)
    got = group_outliers(ds, k=2).to_pandas()
    assert len(got) == len(rows)
    stats: dict[str, list] = {}
    for _, g, v in rows:
        st = stats.setdefault(g, [0, 0, 0])
        st[0] += v
        st[1] += v * v
        st[2] += 1
    gm = dict(zip(got["doc_id"].astype(int), got["is_outlier"]))
    for i, g, v in rows:
        s, q, n = stats[g]
        want = (n > 1 and n * q - s * s > 0
                and (n * v - s) ** 2 > 4 * (n * q - s * s))
        assert bool(gm[i]) == want
    assert gm[900] and gm[901]
    assert sum(gm.values()) < 20  # inliers stay unflagged


def test_pmi_bigrams_matches_sequential():
    from collections import Counter

    from trustfuse_ray.stages.profile import pmi_top_bigrams

    rng = np.random.default_rng(17)
    vocab = ["alpha", "beta", "gamma", "delta"]
    rows = []
    for i in range(80):
        words = [vocab[int(j)] for j in rng.integers(0, len(vocab), 10)]
        if i % 3 == 0:
            words[2:4] = ["new", "york"]  # planted collocation
        rows.append((i, " ".join(words), "en"))
    got = pmi_top_bigrams(_docs(rows).repartition(4), k=10,
                          min_count=3).to_pandas()
    # sequential recompute
    import re
    uni: Counter = Counter()
    big: Counter = Counter()
    T = B = 0
    for _, text, _ in rows:
        tl = re.split(r"\s+", text.strip())
        uni.update(tl)
        T += len(tl)
        B += len(tl) - 1
        big.update(zip(tl[:-1], tl[1:]))
    scored = []
    for (a, b), nab in big.items():
        if nab < 3:
            continue
        x = nab * float(T) * float(T) / (float(B) * float(uni[a])
                                         * float(uni[b]))
        scored.append((int(np.round(np.log(x) * 1e9)), a, b, nab))
    scored.sort(key=lambda r: (-r[0], r[1], r[2]))
    want = scored[:10]
    assert len(got) == len(want)
    for row, (sc, a, b, nab) in zip(got.itertuples(index=False), want):
        assert (row.a, row.b, row.n_ab, row.score) == (a, b, nab, sc)
    # the planted collocation must rank first
    assert (got.iloc[0]["a"], got.iloc[0]["b"]) == ("new", "york")


# ---------------------------------------------------------------------------
# funnel / retention
# ---------------------------------------------------------------------------

def test_funnel_steps_semantics():
    from trustfuse_ray.stages.windows import funnel_steps

    rows = [
        # user 1: full funnel in order
        (1, 1, 100, "view"), (2, 1, 200, "click"), (3, 1, 300, "purchase"),
        # user 2: click BEFORE view → click stage unmet until later click
        (4, 2, 100, "click"), (5, 2, 200, "view"),
        # user 3: view only
        (6, 3, 50, "view"),
        # user 4: no view at all → excluded
        (7, 4, 10, "click"), (8, 4, 20, "purchase"),
        # user 5: purchase before click → stage stops at click
        (9, 5, 10, "view"), (10, 5, 30, "purchase"), (11, 5, 40, "click"),
    ]
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })).repartition(3)
    got = {int(r["user_id"]): r
           for r in funnel_steps(ds).to_pandas().to_dict("records")}
    assert set(got) == {1, 2, 3, 5}
    assert (got[1]["view_us"], got[1]["click_us"], got[1]["purchase_us"],
            got[1]["stage"]) == (100, 200, 300, 3)
    assert got[2]["stage"] == 1 and got[2]["view_us"] == 200
    assert got[3]["stage"] == 1
    # user 5: click at 40 >= view 10 → stage 2; purchase at 30 < 40 → unmet
    assert got[5]["stage"] == 2 and got[5]["click_us"] == 40


def test_weekly_retention_counts():
    from trustfuse_ray.stages.windows import weekly_retention

    WK = 604_800_000_000
    rows = [
        (1, 0), (1, 0), (1, 1), (1, 3),   # user 1: offsets {0,1,3}
        (2, 5), (2, 6),                   # user 2: offsets {0,1}
        (3, 2),                           # user 3: offset {0}
    ]
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * WK + 17 for r in rows],
                       pa.timestamp("us")),
    })).repartition(2)
    got = {int(r["week_offset"]): int(r["n_users"])
           for r in weekly_retention(ds).to_pandas().to_dict("records")}
    assert got == {0: 3, 1: 2, 3: 1}


# ---------------------------------------------------------------------------
# skew / robustness
# ---------------------------------------------------------------------------

def test_hot_key_skew_running_totals_and_funnel():
    """One key holding 96% of all rows must still produce exact results —
    documents the per-key-group partitioning assumption under skew."""
    from trustfuse_ray.stages.windows import funnel_steps, running_totals

    rows = []
    types = ["view", "click", "purchase"]
    for i in range(25_000):
        rows.append((i, 0, i * 10, float(i % 7), types[i % 3]))
    for i in range(1_000):  # 40 cold keys
        rows.append((25_000 + i, 1 + i % 40, i * 100, 1.0,
                     types[i % 3]))
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "event_type": pa.array([r[4] for r in rows], pa.string()),
    })).repartition(8)
    rt = running_totals(ds).to_pandas()
    assert len(rt) == len(rows)
    hot = rt[rt["user_id"] == 0].sort_values("event_id")
    assert list(hot["running_n"]) == list(range(1, 25_001))
    exp_last = sum(float(i % 7) for i in range(25_000))
    assert abs(hot["running_value"].iloc[-1] - exp_last) < 1e-6
    fn = funnel_steps(ds).to_pandas()
    hot_fn = fn[fn["user_id"] == 0].iloc[0]
    # user 0: view at t=0, click at t=10, purchase at t=20
    assert (hot_fn["view_us"], hot_fn["click_us"],
            hot_fn["purchase_us"], hot_fn["stage"]) == (0, 10, 20, 3)


def test_funnel_retention_empty():
    from trustfuse_ray.stages.windows import funnel_steps, weekly_retention

    empty = rd.from_arrow(pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "event_type": pa.array([], pa.string()),
    }))
    assert len(funnel_steps(empty).to_pandas()) == 0
    assert len(weekly_retention(empty).to_pandas()) == 0


def test_personalized_pagerank_seeds_semantics():
    from trustfuse_ray.stages.graph import pagerank

    # two disjoint components; seeds only in the first
    edges = [("a", "b"), ("b", "a"), ("b", "c"),
             ("x", "y"), ("y", "x")]
    ds = rd.from_arrow(pa.table({
        "src": [e[0] for e in edges],
        "dst": [e[1] for e in edges]}))
    K, SCALE = 4, 1_000_000
    got = {r["node"]: r["pagerank_fx"]
           for r in pagerank(ds, rounds=K,
                             seeds=["a"]).to_pandas().to_dict("records")}
    # sequential PPR oracle
    nodes = sorted({x for e in edges for x in e})
    deg: dict[str, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {n: (SCALE if n == "a" else 0) for n in nodes}
    for _ in range(K):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += r[u] // deg[u]
        r = {n: ((15 * SCALE) // 100 if n == "a" else 0)
             + (85 * s[n]) // 100 for n in nodes}
    assert got == r
    # the unseeded component carries zero rank
    assert got["x"] == 0 and got["y"] == 0 and got["a"] > 0


def test_ntile_per_key_matches_sql_semantics():
    from trustfuse_ray.stages.windows import ntile_per_key

    # 10 rows in one key, k=4 → tile sizes 3,3,2,2 (first n%k larger)
    rows = [(i, "t", float(100 - i)) for i in range(10)]
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "value": pa.array([r[2] for r in rows], pa.float64()),
    })).repartition(3)
    got = ntile_per_key(ds, n_tiles=4).to_pandas()
    # ascending value order = descending event_id
    order = sorted(rows, key=lambda r: (r[2], r[0]))
    want = {}
    sizes = [3, 3, 2, 2]
    pos = 0
    for tile, sz in enumerate(sizes, start=1):
        for _ in range(sz):
            want[order[pos][0]] = tile
            pos += 1
    gm = dict(zip(got["event_id"].astype(int), got["tile"].astype(int)))
    assert gm == want


def test_ordered_path_assembly():
    from trustfuse_ray.stages.windows import ordered_path

    rows = [(0, 1, 30, "purchase"), (1, 1, 10, "view"), (2, 1, 20, "click"),
            (3, 2, 5, "error"), (4, 2, 5, "signup")]  # tie broken by id
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })).repartition(2)
    got = {int(r["user_id"]): r["path"]
           for r in ordered_path(ds).to_pandas().to_dict("records")}
    assert got == {1: "view>click>purchase", 2: "error>signup"}


def test_funnel_missing_intermediate_step_nulls_later_steps():
    """Regression: view + purchase but NO click must leave purchase NULL
    (stage 1), matching the SQL chained-min oracle."""
    from trustfuse_ray.stages.windows import funnel_steps

    rows = [(1, 9, 10, "view"), (2, 9, 30, "purchase")]
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    }))
    got = funnel_steps(ds).to_pandas().iloc[0]
    assert got["view_us"] == 10
    assert got["click_us"] is None or np.isnan(got["click_us"])
    assert got["purchase_us"] is None or np.isnan(got["purchase_us"])
    assert got["stage"] == 1


def test_rolling_stats_matches_bruteforce():
    from trustfuse_ray.stages.windows import rolling_stats

    rng = np.random.default_rng(23)
    rows = [(i, int(rng.integers(3)), i * 7, float(rng.uniform(-3, 3)))
            for i in range(200)]
    ds = _events_rt(rows).repartition(5)
    got = rolling_stats(ds, w=5).to_pandas()
    by_user: dict[int, list] = {}
    for eid, uid, ts, v in rows:
        by_user.setdefault(uid, []).append((ts, eid, v))
    want = {}
    for uid, evs in by_user.items():
        evs.sort()
        fx = [int(np.round(v * 10_000)) for _, _, v in evs]
        for i, (_, eid, _) in enumerate(evs):
            lo = max(i - 4, 0)
            s = sum(fx[lo:i + 1])
            n = i - lo + 1
            want[eid] = (n, (s / 10_000.0) / n)
    for _, r in got.iterrows():
        n, avg = want[int(r["event_id"])]
        assert int(r["win_n"]) == n
        assert abs(float(r["win_avg"]) - avg) < 1e-12


# ---------------------------------------------------------------------------
# property tests (hypothesis)
# ---------------------------------------------------------------------------

def test_ntile_and_split_properties():
    """Property sweep over group sizes: NTILE tiles are contiguous with
    sizes within one of each other summing to n; stratified split sizes
    hit the exact floor cuts at every n."""
    from trustfuse_ray.stages.windows import ntile_per_key

    for n in (1, 2, 3, 4, 5, 7, 8, 11, 40):
        rows = [(i, "k", float(i)) for i in range(n)]
        ds = rd.from_arrow(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
        }))
        got = ntile_per_key(ds, n_tiles=4).to_pandas()
        sizes = got.groupby("tile").size()
        assert sizes.sum() == n
        assert sizes.max() - sizes.min() <= 1
        # SQL NTILE ordering: value asc == event_id asc here, so tiles
        # must be monotone in event_id
        m = got.sort_values("event_id")["tile"].to_numpy()
        assert (np.diff(m) >= 0).all()
    for n in (1, 2, 3, 9, 10, 19, 20):
        ds = _split_docs(n, groups=("g",))
        got = stratified_split(ds).to_pandas()
        c = got["split"].value_counts()
        t1 = int(np.floor(0.8 * n))
        t2 = int(np.floor(0.9 * n))
        assert c.get("train", 0) == t1
        assert c.get("val", 0) == t2 - t1
        assert c.get("test", 0) == n - t2


def test_embedding_quantize_ranges_and_edges():
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from trustfuse_ray.stages.ann import embedding_quantize

    vecs = [[0.0, 5.0, 7.5], [10.0, 5.0, 2.5], [5.0, 5.0, 0.0]]
    embs = rd.from_arrow(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    })).repartition(2)
    out = {(r["vec_id"], r["dim"]): r["code"]
           for r in embedding_quantize(embs).take_all()}
    # dim0: range [0,10] -> 0, 255, floor(0.5*255)=127
    assert out[(0, 0)] == 0 and out[(1, 0)] == 255 and out[(2, 0)] == 127
    # dim1 constant -> all 0
    assert out[(0, 1)] == out[(1, 1)] == out[(2, 1)] == 0
    # dim2: range [0,7.5] -> max maps to 255, min to 0
    assert out[(0, 2)] == 255 and out[(2, 2)] == 0
    assert all(0 <= c <= 255 for c in out.values())


def test_late_interaction_maxsim_scores():
    import pyarrow as pa
    import ray.data as rd

    from trustfuse_ray.stages.ann import late_interaction_topk

    # doc0 = vecs {e1, e2}; doc1 = vecs {e2-ish, -e1}; query = [e1, e2]
    vecs = {0: [1.0, 0.0, 0.0], 1: [0.0, 1.0, 0.0],
            2: [0.0, 1.0, 0.0], 3: [-1.0, 0.0, 0.0]}
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(sorted(vecs), pa.int64()),
        "embedding": pa.array([vecs[i] for i in sorted(vecs)],
                              pa.list_(pa.float64())),
    })).repartition(2)
    queries = [{"vec_id": 0, "embedding": vecs[0]},
               {"vec_id": 1, "embedding": vecs[1]}]
    out = late_interaction_topk(emb, queries, k=2,
                                group_div=2).take_all()
    # doc0: max cos vs e1 = 1, vs e2 = 1 -> 2.0; doc1: 0 + 1 -> 1.0
    assert [(r["doc_id"], r["rank"], r["score"]) for r in out] == [
        (0, 1, 2.0), (1, 2, 1.0)]


def test_rrf_fuse_combines_ranks():
    import pyarrow as pa
    import ray.data as rd

    from trustfuse_ray.stages.ann import rrf_fuse

    def _lst(rows):
        return rd.from_arrow(pa.table({
            "query_id": pa.array([r[0] for r in rows], pa.int64()),
            "vec_id": pa.array([r[1] for r in rows], pa.int64()),
            "rank": pa.array([r[2] for r in rows], pa.int64()),
        }))

    # retriever A ranks v1 first; B ranks v2 first; v3 only in A
    a = _lst([(0, 1, 1), (0, 2, 2), (0, 3, 3)])
    b = _lst([(0, 2, 1), (0, 1, 2)])
    out = rrf_fuse([a, b], k=3, c=60).take_all()
    got = [(r["vec_id"], r["rank"]) for r in out]
    # v1: 1/61+1/62 == v2: 1/62+1/61 -> tie, v1 wins by id; v3 last
    assert got == [(1, 1), (2, 2), (3, 3)]
    fx = {r["vec_id"]: r["score_fx"] for r in out}
    assert fx[1] == fx[2] > fx[3]
