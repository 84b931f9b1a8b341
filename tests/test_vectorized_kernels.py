"""Batched shard kernels (fuse/vectorized.py) vs the per-fact accumulate
loop: stats must agree to float-roundoff on mixed random facts with
duplicate sources (the fancy-index collapse quirk) across several rounds.
TruthFinder is expected bitwise-equal; CRH within 1e-12 (BLAS dgemv vs
left-to-right segmented sums round differently on tied candidate rows,
which never changes the winning value — asserted directly)."""

import numpy as np

from trustfuse_ray.fuse.base import Fact, N_CHANNELS, _batched_stats
from trustfuse_ray.fuse.crh import CRH
from trustfuse_ray.fuse.truthfinder import TruthFinder


def _random_facts(seed=3, n=300, n_src=12):
    rng = np.random.default_rng(seed)
    facts = []
    for i in range(n):
        m = int(rng.integers(1, 8))
        src = rng.integers(0, n_src, size=m).astype(np.int32)
        if rng.random() < 0.5:
            vals = rng.integers(0, 4, size=m).astype(np.float64)
            vt = "quantity"
        else:
            vals = np.array([f"v{int(x)}" for x in
                             rng.integers(0, 4, size=m)], dtype=object)
            vt = "string" if rng.random() < 0.7 else "entity"
        facts.append(Fact(0, f"e{i}", "a", vt, src, vals,
                          np.arange(m, dtype=np.int64)))
    return facts, n_src


def _compare(Model, tol):
    facts, n_src = _random_facts()
    model = Model()
    state = {0: model.initial_state([f"s{i}" for i in range(n_src)],
                                    np.ones(n_src))}
    cache = {}
    for rnd in range(3):
        out_loop = {0: np.zeros((N_CHANNELS, n_src))}
        for f in facts:
            model.accumulate(f, state[0], out_loop[0])
        out_batch = _batched_stats(facts, model, state, {0: n_src}, cache)
        assert out_batch is not None, "model lost its batched kernel"
        assert np.abs(out_loop[0] - out_batch[0]).max() <= tol
        state[0], _ = model.reduce(state[0], out_loop[0],
                                   np.ones(n_src), rnd)


def test_crh_batched_matches_loop():
    _compare(CRH, 1e-12)


def test_truthfinder_batched_matches_loop():
    _compare(TruthFinder, 0.0)


def test_crh_batched_winner_value_invariant():
    """Candidate-row score ties only ever flip between rows claiming the
    SAME value (identical loss rows), so truth emission is unaffected."""
    from trustfuse_ray.fuse import vectorized as V

    rng = np.random.default_rng(3)
    facts, n_src = _random_facts()
    nums = [f for f in facts if f.is_numeric]
    model = CRH()
    w = rng.random(n_src)
    st = V.build_crh_batch(model, nums)
    num = st["num"]
    contrib = num["lossflat"] * w[num["colsrc"]]
    scores = np.add.reduceat(contrib, num["row_starts"])
    mn = np.minimum.reduceat(scores, num["fact_row_starts"])
    jrow = V._seg_first_arg(mn, scores, num["fact_row_starts"],
                            num["m_per_fact"], is_min=True)
    j_batch = jrow - num["fact_row_starts"]
    for fi, f in enumerate(nums):
        _, _, lossmat, _ = model._prep(f)
        j_loop = int(np.argmin(lossmat @ w[f.src_idx]))
        assert f.values[j_loop] == f.values[j_batch[fi]]


def _numeric_facts(seed=5, n=250, n_src=10):
    rng = np.random.default_rng(seed)
    facts = []
    for i in range(n):
        m = int(rng.integers(1, 8))
        src = rng.integers(0, n_src, size=m).astype(np.int32)
        vals = (rng.integers(0, 5, size=m).astype(np.float64)
                + rng.random(m).round(2))
        facts.append(Fact(0, f"e{i}", "a", "quantity", src, vals,
                          np.arange(m, dtype=np.int64)))
    return facts, n_src


def _compare_numeric(Model, tol, rounds=3):
    facts, n_src = _numeric_facts()
    model = Model()
    state = {0: model.initial_state([f"s{i}" for i in range(n_src)],
                                    np.full(n_src, 30.0))}
    cache = {}
    for rnd in range(rounds):
        out_loop = {0: np.zeros((N_CHANNELS, n_src))}
        for f in facts:
            model.accumulate(f, state[0], out_loop[0])
        out_batch = _batched_stats(facts, model, state, {0: n_src}, cache)
        assert out_batch is not None
        assert np.abs(out_loop[0] - out_batch[0]).max() <= tol
        state[0], _ = model.reduce(state[0], out_loop[0],
                                   np.full(n_src, 30.0), rnd)


def test_gtm_batched_matches_loop():
    from trustfuse_ray.fuse.gtm import GTM

    _compare_numeric(GTM, 1e-9, rounds=4)


def test_accu_batched_matches_loop():
    from trustfuse_ray.fuse.accu import Accu

    facts, n_src = _random_facts(seed=11)
    model = Accu(init_acc=None)
    state = {0: model.initial_state([f"s{i}" for i in range(n_src)],
                                    np.ones(n_src))}
    cache = {}
    for rnd in range(3):
        out_loop = {0: np.zeros((N_CHANNELS, n_src))}
        for f in facts:
            model.accumulate(f, state[0], out_loop[0])
        out_batch = _batched_stats(facts, model, state, {0: n_src}, cache)
        assert out_batch is not None
        assert np.array_equal(out_loop[0], out_batch[0])
        state[0], _ = model.reduce(state[0], out_loop[0],
                                   np.ones(n_src), rnd)


def test_slimfast_batched_matches_loop():
    from trustfuse_ray.fuse.slimfast import SLiMFast

    facts, n_src = _random_facts(seed=17)
    model = SLiMFast()
    state = {0: model.initial_state([f"s{i}" for i in range(n_src)],
                                    np.ones(n_src))}
    cache = {}
    for rnd in range(3):
        out_loop = {0: np.zeros((N_CHANNELS, n_src))}
        for f in facts:
            model.accumulate(f, state[0], out_loop[0])
        out_batch = _batched_stats(facts, model, state, {0: n_src}, cache)
        assert out_batch is not None
        assert np.array_equal(out_loop[0], out_batch[0])
        state[0], _ = model.reduce(state[0], out_loop[0],
                                   np.ones(n_src), rnd)


def _random_claims_table(seed=5, n_claims=4000, n_src=15):
    import pyarrow as pa
    rng = np.random.default_rng(seed)
    ent = [f"e{int(x)}" for x in rng.integers(0, 400, size=n_claims)]
    attr = [f"a{int(x)}" for x in rng.integers(0, 3, size=n_claims)]
    vt = np.where(rng.random(n_claims) < 0.4, "quantity", "string")
    vs, vn = [], []
    for i in range(n_claims):
        if vt[i] == "quantity" and rng.random() < 0.9:
            x = float(rng.integers(0, 9))
            vs.append(str(int(x)))
            vn.append(x)
        else:
            vs.append(f"v{int(rng.integers(0, 5))}")
            vn.append(None)  # quantity fact with an unparsed claim
    return pa.table({
        "claim_id": pa.array(np.arange(n_claims), pa.int64()),
        "bucket_id": pa.array(rng.integers(0, 3, size=n_claims), pa.int32()),
        "entity": pa.array(ent), "attr": pa.array(attr),
        "source": pa.array([f"s{int(x)}" for x in
                            rng.integers(0, n_src, size=n_claims)]),
        "value_str": pa.array(vs), "value_num": pa.array(vn, pa.float64()),
        "value_type": pa.array(vt.tolist()),
    })


def test_counts_table_matches_row_loop():
    """Vectorized (bid, source) fact counts == the per-row reference loop
    (+1 per fact per DISTINCT source; quantity channel only when every
    claim parsed numeric)."""
    from trustfuse_ray.fuse.base import _counts_table, _pack_partition

    packed = _pack_partition(_random_claims_table())
    ref: dict = {}
    for bid, srcs, vt, vns in zip(packed["bucket_id"].to_pylist(),
                                  packed["sources"].to_pylist(),
                                  packed["value_type"].to_pylist(),
                                  packed["values_num"].to_pylist()):
        is_q = vt == "quantity" and all(v is not None for v in vns)
        for src in set(srcs):
            c = ref.setdefault((bid, src), [0.0, 0.0])
            c[0] += 1
            if is_q:
                c[1] += 1
    got = _counts_table(packed)
    assert got == ref
    # sliced table (nonzero list offsets) must agree too
    half = packed.slice(len(packed) // 3, len(packed) // 2)
    ref_h = {}
    for bid, srcs, vt, vns in zip(half["bucket_id"].to_pylist(),
                                  half["sources"].to_pylist(),
                                  half["value_type"].to_pylist(),
                                  half["values_num"].to_pylist()):
        is_q = vt == "quantity" and all(v is not None for v in vns)
        for src in set(srcs):
            c = ref_h.setdefault((bid, src), [0.0, 0.0])
            c[0] += 1
            if is_q:
                c[1] += 1
    assert _counts_table(half) == ref_h
    import pyarrow as pa
    empty = packed.slice(0, 0)
    assert _counts_table(empty) == {}


def _emit_compare(Model, rounds=2, seed=3):
    import pyarrow as pa
    from trustfuse_ray.fuse.base import _emit_facts, _emit_facts_loop

    facts, n_src = _random_facts(seed=seed)
    model = Model()
    state = {0: model.initial_state([f"s{i}" for i in range(n_src)],
                                    np.ones(n_src))}
    cache = {}
    for rnd in range(min(rounds, model.n_rounds)):
        out = _batched_stats(facts, model, state, {0: n_src}, cache)
        if out is None:
            out = {0: np.zeros((N_CHANNELS, n_src))}
            for f in facts:
                if model.numeric_only and not f.is_numeric:
                    continue
                model.accumulate(f, state[0], out[0])
        state[0], _ = model.reduce(state[0], out[0], np.ones(n_src), rnd)
    batched = _emit_facts(facts, model, state, cache)
    loop = _emit_facts_loop(facts, model, state)
    assert batched.schema.equals(loop.schema)
    keys = [("entity", "ascending"), ("attr", "ascending"),
            ("value_str", "ascending")]
    import pyarrow.compute as pc
    b = batched.take(pc.sort_indices(batched, sort_keys=keys))
    l = loop.take(pc.sort_indices(loop, sort_keys=keys))
    assert len(b) == len(l)
    for col in ("bucket_id", "entity", "attr", "value_str", "value_type",
                "n_claims", "winner_claim_id"):
        assert b[col].to_pylist() == l[col].to_pylist(), col
    for col in ("value_num", "conf"):
        x = np.array([v if v is not None else np.nan
                      for v in b[col].to_pylist()])
        y = np.array([v if v is not None else np.nan
                      for v in l[col].to_pylist()])
        ok = np.isclose(x, y, rtol=1e-9, atol=1e-12) | (
            np.isnan(x) & np.isnan(y))
        assert ok.all(), (col, x[~ok], y[~ok])


def test_voting_emit_batched_matches_loop():
    from trustfuse_ray.fuse.voting import Voting
    _emit_compare(Voting)


def test_crh_emit_batched_matches_loop():
    from trustfuse_ray.fuse.crh import CRH
    _emit_compare(CRH)


def test_truthfinder_emit_batched_matches_loop():
    from trustfuse_ray.fuse.truthfinder import TruthFinder
    _emit_compare(TruthFinder)


def test_accu_emit_batched_matches_loop():
    from trustfuse_ray.fuse.accu import Accu
    _emit_compare(Accu, rounds=3)
    _emit_compare(Accu, rounds=3, seed=11)


def test_slimfast_emit_batched_matches_loop():
    from trustfuse_ray.fuse.slimfast import SLiMFast
    _emit_compare(SLiMFast, rounds=3)
    _emit_compare(SLiMFast, rounds=3, seed=11)


def test_gtm_emit_batched_matches_loop():
    from trustfuse_ray.fuse.gtm import GTM
    _emit_compare(GTM, rounds=3)
    _emit_compare(GTM, rounds=3, seed=11)


def test_catd_emit_batched_matches_loop():
    from trustfuse_ray.fuse.catd import CATD
    _emit_compare(CATD, rounds=3)
    _emit_compare(CATD, rounds=3, seed=11)


def test_kdem_emit_batched_matches_loop():
    from trustfuse_ray.fuse.kdem import KDEm
    _emit_compare(KDEm, rounds=3)
    _emit_compare(KDEm, rounds=3, seed=11)


def _random_facts_big(seed=11, n=80, n_src=40):
    """Facts with 50-200 claims: the regime where BLAS dgemv / pairwise
    summation reassociates vs the kernels' sequential segmented sums
    (ADVICE r2: the 1-8 claim fixture never exercised this)."""
    rng = np.random.default_rng(seed)
    facts = []
    for i in range(n):
        m = int(rng.integers(50, 200))
        src = rng.integers(0, n_src, size=m).astype(np.int32)
        if rng.random() < 0.5:
            vals = rng.normal(0, 100, size=m).round(2)
            vt = "quantity"
        else:
            vals = np.array([f"v{int(x)}" for x in
                             rng.integers(0, 6, size=m)], dtype=object)
            vt = "string"
        facts.append(Fact(0, f"e{i}", "a", vt, src, vals,
                          np.arange(m, dtype=np.int64)))
    return facts, n_src


def _compare_big(Model, seed):
    """Loop vs batched stats and emit on big skewed-weight facts: stats
    agree to relative roundoff; the emitted VALUES agree exactly (score
    reassociation must never flip the winner across different values)."""
    from trustfuse_ray.fuse.base import _emit_facts, _emit_facts_loop

    facts, n_src = _random_facts_big(seed=seed)
    rng = np.random.default_rng(seed + 1)
    model = Model()
    state = {0: model.initial_state([f"s{i}" for i in range(n_src)],
                                    np.ones(n_src))}
    cache = {}
    for rnd in range(2):
        out_loop = {0: np.zeros((N_CHANNELS, n_src))}
        for f in facts:
            model.accumulate(f, state[0], out_loop[0])
        out_batch = _batched_stats(facts, model, state, {0: n_src}, cache)
        assert out_batch is not None
        diff = np.abs(out_loop[0] - out_batch[0])
        scale = np.maximum(1.0, np.abs(out_loop[0]))
        assert (diff / scale).max() <= 1e-9
        state[0], _ = model.reduce(state[0], out_loop[0],
                                   np.ones(n_src), rnd)
        # skew the weights 6 orders of magnitude to amplify reassociation
        key = "w" if "w" in state[0] else "tau"
        state[0][key] = state[0][key] * rng.gamma(0.5, 2.0, size=n_src) \
            * 10.0 ** rng.integers(-3, 4, size=n_src)
    batched = _emit_facts(facts, model, state, cache)
    loop = _emit_facts_loop(facts, model, state)
    key = [("entity", "ascending"), ("value_str", "ascending")]
    import pyarrow.compute as pc
    b = batched.take(pc.sort_indices(batched, sort_keys=key))
    l = loop.take(pc.sort_indices(loop, sort_keys=key))
    assert b["value_str"].to_pylist() == l["value_str"].to_pylist()
    assert b["winner_claim_id"].to_pylist() == l["winner_claim_id"].to_pylist()


def test_crh_big_fact_reassociation_regime():
    from trustfuse_ray.fuse.crh import CRH
    _compare_big(CRH, seed=11)
    _compare_big(CRH, seed=23)


def test_truthfinder_big_fact_reassociation_regime():
    from trustfuse_ray.fuse.truthfinder import TruthFinder
    _compare_big(TruthFinder, seed=11)
    _compare_big(TruthFinder, seed=23)


def test_iter_facts_sliced_matches_copy():
    """iter_facts on a sliced packed table (nonzero absolute list offsets,
    child arrays longer than the window) must yield exactly the facts of a
    deep-copied, offset-reset table — the regime where the old
    re-materialize fallback returned views and misaligned flat arrays."""
    import pyarrow as pa
    from trustfuse_ray.fuse.base import _pack_partition, iter_facts

    packed = _pack_partition(_random_claims_table(seed=11))
    src_index = {}
    for bid, srcs in zip(packed["bucket_id"].to_pylist(),
                         packed["sources"].to_pylist()):
        d = src_index.setdefault(int(bid), {})
        for s in srcs:
            d.setdefault(s, len(d))
    for start, length in [(len(packed) // 3, len(packed) // 2),
                          (7, 1), (len(packed) - 1, 1), (5, 0)]:
        sl = packed.slice(start, length)
        deep = pa.Table.from_pylist(sl.to_pylist(), schema=sl.schema)
        got = list(iter_facts(sl, src_index))
        want = list(iter_facts(deep, src_index))
        assert len(got) == len(want) == length
        for a, b in zip(got, want):
            assert (a.bucket_id, a.entity, a.attr, a.vtype) == \
                   (b.bucket_id, b.entity, b.attr, b.vtype)
            assert np.array_equal(a.src_idx, b.src_idx)
            assert np.array_equal(a.claim_ids, b.claim_ids)
            assert list(a.values) == list(b.values)
