"""Fusion-model parity vs the reference-math oracles (FIXTURES.md F4 +
randomized fixtures).  The engine's distributed math must agree with a
sequential transcription of the reference algorithms exactly (same quirks,
same deterministic tie-breaks)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from tests import reference_oracle as oracle
from trustfuse_ray.fuse import CRH, TruthFinder, Voting, run_fusion
from trustfuse_ray.fuse.base import pack_facts

ATTR_TYPES = {"shape": "string", "mass": "quantity", "peer": "entity"}


def build_fixture(seed=7, n_entities=4, n_sources=5, hole_p=0.25):
    """Random small claim set; returns (claims table rows, oracle inputs)."""
    rng = np.random.default_rng(seed)
    sources = [f"s{i}" for i in range(n_sources)]
    rows = []
    cid = 0
    facts = {}  # (entity, attr) -> (idx list, values list, vtype)
    for e in range(n_entities):
        ent = f"ent{e}"
        for attr, vtype in ATTR_TYPES.items():
            idxs, vals = [], []
            for si, s in enumerate(sources):
                if rng.random() < hole_p:
                    continue
                if vtype == "quantity":
                    v = float(rng.integers(1, 6) * 10)
                    vs, vn = str(int(v)), v
                else:
                    v = f"{attr[0]}{int(rng.integers(0, 3))}"
                    vs, vn = v, None
                rows.append({"claim_id": cid, "bucket_id": 0, "source": s,
                             "entity": ent, "attr": attr, "value_str": vs,
                             "value_num": vn, "value_type": vtype,
                             "raw_value": vs, "conv_id": "c", "turn_idx": 0})
                idxs.append(si)
                vals.append(v if vtype == "quantity" else vs)
                cid += 1
            if idxs:
                arr = (np.array(vals, dtype=float) if vtype == "quantity"
                       else np.array(vals, dtype=object))
                facts[(ent, attr)] = (idxs, arr, vtype)
    return rows, facts, sources


def claims_ds(rows):
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    t = pa.table({
        "claim_id": pa.array(cols["claim_id"], pa.int64()),
        "bucket_id": pa.array(cols["bucket_id"], pa.int32()),
        "source": pa.array(cols["source"], pa.string()),
        "entity": pa.array(cols["entity"], pa.string()),
        "attr": pa.array(cols["attr"], pa.string()),
        "value_str": pa.array(cols["value_str"], pa.string()),
        "value_num": pa.array(cols["value_num"], pa.float64()),
        "value_type": pa.array(cols["value_type"], pa.string()),
        "raw_value": pa.array(cols["raw_value"], pa.string()),
        "conv_id": pa.array(cols["conv_id"], pa.string()),
        "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
    })
    return ray.data.from_arrow(t)


def oracle_inputs(facts, sources):
    keys = sorted(facts)
    index = [list(facts[k][0]) for k in keys]
    claim = [facts[k][1] for k in keys]
    types = [facts[k][2] for k in keys]
    count = np.zeros(len(sources))
    for idx in index:
        count[np.asarray(idx)] = count[np.asarray(idx)] + 1
    return keys, index, claim, types, count


def engine_truths(ds, model, **kw):
    triples, weights = run_fusion(ds, model, **kw)
    got = {(r["entity"], r["attr"]):
           (r["value_num"] if r["value_num"] is not None else r["value_str"])
           for r in triples.take_all()}
    return got, weights[0]


@pytest.mark.parametrize("seed", [7, 21])
def test_voting_parity(seed):
    rows, facts, sources = build_fixture(seed)
    got, _ = engine_truths(claims_ds(rows), Voting())
    keys, index, claim, types, count = oracle_inputs(facts, sources)
    for k, c in zip(keys, claim):
        want = oracle.voting_truth(c)
        assert got[k] == want, (k, got[k], want)


@pytest.mark.parametrize("seed", [7, 21])
def test_crh_parity(seed):
    rows, facts, sources = build_fixture(seed)
    got, w = engine_truths(claims_ds(rows), CRH(max_itr=10))
    keys, index, claim, types, count = oracle_inputs(facts, sources)
    want_truth, want_w = oracle.crh_fuse(index, claim, len(sources))
    for k, t in zip(keys, want_truth):
        assert got[k] == t, (k, got[k], t)
    np.testing.assert_allclose(
        [w[s] for s in sources], want_w, rtol=1e-10)


@pytest.mark.parametrize("seed", [7, 21])
def test_truthfinder_parity(seed):
    rows, facts, sources = build_fixture(seed)
    got, w = engine_truths(claims_ds(rows), TruthFinder(max_itr=10))
    keys, index, claim, types, count = oracle_inputs(facts, sources)
    want_truth, want_tau = oracle.truthfinder_fuse(
        index, claim, types, len(sources))
    for k, t in zip(keys, want_truth):
        assert got[k] == t, (k, got[k], t)
    np.testing.assert_allclose([w[s] for s in sources], want_tau, rtol=1e-10)


def test_distributed_equals_local():
    """The distributed per-round exchange must reproduce the local path."""
    rows, facts, sources = build_fixture(7)
    ds = claims_ds(rows)
    got_local, w_local = engine_truths(ds, CRH(max_itr=10))
    got_dist, w_dist = engine_truths(ds, CRH(max_itr=10), local_threshold=0)
    assert got_local == got_dist
    for s in sources:
        assert w_local[s] == pytest.approx(w_dist[s], rel=1e-12)


def test_pack_dedups_repeated_assertions():
    rows, _, _ = build_fixture(7)
    dup = dict(rows[0])
    dup["claim_id"] = 10_000
    ds = claims_ds(rows + [dup])
    packed = pack_facts(ds).take_all()
    for row in packed:
        pairs = list(zip(row["sources"], row["values_str"]))
        assert len(pairs) == len(set(pairs))
    # the kept claim is the lowest claim_id
    all_cids = [c for row in packed for c in row["claim_ids"]]
    assert 10_000 not in all_cids and rows[0]["claim_id"] in all_cids
