"""Shard-level batched accumulate kernels for the round-loop hot path.

The per-round cost of the iterative models is ``model.accumulate`` called
once per fact — ~40 µs of numpy small-array overhead per call, which at
250k facts × 10 rounds dominates fusion wall time.  These kernels run ONE
segmented-numpy pass per shard per round over flattened claim structures
built once per (shard, model) and reused across all rounds.

Faithfulness notes:
* per-value-group score sums run over claims in their original claim order
  within the group (stable sort), which is bitwise-identical to the per-fact
  ``eq @ w`` dot (the interleaved zero terms of the dot change nothing);
* argmax/argmin tie-breaks replicate numpy's first-occurrence rule via the
  masked-minimum-index trick;
* the reference's duplicate-source collapse (``out[idx] = out[idx] + v``
  fancy-index assignment keeps the LAST claim of a source within a fact,
  model.py:178-182) is reproduced exactly by a precomputed last-occurrence
  mask + ``np.add.at``.

Models opt in by defining ``build_batch(facts)`` → struct and
``accumulate_batch(struct, state, out)``; shards fall back to the per-fact
loop for everything else.
"""

from __future__ import annotations

import numpy as np

_BIG = np.iinfo(np.int64).max


def _keep_last_mask(claim_fact: np.ndarray, src_o: np.ndarray) -> np.ndarray:
    """True for the LAST occurrence of each (fact, source) pair, in original
    claim order."""
    n = len(src_o)
    keep = np.ones(n, dtype=bool)
    if n > 1:
        # a claim is NOT kept if a LATER claim in the same fact has the same
        # source.  Stable sort by (fact, src); within each (fact, src) run
        # only the last element survives.
        order = np.lexsort((np.arange(n), src_o, claim_fact))
        cf, so = claim_fact[order], src_o[order]
        last_in_run = np.ones(n, dtype=bool)
        same_next = (cf[:-1] == cf[1:]) & (so[:-1] == so[1:])
        last_in_run[:-1] = ~same_next
        keep[order] = last_in_run
    return keep


def _seg_first_arg(extreme_per_seg, values, seg_starts, counts, *,
                   is_min: bool) -> np.ndarray:
    """Index (global) of the FIRST element attaining the segment extreme —
    numpy argmin/argmax first-occurrence semantics, segmented."""
    rep = np.repeat(extreme_per_seg, counts)
    hit = values == rep
    cand = np.where(hit, np.arange(len(values), dtype=np.int64), _BIG)
    return np.minimum.reduceat(cand, seg_starts)


def build_cat_struct(facts, get_groups):
    """Common builder for distinct-value-group models.

    ``get_groups(fact)`` → (uniq_sorted, inv) for the fact.  Returns None if
    ``facts`` is empty."""
    if not facts:
        return None
    src_list, cf_list, vg_list = [], [], []
    vg_counts = []          # value groups per fact
    base = 0
    for fi, fact in enumerate(facts):
        uniq, inv = get_groups(fact)
        m = len(fact.src_idx)
        src_list.append(fact.src_idx.astype(np.int64))
        cf_list.append(np.full(m, fi, dtype=np.int64))
        vg_list.append(inv.astype(np.int64) + base)
        vg_counts.append(len(uniq))
        base += len(uniq)
    src_o = np.concatenate(src_list)
    claim_fact = np.concatenate(cf_list)
    vg_o = np.concatenate(vg_list)
    n_vg = base
    perm = np.argsort(vg_o, kind="stable")
    vg_sorted = vg_o[perm]
    vg_starts = np.searchsorted(vg_sorted, np.arange(n_vg))
    vg_counts = np.asarray(vg_counts, dtype=np.int64)
    vgf_starts = np.concatenate(([0], np.cumsum(vg_counts)[:-1]))
    return {
        "src_o": src_o, "claim_fact": claim_fact, "vg_o": vg_o,
        "perm": perm, "vg_starts": vg_starts,
        "vgf_starts": vgf_starts, "vg_counts": vg_counts,
        "keep": _keep_last_mask(claim_fact, src_o),
        "n_vg": n_vg, "n_facts": len(facts),
    }


# ---------------------------------------------------------------------------
# CRH
# ---------------------------------------------------------------------------


def build_crh_batch(model, facts):
    """CRH per-shard structures: categorical facts (distinct-value groups +
    init-mode group) and numeric facts (flattened candidate loss matrices +
    init loss)."""
    cats = [f for f in facts if not f.is_numeric]
    nums = [f for f in facts if f.is_numeric]

    def groups(fact):
        prep = model._prep(fact)       # ("cat", mode, uniq, inv, eq)
        return prep[2], prep[3]

    cat = build_cat_struct(cats, groups)
    if cat is not None:
        mode_vg = np.empty(len(cats), dtype=np.int64)
        for fi, fact in enumerate(cats):
            _, mode, uniq, _inv, _eq = model._prep(fact)
            mode_vg[fi] = cat["vgf_starts"][fi] + int(
                np.searchsorted(uniq, mode))
        cat["mode_vg"] = mode_vg

    num = None
    if nums:
        src_list, cf_list, loss_list, colsrc_list, init_list = \
            [], [], [], [], []
        m_per_fact = []
        for fi, fact in enumerate(nums):
            _, med, lossmat, denom = model._prep(fact)
            m = len(fact.src_idx)
            src_list.append(fact.src_idx.astype(np.int64))
            cf_list.append(np.full(m, fi, dtype=np.int64))
            loss_list.append(lossmat.ravel())
            colsrc_list.append(np.tile(fact.src_idx.astype(np.int64), m))
            init_list.append(((fact.values - med) ** 2) / denom)
            m_per_fact.append(m)
        m_per_fact = np.asarray(m_per_fact, dtype=np.int64)
        n_rows = int(m_per_fact.sum())
        row_m = np.repeat(m_per_fact, m_per_fact)     # m of each row's fact
        row_starts = np.concatenate(([0], np.cumsum(row_m)[:-1]))
        fact_row_starts = np.concatenate(
            ([0], np.cumsum(m_per_fact)[:-1]))
        block_starts = np.concatenate(
            ([0], np.cumsum(m_per_fact ** 2)[:-1]))
        src_o = np.concatenate(src_list)
        claim_fact = np.concatenate(cf_list)
        claim_local = np.concatenate(
            [np.arange(m, dtype=np.int64) for m in m_per_fact])
        num = {
            "src_o": src_o, "claim_fact": claim_fact,
            "lossflat": np.concatenate(loss_list),
            "colsrc": np.concatenate(colsrc_list),
            "row_starts": row_starts,
            "fact_row_starts": fact_row_starts,
            "block_starts": block_starts,
            "m_per_fact": m_per_fact,
            "claim_local": claim_local,
            "init_loss": np.concatenate(init_list),
            "keep": _keep_last_mask(claim_fact, src_o),
            "n_rows": n_rows,
        }
    return {"cat": cat, "num": num}


def crh_accumulate_batch(model, st, state, out):
    w = state["w"]
    init = state["use_init_truth"]
    cat = st["cat"]
    if cat is not None:
        if init:
            j_claim = cat["mode_vg"][cat["claim_fact"]]
        else:
            wi = w[cat["src_o"][cat["perm"]]]
            s_vg = np.add.reduceat(wi, cat["vg_starts"])
            mx = np.maximum.reduceat(s_vg, cat["vgf_starts"])
            j = _seg_first_arg(mx, s_vg, cat["vgf_starts"],
                               cat["vg_counts"], is_min=False)
            j_claim = j[cat["claim_fact"]]
        loss = (cat["vg_o"] != j_claim).astype(np.float64)
        k = cat["keep"]
        np.add.at(out[0], cat["src_o"][k], loss[k])
    num = st["num"]
    if num is not None:
        if init:
            loss = num["init_loss"]
        else:
            contrib = num["lossflat"] * w[num["colsrc"]]
            scores = np.add.reduceat(contrib, num["row_starts"])
            mn = np.minimum.reduceat(scores, num["fact_row_starts"])
            jrow = _seg_first_arg(mn, scores, num["fact_row_starts"],
                                  num["m_per_fact"], is_min=True)
            j_local = jrow - num["fact_row_starts"]
            start = num["block_starts"] + j_local * num["m_per_fact"]
            loss = num["lossflat"][start[num["claim_fact"]]
                                   + num["claim_local"]]
        k = num["keep"]
        np.add.at(out[0], num["src_o"][k], loss[k])


# ---------------------------------------------------------------------------
# TruthFinder
# ---------------------------------------------------------------------------


def build_tf_batch(model, facts):
    """TruthFinder per-shard structures: one value-group struct over ALL
    facts plus flattened pairwise similarity blocks (rows = value groups)
    for facts that have them (sim is None for declared-quantity facts whose
    values failed numeric parse)."""
    if not facts:
        return None

    def groups(fact):
        eq, inv, _sim = model._prep(fact)
        return np.arange(eq.shape[0]), inv   # only sizes matter here

    st = build_cat_struct(list(facts), groups)
    if st is None:
        return None
    # sim blocks: row-major per fact over its value groups
    sim_list, colvg_list = [], []
    has_sim = np.zeros(st["n_vg"], dtype=bool)
    simrow_starts_list = []
    pos = 0
    for fi, fact in enumerate(facts):
        _eq, _inv, sim = model._prep(fact)
        mv = int(st["vg_counts"][fi])
        base = int(st["vgf_starts"][fi])
        if sim is not None and mv:
            sim_list.append(sim.ravel())
            colvg_list.append(np.tile(
                np.arange(base, base + mv, dtype=np.int64), mv))
            simrow_starts_list.append(
                pos + np.arange(mv, dtype=np.int64) * mv)
            has_sim[base:base + mv] = True
            pos += mv * mv
    st["has_sim"] = has_sim
    if sim_list:
        st["simflat"] = np.concatenate(sim_list)
        st["colvg"] = np.concatenate(colvg_list)
        st["simrow_starts"] = np.concatenate(simrow_starts_list)
    else:
        st["simflat"] = None
    return st


def tf_claim_scores_batch(model, st, tau):
    """Per-claim s for the whole shard (one segmented pass) — the batched
    form of TruthFinder._claim_scores."""
    tau_perm = tau[st["src_o"][st["perm"]]]
    sigma_vg = np.add.reduceat(tau_perm, st["vg_starts"]) \
        if st["n_vg"] else np.zeros(0)
    tmp = sigma_vg.copy()
    if st["simflat"] is not None:
        contrib = st["simflat"] * sigma_vg[st["colvg"]]
        simsum = np.add.reduceat(contrib, st["simrow_starts"])
        hs = st["has_sim"]
        coef = 1.0 - model.rho * (1.0 - model.base)
        tmp[hs] = coef * sigma_vg[hs] + model.rho * simsum
    s_vg = 1.0 / (1.0 + np.exp(-model.gamma * tmp))
    return s_vg[st["vg_o"]]


def tf_accumulate_batch(model, st, state, out):
    s_claim = tf_claim_scores_batch(model, st, state["tau"])
    k = st["keep"]
    np.add.at(out[0], st["src_o"][k], s_claim[k])
    np.add.at(out[1], st["src_o"][k], 1.0)


# ---------------------------------------------------------------------------
# CATD (numeric-only: per-fact weighted-mean truth, squared loss)
# ---------------------------------------------------------------------------


def build_catd_batch(model, facts):
    nums = [f for f in facts if f.is_numeric]
    if not nums:
        return None
    src_list, cf_list, val_list, med = [], [], [], []
    counts = []
    for fi, fact in enumerate(nums):
        m = len(fact.src_idx)
        src_list.append(fact.src_idx.astype(np.int64))
        cf_list.append(np.full(m, fi, dtype=np.int64))
        val_list.append(fact.values.astype(np.float64))
        med.append(float(np.median(fact.values)))
        counts.append(m)
    counts = np.asarray(counts, dtype=np.int64)
    src_o = np.concatenate(src_list)
    claim_fact = np.concatenate(cf_list)
    return {
        "src_o": src_o, "claim_fact": claim_fact,
        "values": np.concatenate(val_list),
        "fact_starts": np.concatenate(([0], np.cumsum(counts)[:-1])),
        "median": np.asarray(med),
        "keep": _keep_last_mask(claim_fact, src_o),
    }


def catd_accumulate_batch(model, st, state, out):
    if state["first"]:
        t_f = st["median"]
    else:
        wi = state["w"][st["src_o"]]
        num = np.add.reduceat(wi * st["values"], st["fact_starts"])
        den = np.add.reduceat(wi, st["fact_starts"])
        t_f = num / den
    loss = (st["values"] - t_f[st["claim_fact"]]) ** 2
    k = st["keep"]
    np.add.at(out[0], st["src_o"][k], loss[k])


# ---------------------------------------------------------------------------
# GTM (numeric-only EM; channels 0/1 per source, 2/3 scalar convergence)
# ---------------------------------------------------------------------------


def build_gtm_batch(model, facts):
    nums = [f for f in facts if f.is_numeric]
    rows = []
    for fact in nums:
        prior, sigma_e, cn, ik = model._prep(fact)
        if len(cn):
            rows.append((prior, cn, ik))
    if not rows:
        return None
    src_list, cf_list, cn_list, prior = [], [], [], []
    counts = []
    for fi, (p, cn, ik) in enumerate(rows):
        src_list.append(ik.astype(np.int64))
        cf_list.append(np.full(len(cn), fi, dtype=np.int64))
        cn_list.append(cn.astype(np.float64))
        prior.append(p)
        counts.append(len(cn))
    counts = np.asarray(counts, dtype=np.int64)
    src_o = np.concatenate(src_list)
    claim_fact = np.concatenate(cf_list)
    return {
        "src_o": src_o, "claim_fact": claim_fact,
        "cn": np.concatenate(cn_list),
        "fact_starts": np.concatenate(([0], np.cumsum(counts)[:-1])),
        "prior": np.asarray(prior),
        "keep": _keep_last_mask(claim_fact, src_o),
    }


def _gtm_expect_batch(model, st, sigma):
    s2 = sigma[st["src_o"]] ** 2
    num = (model.mu0 / model.sigma0 ** 2
           + np.add.reduceat(st["cn"] / s2, st["fact_starts"]))
    den = (1.0 / model.sigma0 ** 2
           + np.add.reduceat(1.0 / s2, st["fact_starts"]))
    return num / den


def gtm_accumulate_batch(model, st, state, out):
    r = state["round"]
    if r == 0:
        resid2 = (st["cn"] - st["prior"][st["claim_fact"]]) ** 2
    else:
        t_new = _gtm_expect_batch(model, st, state["sigma"])
        t_old = (st["prior"] if r == 1
                 else _gtm_expect_batch(model, st, state["sigma_prev"]))
        resid2 = (st["cn"] - t_new[st["claim_fact"]]) ** 2
        out[2, 0] += float(np.sum((t_new - t_old) ** 2))
        out[3, 0] += float(np.sum(t_old ** 2))
    k = st["keep"]
    np.add.at(out[0], st["src_o"][k],
              (2 * model.beta + resid2)[k])
    np.add.at(out[1], st["src_o"][k], 1.0)


# ---------------------------------------------------------------------------
# ACCU (100-round Bayesian vote; appearance-order structures)
# ---------------------------------------------------------------------------


def build_accu_batch(model, facts):
    """ACCU per-shard structures.  Faithfulness requires APPEARANCE order,
    not sorted order: observations are (source → last value) pairs in first-
    appearance order (accu.py convert_input), score sums add in obs order
    within each value, and ties pick the FIRST-inserted value.  The
    all-scores ≤ −1 sentinel (best_v stays the int 0) is kept via a
    precomputed zero-value group per fact.  ``vg_values`` records each value
    group's claimed value (insertion order) for the emit kernel."""
    from trustfuse_ray.fuse.accu import fact_observations

    if not facts:
        return None
    src_list, vg_list, cf_list = [], [], []
    vg_counts, zero_vg, nobs, val_list = [], [], [], []
    base = 0
    for fi, fact in enumerate(facts):
        obs = fact_observations(fact)
        vids: dict = {}
        z = -1
        for s, v in obs:
            if v not in vids:
                vids[v] = len(vids)
                val_list.append(v)
                try:
                    if v == 0:
                        z = vids[v]
                except Exception:
                    pass
            src_list.append(s)
            vg_list.append(base + vids[v])
            cf_list.append(fi)
        vg_counts.append(len(vids))
        zero_vg.append(base + z if z >= 0 else -1)
        nobs.append(len(obs))
        base += len(vids)
    src_o = np.asarray(src_list, dtype=np.int64)
    vg_o = np.asarray(vg_list, dtype=np.int64)
    claim_fact = np.asarray(cf_list, dtype=np.int64)
    vg_counts = np.asarray(vg_counts, dtype=np.int64)
    perm = np.argsort(vg_o, kind="stable")
    vg_starts = np.searchsorted(vg_o[perm], np.arange(base))
    vgf_starts = np.concatenate(([0], np.cumsum(vg_counts)[:-1]))
    return {
        "src_o": src_o, "vg_o": vg_o, "claim_fact": claim_fact,
        "perm": perm, "vg_starts": vg_starts,
        "vgf_starts": vgf_starts, "vg_counts": vg_counts,
        "zero_vg": np.asarray(zero_vg, dtype=np.int64),
        "single": vg_counts == 1,      # n_distinct == 1 facts
        "n_dist_claim": vg_counts[claim_fact],
        "n_vg": base,
        "vg_values": np.array(val_list, dtype=object),
    }


def accu_accumulate_batch(model, st, state, out):
    acc = state["acc"]
    # per-obs log term (n>1 facts); n==1 facts score 1.0 (assignment quirk)
    nd = st["n_dist_claim"].astype(np.float64)
    term = np.log(np.maximum(nd - 1.0, 1.0) * acc[st["src_o"]]
                  / (1.0 - acc[st["src_o"]]))
    s_vg = np.add.reduceat(term[st["perm"]], st["vg_starts"]) \
        if st["n_vg"] else np.zeros(0)
    # winner per fact: first-inserted value with max score, only if > -1
    mx = np.maximum.reduceat(s_vg, st["vgf_starts"])
    win = _seg_first_arg(mx, s_vg, st["vgf_starts"], st["vg_counts"],
                         is_min=False)
    none_win = mx <= -1.0
    win = np.where(none_win, st["zero_vg"], win)   # sentinel: int 0 truth
    win = np.where(st["single"], st["vgf_starts"], win)  # n==1: the value
    correct = (st["vg_o"] == win[st["claim_fact"]]).astype(np.float64)
    np.add.at(out[0], st["src_o"], correct)
    np.add.at(out[1], st["src_o"], 1.0)


def slimfast_accumulate_batch(model, st, state, out):
    """SLiMFast shares ACCU's appearance-order structures; its vote has NO
    ≤−1 sentinel — the winner is always the first-inserted max-score value
    (Python ``max`` over the insertion-ordered dict, slimfast.py:140)."""
    acc = state["acc"]
    nd = st["n_dist_claim"].astype(np.float64)
    term = np.log(np.maximum(nd - 1.0, 1.0) * acc[st["src_o"]]
                  / (1.0 - acc[st["src_o"]]))
    s_vg = np.add.reduceat(term[st["perm"]], st["vg_starts"]) \
        if st["n_vg"] else np.zeros(0)
    mx = np.maximum.reduceat(s_vg, st["vgf_starts"])
    win = _seg_first_arg(mx, s_vg, st["vgf_starts"], st["vg_counts"],
                         is_min=False)
    win = np.where(st["single"], st["vgf_starts"], win)
    correct = (st["vg_o"] == win[st["claim_fact"]]).astype(np.float64)
    np.add.at(out[0], st["src_o"], correct)
    np.add.at(out[1], st["src_o"], 1.0)


# ---------------------------------------------------------------------------
# Batched final emit (fact_truth + winner-claim lineage as segmented passes)
# ---------------------------------------------------------------------------
#
# `_emit_facts`'s per-fact loop (model.fact_truth + an inner winner scan per
# emitted value) was the last per-fact Python in the session hot path.  The
# models below opt in via ``emit_batch``; the winning value, confidence and
# first-asserting-claim lineage all come out of the same segmented-numpy
# machinery the round kernels use, so the emitted truth is consistent with
# the batched round path by construction (one canonical summation order).


def _emit_meta(facts):
    """Per-fact metadata + claim-level flats shared by all emit kernels."""
    m = np.asarray([len(f.claim_ids) for f in facts], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(m)[:-1])) if len(m) else \
        np.zeros(0, dtype=np.int64)
    return {
        "entity": np.array([f.entity for f in facts], dtype=object),
        "attr": np.array([f.attr for f in facts], dtype=object),
        "vtype": np.array([f.vtype for f in facts], dtype=object),
        "m": m, "starts": starts,
        "cids": (np.concatenate([f.claim_ids for f in facts])
                 if len(m) else np.zeros(0, dtype=np.int64)),
    }


def _winner_cids(hit, meta):
    """claim_id of the FIRST hit claim per fact segment; -1 if none
    (the _emit_facts winner-scan, segmented)."""
    if not len(meta["m"]):
        return np.zeros(0, dtype=np.int64)
    cand = np.where(hit, np.arange(len(hit), dtype=np.int64), _BIG)
    first = np.minimum.reduceat(cand, meta["starts"])
    miss = first == _BIG
    out = meta["cids"][np.where(miss, 0, first)]
    out[miss] = -1
    return out


def _emit_rows(bid, meta, values, conf, win_cid, numeric):
    """Assemble the _emit_facts output schema for one homogeneous subset."""
    import pyarrow as pa

    from trustfuse_ray.fuse.base import _fmt_num

    n = len(conf)
    if numeric:
        vnum = np.asarray(values, dtype=np.float64)
        vstr = pa.array([_fmt_num(v) for v in vnum.tolist()], pa.string())
        vnum_arr = pa.array(vnum, pa.float64())
    else:
        vstr = pa.array(values.tolist(), pa.string())
        vnum_arr = pa.nulls(n, pa.float64())
    return pa.table({
        "bucket_id": pa.array(np.full(n, bid, dtype=np.int32)),
        "entity": pa.array(meta["entity"].tolist(), pa.string()),
        "attr": pa.array(meta["attr"].tolist(), pa.string()),
        "value_str": vstr,
        "value_num": vnum_arr,
        "value_type": pa.array(meta["vtype"].tolist(), pa.string()),
        "conf": pa.array(np.asarray(conf, dtype=np.float64)),
        "n_claims": pa.array(meta["m"].astype(np.int32)),
        "winner_claim_id": pa.array(win_cid, pa.int64()),
    })


def _concat_emit(tables):
    import pyarrow as pa

    tables = [t for t in tables if t is not None and len(t)]
    if not tables:
        return None
    return pa.concat_tables(tables)


def crh_prepare_emit(model, facts, bid, cache):
    """Build (and cache) CRH's emit metadata for one bucket.  Shard actors
    call this during the SAME streaming pass that builds the round structs,
    so the final emit never has to re-parse Facts from the Arrow tables."""
    key = model.batch_key()
    structs = cache.setdefault(key, {})
    st = structs.get(bid)
    if st is None:
        st = structs[bid] = model.build_batch(facts)
    emeta = cache.setdefault(("emit",) + key, {})
    em = emeta.get(bid)
    if em is None:
        cats = [f for f in facts if not f.is_numeric]
        nums = [f for f in facts if f.is_numeric]
        vg_values = None
        if st["cat"] is not None:
            vg_values = np.empty(st["cat"]["n_vg"], dtype=object)
            for fi, fact in enumerate(cats):
                uniq = model._prep(fact)[2]
                s0 = st["cat"]["vgf_starts"][fi]
                vg_values[s0:s0 + len(uniq)] = uniq
        em = emeta[bid] = {
            "cat_meta": _emit_meta(cats), "num_meta": _emit_meta(nums),
            "vg_values": vg_values,
            "vn_flat": (np.concatenate([f.values for f in nums])
                        if nums else np.zeros(0)),
        }
    return st, em


def crh_emit_batch(model, facts, state, bid, cache):
    """CRH truth emission over one bucket's facts, reusing the cached round
    structs (build_crh_batch) — categorical argmax / numeric argmin with the
    SAME reduceat summation order as crh_accumulate_batch."""
    st, em = crh_prepare_emit(model, facts, bid, cache)
    w = state["w"]
    out = []
    cat = st["cat"]
    if cat is not None:
        wi = w[cat["src_o"][cat["perm"]]]
        s_vg = np.add.reduceat(wi, cat["vg_starts"])
        mx = np.maximum.reduceat(s_vg, cat["vgf_starts"])
        j = _seg_first_arg(mx, s_vg, cat["vgf_starts"], cat["vg_counts"],
                           is_min=False)
        tot = np.add.reduceat(s_vg, cat["vgf_starts"])
        conf = np.where(tot > 0, mx / np.where(tot > 0, tot, 1.0), 0.0)
        hit = cat["vg_o"] == j[cat["claim_fact"]]
        win = _winner_cids(hit, em["cat_meta"])
        out.append(_emit_rows(bid, em["cat_meta"], em["vg_values"][j],
                              conf, win, numeric=False))
    num = st["num"]
    if num is not None:
        contrib = num["lossflat"] * w[num["colsrc"]]
        scores = np.add.reduceat(contrib, num["row_starts"])
        mn = np.minimum.reduceat(scores, num["fact_row_starts"])
        jrow = _seg_first_arg(mn, scores, num["fact_row_starts"],
                              num["m_per_fact"], is_min=True)
        v = em["vn_flat"][jrow]
        conf = 1.0 / (1.0 + mn)
        hit = em["vn_flat"] == np.repeat(v, num["m_per_fact"])
        win = _winner_cids(hit, em["num_meta"])
        out.append(_emit_rows(bid, em["num_meta"], v, conf, win,
                              numeric=True))
    return _concat_emit(out)


def tf_prepare_emit(model, facts, bid, cache):
    """Cache TruthFinder's emit metadata (see crh_prepare_emit)."""
    key = model.batch_key()
    structs = cache.setdefault(key, {})
    st = structs.get(bid)
    if st is None:
        st = structs[bid] = model.build_batch(facts)
    if st is None:
        return None, None
    emeta = cache.setdefault(("emit",) + key, {})
    em = emeta.get(bid)
    if em is None:
        meta = _emit_meta(list(facts))
        em = emeta[bid] = {
            "meta": meta,
            "is_num": np.array([f.is_numeric for f in facts], dtype=bool),
            "vals": (np.concatenate(
                [np.asarray(f.values, dtype=object) for f in facts])
                if len(meta["m"]) else np.zeros(0, dtype=object)),
        }
    return st, em


def tf_emit_batch(model, facts, state, bid, cache):
    """TruthFinder emission: per-claim scores from the cached batched
    machinery (tau_prev), first-argmax claim per fact, winner = first claim
    asserting the same distinct value."""
    st, em = tf_prepare_emit(model, facts, bid, cache)
    if st is None:
        return None
    meta = em["meta"]
    s = tf_claim_scores_batch(model, st, state["tau_prev"])
    mx = np.maximum.reduceat(s, meta["starts"])
    j = _seg_first_arg(mx, s, meta["starts"], meta["m"], is_min=False)
    vg_win = st["vg_o"][j]
    hit = st["vg_o"] == vg_win[st["claim_fact"]]
    win = _winner_cids(hit, meta)
    vals_j = em["vals"][j]
    isn = em["is_num"]
    out = []
    if (~isn).any():
        sel = ~isn
        sub = {k: meta[k][sel] for k in ("entity", "attr", "vtype", "m")}
        sub_vals = np.array([str(v) for v in vals_j[sel]], dtype=object)
        out.append(_emit_rows(bid, sub, sub_vals, mx[sel], win[sel],
                              numeric=False))
    if isn.any():
        sub = {k: meta[k][isn] for k in ("entity", "attr", "vtype", "m")}
        out.append(_emit_rows(bid, sub, vals_j[isn].astype(np.float64),
                              mx[isn], win[isn], numeric=True))
    return _concat_emit(out)


def voting_emit_batch(model, facts, state, bid, cache):
    """Voting emission: categorical mode (tie → lexicographically smallest)
    and numeric median, both as segmented passes."""
    ekey = ("emit", "voting")
    emeta = cache.setdefault(ekey, {})
    em = emeta.get(bid)
    cats = [f for f in facts if not f.is_numeric]
    nums = [f for f in facts if f.is_numeric]
    if em is None:
        def groups(fact):
            return np.unique(fact.values.astype(str), return_inverse=True)

        cat = build_cat_struct(cats, groups)
        vg_values = None
        if cat is not None:
            vg_values = np.empty(cat["n_vg"], dtype=object)
            for fi, fact in enumerate(cats):
                uniq = groups(fact)[0]
                s0 = cat["vgf_starts"][fi]
                vg_values[s0:s0 + len(uniq)] = uniq
        em = emeta[bid] = {
            "cat": cat, "vg_values": vg_values,
            "cat_meta": _emit_meta(cats), "num_meta": _emit_meta(nums),
            "vn_flat": (np.concatenate([f.values for f in nums])
                        if nums else np.zeros(0)),
        }
    out = []
    cat = em["cat"]
    if cat is not None:
        counts_vg = np.bincount(cat["vg_o"],
                                minlength=cat["n_vg"]).astype(np.float64)
        mx = np.maximum.reduceat(counts_vg, cat["vgf_starts"])
        j = _seg_first_arg(mx, counts_vg, cat["vgf_starts"],
                           cat["vg_counts"], is_min=False)
        meta = em["cat_meta"]
        conf = mx / meta["m"]
        hit = cat["vg_o"] == j[cat["claim_fact"]]
        win = _winner_cids(hit, meta)
        out.append(_emit_rows(bid, meta, em["vg_values"][j], conf, win,
                              numeric=False))
    if nums:
        meta = em["num_meta"]
        vn = em["vn_flat"]
        claim_fact = np.repeat(np.arange(len(meta["m"]), dtype=np.int64),
                               meta["m"])
        order = np.lexsort((vn, claim_fact))
        sv = vn[order]
        lo = meta["starts"] + (meta["m"] - 1) // 2
        hi = meta["starts"] + meta["m"] // 2
        med = 0.5 * (sv[lo] + sv[hi])
        conf = np.ones(len(meta["m"]))
        hit = vn == np.repeat(med, meta["m"])
        win = _winner_cids(hit, meta)
        out.append(_emit_rows(bid, meta, med, conf, win, numeric=True))
    return _concat_emit(out)


# ---------------------------------------------------------------------------
# Batched emit for the remaining non-Gibbs models (ACCU / SLiMFast / GTM /
# CATD / KDEm) — closes the last per-fact Python loop in the session paths.
# CATD and KDEm keep their per-fact truth MATH (BLAS dot / kernel-matrix
# replay) bitwise-identical to fact_truth — their weights are sum-order
# sensitive (see the CATD round-kernel note) — while winner lineage and row
# assembly run segmented like everything else.
# ---------------------------------------------------------------------------


def _emit_values_split(bid, meta, is_num, truth, conf, win, keep=None):
    """Assemble emit rows from per-fact object-valued truths, split into the
    string and numeric subsets (the _emit_facts output schema emits value_num
    only for numeric facts)."""
    if keep is None:
        keep = np.ones(len(is_num), dtype=bool)
    out = []
    sel = keep & ~is_num
    if sel.any():
        sub = {k: meta[k][sel] for k in ("entity", "attr", "vtype", "m")}
        vals = np.array([str(v) for v in truth[sel]], dtype=object)
        out.append(_emit_rows(bid, sub, vals, conf[sel], win[sel],
                              numeric=False))
    sel = keep & is_num
    if sel.any():
        sub = {k: meta[k][sel] for k in ("entity", "attr", "vtype", "m")}
        out.append(_emit_rows(bid, sub, truth[sel].astype(np.float64),
                              conf[sel], win[sel], numeric=True))
    return _concat_emit(out)


def _bayes_emit_meta(facts, cache, ekey, bid):
    emeta = cache.setdefault(ekey, {})
    em = emeta.get(bid)
    if em is None:
        meta = _emit_meta(list(facts))
        em = emeta[bid] = {
            "meta": meta,
            "is_num": np.array([f.is_numeric for f in facts], dtype=bool),
            "vals": (np.concatenate(
                [np.asarray(f.values, dtype=object) for f in facts])
                if len(meta["m"]) else np.zeros(0, dtype=object)),
        }
    return em


def bayes_prepare_emit(model, facts, bid, cache):
    """Cache ACCU/SLiMFast emit metadata (see crh_prepare_emit)."""
    key = model.batch_key()
    structs = cache.setdefault(key, {})
    st = structs.get(bid)
    if st is None:
        st = structs[bid] = model.build_batch(facts)
    if st is None:
        return None, None
    return st, _bayes_emit_meta(facts, cache, ("emit",) + key, bid)


def bayes_emit_batch(model, facts, state, bid, cache, *, none_sentinel):
    """Shared ACCU/SLiMFast emission: the winning value group per fact from
    the cached appearance-order structs, with the SAME segmented score sums
    as the round kernels.  ``none_sentinel=True`` (ACCU) drops facts whose
    scores are all ≤ −1 — fact_truth returns [None] for those and the loop
    emitter skips them (accu.py:110-116)."""
    st, em = bayes_prepare_emit(model, facts, bid, cache)
    if st is None:
        return None
    meta = em["meta"]
    acc = state["acc"]
    nd = st["n_dist_claim"].astype(np.float64)
    term = np.log(np.maximum(nd - 1.0, 1.0) * acc[st["src_o"]]
                  / (1.0 - acc[st["src_o"]]))
    s_vg = np.add.reduceat(term[st["perm"]], st["vg_starts"]) \
        if st["n_vg"] else np.zeros(0)
    mx = np.maximum.reduceat(s_vg, st["vgf_starts"])
    win_vg = _seg_first_arg(mx, s_vg, st["vgf_starts"], st["vg_counts"],
                            is_min=False)
    win_vg = np.where(st["single"], st["vgf_starts"], win_vg)
    truth = st["vg_values"][win_vg]
    hit = em["vals"] == np.repeat(truth, meta["m"])
    win = _winner_cids(hit, meta)
    keep = None
    if none_sentinel:
        keep = st["single"] | (mx > -1.0)
    conf = np.ones(len(meta["m"]))
    return _emit_values_split(bid, meta, em["is_num"], truth, conf, win,
                              keep)


def _num_emit_meta(facts, cache, ekey, bid, extra=None):
    """Numeric-model emit meta: flats + optional per-fact extras built by
    ``extra(fact) -> dict of lists appended``."""
    emeta = cache.setdefault(ekey, {})
    em = emeta.get(bid)
    if em is None:
        nums = [f for f in facts if f.is_numeric]
        meta = _emit_meta(nums)
        em = {
            "meta": meta,
            "vn_flat": (np.concatenate(
                [np.asarray(f.values, dtype=np.float64) for f in nums])
                if nums else np.zeros(0)),
        }
        if extra is not None:
            em.update(extra(nums))
        emeta[bid] = em
    return em


def _snap_emit(model, bid, em, t, conf=None):
    """Snap per-fact truth ``t`` to the nearest claimed value (numpy argmin
    first-occurrence) and emit with first-asserting-claim lineage."""
    meta = em["meta"]
    if not len(meta["m"]):
        return None
    d = np.abs(em["vn_flat"] - np.repeat(t, meta["m"]))
    mn = np.minimum.reduceat(d, meta["starts"])
    j = _seg_first_arg(mn, d, meta["starts"], meta["m"], is_min=True)
    v = em["vn_flat"][j]
    hit = em["vn_flat"] == np.repeat(v, meta["m"])
    win = _winner_cids(hit, meta)
    if conf is None:
        conf = np.ones(len(meta["m"]))
    return _emit_rows(bid, meta, v, conf, win, numeric=True)


def gtm_prepare_emit(model, facts, bid, cache):
    """Cache GTM emit metadata (see crh_prepare_emit)."""
    def extra(nums):
        prior, sige, cns, iks, kcnt = [], [], [], [], []
        for f in nums:
            p, se, cn, ik = model._prep(f)
            prior.append(p)
            sige.append(se)
            cns.append(np.asarray(cn, dtype=np.float64))
            iks.append(np.asarray(ik, dtype=np.int64))
            kcnt.append(len(cn))
        kcnt = np.asarray(kcnt, dtype=np.int64)
        return {
            "prior": np.asarray(prior), "sigma_e": np.asarray(sige),
            "cn": (np.concatenate(cns) if cns else np.zeros(0)),
            "ik": (np.concatenate(iks) if iks
                   else np.zeros(0, dtype=np.int64)),
            "kcnt": kcnt,
            "kstarts": (np.concatenate(([0], np.cumsum(kcnt)[:-1]))
                        if len(kcnt) else np.zeros(0, dtype=np.int64)),
        }

    return _num_emit_meta(facts, cache, ("emit",) + model.batch_key(), bid,
                          extra)


def gtm_emit_batch(model, facts, state, bid, cache):
    """GTM emission: truth = expectation under sigma_{R-1} (the reference's
    last in-loop truth), de-normalized and snapped to the nearest ORIGINAL
    claim (outliers included) — gtm.py:115-126 semantics, segmented."""
    em = gtm_prepare_emit(model, facts, bid, cache)
    if not len(em["meta"]["m"]):
        return None
    sigma = state["sigma_prev"] if state["sigma_prev"] is not None \
        else state["sigma"]
    t = em["prior"].copy()
    if sigma is not None and len(em["cn"]):
        s2 = sigma[em["ik"]] ** 2
        nfacts = len(em["kcnt"])
        segn = np.zeros(nfacts)
        segd = np.zeros(nfacts)
        nz = em["kcnt"] > 0
        if nz.any():
            segn[nz] = np.add.reduceat(em["cn"] / s2, em["kstarts"][nz])
            segd[nz] = np.add.reduceat(1.0 / s2, em["kstarts"][nz])
        tk = ((model.mu0 / model.sigma0 ** 2 + segn)
              / (1.0 / model.sigma0 ** 2 + segd))
        t = np.where(nz, tk * em["sigma_e"] + em["prior"], em["prior"])
    return _snap_emit(model, bid, em, t)


def catd_emit_batch(model, facts, state, bid, cache):
    """CATD emission: per-fact weighted-mean truth with the EXACT per-fact
    BLAS dot fact_truth uses (sum-order parity; see the round-kernel note),
    snapped to the nearest claimed value with segmented lineage."""
    def extra(nums):
        return {
            "vals": [np.asarray(f.values, dtype=np.float64) for f in nums],
            "srcs": [np.asarray(f.src_idx, dtype=np.int64) for f in nums],
            "median": np.asarray([float(np.median(f.values))
                                  for f in nums]),
        }

    em = _num_emit_meta(facts, cache, ("emit", "catd"), bid, extra)
    if not len(em["meta"]["m"]):
        return None
    if state["first"]:
        t = em["median"]
    else:
        w = state["w"]
        t = np.asarray([float(np.dot(w[s], v) / w[s].sum())
                        for s, v in zip(em["srcs"], em["vals"])])
    return _snap_emit(model, bid, em, t)


def kdem_emit_batch(model, facts, state, bid, cache):
    """KDEm emission: per-fact opinion-weight replay (kernel-matrix math is
    inherently per fact and bitwise-matches fact_truth), then the published-
    KDEm max-density claim, with segmented lineage/assembly."""
    from types import SimpleNamespace

    def extra(nums):
        return {
            "vals": [np.asarray(f.values, dtype=np.float64) for f in nums],
            "srcs": [np.asarray(f.src_idx, dtype=np.int64) for f in nums],
        }

    em = _num_emit_meta(facts, cache, ("emit", "kdem"), bid, extra)
    meta = em["meta"]
    if not len(meta["m"]):
        return None
    c_hist = state["c_hist"][:-1]
    vs = np.empty(len(meta["m"]))
    confs = np.empty(len(meta["m"]))
    for i, (v, s) in enumerate(zip(em["vals"], em["srcs"])):
        shim = SimpleNamespace(values=v, src_idx=s)
        w, _nm = model._replay_w(shim, c_hist)
        K = model._kernel_matrix(v)
        density = K @ w
        j = int(np.argmax(density))
        vs[i] = float(v[j])
        confs[i] = float(w[j])
    hit = em["vn_flat"] == np.repeat(vs, meta["m"])
    win = _winner_cids(hit, meta)
    return _emit_rows(bid, meta, vs, confs, win, numeric=True)
