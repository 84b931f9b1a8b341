"""Independently-written sequential oracles replicating the reference
fusion math (SURVEY.md §5 test plan).  Each oracle consumes the reference's
claim-matrix shape — per fact i: ``index[i]`` (source ids) and ``claim[i]``
(claimed values) — and returns (truth per fact, per-source weights), with the
same quirks the engine replicates:

* CRH (`crh.py:8-103`): zero-loss sources get weight 0; numeric loss
  normalized by max(std, eps); exactly max_itr rounds.
* TruthFinder (`truthfinder.py:8-100`): tau cap log(1e10); quantity branch
  includes the k==j similarity term; final truth from the LAST update_claim.
* CATD (`catd.py:8-62`): chi2.cdf(0.025, count)/loss weights; zero-loss →
  1e10; truth snapped to nearest claim at the end only.
* GTM (`gtm.py:7-123`): the secondary sigma outlier ``while`` loop is dead
  code (``np.all(...) is False`` is always False) → single delta0 pass;
  init sigma mixes normalized claims with unnormalized prior truth.
* KDEm (`kdem.py:6-128`): per-fact MAD bandwidth (deterministic stand-in
  for the reference's order-dependent self.h mutation); truth slot = c_vec.
* ACCU (`accu.py:7-134`): per-(source,fact) last-value observation dedup;
  strict-> argmax starting at (-1, 0); accuracies clamped to [0.01, 0.99].

Deterministic conventions shared with the engine: distinct categorical
values are scanned in sorted order; claims keep their given order.
"""

from __future__ import annotations

import math

import numpy as np

from trustfuse_ray.functions.similarity import chi2_cdf, jaro_similarity


def _is_num(claim):
    return claim.dtype.kind == "f"


def voting_truth(claim):
    if _is_num(claim):
        return float(np.median(claim))
    uniq, cnt = np.unique(claim.astype(str), return_counts=True)
    return str(uniq[np.argmax(cnt)])


def crh_fuse(index, claim, n_sources, max_itr=10, eps=0.1):
    truth = [voting_truth(c) for c in claim]
    w = np.ones(n_sources) / n_sources
    for _ in range(max_itr):
        # update_w
        loss = np.zeros(n_sources)
        for idx, c, t in zip(index, claim, truth):
            if _is_num(c):
                loss_i = (c - t) ** 2 / max(np.std(c), eps)
            else:
                loss_i = (c.astype(str) != t).astype(float)
            loss[np.asarray(idx)] = loss[np.asarray(idx)] + loss_i
        tot = loss.sum()
        w = loss.copy()
        if tot > 0:
            w[w > 0] = -np.log(w[w > 0] / tot)
        # update_truth
        truth = []
        for idx, c in zip(index, claim):
            wi = w[np.asarray(idx)]
            if _is_num(c):
                denom = max(np.std(c), eps)
                scores = np.array(
                    [np.sum(wi * ((v - c) ** 2) / denom) for v in c])
                truth.append(float(c[int(np.argmin(scores))]))
            else:
                cs = c.astype(str)
                uniq = np.unique(cs)
                scores = np.array([np.sum(wi * (cs == u)) for u in uniq])
                truth.append(str(uniq[int(np.argmax(scores))]))
    return truth, w


def truthfinder_fuse(index, claim, types, n_sources, max_itr=10, rho=0.5,
                     gamma=0.3, base=0.0):
    tau = -np.log(1 - np.ones(n_sources) * 0.9)

    def update_claim(tau_vec):
        s_set = []
        for idx, c, ty in zip(index, claim, types):
            ti = tau_vec[np.asarray(idx)]
            cs = np.unique(c if _is_num(c) else c.astype(str))
            sigma = np.array(
                [ti[(c if _is_num(c) else c.astype(str)) == v].sum()
                 for v in cs])
            tmp = sigma.copy()
            for j, vj in enumerate(cs):
                if ty == "quantity" and _is_num(c):
                    tmp[j] = ((1 - rho * (1 - base)) * sigma[j]
                              + rho * np.sum(
                                  (np.exp(-np.abs(cs - vj)) - base) * sigma))
                elif ty in ("string", "entity"):
                    ls = sum(sigma[k] * (math.exp(-jaro_similarity(str(vj),
                                                                   str(vk)))
                                         - base)
                             for k, vk in enumerate(cs) if k != j)
                    tmp[j] = (1 - rho * (1 - base)) * sigma[j] + rho * ls
            s = np.zeros(len(c))
            for j, vj in enumerate(cs):
                mask = (c if _is_num(c) else c.astype(str)) == vj
                s[mask] = 1.0 / (1.0 + math.exp(-gamma * tmp[j]))
            s_set.append(s)
        return s_set

    s_set = None
    for _ in range(max_itr):
        s_set = update_claim(tau)
        ssum = np.zeros(n_sources)
        cnt = np.zeros(n_sources)
        for idx, s in zip(index, s_set):
            ssum[np.asarray(idx)] = ssum[np.asarray(idx)] + s
            cnt[np.asarray(idx)] = cnt[np.asarray(idx)] + 1.0
        t = np.zeros(n_sources)
        t[cnt > 0] = ssum[cnt > 0] / cnt[cnt > 0]
        tau = np.where(t >= 1, np.log(1e10), -np.log(np.clip(1 - t, 1e-300,
                                                             None)))
    truth = [c[int(np.argmax(s))] for c, s in zip(claim, s_set)]
    truth = [float(v) if isinstance(v, (float, np.floating)) else str(v)
             for v in truth]
    return truth, tau


def catd_fuse(index, claim, count, n_sources, tol=0.1, max_itr=10):
    truth = np.array([np.median(c) for c in claim])
    w = np.ones(n_sources)
    err, itr = 99.0, 0
    while err > tol and itr < max_itr:
        w_old = w.copy()
        loss = np.zeros(n_sources)
        for idx, c, t in zip(index, claim, truth):
            loss[np.asarray(idx)] = loss[np.asarray(idx)] + (c - t) ** 2
        w = loss.copy()
        pos = w > 0
        w[pos] = chi2_cdf(0.025, count[pos]) / w[pos]
        w[~pos] = 1e10
        truth = np.array(
            [np.dot(w[np.asarray(idx)], c) / np.sum(w[np.asarray(idx)])
             for idx, c in zip(index, claim)])
        err = np.linalg.norm(w_old - w) / np.linalg.norm(w_old)
        itr += 1
    snapped = [float(c[np.abs(c - t).argmin()]) for c, t in zip(claim, truth)]
    return snapped, w


def gtm_prep(claim, index, delta0=1.0):
    """gtm.py:78-123 data_preprocessing with the dead while-loop omitted."""
    priors, sigmas, claims_n, idx_kept = [], [], [], []
    for c, idx in zip(claim, index):
        prior = float(np.median(c))
        keep = np.ones(len(c), dtype=bool)
        if prior != 0:
            keep = np.abs(c - prior) / prior <= delta0
        ck = c[keep]
        ik = np.asarray(idx)[keep]
        priors.append(prior)
        sigmas.append(float(np.std(ck)) if len(ck) else 0.0)
        claims_n.append(ck - prior)
        idx_kept.append(ik)
    return priors, sigmas, claims_n, idx_kept


def gtm_fuse(index, claim, n_sources, tol=1e-3, max_itr=99, alpha=10.0,
             beta=10.0, mu0=0.0, sigma0=1.0):
    priors, sigma_e, cn, ik = gtm_prep(claim, index)

    def maximization(truth):
        num = np.zeros(n_sources)
        cnt = np.zeros(n_sources)
        for c, idx, t in zip(cn, ik, truth):
            num[idx] = num[idx] + 2 * beta + (c - t) ** 2
            cnt[idx] = cnt[idx] + 1.0
        return num / (2 * (alpha + 1) + cnt)

    def expectation(sig):
        truth = []
        for c, idx in zip(cn, ik):
            s2 = sig[idx] ** 2
            tmp = mu0 / sigma0 ** 2 + np.sum(c / s2)
            tmp1 = 1 / sigma0 ** 2 + np.sum(1 / s2)
            truth.append(tmp / tmp1)
        return np.array(truth)

    truth = np.array(priors)  # unnormalized init (reference quirk)
    sigma = maximization(truth)
    err, itr = 99.0, 0
    while err > tol and itr < max_itr:
        itr += 1
        told = truth.copy()
        truth = expectation(sigma)
        sigma = maximization(truth)
        err = np.linalg.norm(truth - told) / np.linalg.norm(told)
    final = truth * np.array(sigma_e) + np.array(priors)
    snapped = [float(c[np.abs(c - t).argmin()]) for c, t in zip(claim, final)]
    return snapped, sigma


def kdem_fuse(index, claim, count, n_sources, tol=1e-5, max_itr=99):
    def mad(x):
        return float(np.median(np.abs(x - np.median(x))) + 1e-10 * np.std(x))

    kernels, hs = [], []
    for c in claim:
        h = mad(c)
        ls = len(c)
        K = np.zeros((ls, ls))
        for j in range(ls):
            x = (c[j] - c) / h if h > 0 else np.zeros(ls)
            K[j] = np.exp(-x ** 2) / np.sqrt(2 * np.pi)
        kernels.append(K)
        hs.append(h)

    def norm_of(K, w):
        t2 = K @ w
        t = np.diag(K) - 2 * t2 + w @ t2
        t[t < 0] = 0
        return t

    def update_c(norms):
        rtn = np.zeros(n_sources)
        for idx, nm in zip(index, norms):
            ai = np.asarray(idx)
            rtn[ai] = rtn[ai] + nm / len(idx)
        tmp = rtn.sum()
        c = rtn.copy()
        if tmp > 0:
            pos = c > 0
            c[pos] = -np.log((c[pos] / count[pos]) / tmp)
        return c, tmp

    w_m = [np.ones(len(c)) / len(c) for c in claim]
    norms = [norm_of(K, w) for K, w in zip(kernels, w_m)]
    c_vec, J = update_c(norms)
    err, itr = 99.0, 1
    while err > tol and itr < max_itr:
        itr += 1
        J_old = J
        w_m = []
        for idx, nm in zip(index, norms):
            wi = np.zeros(len(idx))
            tmp = c_vec[np.asarray(idx)]
            wi[nm > 0] = tmp[nm > 0]
            s = wi.sum()
            if s > 0:
                w_m.append(wi / s)
            else:
                wi[nm == 0] = 1
                w_m.append(wi / wi.sum())
        norms = [norm_of(K, w) for K, w in zip(kernels, w_m)]
        c_vec, J = update_c(norms)
        err = abs((J - J_old) / J_old) if J_old else 0.0
    return c_vec, w_m


def accu_obs(index, claim):
    """Per fact: ordered (source, last-value) observations (accu.py:59-69)."""
    out = []
    for idx, c in zip(index, claim):
        last = {}
        order = []
        for s, v in zip(idx, c):
            if s not in last:
                order.append(s)
            last[s] = v
        out.append([(s, last[s]) for s in order])
    return out


def accu_round_truth(obs_i, acc):
    distinct = []
    for _, v in obs_i:
        if v not in distinct:
            distinct.append(v)
    scores = {}
    for s, v in obs_i:
        if v not in scores:
            scores[v] = 0.0
        if len(set(x for _, x in obs_i)) == 1:
            scores[v] = 1.0
        else:
            scores[v] += math.log(
                (len(set(x for _, x in obs_i)) - 1) * acc[s] / (1 - acc[s]))
    best_v, best = 0, -1.0
    for v, sc in scores.items():
        if sc > best:
            best, best_v = sc, v
    return best_v


def accu_fuse(index, claim, n_sources, init_acc, max_itr=100):
    obs = accu_obs(index, claim)
    acc = np.array(init_acc, dtype=float)
    truth = [None] * len(claim)
    for _ in range(max_itr):
        for i, o in enumerate(obs):
            truth[i] = accu_round_truth(o, acc)
        corr = np.zeros(n_sources)
        tot = np.zeros(n_sources)
        for i, o in enumerate(obs):
            for s, v in o:
                tot[s] += 1
                if v == truth[i]:
                    corr[s] += 1
        acc = corr / np.maximum(tot, 1)
        acc[acc == 1.0] = 0.99
        acc[acc == 0.0] = 0.01
    return truth, acc
