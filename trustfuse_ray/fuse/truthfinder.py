"""TruthFinder, faithful to
`/root/reference/trustfuse/models/truthfinder.py:8-100`
(settings.py: max_itr=10; rho=0.5, gamma=0.3, base_threshold=0).

Round r: s_set = update_claim(tau_{r-1});  tau_r = update_source(s_set).
Claim confidence s is a pure function of tau, so the distributed rounds only
exchange per-source (Σs, count) partials (channels s0, s1).  The final truth
uses the s_set of the LAST update_claim, i.e. computed from tau_{R-1}
(truthfinder.py:30-35) — we keep ``tau_prev`` for that.

Faithful quirks kept:
* tau init = −log(1−0.9) for every source;
* t ≥ 1 → tau = log(1e10) (truthfinder.py:51);
* string/entity cross-value similarity = Jaro, EXCLUDING k == j;
  quantity = exp(−|Δ|) summed over ALL k INCLUDING j (truthfinder.py:87-94);
* no early convergence (err check commented out) — exactly max_itr rounds.
Deterministic deviation: distinct values scanned in sorted order
(reference ``list(set(...))``).
"""

from __future__ import annotations

import numpy as np

from trustfuse_ray.fuse.base import Fact, FusionModel
from trustfuse_ray.functions.similarity import jaro_similarity


class TruthFinder(FusionModel):
    name = "truthfinder"

    def __init__(self, max_itr: int = 10, rho: float = 0.5,
                 gamma: float = 0.3, base_threshold: float = 0.0):
        self.n_rounds = max_itr
        self.rho = rho
        self.gamma = gamma
        self.base = base_threshold

    def initial_state(self, sources, counts):
        n = len(sources)
        tau0 = -np.log(1 - np.ones(n) * 0.9)
        return {"tau": tau0, "tau_prev": tau0.copy()}

    # -- update_claim for one fact (truthfinder.py:57-100) ----------------
    def _claim_scores(self, fact: Fact, tau: np.ndarray) -> np.ndarray:
        ti = tau[fact.src_idx]
        if fact.is_numeric:
            vals = fact.values
            claim_set = np.unique(vals)
            eq = vals[None, :] == claim_set[:, None]  # distinct x claims
        else:
            vals = fact.values.astype(str)
            claim_set = np.unique(vals)
            eq = vals[None, :] == claim_set[:, None]
        sigma = eq @ ti  # per distinct value: Σ tau of supporting sources
        tmp = sigma.copy()
        m = len(claim_set)
        if fact.vtype == "quantity" and fact.is_numeric:
            # includes k == j term (reference quirk)
            sim = np.exp(-np.abs(claim_set[None, :] - claim_set[:, None]))
            tmp = ((1 - self.rho * (1 - self.base)) * sigma
                   + self.rho * ((sim - self.base) @ sigma))
        elif fact.vtype in ("string", "entity"):
            for j in range(m):
                loss_sum = 0.0
                for k in range(m):
                    if k != j:
                        loss_sum += sigma[k] * (
                            np.exp(-jaro_similarity(str(claim_set[j]),
                                                    str(claim_set[k])))
                            - self.base)
                tmp[j] = ((1 - self.rho * (1 - self.base)) * sigma[j]
                          + self.rho * loss_sum)
        # other declared types: tmp stays sigma (reference leaves tmp_i copy)
        s_distinct = 1.0 / (1.0 + np.exp(-self.gamma * tmp))
        # scatter back to claims
        s = np.zeros(len(vals))
        for j in range(m):
            s[eq[j]] = s_distinct[j]
        return s

    def accumulate(self, fact: Fact, state, out):
        s = self._claim_scores(fact, state["tau"])
        # reference fancy-index collapse (truthfinder.py:48-49): a source
        # appearing twice in a fact contributes only its LAST claim's s
        out[0][fact.src_idx] = out[0][fact.src_idx] + s
        out[1][fact.src_idx] = out[1][fact.src_idx] + 1.0

    def reduce(self, state, stats, counts, round_no):
        t = np.zeros_like(stats[0])
        mask = stats[1] > 0
        t[mask] = stats[0][mask] / stats[1][mask]
        tau = np.zeros_like(t)
        hi = t >= 1
        tau[hi] = np.log(1e10)
        tau[~hi] = -np.log(1 - t[~hi])
        return {"tau": tau, "tau_prev": state["tau"]}, False

    def fact_truth(self, fact: Fact, state):
        # truth = claim with max s from the LAST update_claim (tau_prev)
        s = self._claim_scores(fact, state["tau_prev"])
        j = int(np.argmax(s))
        v = fact.values[j]
        return [float(v) if fact.is_numeric else str(v)], float(s[j])

    def weights(self, state):
        return state["tau"]
