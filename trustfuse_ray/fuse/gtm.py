"""GTM — Gaussian Truth Model (numeric-only), faithful to
`/root/reference/trustfuse/models/gtm.py:7-123` including its quirks:

* per-fact preprocessing: outliers beyond |v−median|/median > delta0 removed,
  then claims normalized by subtracting the median prior; the secondary
  sigma-based outlier loop is DEAD CODE in the reference
  (``while np.all(outliers) is False`` — ``np.all`` returns np.bool_, never
  the ``False`` singleton) and is therefore omitted;
* init: sigma = maximization(normalized claims, UNnormalized prior truth)
  (gtm.py:27-28 passes prior_truth as the truth argument);
* EM rounds: truth = precision-weighted mean with prior (mu0, sigma0);
  sigma_s = (Σ_claims 2β + resid²) / (2(α+1) + n_claims_kept);
  err = ‖truth−truth_old‖/‖truth_old‖ (truth_old at round 1 is the
  unnormalized prior — faithful);
* final: truth·sigma_e + prior, snapped to the nearest ORIGINAL claim
  (outliers included).

The per-fact preprocessing is deterministic and recomputed inside each
round's map (cheap, keeps rounds stateless).  Channels: s0 = Σ(2β+resid²),
s1 = kept-claim count, s2 = Σ(t_new−t_old)², s3 = Σ t_old².
"""

from __future__ import annotations

import numpy as np

from trustfuse_ray.fuse.base import Fact, FusionModel


class GTM(FusionModel):
    name = "gtm"
    numeric_only = True

    def __init__(self, max_itr: int = 99, tol: float = 1e-3,
                 alpha: float = 10.0, beta: float = 10.0, mu0: float = 0.0,
                 sigma0: float = 1.0, delta0: float = 1.0):
        self.n_rounds = max_itr
        self.tol = tol
        self.alpha = alpha
        self.beta = beta
        self.mu0 = mu0
        self.sigma0 = sigma0
        self.delta0 = delta0

    # -- per-fact preprocessing (gtm.py:78-123, dead loop omitted) --------
    def _prep(self, fact: Fact):
        v = fact.values
        prior = float(np.median(v))
        keep = np.ones(len(v), dtype=bool)
        if prior != 0:
            keep = np.abs(v - prior) / prior <= self.delta0
        vk = v[keep]
        ik = fact.src_idx[keep]
        sigma_e = float(np.std(vk)) if len(vk) else 0.0
        return prior, sigma_e, vk - prior, ik

    def _expect(self, cn: np.ndarray, ik: np.ndarray, sigma: np.ndarray
                ) -> float:
        s2 = sigma[ik] ** 2
        num = self.mu0 / self.sigma0 ** 2 + np.sum(cn / s2)
        den = 1.0 / self.sigma0 ** 2 + np.sum(1.0 / s2)
        return float(num / den)

    def initial_state(self, sources, counts):
        return {"sigma": None, "sigma_prev": None, "round": 0,
                "w": np.zeros(len(sources))}

    def accumulate(self, fact: Fact, state, out):
        prior, sigma_e, cn, ik = self._prep(fact)
        if len(cn) == 0:
            return
        r = state["round"]
        if r == 0:
            # init maximization: truth argument is the UNnormalized prior
            resid2 = (cn - prior) ** 2
            t_new = t_old = 0.0  # convergence channels unused this round
        else:
            t_new = self._expect(cn, ik, state["sigma"])
            if r == 1:
                t_old = prior  # reference: truth var starts as prior_truth
            else:
                t_old = self._expect(cn, ik, state["sigma_prev"])
            resid2 = (cn - t_new) ** 2
            out[2, 0] += (t_new - t_old) ** 2
            out[3, 0] += t_old ** 2
        # reference fancy-index collapse (gtm.py:65-68)
        out[0][ik] = out[0][ik] + 2 * self.beta + resid2
        out[1][ik] = out[1][ik] + 1.0

    # -- batched shard kernel (fuse/vectorized.py) ------------------------
    def batch_key(self):
        return ("gtm", self.delta0, self.mu0, self.sigma0, self.alpha,
                self.beta)

    def build_batch(self, facts):
        from trustfuse_ray.fuse import vectorized as V

        return V.build_gtm_batch(self, facts)

    def accumulate_batch(self, st, state, out):
        from trustfuse_ray.fuse import vectorized as V

        V.gtm_accumulate_batch(self, st, state, out)

    def prepare_emit(self, facts, bid, cache):
        from trustfuse_ray.fuse import vectorized as V

        V.gtm_prepare_emit(self, facts, bid, cache)

    def emit_batch(self, facts, state, bid, cache):
        from trustfuse_ray.fuse import vectorized as V

        return V.gtm_emit_batch(self, facts, state, bid, cache)

    def reduce(self, state, stats, counts, round_no):
        sigma = stats[0] / (2 * (self.alpha + 1) + stats[1])
        new = {"sigma": sigma, "sigma_prev": state["sigma"],
               "round": state["round"] + 1, "w": sigma}
        if round_no == 0:
            return new, False
        denom = np.sqrt(stats[3, 0])
        err = np.sqrt(stats[2, 0]) / denom if denom > 0 else 0.0
        return new, bool(err <= self.tol)

    def fact_truth(self, fact: Fact, state):
        # the reference's final truth is expectation(sigma_{R-1}) — the last
        # truth computed INSIDE the loop, before the trailing maximization
        prior, sigma_e, cn, ik = self._prep(fact)
        sigma = state["sigma_prev"] if state["sigma_prev"] is not None \
            else state["sigma"]
        if len(cn) == 0 or sigma is None:
            t = prior
        else:
            t = self._expect(cn, ik, sigma) * sigma_e + prior
        snapped = float(fact.values[int(np.argmin(np.abs(fact.values - t)))])
        return [snapped], 1.0

    def weights(self, state):
        return state["w"]
