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

    # -- round-invariant per-fact precomputation --------------------------
    def _prep(self, fact: Fact):
        """(eq, inv, sim) for a fact — depends only on the claim values,
        which never change across rounds, so it is computed once per fact
        and memoized on ``fact.cache`` (the pairwise Jaro matrix was the
        O(m² × rounds) hot spot; now O(m²) once)."""
        key = ("tf", self.base)
        prep = fact.cache.get(key)
        if prep is not None:
            return prep
        vals = fact.values if fact.is_numeric else fact.values.astype(str)
        claim_set, inv = np.unique(vals, return_inverse=True)
        m = len(claim_set)
        eq = np.zeros((m, len(vals)), dtype=np.float64)
        eq[inv, np.arange(len(vals))] = 1.0
        if fact.vtype == "quantity" and fact.is_numeric:
            # includes the k == j term (reference quirk, truthfinder.py:94)
            sim = np.exp(-np.abs(claim_set[None, :] - claim_set[:, None])) \
                - self.base
        elif fact.vtype in ("string", "entity"):
            # excludes k == j (truthfinder.py:87-92): zero diagonal
            sim = np.zeros((m, m))
            for j in range(m):
                sj = str(claim_set[j])
                for k in range(j + 1, m):
                    v = np.exp(-jaro_similarity(sj, str(claim_set[k]))) \
                        - self.base
                    sim[j, k] = sim[k, j] = v
        else:
            sim = None  # other declared types: tmp stays sigma
        prep = fact.cache[key] = (eq, inv, sim)
        return prep

    # -- update_claim for one fact (truthfinder.py:57-100) ----------------
    def _claim_scores(self, fact: Fact, tau: np.ndarray) -> np.ndarray:
        eq, inv, sim = self._prep(fact)
        sigma = eq @ tau[fact.src_idx]  # per distinct value: Σ supporter tau
        if sim is None:
            tmp = sigma
        else:
            tmp = ((1 - self.rho * (1 - self.base)) * sigma
                   + self.rho * (sim @ sigma))
        s_distinct = 1.0 / (1.0 + np.exp(-self.gamma * tmp))
        return s_distinct[inv]  # scatter back to claims

    def accumulate(self, fact: Fact, state, out):
        s = self._claim_scores(fact, state["tau"])
        # reference fancy-index collapse (truthfinder.py:48-49): a source
        # appearing twice in a fact contributes only its LAST claim's s
        out[0][fact.src_idx] = out[0][fact.src_idx] + s
        out[1][fact.src_idx] = out[1][fact.src_idx] + 1.0

    # -- batched shard kernel (fuse/vectorized.py) ------------------------
    def batch_key(self):
        return ("tf", self.base, self.rho, self.gamma)

    def build_batch(self, facts):
        from trustfuse_ray.fuse import vectorized as V

        return V.build_tf_batch(self, facts)

    def accumulate_batch(self, st, state, out):
        from trustfuse_ray.fuse import vectorized as V

        V.tf_accumulate_batch(self, st, state, out)

    def prepare_emit(self, facts, bid, cache):
        from trustfuse_ray.fuse import vectorized as V

        V.tf_prepare_emit(self, facts, bid, cache)

    def emit_batch(self, facts, state, bid, cache):
        from trustfuse_ray.fuse import vectorized as V

        return V.tf_emit_batch(self, facts, state, bid, cache)

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
