"""CRH conflict resolution, faithful to
`/root/reference/trustfuse/models/crh.py:8-103` (params from
`/root/reference/settings.py:82-85`: max_itr=10; tol/eps defaults 1e-3/0.1).

Math per round r (reference ``_fuse`` loop):
  w   = update_w(truth_{r-1})   — per-source −log normalized loss share
  truth_r = update_truth(w)      — snap-to-claim weighted argmax/argmin
with truth_0 = Voting init (mode/median).  Truth is a pure function of the
weights, so the distributed rounds only exchange the per-source loss sums
(channel s0); truth is recomputed inside each map task.

Faithful quirks kept:
* sources with zero accumulated loss get weight 0 (``rtn[rtn>0]`` mask,
  crh.py:61);
* numeric loss normalized by max(std(claims), eps) per fact;
* no convergence test — exactly max_itr rounds (err check is commented out
  in the reference).
Deterministic tie-break (SURVEY.md §7.5): distinct categorical values are
scanned in sorted order, so argmax ties pick the lexicographically smallest
(the reference's ``list(set(...))`` order is nondeterministic).
"""

from __future__ import annotations

import numpy as np

from trustfuse_ray.fuse.base import Fact, FusionModel
from trustfuse_ray.fuse.voting import categorical_mode


class CRH(FusionModel):
    name = "crh"

    def __init__(self, max_itr: int = 10, eps: float = 0.1):
        self.n_rounds = max_itr
        self.eps = eps

    def initial_state(self, sources, counts):
        n = len(sources)
        return {"w": np.ones(n) / max(n, 1), "use_init_truth": True}

    # -- round-invariant per-fact precomputation --------------------------
    def _prep(self, fact: Fact):
        """Round-invariant per-fact pieces, computed once and memoized on
        ``fact.cache`` (facts live for all rounds of a FusionSession):
        numeric → (init median, candidate loss matrix (v_j−v_i)²/denom);
        categorical → (init mode, sorted distinct values, inverse index,
        support matrix)."""
        key = ("crh", self.eps)
        prep = fact.cache.get(key)
        if prep is not None:
            return prep
        if fact.is_numeric:
            v = fact.values
            denom = max(float(np.std(v)), self.eps)
            # candidates = claimed values in claim order (crh.py:80-86)
            lossmat = ((v[:, None] - v[None, :]) ** 2) / denom
            prep = ("num", float(np.median(v)), lossmat, denom)
        else:
            vals = fact.values.astype(str)
            uniq, inv = np.unique(vals, return_inverse=True)
            eq = np.zeros((len(uniq), len(vals)), dtype=np.float64)
            eq[inv, np.arange(len(vals))] = 1.0
            prep = ("cat", categorical_mode(fact.values)[0], uniq, inv, eq)
        fact.cache[key] = prep
        return prep

    def _update_truth(self, fact: Fact, w):
        wi = w[fact.src_idx]
        prep = self._prep(fact)
        if prep[0] == "num":
            lossmat = prep[2]
            scores = lossmat @ wi
            j = int(np.argmin(scores))
            return float(fact.values[j]), 1.0 / (1.0 + float(scores[j])), j
        _, _, uniq, _inv, eq = prep
        scores = eq @ wi  # uniq sorted → deterministic argmax tie-break
        j = int(np.argmax(scores))
        tot = float(scores.sum())
        return (str(uniq[j]),
                float(scores[j]) / tot if tot > 0 else 0.0, j)

    # -- distributed protocol --------------------------------------------
    def accumulate(self, fact: Fact, state, out):
        prep = self._prep(fact)
        if state["use_init_truth"]:
            if prep[0] == "num":
                _, med, _, denom = prep
                loss = ((fact.values - med) ** 2) / denom
            else:
                _, mode, uniq, inv, _ = prep
                loss = (inv != int(np.searchsorted(uniq, mode))
                        ).astype(np.float64)
        else:
            truth, _, j = self._update_truth(fact, state["w"])
            if prep[0] == "num":
                loss = prep[2][j]  # (v_j − v_i)²/denom row of the winner
            else:
                loss = (prep[3] != j).astype(np.float64)
        # reference pattern rtn[idx] = rtn[idx] + loss (crh.py:49,53):
        # duplicate source indices COLLAPSE to the last occurrence
        out[0][fact.src_idx] = out[0][fact.src_idx] + loss

    # -- batched shard kernel (fuse/vectorized.py) ------------------------
    def batch_key(self):
        return ("crh", self.eps)

    def build_batch(self, facts):
        from trustfuse_ray.fuse import vectorized as V

        return V.build_crh_batch(self, facts)

    def accumulate_batch(self, st, state, out):
        from trustfuse_ray.fuse import vectorized as V

        V.crh_accumulate_batch(self, st, state, out)

    def prepare_emit(self, facts, bid, cache):
        from trustfuse_ray.fuse import vectorized as V

        V.crh_prepare_emit(self, facts, bid, cache)

    def emit_batch(self, facts, state, bid, cache):
        from trustfuse_ray.fuse import vectorized as V

        return V.crh_emit_batch(self, facts, state, bid, cache)

    def reduce(self, state, stats, counts, round_no):
        rtn = stats[0].copy()
        tmp = rtn.sum()
        if tmp > 0:
            mask = rtn > 0
            rtn[mask] = -np.log(rtn[mask] / tmp)
        return {"w": rtn, "use_init_truth": False}, False

    def fact_truth(self, fact: Fact, state):
        v, conf, _ = self._update_truth(fact, state["w"])
        return [v], conf
