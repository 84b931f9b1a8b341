"""CATD (numeric-only), faithful to
`/root/reference/trustfuse/models/catd.py:8-62`.

Round r: w = chi2.cdf(0.025, count_s) / Σ(claim−truth_{r-1})² per source
(zero-loss sources → 1e10); truth_r = weighted mean (NOT snapped during
iteration); stop on ‖Δw‖/‖w_old‖ ≤ tol or max_itr.  Final truth snaps to the
nearest claimed value (catd.py:32-33).  chi2 CDF is computed via the
regularized incomplete gamma series (similarity.chi2_cdf) — scipy-free.

Channels: s0 = Σ squared error per source.  ``counts`` is the reference's
per-claim participation count vector (`model.py:178-182`).
"""

from __future__ import annotations

import numpy as np

from trustfuse_ray.fuse.base import Fact, FusionModel
from trustfuse_ray.functions.similarity import chi2_cdf


class CATD(FusionModel):
    name = "catd"
    numeric_only = True

    def __init__(self, max_itr: int = 10, tol: float = 0.1):
        self.n_rounds = max_itr
        self.tol = tol

    def initial_state(self, sources, counts):
        return {"w": np.ones(len(sources)), "first": True}

    def _truth(self, fact: Fact, state) -> float:
        if state["first"]:
            return float(np.median(fact.values))
        wi = state["w"][fact.src_idx]
        return float(np.dot(wi, fact.values) / wi.sum())

    def accumulate(self, fact: Fact, state, out):
        t = self._truth(fact, state)
        # reference fancy-index collapse (catd.py:43)
        out[0][fact.src_idx] = out[0][fact.src_idx] + (fact.values - t) ** 2

    # NOTE: no batched shard kernel on purpose — CATD's per-fact truth uses
    # a BLAS dot whose summation order segmented sums cannot reproduce, and
    # sources with ≈0 loss amplify that last-ulp difference unboundedly in
    # w = chi2/loss (observed 10%+ weight drift on a zero-loss source).
    # The fuse/vectorized.py kernel exists (build_catd_batch) for engines
    # that accept sum-order-normalized weights.

    def reduce(self, state, stats, counts, round_no):
        w_old = state["w"]
        loss = stats[0]
        w = np.empty_like(loss)
        pos = loss > 0
        w[pos] = chi2_cdf(0.025, counts[pos]) / loss[pos]
        w[~pos] = 1e10
        err = np.linalg.norm(w_old - w) / np.linalg.norm(w_old)
        return {"w": w, "first": False}, bool(err <= self.tol)

    def fact_truth(self, fact: Fact, state):
        t = self._truth(fact, state)
        snapped = float(fact.values[int(np.argmin(np.abs(fact.values - t)))])
        return [snapped], 1.0

    def emit_batch(self, facts, state, bid, cache):
        # final-emit only (keeps the per-fact BLAS dot; see the round note)
        from trustfuse_ray.fuse import vectorized as V

        return V.catd_emit_batch(self, facts, state, bid, cache)
