"""SLiMFast — discriminative source-accuracy estimation, per
`/root/reference/trustfuse/models/slimfast.py:7-181`.

Reference behavior with default features (the shipped configuration,
slimfast.py:91): EVERY source shares the single feature "w", so all source
accuracies collapse to σ(w_feat) after the first update; per-source random
init U(0.7, 0.99) (slimfast.py:102) only matters in round 1's truth votes.
Truth assignment is the ACCU-style Bayesian vote with Python-max tie-break
(first max in value first-appearance order, slimfast.py:122-140).

Documented deviation: the reference applies the logistic-gradient updates
SEQUENTIALLY per observation, re-reading w after each (slimfast.py:106-118)
— inherently order-dependent and non-parallel.  The engine uses the batch
gradient with w frozen per round: Δw = α·σ(w)·(n_correct − n_wrong), then
the same L1 shrink (slimfast.py:159-166).  Hash-seeded init, overridable.

Channels: s0 = correct observations, s1 = total observations per source.
"""

from __future__ import annotations

import math

import numpy as np

from trustfuse_ray.fuse.base import Fact, FusionModel
from trustfuse_ray.fuse.accu import fact_observations
from trustfuse_ray.stages.common import fnv64


def seeded_init_acc(bucket_id: int, source: str) -> float:
    rng = np.random.default_rng(fnv64(f"slimfast|{bucket_id}|{source}"))
    return round(float(rng.uniform(0.7, 0.99)), 3)


def slimfast_truth(obs: list[tuple[int, object]], acc: np.ndarray):
    """Bayesian vote; tie-break = Python max (first max in insertion order,
    slimfast.py:140)."""
    distinct = {v for _, v in obs}
    n = len(distinct)
    scores: dict = {}
    for s, v in obs:
        if v not in scores:
            scores[v] = 0.0
        if n == 1:
            scores[v] = 1.0
        else:
            scores[v] += math.log((n - 1) * acc[s] / (1 - acc[s]))
    return max(scores, key=scores.get)


class SLiMFast(FusionModel):
    name = "slimfast"

    def __init__(self, max_itr: int = 10, alpha: float = 0.01,
                 reg: float = 0.01, init_acc: dict | None = None):
        self.n_rounds = max_itr
        self.alpha = alpha
        self.reg = reg
        self.init_acc = init_acc

    def initial_state(self, sources, counts):
        if self.init_acc is not None:
            if isinstance(self.init_acc, dict):
                acc = np.array([self.init_acc[s] for s in sources])
            else:  # scalar pin (e.g. reference head-to-head)
                acc = np.full(len(sources), float(self.init_acc))
        else:
            acc = np.array([seeded_init_acc(0, s) for s in sources])
        return {"acc": acc, "w_feat": 0.0, "w": acc}

    def accumulate(self, fact: Fact, state, out):
        obs = fact_observations(fact)
        truth = slimfast_truth(obs, state["acc"])
        for s, v in obs:
            out[1, s] += 1.0
            if v == truth:
                out[0, s] += 1.0


    # -- batched shard kernel (fuse/vectorized.py) ------------------------
    def batch_key(self):
        return ("slimfast",)

    def build_batch(self, facts):
        from trustfuse_ray.fuse import vectorized as V

        return V.build_accu_batch(self, facts)

    def accumulate_batch(self, st, state, out):
        from trustfuse_ray.fuse import vectorized as V

        V.slimfast_accumulate_batch(self, st, state, out)

    def prepare_emit(self, facts, bid, cache):
        from trustfuse_ray.fuse import vectorized as V

        V.bayes_prepare_emit(self, facts, bid, cache)

    def emit_batch(self, facts, state, bid, cache):
        from trustfuse_ray.fuse import vectorized as V

        return V.bayes_emit_batch(self, facts, state, bid, cache,
                                  none_sentinel=False)

    def reduce(self, state, stats, counts, round_no):
        w = state["w_feat"]
        n_corr = stats[0].sum()
        n_tot = stats[1].sum()
        sig = 1.0 / (1.0 + math.exp(-w))
        w = w + self.alpha * sig * n_corr - self.alpha * sig * (n_tot - n_corr)
        # L1 regularization shrink toward zero (slimfast.py:159-166)
        if w > 0:
            w = max(0.0, w - self.alpha * self.reg)
        elif w < 0:
            w = min(0.0, w + self.alpha * self.reg)
        acc_val = 1.0 / (1.0 + math.exp(-w))
        if acc_val == 1.0:
            acc_val = 0.99
        elif acc_val == 0.0:
            acc_val = 0.01
        acc = np.full_like(state["acc"], acc_val)
        return {"acc": acc, "w_feat": w, "w": acc}, False

    def fact_truth(self, fact: Fact, state):
        obs = fact_observations(fact)
        truth = slimfast_truth(obs, state["acc"])
        return [float(truth) if fact.is_numeric else str(truth)], 1.0
