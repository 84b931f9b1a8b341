"""ACCU — Bayesian accuracy model, faithful to
`/root/reference/trustfuse/models/accu.py:7-134`:

* observations: one (source → value) per fact, LAST assertion wins
  (``convert_input`` overwrites, accu.py:59-69); observation order = order of
  each source's first appearance in the fact's claims;
* per-fact scores: single distinct value → 1.0, else
  Σ log((n_distinct−1)·a_s/(1−a_s)); truth = first value with score
  strictly greater than all before it, starting from (max=-1, value=0) —
  including the quirk that all-scores ≤ −1 yields integer 0 (accu.py:110-116);
* source accuracy = correct/total vs current truths, clamped 1.0→0.99,
  0.0→0.01; exactly max_itr rounds (default 100);
* init accuracy: the reference draws round(U(0.5,1), 3) UNSEEDED per source
  (accu.py:85) — we hash-seed per (bucket, source) for reproducibility
  (SURVEY.md §7.5), overridable via ``init_acc`` for parity tests.

Channels: s0 = correct count, s1 = total count per source.
"""

from __future__ import annotations

import math

import numpy as np

from trustfuse_ray.fuse.base import Fact, FusionModel
from trustfuse_ray.stages.common import fnv64


def seeded_init_acc(bucket_id: int, source: str) -> float:
    rng = np.random.default_rng(fnv64(f"accu|{bucket_id}|{source}"))
    return round(float(rng.uniform(0.5, 1.0)), 3)


def fact_observations(fact: Fact) -> list[tuple[int, object]]:
    """Ordered (source_idx, last value) pairs (accu.py convert_input)."""
    last: dict[int, object] = {}
    order: list[int] = []
    for s, v in zip(fact.src_idx, fact.values):
        s = int(s)
        if s not in last:
            order.append(s)
        last[s] = v
    return [(s, last[s]) for s in order]


def accu_truth(obs: list[tuple[int, object]], acc: np.ndarray):
    """One fact's inferred truth given source accuracies (accu.py:94-116)."""
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
    best_v, best = 0, -1.0
    for v, sc in scores.items():
        if sc > best:
            best, best_v = sc, v
    return best_v


class Accu(FusionModel):
    name = "accu"

    def __init__(self, max_itr: int = 100, init_acc: dict | None = None):
        self.n_rounds = max_itr
        self.init_acc = init_acc  # {source: acc} override for parity tests

    def initial_state(self, sources, counts):
        if self.init_acc is not None:
            acc = np.array([self.init_acc[s] for s in sources])
        else:
            acc = np.array([seeded_init_acc(0, s) for s in sources])
        return {"acc": acc, "w": acc}

    def accumulate(self, fact: Fact, state, out):
        obs = fact_observations(fact)
        truth = accu_truth(obs, state["acc"])
        for s, v in obs:
            out[1, s] += 1.0
            if v == truth:
                out[0, s] += 1.0

    # -- batched shard kernel (fuse/vectorized.py) ------------------------
    def batch_key(self):
        return ("accu",)

    def build_batch(self, facts):
        from trustfuse_ray.fuse import vectorized as V

        return V.build_accu_batch(self, facts)

    def accumulate_batch(self, st, state, out):
        from trustfuse_ray.fuse import vectorized as V

        V.accu_accumulate_batch(self, st, state, out)

    def prepare_emit(self, facts, bid, cache):
        from trustfuse_ray.fuse import vectorized as V

        V.bayes_prepare_emit(self, facts, bid, cache)

    def emit_batch(self, facts, state, bid, cache):
        from trustfuse_ray.fuse import vectorized as V

        return V.bayes_emit_batch(self, facts, state, bid, cache,
                                  none_sentinel=True)

    def reduce(self, state, stats, counts, round_no):
        tot = np.maximum(stats[1], 1.0)
        acc = stats[0] / tot
        acc[acc == 1.0] = 0.99
        acc[acc == 0.0] = 0.01
        return {"acc": acc, "w": acc}, False

    def fact_truth(self, fact: Fact, state):
        obs = fact_observations(fact)
        truth = accu_truth(obs, state["acc"])
        if truth == 0 and not isinstance(truth, (str, float)):
            return [None], 0.0  # all-scores-below-(-1) reference quirk
        return [float(truth) if fact.is_numeric else str(truth)], 1.0
