"""KDEm — Kernel Density Estimation from Multiple Sources (numeric-only),
faithful to `/root/reference/trustfuse/models/kdem.py:6-128` with one
documented deviation:

* bandwidth: the reference sets ``self.h = mad(x_i)`` from the FIRST fact it
  happens to process and silently reuses it for every later fact — an
  iteration-order-dependent mutation (kdem.py:52-54) that cannot be
  reproduced deterministically.  We compute h = MAD per fact instead.
* the reference emits the per-source score vector c_vec in the "truth" slot
  (kdem.py:42-45) — we preserve c_vec as the model weights, and emit as each
  fact's triple the claimed value with maximal final opinion weight w_i
  (the usable KDEm truth per the published algorithm); parity tests assert
  on c_vec.

Global state is only c_vec (per source) + objective J; the per-fact opinion
weights w_m are a pure function of the c_vec history, so each round's map
replays the per-fact recursion locally (round r cost O(r·k²) per fact,
k = claims per fact; bounded by max_itr and tiny k).

Channels: s0 = Σ norm/len per source (update_c numerator).
"""

from __future__ import annotations

import numpy as np

from trustfuse_ray.fuse.base import Fact, FusionModel


def _mad(x: np.ndarray) -> float:
    return float(np.median(np.abs(x - np.median(x))) + 1e-10 * np.std(x))


class KDEm(FusionModel):
    name = "kdem"
    numeric_only = True

    def __init__(self, max_itr: int = 99, tol: float = 1e-5,
                 method: str = "Gaussian"):
        self.n_rounds = max_itr
        self.tol = tol
        self.method = method.lower()

    def _kernel(self, x: np.ndarray) -> np.ndarray:
        m = self.method
        if m == "uniform":
            return (np.abs(x) <= 1) / 2
        if m in ("epanechnikov", "ep"):
            return 3 / 4 * (1 - x ** 2) * (np.abs(x) <= 1)
        if m in ("biweight", "bi"):
            return 15 / 16 * (1 - x ** 2) ** 2 * (np.abs(x) <= 1)
        if m in ("triweight", "tri"):
            return 35 / 32 * (1 - x ** 2) ** 3 * (np.abs(x) <= 1)
        if m == "laplace":
            return np.exp(-np.abs(x))
        return np.exp(-x ** 2) / np.sqrt(2 * np.pi)  # gaussian

    def _kernel_matrix(self, v: np.ndarray) -> np.ndarray:
        h = _mad(v)
        ls = len(v)
        if h > 0:
            return self._kernel((v[:, None] - v[None, :]) / h)
        return np.full((ls, ls), float(self._kernel(np.zeros(1))[0]))

    @staticmethod
    def _norm(K: np.ndarray, w: np.ndarray) -> np.ndarray:
        t2 = K @ w
        t = np.diag(K) - 2 * t2 + w @ t2
        t[t < 0] = 0
        return t

    def _replay_w(self, fact: Fact, c_hist: list[np.ndarray]):
        """Reproduce the fact's opinion weights after len(c_hist) updates."""
        K = self._kernel_matrix(fact.values)
        k = len(fact.values)
        w = np.ones(k) / k
        nm = self._norm(K, w)
        for c_vec in c_hist:
            wi = np.zeros(k)
            tmp = c_vec[fact.src_idx]
            wi[nm > 0] = tmp[nm > 0]
            s = wi.sum()
            if s > 0:
                w = wi / s
            else:
                wi[nm == 0] = 1
                w = wi / wi.sum()
            nm = self._norm(K, w)
        return w, nm

    def initial_state(self, sources, counts):
        return {"c_hist": [], "c": np.zeros(len(sources)), "J": None}

    def accumulate(self, fact: Fact, state, out):
        _w, nm = self._replay_w(fact, state["c_hist"])
        # reference fancy-index collapse (kdem.py:106)
        out[0][fact.src_idx] = (out[0][fact.src_idx]
                                + nm / len(fact.src_idx))

    def reduce(self, state, stats, counts, round_no):
        rtn = stats[0]
        tmp = rtn.sum()
        c = rtn.copy()
        if tmp > 0:
            pos = c > 0
            c[pos] = -np.log((c[pos] / counts[pos]) / tmp)
        J_old = state["J"]
        new = {"c_hist": state["c_hist"] + [c], "c": c, "J": tmp}
        if J_old is None or J_old == 0:
            return new, False
        err = abs((tmp - J_old) / J_old)
        return new, bool(err <= self.tol)

    def fact_truth(self, fact: Fact, state):
        # published-KDEm truth: claimed value maximizing the final KDE
        w, _nm = self._replay_w(fact, state["c_hist"][:-1])
        K = self._kernel_matrix(fact.values)
        density = K @ w
        j = int(np.argmax(density))
        return [float(fact.values[j])], float(w[j])

    def emit_batch(self, facts, state, bid, cache):
        # batched assembly around the (inherently per-fact) kernel replay
        from trustfuse_ray.fuse import vectorized as V

        return V.kdem_emit_batch(self, facts, state, bid, cache)

    def weights(self, state):
        return state["c"]
