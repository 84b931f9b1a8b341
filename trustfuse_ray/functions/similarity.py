"""Scalar/vector similarity functions (reference: trustfuse/models/utils.py)."""

from __future__ import annotations

import math

import numpy as np


def jaro_similarity(s1: str, s2: str) -> float:
    """Jaro similarity, semantics of
    `/root/reference/trustfuse/models/utils.py:32-68` (named
    ``jaro_distance`` there but computes similarity; used by TruthFinder's
    string branch)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0
    max_dist = math.floor(max(len1, len2) / 2) - 1
    match = 0
    hash1 = [0] * len1
    hash2 = [0] * len2
    for i in range(len1):
        for j in range(max(0, i - max_dist), min(len2, i + max_dist + 1)):
            if s1[i] == s2[j] and hash2[j] == 0:
                hash1[i] = 1
                hash2[j] = 1
                match += 1
                break
    if match == 0:
        return 0.0
    t = 0
    point = 0
    for i in range(len1):
        if hash1[i]:
            while hash2[point] == 0:
                point += 1
            if s1[i] != s2[point]:
                t += 1
            point += 1
    t //= 2
    return (match / len1 + match / len2 + (match - t) / match) / 3.0


def euclidean_distance(v1: np.ndarray, v2: np.ndarray) -> float:
    """`utils.py:27-29` (unused in the reference fusion path; kept for parity)."""
    return float(np.sqrt(np.sum((v1 - v2) ** 2)))


def chi2_cdf(x: float, k: np.ndarray) -> np.ndarray:
    """chi-square CDF via the regularized lower incomplete gamma function
    P(k/2, x/2) (series expansion, Numerical-Recipes-style).  Stands in for
    ``scipy.stats.chi2.cdf`` used by CATD
    (`/root/reference/trustfuse/models/catd.py:45`) — scipy is not available
    in this environment."""
    k = np.asarray(k, dtype=np.float64)
    out = np.zeros_like(k)
    xs = x / 2.0
    for i, kk in np.ndenumerate(k):
        a = kk / 2.0
        if a <= 0 or xs <= 0:
            out[i] = 0.0
            continue
        # series: P(a,x) = x^a e^-x / Γ(a+1) * Σ_{n≥0} x^n / ((a+1)...(a+n))
        term = 1.0 / a
        total = term
        n = 0
        while n < 500:
            n += 1
            term *= xs / (a + n)
            total += term
            if abs(term) < abs(total) * 1e-15:
                break
        log_p = a * math.log(xs) - xs - math.lgamma(a) + math.log(total)
        out[i] = math.exp(log_p)
    return out
