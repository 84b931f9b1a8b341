"""Voting / majority fusion — the reference's truth initialization
(`/root/reference/trustfuse/models/crh.py:92-103`) as a standalone
non-iterative model: per fact, mode of categorical claims (pandas
``mode().iloc[0]`` sorts ties → lexicographically smallest), median of
numeric claims.  SQL-expressible → oracle-checked by the driver.
"""

from __future__ import annotations

import numpy as np

from trustfuse_ray.fuse.base import Fact, FusionModel


def categorical_mode(values: np.ndarray) -> tuple[str, float]:
    """Most frequent value; ties → lexicographically smallest
    (pd.Series.mode sorts its result — reference crh.py:96-98)."""
    uniq, counts = np.unique(values.astype(str), return_counts=True)
    i = int(np.argmax(counts))  # uniq is sorted → first max = lexi smallest
    return str(uniq[i]), counts[i] / len(values)


class Voting(FusionModel):
    name = "voting"
    n_rounds = 0

    def initial_state(self, sources, counts):
        n = len(sources)
        return {"w": np.ones(n) / max(n, 1)}

    def fact_truth(self, fact: Fact, state):
        if fact.is_numeric:
            med = float(np.median(fact.values))
            return [med], 1.0
        v, support = categorical_mode(fact.values)
        return [v], float(support)
