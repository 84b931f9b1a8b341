"""Voting / majority fusion — the reference's truth initialization
(`/root/reference/trustfuse/models/crh.py:92-103`) as a standalone
non-iterative model: per fact, mode of categorical claims (pandas
``mode().iloc[0]`` sorts ties → lexicographically smallest), median of
numeric claims.  SQL-expressible → oracle-checked by the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from trustfuse_ray.fuse.base import Fact, FusionModel


def categorical_mode(values: np.ndarray) -> tuple[str, float]:
    """Most frequent value; ties → lexicographically smallest
    (pd.Series.mode sorts its result — reference crh.py:96-98)."""
    uniq, counts = np.unique(values.astype(str), return_counts=True)
    i = int(np.argmax(counts))  # uniq is sorted → first max = lexi smallest
    return str(uniq[i]), counts[i] / len(values)


def salted_categorical_voting(claims, n_parts: int = 64):
    """Skew-proof majority vote for categorical facts as pure vectorized
    aggregates — the SURVEY §7.3 salted two-level reduce: no fact's claims
    ever co-locate in one task until they are already reduced to per-value
    counts (bounded by #distinct values), so a hot entity with millions of
    claims cannot create a straggler.

    claims → distinct (entity, attr, value, source)  [vectorized groupby]
           → per-value distinct-source counts        [vectorized groupby]
           → per-fact winner (max count, tie → lexicographically smallest
             value — same rule as Voting/mode)       [tiny groups]
    Returns (bucket_id, entity, attr, value_str, n_votes).
    """
    import functools

    import pyarrow.compute as pc

    from trustfuse_ray.stages.common import hash_group_apply

    def _cat(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.not_equal(batch["value_type"], "quantity"))

    cat = claims.map_batches(_cat, batch_format="pyarrow",
                             zero_copy_batch=True)
    dedup = cat.groupby(
        ["bucket_id", "entity", "attr", "value_str", "source"]).count()
    counts = (dedup.groupby(["bucket_id", "entity", "attr", "value_str"])
              .count().rename_columns({"count()": "n_votes"}))

    def _winner(group: pa.Table) -> pa.Table:
        votes = group["n_votes"].to_pylist()
        vals = group["value_str"].to_pylist()
        # tie-break: among max counts pick lexicographically smallest value
        m = max(votes)
        cand = [i for i in range(len(vals)) if votes[i] == m]
        best = min(cand, key=lambda i: vals[i])
        return group.slice(best, 1)

    return hash_group_apply(counts, ["bucket_id", "entity", "attr"],
                            _winner, n_parts=n_parts)


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

    def emit_batch(self, facts, state, bid, cache):
        from trustfuse_ray.fuse import vectorized as V

        return V.voting_emit_batch(self, facts, state, bid, cache)
