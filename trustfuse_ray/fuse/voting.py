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


def voting_incremental(prior_claims, new_claims, n_parts: int = 32):
    """Incremental voting maintenance: fold a NEW bucket of claims into an
    existing fused state without recomputing untouched facts — the
    cumulative-bucket semantics of the reference's DynamicDataset
    (`/root/reference/trustfuse/conflicting_dataset/dataset.py`, buckets
    only ever grow) as an incremental operator.

    Both sides collapse map-side to their distinct
    (source, entity, attr, value_str, value_num, value_type) rows, union,
    and co-partition ONCE on (entity, attr); a group re-votes only if it
    received at least one increment-side row, so the exchange + re-vote
    cost is bounded by the increment's touched facts — prior facts whose
    groups the increment never touches move rows but do no vote work, and
    at 100 TB the prior side would be the stored distinct-claim state
    read at rest (partition-pruned by the touched-key set).

    Returns fused rows for touched groups only — (entity, attr,
    value_str, value_num) with voting semantics (categorical mode, ties
    to min value; quantity median), matching the full-recompute result
    restricted to touched groups."""
    import functools

    from trustfuse_ray.stages.common import hash_group_apply

    cols = ["source", "entity", "attr", "value_str", "value_num",
            "value_type"]

    def _distinct(batch: pa.Table, side: int) -> pa.Table:
        t = batch.select(cols).group_by(cols).aggregate([])
        return t.append_column(
            "__new", pa.array(np.full(len(t), side, np.int8)))

    def _refuse(group: pa.Table) -> pa.Table | None:
        side = np.asarray(group["__new"], dtype=np.int8)
        if not (side == 1).any():
            return None  # untouched fact: prior truth stands
        seen = set()
        cat: dict[str, int] = {}
        nums = []
        for r in zip(*(group[c].to_pylist() for c in cols)):
            if r in seen:
                continue
            seen.add(r)
            _, _, _, vs, vn, vt = r
            if vt == "quantity":
                if vn is not None:
                    nums.append(vn)
            elif vs is not None:
                cat[vs] = cat.get(vs, 0) + 1
        ent = group["entity"][0].as_py()
        attr = group["attr"][0].as_py()
        oe, oa, ovs, ovn = [], [], [], []
        if cat:
            win = sorted(cat.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            oe.append(ent)
            oa.append(attr)
            ovs.append(win)
            ovn.append(None)
        if nums:
            oe.append(ent)
            oa.append(attr)
            ovs.append(None)
            ovn.append(float(np.median(np.asarray(nums, np.float64))))
        return pa.table({"entity": pa.array(oe, pa.string()),
                         "attr": pa.array(oa, pa.string()),
                         "value_str": pa.array(ovs, pa.string()),
                         "value_num": pa.array(ovn, pa.float64())})

    prior = prior_claims.map_batches(
        functools.partial(_distinct, side=0), batch_format="pyarrow",
        zero_copy_batch=True)
    new = new_claims.map_batches(
        functools.partial(_distinct, side=1), batch_format="pyarrow",
        zero_copy_batch=True)
    out_schema = pa.schema([("entity", pa.string()), ("attr", pa.string()),
                            ("value_str", pa.string()),
                            ("value_num", pa.float64())])
    return hash_group_apply(
        prior.union(new), ["entity", "attr"], _refuse, n_parts=n_parts,
        plasma_schema=out_schema)
