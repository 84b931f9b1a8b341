"""Partitioning invariance for the round-5 wave: every operator must
produce an identical (order-insensitive) result under different input
block layouts and different exchange partition counts — the property
that makes results stable across cluster topologies."""

import numpy as np
import pyarrow as pa
import pytest


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _docs(n=60, parts=3):
    import ray.data as rd
    rng = np.random.default_rng(5)
    texts = [" ".join(f"w{int(x)}" for x in rng.integers(0, 40, 12))
             for _ in range(n)]
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "lang": pa.array(["en", "fr"] * (n // 2), pa.string()),
        "source": pa.array([f"s{i % 4}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(parts)


def _events(n=80, parts=3):
    import ray.data as rd
    rng = np.random.default_rng(9)
    return rd.from_arrow(pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "user_id": pa.array(rng.integers(0, 10, n), pa.int64()),
        "event_type": pa.array(
            [f"t{i % 3}" for i in range(n)], pa.string()),
        "ts": pa.array(np.sort(rng.integers(0, 10**9, n)),
                       pa.timestamp("us")),
        "value": pa.array(rng.normal(size=n), pa.float64()),
    })).repartition(parts)


@pytest.mark.parametrize("op", [
    "normalized_dedup", "dedup_keep_best", "lang_fertility",
    "policy_flag_rates", "source_dup_matrix", "k_anonymity_audit",
    "curriculum_schedule"])
def test_doc_ops_invariant(ray_session, op):
    from trustfuse_ray.stages import curation, profile, text

    fn = {
        "normalized_dedup": lambda d: text.normalized_dedup(d),
        "dedup_keep_best": lambda d: text.dedup_keep_best(d),
        "lang_fertility": lambda d: text.lang_fertility(d),
        "policy_flag_rates": lambda d: text.policy_flag_rates(d),
        "source_dup_matrix": lambda d: text.source_dup_matrix(d),
        "k_anonymity_audit": lambda d: profile.k_anonymity_audit(d),
        "curriculum_schedule": lambda d: curation.curriculum_schedule(d),
    }[op]
    a = _norm(fn(_docs(parts=2)).to_pandas())
    b = _norm(fn(_docs(parts=7)).to_pandas())
    assert a.equals(b), op


def test_event_ops_invariant(ray_session):
    from trustfuse_ray.stages.windows import user_gap_median

    a = _norm(user_gap_median(_events(parts=2), n_parts=2).to_pandas())
    b = _norm(user_gap_median(_events(parts=5), n_parts=9).to_pandas())
    assert a.equals(b)


def test_lineitem_ops_invariant(ray_session):
    import ray.data as rd
    from trustfuse_ray.stages.joins import part_copurchase, part_rules

    rng = np.random.default_rng(3)
    tbl = pa.table({
        "l_orderkey": pa.array(rng.integers(0, 30, 200), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, 15, 200), pa.int64())})
    d2 = rd.from_arrow(tbl).repartition(2)
    d6 = rd.from_arrow(tbl).repartition(6)
    a = _norm(part_copurchase(d2, n_parts=2).to_pandas())
    b = _norm(part_copurchase(d6, n_parts=5).to_pandas())
    assert a.equals(b)
    a = _norm(part_rules(d2, n_parts=3).to_pandas())
    b = _norm(part_rules(d6, n_parts=8).to_pandas())
    assert a.equals(b)
