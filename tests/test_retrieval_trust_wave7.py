"""Round-5 wave 7: retrieval evaluation (MRR@k), Rocchio PRF expansion,
decayed source trust, and predicate-signature type induction — planted
cases with hand-computed expectations."""

import datetime

import numpy as np
import pyarrow as pa


def _emb_ds(vecs, labels):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())}))


def test_retrieval_mrr_planted():
    from trustfuse_ray.stages.ann import retrieval_mrr

    # query 0 = [1,0]; nearest others by dot: v1 [0.9,0] (label 1),
    # v2 [0.8,0] (label 0 == query's) -> first relevant at rank 2
    vecs = [[1.0, 0.0], [0.9, 0.0], [0.8, 0.0], [0.0, 1.0]]
    labels = [0, 1, 0, 0]
    ds = _emb_ds(vecs, labels)
    queries = sorted(ds.filter(expr="vec_id < 1").take_all(),
                     key=lambda r: r["vec_id"])
    out = {r["query_id"]: r
           for r in retrieval_mrr(ds, queries, k=3).take_all()}
    r0 = out[0]
    assert r0["q_label"] == 0
    assert r0["first_rel_rank"] == 2
    assert r0["rr_fixed"] == 1_000_000 // 2


def test_retrieval_mrr_miss_is_zero():
    from trustfuse_ray.stages.ann import retrieval_mrr

    vecs = [[1.0, 0.0], [0.9, 0.0], [0.8, 0.0]]
    labels = [7, 1, 2]  # nothing shares the query's label
    ds = _emb_ds(vecs, labels)
    queries = ds.filter(expr="vec_id < 1").take_all()
    out = retrieval_mrr(ds, queries, k=2).take_all()
    assert out[0]["first_rel_rank"] == 0 and out[0]["rr_fixed"] == 0


def test_rocchio_expansion_changes_ranking():
    from trustfuse_ray.stages.ann import rocchio_topk

    # query [1,0]; fb=1 pulls in v1=[0.9, 0.4]; expanded query acquires
    # a y-component, so v3=[0,1] must outrank v2=[0.05,0] in round 2
    vecs = [[1.0, 0.0], [0.9, 0.4], [0.05, 0.0], [0.0, 1.0]]
    ds = _emb_ds(vecs, [0, 0, 0, 0])
    queries = ds.filter(expr="vec_id < 1").take_all()
    out = sorted(rocchio_topk(ds, queries, k=3, fb=1).take_all(),
                 key=lambda r: r["rank"])
    ranks = [r["vec_id"] for r in out]
    assert ranks[0] == 1                      # feedback doc stays first
    assert ranks.index(3) < ranks.index(2)    # y-doc promoted
    # exact expanded scores: q2 = [1_900_000, 400_000]
    by_vid = {r["vec_id"]: r["score_fx"] for r in out}
    assert by_vid[3] == 400_000 * 1_000_000


def _claims_ds(rows):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "entity": pa.array([r[1] for r in rows], pa.string()),
        "attr": pa.array([r[2] for r in rows], pa.string()),
        "value_str": pa.array([r[3] for r in rows], pa.string()),
        "value_type": pa.array(["string"] * len(rows), pa.string()),
        "ts": pa.array([datetime.datetime(2024, 1, r[4])
                        for r in rows], pa.timestamp("us"))}))


def test_source_trust_decay_planted():
    from trustfuse_ray.reverse import source_trust_decay

    # fact (e, a): s1+s2 say "x" (winner by 2-1), s3 says "y".
    # days: s1 on the ref day (w=1e6), s2 two days stale (w=1e6>>2),
    # s3 on the ref day (w=1e6, all disagreeing).
    rows = [("s1", "e", "a", "x", 3), ("s2", "e", "a", "x", 1),
            ("s3", "e", "a", "y", 3)]
    ds = _claims_ds(rows)
    ref_day = (datetime.datetime(2024, 1, 3)
               - datetime.datetime(1970, 1, 1)).days
    out = {r["source"]: r
           for r in source_trust_decay(ds, ref_day=ref_day).take_all()}
    assert out["s1"]["w_total"] == 1_000_000
    assert out["s1"]["trust_permille"] == 1000
    assert out["s2"]["w_total"] == 1_000_000 >> 2
    assert out["s2"]["trust_permille"] == 1000   # stale but agreeing
    assert out["s3"]["w_agree"] == 0
    assert out["s3"]["trust_permille"] == 0


def test_source_trust_decay_max_shift_floor():
    from trustfuse_ray.reverse import source_trust_decay

    rows = [("s1", "e", "a", "x", 1)]
    ds = _claims_ds(rows)
    ref_day = (datetime.datetime(2024, 1, 1)
               - datetime.datetime(1970, 1, 1)).days + 1000
    out = source_trust_decay(ds, ref_day=ref_day,
                             max_shift=40).take_all()
    assert out[0]["w_total"] == 1_000_000 >> 40  # capped, not zero-shifted


def test_type_induction_planted():
    import ray.data as rd

    from trustfuse_ray.reverse import type_induction

    rows = [("e1", "color"), ("e1", "size"), ("e1", "color"),
            ("e2", "size"), ("e2", "color"),
            ("e3", "weight")]
    ds = rd.from_arrow(pa.table({
        "entity": pa.array([r[0] for r in rows], pa.string()),
        "attr": pa.array([r[1] for r in rows], pa.string())}))
    out = {r["type_sig"]: r for r in type_induction(ds).take_all()}
    cs = out["color,size"]
    assert cs["n_entities"] == 2 and cs["rep_entity"] == "e1"
    assert cs["n_attrs"] == 2
    assert out["weight"]["n_entities"] == 1
