"""Config-driven preprocessing, complete_gt coalesce, datetime/labeling
helpers, LSH ANN recall, embedding near-dup pairs."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from trustfuse_ray.functions import datetime_utils as dtu
from trustfuse_ray.stages import ann
from trustfuse_ray.stages.dedup import embedding_near_pairs
from trustfuse_ray.stages.preprocess import (apply_preprocessing,
                                             complete_gt, focus_attributes)


def _claims(rows):
    cols = ["claim_id", "bucket_id", "source", "entity", "attr",
            "value_str", "value_num", "value_type"]
    return ray.data.from_arrow(pa.table({
        "claim_id": pa.array([r[0] for r in rows], pa.int64()),
        "bucket_id": pa.array([r[1] for r in rows], pa.int32()),
        "source": pa.array([r[2] for r in rows], pa.string()),
        "entity": pa.array([r[3] for r in rows], pa.string()),
        "attr": pa.array([r[4] for r in rows], pa.string()),
        "value_str": pa.array([r[5] for r in rows], pa.string()),
        "value_num": pa.array([r[6] for r in rows], pa.float64()),
        "value_type": pa.array([r[7] for r in rows], pa.string()),
    }))


def test_apply_preprocessing_config():
    ds = _claims([
        (1, 0, "s1", "b1", "Authors", "A. Smith; B. Jones", None, "string"),
        (2, 0, "s1", "b1", "Pages", " 1,234 ", None, "quantity"),
        (3, 0, "s1", "b1", "Title", "  Spaced  ", None, "string"),
    ])
    config = [
        {"function": "extract_authors", "attributes": ["Authors"],
         "modify_structure": True},
        {"function": "extract_number_with_commas", "attributes": ["Pages"]},
        {"function": "remove_space", "attributes": ["Title"]},
    ]
    out = apply_preprocessing(ds, config).take_all()
    by_attr = {}
    for r in out:
        by_attr.setdefault(r["attr"], []).append(r)
    # explode: 2 author rows
    assert sorted(r["value_str"] for r in by_attr["Authors"]) == \
        ["a. smith", "b. jones"]
    assert by_attr["Pages"][0]["value_num"] == 1234.0
    assert by_attr["Title"][0]["value_str"] == "Spaced"


def test_apply_preprocessing_type_selection():
    ds = _claims([
        (1, 0, "s", "e", "height", "12 m", None, "quantity"),
        (2, 0, "s", "e", "color", "red", None, "string"),
    ])
    config = [{"function": "extract_number", "attributes": ["quantity"],
               "action": "type_selection"}]
    out = apply_preprocessing(
        ds, config, attr_types={"height": "quantity", "color": "string"}
    ).take_all()
    vals = {r["attr"]: r for r in out}
    assert vals["height"]["value_num"] == 12.0
    assert vals["color"]["value_str"] == "red"  # untouched


def test_focus_attributes():
    ds = _claims([
        (1, 0, "s", "e", "a1", "x", None, "string"),
        (2, 0, "s", "e", "a2", "1", 1.0, "quantity"),
    ])
    assert focus_attributes(ds, attributes=["a1"]).count() == 1
    assert focus_attributes(ds, types=["quantity"]).count() == 1


def test_apply_scale_units_stage():
    from trustfuse_ray.stages.preprocess import apply_scale_units

    rows = []
    for i, v in enumerate(["1,000", "1.2", "950", "1100000"]):
        rows.append((i, 0, f"s{i}", "AAPL", "Volume", v, None, "quantity"))
    rows.append((9, 0, "s9", "AAPL", "Name", "apple", None, "string"))
    out = apply_scale_units(_claims(rows), ["Volume"]).take_all()
    vols = np.array([r["value_num"] for r in out if r["attr"] == "Volume"])
    assert len(vols) == 4
    assert np.all(np.abs(np.log10(vols / np.median(vols))) <= 0.8)
    # non-target attrs pass through untouched
    assert [r["value_str"] for r in out if r["attr"] == "Name"] == ["apple"]


def test_complete_gt_coalesce():
    gt = _claims([
        (1, 0, "", "e1", "pop", "100", None, "quantity"),
        (2, 1, "", "e1", "pop", None, None, "quantity"),  # filled from b0
        (3, 1, "", "e1", "name", "x", None, "string"),
        (4, 2, "", "e1", "pop", "200", None, "quantity"),
    ])
    out = complete_gt(gt)
    got = {(r["bucket_id"], r["attr"]): r["value_str"]
           for r in out.take_all()}
    assert got[(1, "pop")] == "100"
    assert got[(2, "pop")] == "200"


def test_gt_carry_forward_mask():
    """Entities absent from bucket b's GT carry their earlier rows into
    window b (the reference's anti-join concat, dataset.py:368-373), and a
    re-statement overrides only the attrs it states."""
    from trustfuse_ray.stages.preprocess import gt_as_of

    gt = _claims([
        (1, 0, "", "e1", "pop", "100", None, "quantity"),
        (2, 0, "", "e1", "name", "x", None, "string"),
        (3, 1, "", "e2", "pop", "7", None, "quantity"),   # e1 absent in b1
        (4, 2, "", "e1", "pop", "200", None, "quantity"),  # restates pop only
    ])
    w1 = {(r["entity"], r["attr"]): r["value_str"]
          for r in gt_as_of(gt, 1).take_all()}
    assert w1 == {("e1", "pop"): "100", ("e1", "name"): "x",
                  ("e2", "pop"): "7"}
    out2 = gt_as_of(gt, 2).take_all()
    w2 = {(r["entity"], r["attr"]): r["value_str"] for r in out2}
    assert w2 == {("e1", "pop"): "200", ("e1", "name"): "x",
                  ("e2", "pop"): "7"}
    assert all(r["bucket_id"] == 2 for r in out2)


def test_datetime_helpers():
    assert dtu.date2seconds("2020-01-01T00:00:00Z") == 1577836800
    assert dtu.seconds2date(1577836800) == "2020-01-01T00:00:00Z"
    assert dtu.convert_seconds_to_readable_time(90061) == "1d 1h 1m 1s"
    arr = dtu.date2seconds_batch(pa.array(["2020-01-01T00:00:00Z"]))
    assert arr.to_pylist() == [1577836800]
    assert dtu.seconds2date_batch(pa.array([1577836800])).to_pylist() == \
        ["2020-01-01T00:00:00Z"]
    assert dtu.is_ip_or_mac("192.168.0.1")
    assert dtu.is_ip_or_mac("aa:bb:cc:dd:ee:ff")
    assert not dtu.is_ip_or_mac("Alice")


def _emb_ds(n=200, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim))
    mat[10] = mat[3] + 0.01 * rng.standard_normal(dim)  # planted near-dup
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in mat],
                              pa.list_(pa.float32())),
    })), mat


def test_embedding_near_pairs_finds_planted_dup():
    ds, _ = _emb_ds()
    pairs = embedding_near_pairs(ds, threshold=0.99).take_all()
    assert any((p["doc_a"], p["doc_b"]) == (3, 10) for p in pairs)


def test_ivf_topk_recall_vs_brute():
    ds, mat = _emb_ds(n=400)
    queries = sorted(ds.filter(expr="vec_id < 3").take_all(),
                     key=lambda r: r["vec_id"])
    brute = ann.brute_topk(ds, queries, k=5).take_all()
    ivf = ann.ivf_topk(ds, queries, k=5, n_lists=8, nprobe=8)  # ≡ brute
    b = {(r["query_id"], r["vec_id"]) for r in brute}
    v = {(r["query_id"], r["vec_id"]) for r in ivf.take_all()}
    assert b == v  # nprobe == n_lists probes every list → exact
    ivf2 = ann.ivf_topk(ds, queries, k=5, n_lists=8, nprobe=3).take_all()
    v2 = {(r["query_id"], r["vec_id"]) for r in ivf2}
    assert len(b & v2) / len(b) >= 0.4  # partial probe → partial recall


def test_lsh_topk_recall_vs_brute():
    ds, mat = _emb_ds(n=400)
    queries = sorted(ds.filter(expr="vec_id < 3").take_all(),
                     key=lambda r: r["vec_id"])
    brute = ann.brute_topk(ds, queries, k=5).take_all()
    lsh = ann.lsh_topk(ds, queries, k=5, n_planes=4).take_all()
    b = {(r["query_id"], r["vec_id"]) for r in brute}
    l = {(r["query_id"], r["vec_id"]) for r in lsh}
    # the query itself (rank 1, cosine 1) always shares its own bucket
    for q in (0, 1, 2):
        assert (q, q) in l
    # bucketed search returns a subset of candidates, scored identically
    for r in lsh:
        assert r["score"] <= 1.0 + 1e-9
    recall = len(b & l) / len(b)
    assert recall > 0.2  # 4 planes / exact-bucket probe: partial by design


def test_pq_topk_recall_vs_brute():
    ds, mat = _emb_ds(n=400)
    queries = sorted(ds.filter(expr="vec_id < 3").take_all(),
                     key=lambda r: r["vec_id"])
    brute = ann.brute_topk(ds, queries, k=5).take_all()
    b = {(r["query_id"], r["vec_id"]) for r in brute}
    # shortlist=None re-ranks every row per block → exact (the gate mode)
    pq = ann.pq_topk(ds, queries, k=5, shortlist=None).take_all()
    assert b == {(r["query_id"], r["vec_id"]) for r in pq}
    # finite shortlist = the pruning path; ADC shortlist of 4k keeps
    # high-but-not-guaranteed recall
    pq2 = ann.pq_topk(ds, queries, k=5, shortlist=20).take_all()
    v2 = {(r["query_id"], r["vec_id"]) for r in pq2}
    assert len(b & v2) / len(b) >= 0.6
    # deterministic codebooks: same seed → identical results
    books1 = ann.train_pq_codebooks(ds)
    books2 = ann.train_pq_codebooks(ds)
    import numpy as np
    assert np.array_equal(books1, books2)
