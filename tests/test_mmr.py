"""MMR diverse top-k (stages/ann.py::mmr_diverse_topk): a planted
lower-relevance-but-diverse doc must outrank a higher-relevance
near-duplicate of pick 1; picks are distinct; k caps at corpus size."""

import numpy as np
import pyarrow as pa
import pytest


def _vec(*pairs, dim=16):
    v = np.zeros(dim)
    for i, x in pairs:
        v[i] = x
    return v


@pytest.fixture(scope="module")
def planted():
    """q = e0.  Corpus: vec 0 = q + 0.4·e3 (top relevance); vec 1 =
    q + 0.39·e3 (near-dup of vec 0, still relevance ≈ 1); vec 2 =
    0.6·q − 0.3·e3 (relevance only 0.6 but anticorrelated with vec 0's
    extra component → MMR score 0.12 beats the near-dup's −0.156)."""
    rng = np.random.default_rng(7)
    mat = np.vstack([
        _vec((0, 1.0), (3, 0.4)),
        _vec((0, 1.0), (3, 0.39)),
        _vec((0, 0.6), (3, -0.3)),
        rng.normal(0, 0.01, (5, 16)),          # background noise docs
    ])
    emb = pa.table({
        "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })
    query = {"vec_id": 99, "embedding": _vec((0, 1.0)).tolist()}
    return emb, query


def test_mmr_prefers_diverse_over_near_dup(ray_session, planted):
    import ray.data as rd

    from trustfuse_ray.stages.ann import mmr_diverse_topk

    emb, query = planted
    out = (mmr_diverse_topk(rd.from_arrow(emb), [query], k=3, shortlist=8)
           .to_pandas().sort_values("pick"))
    picks = out["vec_id"].tolist()
    assert len(set(picks)) == 3                # distinct
    assert picks[0] == 0                       # pick 1 = argmax relevance
    # pure-relevance rank 2 is the near-dup (vec 1, rel ~1.0); MMR must
    # take the diverse doc (vec 2, rel 0.6) instead
    assert picks[1] == 2
    assert (out["query_id"] == 99).all()


def test_mmr_k_larger_than_corpus(ray_session, planted):
    import ray.data as rd

    from trustfuse_ray.stages.ann import mmr_diverse_topk

    emb, query = planted
    small = rd.from_arrow(emb.slice(0, 3))
    out = mmr_diverse_topk(small, [query], k=10, shortlist=10).to_pandas()
    assert len(out) == 3                       # capped at corpus size
    assert sorted(out["pick"].tolist()) == [1, 2, 3]
