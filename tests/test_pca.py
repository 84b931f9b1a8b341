"""Distributed PCA (stages/pca.py): exact-moment fit properties and
distributed-equals-local projection at sf0.001."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def table():
    return pq.read_table(f"{SF}/embeddings.parquet")


def test_fit_matches_direct_numpy_pca(ray_session, table):
    import ray.data as rd

    from trustfuse_ray.stages import pca

    fit = pca.fit_pca(rd.from_arrow(table))
    # direct dense PCA over the same quantized matrix
    q = pca._quantize(table, "embedding") / pca.FX
    mu = q.mean(axis=0)
    c_direct = np.cov(q, rowvar=False, bias=True)
    w, v = np.linalg.eigh(c_direct)
    top = v[:, np.argsort(w)[::-1]].T
    # means agree exactly (both exact-integer derived)
    np.testing.assert_allclose(fit["mean"], mu, rtol=0, atol=1e-12)
    # components orthonormal
    W = fit["components"]
    np.testing.assert_allclose(W @ W.T, np.eye(W.shape[0]), atol=1e-9)
    # same subspace: |cos| between matching components ≈ 1
    for c in range(4):
        cos = abs(float(W[c] @ top[c]))
        assert cos > 1 - 1e-8, f"component {c}: |cos|={cos}"
    # eigvals sorted descending and non-negative (covariance PSD)
    ev = fit["eigvals"]
    assert np.all(np.diff(ev) <= 1e-12)
    assert ev[0] > 0


def test_distributed_projection_equals_local(ray_session, table):
    import ray.data as rd

    from trustfuse_ray.stages import pca

    ds = rd.from_arrow(table)
    fit = pca.fit_pca_table(table)
    got = (pca.pca_project(ds, k=4, fit=fit).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    q = pca._quantize(table, "embedding") / pca.FX
    want = np.round((q - fit["mean"]) @ fit["components"][:4].T, 6)
    ids = table["vec_id"].to_numpy()
    order = np.argsort(ids)
    for c in range(4):
        np.testing.assert_array_equal(got[f"pc{c + 1}"].to_numpy(),
                                      want[order, c])


def test_fit_distributed_equals_table_fit(ray_session, table):
    import ray.data as rd

    from trustfuse_ray.stages import pca

    a = pca.fit_pca(rd.from_arrow(table).repartition(7))
    b = pca.fit_pca_table(table)
    np.testing.assert_array_equal(a["mean"], b["mean"])
    np.testing.assert_array_equal(a["components"], b["components"])
    assert a["n"] == b["n"] == len(table)
