"""Distributed Lloyd k-means (stages/ann.py::kmeans_embeddings):
distributed-equals-local trajectory, determinism across block layouts,
and Lloyd-step properties at sf0.001."""

import numpy as np
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def table():
    return pq.read_table(f"{SF}/embeddings.parquet")


def _local_kmeans(table, k=8, iters=2, scale=1_000_000):
    """Sequential reference of the exact fixed-point Lloyd trajectory."""
    ids = np.asarray(table["vec_id"], dtype=np.int64)
    mat = np.stack([np.asarray(v, np.float64)
                    for v in table["embedding"].to_pylist()])
    v = mat * scale
    q = np.where(v >= 0, np.floor(v + 0.5), -np.floor(-v + 0.5)).astype(
        np.int64)
    order = np.argsort(ids)
    cent = q[order[:k]]

    def assign(c):
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        return np.argmin(d, axis=1)

    for _ in range(iters):
        a = assign(cent)
        new = cent.copy()
        for j in range(k):
            m = a == j
            if m.any():
                r = q[m].sum(0).astype(np.float64) / m.sum()
                new[j] = np.where(r >= 0, np.floor(r + 0.5),
                                  -np.floor(-r + 0.5)).astype(np.int64)
        cent = new
    return dict(zip(ids.tolist(), assign(cent).tolist()))


def test_distributed_matches_local(ray_session, table):
    import ray.data as rd

    from trustfuse_ray.stages.ann import kmeans_embeddings

    out = kmeans_embeddings(rd.from_arrow(table), k=8, iters=2).to_pandas()
    got = dict(zip(out["vec_id"].tolist(), out["cluster"].tolist()))
    assert got == _local_kmeans(table)


def test_block_layout_invariance(ray_session, table):
    import ray.data as rd

    from trustfuse_ray.stages.ann import kmeans_embeddings

    a = kmeans_embeddings(rd.from_arrow(table), k=5, iters=2).to_pandas()
    b = kmeans_embeddings(
        rd.from_arrow(table).repartition(7), k=5, iters=2).to_pandas()
    a = a.sort_values("vec_id").reset_index(drop=True)
    b = b.sort_values("vec_id").reset_index(drop=True)
    assert a.equals(b)


def test_all_points_assigned_within_k(ray_session, table):
    import ray.data as rd

    from trustfuse_ray.stages.ann import kmeans_embeddings

    out = kmeans_embeddings(rd.from_arrow(table), k=3, iters=1).to_pandas()
    assert len(out) == table.num_rows
    assert out["cluster"].between(0, 2).all()
    # with 3 seeds over a spread corpus every cluster should be non-empty
    assert out["cluster"].nunique() == 3
