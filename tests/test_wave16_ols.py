"""Round-5 wave 16: closed-form distributed OLS — planted lines."""

import pyarrow as pa


def _fit_rows(rows):
    """Run the partial+fit kernels over a synthetic lineitem block."""
    import ray.data as rd

    from trustfuse_ray.pipelines import queries as q

    ds = rd.from_arrow(pa.table({
        "l_returnflag": pa.array([r[0] for r in rows], pa.string()),
        "l_quantity": pa.array([r[1] for r in rows], pa.float64()),
        "l_extendedprice": pa.array([r[2] for r in rows], pa.float64())}))
    import os
    import tempfile
    d = tempfile.mkdtemp()
    ds.write_parquet(os.path.join(d, "lineitem.parquet"))
    return {r["l_returnflag"]: r
            for r in q.q_price_quantity_ols(d).take_all()}


def test_ols_exact_line():
    # y = 3x exactly (in cents: y_c = 3 x_c): slope_ppm = 3_000_000,
    # intercept 0
    rows = [("A", 1.0, 3.0), ("A", 2.0, 6.0), ("A", 4.0, 12.0)]
    out = _fit_rows(rows)["A"]
    assert out["slope_ppm"] == 3_000_000
    assert out["intercept_microcents"] == 0
    assert out["n_rows"] == 3


def test_ols_negative_slope_floor_semantics():
    # y = -2x + 10 dollars: slope -2, intercept 1000 cents
    rows = [("R", 1.0, 8.0), ("R", 2.0, 6.0), ("R", 3.0, 4.0)]
    out = _fit_rows(rows)["R"]
    assert out["slope_ppm"] == -2_000_000
    assert out["intercept_microcents"] == 1000 * 1_000_000


def test_ols_degenerate_constant_x():
    # all x equal -> den == 0 -> coefficients defined as 0
    rows = [("N", 5.0, 1.0), ("N", 5.0, 2.0)]
    out = _fit_rows(rows)["N"]
    assert out["slope_ppm"] == 0 and out["intercept_microcents"] == 0


def test_ols_matches_numpy_polyfit():
    import numpy as np
    rng = np.random.default_rng(3)
    xs = rng.integers(1, 50, size=200).astype(float)
    ys = 2.5 * xs + 7.0 + rng.normal(0, 1, size=200).round(2)
    rows = [("A", float(x), float(y)) for x, y in zip(xs, ys)]
    out = _fit_rows(rows)["A"]
    slope, icept = np.polyfit(np.round(xs * 100), np.round(ys * 100), 1)
    assert abs(out["slope_ppm"] / 1e6 - slope) < 1e-6
    assert abs(out["intercept_microcents"] / 1e6 - icept) < 1e-3
