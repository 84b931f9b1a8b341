"""Distributed PCA over an embedding column (training-data extension;
the reference has no dimensionality reduction — this serves the
embeddings table the same way ann.py's retrievers do).

Scale plan: the ONLY data-sized pass is ``map_batches`` over the
vectors.  Each block reduces to d(d+1)/2 + d + 1 exact int64 partial
rows (fixed-point second-moment matrix + column sums + count), so the
one exchange carries O(d²) rows per block regardless of corpus size —
at 100 TB the shuffle volume is still kilobytes per block.  The d×d
eigendecomposition runs on the driver (d is model-sized, not
data-sized) and the k component vectors fold back into the projection
pass as broadcast constants, exactly like ann.HyperplaneLSH's planes.

Exactness: every vector component quantizes to int64 micro-units with
the repo's q1 rounding rule (half-towards-infinity) BEFORE any product,
so the distributed Gram is bit-identical to a single-machine pass and
to the DuckDB oracle's integer arithmetic, independent of block order.
int64 bound: |q| ≤ ~1e7 micro-units for unit-scale embeddings → block
partials overflow only past ~1e4 × 1e14 row-products; the groupby sums
would need ~1e5× the 100-TB corpus to wrap.  The float64 covariance is
derived once from the exact integers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

FX = 1_000_000  # micro-unit quantization, shared with the SQL oracles


def _quantize(batch: pa.Table, vec_col: str) -> np.ndarray:
    """(n, d) int64 micro-unit matrix with the q1 rounding rule."""
    col = batch[vec_col].combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), np.int64)
    flat = pc.cast(col.flatten(), pa.float64())
    q = pc.cast(pc.round(pc.multiply(flat, pa.scalar(float(FX))),
                         round_mode="half_towards_infinity"), pa.int64())
    return np.asarray(q).reshape(n, -1)


def gram_moments(emb, vec_col: str = "embedding"):
    """Dataset of exact int64 second-moment partial sums: rows
    (i, j, g) for the upper triangle (0 ≤ i ≤ j < d), plus column sums
    as (i, -1, Σq_i) and the count as (-1, -1, n)."""

    def _partial(batch: pa.Table) -> pa.Table:
        q = _quantize(batch, vec_col)
        n, d = q.shape
        if n == 0:
            return pa.table({"i": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "g": pa.array([], pa.int64())})
        gram = q.T @ q  # exact int64 matmul
        iu, ju = np.triu_indices(d)
        s = q.sum(axis=0, dtype=np.int64)
        i = np.concatenate([iu, np.arange(d), [-1]])
        j = np.concatenate([ju, np.full(d, -1, np.int64), [-1]])
        g = np.concatenate([gram[iu, ju], s, [n]])
        return pa.table({"i": pa.array(i, pa.int64()),
                         "j": pa.array(j, pa.int64()),
                         "g": pa.array(g, pa.int64())})

    return (emb.select_columns([vec_col])
            .map_batches(_partial, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby(["i", "j"]).sum("g")
            .rename_columns({"sum(g)": "g"}))


def fit_from_moments(rows) -> dict:
    """Exact moments (i, j, g) → covariance → eigh → top components.

    Deterministic: the covariance is built from exact integers and the
    eigenvector sign is normalized (largest-|w| coordinate positive,
    first index on ties), so any two fits over the same corpus agree
    bit-for-bit."""
    n = None
    sums = {}
    grams = {}
    for r in rows:
        i, j, g = int(r["i"]), int(r["j"]), int(r["g"])
        if i == -1:
            n = g
        elif j == -1:
            sums[i] = g
        else:
            grams[(i, j)] = g
    if not n:
        raise ValueError("PCA fit over an empty embedding column")
    d = max(sums) + 1
    s = np.array([sums[i] for i in range(d)], np.float64)
    G = np.zeros((d, d), np.float64)
    for (i, j), g in grams.items():
        G[i, j] = G[j, i] = g
    mu = s / (n * FX)
    # C = E[xx^T] - mu mu^T over micro-unit-quantized vectors
    C = G / (n * FX * FX) - np.outer(mu, mu)
    w, v = np.linalg.eigh(C)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order].T  # rows = components
    for c in range(v.shape[0]):
        jmax = int(np.argmax(np.abs(v[c])))
        if v[c, jmax] < 0:
            v[c] = -v[c]
    return {"mean": mu, "components": v, "eigvals": w, "n": n, "d": d}


def fit_pca(emb, vec_col: str = "embedding") -> dict:
    """Distributed fit: the take_all is over the d²-bounded moment
    aggregate (2,145 rows at d=64), never the corpus."""
    return fit_from_moments(gram_moments(emb, vec_col).take_all())


def fit_pca_table(table: pa.Table, vec_col: str = "embedding") -> dict:
    """Single-machine fit over an in-memory table — the oracle builder's
    path; produces the identical exact moments (used to inline component
    literals into the SQL, like ann._lsh_topk_sql's planes)."""
    q = _quantize(table, vec_col)
    n, d = q.shape
    rows = [{"i": -1, "j": -1, "g": n}]
    s = q.sum(axis=0, dtype=np.int64)
    rows += [{"i": i, "j": -1, "g": int(s[i])} for i in range(d)]
    gram = q.T @ q
    iu, ju = np.triu_indices(d)
    rows += [{"i": int(a), "j": int(b), "g": int(gram[a, b])}
             for a, b in zip(iu, ju)]
    return fit_from_moments(rows)


def pca_project(emb, k: int = 4, vec_col: str = "embedding",
                id_col: str = "vec_id", fit: dict | None = None):
    """Project every vector onto the top-k principal components.

    The fit (mean + k×d components) is a model-sized constant folded
    into the map closure — broadcast once, never shuffled; the
    projection pass is a per-block matmul.  Outputs round to 6 decimals
    (the ann.py score convention) so the driver hash is stable against
    summation order."""
    fit = fit or fit_pca(emb, vec_col)
    W = fit["components"][:k]
    mu = fit["mean"]

    def _proj(batch: pa.Table) -> pa.Table:
        q = _quantize(batch, vec_col)
        cols = {id_col: batch[id_col].cast(pa.int64())}
        if q.shape[0] == 0:
            for c in range(k):
                cols[f"pc{c + 1}"] = pa.array([], pa.float64())
            return pa.table(cols)
        proj = (q / FX - mu) @ W.T
        for c in range(k):
            cols[f"pc{c + 1}"] = pa.array(np.round(proj[:, c], 6),
                                          pa.float64())
        return pa.table(cols)

    return emb.select_columns([id_col, vec_col]).map_batches(
        _proj, batch_format="pyarrow", zero_copy_batch=True)
