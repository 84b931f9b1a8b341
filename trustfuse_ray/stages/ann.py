"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and every map task does one float64 matmul per batch against it
(never re-shipped per batch); per-query global top-k is a tiny groupby over
per-batch partial top-ks.

Scale path: LSH-bucketed variant (random-hyperplane signatures → groupby
bucket → in-bucket brute force), which turns the all-pairs matmul into a
hash-partitioned shuffle.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

import ray

from trustfuse_ray.stages.common import list_matrix, sqdist


def _as_matrix(rows: list, col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[col], dtype=np.float64) for r in rows])
    return ids, mat


def _topk_partial(batch: pa.Table, *, query_ref, k: int) -> pa.Table:
    qids, qmat = ray.get(query_ref) if isinstance(
        query_ref, ray.ObjectRef) else query_ref
    ids = np.asarray(batch["vec_id"], dtype=np.int64)
    mat = list_matrix(batch["embedding"])
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = qn @ mn.T  # queries x batch
    kk = min(k, sims.shape[1])
    part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]  # (queries, kk)
    rows = np.arange(sims.shape[0])[:, None]
    return pa.table({
        "query_id": pa.array(np.repeat(qids, kk), pa.int64()),
        "vec_id": pa.array(ids[part.ravel()], pa.int64()),
        "score": pa.array(sims[rows, part].ravel(), pa.float64())})


_TOPK_SCHEMA = pa.schema([
    ("query_id", pa.int64()), ("vec_id", pa.int64()),
    ("rank", pa.int64()), ("score", pa.float64())])


def _topk_merge(batch: pa.Table, *, k: int) -> pa.Table:
    qid = batch["query_id"][0].as_py()
    vid = np.asarray(batch["vec_id"], dtype=np.int64)
    sc = np.asarray(batch["score"], dtype=np.float64)
    order = np.lexsort((vid, -sc))[:k]  # score desc, vec_id asc tie-break
    return pa.table({
        "query_id": pa.array([qid] * len(order), pa.int64()),
        "vec_id": pa.array(vid[order], pa.int64()),
        "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
        "score": pa.array(np.round(sc[order], 6), pa.float64()),
    })


def brute_topk(embeddings, queries, k: int = 10, batch_size: int = 4096):
    """embeddings Dataset × query rows (list of {vec_id, embedding}) →
    (query_id, vec_id, rank, score) top-k by cosine."""
    q = _as_matrix(queries)
    query_ref = ray.put(q)
    partial = embeddings.map_batches(
        functools.partial(_topk_partial, query_ref=query_ref, k=k),
        batch_format="pyarrow", zero_copy_batch=True, batch_size=batch_size)
    # hash_group_apply (not groupby.map_groups): Ray's sort-based
    # map_groups leaves ZERO-COLUMN empties on group-less output
    # partitions — map_batches never calls its UDF on an empty block, so
    # they are untypable downstream and poison hash-shuffle joins with an
    # empty-schema broadcast; the plasma exchange types every partition.
    from trustfuse_ray.stages.common import hash_group_apply
    return hash_group_apply(
        partial, ["query_id"], functools.partial(_topk_merge, k=k),
        n_parts=8, plasma_schema=_TOPK_SCHEMA)


# ---------------------------------------------------------------------------
# IVF variant (scale path #2): coarse k-means lists + nprobe search
# ---------------------------------------------------------------------------


def train_ivf_centroids(embeddings, n_lists: int = 16, n_iters: int = 3,
                        sample_size: int = 4096, seed: int = 5):
    """Coarse quantizer trained distributed: seeded sample initializes the
    centroids, then ``n_iters`` Lloyd rounds where each map task emits only
    per-centroid partial (sum, count) — the same broadcast-iterate shape as
    the fusion rounds (per-round exchange is n_lists x dim floats)."""
    sample = embeddings.limit(sample_size).take_all()
    rng = np.random.default_rng(seed)
    _ids, mat = _as_matrix(sample)
    init = rng.choice(len(mat), size=min(n_lists, len(mat)), replace=False)
    centroids = mat[np.sort(init)].copy()

    for _ in range(n_iters):
        ref = ray.put(centroids)

        def _partial(batch: pa.Table, *, cref) -> pa.Table:
            cents = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
            m = list_matrix(batch["embedding"])
            assign = sqdist(m, cents).argmin(axis=1)
            k, dim = cents.shape
            sums = np.zeros((k, dim))
            counts = np.zeros(k)
            np.add.at(sums, assign, m)
            np.add.at(counts, assign, 1)
            return pa.table({
                "list_id": pa.array(range(k), pa.int32()),
                "vsum": pa.array(sums.tolist(),
                                 pa.list_(pa.float64())),
                "n": pa.array(counts, pa.float64()),
            })

        parts = embeddings.map_batches(
            functools.partial(_partial, cref=ref),
            batch_format="pyarrow", zero_copy_batch=True).take_all()
        k, dim = centroids.shape
        sums = np.zeros((k, dim))
        counts = np.zeros(k)
        for r in parts:
            sums[r["list_id"]] += np.asarray(r["vsum"])
            counts[r["list_id"]] += r["n"]
        nz = counts > 0
        centroids[nz] = sums[nz] / counts[nz, None]
    return centroids


def ivf_topk(embeddings, queries, k: int = 10, n_lists: int = 16,
             nprobe: int = 4, centroids: np.ndarray | None = None):
    """IVF ANN: assign corpus vectors to their nearest centroid list
    (one groupby shuffle), score each query only against its ``nprobe``
    closest lists.  Recall grows with nprobe (nprobe=n_lists ≡ brute)."""
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, n_lists=n_lists)
    cref = ray.put(centroids)

    def _assign(batch: pa.Table, *, cref) -> pa.Table:
        cents = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        m = list_matrix(batch["embedding"])
        d = sqdist(m, cents)
        return batch.append_column(
            "list_id", pa.array(d.argmin(axis=1).astype(np.int32)))

    qids, qmat = _as_matrix(queries)
    qd = sqdist(qmat, centroids)
    probe_lists = np.argsort(qd, axis=1)[:, :nprobe]
    by_list: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for li in probe_lists[qi]:
            by_list.setdefault(int(li), []).append(qi)
    qref = ray.put((qids, qmat, by_list))

    assigned = embeddings.map_batches(
        functools.partial(_assign, cref=cref),
        batch_format="pyarrow", zero_copy_batch=True)

    def _score_list(group: pa.Table) -> pa.Table:
        ids_, mat_, byl = ray.get(qref) if isinstance(
            qref, ray.ObjectRef) else qref
        qs = None
        if len(group):
            li = int(group["list_id"][0].as_py())
            qs = byl.get(li)
        if not qs:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        sub = [{"vec_id": ids_[i], "embedding": mat_[i]} for i in qs]
        sids, smat = _as_matrix(sub)
        return _topk_partial(group.drop_columns(["list_id"]),
                             query_ref=(sids, smat), k=k)

    from trustfuse_ray.stages.common import hash_group_apply

    partial = hash_group_apply(assigned, ["list_id"], _score_list,
                               n_parts=max(8, n_lists))
    return partial.groupby("query_id").map_groups(
        functools.partial(_topk_merge, k=k), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# LSH-bucketed variant (scale path)
# ---------------------------------------------------------------------------


class HyperplaneLSH:
    """Random-hyperplane signatures; state (the projection matrix) built once
    per actor from a fixed seed."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))

    def bucket_of(self, mat: np.ndarray) -> np.ndarray:
        bits = (mat @ self.planes.T) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = list_matrix(batch["embedding"])
        return batch.append_column(
            "bucket", pa.array(self.bucket_of(mat).astype(np.int64)))


def lsh_topk(embeddings, queries, k: int = 10, n_planes: int = 8,
             concurrency=(1, 4)):
    """ANN via hyperplane LSH: only corpus vectors sharing the query's bucket
    are scored (probing the exact bucket; multi-probe is a param away).
    Recall < 1 by construction — compare against brute_topk in tests."""
    dim = len(queries[0]["embedding"])
    lsh = HyperplaneLSH(dim, n_planes)
    qids, qmat = _as_matrix(queries)
    qbuckets = lsh.bucket_of(qmat)
    by_bucket: dict[int, list[int]] = {}
    for i, b in enumerate(qbuckets):
        by_bucket.setdefault(int(b), []).append(i)
    qref = ray.put((qids, qmat, by_bucket))

    bucketed = embeddings.map_batches(
        HyperplaneLSH, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes})

    def _score_bucket(batch: pa.Table) -> pa.Table:
        ids_, mat_, byb = ray.get(qref) if isinstance(
            qref, ray.ObjectRef) else qref
        bucket = int(batch["bucket"][0].as_py())
        qs = byb.get(bucket)
        if not qs:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        sub = [{"vec_id": ids_[i], "embedding": mat_[i]} for i in qs]
        sids, smat = _as_matrix(sub)
        return _topk_partial(batch.drop_columns(["bucket"]),
                             query_ref=(sids, smat), k=k)

    partial = bucketed.groupby("bucket").map_groups(
        _score_bucket, batch_format="pyarrow")
    # see brute_topk: plasma group apply types group-less partitions
    from trustfuse_ray.stages.common import hash_group_apply
    return hash_group_apply(
        partial, ["query_id"], functools.partial(_topk_merge, k=k),
        n_parts=8, plasma_schema=_TOPK_SCHEMA)


def embedding_centroids(emb, label_col: str = "label",
                        vec_col: str = "embedding", scale: int = 10_000):
    """Per-label centroid of an embedding column in long form
    (label, dim_idx, sum_fx, n, mean): per-block dim-wise FIXED-POINT sums
    (half-towards-infinity rounding, the q1 parity pattern) make the
    all-reduce exact — no float-summation-order dependence between the
    engine and the driver's SQL oracle, or between cluster topologies.
    Partial state per block is O(labels × dim)."""
    import pyarrow.compute as pc_

    from trustfuse_ray.stages.common import list_matrix

    def _partial(batch: pa.Table) -> pa.Table:
        m = list_matrix(batch[vec_col])                      # (n, dim)
        fx = np.asarray(pc_.round(
            pa.array(m.ravel() * scale),
            round_mode="half_towards_infinity")).astype(np.int64)
        n, dim = m.shape
        fx = fx.reshape(n, dim)
        labels = batch[label_col]
        enc = (labels.combine_chunks()
               if isinstance(labels, pa.ChunkedArray) else labels)
        enc = enc.dictionary_encode() if not pa.types.is_dictionary(
            enc.type) else enc
        kidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nk = len(enc.dictionary)
        sums = np.zeros((nk, dim), np.int64)
        np.add.at(sums, kidx, fx)
        cnt = np.bincount(kidx, minlength=nk).astype(np.int64)
        return pa.table({
            label_col: enc.dictionary.take(
                pa.array(np.repeat(np.arange(nk), dim))),
            "dim_idx": pa.array(np.tile(np.arange(dim, dtype=np.int64),
                                        nk), pa.int64()),
            "sum_fx": pa.array(sums.ravel(), pa.int64()),
            "n": pa.array(np.repeat(cnt, dim), pa.int64()),
        })

    partial = emb.select_columns([label_col, vec_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial.groupby([label_col, "dim_idx"]).sum(["sum_fx", "n"])

    def _mean(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["sum(sum_fx)"], dtype=np.int64)
        n = np.asarray(batch["sum(n)"], dtype=np.int64)
        return pa.table({
            label_col: batch[label_col],
            "dim_idx": batch["dim_idx"],
            "sum_fx": pa.array(s, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "mean": pa.array((s / n) / scale, pa.float64()),
        })

    return agg.map_batches(_mean, batch_format="pyarrow",
                           zero_copy_batch=True)


def embedding_quantize(embs, vec_col: str = "embedding",
                       id_col: str = "vec_id"):
    """Scalar 8-bit quantization (the SQ8 compression step of vector
    indexes): per-DIMENSION global [min, max] ranges, then
    ``code = floor((v - mn) / (mx - mn) * 255)`` clipped to 255 (0 when
    the dimension is constant).  All arithmetic is float64 with the same
    association order DuckDB uses, so codes replay exactly in SQL.

    Shape: pass 1 collapses each block to a (dim, mn, mx) partial —
    O(dim) rows per block regardless of block size — then a tiny groupby
    reduce; the 2×dim range table broadcasts via ``ray.put`` and pass 2
    is one streaming vectorized encode.  Output is the long
    (vec_id, dim, code) form for oracle comparison; a production sink
    would pack codes to a binary column."""
    import ray

    from trustfuse_ray.stages.common import list_matrix

    def _ranges(batch: pa.Table) -> pa.Table:
        m = list_matrix(batch[vec_col], dtype=np.float64)
        if not len(m):
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        return pa.table({
            "dim": pa.array(np.arange(m.shape[1], dtype=np.int64)),
            "mn": pa.array(m.min(axis=0)),
            "mx": pa.array(m.max(axis=0))})

    parts = (embs.select_columns([vec_col])
             .map_batches(_ranges, batch_format="pyarrow",
                          zero_copy_batch=True)
             .groupby("dim").aggregate(
                 ray.data.aggregate.Min("mn"), ray.data.aggregate.Max("mx"))
             .take_all())
    parts.sort(key=lambda r: r["dim"])
    mn = np.array([r["min(mn)"] for r in parts])
    mx = np.array([r["max(mx)"] for r in parts])
    rng_ref = ray.put((mn, mx))

    def _encode(batch: pa.Table) -> pa.Table:
        lo, hi = ray.get(rng_ref)
        m = list_matrix(batch[vec_col], dtype=np.float64)
        n, d = m.shape if len(m) else (0, len(lo))
        span = hi - lo
        with np.errstate(invalid="ignore", divide="ignore"):
            q = np.floor((m - lo[None, :]) / span[None, :] * 255.0)
        q = np.where(span[None, :] == 0.0, 0.0, np.minimum(q, 255.0))
        ids = np.repeat(np.asarray(batch[id_col], dtype=np.int64), d)
        return pa.table({
            id_col: pa.array(ids),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
            "code": pa.array(q.reshape(-1).astype(np.int64))})

    return embs.select_columns([id_col, vec_col]).map_batches(
        _encode, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Product-quantization variant (scale path #4): PQ codes + ADC shortlist
# ---------------------------------------------------------------------------


def train_pq_codebooks(embeddings, m_sub: int = 8, n_codes: int = 16,
                       sample_size: int = 4096, n_iters: int = 5,
                       seed: int = 7) -> np.ndarray:
    """Per-subspace k-means codebooks over a seeded sample of NORMALIZED
    vectors (standard PQ practice: codebooks train on a bounded sample, only
    encoding/scoring touch the full corpus).  Returns (m_sub, n_codes,
    dim/m_sub) float64."""
    sample = embeddings.limit(sample_size).take_all()
    _ids, mat = _as_matrix(sample)
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    n, dim = mat.shape
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    d = dim // m_sub
    rng = np.random.default_rng(seed)
    books = np.zeros((m_sub, n_codes, d))
    for s in range(m_sub):
        X = mat[:, s * d:(s + 1) * d]
        init = rng.choice(n, size=min(n_codes, n), replace=False)
        C = X[np.sort(init)].copy()
        for _ in range(n_iters):
            assign = sqdist(X, C).argmin(axis=1)
            for c in range(C.shape[0]):
                sel = assign == c
                if sel.any():
                    C[c] = X[sel].mean(axis=0)
        books[s, :C.shape[0]] = C
    return books


def pq_topk(embeddings, queries, k: int = 10, m_sub: int = 8,
            n_codes: int = 16, shortlist: int | None = None,
            books: np.ndarray | None = None, batch_size: int = 4096):
    """PQ ANN: encode each corpus vector to ``m_sub`` code bytes, score
    queries against the codes via ADC lookup tables (one table add per
    subspace — no full matmul), then exact-cosine re-rank only each block's
    ADC shortlist before the global top-k merge.

    ``shortlist=None`` re-ranks every row per block (the exactness-safe
    mode the oracle checks — the ADC/encode machinery runs but cannot drop
    a true neighbor, mirroring ``ivf_topk``'s nprobe=n_lists gate trick);
    a finite ``shortlist`` S bounds exact distance work to S per block —
    the 100-TB path, recall covered by ``test_pq_topk_recall_vs_brute``.

    Output matches :func:`brute_topk`'s schema and tie-breaking."""
    if books is None:
        books = train_pq_codebooks(embeddings, m_sub=m_sub, n_codes=n_codes)
    qids, qmat = _as_matrix(queries)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    ms, nc, d = books.shape
    # LUT[q, s, c] = qn_sub(q, s) · book[s, c]  (ADC inner-product tables)
    lut = np.einsum("qsd,scd->qsc", qn.reshape(len(qn), ms, d), books)
    ref = ray.put((qids, qn, lut, books))

    def _score(batch: pa.Table) -> pa.Table:
        ids_, qn_, lut_, books_ = ray.get(ref) if isinstance(
            ref, ray.ObjectRef) else ref
        vids = np.asarray(batch["vec_id"], dtype=np.int64)
        mat = list_matrix(batch["embedding"])
        mn = mat / np.maximum(
            np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        n = len(mn)
        if n == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "score": pa.array([], pa.float64())})
        ms_, nc_, d_ = books_.shape
        sub = mn.reshape(n, ms_, d_)
        codes = np.empty((n, ms_), dtype=np.int64)
        for s in range(ms_):
            codes[:, s] = sqdist(sub[:, s, :], books_[s]).argmin(axis=1)
        adc = np.zeros((len(ids_), n))
        for s in range(ms_):
            adc += lut_[:, s, codes[:, s]]
        S = n if shortlist is None else min(shortlist, n)
        cand = (np.argpartition(-adc, S - 1, axis=1)[:, :S]
                if S < n else np.tile(np.arange(n), (len(ids_), 1)))
        # exact re-rank of the shortlist only: (nq, S, dim) gather is
        # bounded by S, never the block size
        sims = np.einsum("qd,qsd->qs", qn_, mn[cand])
        kk = min(k, S)
        top = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.arange(len(ids_))[:, None]
        return pa.table({
            "query_id": pa.array(np.repeat(ids_, kk), pa.int64()),
            "vec_id": pa.array(vids[cand[rows, top].ravel()], pa.int64()),
            "score": pa.array(sims[rows, top].ravel(), pa.float64())})

    partial = embeddings.map_batches(_score, batch_format="pyarrow",
                                     zero_copy_batch=True,
                                     batch_size=batch_size)
    return partial.groupby("query_id").map_groups(
        functools.partial(_topk_merge, k=k), batch_format="pyarrow")


def late_interaction_topk(embeddings, query_rows, k: int = 5,
                          group_div: int = 8, batch_size: int = 4096):
    """Late-interaction (MaxSim) multi-vector retrieval: corpus vectors
    group into documents (``doc = vec_id // group_div``); a document's
    score is Σ over query vectors of the MAX cosine against any of its
    vectors (the ColBERT scoring rule).  Returns the top-``k`` docs as
    (doc_id, rank, score).

    Shape: the query matrix broadcasts once (``ray.put``); each block
    computes its (doc, query) max-cos partials with one matmul; a
    (doc, q) max groupby then a per-doc sum reduce — both exchanges are
    bounded by docs × query-vectors, never corpus vectors.  Each
    per-query max rounds to int64 micro-units BEFORE the sum (max is
    order-free; float sums are not), so the doc score is exact and
    DuckDB replays it bit-for-bit."""
    qids, qmat = _as_matrix(query_rows)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True),
                           1e-12)
    query_ref = ray.put((qids, qn))

    def _partial(batch: pa.Table) -> pa.Table:
        _, qn_ = ray.get(query_ref) if isinstance(
            query_ref, ray.ObjectRef) else query_ref
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        mat = list_matrix(batch["embedding"])
        mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                              1e-12)
        sims = qn_ @ mn.T  # (q, rows)
        docs = ids // group_div
        uniq, inv = np.unique(docs, return_inverse=True)
        nq = sims.shape[0]
        acc = np.full((nq, len(uniq)), -2.0)
        for qi in range(nq):
            np.maximum.at(acc[qi], inv, sims[qi])
        return pa.table({
            "doc": pa.array(np.tile(uniq, nq), pa.int64()),
            "q": pa.array(np.repeat(np.arange(nq, dtype=np.int64),
                                    len(uniq))),
            "mx": pa.array(acc.ravel(), pa.float64())})

    partials = embeddings.map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size)
    per_q = (partials.groupby(["doc", "q"]).max("mx")
             .rename_columns({"max(mx)": "mx"}))

    def _fx(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        fx = pc.cast(pc.round(pc.multiply(batch["mx"],
                                          pa.scalar(1e6)),
                              round_mode="half_towards_infinity"),
                     pa.int64())
        return pa.table({"doc": batch["doc"], "fx": fx})

    per_doc = (per_q.map_batches(_fx, batch_format="pyarrow",
                                 zero_copy_batch=True)
               .groupby("doc").sum("fx")
               .rename_columns({"sum(fx)": "score_fx"}))
    top = per_doc.sort(["score_fx", "doc"],
                       descending=[True, False]).limit(k).repartition(1)

    def _shape(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            "doc_id": batch["doc"].cast(pa.int64()),
            "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "score": pa.array(
                np.asarray(batch["score_fx"], dtype=np.int64) / 1e6,
                pa.float64())})

    return top.map_batches(_shape, batch_format="pyarrow")


def rrf_fuse(ranked_lists, k: int = 10, c: int = 60):
    """Reciprocal-rank fusion over multiple retrievers' (query_id,
    vec_id, rank) lists: fused score = Σ_retriever 1/(c + rank) — the
    standard zero-tuning rank-fusion rule.  Each term rounds to int64
    nano-units BEFORE the sum (float sums are order-dependent; the
    per-term value is deterministic), so the fused ranking is exact.
    Returns (query_id, vec_id, rank, score_fx) per query top-``k``.

    Shape: the tagged union of rank lists co-partitions on
    (query_id, vec_id); the per-query top-k is a groupby + in-group
    sort over ≤ Σ k_i candidates."""
    import functools

    import pyarrow.compute as pc
    import ray.data as rd

    from trustfuse_ray.stages.common import hash_group_apply

    def _term(batch: pa.Table) -> pa.Table:
        r = np.asarray(batch["rank"], dtype=np.int64)
        fx = np.round(1e9 / (c + r)).astype(np.int64)
        return pa.table({"query_id": batch["query_id"].cast(pa.int64()),
                         "vec_id": batch["vec_id"].cast(pa.int64()),
                         "fx": pa.array(fx, pa.int64())})

    tagged = None
    for ds in ranked_lists:
        t = ds.map_batches(_term, batch_format="pyarrow",
                           zero_copy_batch=True)
        tagged = t if tagged is None else tagged.union(t)
    sums = (tagged.groupby(["query_id", "vec_id"]).sum("fx")
            .rename_columns({"sum(fx)": "score_fx"}))

    def _topk(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("score_fx", "descending"),
                              ("vec_id", "ascending")])
        g = group.take(order[:k])
        n = len(g)
        return pa.table({
            "query_id": g["query_id"],
            "vec_id": g["vec_id"],
            "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
            "score_fx": g["score_fx"]})

    return hash_group_apply(
        sums, ["query_id"], _topk, n_parts=8,
        plasma_schema=pa.schema([("query_id", pa.int64()),
                                 ("vec_id", pa.int64()),
                                 ("rank", pa.int64()),
                                 ("score_fx", pa.int64())]))


def _quant_fx(mat: np.ndarray, scale: int) -> np.ndarray:
    """float matrix → int64 fixed point, half-away-from-zero (matches
    DuckDB round() and pc.round half_towards_infinity)."""
    v = mat.astype(np.float64) * scale
    return np.where(v >= 0, np.floor(v + 0.5),
                    -np.floor(-v + 0.5)).astype(np.int64)


def kmeans_embeddings(emb, k: int = 8, iters: int = 2,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      scale: int = 1_000_000):
    """Distributed Lloyd k-means over an embedding column, exact and
    bit-deterministic: embeddings and centroids live in int64 fixed point
    (half-away-from-zero, the q1 parity pattern), so squared distances,
    argmin assignment (ties → lowest cluster id) and the dim-wise cluster
    sums are all integer-exact — no float-summation-order dependence
    between block layouts, cluster topologies, or the SQL oracle.

    Per iteration: centroids are broadcast in the task closure (k × dim
    ints — KB-scale), each block emits O(k × dim) partial sums, one tiny
    groupby reduces them, and the driver re-derives centroids
    (``round(sum/count)`` — empty clusters keep their previous centroid).
    Init = the k lowest-id embeddings (at corpus scale seed from a
    sample instead; k rows either way).  Returns (vec_id, cluster)."""
    import pyarrow.compute as pc

    k = int(k)
    init = emb.select_columns([id_col, vec_col]).sort(id_col).limit(k) \
              .take_all()
    cent = _quant_fx(np.stack([np.asarray(r[vec_col], np.float64)
                               for r in init]), scale)

    def _assign_fx(q: np.ndarray, c: np.ndarray) -> np.ndarray:
        # |q - c|² expanded with int64 matmuls: exact, no n×k×dim blowup
        d = (np.einsum("nd,nd->n", q, q)[:, None]
             - 2 * q @ c.T + np.einsum("kd,kd->k", c, c)[None, :])
        return np.argmin(d, axis=1)            # ties → first (lowest cid)

    for _ in range(iters):
        def _partial(batch: pa.Table, cent=cent) -> pa.Table:
            q = _quant_fx(list_matrix(batch[vec_col]), scale)
            a = _assign_fx(q, cent)
            dim = q.shape[1]
            sums = np.zeros((k, dim), np.int64)
            np.add.at(sums, a, q)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            # carry counts on dim 0 only so the (cluster, dim) groupby
            # sums them exactly once per block
            cnt_col = np.zeros((k, dim), np.int64)
            cnt_col[:, 0] = cnt
            return pa.table({
                "cluster": pa.array(np.repeat(np.arange(k, dtype=np.int64),
                                              dim), pa.int64()),
                "dim_idx": pa.array(np.tile(np.arange(dim, dtype=np.int64),
                                            k), pa.int64()),
                "s": pa.array(sums.ravel(), pa.int64()),
                "cnt": pa.array(cnt_col.ravel(), pa.int64()),
            })

        rows = (emb.select_columns([vec_col]).map_batches(
                    _partial, batch_format="pyarrow", zero_copy_batch=True)
                .groupby(["cluster", "dim_idx"]).sum(["s", "cnt"])
                .take_all())                   # k × dim rows — tiny
        dim = cent.shape[1]
        sums = np.zeros((k, dim), np.int64)
        cnt = np.zeros(k, np.int64)
        for r in rows:
            sums[r["cluster"], r["dim_idx"]] = r["sum(s)"]
            if r["dim_idx"] == 0:
                cnt[r["cluster"]] = r["sum(cnt)"]
        new = cent.copy()
        nz = cnt > 0
        ratio = sums[nz].astype(np.float64) / cnt[nz, None].astype(np.float64)
        new[nz] = np.where(ratio >= 0, np.floor(ratio + 0.5),
                           -np.floor(-ratio + 0.5)).astype(np.int64)
        cent = new

    def _final(batch: pa.Table, cent=cent) -> pa.Table:
        q = _quant_fx(list_matrix(batch[vec_col]), scale)
        a = _assign_fx(q, cent)
        return pa.table({
            id_col: pc.cast(batch[id_col], pa.int64()),
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
        })

    return emb.select_columns([id_col, vec_col]).map_batches(
        _final, batch_format="pyarrow", zero_copy_batch=True)


def mmr_diverse_topk(emb, queries, k: int = 5, shortlist: int = 50,
                     vec_col: str = "embedding", scale: int = 1_000_000):
    """Maximal-marginal-relevance diverse top-k (λ=0.5): greedy picks
    maximize ``rel(q, d) − max_{s∈selected} sim(d, s)`` (both inner
    products of int64 fixed-point vectors — exact, tie → lowest vec_id).

    Scale shape: one streaming pass scores every candidate against the
    broadcast query matrix and keeps a per-block top-``shortlist`` per
    query; a tiny per-query merge caps the global shortlist; the greedy
    selection then runs on the driver over shortlist×dim ints (KB-scale).
    The full corpus is never shuffled and never visited more than once.

    Returns (query_id, vec_id, pick) with pick = 1..k selection order."""
    import pyarrow.compute as pc

    from trustfuse_ray.stages.common import hash_group_apply

    qids = np.array([r["vec_id"] for r in queries], dtype=np.int64)
    qmat = _quant_fx(np.stack([np.asarray(r[vec_col], np.float64)
                               for r in queries]), scale)
    ref = ray.put((qids, qmat))

    def _partial(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        d = _quant_fx(list_matrix(batch[vec_col]), scale)      # n × dim
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        rel = d @ qm.T                                         # n × nq
        out_q, out_v, out_r, out_vecs = [], [], [], []
        m = min(len(ids), shortlist)
        for j in range(len(qi)):
            # block-local top-m by (rel desc, vec_id asc)
            order = np.lexsort((ids, -rel[:, j]))[:m]
            out_q.append(np.full(m, qi[j], np.int64))
            out_v.append(ids[order])
            out_r.append(rel[order, j])
            out_vecs.append(d[order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "rel": pa.array(np.concatenate(out_r), pa.int64()),
            "vec": pa.array(list(np.concatenate(out_vecs)),
                            pa.list_(pa.int64())),
        })

    partial = emb.select_columns(["vec_id", vec_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)

    def _merge(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("rel", "descending"),
                                                  ("vec_id", "ascending")])
        return group.take(order[:shortlist])

    sl_schema = pa.schema([("query_id", pa.int64()),
                           ("vec_id", pa.int64()), ("rel", pa.int64()),
                           ("vec", pa.list_(pa.int64()))])
    short = hash_group_apply(partial, ["query_id"], _merge, n_parts=8,
                             plasma_schema=sl_schema).take_all()

    by_q: dict[int, list] = {}
    for r in short:
        by_q.setdefault(int(r["query_id"]), []).append(r)
    out_q, out_v, out_p = [], [], []
    for qid in sorted(by_q):
        rows = sorted(by_q[qid],
                      key=lambda r: (-int(r["rel"]), int(r["vec_id"])))
        ids = np.array([r["vec_id"] for r in rows], np.int64)
        rel = np.array([r["rel"] for r in rows], np.int64)
        vecs = np.stack([np.asarray(r["vec"], np.int64) for r in rows])
        pair = vecs @ vecs.T                                    # m × m
        picked: list[int] = []
        remaining = np.ones(len(ids), bool)
        for step in range(min(k, len(ids))):
            if step == 0:
                score = rel.copy()
            else:
                score = rel - pair[:, picked].max(axis=1)
            cand = np.flatnonzero(remaining)
            best = int(cand[np.lexsort((ids[cand], -score[cand]))[0]])
            picked.append(best)
            remaining[best] = False
            out_q.append(qid)
            out_v.append(int(ids[best]))
            out_p.append(step + 1)
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "vec_id": pa.array(out_v, pa.int64()),
        "pick": pa.array(out_p, pa.int64()),
    }))


# ---------------------------------------------------------------------------
# Nearest-centroid confusion matrix (embedding-space label coherence)
# ---------------------------------------------------------------------------

def centroid_confusion(emb, label_col: str = "label",
                       vec_col: str = "embedding", scale: int = 10_000):
    """Confusion matrix of a nearest-centroid classifier trained on the
    label column itself — the standard embedding-space label-coherence
    audit (a diagonal-heavy matrix means labels form tight clusters;
    off-diagonal mass flags label noise or entangled classes).  Returns
    ``(label, pred_label, n)``.

    Exact fixed point end to end: embeddings quantize half-away-from-zero
    (the q1 parity pattern), centroid coordinates are FLOOR-divided
    integer means (``sum_fx // n``), and squared distances / argmin (ties
    → lowest label) are int64 arithmetic — bit-deterministic across block
    layouts and replayable by the SQL oracle.

    Scale shape: pass 1 is :func:`embedding_centroids` (O(labels × dim)
    partial state per block, one tiny reduce — the only driver
    materialization is the labels × dim centroid table); pass 2
    broadcasts that KB-scale matrix in the task closure and each block
    emits map-side pre-counted (label, pred) pairs, so the final groupby
    moves at most labels² rows per block."""
    import ray.data as rd

    out_schema = pa.schema([("label", pa.int64()),
                            ("pred_label", pa.int64()),
                            ("n", pa.int64())])
    cents = (embedding_centroids(emb, label_col=label_col, vec_col=vec_col,
                                 scale=scale)
             .select_columns([label_col, "dim_idx", "sum_fx", "n"])
             .take_all())                       # O(labels × dim) rows
    if not cents:
        return rd.from_arrow(out_schema.empty_table())
    by_label: dict = {}
    for r in cents:
        by_label.setdefault(int(r[label_col]), {})[int(r["dim_idx"])] = \
            (int(r["sum_fx"]), int(r["n"]))
    labels_sorted = np.array(sorted(by_label), np.int64)
    dim = 1 + max(d for dims in by_label.values() for d in dims)
    cent = np.zeros((len(labels_sorted), dim), np.int64)
    for i, lab in enumerate(labels_sorted):
        for dx, (s, n) in by_label[int(lab)].items():
            cent[i, dx] = s // n                # floor div, matches oracle
    nk = len(labels_sorted)
    c_sq = np.einsum("kd,kd->k", cent, cent)

    def _pairs(batch: pa.Table) -> pa.Table:
        q = _quant_fx(list_matrix(batch[vec_col]), scale)
        d = (np.einsum("nd,nd->n", q, q)[:, None]
             - 2 * q @ cent.T + c_sq[None, :])
        pred = np.argmin(d, axis=1)             # ties → lowest label
        true_ix = np.searchsorted(
            labels_sorted,
            np.asarray(batch[label_col], dtype=np.int64))
        cnt = np.bincount(true_ix * nk + pred, minlength=nk * nk)
        nz = np.flatnonzero(cnt)
        return pa.table({
            "label": pa.array(labels_sorted[nz // nk], pa.int64()),
            "pred_label": pa.array(labels_sorted[nz % nk], pa.int64()),
            "n": pa.array(cnt[nz], pa.int64()),
        })

    pairs = emb.select_columns([label_col, vec_col]).map_batches(
        _pairs, batch_format="pyarrow", zero_copy_batch=True)
    return (pairs.groupby(["label", "pred_label"]).sum("n")
            .rename_columns({"sum(n)": "n"}))


def label_cohesion(emb, label_col: str = "label",
                   vec_col: str = "embedding", scale: int = 10_000):
    """Per-label cluster cohesion WITHOUT a pairwise pass: the sum of
    squared distances over all ordered intra-label pairs satisfies
    ``Σ_{i,j} |q_i − q_j|² = 2·(n·Σ|q_i|² − |Σ q_i|²)``, so it reduces to
    the same O(labels × dim) partial sums the centroid op ships.  Returns
    ``(label, n, pair_num, pairs)`` with ``pair_num`` the exact integer
    Σ-of-squared-distances over ordered pairs and ``pairs = n·(n−1)`` its
    denominator — callers divide for the mean; keeping the fraction
    integer keeps the audit bit-deterministic.

    Scale shape: one map_batches emitting per-label (n, Σ|q|², per-dim
    Σq) partials, one tiny groupby, then per-label arithmetic on rows
    bounded by the label universe.  Embeddings never shuffle."""
    import pyarrow.compute as pc_

    def _partial(batch: pa.Table) -> pa.Table:
        q = _quant_fx(list_matrix(batch[vec_col]), scale)
        labels = batch[label_col]
        enc = (labels.combine_chunks()
               if isinstance(labels, pa.ChunkedArray) else labels)
        enc = enc.dictionary_encode() if not pa.types.is_dictionary(
            enc.type) else enc
        kidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nk, dim = len(enc.dictionary), q.shape[1]
        sums = np.zeros((nk, dim), np.int64)
        np.add.at(sums, kidx, q)
        ssq = np.zeros(nk, np.int64)
        np.add.at(ssq, kidx, np.einsum("nd,nd->n", q, q))
        cnt = np.bincount(kidx, minlength=nk).astype(np.int64)
        return pa.table({
            "label": enc.dictionary.take(
                pa.array(np.repeat(np.arange(nk), dim))).cast(pa.int64()),
            "dim_idx": pa.array(np.tile(np.arange(dim, dtype=np.int64),
                                        nk), pa.int64()),
            "s": pa.array(sums.ravel(), pa.int64()),
            # carry the scalar per-label stats on dim 0 only so the
            # (label, dim) groupby reduces them exactly once per block
            "ssq": pa.array((ssq[:, None] * (np.arange(dim) == 0)
                             ).ravel(), pa.int64()),
            "n": pa.array((cnt[:, None] * (np.arange(dim) == 0)
                           ).ravel(), pa.int64()),
        })

    agg = (emb.select_columns([label_col, vec_col])
           .map_batches(_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby(["label", "dim_idx"]).sum(["s", "ssq", "n"]))

    def _per_dim_sq(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["sum(s)"], dtype=np.int64)
        return pa.table({
            "label": batch["label"],
            "s2": pa.array(s * s, pa.int64()),
            "ssq": batch["sum(ssq)"],
            "n": batch["sum(n)"],
        })

    tot = (agg.map_batches(_per_dim_sq, batch_format="pyarrow",
                           zero_copy_batch=True)
           .groupby("label").sum(["s2", "ssq", "n"]))

    def _finish(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["sum(n)"], dtype=np.int64)
        ssq = np.asarray(batch["sum(ssq)"], dtype=np.int64)
        s2 = np.asarray(batch["sum(s2)"], dtype=np.int64)
        return pa.table({
            "label": batch["label"],
            "n": pa.array(n, pa.int64()),
            "pair_num": pa.array(2 * (n * ssq - s2), pa.int64()),
            "pairs": pa.array(n * (n - 1), pa.int64()),
        })

    return tot.map_batches(_finish, batch_format="pyarrow",
                           zero_copy_batch=True)


def centroid_separation(emb, label_col: str = "label",
                        vec_col: str = "embedding", scale: int = 10_000):
    """Pairwise inter-centroid squared distances
    ``(label_a < label_b, dist2)`` in exact int64 fixed point — the
    between-cluster half of the cohesion/confusion audit trio (a
    Davies-Bouldin-style ratio is cohesion ÷ separation, computed by the
    caller from the two integer tables).

    Centroid coordinates are the same floor-divided integer means
    :func:`centroid_confusion` uses, so the two audits agree bit-exactly.
    Scale shape: everything after the O(labels × dim) centroid reduce is
    driver-local arithmetic on a labels² table — KB-scale."""
    import ray.data as rd

    out_schema = pa.schema([("label_a", pa.int64()),
                            ("label_b", pa.int64()),
                            ("dist2", pa.int64())])
    cents = (embedding_centroids(emb, label_col=label_col, vec_col=vec_col,
                                 scale=scale)
             .select_columns([label_col, "dim_idx", "sum_fx", "n"])
             .take_all())                       # O(labels × dim) rows
    if not cents:
        return rd.from_arrow(out_schema.empty_table())
    by_label: dict = {}
    for r in cents:
        by_label.setdefault(int(r[label_col]), {})[int(r["dim_idx"])] = \
            (int(r["sum_fx"]), int(r["n"]))
    labels_sorted = sorted(by_label)
    dim = 1 + max(d for dims in by_label.values() for d in dims)
    cent = np.zeros((len(labels_sorted), dim), np.int64)
    for i, lab in enumerate(labels_sorted):
        for dx, (s, n) in by_label[lab].items():
            cent[i, dx] = s // n
    a_ix, b_ix = np.triu_indices(len(labels_sorted), k=1)
    d2 = ((cent[a_ix] - cent[b_ix]) ** 2).sum(axis=1)
    labs = np.asarray(labels_sorted, np.int64)
    return rd.from_arrow(pa.table({
        "label_a": pa.array(labs[a_ix], pa.int64()),
        "label_b": pa.array(labs[b_ix], pa.int64()),
        "dist2": pa.array(d2.astype(np.int64), pa.int64()),
    }))


def retrieval_mrr(emb, queries, k: int = 10, vec_col: str = "embedding",
                  scale: int = 1_000_000):
    """Retrieval evaluation with planted relevance: rank the corpus per
    query by exact int64 fixed-point inner product (self excluded, tie →
    lowest vec_id) and report the rank of the first SAME-LABEL hit inside
    the top-``k`` — MRR as the exact integer ``1e6 // rank`` (0 = miss).

    Scale shape: one streaming corpus pass keeps a per-block top-k per
    query; a tiny per-query merge finds the first relevant rank.  The
    corpus never shuffles; per-query state is k rows."""
    import pyarrow.compute as pc

    from trustfuse_ray.stages.common import hash_group_apply

    qids = np.array([r["vec_id"] for r in queries], dtype=np.int64)
    qmat = _quant_fx(np.stack([np.asarray(r[vec_col], np.float64)
                               for r in queries]), scale)
    qlab = {int(r["vec_id"]): int(r["label"]) for r in queries}
    ref = ray.put((qids, qmat))

    def _partial(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        d = _quant_fx(list_matrix(batch[vec_col]), scale)
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        labs = np.asarray(batch["label"], dtype=np.int64)
        rel = d @ qm.T
        out_q, out_v, out_r, out_l = [], [], [], []
        for j in range(len(qi)):
            keep = ids != qi[j]
            bi, br, bl = ids[keep], rel[keep, j], labs[keep]
            m = min(len(bi), k)
            order = np.lexsort((bi, -br))[:m]
            out_q.append(np.full(m, qi[j], np.int64))
            out_v.append(bi[order])
            out_r.append(br[order])
            out_l.append(bl[order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "rel": pa.array(np.concatenate(out_r), pa.int64()),
            "label": pa.array(np.concatenate(out_l), pa.int64())})

    partial = emb.select_columns(["vec_id", vec_col, "label"]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)

    out_schema = pa.schema([("query_id", pa.int64()),
                            ("q_label", pa.int64()),
                            ("first_rel_rank", pa.int64()),
                            ("rr_fixed", pa.int64())])

    def _merge(group: pa.Table) -> pa.Table:
        qid = int(group["query_id"][0].as_py())
        order = pc.sort_indices(group, sort_keys=[("rel", "descending"),
                                                  ("vec_id", "ascending")])
        top = group.take(order[:k])
        want = qlab[qid]
        labs = np.asarray(top["label"], dtype=np.int64)
        hits = np.nonzero(labs == want)[0]
        rank = int(hits[0]) + 1 if len(hits) else 0
        rr = 1_000_000 // rank if rank else 0
        return pa.table({"query_id": pa.array([qid], pa.int64()),
                         "q_label": pa.array([want], pa.int64()),
                         "first_rel_rank": pa.array([rank], pa.int64()),
                         "rr_fixed": pa.array([rr], pa.int64())})

    return hash_group_apply(partial, ["query_id"], _merge, n_parts=8,
                            plasma_schema=out_schema)


def rocchio_topk(emb, queries, k: int = 5, fb: int = 3,
                 vec_col: str = "embedding", scale: int = 1_000_000):
    """Pseudo-relevance-feedback retrieval (Rocchio, α=β=1): round 1
    takes the top-``fb`` docs per query by exact int64 inner product
    (self excluded); the expanded query is the integer sum of the
    original vector and the feedback vectors; round 2 re-ranks the
    corpus against the expanded queries.  Tie → lowest vec_id, exact
    fixed point end-to-end.

    Scale shape: two streaming corpus passes against KB-scale broadcast
    query matrices with per-block top-m partials — the corpus never
    shuffles and the driver only ever holds fb × dim ints per query."""
    import pyarrow.compute as pc

    from trustfuse_ray.stages.common import hash_group_apply

    qids = np.array([r["vec_id"] for r in queries], dtype=np.int64)
    qmat = _quant_fx(np.stack([np.asarray(r[vec_col], np.float64)
                               for r in queries]), scale)
    ref = ray.put((qids, qmat))

    def _partial1(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref)
        d = _quant_fx(list_matrix(batch[vec_col]), scale)
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        rel = d @ qm.T
        out_q, out_v, out_r, out_vecs = [], [], [], []
        for j in range(len(qi)):
            keep = ids != qi[j]
            bi, br, bd = ids[keep], rel[keep, j], d[keep]
            m = min(len(bi), fb)
            order = np.lexsort((bi, -br))[:m]
            out_q.append(np.full(m, qi[j], np.int64))
            out_v.append(bi[order])
            out_r.append(br[order])
            out_vecs.append(bd[order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "rel": pa.array(np.concatenate(out_r), pa.int64()),
            "vec": pa.array(list(np.concatenate(out_vecs)),
                            pa.list_(pa.int64()))})

    p1 = emb.select_columns(["vec_id", vec_col]).map_batches(
        _partial1, batch_format="pyarrow", zero_copy_batch=True)

    fb_schema = pa.schema([("query_id", pa.int64()),
                           ("vec_id", pa.int64()), ("rel", pa.int64()),
                           ("vec", pa.list_(pa.int64()))])

    def _fb_merge(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("rel", "descending"),
                                                  ("vec_id", "ascending")])
        return group.take(order[:fb])

    fb_rows = hash_group_apply(p1, ["query_id"], _fb_merge, n_parts=8,
                               plasma_schema=fb_schema).take_all()
    q2 = {int(q): v.copy() for q, v in zip(qids, qmat)}
    for r in fb_rows:
        q2[int(r["query_id"])] += np.asarray(r["vec"], dtype=np.int64)
    q2mat = np.stack([q2[int(q)] for q in qids])
    ref2 = ray.put((qids, q2mat))

    def _partial2(batch: pa.Table) -> pa.Table:
        qi, qm = ray.get(ref2)
        d = _quant_fx(list_matrix(batch[vec_col]), scale)
        ids = np.asarray(batch["vec_id"], dtype=np.int64)
        rel = d @ qm.T
        out_q, out_v, out_r = [], [], []
        for j in range(len(qi)):
            keep = ids != qi[j]
            bi, br = ids[keep], rel[keep, j]
            m = min(len(bi), k)
            order = np.lexsort((bi, -br))[:m]
            out_q.append(np.full(m, qi[j], np.int64))
            out_v.append(bi[order])
            out_r.append(br[order])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
            "score_fx": pa.array(np.concatenate(out_r), pa.int64())})

    p2 = emb.select_columns(["vec_id", vec_col]).map_batches(
        _partial2, batch_format="pyarrow", zero_copy_batch=True)

    out_schema = pa.schema([("query_id", pa.int64()),
                            ("vec_id", pa.int64()), ("rank", pa.int64()),
                            ("score_fx", pa.int64())])

    def _final(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group,
                                sort_keys=[("score_fx", "descending"),
                                           ("vec_id", "ascending")])
        top = group.take(order[:k])
        return pa.table({
            "query_id": top["query_id"],
            "vec_id": top["vec_id"],
            "rank": pa.array(np.arange(1, len(top) + 1, dtype=np.int64)),
            "score_fx": top["score_fx"]})

    return hash_group_apply(p2, ["query_id"], _final, n_parts=8,
                            plasma_schema=out_schema)


def embedding_standardize_stats(emb, vec_col: str = "embedding",
                                scale: int = 1_000_000):
    """Per-dimension standardization statistics over the embedding
    column in exact int64 fixed point: n, Σq, Σq² and the truncated
    mean — the whitening-prep pass (and drift monitor) for any
    downstream scorer.  Division truncates toward zero on both engine
    and SQL sides (DuckDB ``//`` semantics).

    Scale shape: each block emits O(dim) partial-sum rows; one
    dim-bounded groupby; embeddings never shuffle."""
    def _partial(batch: pa.Table) -> pa.Table:
        q = _quant_fx(list_matrix(batch[vec_col]), scale)
        n, dim = q.shape
        return pa.table({
            "dim": pa.array(np.arange(dim, dtype=np.int64)),
            "n": pa.array(np.full(dim, n, np.int64)),
            "sum_q": pa.array(q.sum(axis=0, dtype=np.int64)),
            "sumsq_q": pa.array((q * q).sum(axis=0, dtype=np.int64))})

    agg = (emb.select_columns([vec_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dim").sum(["n", "sum_q", "sumsq_q"])
        .rename_columns({"sum(n)": "n", "sum(sum_q)": "sum_q",
                         "sum(sumsq_q)": "sumsq_q"}))

    def _shape(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["sum_q"], dtype=np.int64)
        n = np.asarray(batch["n"], dtype=np.int64)
        mean = np.where(s >= 0, s // np.maximum(n, 1),
                        -((-s) // np.maximum(n, 1)))
        return batch.append_column("mean_fx",
                                   pa.array(mean, pa.int64()))

    return agg.map_batches(_shape, batch_format="pyarrow",
                           zero_copy_batch=True)


def lsh_bucket_profile(emb, n_planes: int = 8, seed: int = 11,
                       vec_col: str = "embedding"):
    """Occupancy profile of the hyperplane-LSH index: vectors and
    permille share per bucket — the skew report that decides whether an
    LSH index needs more planes or multi-probe before deployment.

    Scale shape: bucket assignment is the float64 projection per block
    (same kernel as lsh_topk); per-block bincount partials bound the
    exchange to ≤ 2^planes rows per block."""
    def _partial(batch: pa.Table) -> pa.Table:
        dim = len(batch[vec_col][0].as_py())
        lsh = HyperplaneLSH(dim, n_planes, seed)
        b = lsh.bucket_of(list_matrix(batch[vec_col])).astype(np.int64)
        uk, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket": pa.array(uk, pa.int64()),
                         "n_vectors": pa.array(cnt.astype(np.int64),
                                               pa.int64())})

    agg = (emb.select_columns([vec_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket").sum("n_vectors")
        .rename_columns({"sum(n_vectors)": "n_vectors"}))
    rows = agg.take_all()          # ≤ 2^n_planes rows
    total = sum(r["n_vectors"] for r in rows) or 1
    rows.sort(key=lambda r: r["bucket"])
    return pa.table({
        "bucket": pa.array([r["bucket"] for r in rows], pa.int64()),
        "n_vectors": pa.array([r["n_vectors"] for r in rows],
                              pa.int64()),
        "share_permille": pa.array(
            [r["n_vectors"] * 1000 // total for r in rows], pa.int64())})
