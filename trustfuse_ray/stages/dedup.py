"""Deduplication operators for document corpora at scale.

All flavors follow the same distributed shape: a vectorized per-batch
signature stage (map_batches, actor pool where state amortizes), then a
hash-partitioned ``groupby`` on the signature to co-locate candidates, then
per-group verification.  Nothing materializes the corpus on the driver.

* exact: md5-of-canonical-text → groupby(fp) keep min doc_id
* MinHash + LSH: shingle → k minhashes → b bands → groupby(band, band_hash)
  → candidate pairs verified by full signature similarity
* SimHash: 64-bit sign-of-weighted-feature-sums; near-dups = Hamming ≤ k
  within LSH buckets over bit-slices
* n-gram Jaccard: verification kernel on candidate pairs
* embedding cosine: near-dup pairs over an embedding column (see ann.py for
  the search variant)
"""

from __future__ import annotations

import hashlib
import re
import struct

import numpy as np
import pyarrow as pa

from trustfuse_ray.stages.common import hash_group_apply
from trustfuse_ray.stages.text import canonical_text

_WORD = re.compile(r"\w+")


def _stable_hash64(data: bytes) -> int:
    return struct.unpack("<Q", hashlib.blake2b(data, digest_size=8).digest())[0]


def shingles(text: str, k: int = 3) -> set[bytes]:
    """Word k-shingles of canonical text."""
    toks = _WORD.findall(text)
    if len(toks) < k:
        return {(" ".join(toks)).encode()} if toks else set()
    return {" ".join(toks[i:i + k]).encode() for i in range(len(toks) - k + 1)}


class MinHasher:
    """Actor-pool minhash signature stage.

    The permutation parameters (a, b, prime) are generated once per actor in
    ``__init__`` from a fixed seed — identical across actors, deterministic
    across runs."""

    PRIME = (1 << 31) - 1  # Mersenne; a*x fits uint64 → fully vectorized

    def __init__(self, num_hashes: int = 64, shingle_k: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, self.PRIME, size=num_hashes,
                              dtype=np.uint64)
        self.b = rng.integers(0, self.PRIME, size=num_hashes,
                              dtype=np.uint64)
        self.k = shingle_k
        self.num = num_hashes

    def signature(self, text: str) -> np.ndarray:
        sh = shingles(text, self.k)
        if not sh:
            return np.full(self.num, self.PRIME, dtype=np.uint64)
        # vectorized stable shingle hashing (pandas hash_array is a C
        # SipHash with a fixed key — deterministic across processes)
        import pandas as pd

        base = (pd.util.hash_array(
            np.array([s.decode() for s in sh], dtype=object))
            & np.uint64(0x7FFFFFFF)).astype(np.uint64)
        # (a*x + b) mod p per permutation, vectorized over shingles (uint64)
        vals = (self.a[:, None] * base[None, :] + self.b[:, None]) % self.PRIME
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = canonical_text(batch["text"]).to_pylist()
        sigs = [self.signature(t or "") for t in texts]
        # int32 storage: values < 2^31, halves the band-shuffle bytes
        return pa.table({
            "doc_id": batch["doc_id"],
            "minhash": pa.array([s.astype(np.int32).tolist() for s in sigs],
                                pa.list_(pa.int32())),
        })


_HASHER_CACHE: dict = {}


def _sig_batch(batch: pa.Table, *, num_hashes: int, shingle_k: int,
               seed: int = 7) -> pa.Table:
    """Task-pool signature stage with a per-process MinHasher memo: the
    permutation table is tiny, so warm task workers beat dedicated actor
    spin-up (32 fresh actor processes cost multiple seconds); the state is
    still built once per worker process."""
    key = (num_hashes, shingle_k, seed)
    h = _HASHER_CACHE.get(key)
    if h is None:
        h = _HASHER_CACHE[key] = MinHasher(num_hashes, shingle_k, seed)
    return h(batch)


def _band_rows(batch: pa.Table, *, bands: int, rows: int) -> pa.Table:
    """(doc_id, band, band_hash) only — signatures do NOT ride the shuffle
    (they are broadcast once; ~640k x 300B rows would otherwise dominate)."""
    doc_ids, band_ids, band_hash = [], [], []
    for did, sig in zip(batch["doc_id"].to_pylist(),
                        batch["minhash"].to_pylist()):
        for b in range(bands):
            chunk = sig[b * rows:(b + 1) * rows]
            h = _stable_hash64(struct.pack(f"<{rows}i", *chunk))
            doc_ids.append(did)
            band_ids.append(b)
            band_hash.append(h & 0x7FFFFFFFFFFFFFFF)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "band": pa.array(band_ids, pa.int32()),
        "band_hash": pa.array(band_hash, pa.int64()),
    })


_BCAST_CACHE: dict = {}


def _resolve_broadcast(ref):
    """Per-process memo of ray.get on a broadcast ref (the object itself is
    zero-copy shared memory; the memo only skips repeated handle churn)."""
    import ray

    if not isinstance(ref, ray.ObjectRef):
        return ref
    key = ref.hex()
    if key not in _BCAST_CACHE:
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


def _bucket_pairs(batch: pa.Table, *, threshold: float, sig_ref) -> pa.Table:
    """One LSH bucket group → verified candidate pairs (signature Jaccard
    against the broadcast signature matrix)."""
    ids_arr, sig_mat = _resolve_broadcast(sig_ref)
    ids = batch["doc_id"].to_pylist()
    pos = np.searchsorted(ids_arr, ids)
    out_a, out_b, est = [], [], []
    n = len(ids)
    for i in range(n):
        si = sig_mat[pos[i]]
        for j in range(i + 1, n):
            if ids[i] == ids[j]:
                continue
            sim = float((si == sig_mat[pos[j]]).mean())
            if sim >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out_a.append(a)
                out_b.append(b)
                est.append(sim)
    return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                     "doc_b": pa.array(out_b, pa.int64()),
                     "jaccard_est": pa.array(est, pa.float64())})


def minhash_lsh_pairs(docs, num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.7, shingle_k: int = 3,
                      concurrency=(1, 8)):
    """documents → near-duplicate pairs (doc_a < doc_b, jaccard_est).

    shingle→minhash (actor pool) → signature matrix broadcast via ray.put
    (64 x int32 per doc: ~0.25 GB per million docs; shard the broadcast
    beyond that) → (band, band_hash, doc_id) shuffle → per-bucket pair
    verification against the broadcast → global pair dedup.
    """
    rows = num_hashes // bands
    import functools

    import ray

    # single-file corpora read as a handful of blocks; re-split so the
    # signature stage actually fans out
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    docs = docs.repartition(2 * n_cpus)
    sigs = docs.map_batches(
        functools.partial(_sig_batch, num_hashes=num_hashes,
                          shingle_k=shingle_k),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    blocks = [t for t in ray.get(sigs.to_arrow_refs()) if len(t)]
    if blocks:
        ids = np.concatenate([np.asarray(t["doc_id"]) for t in blocks])
        mat = np.concatenate(
            [np.asarray(t["minhash"].combine_chunks().flatten())
             .reshape(len(t), num_hashes) for t in blocks])
        order = np.argsort(ids)
        ids, mat = ids[order], mat[order]
    else:
        ids = np.array([], dtype=np.int64)
        mat = np.zeros((0, num_hashes), dtype=np.int32)
    sig_ref = ray.put((ids, mat))

    banded = sigs.map_batches(
        functools.partial(_band_rows, bands=bands, rows=rows),
        batch_format="pyarrow", zero_copy_batch=True)
    pairs = hash_group_apply(
        banded, ["band", "band_hash"],
        functools.partial(_bucket_pairs, threshold=threshold,
                          sig_ref=sig_ref),
        min_group_size=2)
    # same pair can surface from several bands → keep one
    return pairs.groupby(["doc_a", "doc_b"]).max("jaccard_est")


def minhash_clusters(docs, **kw):
    """Near-dup clusters: connected components approximated by min-neighbor
    propagation on the pair list (2 rounds — sufficient for dup clusters,
    which are overwhelmingly cliques/stars in practice)."""
    pairs = minhash_lsh_pairs(docs, **kw).take_all()
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for p in pairs:
        a, b = find(p["doc_a"]), find(p["doc_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    return {x: find(x) for x in parent}


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    toks = _WORD.findall(text)
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = _stable_hash64(t.encode())
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_batch(batch: pa.Table) -> pa.Table:
    texts = canonical_text(batch["text"]).to_pylist()
    hs = [simhash64(t or "") for t in texts]
    return pa.table({
        "doc_id": batch["doc_id"],
        "simhash": pa.array([h - (1 << 63) if h >= (1 << 63) else h
                             for h in hs], pa.int64()),
    })


def simhash_near_pairs(docs, max_hamming: int = 3, blocks: int = 4):
    """SimHash near-dup pairs: block-permutation LSH — split the 64-bit hash
    into ``blocks`` slices; by pigeonhole, any pair within ``max_hamming``
    (< blocks) shares at least one exact slice → groupby(slice) then verify
    Hamming distance in-group."""
    import functools

    def _slices(batch: pa.Table, *, blocks: int) -> pa.Table:
        ids, blk, key, sh = [], [], [], []
        width = 64 // blocks
        mask = (1 << width) - 1
        for did, h in zip(batch["doc_id"].to_pylist(),
                          batch["simhash"].to_pylist()):
            uh = h & 0xFFFFFFFFFFFFFFFF
            for b in range(blocks):
                ids.append(did)
                blk.append(b)
                key.append((uh >> (b * width)) & mask)
                sh.append(h)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "block": pa.array(blk, pa.int32()),
                         "key": pa.array(key, pa.int64()),
                         "simhash": pa.array(sh, pa.int64())})

    def _verify(batch: pa.Table, *, max_hamming: int) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        hs = batch["simhash"].to_pylist()
        out_a, out_b, dist = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                d = bin((hs[i] ^ hs[j]) & 0xFFFFFFFFFFFFFFFF).count("1")
                if d <= max_hamming:
                    a, b = sorted((ids[i], ids[j]))
                    out_a.append(a)
                    out_b.append(b)
                    dist.append(d)
        return pa.table({"doc_a": pa.array(out_a, pa.int64()),
                         "doc_b": pa.array(out_b, pa.int64()),
                         "hamming": pa.array(dist, pa.int64())})

    sh = docs.map_batches(simhash_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
    sliced = sh.map_batches(functools.partial(_slices, blocks=blocks),
                            batch_format="pyarrow")
    pairs = hash_group_apply(
        sliced, ["block", "key"],
        functools.partial(_verify, max_hamming=max_hamming),
        min_group_size=2)
    return pairs.groupby(["doc_a", "doc_b"]).min("hamming")


# ---------------------------------------------------------------------------
# n-gram Jaccard (verification kernel + brute pairs for small candidate sets)
# ---------------------------------------------------------------------------


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = shingles(a, k), shingles(b, k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def embedding_near_pairs(emb, threshold: float = 0.95, block: int = 2048):
    """Embedding-cosine near-dup pairs via blocked matmul inside map_batches
    against a normalized broadcast matrix (fine up to ~1e5 vectors; the
    IVF-bucketed variant in ann.py is the scale path)."""
    import ray

    all_rows = emb.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in all_rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                    for r in all_rows])
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def _pairs(batch: pa.Table) -> pa.Table:
        rids, rmat = ray.get(ref)
        bids = np.array(batch["vec_id"].to_pylist(), dtype=np.int64)
        bm = np.stack([np.asarray(v, dtype=np.float64)
                       for v in batch["embedding"].to_pylist()])
        bm /= np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
        sims = bm @ rmat.T
        ai, bj = np.nonzero(sims >= threshold)
        keep = bids[ai] < rids[bj]  # dedupe + drop self
        return pa.table({
            "doc_a": pa.array(bids[ai][keep], pa.int64()),
            "doc_b": pa.array(rids[bj][keep], pa.int64()),
            "cosine": pa.array(sims[ai, bj][keep], pa.float64()),
        })

    return emb.map_batches(_pairs, batch_format="pyarrow",
                           zero_copy_batch=True, batch_size=block)
