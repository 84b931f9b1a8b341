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
        base = np.array([_stable_hash64(s) & 0x7FFFFFFF for s in sh],
                        dtype=np.uint64)
        # (a*x + b) mod p per permutation, vectorized over shingles (uint64)
        vals = (self.a[:, None] * base[None, :] + self.b[:, None]) % self.PRIME
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = canonical_text(batch["text"]).to_pylist()
        sigs = [self.signature(t or "") for t in texts]
        return pa.table({
            "doc_id": batch["doc_id"],
            "minhash": pa.array([s.astype(np.int64).tolist() for s in sigs],
                                pa.list_(pa.int64())),
        })


def _band_rows(batch: pa.Table, *, bands: int, rows: int) -> pa.Table:
    doc_ids, band_ids, band_hash, sigs = [], [], [], []
    for did, sig in zip(batch["doc_id"].to_pylist(),
                        batch["minhash"].to_pylist()):
        for b in range(bands):
            chunk = sig[b * rows:(b + 1) * rows]
            h = _stable_hash64(struct.pack(f"<{rows}q", *chunk))
            doc_ids.append(did)
            band_ids.append(b)
            band_hash.append(h & 0x7FFFFFFFFFFFFFFF)
            sigs.append(sig)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "band": pa.array(band_ids, pa.int32()),
        "band_hash": pa.array(band_hash, pa.int64()),
        "minhash": pa.array(sigs, pa.list_(pa.int64())),
    })


def _bucket_pairs(batch: pa.Table, *, threshold: float) -> pa.Table:
    """One LSH bucket group → verified candidate pairs (signature Jaccard)."""
    ids = batch["doc_id"].to_pylist()
    sigs = [np.array(s) for s in batch["minhash"].to_pylist()]
    out_a, out_b, est = [], [], []
    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if ids[i] == ids[j]:
                continue
            sim = float((sigs[i] == sigs[j]).mean())
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

    shingle→minhash (actor pool) → band explode → groupby(band, band_hash)
    → per-bucket pair verification → global pair dedup (groupby max est).
    """
    rows = num_hashes // bands
    import functools

    sigs = docs.map_batches(
        MinHasher, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency,
        fn_constructor_kwargs={"num_hashes": num_hashes,
                               "shingle_k": shingle_k})
    banded = sigs.map_batches(
        functools.partial(_band_rows, bands=bands, rows=rows),
        batch_format="pyarrow", zero_copy_batch=True)
    pairs = hash_group_apply(
        banded, ["band", "band_hash"],
        functools.partial(_bucket_pairs, threshold=threshold))
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
        functools.partial(_verify, max_hamming=max_hamming))
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
