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

from trustfuse_ray.stages.common import hash_group_apply, list_matrix, sqdist
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

    def __init__(self, num_hashes: int = 64, shingle_k: int = 3, seed: int = 7,
                 hash_kind: str = "tokenmix"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, self.PRIME, size=num_hashes,
                              dtype=np.uint64)
        self.b = rng.integers(0, self.PRIME, size=num_hashes,
                              dtype=np.uint64)
        self.k = shingle_k
        self.num = num_hashes
        # shingle hash family — everything downstream of `base` is
        # identical across kinds:
        #  * "tokenmix" (production default): fully vectorized — Arrow
        #    regex tokenization, one batched FNV pass over the flat token
        #    array, shingle hash = FNV-mix of the k token hashes via
        #    segmented numpy gathers.  NO per-doc Python.
        #  * "siphash": pandas hash_array over joined shingle strings
        #    (needs the per-doc Python shingle loop).
        #  * "md5": md5_number_lower semantics, slower (per-shingle
        #    hashlib) but exactly expressible in DuckDB SQL — the
        #    driver-oracle-gated queries use it so the WHOLE pipeline
        #    (shingle→permutation→band→verify) sits under the hash gate.
        self.hash_kind = hash_kind

    def _base_hashes(self, sh_strs) -> np.ndarray:
        if self.hash_kind == "md5":
            vals = np.fromiter((_md5_token64(s) for s in sh_strs),
                               dtype=np.uint64, count=len(sh_strs))
        else:
            import pandas as pd

            vals = pd.util.hash_array(np.asarray(sh_strs, dtype=object))
        return (vals & np.uint64(0x7FFFFFFF)).astype(np.uint64)

    def _perm_vals(self, base: np.ndarray) -> np.ndarray:
        """(a*x + b) mod p for every permutation × shingle — the kernel's
        hot loop.  In-place ops with an explicit ``np.uint64`` modulus keep
        the whole computation in ONE uint64 temporary: the expression form
        `(a[:,None]*x+b[:,None]) % int` allocates three (num × n_shingles)
        intermediates and pays their page-in cost every batch (measured
        11 s → 0.4 s one-shot on a 64 × 735k matrix, bit-identical)."""
        v = self.a[:, None] * base[None, :]
        v += self.b[:, None]
        v %= np.uint64(self.PRIME)
        return v

    def signature(self, text: str) -> np.ndarray:
        if self.hash_kind == "tokenmix":
            t = self(pa.table({"doc_id": pa.array([0]),
                               "text": pa.array([text], pa.string())}))
            return np.asarray(t["minhash"][0].as_py(), dtype=np.uint64)
        sh = shingles(text, self.k)
        if not sh:
            return np.full(self.num, self.PRIME, dtype=np.uint64)
        # vectorized stable shingle hashing (deterministic across processes)
        base = self._base_hashes([s.decode() for s in sh])
        return self._perm_vals(base).min(axis=1)

    def _tokenmix_base(self, ct: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized shingle base hashes: (flat shingle hashes < 2^31,
        shingle count per doc).  Tokenization is ASCII-\\w (RE2), shingle
        hash = FNV-prime fold of the k token hashes — a different (but
        equally stable) shingle family than the string-joining kinds, so
        signatures are NOT comparable across kinds."""
        import pyarrow.compute as pc

        from trustfuse_ray.stages.extract import fnv64_batch

        norm = pc.utf8_trim(
            pc.replace_substring_regex(pc.fill_null(ct, ""), r"\W+", " "),
            " ")
        if isinstance(norm, pa.ChunkedArray):
            norm = norm.combine_chunks()
        toks = pc.split_pattern(norm, " ")
        flat = pc.list_flatten(toks)
        m = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        empty = pc.equal(pc.utf8_length(norm),
                         0).to_numpy(zero_copy_only=False)
        m_eff = np.where(empty, 0, m)
        th = np.asarray(
            fnv64_batch(flat).to_numpy(zero_copy_only=False)).view(np.uint64)
        k = self.k
        doc_start = np.cumsum(m) - m  # offsets include empty-docs' "" token
        full = m_eff >= k
        short = (m_eff > 0) & ~full
        n_sh = np.where(full, m_eff - k + 1,
                        (m_eff > 0).astype(np.int64))
        out = np.empty(int(n_sh.sum()), np.uint64)
        out_start = np.cumsum(n_sh) - n_sh
        prime = np.uint64(0x100000001B3)
        if full.any():
            cnt = m_eff[full] - k + 1
            rel = np.arange(int(cnt.sum())) - np.repeat(
                np.cumsum(cnt) - cnt, cnt)
            idx = np.repeat(doc_start[full], cnt) + rel
            h = th[idx].copy()
            for j in range(1, k):
                h *= prime
                h ^= th[idx + j]
            out[np.repeat(out_start[full], cnt) + rel] = h
        if short.any():
            s0 = doc_start[short]
            h = th[s0].copy()
            ms = m_eff[short]
            for j in range(1, k):
                msk = ms > j
                h[msk] = h[msk] * prime ^ th[s0[msk] + j]
            out[out_start[short]] = h
        return out & np.uint64(0x7FFFFFFF), n_sh

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Batch-vectorized signatures: ONE hash_array call and ONE
        (num_hashes × total_shingles) permutation pass for the whole batch,
        then a per-doc segmented min (``np.minimum.reduceat``).  Shingles are
        NOT deduplicated per doc — min over the multiset equals min over the
        set — so the values are identical to :meth:`signature`'s."""
        ct = canonical_text(batch["text"])
        if isinstance(ct, pa.ChunkedArray):
            ct = ct.combine_chunks()
        n_docs = len(ct)
        if self.hash_kind == "tokenmix":
            base, counts = self._tokenmix_base(ct)
        else:
            texts = ct.to_pylist()
            all_sh: list[str] = []
            counts = np.empty(len(texts), dtype=np.int64)
            k = self.k
            for i, t in enumerate(texts):
                toks = _WORD.findall(t or "")
                if not toks:
                    counts[i] = 0
                    continue
                if len(toks) < k:
                    all_sh.append(" ".join(toks))
                    counts[i] = 1
                else:
                    all_sh.extend(" ".join(toks[j:j + k])
                                  for j in range(len(toks) - k + 1))
                    counts[i] = len(toks) - k + 1
            base = self._base_hashes(all_sh) if all_sh else \
                np.empty(0, np.uint64)
        sig_mat = np.full((n_docs, self.num), self.PRIME,
                          dtype=np.uint64)
        if len(base):
            vals = self._perm_vals(base)
            nz = counts > 0
            starts = (np.cumsum(counts) - counts)[nz]
            sig_mat[nz] = np.minimum.reduceat(vals, starts, axis=1).T
        # int32 storage: values < 2^31, halves the band-shuffle bytes
        flat = sig_mat.astype(np.int32).ravel()
        offsets = pa.array(np.arange(n_docs + 1, dtype=np.int32) * self.num)
        arr = pa.ListArray.from_arrays(offsets, pa.array(flat))
        return pa.table({"doc_id": batch["doc_id"], "minhash": arr})


_HASHER_CACHE: dict = {}


def _sig_batch(batch: pa.Table, *, num_hashes: int, shingle_k: int,
               seed: int = 7, hash_kind: str = "tokenmix") -> pa.Table:
    """Task-pool signature stage with a per-process MinHasher memo: the
    permutation table is tiny, so warm task workers beat dedicated actor
    spin-up (32 fresh actor processes cost multiple seconds); the state is
    still built once per worker process."""
    key = (num_hashes, shingle_k, seed, hash_kind)
    h = _HASHER_CACHE.get(key)
    if h is None:
        h = _HASHER_CACHE[key] = MinHasher(num_hashes, shingle_k, seed,
                                           hash_kind)
    return h(batch)


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (deterministic, uint64 in/out)."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _band_rows(batch: pa.Table, *, bands: int, rows: int,
               mask: int = 0) -> pa.Table:
    """(doc_id, band, band_hash) only — signatures do NOT ride the shuffle
    (they are broadcast once; ~640k x 300B rows would otherwise dominate).
    The band hash is a vectorized splitmix64 fold over the band's ``rows``
    signature ints — an internal bucketing key only (two docs collide in a
    band iff their band slices are equal, which the fold preserves up to
    64-bit collision odds)."""
    n = len(batch)
    sig = np.asarray(batch["minhash"].combine_chunks().flatten(),
                     dtype=np.int64).reshape(n, bands, rows)
    acc = np.zeros((n, bands), dtype=np.uint64)
    for r in range(rows):
        acc = _mix64(acc ^ sig[:, :, r].astype(np.uint64))
    doc_ids = np.repeat(np.asarray(batch["doc_id"], dtype=np.int64), bands)
    band_ids = np.tile(np.arange(bands, dtype=np.int32), n)
    bh = (acc.ravel() & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    return pa.table({
        "doc_id": pa.array(doc_ids),
        "band": pa.array(band_ids),
        "band_hash": pa.array(bh),
        # partition id for the bucket exchange (band_hash is already mixed)
        "__p": pa.array((bh & mask).astype(np.int32)),
    })


# static schemas for the plasma exchanges (typed fallback for empty blocks)
_BAND_SCHEMA = pa.schema([("doc_id", pa.int64()), ("band", pa.int32()),
                          ("band_hash", pa.int64()), ("__p", pa.int32())])
_PAIR_SCHEMA = pa.schema([("kind", pa.int8()), ("key", pa.int64()),
                          ("doc_a", pa.int64()), ("doc_b", pa.int64()),
                          ("sig", pa.binary()), ("sig_a", pa.binary()),
                          ("__p", pa.int32())])


def _pair_row_table(doc_a: np.ndarray, doc_b: np.ndarray, key: np.ndarray,
                    mask: int, sig_a=None) -> pa.Table:
    """Rows in the shared attach-shuffle schema (kind 0 = candidate pair,
    keyed and pre-partitioned so the attach stage is a bare
    union → groupby, no extra map stages)."""
    n = len(doc_a)
    return pa.table({
        "kind": pa.array(np.zeros(n, dtype=np.int8)),
        "key": pa.array(key, type=pa.int64()),
        "doc_a": pa.array(doc_a, type=pa.int64()),
        "doc_b": pa.array(doc_b, type=pa.int64()),
        "sig": pa.nulls(n, pa.binary()),
        "sig_a": (pa.nulls(n, pa.binary()) if sig_a is None else sig_a),
        "__p": pa.array((key & mask).astype(np.int32)),
    })


BUCKET_STAR_CAP = 512
"""Above this bucket size, all-pairs emission is O(n²) — a single
mass-duplicated boilerplate bucket of 10⁵ docs would emit 5×10⁹ candidate
rows and kill the attach shuffle.  Oversized buckets switch to star
(bucket-min representative × every member) + adjacent-chain pairs: O(n)
candidates whose transitive closure still covers the clique in the
connected-components pass; verification filters hash-collision members
pair-by-pair (a non-duplicate that only chained through a degenerate
bucket loses that edge — documented recall trade on adversarial input)."""


def _bucket_cand_pairs(batch: pa.Table, *, mask: int,
                       cap: int = BUCKET_STAR_CAP) -> pa.Table:
    """One LSH bucket group → candidate pairs (ids only — signatures do not
    enter the bucket shuffle OR the driver; verification happens after the
    candidates are co-partitioned back with the signature table)."""
    ids = np.unique(np.asarray(batch["doc_id"], dtype=np.int64))
    n = len(ids)
    if n < 2:
        z = np.array([], dtype=np.int64)
        return _pair_row_table(z, z, z, mask)
    if n <= cap:
        ai, bj = np.triu_indices(n, k=1)
        return _pair_row_table(ids[ai], ids[bj], ids[ai], mask)
    # degenerate bucket: star (min-id rep) + chain — 2n−3 pairs, ids sorted
    # so doc_a < doc_b everywhere
    a = np.concatenate([np.full(n - 1, ids[0], dtype=np.int64), ids[1:-1]])
    b = np.concatenate([ids[1:], ids[2:]])
    return _pair_row_table(a, b, a, mask)


def _sig_bin(batch: pa.Table, *, num_hashes: int, mask: int) -> pa.Table:
    """(doc_id, minhash list<int32>) → signature rows in the shared
    attach-shuffle schema (kind 1): the fixed-width signature packed as
    little-endian bytes (vectorized encode via from_buffers), pre-keyed and
    pre-partitioned on doc_id so both attach passes reuse this table
    verbatim."""
    n = len(batch)
    flat = np.ascontiguousarray(
        np.asarray(batch["minhash"].combine_chunks().flatten(),
                   dtype=np.int32))
    width = num_hashes * 4
    offsets = pa.py_buffer((np.arange(n + 1, dtype=np.int32)
                            * width).tobytes())
    data = pa.py_buffer(flat.tobytes())
    arr = pa.Array.from_buffers(pa.binary(), n, [None, offsets, data])
    key = np.asarray(batch["doc_id"], dtype=np.int64)
    return pa.table({
        "kind": pa.array(np.ones(n, dtype=np.int8)),
        "key": pa.array(key),
        "doc_a": pa.nulls(n, pa.int64()),
        "doc_b": pa.nulls(n, pa.int64()),
        "sig": arr,
        "sig_a": pa.nulls(n, pa.binary()),
        "__p": pa.array((key & mask).astype(np.int32)),
    })


def _split_kinds(g: pa.Table):
    import pyarrow.compute as pc

    is_sig = pc.equal(g["kind"], 1)
    return g.filter(is_sig), g.filter(pc.invert(is_sig))


def _sig_lut(sig_rows: pa.Table, keys) -> pa.Array:
    """Partition-local signature lookup as a C-level hash probe
    (index_in + take) instead of a Python dict over pylists."""
    import pyarrow.compute as pc

    if isinstance(keys, np.ndarray):
        keys = pa.array(keys, pa.int64())
    idx = pc.index_in(keys, value_set=sig_rows["key"].combine_chunks())
    out = pc.take(sig_rows["sig"].combine_chunks(), idx)
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _sig_mat(col, n: int, num_hashes: int) -> np.ndarray:
    """Fixed-width binary signature column → (n × num_hashes) int32 matrix
    via a vectorized gather over the Arrow value buffer (replaces
    ``b"".join(col.to_pylist())``)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    width = 4 * num_hashes
    offs = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset:arr.offset + n + 1].astype(np.int64)
    buf = np.frombuffer(arr.buffers()[2], np.uint8)
    idx = offs[:-1, None] + np.arange(width)[None, :]
    return np.ascontiguousarray(buf[idx]).view(np.int32)


def _attach_a(g: pa.Table, *, mask: int) -> pa.Table:
    """Partition keyed by doc_a: dedup candidate pairs (a pair surfaces once
    per shared band and its whole group lands here — no dedicated dedup
    shuffle) and attach sig_a from the partition-local signature rows; emit
    re-keyed on doc_b for the second pass."""
    if "__p" in g.column_names:
        g = g.drop_columns(["__p"])
    sig_rows, cand = _split_kinds(g)
    if not len(cand):
        z = np.array([], dtype=np.int64)
        return _pair_row_table(z, z, z, mask)
    uniq = np.unique(np.stack(
        [np.asarray(cand["doc_a"], dtype=np.int64),
         np.asarray(cand["doc_b"], dtype=np.int64)], axis=1), axis=0)
    sig_a = _sig_lut(sig_rows, uniq[:, 0])
    return _pair_row_table(uniq[:, 0], uniq[:, 1], uniq[:, 1], mask,
                           sig_a=sig_a)


def _attach_b_verify(g: pa.Table, *, num_hashes: int,
                     threshold: float) -> pa.Table:
    """Partition keyed by doc_b: attach sig_b and verify signature-Jaccard
    ≥ threshold, fully vectorized (fixed-width signatures reshape to a
    matrix)."""
    if "__p" in g.column_names:
        g = g.drop_columns(["__p"])
    sig_rows, cand = _split_kinds(g)
    n = len(cand)
    if not n:
        return pa.table({"doc_a": pa.array([], pa.int64()),
                         "doc_b": pa.array([], pa.int64()),
                         "jaccard_est": pa.array([], pa.float64())})
    sig_b = _sig_lut(sig_rows, cand["key"].combine_chunks())
    a = _sig_mat(cand["sig_a"], n, num_hashes)
    b = _sig_mat(sig_b, n, num_hashes)
    sim = (a == b).mean(axis=1)
    keep = sim >= threshold
    return pa.table({
        "doc_a": cand["doc_a"].filter(pa.array(keep)),
        "doc_b": cand["doc_b"].filter(pa.array(keep)),
        "jaccard_est": pa.array(sim[keep], pa.float64()),
    })


def minhash_lsh_pairs(docs, num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.7, shingle_k: int = 3,
                      concurrency=(1, 8), hash_kind: str = "tokenmix"):
    """documents → near-duplicate pairs (doc_a < doc_b, jaccard_est).

    Fully shuffle-local (nothing is materialized on the driver and no
    broadcast grows with corpus size — the 100-TB shape):

    1. shingle→minhash signatures (warm task pool, vectorized)
    2. (band, band_hash, doc_id) rows → bucket shuffle → candidate pairs
       (ids only; a band row is 20 bytes regardless of num_hashes)
    3. global pair dedup (same pair surfaces from several bands)
    4. hash join the deduped candidates back to the signature table
       (signatures travel only for candidate docs) → vectorized
       signature-Jaccard verify ≥ threshold
    """
    rows = num_hashes // bands
    import functools

    import ray

    # count first: on a freshly-read parquet dataset this is metadata-only
    # (no execution), and it sizes the fan-outs below
    n_docs = docs.count()
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    # the signature map parallelizes over the READ's blocks; repartition
    # (an exchange of the full text payload — measured 4-10 s vs 1 s at
    # 40k docs) only when the source is a big unsharded file that would
    # otherwise read as a handful of blocks
    try:
        n_files = len(docs.input_files())
    except Exception:
        n_files = n_cpus
    if n_docs > 20_000 and n_files < max(2, n_cpus // 4):
        docs = docs.repartition(min(2 * n_cpus, max(1, n_docs // 150)))
    sig_batch_size = max(200, n_docs // (2 * n_cpus))

    n_parts = 1 << max(3, (n_cpus - 1).bit_length())
    mask = n_parts - 1
    # the exchange phase moves KB-scale rows; a sort exchange costs
    # O(map_blocks × reduce_blocks) in scheduling/transfers, so coalesce to
    # data-proportional block counts (~50k docs per block) instead of the
    # CPU-proportional fan-out the signature stage needed.  sigs_x is
    # materialized ONCE here — two consumers (band rows + signature rows)
    # read it, so leaving it lazy would recompute the signature stage twice.
    xblocks = max(8, -(-n_docs // 50_000))
    sigs_x = docs.map_batches(
        functools.partial(_sig_batch, num_hashes=num_hashes,
                          shingle_k=shingle_k, hash_kind=hash_kind),
        batch_format="pyarrow", zero_copy_batch=True,
        batch_size=sig_batch_size,
    ).repartition(xblocks).materialize()
    banded = sigs_x.map_batches(
        functools.partial(_band_rows, bands=bands, rows=rows, mask=mask),
        batch_format="pyarrow", zero_copy_batch=True)
    sig_bin_ds = sigs_x.map_batches(
        functools.partial(_sig_bin, num_hashes=num_hashes, mask=mask),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    # three hash exchanges (bucket → attach sig_a → attach sig_b + verify),
    # all over PRE-PARTITIONED rows — run on the two-wave plasma exchange
    # (plain tasks, no sort sampling): Ray's groupby sort exchange costs
    # ~1-2 s fixed PER CALL, which dominated this pipeline at every scale
    # where the band rows fit in memory
    from trustfuse_ray.stages.common import _apply_groups, plasma_exchange

    cands = plasma_exchange(
        [banded],
        functools.partial(_apply_groups, keys=["band", "band_hash"],
                          fn=functools.partial(_bucket_cand_pairs,
                                               mask=mask),
                          min_group_size=2),
        n_parts=n_parts, empty_schema=_BAND_SCHEMA)
    j = plasma_exchange([cands, sig_bin_ds],
                        functools.partial(_attach_a, mask=mask),
                        n_parts=n_parts, empty_schema=_PAIR_SCHEMA)
    return plasma_exchange(
        [j, sig_bin_ds],
        functools.partial(_attach_b_verify, num_hashes=num_hashes,
                          threshold=threshold),
        n_parts=n_parts, empty_schema=_PAIR_SCHEMA)


def semantic_dedup(emb, threshold: float = 0.40, id_col: str = "vec_id",
                   n_parts: int = 32):
    """SemDeDup-style embedding dedup keep-list: cosine near-pair graph →
    distributed connected components → keep the min-id member of every
    cluster.  Output covers EVERY input row: ``(vec_id, label, keep)``
    with label = min id of the near-dup cluster (own id for singletons).

    Shape: the pair graph routes through :func:`embedding_near_pairs`
    (exact broadcast path small, IVF-bucketed at scale), the labels stay
    distributed (min-label-propagation CC), and the final keep-list is one
    hash exchange of ``(id, label)`` rows co-partitioned with the id set —
    neither the embeddings nor the cluster labels ever drive-materialize."""
    import functools

    from trustfuse_ray.stages.common import _add_part, plasma_exchange
    from trustfuse_ray.stages.graph import connected_components

    pairs = embedding_near_pairs(emb, threshold=threshold)
    labels = connected_components(pairs, src="doc_a", dst="doc_b")

    def _tag_id(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "label": pa.array(np.full(n, -1, np.int64)),
            "side": pa.array(np.zeros(n, np.int8)),
        })

    def _tag_label(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            id_col: batch["node"].cast(pa.int64()),
            "label": batch["label"].cast(pa.int64()),
            "side": pa.array(np.ones(n, np.int8)),
        })

    uni_schema = pa.schema([(id_col, pa.int64()), ("label", pa.int64()),
                            ("side", pa.int8()), ("__part", pa.int32())])
    out_schema = pa.schema([(id_col, pa.int64()), ("label", pa.int64()),
                            ("keep", pa.bool_())])

    def _emit(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return out_schema.empty_table()
        ids = np.asarray(tbl[id_col], dtype=np.int64)
        lab = np.asarray(tbl["label"], dtype=np.int64)
        side = np.asarray(tbl["side"], dtype=np.int8)
        # per id: the label row (side 1) wins if present, else own id
        order = np.lexsort((-side, ids))
        idss = ids[order]
        head = np.ones(len(idss), dtype=bool)
        head[1:] = idss[1:] != idss[:-1]
        # a run is anchored iff it has a side-0 id row; side-0 rows sort to
        # the run tail (key is -side), so check each run's LAST row —
        # label-only rows for ids outside the id set are dropped
        starts = np.flatnonzero(head)
        run_end = np.concatenate((starts[1:], [len(idss)])) - 1
        has_id = side[order[run_end]] == 0
        first = order[starts][has_id]
        chosen_lab = np.where(side[first] == 1, lab[first], ids[first])
        out_id = ids[first]
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "label": pa.array(chosen_lab, pa.int64()),
            "keep": pa.array(chosen_lab == out_id),
        })

    uni = emb.select_columns([id_col]).map_batches(
        _tag_id, batch_format="pyarrow", zero_copy_batch=True).union(
        labels.map_batches(_tag_label, batch_format="pyarrow"))
    keyed = uni.map_batches(
        functools.partial(_add_part, keys=[id_col], n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True)
    return plasma_exchange([keyed], _emit, n_parts, part_col="__part",
                           empty_schema=uni_schema)


def minhash_cluster_labels(docs, **kw):
    """Near-dup clusters as a Dataset(node, label): distributed connected
    components (min-label propagation, `graph.connected_components`) over
    the LSH pair list — the pair list and the labels both stay distributed,
    so adversarial duplicate mass cannot blow up the driver."""
    from trustfuse_ray.stages.graph import connected_components

    pairs = minhash_lsh_pairs(docs, **kw)
    return connected_components(pairs, src="doc_a", dst="doc_b")


def minhash_clusters(docs, **kw):
    """Dict view of :func:`minhash_cluster_labels` (node → component min
    id).  Collects only the clustered nodes — fine for result inspection;
    pipelines at scale should consume the labels Dataset directly."""
    return {r["node"]: r["label"]
            for r in minhash_cluster_labels(docs, **kw).take_all()}


def minhash_exact_jaccard(docs, threshold: float = 0.6,
                          num_hashes: int = 64, bands: int = 16,
                          shingle_k: int = 3, hash_kind: str = "md5"):
    """Exact-Jaccard verification of the MinHash candidate pairs: every
    surviving LSH pair gets its TRUE distinct-shingle Jaccard (integer
    permille) next to the signature estimate — the audit surface for
    tuning ``threshold`` / band geometry.

    Scale shape: the corpus never leaves :func:`minhash_lsh_pairs`'s
    distributed path; the exact pass streams the corpus ONCE more,
    filtering map-side (``pc.is_in`` on the broadcast pair-member id
    array) so only pair members' distinct shingle-hash sets — bounded by
    the near-dup population, not the corpus — are collected and
    broadcast back to the (equally bounded) pair table."""
    import ray
    import pyarrow.compute as pc

    pairs = minhash_lsh_pairs(
        docs, num_hashes=num_hashes, bands=bands, threshold=threshold,
        shingle_k=shingle_k, hash_kind=hash_kind).materialize()

    out_schema = pa.schema([
        ("doc_a", pa.int64()), ("doc_b", pa.int64()),
        ("jaccard_est", pa.float64()),
        ("n_inter", pa.int64()), ("n_union", pa.int64()),
        ("jaccard_exact_permille", pa.int64())])
    member_ids: set = set()
    for b in pairs.iter_batches(batch_format="pyarrow"):
        member_ids.update(b["doc_a"].to_pylist())
        member_ids.update(b["doc_b"].to_pylist())
    if not member_ids:
        return ray.data.from_arrow(out_schema.empty_table())
    id_ref = ray.put(pa.array(sorted(member_ids), pa.int64()))
    mh = MinHasher(num_hashes, shingle_k, hash_kind=hash_kind)

    def _sets(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(pc.cast(batch["doc_id"], pa.int64()),
                        value_set=ray.get(id_ref))
        batch = batch.filter(keep)
        ct = canonical_text(pc.fill_null(batch["text"], ""))
        ids, sets = [], []
        for did, txt in zip(batch["doc_id"].to_pylist(), ct.to_pylist()):
            sh = shingles(txt or "", shingle_k)
            if sh:
                base = np.unique(mh._base_hashes(
                    [s.decode() for s in sh])).astype(np.int64)
                ids.append(did)
                sets.append(base)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "hset": pa.array(sets, pa.list_(pa.int64()))})

    collected = docs.select_columns(["doc_id", "text"]).map_batches(
        _sets, batch_format="pyarrow", zero_copy_batch=True).take_all()
    set_ref = ray.put({r["doc_id"]: np.asarray(r["hset"], dtype=np.int64)
                       for r in collected})

    def _verify(batch: pa.Table) -> pa.Table:
        smap = ray.get(set_ref)  # zero-copy local plasma read
        da = batch["doc_a"].to_pylist()
        db = batch["doc_b"].to_pylist()
        est = batch["jaccard_est"].to_pylist()
        oa, ob, oe, ni, nu, jp = [], [], [], [], [], []
        for a, b, e in zip(da, db, est):
            sa, sb = smap.get(a), smap.get(b)
            if sa is None or sb is None:
                continue  # zero-shingle doc: no exact set (mirrors oracle)
            inter = int(np.intersect1d(sa, sb,
                                       assume_unique=True).size)
            union = int(sa.size + sb.size - inter)
            oa.append(a)
            ob.append(b)
            oe.append(e)
            ni.append(inter)
            nu.append(union)
            jp.append(inter * 1000 // max(union, 1))
        return pa.table({
            "doc_a": pa.array(oa, pa.int64()),
            "doc_b": pa.array(ob, pa.int64()),
            "jaccard_est": pa.array(oe, pa.float64()),
            "n_inter": pa.array(ni, pa.int64()),
            "n_union": pa.array(nu, pa.int64()),
            "jaccard_exact_permille": pa.array(jp, pa.int64())})

    return pairs.map_batches(_verify, batch_format="pyarrow",
                             zero_copy_batch=True)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


_MD5_TOKEN_CACHE: dict[str, int] = {}


def _md5_token64(tok: str) -> int:
    """Lower 64 bits of md5 (little-endian of digest bytes 8..16) — chosen
    to equal DuckDB's ``md5_number_lower`` so simhash is SQL-expressible
    (driver oracle).  Per-process memo: real corpora reuse tokens heavily."""
    h = _MD5_TOKEN_CACHE.get(tok)
    if h is None:
        if len(_MD5_TOKEN_CACHE) > (1 << 20):
            _MD5_TOKEN_CACHE.clear()
        h = _MD5_TOKEN_CACHE[tok] = struct.unpack(
            "<Q", hashlib.md5(tok.encode()).digest()[8:16])[0]
    return h


def simhash64(text: str) -> int:
    toks = _WORD.findall(text)
    if not toks:
        return 0
    from collections import Counter

    cnt = Counter(toks)
    hs = np.fromiter((_md5_token64(t) for t in cnt), dtype=np.uint64,
                     count=len(cnt))
    w = np.fromiter(cnt.values(), dtype=np.int64, count=len(cnt))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int64)
    acc = ((2 * bits - 1) * w[:, None]).sum(axis=0)
    powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
    return int(powers[acc > 0].sum(dtype=np.uint64))


def simhash_batch(batch: pa.Table) -> pa.Table:
    """Batch-vectorized simhash (the MinHasher pattern): one token md5 pass
    over the batch's UNIQUE tokens (memoized across batches), then a
    (total_occurrences × 64) sign accumulation collapsed per doc with one
    segmented ``np.add.reduceat``.  Values are identical to
    :func:`simhash64`'s — the per-doc Counter weighting equals summing
    ±1 per occurrence."""
    texts = canonical_text(batch["text"]).to_pylist()
    toks_per_doc = [_WORD.findall(t or "") for t in texts]
    counts = np.array([len(t) for t in toks_per_doc], dtype=np.int64)
    n = len(texts)
    hs_u = np.zeros(n, dtype=np.uint64)
    total = int(counts.sum())
    if total:
        flat_toks = np.empty(total, dtype=object)
        pos = 0
        for toks in toks_per_doc:
            flat_toks[pos:pos + len(toks)] = toks
            pos += len(toks)
        uniq, inv = np.unique(flat_toks, return_inverse=True)
        uh = np.fromiter((_md5_token64(t) for t in uniq.tolist()),
                         dtype=np.uint64, count=len(uniq))
        # ±1 bit matrix per UNIQUE token (n_uniq × 64, int8), gathered per
        # occurrence via inv — keeps the big tensor at 1 byte/cell
        bits_u = ((uh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                  & np.uint64(1)).astype(np.int8)
        pm = (2 * bits_u - 1)[inv]  # (total × 64) int8
        nz = counts > 0
        starts = (np.cumsum(counts) - counts)[nz]
        acc = np.zeros((n, 64), dtype=np.int64)
        acc[nz] = np.add.reduceat(pm, starts, axis=0, dtype=np.int64)
        powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
        hs_u = ((acc > 0) * powers).sum(axis=1, dtype=np.uint64)
    return pa.table({
        "doc_id": batch["doc_id"],
        # two's-complement signed view (int64 storage; XOR/Hamming and the
        # SQL oracle's BIGINT agree bit-for-bit)
        "simhash": pa.array(hs_u.view(np.int64)),
    })


_POP8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                      axis=1).sum(axis=1).astype(np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count): byte
    lookup table summed over the 8 bytes of each word."""
    b = x.reshape(-1).view(np.uint8)
    return _POP8[b].reshape(*x.shape, 8).sum(axis=-1, dtype=np.int64)


def simhash_near_pairs(docs, max_hamming: int = 3, blocks: int = 4):
    """SimHash near-dup pairs: block-permutation LSH — split the 64-bit hash
    into ``blocks`` slices; by pigeonhole, any pair within ``max_hamming``
    (< blocks) shares at least one exact slice → groupby(slice) then verify
    Hamming distance in-group."""
    import functools

    def _slices(batch: pa.Table, *, blocks: int) -> pa.Table:
        width = 64 // blocks
        n = len(batch)
        h = np.ascontiguousarray(np.asarray(batch["simhash"],
                                            dtype=np.int64))
        uh = h.view(np.uint64)
        shifts = np.arange(blocks, dtype=np.uint64) * np.uint64(width)
        keys = ((uh[:, None] >> shifts[None, :])
                & np.uint64((1 << width) - 1)).astype(np.int64)
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        return pa.table({"doc_id": pa.array(np.repeat(ids, blocks)),
                         "block": pa.array(np.tile(
                             np.arange(blocks, dtype=np.int32), n)),
                         "key": pa.array(keys.ravel()),
                         "simhash": pa.array(np.repeat(h, blocks))})

    def _verify(batch: pa.Table, *, max_hamming: int,
                cap: int = BUCKET_STAR_CAP) -> pa.Table:
        ids = np.asarray(batch["doc_id"], dtype=np.int64)
        hs = np.ascontiguousarray(np.asarray(batch["simhash"],
                                             dtype=np.int64))
        uniq_ids, idx = np.unique(ids, return_index=True)
        m = len(uniq_ids)
        if m < 2:
            z = np.array([], dtype=np.int64)
            return pa.table({"doc_a": pa.array(z), "doc_b": pa.array(z),
                             "hamming": pa.array(z)})
        uh = np.ascontiguousarray(hs[idx]).view(np.uint64)
        if m <= cap:
            d = _popcount64(uh[:, None] ^ uh[None, :])
            ai, bj = np.nonzero(np.triu(d <= max_hamming, k=1))
            da = d[ai, bj]
        else:
            # degenerate slice bucket (mass duplication): star+chain — O(m)
            # pairs; transitive closure over the groupby-min output still
            # links the clique (same policy as _bucket_cand_pairs)
            sa = np.concatenate([np.zeros(m - 1, dtype=np.int64),
                                 np.arange(1, m - 1)])
            sb = np.concatenate([np.arange(1, m), np.arange(2, m)])
            d = _popcount64(uh[sa] ^ uh[sb])
            keep = d <= max_hamming
            ai, bj, da = sa[keep], sb[keep], d[keep]
        return pa.table({"doc_a": pa.array(uniq_ids[ai]),
                         "doc_b": pa.array(uniq_ids[bj]),
                         "hamming": pa.array(da)})

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


def embedding_near_pairs(emb, threshold: float = 0.95, block: int = 2048,
                         max_broadcast_rows: int = 50_000, **ivf_kw):
    """Embedding-cosine near-dup pairs (vec_a < vec_b, cosine ≥ threshold).

    Size-adaptive: corpora up to ``max_broadcast_rows`` use the EXACT path
    (normalized matrix broadcast once via ray.put, blocked matmul per
    batch); larger corpora route through :func:`ivf_near_pairs` — an
    IVF-bucketed shuffle whose driver/worker memory is bounded by list
    size, not corpus size (recall < 1 by construction; multi-assign
    recovers pairs near list boundaries)."""
    n = emb.count()
    if n > max_broadcast_rows:
        return ivf_near_pairs(emb, threshold=threshold, **ivf_kw)
    return _brute_near_pairs(emb, threshold, block)


def _brute_near_pairs(emb, threshold: float, block: int):
    import ray
    import ray.data as rd

    all_rows = emb.select_columns(["vec_id", "embedding"]).take_all()
    if not all_rows:
        return rd.from_arrow(pa.schema([
            ("doc_a", pa.int64()), ("doc_b", pa.int64()),
            ("cosine", pa.float64())]).empty_table())
    ids = np.array([r["vec_id"] for r in all_rows], dtype=np.int64)
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                    for r in all_rows])
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def _pairs(batch: pa.Table) -> pa.Table:
        rids, rmat = ray.get(ref)
        bids = np.asarray(batch["vec_id"], dtype=np.int64)
        bm = list_matrix(batch["embedding"])
        # not in-place: list_matrix may return a read-only zero-copy view
        bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True),
                             1e-12)
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


def _assign_lists(batch: pa.Table, *, cref, nassign: int) -> pa.Table:
    """Multi-assign each vector to its ``nassign`` nearest centroids —
    near-pairs whose members straddle one list boundary still co-locate in
    the runner-up list."""
    import ray

    cents = ray.get(cref) if not isinstance(cref, np.ndarray) else cref
    mat = list_matrix(batch["embedding"])
    d = sqdist(mat, cents)
    nearest = np.argsort(d, axis=1)[:, :nassign]  # n x nassign
    ids = np.asarray(batch["vec_id"], dtype=np.int64)
    rep_ids = np.repeat(ids, nassign)
    rep_lists = nearest.reshape(-1).astype(np.int32)
    rep_mat = np.repeat(mat, nassign, axis=0)
    return pa.table({
        "list_id": pa.array(rep_lists),
        "vec_id": pa.array(rep_ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(rep_mat.reshape(-1)), mat.shape[1]),
    })


def _list_near_pairs(group: pa.Table, *, threshold: float) -> pa.Table:
    """All-pairs cosine within one IVF list (in-group matmul; list sizes are
    bounded by n/n_lists × nassign, so the quadratic term never sees the
    whole corpus)."""
    ids = np.asarray(group["vec_id"], dtype=np.int64)
    mat = list_matrix(group["embedding"])
    mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sims = mat @ mat.T
    ai, bj = np.nonzero(np.triu(sims >= threshold, k=1))
    a, b = ids[ai], ids[bj]
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    keep = a2 != b2  # same vec via two lists in one group can't pair itself
    return pa.table({"doc_a": pa.array(a2[keep], pa.int64()),
                     "doc_b": pa.array(b2[keep], pa.int64()),
                     "cos_part": pa.array(sims[ai, bj][keep], pa.float64())})


def ivf_near_pairs(emb, threshold: float = 0.9, n_lists: int = 64,
                   nassign: int = 2, n_parts: int | None = None):
    """Near-pair search through IVF lists (the 100-TB shape shared with
    ann.train_ivf_centroids): coarse k-means centroids (per-round exchange
    n_lists × dim) → multi-assign shuffle keyed by list_id → in-list
    all-pairs matmul → pair dedup.  Nothing is materialized on the driver
    and no broadcast grows with corpus size."""
    import functools as _ft

    import ray

    from trustfuse_ray.stages.ann import train_ivf_centroids

    centroids = train_ivf_centroids(emb, n_lists=n_lists)
    cref = ray.put(centroids)
    assigned = emb.select_columns(["vec_id", "embedding"]).map_batches(
        _ft.partial(_assign_lists, cref=cref, nassign=nassign),
        batch_format="pyarrow", zero_copy_batch=True)
    if n_parts is None:
        n_parts = max(16, int(ray.cluster_resources().get("CPU", 8)) * 2)
    pairs = hash_group_apply(
        assigned, ["list_id"],
        _ft.partial(_list_near_pairs, threshold=threshold),
        n_parts=min(n_parts, n_lists), min_group_size=2)
    # the same pair can surface from up to nassign shared lists → keep one
    return (pairs.groupby(["doc_a", "doc_b"]).max("cos_part")
            .rename_columns({"max(cos_part)": "cosine"}))


def cluster_best_docs(docs, threshold: float = 0.6,
                      hash_kind: str = "md5", n_parts: int = 32):
    """Quality-aware near-dup canonicalization: MinHash-LSH clusters keep
    their HIGHEST-quality member (integer quality score, ties to the
    smallest doc_id) instead of the blind min-id winner — the curation
    policy that stops dedup from discarding the best copy of a template
    family.  Docs outside every cluster are their own singleton winner.

    Shape: cluster labels stay a Dataset (`minhash_cluster_labels`);
    scores are one streaming integer pass; label attachment and the
    per-cluster argmax are two co-partitions carrying (doc_id, label,
    score) only.  Returns (label, doc_id, score_fp) — one row per
    cluster."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply
    from trustfuse_ray.stages.text import QualityClassifier

    labels = minhash_cluster_labels(docs, threshold=threshold,
                                    hash_kind=hash_kind)
    clf = QualityClassifier()

    def _score(batch: pa.Table) -> pa.Table:
        out = clf(batch)
        return pa.table({"doc_id": out["doc_id"].cast(pa.int64()),
                         "label": pa.array(
                             np.full(len(out), -1, np.int64)),
                         "score": out["score_fp"],
                         "side": pa.array(np.zeros(len(out), np.int8))})

    def _label_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({"doc_id": batch["node"].cast(pa.int64()),
                         "label": batch["label"].cast(pa.int64()),
                         "score": pa.array(np.zeros(n, np.int64)),
                         "side": pa.array(np.ones(n, np.int8))})

    tagged = docs.map_batches(_score, batch_format="pyarrow",
                              zero_copy_batch=True).union(
        labels.map_batches(_label_rows, batch_format="pyarrow"))

    def _attach(group: pa.Table) -> pa.Table:
        side = np.asarray(group["side"], dtype=np.int8)
        did = int(group["doc_id"][0].as_py())
        lab = did
        score = 0
        for i, sd in enumerate(side):
            if sd == 1:
                lab = int(group["label"][i].as_py())
            else:
                score = int(group["score"][i].as_py())
        return pa.table({"label": pa.array([lab], pa.int64()),
                         "doc_id": pa.array([did], pa.int64()),
                         "score": pa.array([score], pa.int64())})

    attached = hash_group_apply(
        tagged, ["doc_id"], _attach, n_parts=n_parts,
        plasma_schema=pa.schema([("label", pa.int64()),
                                 ("doc_id", pa.int64()),
                                 ("score", pa.int64())]))

    def _best(group: pa.Table) -> pa.Table:
        ids = np.asarray(group["doc_id"], dtype=np.int64)
        sc = np.asarray(group["score"], dtype=np.int64)
        best = None
        for d, s in zip(ids, sc):
            if best is None or s > best[1] or (s == best[1]
                                              and d < best[0]):
                best = (int(d), int(s))
        return pa.table({"label": group["label"][:1],
                         "doc_id": pa.array([best[0]], pa.int64()),
                         "score_fp": pa.array([best[1]], pa.int64())})

    return hash_group_apply(
        attached, ["label"], _best, n_parts=n_parts,
        plasma_schema=pa.schema([("label", pa.int64()),
                                 ("doc_id", pa.int64()),
                                 ("score_fp", pa.int64())]))


def dedup_cluster_quality(docs, **kw):
    """Dedup-detector evaluation against the PLANTED duplicate families
    (docs carries the synthesis-time ``dup_of`` parent link): pairwise
    precision/recall of the MinHash+LSH cluster labels, the standard way
    near-dup detectors are scored.  Truth families are the connected
    components of the parent links (a dup-of-a-dup chains to the same
    family); predicted clusters come from :func:`minhash_cluster_labels`;
    unclustered docs are singletons on both sides (label = own doc_id).

    Shape: truth CC runs over the (doc, parent) edge list — a few percent
    of the corpus — with the same distributed min-label rounds the
    predicted side uses; the two label joins co-partition on doc_id; the
    metric rollups reduce to group sizes map-side
    (`common.pairwise_cluster_metrics`).

    Returns a ONE-ROW pa.Table: n_docs, n_pred_pairs, n_true_pairs,
    n_correct_pairs, pair_precision, pair_recall."""
    import pyarrow.compute as pc

    from trustfuse_ray.stages.common import pairwise_cluster_metrics
    from trustfuse_ray.stages.graph import connected_components

    pred = minhash_cluster_labels(docs, **kw)

    def _edges(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.greater_equal(batch["dup_of"],
                                          pa.scalar(0, pa.int64())))
        return pa.table({"src": pc.cast(t["doc_id"], pa.int64()),
                         "dst": pc.cast(t["dup_of"], pa.int64())})

    truth = (connected_components(
        docs.select_columns(["doc_id", "dup_of"])
        .map_batches(_edges, batch_format="pyarrow", zero_copy_batch=True))
        .rename_columns({"node": "t_node", "label": "t_label"}))

    ids = docs.select_columns(["doc_id"])
    j = (ids.join(pred, join_type="left_outer", num_partitions=8,
                  on=("doc_id",), right_on=("node",))
         .join(truth, join_type="left_outer", num_partitions=8,
               on=("doc_id",), right_on=("t_node",)))

    def _lab(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch["doc_id"], pa.int64())
        return pa.table({
            "pred": pc.coalesce(pc.cast(batch["label"], pa.int64()), d),
            "truth": pc.coalesce(pc.cast(batch["t_label"], pa.int64()), d)})

    mm = j.map_batches(_lab, batch_format="pyarrow", zero_copy_batch=True)
    return pairwise_cluster_metrics(mm, "pred", "truth",
                                    count_name="n_docs")


def cluster_safe_split(docs, threshold: float = 0.6,
                       hash_kind: str = "md5", n_parts: int = 32,
                       eval_nibbles: tuple = ("0", "1")):
    """Leakage-safe train/eval split: the fold is decided by the doc's
    MinHash-LSH CLUSTER label, not the doc itself, so near-duplicates can
    never straddle the boundary (the classic eval-contamination failure
    of per-doc hashing).  Docs outside every cluster are their own
    singleton label.  ``split = 'eval'`` when the first hex nibble of
    ``md5(str(label))`` is in ``eval_nibbles`` (default 2/16 = 12.5%),
    else ``'train'`` — deterministic under any block layout.  Returns
    ``(doc_id, label, split)``.

    Shape: cluster labels stay a Dataset; label attachment is one
    (doc_id)-keyed co-partition carrying ints only; the md5 fold rule
    runs map-side on the attached rows."""
    import hashlib

    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    labels = minhash_cluster_labels(docs, threshold=threshold,
                                    hash_kind=hash_kind)

    def _doc_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({"doc_id": batch["doc_id"].cast(pa.int64()),
                         "label": pa.array(np.full(n, -1, np.int64)),
                         "side": pa.array(np.zeros(n, np.int8))})

    def _label_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({"doc_id": batch["node"].cast(pa.int64()),
                         "label": batch["label"].cast(pa.int64()),
                         "side": pa.array(np.ones(n, np.int8))})

    tagged = docs.select_columns(["doc_id"]).map_batches(
        _doc_rows, batch_format="pyarrow", zero_copy_batch=True).union(
        labels.map_batches(_label_rows, batch_format="pyarrow"))

    def _attach(group: pa.Table) -> pa.Table:
        side = np.asarray(group["side"], dtype=np.int8)
        if not (side == 0).any():       # label row without a doc row
            return pa.schema([("doc_id", pa.int64()),
                              ("label", pa.int64())]).empty_table()
        did = int(group["doc_id"][0].as_py())
        lab = did
        lmask = side == 1
        if lmask.any():
            lab = int(np.asarray(group["label"],
                                 dtype=np.int64)[lmask][0])
        return pa.table({"doc_id": pa.array([did], pa.int64()),
                         "label": pa.array([lab], pa.int64())})

    attached = hash_group_apply(
        tagged, ["doc_id"], _attach, n_parts=n_parts,
        plasma_schema=pa.schema([("doc_id", pa.int64()),
                                 ("label", pa.int64())]))

    def _fold(batch: pa.Table) -> pa.Table:
        labs = np.asarray(batch["label"], dtype=np.int64)
        ev = np.array([hashlib.md5(str(int(x)).encode())
                       .hexdigest()[0] in eval_nibbles for x in labs])
        return batch.append_column(
            "split", pa.array(np.where(ev, "eval", "train"), pa.string()))

    return attached.map_batches(_fold, batch_format="pyarrow",
                                zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Exact set-similarity join (PPJoin-style prefix filtering)
# ---------------------------------------------------------------------------


def set_similarity_join(docs, sim_num: int = 3, sim_den: int = 5,
                        text_col: str = "text", id_col: str = "doc_id"):
    """Exact-Jaccard self-join over per-doc distinct whitespace-token sets:
    all pairs (doc_a < doc_b) with ``|A∩B|/|A∪B| ≥ sim_num/sim_den``
    (default 3/5 = 0.6), integer-exact on both sides of the oracle.

    PPJoin-style prefix filter (lossless): under a global token order —
    here (document frequency asc, token asc) — two sets with Jaccard ≥ τ
    MUST share a token among each one's first ``n − ceil(τ·n) + 1``
    tokens, so candidate pairs are generated only inside per-token groups
    of the (rare-by-construction) prefix tokens; every candidate is then
    verified with its true intersection.

    Scale shape: corpus → distinct (doc, token) rows (one vectorized
    block pass, text never shuffles); ONE token exchange annotates df =
    group size; ONE doc exchange cuts prefixes; ONE prefix-token exchange
    emits candidates; verification streams the corpus once more,
    map-side-filtered to pair members (candidate-bounded, the
    minhash_exact_jaccard pattern).  Degenerate corpora (everything
    near-identical) are quadratic in the TRUE result size, not pruned."""
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    out_schema = pa.schema([
        ("doc_a", pa.int64()), ("doc_b", pa.int64()),
        ("n_a", pa.int64()), ("n_b", pa.int64()),
        ("n_inter", pa.int64()), ("jaccard_permille", pa.int64())])

    def _toks(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], "")),
            r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        nlist = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        nlist = np.nan_to_num(nlist.astype(np.float64)).astype(np.int64)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        docix = np.repeat(ids, nlist)
        flat = toks.flatten()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        t = pa.table({"doc_id": pa.array(docix[keep], pa.int64()),
                      "token": flat.filter(pa.array(keep))})
        # distinct per doc (docs are row-contained, so block-local is exact)
        d = (pa.TableGroupBy(t, ["doc_id", "token"], use_threads=False)
             .aggregate([]))
        # per-doc distinct count
        u, inv = np.unique(np.asarray(d["doc_id"], np.int64),
                           return_inverse=True)
        n = np.bincount(inv, minlength=len(u)).astype(np.int64)
        return d.append_column("n", pa.array(n[inv], pa.int64()))

    toks = docs.select_columns([id_col, text_col]).map_batches(
        _toks, batch_format="pyarrow", zero_copy_batch=True)

    tok_schema = pa.schema([("doc_id", pa.int64()), ("token", pa.string()),
                            ("n", pa.int64()), ("df", pa.int64())])

    def _annot_df(group: pa.Table) -> pa.Table:
        return group.append_column(
            "df", pa.array(np.full(len(group), len(group), np.int64)))

    with_df = hash_group_apply(toks, ["token"], _annot_df, n_parts=64,
                               plasma_schema=tok_schema)

    def _prefix(group: pa.Table) -> pa.Table:
        n = int(group["n"][0].as_py())
        p = n - (sim_num * n + sim_den - 1) // sim_den + 1
        order = pc.sort_indices(group, sort_keys=[("df", "ascending"),
                                                  ("token", "ascending")])
        return group.take(order[:p]).select(["doc_id", "token"])

    pre_schema = pa.schema([("doc_id", pa.int64()), ("token", pa.string())])
    prefix = hash_group_apply(with_df, ["doc_id"], _prefix, n_parts=64,
                              plasma_schema=pre_schema)

    def _pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(group["doc_id"], np.int64))
        if len(ids) < 2:
            return None
        a, b = np.triu_indices(len(ids), k=1)
        return pa.table({"doc_a": pa.array(ids[a], pa.int64()),
                         "doc_b": pa.array(ids[b], pa.int64())})

    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    cand = hash_group_apply(prefix, ["token"], _pairs, n_parts=64,
                            min_group_size=2, plasma_schema=pair_schema)
    # same pair can arise from several shared prefix tokens — dedup
    cand = (hash_group_apply(
        cand, ["doc_a", "doc_b"],
        lambda g: g.slice(0, 1), n_parts=64, plasma_schema=pair_schema)
        .materialize())

    member_ids: set = set()
    for b in cand.iter_batches(batch_format="pyarrow"):
        member_ids.update(b["doc_a"].to_pylist())
        member_ids.update(b["doc_b"].to_pylist())
    if not member_ids:
        return rd.from_arrow(out_schema.empty_table())
    id_ref = ray.put(pa.array(sorted(member_ids), pa.int64()))

    def _sets(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(pc.cast(batch[id_col], pa.int64()),
                        value_set=ray.get(id_ref))
        batch = batch.filter(keep)
        sub = _toks(batch)   # reads id_col/text_col from the closure
        ids, sets = [], []
        if len(sub):
            d = np.asarray(sub["doc_id"], np.int64)
            tk = sub["token"].to_pylist()
            order = np.argsort(d, kind="stable")
            bounds = np.flatnonzero(np.diff(d[order])) + 1
            for seg in np.split(order, bounds):
                ids.append(int(d[seg[0]]))
                sets.append({tk[i] for i in seg})
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "tset": pa.array([sorted(s) for s in sets],
                             pa.list_(pa.string()))})

    collected = docs.select_columns([id_col, text_col]).map_batches(
        _sets, batch_format="pyarrow", zero_copy_batch=True).take_all()
    set_ref = ray.put({r["doc_id"]: set(r["tset"]) for r in collected})

    def _verify(batch: pa.Table) -> pa.Table:
        smap = ray.get(set_ref)
        oa, ob, na, nb, ni, jp = [], [], [], [], [], []
        for a, b in zip(batch["doc_a"].to_pylist(),
                        batch["doc_b"].to_pylist()):
            sa, sb = smap.get(a), smap.get(b)
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if sim_den * inter >= sim_num * union:
                oa.append(a)
                ob.append(b)
                na.append(len(sa))
                nb.append(len(sb))
                ni.append(inter)
                jp.append(inter * 1000 // max(union, 1))
        return pa.table({
            "doc_a": pa.array(oa, pa.int64()),
            "doc_b": pa.array(ob, pa.int64()),
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nb, pa.int64()),
            "n_inter": pa.array(ni, pa.int64()),
            "jaccard_permille": pa.array(jp, pa.int64())})

    return cand.map_batches(_verify, batch_format="pyarrow",
                            zero_copy_batch=True)
