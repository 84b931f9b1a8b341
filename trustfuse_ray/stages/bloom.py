"""Fixed-size Bloom-filter membership index — the 100-TB path for
known-entity flagging.

Reference analog: ``compute_known_entities``
(`/root/reference/trustfuse/conflicting_dataset/dataset.py:84-95`) keeps a
cumulative Python set of every value seen in earlier buckets.  The engine's
exact form is the ``first_bucket`` predicate
(`windows.cumulative_known_entities`); at corpus scale the distinct-value
table itself grows with the data, so the broadcastable side index must be
fixed-size — this Bloom filter: numpy uint64 bit array, k double-hashed
probes derived from the same batched FNV fold the extractor uses.  Partial
filters build per block inside ``map_batches`` and OR together (associative,
fixed 2^n_bits/8 bytes per block row), so the build never materializes the
value set anywhere.

False positives mark an unseen entity "known" at the documented rate
(~(k·n/m)^k); false negatives never happen (tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from trustfuse_ray.stages.extract import fnv64_batch


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer — derives the second probe hash from the first."""
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


class BloomFilter:
    """Vectorized Bloom filter over Arrow string arrays."""

    def __init__(self, n_bits: int = 1 << 20, k: int = 4,
                 bits: np.ndarray | None = None):
        if n_bits & (n_bits - 1):
            raise ValueError("n_bits must be a power of two")
        self.n_bits = n_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(
            n_bits // 64, np.uint64)

    def _probes(self, arr) -> np.ndarray:
        h1 = np.asarray(fnv64_batch(arr).to_numpy(
            zero_copy_only=False)).view(np.uint64)
        h2 = _splitmix64(h1) | np.uint64(1)
        mask = np.uint64(self.n_bits - 1)
        idx = np.empty((self.k, len(h1)), np.uint64)
        for i in range(self.k):
            idx[i] = (h1 + np.uint64(i) * h2) & mask
        return idx

    def add(self, arr) -> None:
        if len(arr) == 0:
            return
        idx = self._probes(arr).ravel()
        np.bitwise_or.at(self.bits, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))

    def contains(self, arr) -> np.ndarray:
        """Vectorized membership over an Arrow string array → bool array."""
        if len(arr) == 0:
            return np.zeros(0, bool)
        idx = self._probes(arr)
        word = self.bits[(idx >> np.uint64(6)).astype(np.int64)]
        hit = (word >> (idx & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=0)

    # --- fixed-size (de)serialization for the distributed OR-merge ------
    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, k: int = 4) -> "BloomFilter":
        bits = np.frombuffer(data, np.uint64).copy()
        return cls(n_bits=len(bits) * 64, k=k, bits=bits)

    def union_(self, other: "BloomFilter") -> "BloomFilter":
        self.bits |= other.bits
        return self


def build_bloom(ds, value_col: str, n_bits: int = 1 << 20,
                k: int = 4) -> BloomFilter:
    """Distributed build: one partial filter per block (fixed
    ``n_bits/8``-byte row emitted from ``map_batches``), OR-merged on the
    driver.  Driver traffic is #blocks × n_bits/8 bytes — independent of
    row count."""
    def _partial(batch: pa.Table) -> pa.Table:
        f = BloomFilter(n_bits, k)
        col = batch[value_col]
        f.add(col.combine_chunks() if isinstance(col, pa.ChunkedArray)
              else col)
        return pa.table({"bloom": pa.array([f.to_bytes()], pa.binary())})

    out = ds.select_columns([value_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = BloomFilter(n_bits, k)
    for b in out.iter_batches(batch_format="pyarrow"):
        for piece in b["bloom"].to_pylist():
            merged.union_(BloomFilter.from_bytes(piece, k))
    return merged
