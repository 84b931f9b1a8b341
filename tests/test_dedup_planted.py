"""Dedup operators against the planted-duplicate synthetic document corpus
(FIXTURES-style oracle: the generator records which docs are duplicates)."""

import pyarrow.parquet as pq
import ray.data

from trustfuse_ray import synth
from trustfuse_ray.stages import text
from trustfuse_ray.stages.dedup import (minhash_clusters, minhash_lsh_pairs,
                                        ngram_jaccard, simhash_near_pairs)


def _corpus():
    path = synth.generate_documents("/root/testdata/sf0.001")
    t = pq.read_table(path)
    ds = ray.data.read_parquet(path)
    truth_pairs = {(r["dup_of"], r["doc_id"])
                   for r in t.to_pylist() if r["dup_of"] >= 0}
    exact = {(r["dup_of"], r["doc_id"])
             for r in t.to_pylist() if r["kind"] == "exact_dup"}
    return ds, truth_pairs, exact, t


def test_minhash_finds_planted_near_dups():
    ds, truth, exact, t = _corpus()
    pairs = minhash_lsh_pairs(ds, threshold=0.6).take_all()
    found = {(p["doc_a"], p["doc_b"]) for p in pairs}
    # transitive chains (dup of a dup) may link to the chain root instead;
    # require ≥90% direct recall of planted pairs
    hit = sum(1 for p in truth if p in found)
    assert hit / len(truth) >= 0.9, (hit, len(truth))
    # verified estimates are honest: planted near-dups share most shingles
    texts = t["text"].to_pylist()
    for p in pairs:
        if (p["doc_a"], p["doc_b"]) in truth:
            jac = ngram_jaccard(texts[p["doc_a"]], texts[p["doc_b"]])
            assert jac >= 0.5


def test_exact_dedup_on_planted():
    ds, truth, exact, t = _corpus()
    fps = text.doc_fingerprints(ds)
    keep = fps.groupby("fp").min("doc_id")
    n_groups = keep.count()
    # every exact dup collapses into its source's group
    assert n_groups == ds.count() - len(exact)


def test_simhash_finds_exact_dups():
    ds, truth, exact, t = _corpus()
    pairs = simhash_near_pairs(ds, max_hamming=3)
    found = {(p["doc_a"], p["doc_b"]) for p in pairs.take_all()}
    hit = sum(1 for p in exact if p in found)
    assert hit / max(1, len(exact)) >= 0.9


def test_minhash_clusters_group_dup_families():
    ds, truth, exact, t = _corpus()
    parent = minhash_clusters(ds, threshold=0.6)
    # every exact dup lands in the same cluster as its source
    for src, dup in exact:
        assert parent.get(dup, dup) == parent.get(src, src)


def test_minhash_adversarial_identical_bucket():
    """≥10⁴ identical docs — one degenerate LSH bucket per band — must not
    emit O(n²) candidate pairs (the pre-cap code would build 5×10⁷ rows
    here): the star+chain cap bounds emission to O(n), and connected
    components over the capped pair list still collapse every copy into one
    cluster."""
    import numpy as np
    import pyarrow as pa

    from trustfuse_ray.stages.dedup import minhash_lsh_pairs
    from trustfuse_ray.stages.graph import connected_components

    n = 10_000
    boiler = ("the same boilerplate paragraph repeated verbatim in every "
              "document of this adversarial corpus to force one giant "
              "lsh bucket")
    tbl = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)),
                    "text": pa.array([boiler] * n)})
    ds = ray.data.from_arrow(tbl).repartition(8)
    pairs = minhash_lsh_pairs(ds, threshold=0.6).materialize()
    assert pairs.count() <= 4 * n  # star+chain: 2n−3 unique pairs
    labels = connected_components(pairs, src="doc_a", dst="doc_b")
    assert len({r["label"] for r in labels.take_all()}) == 1


def test_ivf_near_pairs_planted_at_scale():
    """1e5+ vectors through the IVF-bucketed near-pair path (no take_all of
    the corpus, no corpus-sized broadcast): planted near-dup recall >= 0.9."""
    import numpy as np
    import pyarrow as pa

    from trustfuse_ray.stages.dedup import embedding_near_pairs

    rng = np.random.default_rng(42)
    n_base, n_dup, dim = 100_000, 400, 16
    base = rng.standard_normal((n_base, dim))
    dup_src = rng.choice(n_base, size=n_dup, replace=False)
    dups = base[dup_src] + 0.02 * rng.standard_normal((n_dup, dim))
    mat = np.vstack([base, dups]).astype(np.float32)
    ids = np.arange(n_base + n_dup, dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1)), dim),
    })
    ds = ray.data.from_arrow(tbl).repartition(16)
    # > max_broadcast_rows -> routes through ivf_near_pairs
    pairs = embedding_near_pairs(ds, threshold=0.95, n_lists=64, nassign=2)
    found = {(p["doc_a"], p["doc_b"]) for p in pairs.take_all()}
    truth = {(int(s), int(n_base + i)) for i, s in enumerate(dup_src)}
    hit = sum(1 for p in truth if p in found)
    assert hit / len(truth) >= 0.9, (hit, len(truth))


def test_minhash_empty_corpus():
    """Zero-block input through the plasma exchange: no IndexError, 0 pairs
    with the typed pair schema."""
    import pyarrow as pa
    empty = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    empty = empty.filter(lambda r: True)  # force a (possibly 0-block) plan
    pairs = minhash_lsh_pairs(empty)
    assert pairs.count() == 0


def test_perm_vals_bit_parity_with_mod():
    """The in-place permutation kernel must be bit-identical to the plain
    (a*x+b) % p expression, including boundary shingle hashes."""
    import numpy as np

    from trustfuse_ray.stages.dedup import MinHasher

    h = MinHasher(num_hashes=16)
    rng = np.random.default_rng(3)
    base = np.concatenate([
        rng.integers(0, 1 << 31, size=5000, dtype=np.uint64),
        np.array([0, 1, (1 << 31) - 2, (1 << 31) - 1], np.uint64)])
    ref = (h.a[:, None] * base[None, :] + h.b[:, None]) % h.PRIME
    assert np.array_equal(h._perm_vals(base), ref)


def test_tokenmix_signatures_match_scalar_reference():
    """tokenmix (the vectorized production family) must equal a per-doc
    scalar re-implementation of its definition: ASCII-\\w tokens of
    lower(trim(text)), shingle hash = FNV-prime fold of the k token FNV
    hashes, signature = min (a*h+b) mod p, PRIME-filled for empty docs."""
    import re

    import numpy as np
    import pyarrow as pa

    from trustfuse_ray.stages.dedup import MinHasher
    from trustfuse_ray.stages.extract import fnv64

    docs = [
        "The quick brown fox jumps over the lazy dog",
        "",                      # empty → PRIME-filled signature
        "   \t  ",               # whitespace-only → PRIME-filled
        "one",                   # short: 1 token
        "two tokens",            # short: 2 tokens (k=3)
        "punct,separated;tokens!here and-more",
        "a b c d",               # exactly k+1 tokens
    ]
    h = MinHasher(num_hashes=8, shingle_k=3)
    out = h(pa.table({"doc_id": pa.array(range(len(docs))),
                      "text": pa.array(docs)}))
    got = np.array(out["minhash"].to_pylist(), dtype=np.uint64)

    prime = np.uint64(0x100000001B3)
    word = re.compile(r"[0-9A-Za-z_]+")  # RE2 \w is ASCII
    for i, d in enumerate(docs):
        toks = word.findall(d.strip().lower())
        if not toks:
            assert (got[i] == h.PRIME).all(), d
            continue
        ths = [np.uint64(fnv64(t)) for t in toks]
        if len(toks) < h.k:
            win = [ths]
        else:
            win = [ths[j:j + h.k] for j in range(len(toks) - h.k + 1)]
        bases = []
        for w in win:
            acc = w[0]
            for t in w[1:]:
                acc = acc * prime ^ t
            bases.append(int(acc & np.uint64(0x7FFFFFFF)))
        base = np.array(bases, dtype=np.uint64)
        exp = ((h.a[:, None] * base[None, :] + h.b[:, None])
               % h.PRIME).min(axis=1)
        assert np.array_equal(got[i], exp), d
    # single-doc signature() routes through the same kernel
    assert np.array_equal(h.signature(docs[0]), got[0])


def test_cluster_best_docs_keeps_quality_winner():
    import pyarrow as pa
    import ray.data as rd

    from trustfuse_ray.stages.dedup import cluster_best_docs

    base = ("the quick brown fox jumps over the lazy dog and then "
            "the fox runs away into the woods near the river") * 3
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        # 1 and 2 near-identical (cluster); 2 carries one huge junk
        # token (big char penalty, one token) -> lower score;
        # 3 unrelated singleton
        "text": pa.array([base, base + " " + "x" * 300,
                          "completely different content here entirely"],
                         pa.string()),
    })).repartition(2)
    out = {r["label"]: r["doc_id"]
           for r in cluster_best_docs(docs, threshold=0.5,
                                      hash_kind="md5").take_all()}
    assert out[1] == 1      # cluster {1,2}: higher score wins
    assert out[3] == 3      # singleton keeps itself
