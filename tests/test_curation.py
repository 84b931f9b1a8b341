"""Curation operators: decontamination, repetition signals, n-gram
Jaccard, hash sampling, sequence packing."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from trustfuse_ray.stages.curation import (decontaminate, hash_sample,
                                           ngram_jaccard_adjacent,
                                           repetition_batch, token_pack)


def _docs(rows):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
        "source": pa.array([r[2] if len(r) > 2 else "s" for r in rows],
                           pa.string()),
    }))


def test_repetition_known_values():
    b = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": pa.array(["a b a b a", "x y z w", "q q q q q"])})
    out = repetition_batch(b).to_pydict()
    # doc0: bigrams ab,ba,ab,ba -> top 2/4; trigrams aba,bab,aba -> dup 2/3
    assert out["n_bigrams"] == [4, 3, 4]
    assert out["top_bigram_n"] == [2, 1, 4]
    assert out["dup_trigram_n"] == [2, 0, 3]
    assert out["top_bigram_frac"][0] == 0.5
    assert out["dup_trigram_frac"][2] == 1.0


def test_decontaminate_planted():
    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    rows = [(0, bench_text)]                      # doc 0 defines the gram
    rows += [(i, f"clean document number {i} with plain words")
             for i in range(1, 96)]
    rows.append((96, "prefix " + bench_text[:40] + " suffix"))  # planted
    out = {r["doc_id"]: r for r in
           decontaminate(_docs(rows), grams=[bench_text[:40]]).take_all()}
    assert out[0]["contaminated"] and out[0]["n_hits"] == 1
    assert out[96]["contaminated"]
    assert not any(out[i]["contaminated"] for i in range(1, 96))


def test_ngram_jaccard_adjacent_extremes():
    rows = [(0, "alpha beta gamma delta", "s"),
            (1, "alpha beta gamma delta", "s"),     # identical -> 1.0
            (2, "one two three four five", "s")]    # disjoint  -> 0.0
    out = {(r["doc_lo"], r["doc_hi"]): r
           for r in ngram_jaccard_adjacent(_docs(rows)).take_all()}
    assert out[(0, 1)]["jaccard"] == 1.0
    assert out[(1, 2)]["jaccard"] == 0.0
    assert out[(0, 1)]["inter"] == 2 and out[(0, 1)]["uni"] == 2


def test_hash_sample_deterministic():
    rows = [(i, f"doc {i}") for i in range(2000)]
    a = sorted(r["doc_id"] for r in hash_sample(_docs(rows)).take_all())
    b = sorted(r["doc_id"] for r in hash_sample(_docs(rows)).take_all())
    assert a == b and a
    rate = len(a) / 2000
    assert 0.06 < rate < 0.15                      # ~26/256


def test_token_pack_greedy_invariants():
    rng = np.random.default_rng(7)
    rows = [(i, " ".join(["w"] * int(rng.integers(1, 200))),
             f"src{i % 3}") for i in range(300)]
    rows.append((300, " ".join(["w"] * 900), "src0"))   # oversized doc
    out = token_pack(_docs(rows), cap=512).take_all()
    assert len(out) == 301
    by_seq: dict[tuple, list] = {}
    for r in out:
        by_seq.setdefault((r["source"], r["seq_id"]), []).append(r)
    for (_, _), docs in by_seq.items():
        docs.sort(key=lambda r: r["seq_pos"])
        total = sum(d["n_tokens"] for d in docs)
        assert total <= 512 or len(docs) == 1       # only oversized alone
        assert [d["seq_pos"] for d in docs] == list(range(len(docs)))
        assert [d["doc_id"] for d in docs] == sorted(d["doc_id"]
                                                     for d in docs)
    # greedy: the doc after a closed sequence would not have fit
    for src in ("src0", "src1", "src2"):
        seqs = sorted({r["seq_id"] for r in out if r["source"] == src})
        docs = sorted((r for r in out if r["source"] == src),
                      key=lambda r: r["doc_id"])
        fill: dict[int, int] = {}
        for r in docs:
            fill[r["seq_id"]] = fill.get(r["seq_id"], 0) + r["n_tokens"]
        for prev, nxt in zip(seqs, seqs[1:]):
            first_next = min((r["n_tokens"] for r in docs
                              if r["seq_id"] == nxt and r["seq_pos"] == 0))
            assert fill[prev] + first_next > 512


def test_dedup_incremental_bloom_plus_exact():
    from trustfuse_ray.stages.curation import dedup_incremental
    old = _docs([(i, f"old doc text number {i}") for i in range(200)])
    new_rows = [(1000 + i, f"new doc text number {i}") for i in range(50)]
    new_rows += [(2000, "old doc text number 7"),     # dup of old 7
                 (2001, "OLD doc text number 7  "),   # canon dup of old 7
                 (2002, "old doc text number 199")]   # dup of old 199
    out = sorted(dedup_incremental(_docs(new_rows), old,
                                   n_bits=1 << 14).take_all(),
                 key=lambda r: r["doc_id"])
    assert [(r["doc_id"], r["dup_of"]) for r in out] == [
        (2000, 7), (2001, 7), (2002, 199)]


def test_token_chunks_overlap_strided():
    from trustfuse_ray.stages.curation import token_chunks_overlap

    words = [f"w{i}" for i in range(100)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([" ".join(words), "short doc"], pa.string()),
    }))
    got = token_chunks_overlap(ds, window=64, stride=48).to_pandas()
    d1 = got[got["doc_id"] == 1].sort_values("win_idx")
    # 100 tokens: windows at 0 (64) and 48 (52)
    assert list(d1["win_idx"]) == [0, 1]
    assert list(d1["n_tokens"]) == [64, 52]
    w0 = d1.iloc[0]["win_text"].split(" ")
    w1 = d1.iloc[1]["win_text"].split(" ")
    assert w0 == words[:64] and w1 == words[48:]
    assert w0[48:] == w1[:16]  # 16 tokens of shared context
    d2 = got[got["doc_id"] == 2]
    assert len(d2) == 1 and d2.iloc[0]["n_tokens"] == 2


def test_token_chunks_overlap_bad_stride():
    import pytest

    from trustfuse_ray.stages.curation import token_chunks_overlap

    ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                 "text": pa.array(["x"], pa.string())}))
    with pytest.raises(ValueError):
        token_chunks_overlap(ds, window=8, stride=9)


def test_null_text_rows_survive_minhash_and_pack():
    """Regression: a null text cell must not crash the tokenmix minhash
    path nor corrupt token_pack's counts."""
    from trustfuse_ray.stages.curation import token_pack
    from trustfuse_ray.stages.dedup import minhash_lsh_pairs

    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["alpha beta gamma delta epsilon zeta eta theta",
                          None,
                          "alpha beta gamma delta epsilon zeta eta theta"],
                         pa.string()),
        "source": pa.array(["s", "s", "s"]),
    }))
    pairs = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    assert {(r.doc_a, r.doc_b) for r in pairs.itertuples()} >= {(1, 3)}
    packed = token_pack(ds, cap=512).to_pandas()
    assert len(packed) == 3
    nt = dict(zip(packed["doc_id"].astype(int), packed["n_tokens"]))
    assert nt[2] == 1  # '' token, same as fill_null('') semantics
    assert (packed["seq_pos"] >= 0).all()


def test_lang_consistency_agreement_counts():
    import pyarrow as pa
    import ray.data as rd

    from trustfuse_ray.stages.text import lang_consistency

    rows = [
        # labeled en, clearly en -> agree
        ("s1", "en", "the cat and the dog is in that house"),
        # labeled fr, clearly en -> disagree
        ("s1", "fr", "the cat and the dog of it"),
        # labeled und, no markers -> agree
        ("s2", "und", "zzz qqq"),
    ]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "source": pa.array([r[0] for r in rows], pa.string()),
        "lang": pa.array([r[1] for r in rows], pa.string()),
        "text": pa.array([r[2] for r in rows], pa.string()),
    })).repartition(2)
    out = {r["source"]: (r["n_docs"], r["n_agree"])
           for r in lang_consistency(docs).take_all()}
    assert out == {"s1": (2, 1), "s2": (1, 1)}
