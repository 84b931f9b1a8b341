"""Round-5 wave 16: exact set-similarity join (PPJoin prefix filter)."""

import itertools

import pyarrow as pa


def _docs(texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def _brute(texts, num=3, den=5):
    sets = [set(t.split()) for t in texts]
    out = set()
    for a, b in itertools.combinations(range(len(texts)), 2):
        sa, sb = sets[a], sets[b]
        if not sa or not sb:
            continue
        inter = len(sa & sb)
        union = len(sa | sb)
        if den * inter >= num * union:
            out.add((a, b))
    return out


def test_set_join_planted_pair():
    from trustfuse_ray.stages.dedup import set_similarity_join

    texts = ["alpha beta gamma delta epsilon",
             "alpha beta gamma delta zeta",       # J = 4/6 = 0.667 >= 0.6
             "one two three four five",           # disjoint
             "alpha one"]                         # low overlap
    rows = set_similarity_join(_docs(texts)).take_all()
    got = {(r["doc_a"], r["doc_b"]) for r in rows}
    assert got == {(0, 1)}
    r = rows[0]
    assert r["n_inter"] == 4 and r["n_a"] == 5 and r["n_b"] == 5
    assert r["jaccard_permille"] == 4000 // 6


def test_set_join_boundary_exact_threshold():
    from trustfuse_ray.stages.dedup import set_similarity_join

    # J exactly 3/5: |A|=4, |B|=4, inter=3 -> union=5, 5*3 == 3*5 kept
    texts = ["a b c d", "a b c e"]
    rows = set_similarity_join(_docs(texts)).take_all()
    assert len(rows) == 1 and rows[0]["jaccard_permille"] == 600


def test_set_join_duplicate_tokens_collapse():
    from trustfuse_ray.stages.dedup import set_similarity_join

    # repeated words count once: both sets are {x, y} -> J = 1
    texts = ["x x x y", "y x"]
    rows = set_similarity_join(_docs(texts)).take_all()
    assert len(rows) == 1
    assert rows[0]["n_a"] == 2 and rows[0]["n_b"] == 2
    assert rows[0]["jaccard_permille"] == 1000


def test_set_join_prefix_filter_is_lossless():
    from trustfuse_ray.stages.dedup import set_similarity_join

    # seeded random corpus from a small vocabulary: every >=0.6 pair the
    # brute-force O(n^2) scan finds must survive the prefix filter
    import numpy as np
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 12)))
             for _ in range(60)]
    got = {(r["doc_a"], r["doc_b"])
           for r in set_similarity_join(_docs(texts)).take_all()}
    assert got == _brute(texts)


def test_set_join_empty_and_no_pairs():
    from trustfuse_ray.stages.dedup import set_similarity_join

    rows = set_similarity_join(_docs(["solo words here", ""])).take_all()
    assert rows == []
