"""Round-5 wave 16: integer-exact bigram LM surprisal."""

import os
import tempfile

import pyarrow as pa


def _run(texts):
    import ray.data as rd

    from trustfuse_ray.pipelines import queries as q

    d = tempfile.mkdtemp()
    rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string())})).write_parquet(
        os.path.join(d, "documents.parquet"))
    return {r["doc_id"]: r for r in q.q_bigram_surprisal(d).take_all()}


def test_surprisal_deterministic_counts():
    # corpus: "a b" x3, "a c" x1  ->  c1(a)=4, c2(a,b)=3, c2(a,c)=1
    # bits(a,b) = bit_length(4//3=1) = 1; bits(a,c) = bit_length(4) = 3
    out = _run(["a b", "a b", "a b", "a c"])
    assert out[0]["total_bits"] == 1 and out[0]["n_bigrams"] == 1
    assert out[3]["total_bits"] == 3
    assert out[3]["avg_millibits"] == 3000


def test_surprisal_short_docs_drop():
    # docs with <2 tokens produce no bigrams and no output row
    out = _run(["solo", "", "x y"])
    assert set(out) == {2}
    # unique bigram: c1 == c2 == 1 -> bits = bit_length(1) = 1
    assert out[2]["total_bits"] == 1 and out[2]["n_bigrams"] == 1


def test_surprisal_repetitive_doc_scores_low():
    # a doc of one repeated bigram is maximally predictable vs a doc of
    # unique transitions from a shared head word
    texts = ["z z z z z z z z z",            # 8 x (z,z)
             "q r q s q t q u q v"]          # every (q,.) distinct
    out = _run(texts)
    assert out[0]["avg_millibits"] < out[1]["avg_millibits"]
