"""Profiling operators: heavy hitters, quantiles, histogram, props."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from trustfuse_ray.stages.profile import (extract_props, top_tokens,
                                          value_histogram, value_quantiles)


def test_top_tokens_counts_and_tiebreak():
    docs = rd.from_arrow(pa.table({
        "text": pa.array(["b a a", "b c", "d d"]),
    }))
    out = top_tokens(docs, k=3).take_all()
    assert [(r["token"], r["n"]) for r in out] == [
        ("a", 2), ("b", 2), ("d", 2)]  # ties broken token-asc


def test_value_quantiles_exact():
    vals = np.arange(101, dtype=np.float64)  # 0..100
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["x"] * 101),
        "value": pa.array(vals),
    }))
    r = value_quantiles(ds).take_all()[0]
    assert (r["n"], r["p50"], r["p90"], r["p99"]) == (101, 50.0, 90.0, 99.0)


def test_value_histogram_partials_merge():
    rng = np.random.default_rng(3)
    vals = rng.uniform(-10, 510, 5000)  # includes out-of-range clamps
    keys = rng.choice(["a", "b"], 5000)
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(keys), "value": pa.array(vals),
    })).repartition(8)  # force multi-block partials
    out = value_histogram(ds, lo=0.0, hi=500.0, bins=20).take_all()
    got = {(r["event_type"], r["bin"]): r["n"] for r in out}
    bins = np.clip(np.floor(vals / 25.0), 0, 19).astype(int)
    for key in ("a", "b"):
        for b in range(20):
            want = int(((keys == key) & (bins == b)).sum())
            assert got.get((key, b), 0) == want
    assert sum(got.values()) == 5000


def test_extract_props_agg():
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["x", "x", "y"]),
        "props": pa.array(['{"k": 5}', '{"k": -2}', '{"k": 7}']),
    }))
    out = {r["event_type"]: r for r in extract_props(ds).take_all()}
    assert out["x"]["n"] == 2 and out["x"]["sum_v"] == 3
    assert out["x"]["min_v"] == -2 and out["x"]["max_v"] == 5
    assert out["y"]["sum_v"] == 7


def test_topk_per_key_multiblock():
    rng = np.random.default_rng(11)
    n = 3000
    tbl = pa.table({
        "source": pa.array([f"s{int(x)}" for x in rng.integers(0, 7, n)]),
        "n_chars": pa.array(rng.integers(0, 10_000, n), pa.int64()),
        "doc_id": pa.array(np.arange(n), pa.int64()),
    })
    from trustfuse_ray.stages.profile import topk_per_key
    ds = rd.from_arrow(tbl).repartition(10)  # force combiner across blocks
    got = sorted(((r["source"], r["n_chars"], r["doc_id"])
                  for r in topk_per_key(ds, "source", "n_chars",
                                        k=5).take_all()))
    import pandas as pd
    df = tbl.to_pandas().sort_values(
        ["source", "n_chars", "doc_id"], ascending=[True, False, True])
    want = sorted(df.groupby("source").head(5).itertuples(index=False,
                                                          name=None))
    assert got == [(s, c, d) for s, c, d in want]


def test_hll_estimate_accuracy_and_merge():
    from trustfuse_ray.stages.profile import hll_estimate, hll_registers
    rng = np.random.default_rng(5)
    n = 60_000
    users = rng.integers(0, 20_000, n)          # ~19.0k distinct expected
    keys = np.where(users % 2 == 0, "even", "odd")
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(keys.tolist()),
        "user_id": pa.array(users, pa.int64()),
    })).repartition(12)                          # merge across partials
    import pyarrow as _pa
    regs = _pa.Table.from_pylist(hll_registers(ds).take_all())
    est = hll_estimate(regs)
    exact = {"even": len(set(users[users % 2 == 0])),
             "odd": len(set(users[users % 2 == 1]))}
    for k in ("even", "odd"):
        err = abs(est[k] - exact[k]) / exact[k]
        assert err < 0.05, (k, est[k], exact[k])


def test_quality_classifier_actor_pool():
    from trustfuse_ray.stages.text import QualityClassifier, quality_classify
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["the quick the lazy the", "x" * 500]),
    }))
    out = {r["doc_id"]: r for r in quality_classify(docs).take_all()}
    # doc0: n_tokens=5, n_chars=22, the_count=3 -> 15-22+150+100=243 keep
    assert out[0]["score_fp"] == 243 and out[0]["keep"]
    # doc1: n_tokens=1, n_chars=500, the_count=0 -> 3-500+100=-397 drop
    assert out[1]["score_fp"] == -397 and not out[1]["keep"]
    # stateless determinism of the scorer itself
    import pyarrow as _pa
    b = _pa.table({"doc_id": _pa.array([7], _pa.int64()),
                   "text": _pa.array(["a b c"])})
    assert QualityClassifier()(b)["score_fp"][0].as_py() == \
           QualityClassifier()(b)["score_fp"][0].as_py()


def test_embedding_centroids_exact():
    from trustfuse_ray.stages.ann import embedding_centroids
    vecs = [[1.0, -2.0], [3.0, 4.0], [0.00005, -0.00005]]
    ds = rd.from_arrow(pa.table({
        "label": pa.array([1, 1, 2], pa.int32()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    })).repartition(3)  # partial sums merge across blocks
    out = {(r["label"], r["dim_idx"]): r
           for r in embedding_centroids(ds).take_all()}
    assert out[(1, 0)]["sum_fx"] == 40000 and out[(1, 0)]["n"] == 2
    assert out[(1, 0)]["mean"] == 2.0
    assert out[(1, 1)]["sum_fx"] == 20000 and out[(1, 1)]["mean"] == 1.0
    # tiny values follow the same float32→fixed-point path as the oracle
    want = int(np.floor(np.float64(np.float32(0.00005)) * 10000 + 0.5))
    assert out[(2, 0)]["sum_fx"] == want
    assert out[(2, 1)]["sum_fx"] == -want


def test_bottomk_sample_partition_invariant():
    from trustfuse_ray.stages.profile import bottomk_hash_sample
    tbl = pa.table({
        "source": pa.array([f"s{i % 4}" for i in range(800)]),
        "doc_id": pa.array(np.arange(800), pa.int64()),
    })
    a = sorted((r["source"], r["doc_id"]) for r in bottomk_hash_sample(
        rd.from_arrow(tbl).repartition(2), k=7).take_all())
    b = sorted((r["source"], r["doc_id"]) for r in bottomk_hash_sample(
        rd.from_arrow(tbl).repartition(13), k=7).take_all())
    assert a == b and len(a) == 28          # 4 keys x 7, any partitioning


def test_bpe_pair_counts_exact_and_unicode():
    import collections

    from trustfuse_ray.stages.profile import bpe_pair_counts

    texts = ["abab ab", "  ab  ba ", "", None, "é́x ab", "a"]
    docs = rd.from_arrow(pa.table({
        "text": pa.array(texts, pa.string())})).repartition(3)
    got = {(r["l"], r["r"]): r["n"]
           for r in bpe_pair_counts(docs, min_count=1).take_all()}
    want = collections.Counter()
    for t in texts:
        for w in (t or "").strip().split():
            for x, y in zip(w, w[1:]):
                want[(x, y)] += 1
    assert got == dict(want)
    # min_count filter
    got2 = {(r["l"], r["r"]): r["n"]
            for r in bpe_pair_counts(docs, min_count=3).take_all()}
    assert got2 == {k: v for k, v in want.items() if v >= 3}


def test_charlm_scores_exact():
    import collections
    import math

    from trustfuse_ray.stages.profile import charlm_scores

    texts = ["ab ab cd", "abab", "", None, "zz"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(2)
    got = {r["doc_id"]: r["lm_score"]
           for r in charlm_scores(docs).take_all()}
    # sequential oracle
    pairs = collections.Counter()
    perdoc = []
    for t in texts:
        dps = []
        for w in (t or "").strip().split():
            dps += list(zip(w, w[1:]))
        perdoc.append(dps)
        pairs.update(dps)
    marg = collections.Counter()
    for (l, _), n in pairs.items():
        marg[l] += n
    want = {}
    for i, dps in enumerate(perdoc):
        want[i] = sum((pairs[p] + 1).bit_length()
                      - (marg[p[0]] + 1).bit_length() for p in dps)
    assert got == want
    assert got[2] == 0 and got[3] == 0      # empty / null docs score 0


def test_rule_violations_counts_and_nulls():
    import pyarrow.compute as pc

    from trustfuse_ray.stages.profile import rule_violations

    ds = rd.from_arrow(pa.table({
        "x": pa.array([1, -2, None, 5], pa.int64()),
        "s": pa.array(["a", "", None, "b"], pa.string()),
    })).repartition(2)
    rules = {
        "neg_x": lambda b: pc.less(b["x"], 0),
        "empty_s": lambda b: pc.or_kleene(pc.is_null(b["s"]),
                                           pc.equal(b["s"], "")),
        "never": lambda b: pc.greater(b["x"], 1000),
    }
    got = {r["rule"]: r["n_violations"]
           for r in rule_violations(ds, rules).take_all()}
    # null predicate results (x is NULL) never count as violations
    assert got == {"neg_x": 1, "empty_s": 2, "never": 0}


def test_char_pair_keys_property():
    """Kernel == naive pairs over Arrow's OWN trim+split (pins the
    vectorized doc/pair bookkeeping; regex semantics are Arrow's —
    RE2 ASCII \\s — and the ASCII-whitespace boundary vs DuckDB's
    Unicode \\s is documented on char_pair_keys)."""
    import pyarrow.compute as pc
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from trustfuse_ray.stages.profile import char_pair_keys

    texts_st = st.lists(
        st.one_of(st.none(),
                  st.text(alphabet=st.characters(
                      blacklist_categories=("Cs",)), max_size=40)),
        min_size=0, max_size=8)

    @settings(max_examples=60, deadline=None)
    @given(texts_st)
    def check(texts):
        arr = pa.array(texts, pa.string())
        docix, keys = char_pair_keys(arr)
        got = {}
        for d, k in zip(docix, keys):
            got.setdefault(int(d), []).append(
                (chr(int(k) >> 21), chr(int(k) & 0x1FFFFF)))
        words = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(arr), r"\s+").to_pylist()
        want = {}
        for i, ws in enumerate(words):
            ps = []
            for w in (ws or []):
                ps += list(zip(w, w[1:]))
            if ps:
                want[i] = ps
        assert got == want

    check()


def test_table_profile_nulls_and_distinct():
    from trustfuse_ray.stages.profile import table_profile

    ds = rd.from_arrow(pa.table({
        "a": pa.array(["x", "y", "x", None], pa.string()),
        "b": pa.array([1, 1, 2, 3], pa.int64()),
    })).repartition(2)
    out = {r["column"]: (r["n_rows"], r["n_null"], r["n_distinct"])
           for r in table_profile(ds, ["a", "b"]).take_all()}
    assert out == {"a": (4, 1, 2), "b": (4, 0, 3)}


def test_source_token_divergence_exact():
    import collections

    from trustfuse_ray.stages.profile import source_token_divergence

    rows = [("s1", "a a b"), ("s1", "a c"), ("s2", "b b b d"), ("s2", "")]
    docs = rd.from_arrow(pa.table({
        "source": pa.array([r[0] for r in rows], pa.string()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    })).repartition(2)
    got = {r["source"]: r["div_fx"]
           for r in source_token_divergence(docs, n_parts=2).take_all()}
    per = collections.Counter()
    tot = collections.Counter()
    for s, t in rows:
        for w in t.strip().split() or [""]:
            per[(s, w)] += 1
            tot[w] += 1
    want = collections.Counter()
    for (s, w), n in per.items():
        want[s] += n * ((n + 1).bit_length() - (tot[w] + 1).bit_length())
    assert got == dict(want)


def test_winsorized_stats_exact():
    import numpy as np

    from trustfuse_ray.stages.profile import winsorized_stats

    vals = list(range(100))          # p1 idx floor(.01*99)=0 -> lo=0
    vals[99] = 10_000                # p99 idx 98 -> hi=98, one high clip
    ds = rd.from_arrow(pa.table({
        "event_type": pa.array(["t"] * 100, pa.string()),
        "value": pa.array([float(v) for v in vals], pa.float64()),
    })).repartition(3)
    out = winsorized_stats(ds, q_lo=0.01, q_hi=0.99,
                           n_parts=2).take_all()[0]
    assert out["n"] == 100
    assert out["n_clipped_low"] == 0 and out["n_clipped_high"] == 1
    clipped = np.clip(np.array(vals, float), 0.0, 98.0)
    assert out["sum_clipped_fx"] == int(np.floor(clipped * 1000).sum())


def test_bpe_merges_trainer_semantics():
    import ray.data as rd

    from trustfuse_ray.stages.profile import _bpe_apply, bpe_merges

    # adjacent merges stay mergeable; overlap is left-to-right non-overlap
    assert _bpe_apply("abab", [("a", "b")]) == ["ab", "ab"]
    assert _bpe_apply("aaa", [("a", "a")]) == ["aa", "a"]
    assert _bpe_apply("aaa", [("a", "a"), ("aa", "a")]) == ["aaa"]

    docs = rd.from_items([{"text": "ab ab ab"}, {"text": "aaa aaa"}]
                         ).repartition(2)
    out = [(r["merge_idx"], r["l"], r["r"], r["n"])
           for r in bpe_merges(docs, n_merges=4).take_all()]
    # (a,a) n=4 wins round 0; (a,b) n=3; (aa,a) n=2; then no pairs -> stop
    assert out == [(0, "a", "a", 4), (1, "a", "b", 3), (2, "aa", "a", 2)]


def test_bpe_encode_counts():
    import ray.data as rd

    from trustfuse_ray.stages.profile import bpe_encode

    docs = rd.from_items([{"doc_id": 1, "text": "ab ab ab"},
                          {"doc_id": 2, "text": "aaa aaa"}]).repartition(2)
    out = {r["doc_id"]: (r["n_words"], r["n_tokens"])
           for r in bpe_encode(docs, n_merges=4).take_all()}
    # learned merges: (a,a),(a,b),(aa,a) -> "ab"=1 token, "aaa"=1 token
    assert out == {1: (3, 3), 2: (2, 2)}


def test_per_source_median_gate():
    import ray.data as rd

    from trustfuse_ray.stages.text import per_source_median_gate

    # src A: three docs with strictly increasing scores; lower median is
    # the middle one -> exactly two keep.  src B: single doc -> keeps.
    docs = rd.from_items([
        {"doc_id": 1, "source": "A", "text": "the the the"},
        {"doc_id": 2, "source": "A", "text": "a b"},
        {"doc_id": 3, "source": "A", "text": "x" * 200},
        {"doc_id": 4, "source": "B", "text": "whatever"},
    ]).repartition(2)
    out = {r["doc_id"]: (r["score_fp"], r["keep"])
           for r in per_source_median_gate(docs, n_parts=4).take_all()}
    scores = {d: s for d, (s, _) in out.items()}
    med_a = sorted([scores[1], scores[2], scores[3]])[1]
    for d in (1, 2, 3):
        assert out[d][1] == (scores[d] >= med_a)
    assert sum(out[d][1] for d in (1, 2, 3)) == 2
    assert out[4][1] is True or out[4][1] == True  # noqa: E712


def test_histogram_quantiles_edges():
    import ray.data as rd

    from trustfuse_ray.stages.profile import histogram_quantiles

    # 10 values 5,15,...,95 in bins 0..9 of width 10 over [0,100)
    events = rd.from_items([{"event_type": "a", "value": float(5 + 10 * i)}
                            for i in range(10)]).repartition(2)
    out = histogram_quantiles(events, key_col="event_type",
                              value_col="value", lo=0.0, hi=100.0,
                              bins=10, qs=(0.5, 0.9)).take_all()
    r = out[0]
    # rank p50 = floor(.5*9)=4 -> bin 4 -> upper edge 50; p90 rank 8 -> 90
    assert (r["n"], r["p50"], r["p90"]) == (10, 50.0, 90.0)


def test_oov_rates_against_topk():
    import ray.data as rd

    from trustfuse_ray.stages.profile import oov_rates

    docs = rd.from_items([
        {"doc_id": 1, "text": "a a a b"},
        {"doc_id": 2, "text": "a rare"},
    ]).repartition(2)
    out = {r["doc_id"]: (r["n_tokens"], r["n_oov"])
           for r in oov_rates(docs, k=2).take_all()}
    # top-2 vocab = {a, b}; 'rare' is OOV
    assert out == {1: (4, 0), 2: (2, 1)}


def _bpe_apply_reference(word, merges):
    """Straightforward list-walk merge (left-to-right, non-overlapping),
    the textbook rule the sentinel-replace trick must reproduce."""
    syms = list(word)
    for l, r in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_apply_matches_reference_walk():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from trustfuse_ray.stages.profile import _bpe_apply

    alphabet = st.sampled_from("abc")
    words = st.text(alphabet, max_size=12)

    @settings(max_examples=300, deadline=None)
    @given(word=words, seq=st.lists(
        st.tuples(st.text(alphabet, min_size=1, max_size=2),
                  st.text(alphabet, min_size=1, max_size=2)),
        max_size=4))
    def _check(word, seq):
        # grow merges the way the trainer does: later rules may reference
        # tokens created by earlier ones
        merges = []
        for l, r in seq:
            merges.append((l, r))
        assert _bpe_apply(word, merges) == _bpe_apply_reference(word,
                                                               merges)

    _check()


def test_conv_lang_switches_counts():
    import pyarrow as pa
    import ray.data as rd

    from trustfuse_ray.stages.text import conv_lang_switches

    turns = [  # en -> fr -> en = 2 switches, 2 langs
        ("c1", 0, "the cat and the dog"),
        ("c1", 1, "le chat est une merveille"),
        ("c1", 2, "it is the best of all"),
        ("c2", 0, "zzz qqq"),  # no markers -> und
    ]
    ds = rd.from_arrow(pa.table({
        "conv_id": pa.array([t[0] for t in turns], pa.string()),
        "turn_idx": pa.array([t[1] for t in turns], pa.int32()),
        "text": pa.array([t[2] for t in turns], pa.string()),
    })).repartition(2)
    out = {r["conv_id"]: (r["n_turns"], r["n_langs"], r["n_switches"])
           for r in conv_lang_switches(ds, n_parts=4).take_all()}
    assert out == {"c1": (3, 2, 2), "c2": (1, 1, 0)}


def test_dataset_card_scalars():
    import ray.data as rd

    from trustfuse_ray.stages.profile import dataset_card

    docs = rd.from_items([
        {"doc_id": 1, "text": "a b c", "source": "s1", "lang": "en"},
        {"doc_id": 2, "text": "a b c", "source": "s2", "lang": "en"},
        {"doc_id": 3, "text": "d e", "source": "s1", "lang": "fr"},
    ]).repartition(2)
    row = dataset_card(docs).take_all()[0]
    assert (row["n_docs"], row["n_words"], row["n_sources"],
            row["n_langs"], row["n_distinct_texts"],
            row["n_exact_dups"]) == (3, 8, 2, 2, 2, 1)


def test_bm25_prefers_term_density():
    import ray.data as rd

    from trustfuse_ray.stages.profile import bm25_topk

    docs = rd.from_items([
        {"doc_id": 1, "text": "cat cat cat dog"},     # dense in 'cat'
        {"doc_id": 2, "text": "cat " + "x " * 50},    # one hit, long doc
        {"doc_id": 3, "text": "dog only here"},       # no hit
    ]).repartition(2)
    out = bm25_topk(docs, terms=("cat",), k=3).take_all()
    ranked = [r["doc_id"] for r in out]
    scores = {r["doc_id"]: r["score_fx"] for r in out}
    assert ranked[0] == 1 and scores[1] > scores[2] > scores[3] == 0
