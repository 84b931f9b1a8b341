"""centroid_confusion (stages/ann.py) vs a sequential int-exact mirror;
normalized_dedup (stages/text.py) collapsing case/whitespace/NFC variants."""

import hashlib

import numpy as np
import pyarrow as pa


def _emb_ds(vecs, labels, parts=3):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })).repartition(parts)


def _seq_confusion(vecs, labels, scale=10_000):
    q = np.where(np.asarray(vecs, np.float64) * scale >= 0,
                 np.floor(np.asarray(vecs, np.float64) * scale + 0.5),
                 -np.floor(-np.asarray(vecs, np.float64) * scale + 0.5)
                 ).astype(np.int64)
    labs = sorted(set(labels))
    cent = np.stack([
        np.floor_divide(q[[i for i, l in enumerate(labels) if l == lab]]
                        .sum(axis=0),
                        sum(1 for l in labels if l == lab))
        for lab in labs])
    out: dict = {}
    for i, lab in enumerate(labels):
        d = ((q[i][None, :] - cent) ** 2).sum(axis=1)
        pred = labs[int(np.argmin(d))]
        out[(lab, pred)] = out.get((lab, pred), 0) + 1
    return out


def test_confusion_matches_sequential(ray_session):
    from trustfuse_ray.stages.ann import centroid_confusion

    rng = np.random.default_rng(7)
    labels = [int(x) for x in rng.integers(0, 3, 40)]
    # clusters around (label, label) with noise so some rows cross over
    vecs = [rng.normal(loc=l, scale=0.9, size=4) for l in labels]
    got = {(r["label"], r["pred_label"]): r["n"]
           for _, r in centroid_confusion(
               _emb_ds(vecs, labels)).to_pandas().iterrows()}
    assert got == _seq_confusion(vecs, labels)
    assert sum(got.values()) == len(labels)


def test_confusion_tight_clusters_diagonal(ray_session):
    from trustfuse_ray.stages.ann import centroid_confusion

    labels = [0] * 5 + [1] * 5
    vecs = [[0.0, 0.0]] * 5 + [[5.0, 5.0]] * 5
    got = centroid_confusion(_emb_ds(vecs, labels)).to_pandas()
    assert set(zip(got["label"], got["pred_label"])) == {(0, 0), (1, 1)}
    assert got["n"].tolist() == [5, 5] or sorted(got["n"]) == [5, 5]


def test_confusion_empty(ray_session):
    from trustfuse_ray.stages.ann import centroid_confusion

    out = centroid_confusion(_emb_ds([], [], parts=1))
    assert out.count() == 0


def test_normalized_dedup_variants_collide(ray_session):
    import ray.data as rd
    from trustfuse_ray.stages.text import normalized_dedup

    texts = ["Hello   World", "  hello world ", "hello\tworld",
             "café", "café",        # NFC: composed == combining
             "something else"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(2)
    out = normalized_dedup(docs).to_pandas().sort_values(
        "keep_id").reset_index(drop=True)
    assert len(out) == 3
    assert out["keep_id"].tolist() == [0, 3, 5]
    assert out["n"].tolist() == [3, 2, 1]
    assert out.loc[0, "norm_fp"] == hashlib.md5(b"hello world").hexdigest()


def _seq_cohesion(vecs, labels, scale=10_000):
    q = np.where(np.asarray(vecs, np.float64) * scale >= 0,
                 np.floor(np.asarray(vecs, np.float64) * scale + 0.5),
                 -np.floor(-np.asarray(vecs, np.float64) * scale + 0.5)
                 ).astype(np.int64)
    out = {}
    for lab in sorted(set(labels)):
        rows = q[[i for i, l in enumerate(labels) if l == lab]]
        n = len(rows)
        num = sum(int(((rows[i] - rows[j]) ** 2).sum())
                  for i in range(n) for j in range(n))
        out[lab] = (n, num, n * (n - 1))
    return out


def test_cohesion_matches_bruteforce(ray_session):
    from trustfuse_ray.stages.ann import label_cohesion

    rng = np.random.default_rng(11)
    labels = [int(x) for x in rng.integers(0, 3, 30)]
    vecs = [rng.normal(loc=l, scale=0.7, size=5) for l in labels]
    got = {r["label"]: (r["n"], r["pair_num"], r["pairs"])
           for _, r in label_cohesion(
               _emb_ds(vecs, labels)).to_pandas().iterrows()}
    assert got == _seq_cohesion(vecs, labels)


def test_cohesion_identical_vectors_zero(ray_session):
    from trustfuse_ray.stages.ann import label_cohesion

    got = label_cohesion(_emb_ds([[1.0, 2.0]] * 6, [0] * 6)).to_pandas()
    assert got["pair_num"].tolist() == [0]
    assert got["pairs"].tolist() == [30]


def test_separation_matches_bruteforce(ray_session):
    from trustfuse_ray.stages.ann import centroid_separation

    rng = np.random.default_rng(13)
    labels = [int(x) for x in rng.integers(0, 4, 40)]
    vecs = [rng.normal(loc=2 * l, scale=0.5, size=3) for l in labels]
    q = np.where(np.asarray(vecs, np.float64) * 10_000 >= 0,
                 np.floor(np.asarray(vecs, np.float64) * 10_000 + 0.5),
                 -np.floor(-np.asarray(vecs, np.float64) * 10_000 + 0.5)
                 ).astype(np.int64)
    labs = sorted(set(labels))
    cent = np.stack([
        np.floor_divide(q[[i for i, l in enumerate(labels) if l == lab]]
                        .sum(axis=0),
                        sum(1 for l in labels if l == lab))
        for lab in labs])
    want = {(labs[i], labs[j]): int(((cent[i] - cent[j]) ** 2).sum())
            for i in range(len(labs)) for j in range(i + 1, len(labs))}
    got = {(r["label_a"], r["label_b"]): r["dist2"]
           for _, r in centroid_separation(
               _emb_ds(vecs, labels)).to_pandas().iterrows()}
    assert got == want


def test_dedup_keep_best_prefers_quality(ray_session):
    import ray.data as rd
    from trustfuse_ray.stages.text import QualityClassifier, dedup_keep_best

    # doc 0 and doc 2 collide after lower/trim; doc 2 has more "the"
    # tokens -> higher score, so the winner must be 2, not min-id 0.
    texts = ["  THE CAT  ", "other doc", "the cat",
             "the the the unique", "the cat"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(2)
    out = dedup_keep_best(docs).to_pandas().sort_values(
        "keep_id").reset_index(drop=True)
    scores = QualityClassifier()(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts, pa.string())}))["score_fp"].to_pylist()
    assert len(out) == 3
    grp = out.set_index("keep_id")
    # "the cat" group: ids 0,2,4 -> scores equal for 2 and 4 (identical
    # text), 0 has extra whitespace chars -> lower score; tie -> min id 2
    assert scores[2] == scores[4] and scores[0] < scores[2]
    assert 2 in grp.index and grp.loc[2, "n"] == 3
    assert grp.loc[2, "score_fp"] == scores[2]
    assert 1 in grp.index and grp.loc[1, "n"] == 1
    assert 3 in grp.index and grp.loc[3, "n"] == 1


def test_cluster_safe_split_no_leakage(ray_session):
    import ray.data as rd
    from trustfuse_ray.stages.dedup import cluster_safe_split

    base = ("the quick brown fox jumps over the lazy dog again and "
            "again while the band plays on " * 3)
    texts = [base, base + "extra", base + "extra word",
             "completely different text about other things entirely",
             "another unrelated document with its own content"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(2)
    out = cluster_safe_split(docs, threshold=0.5).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2, 3, 4]
    grp = out.set_index("doc_id")
    # the near-dup family 0/1/2 shares one label -> one split
    fam = grp.loc[[0, 1, 2]]
    assert fam["label"].nunique() == 1
    assert fam["split"].nunique() == 1
    # singletons are their own label
    assert grp.loc[3, "label"] == 3 and grp.loc[4, "label"] == 4
    assert set(out["split"]) <= {"train", "eval"}
    # partitioning invariance
    out2 = cluster_safe_split(docs.repartition(4),
                              threshold=0.5).to_pandas()
    a = out.sort_values("doc_id").reset_index(drop=True)
    b = out2.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_doc_continuations_planted(ray_session):
    import ray.data as rd
    from trustfuse_ray.stages.curation import doc_continuations

    mid = " ".join(f"t{i}" for i in range(8))          # shared boundary
    texts = [
        "a b c d e f g h " + mid,                      # 0: ends with mid
        mid + " x y z w v u s r",                      # 1: starts with mid
        mid + " q p o n m l k j",                      # 2: also starts
        "unrelated " * 10,                             # 3: no match
        "short doc",                                   # 4: < k tokens
    ]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(2)
    out = doc_continuations(docs, k=8, cap=64).to_pandas()
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert got == {(0, 1), (0, 2)}
    assert set(out["gram"]) == {mid}


def test_doc_continuations_boilerplate_cap(ray_session):
    import ray.data as rd
    from trustfuse_ray.stages.curation import doc_continuations

    footer = " ".join(f"f{i}" for i in range(8))
    # 3 docs END with the footer, 3 START with it; cap=2 kills the gram
    texts = [f"body {j} filler words here now " + footer for j in range(3)]
    texts += [footer + f" tail {j} more words beyond this" for j in range(3)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    assert doc_continuations(docs, k=8, cap=2).take_all() == []
    # with a permissive cap the 3x3 cross product appears
    out = doc_continuations(docs, k=8, cap=16).to_pandas()
    assert len(out) == 9


def test_lang_fertility_exact(ray_session):
    import ray.data as rd
    from trustfuse_ray.stages.text import lang_fertility

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "lang": pa.array(["en", "en", "fr", "fr"], pa.string()),
        # en: "don't stop" -> pieces [don,',t,stop]=4 tok / 2 words
        #     "a b"        -> 2 tok / 2 words  => en: 6/4 = 1500
        # fr: "c'est bon!" -> [c,',est,bon,!]=5 tok / 2 words
        #     ""           -> 0 tok / 0 words  => fr: 5/2 = 2500
        "text": pa.array(["don't stop", "a b", "c'est bon!", ""],
                         pa.string())})).repartition(2)
    out = lang_fertility(docs).to_pandas().set_index("lang")
    assert out.loc["en", "n_tokens"] == 6
    assert out.loc["en", "n_words"] == 4
    assert out.loc["en", "fertility_permille"] == 1500
    assert out.loc["fr", "n_tokens"] == 5
    assert out.loc["fr", "n_words"] == 2
    assert out.loc["fr", "fertility_permille"] == 2500
    assert out["n_docs"].tolist() == [2, 2]


def test_source_dup_matrix_planted(ray_session):
    import ray.data as rd
    from trustfuse_ray.stages.text import source_dup_matrix

    texts = ["same doc", "same doc", "Same Doc  ",   # canon-collide
             "other doc", "other doc", "unique to c"]
    srcs = ["a", "b", "c", "a", "c", "c"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "source": pa.array(srcs, pa.string()),
        "text": pa.array(texts, pa.string())})).repartition(2)
    out = source_dup_matrix(docs).to_pandas()
    got = {(r["source_a"], r["source_b"]): r["n_shared_fps"]
           for _, r in out.iterrows()}
    # fp1 "same doc" in a,b,c -> pairs ab, ac, bc; fp2 "other doc" in
    # a,c -> pair ac again
    assert got == {("a", "b"): 1, ("a", "c"): 2, ("b", "c"): 1}


def test_customer_rfm_segments(ray_session):
    import ray.data as rd
    from trustfuse_ray.pipelines.queries import q_customer_rfm  # noqa: F401

    # drive the stage logic through a hand corpus via the same kernel
    import trustfuse_ray.pipelines.queries as Q
    day = 86_400_000_000
    mx = 10_000 * day
    rows = []          # (cust, ts, price)
    rows += [(1, mx - i * 30 * day, 10.0) for i in range(9)]   # champion
    rows += [(2, mx - 100 * day, 5.0)]                          # active
    rows += [(3, mx - (366 + i) * day, 1.0) for i in range(8)]  # lapsing
    rows += [(4, mx - 400 * day, 2.505)]                        # dormant
    tbl = pa.table({
        "o_custkey": pa.array([c for c, _, _ in rows], pa.int64()),
        "o_orderdate": pa.array([t for _, t, _ in rows],
                                pa.timestamp("us")),
        "o_totalprice": pa.array([p for _, _, p in rows], pa.float64()),
    })
    orig = Q._tbl
    try:
        Q._tbl = lambda sf, name: rd.from_arrow(tbl).repartition(2)
        out = q_customer_rfm("unused").to_pandas().set_index("custkey")
    finally:
        Q._tbl = orig
    assert out.loc[1, "segment"] == "champion"
    assert out.loc[2, "segment"] == "active"
    assert out.loc[3, "segment"] == "lapsing_loyal"
    assert out.loc[4, "segment"] == "dormant"
    assert out.loc[2, "recency_days"] == 100
    assert out.loc[1, "n_orders"] == 9
    # 2.505 * 100 rounds half-away to 251 cents
    assert out.loc[4, "monetary_cents"] == 251


def test_part_copurchase_planted(ray_session):
    import ray.data as rd
    from trustfuse_ray.stages.joins import part_copurchase

    # orders: 1 -> {10,20,30}, 2 -> {10,20}, 3 -> {10,20} (dup rows),
    # 4 -> {30}
    rows = [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20),
            (3, 10), (3, 20), (3, 20), (4, 30)]
    li = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([o for o, _ in rows], pa.int64()),
        "l_partkey": pa.array([p for _, p in rows], pa.int64()),
    })).repartition(3)
    out = part_copurchase(li, min_support=2, n_parts=2).to_pandas()
    got = {(r["part_a"], r["part_b"]): r["n"] for _, r in out.iterrows()}
    # (10,20) in orders 1,2,3 = 3; (10,30)/(20,30) only order 1 -> cut
    assert got == {(10, 20): 3}
    all_pairs = part_copurchase(li, min_support=1, n_parts=2).to_pandas()
    got1 = {(r["part_a"], r["part_b"]): r["n"]
            for _, r in all_pairs.iterrows()}
    assert got1 == {(10, 20): 3, (10, 30): 1, (20, 30): 1}


def test_part_rules_confidence(ray_session):
    import ray.data as rd
    from trustfuse_ray.stages.joins import part_rules

    # part 10 in 4 orders, part 20 in 3, together in 3
    rows = [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 20),
            (4, 10)]
    li = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([o for o, _ in rows], pa.int64()),
        "l_partkey": pa.array([p for _, p in rows], pa.int64()),
    })).repartition(2)
    out = part_rules(li, min_support=2, n_parts=2).to_pandas()
    got = {(r["antecedent"], r["consequent"]):
           (r["n_both"], r["n_ant"], r["confidence_permille"])
           for _, r in out.iterrows()}
    assert got == {(10, 20): (3, 4, 750), (20, 10): (3, 3, 1000)}


def test_policy_flag_rates_planted(ray_session):
    import ray.data as rd
    from trustfuse_ray.stages.text import policy_flag_rates

    texts = ["an ATTACK happened", "counterattack story",  # \b blocks #2
             "weapon, cached", "clean doc", "Fraud!", "benign"]
    srcs = ["a", "a", "a", "b", "b", "b"]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "source": pa.array(srcs, pa.string()),
        "text": pa.array(texts, pa.string())})).repartition(2)
    out = policy_flag_rates(docs).to_pandas().set_index("source")
    assert out.loc["a", "n_flagged"] == 2      # ATTACK + weapon
    assert out.loc["a", "flag_permille"] == 666
    assert out.loc["b", "n_flagged"] == 1      # Fraud!
    assert out.loc["b", "flag_permille"] == 333


def test_k_anonymity_audit(ray_session):
    import ray.data as rd
    from trustfuse_ray.stages.profile import k_anonymity_audit

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(7), pa.int64()),
        "lang": pa.array(["en"] * 6 + ["fr"], pa.string()),
        "source": pa.array(["s"] * 7, pa.string()),
        "n_chars": pa.array([50, 90, 120, 130, 140, 150, 10], pa.int64()),
    })).repartition(2)
    out = k_anonymity_audit(docs, k=3).to_pandas()
    got = {(r["lang"], r["source"], r["len_bucket"]):
           (r["group_n"], r["at_risk"]) for _, r in out.iterrows()}
    assert got == {("en", "s", 0): (2, True),
                   ("en", "s", 1): (4, False),
                   ("fr", "s", 0): (1, True)}


def test_fk_violation_counting(ray_session):
    import ray.data as rd
    from trustfuse_ray.stages.joins import semi_join

    child = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 3, 9], pa.int64())})).repartition(2)
    parent = rd.from_arrow(pa.table({
        "p": pa.array([1, 2, 3], pa.int64())}))
    orphans = semi_join(child, parent, "k", "p", payload_cols=[],
                        anti=True)
    assert orphans.count() == 1          # only key 9 is orphaned


def test_events_csv_gz_roundtrip(ray_session):
    import ray.data as rd
    from trustfuse_ray import synth

    d = synth.generate_events_csv_gz("/root/testdata/sf0.001")
    ds = rd.read_csv(d, arrow_open_stream_args={"compression": "gzip"},
                     file_extensions=["gz"])
    import pyarrow.parquet as pq
    ref = pq.read_table("/root/testdata/sf0.001/events.parquet")
    assert ds.count() == ref.num_rows
    # values round-trip exactly through repr() -> csv -> arrow double
    got = sorted(ds.select_columns(["event_id", "value"]).take_all(),
                 key=lambda r: r["event_id"])
    want = sorted(ref.select(["event_id", "value"]).to_pylist(),
                  key=lambda r: r["event_id"])
    assert all(g["value"] == w["value"] for g, w in zip(got, want))


def test_events_orc_roundtrip(ray_session):
    import pyarrow.parquet as pq
    from pyarrow import orc

    from trustfuse_ray import synth

    d = synth.generate_events_orc("/root/testdata/sf0.001")
    import glob
    tables = [orc.read_table(p) for p in sorted(glob.glob(d + "/*.orc"))]
    got = pa.concat_tables(tables)
    ref = pq.read_table("/root/testdata/sf0.001/events.parquet")
    assert got.num_rows == ref.num_rows
    g = sorted(got.column("event_id").to_pylist())
    r = sorted(ref.column("event_id").to_pylist())
    assert g == r
