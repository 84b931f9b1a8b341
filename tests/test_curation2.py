"""Round-3 wave-2 curation/profile operators: line-level dedup, PII
redaction, shard assignment, count-min sketch, tf-idf terms."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from trustfuse_ray.stages.curation import (assign_shards, line_dedup,
                                           redact_pii)
from trustfuse_ray.stages.profile import (cms_estimate, cms_registers,
                                          tfidf_top_terms)


def _docs(rows, source="s"):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
        "source": pa.array([r[2] if len(r) > 2 else source for r in rows],
                           pa.string()),
    }))


# ---------------------------------------------------------------------------
# line_dedup
# ---------------------------------------------------------------------------

def _line_dedup_oracle(rows):
    """Sequential reference: first global (doc_id, line_idx) occurrence
    per distinct line survives; docs rebuilt; empty docs dropped."""
    seen = set()
    out = {}
    for doc_id, text in sorted(rows):
        lines = text.split("\n")
        kept = []
        for ln in lines:
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        if kept:
            out[doc_id] = ("\n".join(kept), len(lines), len(kept))
    return out


def test_line_dedup_matches_sequential():
    rows = [
        (0, "header\nbody zero\nfooter"),
        (1, "header\nbody one\nfooter"),     # header+footer deduped
        (2, "header\nfooter"),               # fully boilerplate → dropped
        (3, "body zero\nfresh line\n"),      # '' line is new here
        (4, ""),                             # '' dup of doc 3's last line
    ]
    got = {r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
           for r in line_dedup(_docs(rows), n_parts=8).take_all()}
    assert got == _line_dedup_oracle(rows)


def test_line_dedup_partition_invariant():
    rng = np.random.default_rng(7)
    pool = [f"boiler {i}" for i in range(10)]
    rows = []
    u = 0
    for d in range(60):
        lines = []
        for _ in range(int(rng.integers(1, 6))):
            if rng.random() < 0.5:
                lines.append(pool[int(rng.integers(0, 10))])
            else:
                u += 1
                lines.append(f"unique {u}")
        rows.append((d, "\n".join(lines)))
    ora = _line_dedup_oracle(rows)
    for nb in (1, 7):
        ds = _docs(rows).repartition(nb)
        got = {r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"])
               for r in line_dedup(ds, n_parts=4).take_all()}
        assert got == ora
    # global invariant: no surviving line appears twice anywhere
    flat = [ln for t, _, _ in ora.values() for ln in t.split("\n")]
    assert len(flat) == len(set(flat))


def test_line_dedup_empty_corpus():
    empty = _docs([]).filter(lambda r: False)
    assert line_dedup(empty, n_parts=4).count() == 0


# ---------------------------------------------------------------------------
# redact_pii
# ---------------------------------------------------------------------------

def test_redact_pii_planted():
    rows = [
        (0, "write to alice.smith+x@example.co.uk or bob@test.org now"),
        (1, "server at 192.168.0.1 and 10.0.0.255 responded"),
        (2, "call +33 6 12 34 56 78 today"),
        (3, "nothing sensitive here"),
    ]
    got = {r["doc_id"]: r for r in redact_pii(_docs(rows)).take_all()}
    assert got[0]["text"] == "write to <EMAIL> or <EMAIL> now"
    assert got[0]["n_redactions"] == 2 and got[0]["has_pii"]
    assert got[1]["text"] == "server at <IP> and <IP> responded"
    assert got[2]["text"] == "call <PHONE> today"
    assert got[3]["text"] == rows[3][1]
    assert got[3]["n_redactions"] == 0 and not got[3]["has_pii"]


def test_redact_pii_idempotent():
    rows = [(0, "mail a@b.io and ip 1.2.3.4")]
    once = redact_pii(_docs(rows)).take_all()[0]
    twice = redact_pii(
        rd.from_arrow(pa.table({"doc_id": pa.array([0], pa.int64()),
                                "text": pa.array([once["text"]])}))
    ).take_all()[0]
    assert twice["text"] == once["text"]
    assert twice["n_redactions"] == 0


# ---------------------------------------------------------------------------
# assign_shards
# ---------------------------------------------------------------------------

def test_assign_shards_invariants():
    rows = [(i, f"doc {i}") for i in range(200)]
    out = assign_shards(_docs(rows), n_shards=8, n_parts=4).take_all()
    assert len(out) == 200
    by_shard = {}
    for r in out:
        assert r["fp"] == hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        by_shard.setdefault(r["shard"], []).append((r["pos"], r["fp"]))
    assert set(by_shard) <= set(range(8))
    for shard, rows_ in by_shard.items():
        rows_.sort()
        # positions contiguous from 0 and ordered by fp
        assert [p for p, _ in rows_] == list(range(len(rows_)))
        fps = [f for _, f in rows_]
        assert fps == sorted(fps)
    # partition invariance
    out2 = assign_shards(_docs(rows).repartition(9), n_shards=8,
                         n_parts=4).take_all()
    key = lambda r: (r["doc_id"], r["shard"], r["pos"])  # noqa: E731
    assert sorted(map(key, out2)) == sorted(map(key, out))


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

def test_cms_upper_bound_and_merge():
    rows = [(i, " ".join(["alpha"] * 5 + ["beta"] * 2 + [f"tok{i}"]))
            for i in range(40)]
    reg = cms_registers(_docs(rows), depth=4, width=64).take_all()
    tbl = pa.table({
        "row_j": pa.array([r["row_j"] for r in reg], pa.int64()),
        "bucket": pa.array([r["bucket"] for r in reg], pa.int64()),
        "n": pa.array([r["n"] for r in reg], pa.int64()),
    })
    est = cms_estimate(tbl, ["alpha", "beta", "tok3", "absent-token"],
                       depth=4, width=64)
    # CMS estimates upper-bound true counts
    assert est["alpha"] >= 200 and est["beta"] >= 80 and est["tok3"] >= 1
    # totals per row are exact (each row hashes every token once)
    per_row = {}
    for r in reg:
        per_row[r["row_j"]] = per_row.get(r["row_j"], 0) + r["n"]
    n_tokens = sum(len(t.split()) for _, t in rows)
    assert all(v == n_tokens for v in per_row.values())
    # block-structure invariance (mergeability)
    reg2 = cms_registers(_docs(rows).repartition(7), depth=4,
                         width=64).take_all()
    key = lambda r: (r["row_j"], r["bucket"], r["n"])  # noqa: E731
    assert sorted(map(key, reg2)) == sorted(map(key, reg))


# ---------------------------------------------------------------------------
# tf-idf terms
# ---------------------------------------------------------------------------

def test_tfidf_top_terms_distinctive():
    rows = ([(i, "common filler words here plus aardvark", "sA")
             for i in range(10)]
            + [(10 + i, "common filler words here plus zebra", "sB")
               for i in range(10)])
    out = tfidf_top_terms(_docs(rows), k=2, n_parts=4).take_all()
    top = {r["source"]: [x["token"] for x in
                         sorted(out, key=lambda y: -y["score"])
                         if x["source"] == r["source"]][:1]
           for r in out}
    # the group-exclusive token wins (df=1 → max idf)
    assert top["sA"] == ["aardvark"]
    assert top["sB"] == ["zebra"]
    shared = [r for r in out if r["token"] == "common"]
    assert all(r["score"] == 0 for r in shared)  # df == n_groups → ln 1


# ---------------------------------------------------------------------------
# semantic dedup (embedding keep-list)
# ---------------------------------------------------------------------------

def test_semantic_dedup_keep_list():
    from trustfuse_ray.stages.dedup import semantic_dedup

    # two tight clusters + one far-away singleton
    base_a = np.array([1.0, 0.0, 0.0])
    base_b = np.array([0.0, 1.0, 0.0])
    vecs = [base_a, base_a * 0.99 + 0.01 * base_b,   # cluster {0, 1}
            base_b, base_b * 0.98 + 0.02 * base_a,   # cluster {2, 3}
            np.array([0.0, 0.0, 1.0])]               # singleton {4}
    emb = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(5), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float64())),
    }))
    out = {r["vec_id"]: r for r in
           semantic_dedup(emb, threshold=0.9, n_parts=4).take_all()}
    assert len(out) == 5
    assert out[0]["label"] == 0 and out[0]["keep"]
    assert out[1]["label"] == 0 and not out[1]["keep"]
    assert out[2]["label"] == 2 and out[2]["keep"]
    assert out[3]["label"] == 2 and not out[3]["keep"]
    assert out[4]["label"] == 4 and out[4]["keep"]
    # exactly one keeper per cluster
    keepers = {}
    for r in out.values():
        keepers.setdefault(r["label"], 0)
        keepers[r["label"]] += int(r["keep"])
    assert all(v == 1 for v in keepers.values())


# ---------------------------------------------------------------------------
# empty-corpus safety (mirrors test_empty_inputs for the wave-2 ops)
# ---------------------------------------------------------------------------

def test_wave2_ops_empty_corpus():
    from trustfuse_ray.stages.dedup import semantic_dedup

    empty_docs = _docs([(0, "x")]).filter(lambda r: False)
    assert redact_pii(empty_docs).count() == 0
    assert assign_shards(empty_docs, n_shards=4, n_parts=4).count() == 0
    assert cms_registers(empty_docs, depth=2, width=16).count() == 0
    assert tfidf_top_terms(empty_docs, k=3, n_parts=4).count() == 0
    empty_emb = rd.from_arrow(pa.table({
        "vec_id": pa.array([], pa.int64()),
        "embedding": pa.array([], pa.list_(pa.float64())),
    }))
    assert semantic_dedup(empty_emb, n_parts=4).count() == 0


# ---------------------------------------------------------------------------
# BFS hops (KG neighborhood)
# ---------------------------------------------------------------------------

def test_bfs_hops_min_distance():
    from trustfuse_ray.stages.graph import bfs_hops

    # a - b - c - d (path), plus shortcut a - c; e isolated-from-seed
    e = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("e", "f")]
    edges = rd.from_arrow(pa.table({
        "src": pa.array([x for x, _ in e] + [y for _, y in e]),
        "dst": pa.array([y for _, y in e] + [x for x, _ in e]),
    }))
    got = {r["node"]: r["hops"]
           for r in bfs_hops(edges, ["a"], k=3, n_parts=4).take_all()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}
    # k bounds the reach
    got1 = {r["node"]: r["hops"]
            for r in bfs_hops(edges, ["a"], k=1, n_parts=4).take_all()}
    assert got1 == {"a": 0, "b": 1, "c": 1}
    # multi-seed: min over seeds
    got2 = {r["node"]: r["hops"]
            for r in bfs_hops(edges, ["a", "e"], k=1, n_parts=4).take_all()}
    assert got2 == {"a": 0, "e": 0, "b": 1, "c": 1, "f": 1}


# ---------------------------------------------------------------------------
# token chunking
# ---------------------------------------------------------------------------

def test_token_chunks_windows():
    from trustfuse_ray.stages.curation import token_chunks

    rows = [(0, " ".join(f"t{i}" for i in range(7))),   # 3 windows of 3
            (1, "a b"),                                  # 1 window
            (2, "")]                                     # [''] → 1 window
    out = sorted(((r["doc_id"], r["win_idx"], r["n_tokens"], r["win_text"])
                  for r in token_chunks(_docs(rows), window=3).take_all()))
    assert out == [
        (0, 0, 3, "t0 t1 t2"), (0, 1, 3, "t3 t4 t5"), (0, 2, 1, "t6"),
        (1, 0, 2, "a b"), (2, 0, 1, ""),
    ]
    # every token appears in exactly one window, in order
    rebuilt = " ".join(t for d, w, n, t in out if d == 0 and t)
    assert rebuilt == rows[0][1]


# ---------------------------------------------------------------------------
# dup_spans (cross-document repeated-substring spans)
# ---------------------------------------------------------------------------

def _dup_spans_oracle(rows, k, min_docs=2):
    """Sequential reference: k-grams in >= min_docs distinct docs, merged
    per-doc into maximal overlapping/adjacent token spans."""
    grams = {}
    toks = {}
    for doc_id, text in rows:
        t = text.strip().split()
        toks[doc_id] = t
        for s in range(max(len(t) - k + 1, 0)):
            grams.setdefault(" ".join(t[s:s + k]), set()).add(doc_id)
    dup = {g for g, ds in grams.items() if len(ds) >= min_docs}
    out = []
    for doc_id, t in toks.items():
        starts = [s for s in range(max(len(t) - k + 1, 0))
                  if " ".join(t[s:s + k]) in dup]
        spans = []
        for s in starts:
            if spans and s <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], s + k)
            else:
                spans.append([s, s + k])
        out.extend((doc_id, a, b, b - a) for a, b in spans)
    return sorted(out)


def test_dup_spans_planted():
    from trustfuse_ray.stages.curation import dup_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-gram
    rows = [
        (0, f"u0 v0 {shared} w0 x0"),
        (1, f"{shared} tail1 different words here"),
        (2, "totally unrelated text with nothing shared at all ok"),
        # doc 3 contains the shared gram twice -> two windows merge into
        # spans; also shares a LONG run with doc 4 (adjacent windows merge)
        (3, f"{shared} mid {shared}"),
        (4, f"p4 {shared} q4 r4 s4 t4 u4 v4 w4"),
        (5, ""),
    ]
    long_run = "one two three four five six seven eight nine ten " \
               "eleven twelve"
    rows.append((6, long_run))
    rows.append((7, long_run + " extra"))
    got = dup_spans(_docs(rows), k=8, min_docs=2, n_parts=4).take_all()
    got = sorted((r["doc_id"], r["span_start"], r["span_end"],
                  r["n_tokens"]) for r in got)
    want = _dup_spans_oracle([(r[0], r[1]) for r in rows], k=8)
    assert got == want
    # the 12-token identical run in docs 6/7 must merge to ONE span of 12
    assert (6, 0, 12, 12) in got and (7, 0, 12, 12) in got


def test_dup_spans_partition_invariant():
    from trustfuse_ray.stages.curation import dup_spans

    rng = np.random.default_rng(11)
    vocab = [f"t{i}" for i in range(30)]
    rows = []
    for i in range(40):
        n = int(rng.integers(4, 40))
        rows.append((i, " ".join(vocab[int(x)]
                                 for x in rng.integers(0, 30, size=n))))
    want = _dup_spans_oracle(rows, k=5)
    for n_parts in (1, 4, 16):
        got = dup_spans(_docs(rows), k=5, min_docs=2,
                        n_parts=n_parts).take_all()
        got = sorted((r["doc_id"], r["span_start"], r["span_end"],
                      r["n_tokens"]) for r in got)
        assert got == want, n_parts


def test_dup_spans_empty_and_short():
    from trustfuse_ray.stages.curation import dup_spans

    rows = [(0, ""), (1, "too short"), (2, "also short")]
    assert dup_spans(_docs(rows), k=8, n_parts=4).take_all() == []


# ---------------------------------------------------------------------------
# substring_dedup (cut duplicated substrings, keep global first occurrence)
# ---------------------------------------------------------------------------

def _substring_dedup_oracle(rows, k, min_docs=2):
    grams = {}
    toks = {d: t.strip().split() for d, t in rows}
    for doc_id in sorted(toks):
        t = toks[doc_id]
        for s in range(max(len(t) - k + 1, 0)):
            g = " ".join(t[s:s + k])
            grams.setdefault(g, []).append((doc_id, s))
    dup = {g: occ for g, occ in grams.items()
           if len({d for d, _ in occ}) >= min_docs}
    out = []
    for doc_id, t in toks.items():
        lose = set()
        win = set()
        for g, occ in dup.items():
            w = min(occ)
            for d, s in occ:
                if d != doc_id:
                    continue
                tgt = win if (d, s) == w else lose
                tgt.update(range(s, s + k))
        keep = [tok for p, tok in enumerate(t)
                if p not in lose or p in win]
        if keep:
            out.append((doc_id, " ".join(keep), len(t),
                        len(t) - len(keep)))
    return sorted(out)


def test_substring_dedup_planted():
    from trustfuse_ray.stages.curation import substring_dedup

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, f"u0 v0 {shared} w0 x0"),          # winner (min doc_id)
        (1, f"{shared} tail1 of one two"),     # loser: 8 tokens cut
        (2, "totally unrelated text here with nothing shared at all"),
        (3, shared),                           # loser: fully cut -> dropped
    ]
    got = substring_dedup(_docs(rows), k=8, min_docs=2,
                          n_parts=4).take_all()
    got = sorted((r["doc_id"], r["text"], r["n_tokens"], r["n_cut"])
                 for r in got)
    want = _substring_dedup_oracle(rows, k=8)
    assert got == want
    ids = [r[0] for r in got]
    assert 3 not in ids                        # fully-cut doc dropped
    d1 = next(r for r in got if r[0] == 1)
    assert d1[1] == "tail1 of one two" and d1[3] == 8
    d0 = next(r for r in got if r[0] == 0)
    assert d0[3] == 0                          # winner keeps everything


def test_substring_dedup_partition_invariant():
    from trustfuse_ray.stages.curation import substring_dedup

    rng = np.random.default_rng(13)
    vocab = [f"t{i}" for i in range(25)]
    rows = []
    for i in range(40):
        n = int(rng.integers(4, 40))
        rows.append((i, " ".join(vocab[int(x)]
                                 for x in rng.integers(0, 25, size=n))))
    want = _substring_dedup_oracle(rows, k=5)
    for n_parts in (1, 4, 16):
        got = substring_dedup(_docs(rows), k=5, min_docs=2,
                              n_parts=n_parts).take_all()
        got = sorted((r["doc_id"], r["text"], r["n_tokens"], r["n_cut"])
                     for r in got)
        assert got == want, n_parts


def test_degree_histogram_exact():
    import pyarrow as pa
    import ray.data as rd

    from trustfuse_ray.stages.graph import degree_histogram

    # a: degree 3, b: 2, c/d/e: 1 each
    edges = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "e")]
    und = edges + [(y, x) for x, y in edges]
    ds = rd.from_arrow(pa.table({
        "src": pa.array([e[0] for e in und], pa.string()),
        "dst": pa.array([e[1] for e in und], pa.string()),
    })).repartition(3)
    got = {r["degree"]: r["n_nodes"]
           for r in degree_histogram(ds).take_all()}
    assert got == {3: 1, 2: 1, 1: 3}


def test_export_ntriples_roundtrip(tmp_path):
    import pyarrow as pa
    import ray.data as rd

    from trustfuse_ray.stages.graph import export_ntriples

    t = pa.table({
        "entity": pa.array(["e1", "e2", "e3"], pa.string()),
        "attr": pa.array(["name", "size", "note"], pa.string()),
        "value_str": pa.array(['va"l', None, "line\nbreak"], pa.string()),
        "value_num": pa.array([None, 2.5, None], pa.float64()),
    })
    n = export_ntriples(rd.from_arrow(t).repartition(2), str(tmp_path))
    assert n >= 1
    body = "\n".join(p.read_text()
                     for p in sorted(tmp_path.glob("*.nt")))
    assert '<kg:e1> <kg:name> "va\\"l" .' in body
    assert '<kg:e2> <kg:size> "2.5"^^' \
           '<http://www.w3.org/2001/XMLSchema#double> .' in body
    assert '"line\\nbreak"' in body


def test_length_bucket_batches_assignment():
    import ray.data as rd

    from trustfuse_ray.stages.curation import length_bucket_batches

    docs = rd.from_items(
        [{"doc_id": i, "text": "w"} for i in range(1, 6)]  # 1 word each
        + [{"doc_id": 10, "text": "a b c d e f g"}]        # 7 words
    ).repartition(3)
    out = {r["doc_id"]: (r["n_words"], r["bucket"], r["batch_idx"])
           for r in length_bucket_batches(docs, batch_size=2).take_all()}
    # bit_length(1+1)=2 for the five 1-word docs; ranks by doc_id
    assert out[1] == (1, 2, 0) and out[2] == (1, 2, 0)
    assert out[3] == (1, 2, 1) and out[4] == (1, 2, 1)
    assert out[5] == (1, 2, 2)
    assert out[10] == (7, 4, 0)  # bit_length(7+1) = 4


def test_span_corruption_deterministic_mask():
    import ray.data as rd

    from trustfuse_ray.stages.curation import span_corruption
    from trustfuse_ray.stages.dedup import _md5_token64

    toks = ["t0", "t1", "t2", "t3", "t4", "t5"]
    docs = rd.from_items([{"doc_id": 7, "text": " ".join(toks)},
                          {"doc_id": 8, "text": "a b c"}]).repartition(2)
    out = {r["doc_id"]: r for r in span_corruption(docs,
                                                   span_len=3).take_all()}
    assert 8 not in out  # 3 tokens < span_len + 1: dropped
    start = _md5_token64("7") % (6 - 3 + 1)
    r = out[7]
    assert r["start"] == start
    assert r["input_text"] == " ".join(
        toks[:start] + ["<extra_id_0>"] + toks[start + 3:])
    assert r["target_text"] == " ".join(["<extra_id_0>"]
                                        + toks[start:start + 3])


def test_token_budget_sample_cuts_at_budget():
    import ray.data as rd

    from trustfuse_ray.stages.curation import token_budget_sample

    docs = rd.from_items([{"doc_id": i, "text": "w " * 10}
                          for i in range(10)]).repartition(3)
    out = token_budget_sample(docs, budget_tokens=35).take_all()
    # 10 tokens per doc -> exactly 3 docs fit a 35-token budget
    assert len(out) == 3
    assert sorted(r["cum"] for r in out) == [10, 20, 30]
    assert all(r["n_tokens"] == 10 for r in out)
