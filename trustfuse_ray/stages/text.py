"""Text-analysis operators over document tables (large-scale training-data
pipeline components): fingerprinting, quality stats, language ID, token
counting.  All vectorized per Arrow batch; no per-row Python except where a
hash library call is inherently scalar (md5 per doc — C-speed)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS = re.compile(r"\s+")

# tiny per-language stopword marker sets (n-gram-free heuristic langid)
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it"},
    "fr": {"le", "la", "les", "et", "de", "est", "que", "une"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "zu"},
    "es": {"el", "la", "los", "y", "de", "es", "que", "una"},
}


def canonical_text(arr: pa.Array) -> pa.Array:
    return pc.utf8_lower(pc.utf8_trim_whitespace(arr))


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      id_col: str = "doc_id") -> pa.Table:
    """(doc_id, fp): md5 of lower(trim(text)) — exact-dedup key."""
    canon = canonical_text(batch[text_col]).to_pylist()
    fps = [hashlib.md5((t or "").encode()).hexdigest() for t in canon]
    return pa.table({id_col: batch[id_col],
                     "fp": pa.array(fps, pa.string())})


def quality_batch(batch: pa.Table, text_col: str = "text",
                  id_col: str = "doc_id") -> pa.Table:
    """Quality stats per doc: char count, whitespace token count, 'the'
    occurrence count (stopword-density proxy).  Definitions chosen to be
    exactly reproducible in ANSI SQL (driver oracle)."""
    text = batch[text_col]
    n_chars = pc.utf8_length(text)
    tokens = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
    n_tokens = pc.list_value_length(tokens)
    low = pc.utf8_lower(text)
    removed = pc.replace_substring(low, "the", "")
    the_count = pc.divide(
        pc.subtract(pc.utf8_length(low), pc.utf8_length(removed)), 3)
    return pa.table({
        id_col: batch[id_col],
        "n_chars": pc.cast(n_chars, pa.int64()),
        "n_tokens": pc.cast(n_tokens, pa.int64()),
        "the_count": pc.cast(the_count, pa.int64()),
    })


class LangIdScorer:
    """Actor-pool language ID: marker-set membership scoring.

    Marker tables are built once per actor (``__init__``); scoring is a
    token-set intersection per doc."""

    def __init__(self, markers: dict[str, set[str]] | None = None):
        self.markers = {k: frozenset(v)
                        for k, v in (markers or _LANG_MARKERS).items()}
        self.langs = sorted(self.markers)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = canonical_text(batch["text"]).to_pylist()
        preds, scores = [], []
        for t in texts:
            toks = set(_WS.split(t)) if t else set()
            best_lang, best = "und", 0
            for lang in self.langs:  # sorted → deterministic tie-break
                hit = len(toks & self.markers[lang])
                if hit > best:
                    best, best_lang = hit, lang
            preds.append(best_lang)
            scores.append(best)
        return pa.table({"doc_id": batch["doc_id"],
                         "lang_pred": pa.array(preds, pa.string()),
                         "marker_hits": pa.array(scores, pa.int64())})


def token_count_bpeish(batch: pa.Table, text_col: str = "text",
                       id_col: str = "doc_id") -> pa.Table:
    """BPE-ish token estimate: GPT-2-style pre-tokenizer regex pieces."""
    rx = re.compile(r"\w+|[^\w\s]")
    texts = batch[text_col].to_pylist()
    n = [len(rx.findall(t or "")) for t in texts]
    return pa.table({id_col: batch[id_col],
                     "n_bpeish_tokens": pa.array(n, pa.int64())})


ROLLING_MOD = (1 << 31) - 1  # products stay < 2^39 → vectorizable in
ROLLING_BASE = 257           # uint64 AND SQL BIGINT (driver oracle)


def rolling_fingerprint(text: str, window: int = 16,
                        mod: int = ROLLING_MOD,
                        base: int = ROLLING_BASE) -> int:
    """Rolling (Rabin-Karp) document fingerprint: min polynomial hash over
    byte windows — stable under local edits outside the min window.
    Fully vectorized: window hash = Σ_j b[i+j]·base^(w−1−j) mod p over a
    numpy sliding-window view (no per-byte Python loop)."""
    data = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n == 0:
        return 0
    if n <= window:
        p = np.array([pow(base, n - 1 - j, mod) for j in range(n)],
                     dtype=np.uint64)
        return int((data * p).sum() % mod)
    p = np.array([pow(base, window - 1 - j, mod) for j in range(window)],
                 dtype=np.uint64)
    wins = np.lib.stride_tricks.sliding_window_view(data, window)
    hs = (wins * p[None, :]).sum(axis=1) % mod
    return int(hs.min())


def rolling_fp_batch(batch: pa.Table) -> pa.Table:
    texts = canonical_text(batch["text"]).to_pylist()
    return pa.table({
        "doc_id": batch["doc_id"],
        "rolling_fp": pa.array([rolling_fingerprint(t or "") for t in texts],
                               pa.int64()),
    })


def doc_fingerprints(docs, **kw):
    return docs.map_batches(fingerprint_batch, batch_format="pyarrow",
                            zero_copy_batch=True, **kw)


def quality_stats(docs, **kw):
    return docs.map_batches(quality_batch, batch_format="pyarrow",
                            zero_copy_batch=True, **kw)


def lang_id(docs, concurrency=(1, 4), **kw):
    return docs.map_batches(LangIdScorer, batch_format="pyarrow",
                            zero_copy_batch=True, concurrency=concurrency,
                            **kw)


class QualityClassifier:
    """Actor-pool document scorer — the batched-model-inference pattern:
    the "model" (a linear head over the quality features) is loaded once
    per actor in ``__init__``; ``__call__`` scores a whole Arrow batch with
    one integer matmul.  Weights are fixed-point integers so the score is
    exact (and exactly replayable in the driver's SQL oracle); a real
    classifier head drops in by replacing ``self.w``/``self.b``."""

    #: fixed-point weights over (n_tokens, n_chars, the_count)
    WEIGHTS = (3, -1, 50)
    BIAS = 100

    def __init__(self, weights: tuple[int, ...] | None = None,
                 bias: int | None = None):
        self.w = np.array(weights or self.WEIGHTS, dtype=np.int64)
        self.b = int(self.BIAS if bias is None else bias)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = quality_batch(batch)
        x = np.stack([np.asarray(feats["n_tokens"], dtype=np.int64),
                      np.asarray(feats["n_chars"], dtype=np.int64),
                      np.asarray(feats["the_count"], dtype=np.int64)],
                     axis=1)
        score = x @ self.w + self.b
        return pa.table({
            "doc_id": feats["doc_id"],
            "score_fp": pa.array(score, pa.int64()),
            "keep": pa.array(score > 0),
        })


def quality_classify(docs, **kw):
    """Score every doc with the actor-pool classifier (one actor per
    ``concurrency`` slot; weights live in actor state, never per batch)."""
    kw.setdefault("concurrency", (1, 4))
    kw.setdefault("batch_size", 1024)
    return docs.map_batches(QualityClassifier, batch_format="pyarrow",
                            zero_copy_batch=True, **kw)


class LangConsistencyScorer(LangIdScorer):
    """Actor-pool label-audit stage: runs the marker-set language ID and
    reduces the batch to per-source (n_docs, n_agree) partials against
    the corpus's ``lang`` label column — the labeled-metadata audit a
    crawl pipeline runs before trusting upstream labels."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        preds = LangIdScorer.__call__(
            self, batch)["lang_pred"].to_pylist()
        labels = batch["lang"].to_pylist()
        srcs = batch["source"].to_pylist()
        agg: dict[str, list] = {}
        for s, p, l in zip(srcs, preds, labels):
            st = agg.setdefault(s or "", [0, 0])
            st[0] += 1
            st[1] += int(p == l)
        ks = sorted(agg)
        return pa.table({
            "source": pa.array(ks, pa.string()),
            "n_docs": pa.array([agg[k][0] for k in ks], pa.int64()),
            "n_agree": pa.array([agg[k][1] for k in ks], pa.int64())})


def lang_consistency(docs, concurrency=(1, 4)):
    """Per-source agreement between the labeled ``lang`` column and the
    marker-set prediction.  One actor-pool pass emitting per-source
    partials; a tiny groupby finishes."""
    part = docs.select_columns(["doc_id", "source", "lang",
                                "text"]).map_batches(
        LangConsistencyScorer, batch_format="pyarrow",
        zero_copy_batch=True, concurrency=concurrency)
    return (part.groupby("source").sum(["n_docs", "n_agree"])
            .rename_columns({"sum(n_docs)": "n_docs",
                             "sum(n_agree)": "n_agree"}))


def per_source_median_gate(docs, n_parts: int = 16):
    """Per-source relative quality gate: keep a doc iff its integer
    quality score is ≥ its OWN source's discrete lower-median score —
    the "filter each provider against its own distribution" rule that
    stops a high-volume low-quality source from drowning the corpus gate.

    Shape: one scoring pass (integer linear head, exact); per-block
    (source, score) count partials bound the exchange by per-block score
    diversity; per-source lower median (rank floor((n−1)/2) of the
    ascending scores) derives inside a source co-partition from the
    histogram — never from re-sorted raw rows; the threshold table is
    #sources rows, collected once and applied in a second streaming
    pass.  Returns (doc_id, source, score_fp, keep)."""
    from trustfuse_ray.stages.common import hash_group_apply

    clf = QualityClassifier()

    def _score(batch: pa.Table) -> pa.Table:
        out = clf(batch)
        return pa.table({"doc_id": out["doc_id"],
                         "source": batch["source"],
                         "score_fp": out["score_fp"]})

    scored = docs.map_batches(_score, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _hist(batch: pa.Table) -> pa.Table:
        t = batch.select(["source", "score_fp"])
        return (t.group_by(["source", "score_fp"])
                .aggregate([("score_fp", "count")])
                .rename_columns(["source", "score_fp", "n"]))

    hist = (scored.map_batches(_hist, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby(["source", "score_fp"]).sum("n")
            .rename_columns({"sum(n)": "n"}))

    def _median(group: pa.Table) -> pa.Table:
        scores = np.asarray(group["score_fp"], dtype=np.int64)
        counts = np.asarray(group["n"], dtype=np.int64)
        order = np.argsort(scores)
        scores, counts = scores[order], counts[order]
        rank = (counts.sum() - 1) // 2
        idx = int(np.searchsorted(np.cumsum(counts), rank + 1))
        return pa.table({
            "source": group["source"][:1],
            "med": pa.array([int(scores[idx])], pa.int64())})

    med_rows = hash_group_apply(
        hist, ["source"], _median, n_parts=n_parts,
        plasma_schema=pa.schema([("source", pa.string()),
                                 ("med", pa.int64())])).take_all()
    med = {r["source"]: r["med"] for r in med_rows}

    def _gate(batch: pa.Table) -> pa.Table:
        srcs = batch["source"].to_pylist()
        thr = np.array([med[s] for s in srcs], dtype=np.int64)
        sc = np.asarray(batch["score_fp"], dtype=np.int64)
        return batch.append_column("keep", pa.array(sc >= thr))

    return scored.map_batches(_gate, batch_format="pyarrow",
                              zero_copy_batch=True)


def conv_lang_switches(transcripts, n_parts: int = 32,
                       concurrency=(1, 4)):
    """Conversation-level language-consistency QA: score every turn with
    the marker-set language ID (actor pool — marker tables built once per
    actor) and report per conversation the distinct predicted languages
    and the number of consecutive-turn switches.  Mixed-language
    dialogues are a transcript-corpus defect signal.

    Shape: the actor pool scores turns streaming (text never shuffles);
    only (conv_id, turn_idx, lang) enters the ONE conv_id co-partition."""
    import numpy as np

    from trustfuse_ray.stages.common import hash_group_apply

    class _TurnLang(LangIdScorer):
        def __call__(self, batch: pa.Table) -> pa.Table:
            scored = LangIdScorer.__call__(self, pa.table({
                "doc_id": pa.array(np.arange(len(batch), dtype=np.int64)),
                "text": batch["text"]}))
            return pa.table({"conv_id": batch["conv_id"],
                             "turn_idx": batch["turn_idx"],
                             "lang": scored["lang_pred"]})

    langs = transcripts.select_columns(
        ["conv_id", "turn_idx", "text"]).map_batches(
        _TurnLang, batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)

    def _stats(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group,
                                sort_keys=[("turn_idx", "ascending")])
        ls = group["lang"].take(order).to_pylist()
        switches = sum(1 for a, b in zip(ls, ls[1:]) if a != b)
        return pa.table({
            "conv_id": group["conv_id"][:1],
            "n_turns": pa.array([len(ls)], pa.int64()),
            "n_langs": pa.array([len(set(ls))], pa.int64()),
            "n_switches": pa.array([switches], pa.int64())})

    return hash_group_apply(
        langs, ["conv_id"], _stats, n_parts=n_parts,
        plasma_schema=pa.schema([("conv_id", pa.string()),
                                 ("n_turns", pa.int64()),
                                 ("n_langs", pa.int64()),
                                 ("n_switches", pa.int64())]))


def normalized_dedup(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Unicode-normalized exact dedup: docs collide when they agree after
    whitespace collapse → trim → casefold → NFC normalization — catching
    near-identical pages that differ only in spacing, case, or Unicode
    composition form (the step plain ``lower(trim())`` fingerprinting
    misses).  Returns one row per normalized key:
    ``(norm_fp, keep_id, n)`` with ``keep_id = min(doc_id)``.

    Scale shape: the md5 key is computed per block and pre-aggregated
    map-side (min id + count per key inside the batch), so only
    fingerprint-sized partials shuffle — text never leaves the block."""
    from ray.data.aggregate import Min, Sum

    def _fp(batch: pa.Table) -> pa.Table:
        t = pc.utf8_normalize(pc.utf8_lower(pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.coalesce(batch[text_col].cast(pa.string()), ""),
                r"\s+", " "))), form="NFC")
        fps = [hashlib.md5(s.encode()).hexdigest() for s in t.to_pylist()]
        tbl = pa.table({
            "norm_fp": pa.array(fps, pa.string()),
            "keep_id": batch[id_col].cast(pa.int64()),
        })
        return (pa.TableGroupBy(tbl, "norm_fp", use_threads=False)
                .aggregate([("keep_id", "min"), ([], "count_all")])
                .rename_columns(["norm_fp", "keep_id", "n"]))

    part = docs.select_columns([id_col, text_col]).map_batches(
        _fp, batch_format="pyarrow", zero_copy_batch=True)
    out = part.groupby("norm_fp").aggregate(Min("keep_id"), Sum("n"))
    return out.rename_columns({"min(keep_id)": "keep_id", "sum(n)": "n"})


def dedup_keep_best(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Quality-aware exact dedup: documents group on the
    ``lower(trim(text))`` md5 fingerprint and the KEPT copy is the
    highest-quality one (classifier ``score_fp`` desc, ties → lowest
    doc_id) instead of the blind min-id winner — the selection rule a
    production dedup actually wants when duplicates differ in upstream
    cleanup state.  Returns ``(fp, keep_id, score_fp, n)``.

    Scale shape: one map_batches computes fingerprint + integer quality
    score and pre-reduces map-side to one candidate row per fingerprint
    per block (sorted run heads — no per-row Python), so the fp exchange
    carries candidates + counts, never text; the global winner is a
    per-fp group head."""
    from trustfuse_ray.stages.common import hash_group_apply

    clf = QualityClassifier()

    def _cand(batch: pa.Table) -> pa.Table:
        fp = fingerprint_batch(batch, text_col=text_col,
                               id_col=id_col)["fp"]
        sc = clf(batch)["score_fp"]
        t = pa.table({"fp": fp,
                      "keep_id": batch[id_col].cast(pa.int64()),
                      "score_fp": sc})
        order = pc.sort_indices(t, sort_keys=[
            ("fp", "ascending"), ("score_fp", "descending"),
            ("keep_id", "ascending")])
        s = t.take(order)
        fps = np.asarray(s["fp"].cast(pa.large_string())
                         .combine_chunks().to_numpy(zero_copy_only=False),
                         dtype=object)
        head = np.ones(len(s), dtype=bool)
        head[1:] = fps[1:] != fps[:-1]
        counts = np.diff(np.append(np.flatnonzero(head), len(s)))
        return (s.filter(pa.array(head))
                .append_column("n", pa.array(counts, pa.int64())))

    cand = docs.select_columns([id_col, text_col]).map_batches(
        _cand, batch_format="pyarrow", zero_copy_batch=True)

    def _winner(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[
            ("score_fp", "descending"), ("keep_id", "ascending")])
        top = group.take(idx[:1])
        return pa.table({
            "fp": top["fp"],
            "keep_id": top["keep_id"],
            "score_fp": top["score_fp"],
            "n": pa.array([int(np.asarray(group["n"],
                                          dtype=np.int64).sum())],
                          pa.int64()),
        })

    return hash_group_apply(
        cand, ["fp"], _winner, n_parts=16,
        plasma_schema=pa.schema([("fp", pa.string()),
                                 ("keep_id", pa.int64()),
                                 ("score_fp", pa.int64()),
                                 ("n", pa.int64())]))


def lang_fertility(docs, text_col: str = "text", lang_col: str = "lang"):
    """Tokenizer-fairness audit: per language, total BPE-ish tokens vs
    total whitespace words as exact integers plus their ratio —
    languages whose fertility (tokens per word) runs high pay more
    compute per sentence, the standard multilingual tokenizer check.
    Returns ``(lang, n_docs, n_tokens, n_words, fertility_permille)``
    with the permille an exact integer division.

    Scale shape: both counts are vectorized Arrow kernels inside one
    map_batches emitting per-lang partials; the exchange is the
    lang-cardinality-bounded groupby sum."""
    def _partial(batch: pa.Table) -> pa.Table:
        t = pc.coalesce(batch[text_col].cast(pa.string()), "")
        # count_substring_regex counts non-overlapping matches — the
        # same pieces re.findall returns for this alternation
        ntok = pc.count_substring_regex(
            t, r"\w+|[^\w\s]").cast(pa.int64())
        trimmed = pc.utf8_trim_whitespace(t)
        nw = pc.list_value_length(pc.split_pattern_regex(
            trimmed, r"\s+")).cast(pa.int64()).to_numpy(
            zero_copy_only=False).copy()
        nw[pc.equal(trimmed, "").to_numpy(zero_copy_only=False)] = 0
        tbl = pa.table({
            "lang": batch[lang_col].cast(pa.string()),
            "n_docs": pa.array(np.ones(len(t), np.int64)),
            "n_tokens": ntok,
            "n_words": pa.array(nw, pa.int64()),
        })
        return (pa.TableGroupBy(tbl, "lang", use_threads=False)
                .aggregate([("n_docs", "sum"), ("n_tokens", "sum"),
                            ("n_words", "sum")])
                .rename_columns(["lang", "n_docs", "n_tokens", "n_words"]))

    agg = (docs.select_columns([lang_col, text_col])
           .map_batches(_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("lang").sum(["n_docs", "n_tokens", "n_words"]))

    def _ratio(batch: pa.Table) -> pa.Table:
        nt = np.asarray(batch["sum(n_tokens)"], dtype=np.int64)
        nw = np.asarray(batch["sum(n_words)"], dtype=np.int64)
        return pa.table({
            "lang": batch["lang"],
            "n_docs": batch["sum(n_docs)"],
            "n_tokens": pa.array(nt, pa.int64()),
            "n_words": pa.array(nw, pa.int64()),
            "fertility_permille": pa.array(
                nt * 1000 // np.maximum(nw, 1), pa.int64()),
        })

    return agg.map_batches(_ratio, batch_format="pyarrow",
                           zero_copy_batch=True)


def source_dup_matrix(docs, text_col: str = "text",
                      source_col: str = "source", n_parts: int = 16):
    """Cross-source syndication matrix: for every source pair
    ``(source_a < source_b)``, how many exact-dedup fingerprints have at
    least one copy in BOTH sources — the audit that catches one feed
    republishing another's documents.  Returns
    ``(source_a, source_b, n_shared_fps)``.

    Scale shape: map-side distinct (fp, source) partials per block, one
    fp-keyed exchange of fingerprints+source only (never text), a
    per-fp C(s,2) pair expansion bounded by the source universe, and a
    tiny pair groupby."""
    from trustfuse_ray.stages.common import hash_group_apply

    def _fp_src(batch: pa.Table) -> pa.Table:
        canon = canonical_text(batch[text_col]).to_pylist()
        fps = [hashlib.md5((t or "").encode()).hexdigest() for t in canon]
        tbl = pa.table({"fp": pa.array(fps, pa.string()),
                        "source": batch[source_col].cast(pa.string())})
        return (pa.TableGroupBy(tbl, ["fp", "source"], use_threads=False)
                .aggregate([([], "count_all")])
                .drop_columns(["count_all"]))

    rows = docs.select_columns([source_col, text_col]).map_batches(
        _fp_src, batch_format="pyarrow", zero_copy_batch=True)

    def _pairs(group: pa.Table) -> pa.Table:
        empty = pa.schema([("source_a", pa.string()),
                           ("source_b", pa.string()),
                           ("n_shared_fps", pa.int64())]).empty_table()
        srcs = sorted(set(group["source"].to_pylist()))
        if len(srcs) < 2:
            return empty
        a, b = zip(*[(srcs[i], srcs[j]) for i in range(len(srcs))
                     for j in range(i + 1, len(srcs))])
        return pa.table({
            "source_a": pa.array(list(a), pa.string()),
            "source_b": pa.array(list(b), pa.string()),
            "n_shared_fps": pa.array([1] * len(a), pa.int64()),
        })

    pair_schema = pa.schema([("source_a", pa.string()),
                             ("source_b", pa.string()),
                             ("n_shared_fps", pa.int64())])
    pairs = hash_group_apply(rows, ["fp"], _pairs, n_parts=n_parts,
                             plasma_schema=pair_schema)

    def _sum(group: pa.Table) -> pa.Table:
        return pa.table({
            "source_a": group["source_a"][:1],
            "source_b": group["source_b"][:1],
            "n_shared_fps": pa.array(
                [int(np.asarray(group["n_shared_fps"],
                                dtype=np.int64).sum())], pa.int64()),
        })

    # typed group apply (not Dataset.groupby) so an all-empty pair set
    # still carries the schema through to the driver
    return hash_group_apply(pairs, ["source_a", "source_b"], _sum,
                            n_parts=4, plasma_schema=pair_schema)


#: fixed marker list for the policy-flag audit (swap for a real lexicon)
_POLICY_MARKERS = ("attack", "exploit", "weapon", "fraud")


def policy_flag_rates(docs, markers: tuple = _POLICY_MARKERS,
                      text_col: str = "text", source_col: str = "source"):
    """Safety-filter audit: per source, how many documents contain any
    of a fixed marker-term list (word-boundary, case-insensitive) and
    the flag rate as an exact integer permille — the pre-filter report a
    content-policy pass produces before dropping documents.  A real
    lexicon or classifier drops in by swapping ``markers``.

    Scale shape: ONE vectorized RE2 scan per batch (single alternation,
    compiled by Arrow), per-source map-side partials, and a
    source-bounded groupby."""
    rx = r"(?i)\b(" + "|".join(markers) + r")\b"

    def _partial(batch: pa.Table) -> pa.Table:
        t = pc.coalesce(batch[text_col].cast(pa.string()), "")
        hit = pc.match_substring_regex(t, rx)
        tbl = pa.table({
            "source": batch[source_col].cast(pa.string()),
            "n_docs": pa.array(np.ones(len(t), np.int64)),
            "n_flagged": pa.array(
                hit.to_numpy(zero_copy_only=False).astype(np.int64)),
        })
        return (pa.TableGroupBy(tbl, "source", use_threads=False)
                .aggregate([("n_docs", "sum"), ("n_flagged", "sum")])
                .rename_columns(["source", "n_docs", "n_flagged"]))

    agg = (docs.select_columns([source_col, text_col])
           .map_batches(_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby("source").sum(["n_docs", "n_flagged"]))

    def _rate(batch: pa.Table) -> pa.Table:
        nd = np.asarray(batch["sum(n_docs)"], dtype=np.int64)
        nf = np.asarray(batch["sum(n_flagged)"], dtype=np.int64)
        return pa.table({
            "source": batch["source"],
            "n_docs": pa.array(nd, pa.int64()),
            "n_flagged": pa.array(nf, pa.int64()),
            "flag_permille": pa.array(nf * 1000 // np.maximum(nd, 1),
                                      pa.int64()),
        })

    return agg.map_batches(_rate, batch_format="pyarrow",
                           zero_copy_batch=True)
