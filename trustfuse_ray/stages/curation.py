"""Training-data curation operators: test-set decontamination, repetition
quality signals, exact n-gram Jaccard, deterministic hash sampling, greedy
sequence packing.

These extend the reference's text toolchain (SURVEY.md §2 has no analog —
the reference fuses KG claims, not LLM corpora) with the operations a
100-TB pretraining pipeline runs between dedup and tokenization:

* decontamination — membership of benchmark n-grams inside documents
  (broadcast small side, vectorized substring kernels per batch);
* repetition signals — the Gopher-style duplicate-n-gram fractions used as
  quality filters, computed batch-wide with one dictionary-encode +
  lexsort run-length pass (no per-doc Python);
* n-gram Jaccard — the exact verify kernel for near-dup candidates, here
  over deterministic adjacent-doc pairs so a SQL oracle can replay it;
* hash sampling — reproducible Bernoulli/stratified sampling keyed on a
  content-independent md5 so engine and oracle agree bit-for-bit;
* sequence packing — greedy fixed-capacity packing of docs into training
  sequences, one hash shuffle on the pack key then a per-group
  searchsorted jump loop (O(#sequences), not O(#docs), of Python steps).

Every kernel is per-batch Arrow/numpy; the only driver materialization is
the benchmark gram list (small by construction — it is a *benchmark*).
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from trustfuse_ray.stages.common import hash_group_apply

_SPLIT_RX = r"\s+"


def _tokens_flat(text_col) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index per token, dictionary code per token) for a batch column.

    Uses ``flatten()`` (not raw ``.values``) so sliced list arrays keep
    absolute positions correct, and one ``dictionary_encode`` so all n-gram
    work downstream happens on int32 codes."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(text_col), _SPLIT_RX)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
    flat = toks.flatten()
    codes = pc.dictionary_encode(flat)
    if isinstance(codes, pa.ChunkedArray):
        codes = codes.combine_chunks()
    idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    docix = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
    return docix, idx


def _run_lengths(*cols: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Run-length encode rows of equal tuples: returns (first-row index of
    each run, run length).  Inputs are lexsorted together first."""
    n = len(cols[0])
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    order = np.lexsort(cols[::-1])
    sorted_cols = [c[order] for c in cols]
    new = np.zeros(n, bool)
    new[0] = True
    for c in sorted_cols:
        new[1:] |= c[1:] != c[:-1]
    starts = np.flatnonzero(new)
    lengths = np.diff(np.append(starts, n))
    return order[starts], lengths


# --------------------------------------------------------------------------
# 1. Test-set decontamination
# --------------------------------------------------------------------------

def benchmark_grams(docs, every: int = 97, width: int = 40,
                    min_len: int = 8, text_col: str = "text",
                    id_col: str = "doc_id") -> list[str]:
    """Deterministic benchmark gram set: the first ``width`` characters of
    every ``every``-th document.  Small by construction (a benchmark), so
    collecting it on the driver and broadcasting is the scale-correct
    shape — the corpus side never shuffles."""
    def _grams(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        keep = pa.array(ids % every == 0)
        g = pc.utf8_slice_codeunits(
            batch.filter(keep)[text_col], 0, width)
        return pa.table({"gram": g})

    out = docs.select_columns([id_col, text_col]).map_batches(
        _grams, batch_format="pyarrow", zero_copy_batch=True)
    grams = {g for b in out.iter_batches(batch_format="pyarrow")
             for g in b["gram"].to_pylist()
             if g is not None and len(g) >= min_len}
    return sorted(grams)


def decontaminate(docs, grams: list[str] | None = None,
                  text_col: str = "text", id_col: str = "doc_id", **kw):
    """Flag documents containing any benchmark gram as a substring.

    The gram list is broadcast once inside the map_batches closure; per
    batch the work is one ``pc.match_substring`` kernel per gram (the
    batched Aho-Corasick analog — at real benchmark sizes build the
    combined automaton in an actor ``__init__`` instead)."""
    if grams is None:
        grams = benchmark_grams(docs, text_col=text_col, id_col=id_col)
    gram_list = list(grams)

    def _flag(batch: pa.Table) -> pa.Table:
        n = len(batch)
        hits = np.zeros(n, np.int64)
        text = batch[text_col]
        for g in gram_list:
            m = pc.fill_null(pc.match_substring(text, g), False)
            hits += m.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            id_col: batch[id_col],
            "n_hits": pa.array(hits, pa.int64()),
            "contaminated": pa.array(hits > 0),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        _flag, batch_format="pyarrow", zero_copy_batch=True, **kw)


# --------------------------------------------------------------------------
# 2. Repetition quality signals (Gopher-style duplicate n-gram fractions)
# --------------------------------------------------------------------------

def repetition_batch(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Per doc: total bigram count, the count of the most frequent bigram,
    and the number of trigram positions whose trigram occurs more than
    once.  One dictionary encode + two lexsort run-length passes for the
    whole batch — no per-document Python."""
    n = len(batch)
    docix, code = _tokens_flat(batch[text_col])

    n_tokens = np.bincount(docix, minlength=n).astype(np.int64)
    n_bigrams = np.maximum(n_tokens - 1, 0)

    top_bigram_n = np.zeros(n, np.int64)
    dup_trigram_n = np.zeros(n, np.int64)

    if len(code) >= 2:
        same = docix[:-1] == docix[1:]
        d = docix[:-1][same]
        starts, counts = _run_lengths(d, code[:-1][same], code[1:][same])
        if len(starts):
            np.maximum.at(top_bigram_n, d[starts], counts)
    if len(code) >= 3:
        same3 = (docix[:-2] == docix[1:-1]) & (docix[1:-1] == docix[2:])
        d3 = docix[:-2][same3]
        starts, counts = _run_lengths(
            d3, code[:-2][same3], code[1:-1][same3], code[2:][same3])
        dup = counts > 1
        if dup.any():
            np.add.at(dup_trigram_n, d3[starts[dup]], counts[dup])

    n_trigrams = np.maximum(n_tokens - 2, 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        top_frac = np.where(n_bigrams > 0, top_bigram_n / n_bigrams, 0.0)
        dup_frac = np.where(n_trigrams > 0, dup_trigram_n / n_trigrams, 0.0)
    return pa.table({
        id_col: batch[id_col],
        "n_bigrams": pa.array(n_bigrams, pa.int64()),
        "top_bigram_n": pa.array(top_bigram_n, pa.int64()),
        "dup_trigram_n": pa.array(dup_trigram_n, pa.int64()),
        "top_bigram_frac": pa.array(top_frac, pa.float64()),
        "dup_trigram_frac": pa.array(dup_frac, pa.float64()),
    })


def repetition_signals(docs, **kw):
    return docs.map_batches(repetition_batch, batch_format="pyarrow",
                            zero_copy_batch=True, **kw)


# --------------------------------------------------------------------------
# 3. Exact n-gram Jaccard over deterministic adjacent-doc pairs
# --------------------------------------------------------------------------

def _trigram_keys(docix: np.ndarray, code: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """(doc index, packed int64 trigram key) for every trigram position.
    Packing needs K^3 < 2^62; guarded — groups never approach 2^20 distinct
    tokens (fall back to spark-free string joins if one ever does)."""
    if len(code) < 3:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    k = int(code.max()) + 1 if len(code) else 1
    if k >= (1 << 20):
        raise ValueError("group vocabulary too large for packed trigrams")
    same = (docix[:-2] == docix[1:-1]) & (docix[1:-1] == docix[2:])
    key = (code[:-2][same] * k + code[1:-1][same]) * k + code[2:][same]
    return docix[:-2][same], key


def _jaccard_group(group: pa.Table, *, text_col: str,
                   id_col: str) -> pa.Table:
    order = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
    group = group.take(order)
    n = len(group)
    source = group["source"][0].as_py()
    ids = np.asarray(group[id_col], dtype=np.int64)
    docix, code = _tokens_flat(group[text_col])
    d3, key = _trigram_keys(docix, code)

    # distinct trigram key arrays per doc (sorted → intersect1d-ready)
    order3 = np.lexsort((key, d3))
    d3s, keys = d3[order3], key[order3]
    bounds = np.searchsorted(d3s, np.arange(n + 1))
    per_doc: list[np.ndarray] = [
        np.unique(keys[bounds[i]:bounds[i + 1]]) for i in range(n)]

    doc_lo, doc_hi, n_lo, n_hi, inter, uni, jac = [], [], [], [], [], [], []
    for i in range(n - 1):
        a, b = per_doc[i], per_doc[i + 1]
        it = len(np.intersect1d(a, b, assume_unique=True))
        un = len(a) + len(b) - it
        doc_lo.append(ids[i]); doc_hi.append(ids[i + 1])
        n_lo.append(len(a)); n_hi.append(len(b))
        inter.append(it); uni.append(un)
        jac.append(it / un if un else 1.0)
    return pa.table({
        "source": pa.array([source] * max(n - 1, 0), pa.string()),
        "doc_lo": pa.array(doc_lo, pa.int64()),
        "doc_hi": pa.array(doc_hi, pa.int64()),
        "n_lo": pa.array(n_lo, pa.int64()),
        "n_hi": pa.array(n_hi, pa.int64()),
        "inter": pa.array(inter, pa.int64()),
        "uni": pa.array(uni, pa.int64()),
        "jaccard": pa.array(jac, pa.float64()),
    })


def ngram_jaccard_adjacent(docs, group_col: str = "source",
                           text_col: str = "text", id_col: str = "doc_id",
                           n_parts: int = 32):
    """Exact word-trigram Jaccard for every adjacent doc-id pair within a
    group — the deterministic-pairing form of the near-dup verify kernel,
    so a SQL oracle can replay it end to end.  One hash shuffle on the
    group key; per-group work is one dictionary-encode + per-pair sorted
    intersections."""
    out_schema = pa.schema([
        ("source", pa.string()), ("doc_lo", pa.int64()),
        ("doc_hi", pa.int64()), ("n_lo", pa.int64()),
        ("n_hi", pa.int64()), ("inter", pa.int64()),
        ("uni", pa.int64()), ("jaccard", pa.float64())])
    return hash_group_apply(
        docs.select_columns([id_col, group_col, text_col]), [group_col],
        functools.partial(_jaccard_group, text_col=text_col, id_col=id_col),
        n_parts=n_parts, plasma_schema=out_schema)


# --------------------------------------------------------------------------
# 4. Deterministic hash sampling
# --------------------------------------------------------------------------

def hash_sample(docs, rate_hex: str = "1a", id_col: str = "doc_id",
                keep_cols: tuple[str, ...] = ("lang", "source"), **kw):
    """Reproducible Bernoulli sample: keep rows whose md5(str(id)) hex is
    lexicographically below ``rate_hex`` ("1a" → 26/256 ≈ 10.2%).  The key
    is the id, not the content, so re-runs and retries select identical
    rows on any partitioning; stratification is automatic (the hash is
    independent of every stratum column)."""
    def _keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.string()).to_pylist()
        fps = [hashlib.md5((s or "").encode()).hexdigest() for s in ids]
        mask = pa.array([f < rate_hex for f in fps])
        out = batch.select([id_col, *keep_cols]).append_column(
            "fp", pa.array(fps, pa.string()))
        return out.filter(mask)

    return docs.select_columns([id_col, *keep_cols]).map_batches(
        _keep, batch_format="pyarrow", zero_copy_batch=True, **kw)


# --------------------------------------------------------------------------
# 4b. Incremental dedup against an existing corpus
# --------------------------------------------------------------------------

def dedup_incremental(new_docs, old_docs, n_bits: int = 1 << 20, k: int = 4,
                      id_col: str = "doc_id", n_parts: int = 32):
    """New-batch exact dedup against an already-ingested corpus: emit
    (doc_id, fp, dup_of) for every new doc whose fingerprint exists in the
    old corpus (dup_of = min old doc id).

    Scale shape: a fixed-size Bloom filter over the old fingerprints
    (`stages/bloom.py`, OR-merged partials) prunes the new side to
    suspects BEFORE the verify shuffle — at realistic dup rates almost no
    new row moves.  The Bloom hit set is a superset (false positives, no
    false negatives); the exact fp-hash join then removes FPs, so the
    output is exact.  In production the old fp index lives pre-partitioned
    by fp-hash, making the verify a co-partitioned map-side join; here it
    is one hash_group_apply exchange."""
    from trustfuse_ray.stages.bloom import BloomFilter, build_bloom
    from trustfuse_ray.stages.text import doc_fingerprints

    old_fp = doc_fingerprints(old_docs)
    new_fp = doc_fingerprints(new_docs)
    bf = build_bloom(old_fp, "fp", n_bits=n_bits, k=k)
    bits, nb, kk = bf.bits, bf.n_bits, bf.k

    def _suspect(batch: pa.Table) -> pa.Table:
        f = BloomFilter(nb, kk, bits=bits)
        col = batch["fp"]
        hit = f.contains(col.combine_chunks()
                         if isinstance(col, pa.ChunkedArray) else col)
        return batch.filter(pa.array(hit))

    def _side(v: int):
        def _tag(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "side", pa.array(np.full(len(batch), v, np.int8)))
        return _tag

    suspects = new_fp.map_batches(_suspect, batch_format="pyarrow",
                                  zero_copy_batch=True)
    both = old_fp.map_batches(_side(0), batch_format="pyarrow").union(
        suspects.map_batches(_side(1), batch_format="pyarrow"))

    def _emit(group: pa.Table) -> pa.Table:
        sides = np.asarray(group["side"], dtype=np.int8)
        ids = np.asarray(group[id_col], dtype=np.int64)
        old_ids, new_ids = ids[sides == 0], np.sort(ids[sides == 1])
        if not len(old_ids) or not len(new_ids):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "fp": pa.array([], pa.string()),
                             "dup_of": pa.array([], pa.int64())})
        return pa.table({
            id_col: pa.array(new_ids, pa.int64()),
            "fp": pa.array([group["fp"][0].as_py()] * len(new_ids),
                           pa.string()),
            "dup_of": pa.array(np.full(len(new_ids), old_ids.min()),
                               pa.int64()),
        })

    return hash_group_apply(
        both, ["fp"], _emit, n_parts=n_parts,
        plasma_schema=pa.schema([(id_col, pa.int64()),
                                 ("fp", pa.string()),
                                 ("dup_of", pa.int64())]))


# --------------------------------------------------------------------------
# 5. Greedy sequence packing
# --------------------------------------------------------------------------

def _pack_group(group: pa.Table, *, cap: int, id_col: str,
                count_col: str, group_col: str = "source") -> pa.Table:
    order = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
    group = group.take(order)
    n = len(group)
    counts = np.asarray(group[count_col], dtype=np.int64)
    cum = np.cumsum(counts)
    seq_id = np.zeros(n, np.int64)
    seq_pos = np.zeros(n, np.int64)
    start, sid = 0, 0
    while start < n:
        base = cum[start - 1] if start else 0
        # largest j with cum[j] - base <= cap; the first doc always joins
        end = int(np.searchsorted(cum, base + cap, side="right"))
        end = max(end, start + 1)
        seq_id[start:end] = sid
        seq_pos[start:end] = np.arange(end - start)
        sid += 1
        start = end
    return pa.table({
        group_col: group[group_col],
        id_col: group[id_col],
        "n_tokens": pa.array(counts, pa.int64()),
        "seq_id": pa.array(seq_id, pa.int64()),
        "seq_pos": pa.array(seq_pos, pa.int64()),
    })


def pack_counted(counted, cap: int = 512, group_col: str = "source",
                 id_col: str = "doc_id", count_col: str = "n_tokens",
                 n_parts: int = 32):
    """Pack rows that already carry a token count — the shuffle moves only
    (id, group, count), never text.  Routed through the plasma task
    exchange (the partition id is precomputed; no sort needed)."""
    out_schema = pa.schema([(group_col, pa.string()),
                            (id_col, pa.int64()),
                            ("n_tokens", pa.int64()),
                            ("seq_id", pa.int64()),
                            ("seq_pos", pa.int64())])
    return hash_group_apply(
        counted, [group_col],
        functools.partial(_pack_group, cap=cap, id_col=id_col,
                          count_col=count_col, group_col=group_col),
        n_parts=n_parts, plasma_schema=out_schema)


def token_pack(docs, cap: int = 512, group_col: str = "source",
               text_col: str = "text", id_col: str = "doc_id",
               n_parts: int = 32):
    """Greedy fixed-capacity sequence packing: within each group, docs in
    id order are appended to the current sequence until the next doc would
    exceed ``cap`` whitespace tokens (an oversized doc still gets a fresh
    sequence to itself).  Sequential by definition, but the per-group scan
    is a vectorized searchsorted jump — Python steps are O(#sequences).
    Partitioning assumption: the pack key (``group_col``) is the unit of
    sequence locality; packs never cross groups."""
    def _count(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch[text_col]), _SPLIT_RX)
        return pa.table({
            id_col: batch[id_col],
            group_col: batch[group_col],
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
        })

    counted = docs.select_columns([id_col, group_col, text_col]).map_batches(
        _count, batch_format="pyarrow", zero_copy_batch=True)
    return pack_counted(counted, cap=cap, group_col=group_col,
                        id_col=id_col, n_parts=n_parts)
