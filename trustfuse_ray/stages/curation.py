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


def dup_trigram_counts(docix: np.ndarray, code: np.ndarray,
                       n_docs: int) -> np.ndarray:
    """Per-doc count of trigram POSITIONS whose trigram occurs more than
    once in the doc (the Gopher duplicate-trigram signal) — THE shared
    kernel for repetition_batch and the curation pipeline's filter."""
    out = np.zeros(n_docs, np.int64)
    if len(code) >= 3:
        same3 = (docix[:-2] == docix[1:-1]) & (docix[1:-1] == docix[2:])
        d3 = docix[:-2][same3]
        starts, counts = _run_lengths(
            d3, code[:-2][same3], code[1:-1][same3], code[2:][same3])
        dup = counts > 1
        if dup.any():
            np.add.at(out, d3[starts[dup]], counts[dup])
    return out


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

    if len(code) >= 2:
        same = docix[:-1] == docix[1:]
        d = docix[:-1][same]
        starts, counts = _run_lengths(d, code[:-1][same], code[1:][same])
        if len(starts):
            np.maximum.at(top_bigram_n, d[starts], counts)
    dup_trigram_n = dup_trigram_counts(docix, code, n)

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


def weighted_hash_sample(docs, weight_col: str = "n_chars",
                         weight_cap: int = 2000, id_col: str = "doc_id",
                         keep_cols: tuple[str, ...] = ("source",), **kw):
    """Deterministic WEIGHTED Bernoulli sample: keep a row with probability
    ``min(weight, cap) / cap``, decided by an exact integer comparison —
    ``(md5_64(str(id)) >> 32) · cap < min(weight, cap) << 32`` — so engine
    and SQL agree bit-for-bit and re-runs/retries/partitionings select
    identical rows (importance sampling keyed on content-independent
    ids)."""
    from trustfuse_ray.stages.dedup import _md5_token64

    def _keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.string()).to_pylist()
        h = np.fromiter((_md5_token64(s or "") for s in ids),
                        dtype=np.uint64, count=len(ids))
        w = np.minimum(np.asarray(batch[weight_col], dtype=np.int64),
                       weight_cap)
        keep = ((h >> np.uint64(32)).astype(np.int64) * weight_cap
                < (w << 32))
        out = batch.select([id_col, weight_col, *keep_cols])
        return out.filter(pa.array(keep))

    return docs.select_columns(
        [id_col, weight_col, *keep_cols]).map_batches(
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
# 4c. Line-level dedup (RefinedWeb-style global first occurrence per line)
# --------------------------------------------------------------------------

# packed (doc_id, line_idx) membership key: doc_id < 2^43, line_idx < 2^20
_LINE_BITS = 20


def _split_lines_cols(text_col, ids: np.ndarray
                      ) -> tuple[np.ndarray, np.ndarray, pa.Array]:
    """(id per line, line_idx per line, flat line array) for a batch —
    exact '\\n' split, offset-safe flatten, vectorized per-doc indexing."""
    lines = pc.split_pattern(pc.fill_null(text_col, ""), "\n")
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    lens = pc.list_value_length(lines).to_numpy(
        zero_copy_only=False).astype(np.int64)
    if lens.max(initial=0) >= (1 << _LINE_BITS):
        raise ValueError("document exceeds 2^20 lines")
    flat = lines.flatten()
    docrep = np.repeat(ids, lens)
    starts = np.cumsum(lens) - lens
    lidx = (np.arange(int(lens.sum()), dtype=np.int64)
            - np.repeat(starts, lens))
    return docrep, lidx, flat


def line_dedup(docs, text_col: str = "text", id_col: str = "doc_id",
               n_parts: int | None = None):
    """Corpus-wide line-level dedup: every line survives only at its first
    global occurrence (min ``(doc_id, line_idx)``); docs are rebuilt from
    their kept lines (docs with zero kept lines are dropped).  Output:
    ``(doc_id, text, n_lines, n_kept)``.

    Scale shape: stage 1 shuffles only ``(md5(line), doc_id, line_idx)``
    (~50 B/row — text never rides the line-hash exchange); the winner set
    ships back co-partitioned by ``hash(doc_id)``, so the full text moves
    exactly once (the reconstruct exchange).  At 100 TB the reconstruct
    exchange disappears entirely if docs are read pre-partitioned by
    doc-id hash: the winner rows are then a map-side join."""
    from trustfuse_ray.stages.common import _add_part, plasma_exchange

    if n_parts is None:
        # exchange fixed cost is pieces = blocks × parts; CPU-proportional
        # parts (the minhash sizing) keeps both waves one task per core
        import ray
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        n_parts = 1 << max(3, (n_cpus - 1).bit_length())

    def _meta(batch: pa.Table) -> pa.Table:
        # the full 128-bit md5 travels as TWO int64 columns (exact — no
        # 64-bit truncation collisions at 10^10+ lines), 16 B/row instead
        # of a 32-char hex string, and the winner pass lexsorts ints
        ids = np.asarray(batch[id_col], dtype=np.int64)
        docrep, lidx, flat = _split_lines_cols(batch[text_col], ids)
        digs = [hashlib.md5((s if s is not None else "").encode()).digest()
                for s in flat.to_pylist()]
        n = len(digs)
        raw = np.frombuffer(b"".join(digs), dtype=np.uint64).reshape(n, 2) \
            if n else np.zeros((0, 2), np.uint64)
        return pa.table({
            "fp_hi": pa.array(raw[:, 0].view(np.int64), pa.int64()),
            "fp_lo": pa.array(raw[:, 1].view(np.int64), pa.int64()),
            id_col: pa.array(docrep, pa.int64()),
            "line_idx": pa.array(lidx, pa.int64()),
        })

    meta_schema = pa.schema([("fp_hi", pa.int64()), ("fp_lo", pa.int64()),
                             (id_col, pa.int64()), ("line_idx", pa.int64()),
                             ("__part", pa.int32())])
    win_schema = pa.schema([(id_col, pa.int64()), ("line_idx", pa.int64())])

    def _winners(tbl: pa.Table) -> pa.Table:
        # first global occurrence per fp: lexsort by (fp, doc, idx), take
        # each run's head — one vectorized pass over the whole partition
        if len(tbl) == 0:
            return win_schema.empty_table()
        hi = np.asarray(tbl["fp_hi"], dtype=np.int64)
        lo = np.asarray(tbl["fp_lo"], dtype=np.int64)
        d = np.asarray(tbl[id_col], dtype=np.int64)
        li = np.asarray(tbl["line_idx"], dtype=np.int64)
        order = np.lexsort((li, d, lo, hi))
        his, los = hi[order], lo[order]
        head = np.ones(len(his), dtype=bool)
        head[1:] = (his[1:] != his[:-1]) | (los[1:] != los[:-1])
        sel = order[np.flatnonzero(head)]
        return pa.table({id_col: pa.array(d[sel], pa.int64()),
                         "line_idx": pa.array(li[sel], pa.int64())})

    meta = docs.select_columns([id_col, text_col]).map_batches(
        _meta, batch_format="pyarrow", zero_copy_batch=True)
    keyed = meta.map_batches(
        functools.partial(_add_part, keys=["fp_hi", "fp_lo"],
                          n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True)
    winners = plasma_exchange([keyed], _winners, n_parts,
                              part_col="__part", empty_schema=meta_schema)

    # unify winner rows and doc rows into one schema so the reconstruct
    # exchange co-partitions them by hash(doc_id)
    def _tag_doc(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "line_idx": pa.array(np.full(n, -1, np.int64)),
            text_col: pc.fill_null(batch[text_col], ""),
            "side": pa.array(np.zeros(n, np.int8)),
        })

    def _tag_win(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            id_col: batch[id_col],
            "line_idx": batch["line_idx"],
            text_col: pa.array([None] * n, pa.string()),
            "side": pa.array(np.ones(n, np.int8)),
        })

    uni_schema = pa.schema([(id_col, pa.int64()), ("line_idx", pa.int64()),
                            (text_col, pa.string()), ("side", pa.int8()),
                            ("__part", pa.int32())])
    out_schema = pa.schema([(id_col, pa.int64()), (text_col, pa.string()),
                            ("n_lines", pa.int64()),
                            ("n_kept", pa.int64())])

    def _reconstruct(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return out_schema.empty_table()
        side = np.asarray(tbl["side"], dtype=np.int8)
        docs_t = tbl.filter(pa.array(side == 0))
        win_t = tbl.filter(pa.array(side == 1))
        if len(docs_t) == 0:
            return out_schema.empty_table()
        ids = np.asarray(docs_t[id_col], dtype=np.int64)
        if ids.max(initial=0) >= (1 << (63 - _LINE_BITS)):
            raise ValueError("doc_id exceeds packed-key range")
        pos, lidx, flat = _split_lines_cols(
            docs_t[text_col], np.arange(len(docs_t), dtype=np.int64))
        packed = (ids[pos] << _LINE_BITS) | lidx
        wd = np.asarray(win_t[id_col], dtype=np.int64)
        wl = np.asarray(win_t["line_idx"], dtype=np.int64)
        wpacked = np.sort((wd << _LINE_BITS) | wl)
        loc = np.searchsorted(wpacked, packed)
        keep = np.zeros(len(packed), dtype=bool)
        ok = loc < len(wpacked)
        keep[ok] = wpacked[loc[ok]] == packed[ok]
        n_lines = np.bincount(pos, minlength=len(docs_t))
        n_kept = np.bincount(pos[keep], minlength=len(docs_t))
        offsets = np.concatenate(([0], np.cumsum(n_kept))).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     flat.filter(pa.array(keep))), "\n")
        out = pa.table({
            id_col: pa.array(ids, pa.int64()),
            text_col: joined,
            "n_lines": pa.array(n_lines, pa.int64()),
            "n_kept": pa.array(n_kept, pa.int64()),
        })
        return out.filter(pa.array(n_kept > 0))

    uni = docs.select_columns([id_col, text_col]).map_batches(
        _tag_doc, batch_format="pyarrow", zero_copy_batch=True).union(
        winners.map_batches(_tag_win, batch_format="pyarrow"))
    keyed2 = uni.map_batches(
        functools.partial(_add_part, keys=[id_col], n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True)
    return plasma_exchange([keyed2], _reconstruct, n_parts,
                           part_col="__part", empty_schema=uni_schema)


# --------------------------------------------------------------------------
# 4d. PII redaction
# --------------------------------------------------------------------------

# RE2 patterns (Arrow and DuckDB both run RE2, so the oracle replays these
# verbatim); applied in order — counts are of matches in the progressively
# redacted string
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d -]{7,}\d", "<PHONE>"),
)


def redact_pii(docs, text_col: str = "text", id_col: str = "doc_id",
               patterns: tuple[tuple[str, str], ...] = PII_PATTERNS, **kw):
    """Replace email / IPv4 / phone-shaped substrings with typed
    placeholders; emit ``(doc_id, text, n_redactions, has_pii)``.  Pure
    Arrow RE2 kernels per batch — no shuffle, no state."""
    def _redact(batch: pa.Table) -> pa.Table:
        red = pc.fill_null(batch[text_col], "")
        n = np.zeros(len(batch), np.int64)
        for pat, rep in patterns:
            n += pc.count_substring_regex(red, pattern=pat).to_numpy(
                zero_copy_only=False).astype(np.int64)
            red = pc.replace_substring_regex(red, pattern=pat,
                                             replacement=rep)
        return pa.table({
            id_col: batch[id_col],
            text_col: red,
            "n_redactions": pa.array(n, pa.int64()),
            "has_pii": pa.array(n > 0),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        _redact, batch_format="pyarrow", zero_copy_batch=True, **kw)


# --------------------------------------------------------------------------
# 4e. Deterministic training-shard assignment
# --------------------------------------------------------------------------

def assign_shards(docs, n_shards: int = 16, id_col: str = "doc_id",
                  n_parts: int = 32):
    """Deterministic global shuffle for training: shard =
    ``md5_64(str(id)) % n_shards``, pos = rank within the shard by
    ``(md5_hex(str(id)), id)``.  Identical output on any partitioning or
    retry (keys are content-independent); the only exchange moves
    ``(id, fp)`` rows — at scale each shard group is one output file."""
    from trustfuse_ray.stages.dedup import _md5_token64

    def _key(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.string()).to_pylist()
        fps = [hashlib.md5((s or "").encode()).hexdigest() for s in ids]
        h = np.fromiter((_md5_token64(s or "") for s in ids),
                        dtype=np.uint64, count=len(ids))
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "fp": pa.array(fps, pa.string()),
            "shard": pa.array((h % n_shards).astype(np.int64), pa.int64()),
        })

    def _rank(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("fp", "ascending"),
                                                  (id_col, "ascending")])
        group = group.take(order)
        return group.append_column(
            "pos", pa.array(np.arange(len(group), dtype=np.int64)))

    keyed = docs.select_columns([id_col]).map_batches(
        _key, batch_format="pyarrow", zero_copy_batch=True)
    out_schema = pa.schema([(id_col, pa.int64()), ("fp", pa.string()),
                            ("shard", pa.int64()), ("pos", pa.int64())])
    return hash_group_apply(keyed, ["shard"], _rank, n_parts=n_parts,
                            plasma_schema=out_schema)


def md5_rank_sorted(group: pa.Table, id_col: str) -> pa.Table:
    """Sort rows by ``(md5_hex(str(id)), id)`` — THE deterministic ranking
    rule shared by :func:`stratified_split`, the pretrain train cut and
    shard ranking (one definition, so the engine's split/cut/rank and
    their SQL oracles can never drift apart)."""
    ids = group[id_col].cast(pa.string()).to_pylist()
    fps = [hashlib.md5((s or "").encode()).hexdigest() for s in ids]
    g = group.append_column("__fp", pa.array(fps, pa.string()))
    order = pc.sort_indices(g, sort_keys=[("__fp", "ascending"),
                                          (id_col, "ascending")])
    return g.take(order).drop_columns(["__fp"])


def stratified_split(docs, group_col: str = "source",
                     id_col: str = "doc_id",
                     fracs: tuple[float, ...] = (0.8, 0.1, 0.1),
                     names: tuple[str, ...] = ("train", "val", "test"),
                     n_parts: int = 32):
    """Deterministic stratified train/val/test split: within each stratum
    (``group_col``) rank docs by ``(md5_hex(str(id)), id)`` and cut at
    ``floor(cumfrac · n)``.  Every stratum lands within one doc of its
    target fractions, and the assignment is partition/retry invariant
    (keys are content-independent).  The exchange moves (id, group) rows
    only — never text (the rank key is recomputed in-group from the id,
    via the shared :func:`md5_rank_sorted` rule)."""
    if abs(sum(fracs) - 1.0) > 1e-9 or len(fracs) != len(names):
        raise ValueError("fracs must sum to 1 and match names")
    cum = [float(f) for f in np.cumsum(fracs)[:-1]]

    def _key(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch[id_col].cast(pa.int64()),
                         group_col: batch[group_col]})

    def _cut(group: pa.Table) -> pa.Table:
        group = md5_rank_sorted(group, id_col)
        n = len(group)
        # floor(frac * n) in float64 — bit-identical to SQL floor(frac*cnt)
        bounds = np.floor(np.array(cum, dtype=np.float64) * n).astype(
            np.int64)
        lab = np.searchsorted(bounds, np.arange(n, dtype=np.int64),
                              side="right")
        split = pa.array(np.asarray(names, dtype=object)[lab], pa.string())
        return pa.table({id_col: group[id_col],
                         group_col: group[group_col],
                         "split": split})

    keyed = docs.select_columns([id_col, group_col]).map_batches(
        _key, batch_format="pyarrow", zero_copy_batch=True)
    out_schema = pa.schema([(id_col, pa.int64()), (group_col, pa.string()),
                            ("split", pa.string())])
    return hash_group_apply(keyed, [group_col], _cut, n_parts=n_parts,
                            plasma_schema=out_schema)


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
            pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], "")),
            _SPLIT_RX)
        return pa.table({
            id_col: batch[id_col],
            group_col: batch[group_col],
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
        })

    counted = docs.select_columns([id_col, group_col, text_col]).map_batches(
        _count, batch_format="pyarrow", zero_copy_batch=True)
    return pack_counted(counted, cap=cap, group_col=group_col,
                        id_col=id_col, n_parts=n_parts)


# --------------------------------------------------------------------------
# 6b. Fixed-size token windows (training-sequence chunking)
# --------------------------------------------------------------------------

def token_chunks(docs, window: int = 64, text_col: str = "text",
                 id_col: str = "doc_id", **kw):
    """Chunk each doc's whitespace tokens into fixed-size training windows
    (stride = window): ``(doc_id, win_idx, n_tokens, win_text)``.  The
    complement of :func:`token_pack` (packing joins short docs; chunking
    splits long ones).  Pure per-batch Arrow/numpy — window boundaries are
    one vectorized mask over the flat token stream, the window texts one
    ``binary_join`` over a rebuilt list array; no shuffle."""
    def _chunk(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], "")),
            _SPLIT_RX)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        total = int(lens.sum())
        docix = np.repeat(np.arange(len(batch), dtype=np.int64), lens)
        starts = np.cumsum(lens) - lens
        tok_idx = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        head = np.zeros(total, dtype=bool)
        if total:
            head[0] = True
            head[1:] = (docix[1:] != docix[:-1]) | (tok_idx[1:] % window == 0)
        bounds = np.flatnonzero(head)
        offsets = np.concatenate((bounds, [total])).astype(np.int32)
        win_text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat),
            " ")
        ids = batch[id_col].take(pa.array(docix[bounds]))
        return pa.table({
            id_col: ids,
            "win_idx": pa.array(tok_idx[bounds] // window, pa.int64()),
            "n_tokens": pa.array(np.diff(offsets).astype(np.int64),
                                 pa.int64()),
            "win_text": win_text,
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        _chunk, batch_format="pyarrow", zero_copy_batch=True, **kw)


def token_chunks_overlap(docs, window: int = 64, stride: int = 48,
                         text_col: str = "text", id_col: str = "doc_id",
                         **kw):
    """Overlapping (strided) token windows — the RAG-chunking variant of
    :func:`token_chunks`: windows start every ``stride`` tokens, each
    ``window`` tokens long (last one truncated), so consecutive windows
    share ``window − stride`` tokens of context.  Fully vectorized: the
    per-window token runs are one flat ``take`` with computed indices;
    no shuffle."""
    if stride <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")

    def _chunk(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], "")),
            _SPLIT_RX)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        n = len(batch)
        starts = np.cumsum(lens) - lens
        # windows per doc: 1 + ceil(max(len - window, 0) / stride)
        m = 1 + (np.maximum(lens - window, 0) + stride - 1) // stride
        R = int(m.sum())
        dwin = np.repeat(np.arange(n, dtype=np.int64), m)
        wof = np.arange(R, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
        wstart = wof * stride
        wlen = np.minimum(window, lens[dwin] - wstart)
        total = int(wlen.sum())
        base = starts[dwin] + wstart
        idx = (np.repeat(base, wlen)
               + np.arange(total, dtype=np.int64)
               - np.repeat(np.cumsum(wlen) - wlen, wlen))
        offsets = np.concatenate(([0], np.cumsum(wlen))).astype(np.int32)
        win_text = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     flat.take(pa.array(idx))), " ")
        return pa.table({
            id_col: batch[id_col].take(pa.array(dwin)),
            "win_idx": pa.array(wof, pa.int64()),
            "n_tokens": pa.array(wlen, pa.int64()),
            "win_text": win_text,
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        _chunk, batch_format="pyarrow", zero_copy_batch=True, **kw)


# --------------------------------------------------------------------------
# 4h. cross-document repeated-substring spans (Lee et al. 2021 style)
# --------------------------------------------------------------------------


def _gram_rows(batch: pa.Table, *, k: int, text_col: str,
               id_col: str) -> pa.Table:
    """One row per full k-token window of every doc in the batch:
    ``(fp_hi, fp_lo, doc_id, start)`` where fp is the md5 of the
    space-joined window (matches the oracle's
    ``array_to_string(list_slice(toks, s+1, s+k), ' ')``)."""
    ids = np.asarray(batch[id_col], dtype=np.int64)
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], "")),
        _SPLIT_RX)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    starts = np.cumsum(lens) - lens
    w = np.maximum(lens - k + 1, 0)          # full k-windows only
    R = int(w.sum())
    dwin = np.repeat(np.arange(len(batch), dtype=np.int64), w)
    wstart = (np.arange(R, dtype=np.int64)
              - np.repeat(np.cumsum(w) - w, w))
    idx = (np.repeat(starts[dwin] + wstart, k)
           + np.tile(np.arange(k, dtype=np.int64), R))
    offsets = np.arange(0, (R + 1) * k, k, dtype=np.int32)
    gram_text = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                 flat.take(pa.array(idx))), " ")
    digs = [hashlib.md5(s.encode()).digest()
            for s in gram_text.to_pylist()]
    raw = (np.frombuffer(b"".join(digs), dtype=np.uint64).reshape(R, 2)
           if R else np.zeros((0, 2), np.uint64))
    return pa.table({
        "fp_hi": pa.array(raw[:, 0].view(np.int64), pa.int64()),
        "fp_lo": pa.array(raw[:, 1].view(np.int64), pa.int64()),
        id_col: pa.array(ids[dwin], pa.int64()),
        "start": pa.array(wstart, pa.int64()),
    })


def dup_spans(docs, k: int = 8, min_docs: int = 2, text_col: str = "text",
              id_col: str = "doc_id", n_parts: int | None = None):
    """Substring-level cross-document dedup: find, for every document, the
    merged token spans covered by ``k``-grams that occur in at least
    ``min_docs`` DISTINCT documents (the spans a Lee-et-al-2021-style
    "deduplicate repeated substrings" pass would cut).  Output rows:
    ``(doc_id, span_start, span_end, n_tokens)`` with token-index spans
    ``[span_start, span_end)`` merged over overlapping/adjacent windows.

    Scale shape: two metadata-only exchanges — stage 1 ships
    ``(md5(gram) as 2×int64, doc_id, start)`` ≈ 40 B per token position
    (the text never rides an exchange); the duplicated-gram test happens
    INSIDE the fp-partition (count distinct docs per fp run — no join back),
    and the surviving positions re-partition by ``hash(doc_id)`` for the
    per-doc interval merge.  A boilerplate gram shared by millions of docs
    produces O(occurrences) rows, never O(pairs²) — this is the property
    that makes substring dedup tractable where pairwise near-dup is not.
    """
    from trustfuse_ray.stages.common import _add_part, plasma_exchange

    if n_parts is None:
        import ray
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        n_parts = 1 << max(3, (n_cpus - 1).bit_length())

    _grams = functools.partial(_gram_rows, k=k, text_col=text_col,
                               id_col=id_col)

    gram_schema = pa.schema([("fp_hi", pa.int64()), ("fp_lo", pa.int64()),
                             (id_col, pa.int64()), ("start", pa.int64()),
                             ("__part", pa.int32())])
    hit_schema = pa.schema([(id_col, pa.int64()), ("start", pa.int64())])

    def _dup_hits(tbl: pa.Table) -> pa.Table:
        """Positions whose gram occurs in >= min_docs distinct docs —
        resolved entirely inside the fp partition, no join back."""
        if len(tbl) == 0:
            return hit_schema.empty_table()
        hi = np.asarray(tbl["fp_hi"], dtype=np.int64)
        lo = np.asarray(tbl["fp_lo"], dtype=np.int64)
        d = np.asarray(tbl[id_col], dtype=np.int64)
        s = np.asarray(tbl["start"], dtype=np.int64)
        order = np.lexsort((s, d, lo, hi))
        his, los, ds = hi[order], lo[order], d[order]
        new_fp = np.ones(len(his), dtype=bool)
        new_fp[1:] = (his[1:] != his[:-1]) | (los[1:] != los[:-1])
        new_doc = new_fp.copy()
        new_doc[1:] |= ds[1:] != ds[:-1]
        run_starts = np.flatnonzero(new_fp)
        ndoc = np.add.reduceat(new_doc.astype(np.int64), run_starts)
        run_len = np.diff(np.append(run_starts, len(his)))
        keep = np.repeat(ndoc >= min_docs, run_len)
        sel = order[keep]
        return pa.table({id_col: pa.array(d[sel], pa.int64()),
                         "start": pa.array(s[sel], pa.int64())})

    out_schema = pa.schema([(id_col, pa.int64()),
                            ("span_start", pa.int64()),
                            ("span_end", pa.int64()),
                            ("n_tokens", pa.int64())])

    def _merge(tbl: pa.Table) -> pa.Table:
        """Per-doc gaps-and-islands merge of [start, start+k) windows."""
        if len(tbl) == 0:
            return out_schema.empty_table()
        d = np.asarray(tbl[id_col], dtype=np.int64)
        s = np.asarray(tbl["start"], dtype=np.int64)
        order = np.lexsort((s, d))
        d, s = d[order], s[order]
        brk = np.ones(len(d), dtype=bool)
        brk[1:] = (d[1:] != d[:-1]) | (s[1:] > s[:-1] + k)
        heads = np.flatnonzero(brk)
        tails = np.append(heads[1:], len(d)) - 1
        span_start = s[heads]
        span_end = s[tails] + k
        return pa.table({
            id_col: pa.array(d[heads], pa.int64()),
            "span_start": pa.array(span_start, pa.int64()),
            "span_end": pa.array(span_end, pa.int64()),
            "n_tokens": pa.array(span_end - span_start, pa.int64()),
        })

    grams = docs.select_columns([id_col, text_col]).map_batches(
        _grams, batch_format="pyarrow", zero_copy_batch=True)
    keyed = grams.map_batches(
        functools.partial(_add_part, keys=["fp_hi", "fp_lo"],
                          n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True)
    hits = plasma_exchange([keyed], _dup_hits, n_parts,
                           part_col="__part", empty_schema=gram_schema)
    keyed2 = hits.map_batches(
        functools.partial(_add_part, keys=[id_col], n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True)
    hit_part_schema = pa.schema([(id_col, pa.int64()), ("start", pa.int64()),
                                 ("__part", pa.int32())])
    return plasma_exchange([keyed2], _merge, n_parts,
                           part_col="__part", empty_schema=hit_part_schema)


def substring_dedup(docs, k: int = 8, min_docs: int = 2,
                    text_col: str = "text", id_col: str = "doc_id",
                    n_parts: int | None = None):
    """Cut cross-document repeated substrings, keeping each duplicated
    ``k``-gram only at its GLOBAL first occurrence (min ``(doc_id, start)``
    per gram — the Lee et al. 2021 "keep one copy" policy).  A token is
    removed iff some duplicated-gram loser window covers it and no winner
    window of the same doc covers it; docs are rebuilt from their kept
    tokens (space-joined), docs left with zero tokens are dropped.
    Output: ``(doc_id, text, n_tokens, n_cut)``.

    Scale shape mirrors :func:`line_dedup`: the gram exchange ships 40 B
    per token position, winner/loser resolution happens inside the fp
    partition, and the full text moves exactly once — on the reconstruct
    exchange co-partitioned by ``hash(doc_id)``.
    """
    from trustfuse_ray.stages.common import _add_part, plasma_exchange

    if n_parts is None:
        import ray
        n_cpus = int(ray.cluster_resources().get("CPU", 8))
        n_parts = 1 << max(3, (n_cpus - 1).bit_length())

    _grams = functools.partial(_gram_rows, k=k, text_col=text_col,
                               id_col=id_col)

    gram_schema = pa.schema([("fp_hi", pa.int64()), ("fp_lo", pa.int64()),
                             (id_col, pa.int64()), ("start", pa.int64()),
                             ("__part", pa.int32())])
    hit_schema = pa.schema([(id_col, pa.int64()), ("start", pa.int64()),
                            ("win", pa.int8())])

    def _win_lose(tbl: pa.Table) -> pa.Table:
        """All windows of grams with >= min_docs distinct docs, flagged
        winner (global first occurrence) or loser — one partition pass."""
        if len(tbl) == 0:
            return hit_schema.empty_table()
        hi = np.asarray(tbl["fp_hi"], dtype=np.int64)
        lo = np.asarray(tbl["fp_lo"], dtype=np.int64)
        d = np.asarray(tbl[id_col], dtype=np.int64)
        s = np.asarray(tbl["start"], dtype=np.int64)
        order = np.lexsort((s, d, lo, hi))
        his, los, ds = hi[order], lo[order], d[order]
        new_fp = np.ones(len(his), dtype=bool)
        new_fp[1:] = (his[1:] != his[:-1]) | (los[1:] != los[:-1])
        new_doc = new_fp.copy()
        new_doc[1:] |= ds[1:] != ds[:-1]
        run_starts = np.flatnonzero(new_fp)
        ndoc = np.add.reduceat(new_doc.astype(np.int64), run_starts)
        run_len = np.diff(np.append(run_starts, len(his)))
        keep = np.repeat(ndoc >= min_docs, run_len)
        win = new_fp & keep                     # sorted ⇒ run head is the
        sel = order[keep]                       # global (doc, start) min
        return pa.table({
            id_col: pa.array(d[sel], pa.int64()),
            "start": pa.array(s[sel], pa.int64()),
            "win": pa.array(win[keep].astype(np.int8), pa.int8()),
        })

    out_schema = pa.schema([(id_col, pa.int64()), (text_col, pa.string()),
                            ("n_tokens", pa.int64()),
                            ("n_cut", pa.int64())])
    uni_schema = pa.schema([(id_col, pa.int64()), ("start", pa.int64()),
                            ("win", pa.int8()), (text_col, pa.string()),
                            ("side", pa.int8()), ("__part", pa.int32())])

    def _tag_doc(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            "start": pa.array(np.full(n, -1, np.int64)),
            "win": pa.array(np.zeros(n, np.int8)),
            text_col: pc.fill_null(batch[text_col], ""),
            "side": pa.array(np.zeros(n, np.int8)),
        })

    def _tag_hit(batch: pa.Table) -> pa.Table:
        n = len(batch)
        return pa.table({
            id_col: batch[id_col],
            "start": batch["start"],
            "win": batch["win"],
            text_col: pa.array([None] * n, pa.string()),
            "side": pa.array(np.ones(n, np.int8)),
        })

    def _reconstruct(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return out_schema.empty_table()
        side = np.asarray(tbl["side"], dtype=np.int8)
        docs_t = tbl.filter(pa.array(side == 0))
        hits_t = tbl.filter(pa.array(side == 1))
        if len(docs_t) == 0:
            return out_schema.empty_table()
        ids = np.asarray(docs_t[id_col], dtype=np.int64)
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(docs_t[text_col]), _SPLIT_RX)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        starts = np.cumsum(lens) - lens
        total = int(lens.sum())
        hd = np.asarray(hits_t[id_col], dtype=np.int64)
        hs = np.asarray(hits_t["start"], dtype=np.int64)
        hw = np.asarray(hits_t["win"], dtype=np.int8)
        # map hit doc_ids to local row index (ids are unique per doc here)
        order = np.argsort(ids, kind="stable")
        pos_in = np.searchsorted(ids[order], hd)
        ok = (pos_in < len(ids))
        ok &= ids[order[np.minimum(pos_in, len(ids) - 1)]] == hd
        rows = order[pos_in[ok]]
        habs = starts[rows] + hs[ok]
        hwin = hw[ok].astype(bool)
        # diff-array window coverage: +1 at window start, -1 past its end
        lose_cov = np.zeros(total + 1, dtype=np.int32)
        win_cov = np.zeros(total + 1, dtype=np.int32)
        np.add.at(lose_cov, habs[~hwin], 1)
        np.add.at(lose_cov, habs[~hwin] + k, -1)
        np.add.at(win_cov, habs[hwin], 1)
        np.add.at(win_cov, habs[hwin] + k, -1)
        cut = (np.cumsum(lose_cov[:-1]) > 0) & (np.cumsum(win_cov[:-1]) == 0)
        keep = ~cut
        rowix = np.repeat(np.arange(len(docs_t), dtype=np.int64), lens)
        n_kept = np.bincount(rowix[keep], minlength=len(docs_t))
        n_cut = lens - n_kept
        offsets = np.concatenate(([0], np.cumsum(n_kept))).astype(np.int32)
        joined = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offsets, pa.int32()),
                                     flat.filter(pa.array(keep))), " ")
        out = pa.table({
            id_col: pa.array(ids, pa.int64()),
            text_col: joined,
            "n_tokens": pa.array(lens, pa.int64()),
            "n_cut": pa.array(n_cut, pa.int64()),
        })
        return out.filter(pa.array(n_kept > 0))

    grams = docs.select_columns([id_col, text_col]).map_batches(
        _grams, batch_format="pyarrow", zero_copy_batch=True)
    keyed = grams.map_batches(
        functools.partial(_add_part, keys=["fp_hi", "fp_lo"],
                          n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True)
    hits = plasma_exchange([keyed], _win_lose, n_parts,
                           part_col="__part", empty_schema=gram_schema)
    uni = docs.select_columns([id_col, text_col]).map_batches(
        _tag_doc, batch_format="pyarrow", zero_copy_batch=True).union(
        hits.map_batches(_tag_hit, batch_format="pyarrow"))
    keyed2 = uni.map_batches(
        functools.partial(_add_part, keys=[id_col], n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True)
    return plasma_exchange([keyed2], _reconstruct, n_parts,
                           part_col="__part", empty_schema=uni_schema)


# --------------------------------------------------------------------------
# Deterministic source-mixture training schedule (data mixing)
# --------------------------------------------------------------------------

def mixture_order(docs, weights: dict[str, int],
                  default_weight: int = 1, id_col: str = "doc_id",
                  source_col: str = "source", n_parts: int = 32):
    """Weighted interleave of sources into ONE training order: doc r
    (0-based md5 rank) of source s gets priority ``(r + 1) / w_s`` and the
    schedule is ascending ``(priority, source)`` — weighted round-robin /
    Smith's-rule scheduling, so every prefix of the schedule carries the
    sources in ≈ ``w`` proportions (the data-mixing step of pretraining
    set construction).

    Shape: per-source md5 rank via one hash exchange (ids only — text
    stays at rest), then ONE range-partitioned sort over the keep-list
    plus metadata-only ordinal assignment (`windows.global_row_number`).
    Priorities are IEEE doubles of small ints — DuckDB computes the
    identical division, so the full schedule replays in SQL.

    Returns (id, source, pos)."""
    import functools

    from trustfuse_ray.stages.windows import global_row_number

    def _rank_group(group: pa.Table) -> pa.Table:
        g = md5_rank_sorted(group, id_col)
        src = g[source_col][0].as_py()
        w = float(weights.get(src, default_weight))
        rn = np.arange(len(g), dtype=np.int64)
        return pa.table({
            id_col: g[id_col],
            source_col: g[source_col],
            "__prio": pa.array((rn + 1.0) / w, pa.float64())})

    ranked = hash_group_apply(
        docs.select_columns([id_col, source_col]), [source_col],
        _rank_group, n_parts=n_parts,
        plasma_schema=pa.schema([(id_col, pa.int64()),
                                 (source_col, pa.string()),
                                 ("__prio", pa.float64())]))
    return global_row_number(
        ranked, ["__prio", source_col]).drop_columns(["__prio"])


def length_bucket_batches(docs, batch_size: int = 32,
                          text_col: str = "text", id_col: str = "doc_id"):
    """Padding-efficient training batches: docs bucket by length scale
    (bucket = bit_length(n_words + 1), so each bucket spans one power of
    two) and within a bucket take deterministic doc_id order; batch_idx
    is the 0-based ``rank // batch_size`` — sequences of similar length
    land in the same batch, the padding-waste killer for packed training.

    Shape: one streaming length pass (ids + counts only — text never
    moves), ONE range-partitioned sort over (bucket, doc_id) with
    metadata-only global ordinals (`windows.global_row_number` — no
    per-bucket group task, so a hot bucket holding most of the corpus
    still spreads over the whole cluster), then per-bucket rank = global
    ordinal − bucket's min ordinal, where the min-ordinal table is one
    tiny groupby (≤ ~64 rows) broadcast by closure.

    Returns (doc_id, n_words, bucket, batch_idx)."""
    import re

    from trustfuse_ray.stages.windows import global_row_number

    def _len(batch: pa.Table) -> pa.Table:
        ns = [len([w for w in re.split(r"\s+", (t or "").strip()) if w])
              for t in batch[text_col].to_pylist()]
        n_arr = np.array(ns, dtype=np.int64)
        buckets = np.array([int(n + 1).bit_length() for n in ns],
                           dtype=np.int64)
        return pa.table({id_col: batch[id_col],
                         "n_words": pa.array(n_arr, pa.int64()),
                         "bucket": pa.array(buckets, pa.int64())})

    lens = docs.select_columns([id_col, text_col]).map_batches(
        _len, batch_format="pyarrow", zero_copy_batch=True)
    pos = global_row_number(lens, ["bucket", id_col], pos_col="__pos")
    base_rows = (pos.groupby("bucket").min("__pos")
                 .rename_columns({"min(__pos)": "base"}).take_all())
    base_rows.sort(key=lambda r: r["bucket"])
    bkeys = np.array([r["bucket"] for r in base_rows], dtype=np.int64)
    bvals = np.array([r["base"] for r in base_rows], dtype=np.int64)

    def _batchidx(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch["bucket"], dtype=np.int64)
        p = np.asarray(batch["__pos"], dtype=np.int64)
        off = bvals[np.searchsorted(bkeys, b)]
        return pa.table({
            id_col: batch[id_col],
            "n_words": batch["n_words"],
            "bucket": batch["bucket"],
            "batch_idx": pa.array((p - off) // batch_size, pa.int64())})

    return pos.map_batches(_batchidx, batch_format="pyarrow",
                           zero_copy_batch=True)


def span_corruption(docs, span_len: int = 3, text_col: str = "text",
                    id_col: str = "doc_id"):
    """T5-style span-corruption example builder (one span per doc):
    mask a run of ``span_len`` whitespace tokens at a DETERMINISTIC
    position — ``md5_64(doc_id) % (n_tokens − span_len + 1)`` — emitting
    (input with a sentinel, target = sentinel + the masked tokens).
    Docs shorter than ``span_len + 1`` tokens are dropped (nothing left
    to condition on).  No RNG: the same corpus always yields the same
    pretraining examples, and the oracle replays the build exactly.

    Shape: one streaming pass, no exchange; the md5 kernel is the
    SQL-compatible `_md5_token64`."""
    import re

    from trustfuse_ray.stages.dedup import _md5_token64

    sent = "<extra_id_0>"

    def _mask(batch: pa.Table) -> pa.Table:
        ids, inp, tgt, st = [], [], [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            toks = [w for w in re.split(r"\s+", (t or "").strip()) if w]
            n = len(toks)
            if n < span_len + 1:
                continue
            start = _md5_token64(str(did)) % (n - span_len + 1)
            ids.append(did)
            st.append(start)
            inp.append(" ".join(toks[:start] + [sent]
                                + toks[start + span_len:]))
            tgt.append(" ".join([sent] + toks[start:start + span_len]))
        return pa.table({
            id_col: pa.array(ids, batch[id_col].type),
            "start": pa.array(st, pa.int64()),
            "input_text": pa.array(inp, pa.string()),
            "target_text": pa.array(tgt, pa.string())})

    return docs.select_columns([id_col, text_col]).map_batches(
        _mask, batch_format="pyarrow", zero_copy_batch=True)


def token_budget_sample(docs, budget_tokens: int, text_col: str = "text",
                        id_col: str = "doc_id"):
    """Epoch budgeting: keep documents in md5 order (unbiased, stable)
    until a global whitespace-token budget is reached — the "fill a
    1B-token epoch" cut.  A doc is kept iff the cumulative token count
    UP TO AND INCLUDING it stays ≤ ``budget_tokens``; later docs drop.

    Shape: ONE range-partitioned sort on the md5 key (the unavoidable
    total order), then the cumulative sum derives without further
    movement — per-block token totals are O(#blocks) driver scalars,
    the exclusive prefix offsets broadcast back, and each block keeps
    its qualifying prefix in place.  Returns (doc_id, n_tokens, cum)."""
    import re

    import ray

    from trustfuse_ray.stages.dedup import _md5_token64
    from trustfuse_ray.stages.windows import global_row_number

    def _tok(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        ns = [len([w for w in re.split(r"\s+", (t or "").strip()) if w])
              for t in batch[text_col].to_pylist()]
        keys = [_md5_token64(str(i)) & 0x7FFFFFFFFFFFFFFF
                for i in ids]
        return pa.table({id_col: batch[id_col],
                         "n_tokens": pa.array(ns, pa.int64()),
                         "__k": pa.array(keys, pa.int64())})

    toks = docs.select_columns([id_col, text_col]).map_batches(
        _tok, batch_format="pyarrow", zero_copy_batch=True)
    ordered = global_row_number(toks, ["__k", id_col],
                                pos_col="__pos").materialize()

    # per-block token totals + first ordinal -> exclusive prefix offsets
    import ray.data.block as _blk

    @ray.remote
    def _block_stats(t) -> tuple:
        t = _blk.BlockAccessor.for_block(t).to_arrow()
        if t.num_rows == 0:
            return (None, 0)
        return (int(np.asarray(t["__pos"], dtype=np.int64).min()),
                int(np.asarray(t["n_tokens"], dtype=np.int64).sum()))

    refs = ordered.to_arrow_refs()
    stats = ray.get([_block_stats.remote(r) for r in refs])
    stats = sorted((s for s in stats if s[0] is not None))
    offsets = {}
    run = 0
    for pos0, tot in stats:
        offsets[pos0] = run
        run += tot

    def _cut(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table({id_col: batch[id_col],
                             "n_tokens": batch["n_tokens"],
                             "cum": pa.array([], pa.int64())})
        pos = np.asarray(batch["__pos"], dtype=np.int64)
        order = np.argsort(pos)
        n = np.asarray(batch["n_tokens"], dtype=np.int64)[order]
        cum = offsets[int(pos[order][0])] + np.cumsum(n)
        keep = cum <= budget_tokens
        sel = pa.array(order[keep])
        return pa.table({
            id_col: batch[id_col].take(sel),
            "n_tokens": batch["n_tokens"].take(sel),
            "cum": pa.array(cum[keep], pa.int64())})

    return ordered.map_batches(_cut, batch_format="pyarrow",
                               zero_copy_batch=True)


def curriculum_schedule(docs, n_phases: int = 4, text_col: str = "text",
                        id_col: str = "doc_id"):
    """Length-curriculum schedule: docs ordered easy→hard by whitespace
    token count, split into ``n_phases`` NTILE phases (SQL NTILE
    semantics: the first ``n % n_phases`` phases get one extra row), with
    a 0-based position within each phase.  Orders match
    ``ORDER BY n_tok, doc_id`` exactly, so a training loader replaying
    phases in order sees a deterministic curriculum.

    Scale shape: one range-partitioned sort (``global_row_number`` — the
    unavoidable all-to-all of any total order), then phase and in-phase
    position derive per block from the global ordinal with pure integer
    arithmetic against the broadcast row count; nothing else moves."""
    from trustfuse_ray.stages.windows import global_row_number

    def _ntok(batch: pa.Table) -> pa.Table:
        t = pc.utf8_trim_whitespace(
            pc.coalesce(batch[text_col].cast(pa.string()), ""))
        toks = pc.split_pattern_regex(t, _SPLIT_RX)
        # split of "" yields [""] — subtract the empty token
        n = pc.list_value_length(toks).cast(pa.int64()).to_numpy(
            zero_copy_only=False).copy()
        n[pc.equal(t, "").to_numpy(zero_copy_only=False)] = 0
        return pa.table({id_col: batch[id_col],
                         "n_tok": pa.array(n, pa.int64())})

    counted = docs.map_batches(_ntok, batch_format="pyarrow",
                               zero_copy_batch=True)
    ordered = global_row_number(counted, ["n_tok", id_col])
    total = counted.count()
    q, r = divmod(total, n_phases)

    def _phase(batch: pa.Table) -> pa.Table:
        pos = np.asarray(batch["pos"], dtype=np.int64)
        big = r * (q + 1)
        in_big = pos < big
        phase = np.where(in_big, pos // max(q + 1, 1) + 1,
                         r + (pos - big) // max(q, 1) + 1)
        ppos = np.where(in_big, pos % max(q + 1, 1), (pos - big) % max(q, 1))
        return pa.table({
            id_col: batch[id_col],
            "n_tok": batch["n_tok"],
            "phase": pa.array(phase, pa.int64()),
            "phase_pos": pa.array(ppos, pa.int64()),
        })

    return ordered.map_batches(_phase, batch_format="pyarrow",
                               zero_copy_batch=True)


def doc_continuations(docs, k: int = 8, cap: int = 64,
                      text_col: str = "text", id_col: str = "doc_id",
                      n_parts: int = 32):
    """Document-stitching candidates: pairs ``(doc_a, doc_b, gram)``
    where doc_a's LAST ``k`` whitespace tokens equal doc_b's FIRST ``k``
    — the boundary join a corpus-reconstruction pass runs to reassemble
    chunked documents.  Grams shared by more than ``cap`` docs on either
    side are dropped (the boilerplate stop rule: a template footer/header
    is not a continuation signal).  Docs with fewer than ``k`` tokens
    are skipped.

    Scale shape: both boundary grams come from vectorized Arrow kernels
    (the last-gram via the reverse-split-reverse trick — no per-row
    Python); the ONE exchange is keyed by the gram and carries
    ``(gram, doc_id, side)`` rows only; the per-gram group emits the
    side-capped cross product."""
    import pyarrow.compute as pc_

    from trustfuse_ray.stages.common import hash_group_apply

    def _grams(batch: pa.Table) -> pa.Table:
        t = pc_.utf8_trim_whitespace(
            pc_.coalesce(batch[text_col].cast(pa.string()), ""))
        toks = pc_.split_pattern_regex(t, _SPLIT_RX)
        nt = pc_.list_value_length(toks).to_numpy(zero_copy_only=False)
        ok = (nt >= k) & (pc_.not_equal(t, "")
                          .to_numpy(zero_copy_only=False))
        keep = pa.array(np.flatnonzero(ok))
        toks_k = toks.take(keep) if isinstance(toks, pa.Array) else \
            toks.combine_chunks().take(keep)
        ids = batch[id_col].cast(pa.int64()).take(keep)
        first = pc_.binary_join(pc_.list_slice(toks_k, 0, k), " ")
        # last k tokens, original order: reverse the string, take the
        # FIRST k reversed tokens, join, reverse back
        rev = pc_.utf8_reverse(t).take(keep)
        rtoks = pc_.split_pattern_regex(rev, _SPLIT_RX)
        last = pc_.utf8_reverse(
            pc_.binary_join(pc_.list_slice(rtoks, 0, k), " "))
        n = len(ids)
        return pa.table({
            "gram": pa.concat_arrays([
                last.combine_chunks() if isinstance(
                    last, pa.ChunkedArray) else last,
                first.combine_chunks() if isinstance(
                    first, pa.ChunkedArray) else first]),
            "doc_id": pa.concat_arrays([ids.combine_chunks()
                                        if isinstance(ids, pa.ChunkedArray)
                                        else ids] * 2),
            "side": pa.array(np.concatenate([
                np.zeros(n, np.int8), np.ones(n, np.int8)])),
        })

    rows = docs.select_columns([id_col, text_col]).map_batches(
        _grams, batch_format="pyarrow", zero_copy_batch=True)

    def _pairs(group: pa.Table) -> pa.Table:
        empty = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                           ("gram", pa.string())]).empty_table()
        side = np.asarray(group["side"], dtype=np.int8)
        ids = np.asarray(group["doc_id"], dtype=np.int64)
        a = ids[side == 0]          # docs whose LAST gram is this
        b = ids[side == 1]          # docs whose FIRST gram is this
        if len(a) == 0 or len(b) == 0 or len(a) > cap or len(b) > cap:
            return empty
        aa = np.repeat(a, len(b))
        bb = np.tile(b, len(a))
        m = aa != bb
        if not m.any():
            return empty
        return pa.table({
            "doc_a": pa.array(aa[m], pa.int64()),
            "doc_b": pa.array(bb[m], pa.int64()),
            "gram": pa.array([group["gram"][0].as_py()] * int(m.sum()),
                             pa.string()),
        })

    return hash_group_apply(
        rows, ["gram"], _pairs, n_parts=n_parts,
        plasma_schema=pa.schema([("doc_a", pa.int64()),
                                 ("doc_b", pa.int64()),
                                 ("gram", pa.string())]))
