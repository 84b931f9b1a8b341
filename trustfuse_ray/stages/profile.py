"""Data-profiling operators: heavy-hitter vocabulary, exact quantiles,
scale-safe histograms, JSON-ish property extraction.

Corpus profiling is the step before every curation decision (which tokens
dominate, where the value mass sits, what metadata fields carry).  Shapes:

* ``top_tokens`` — map-side partial token counts (dictionary-encode +
  bincount per block, so the shuffle carries one row per DISTINCT token
  per block, not per occurrence) → small groupby sum → top-k sort.
* ``value_quantiles`` — exact per-group quantiles; the group is the unit
  of locality (one task sorts one key's values).  Correct for profiling
  keyed by low-cardinality columns; for quantiles over an unbounded key
  space use ``value_histogram`` (mergeable, fixed-size partials).
* ``value_histogram`` — fixed-width bins over a known range: per-block
  bincount partials, one tiny groupby sum.  The 100-TB path — state per
  block is O(bins) regardless of rows.
* ``extract_props`` — vectorized regex field extraction from a JSON-ish
  string column (``pc.extract_regex``), then a per-key aggregate.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from trustfuse_ray.stages.common import hash_group_apply

_SPLIT_RX = r"\s+"


# --------------------------------------------------------------------------
# Heavy-hitter vocabulary
# --------------------------------------------------------------------------

def top_tokens(docs, k: int = 50, text_col: str = "text"):
    """Top-k corpus tokens by count (ties broken by token asc).  The
    map-side combine collapses each block to its distinct-token counts
    before the shuffle, so exchange volume is bounded by block vocabulary,
    not token occurrences."""
    def _partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch[text_col]), _SPLIT_RX)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.bincount(idx, minlength=len(enc.dictionary))
        return pa.table({"token": enc.dictionary,
                         "n": pa.array(counts, pa.int64())})

    partial = docs.select_columns([text_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
    total = partial.groupby("token").sum("n").rename_columns(
        {"sum(n)": "n"})
    return total.sort(["n", "token"], descending=[True, False]).limit(k)


# --------------------------------------------------------------------------
# Exact per-group quantiles
# --------------------------------------------------------------------------

def _quantile_group(group: pa.Table, *, key_col: str, value_col: str,
                    qs: tuple[float, ...]) -> pa.Table:
    vals = np.sort(np.asarray(group[value_col], dtype=np.float64))
    n = len(vals)
    row = {key_col: pa.array([group[key_col][0].as_py()], pa.string()),
           "n": pa.array([n], pa.int64())}
    for q in qs:
        # the value at index floor(q*(n-1)) — discrete, no interpolation,
        # so engine and SQL oracle agree bit-for-bit on doubles
        row[f"p{int(q * 100)}"] = pa.array(
            [float(vals[int(np.floor(q * (n - 1)))])], pa.float64())
    return pa.table(row)


def value_quantiles(ds, key_col: str = "event_type",
                    value_col: str = "value",
                    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                    n_parts: int = 16):
    """Exact discrete quantiles (value at floor(q·(n−1)) of the sorted
    group) per key.  Partitioning assumption: one key's values fit one
    task — correct for low-cardinality profile keys; use
    :func:`value_histogram` when they don't."""
    out_schema = pa.schema(
        [(key_col, pa.string()), ("n", pa.int64())]
        + [(f"p{int(q * 100)}", pa.float64()) for q in qs])
    return hash_group_apply(
        ds.select_columns([key_col, value_col]), [key_col],
        functools.partial(_quantile_group, key_col=key_col,
                          value_col=value_col, qs=qs), n_parts=n_parts,
        plasma_schema=out_schema)


# --------------------------------------------------------------------------
# Mergeable fixed-width histogram (the scale path)
# --------------------------------------------------------------------------

def value_histogram(ds, key_col: str = "event_type",
                    value_col: str = "value", lo: float = 0.0,
                    hi: float = 1000.0, bins: int = 20):
    """Per-(key, bin) counts over fixed-width bins of ``[lo, hi)``; values
    outside clamp into the edge bins.  Per-block partial state is
    O(keys × bins) regardless of rows — fully mergeable, no sort."""
    width = (hi - lo) / bins

    def _partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        vals = np.asarray(batch[value_col], dtype=np.float64)
        b = np.clip(np.floor((vals - lo) / width), 0, bins - 1).astype(
            np.int64)
        enc = pc.dictionary_encode(
            keys.combine_chunks() if isinstance(keys, pa.ChunkedArray)
            else keys)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        kidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nk = len(enc.dictionary)
        flat = kidx * bins + b
        counts = np.bincount(flat, minlength=nk * bins)
        nz = np.flatnonzero(counts)
        return pa.table({
            key_col: enc.dictionary.take(pa.array(nz // bins)),
            "bin": pa.array(nz % bins, pa.int64()),
            "n": pa.array(counts[nz], pa.int64()),
        })

    partial = ds.select_columns([key_col, value_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
    return (partial.groupby([key_col, "bin"]).sum("n")
            .rename_columns({"sum(n)": "n"}))


# --------------------------------------------------------------------------
# Exact distinct count per key (map-side distinct combiner)
# --------------------------------------------------------------------------

def distinct_count_per_key(ds, key_col: str = "event_type",
                           val_col: str = "user_id"):
    """count(DISTINCT val) per key: each block first collapses to its
    distinct (key, val) pairs (combiner), the (key, val) groupby finishes
    the global distinct, and a final tiny per-key sum counts.  Exchange
    volume is bounded by distinct pairs, never raw rows."""
    def _dedup(batch: pa.Table) -> pa.Table:
        return pa.TableGroupBy(batch.select([key_col, val_col]),
                               [key_col, val_col],
                               use_threads=False).aggregate([])

    def _count(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        enc = pc.dictionary_encode(
            keys.combine_chunks() if isinstance(keys, pa.ChunkedArray)
            else keys)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        kidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.bincount(kidx, minlength=len(enc.dictionary))
        return pa.table({key_col: enc.dictionary,
                         "n": pa.array(counts, pa.int64())})

    distinct_pairs = ds.select_columns([key_col, val_col]).map_batches(
        _dedup, batch_format="pyarrow", zero_copy_batch=True).groupby(
        [key_col, val_col]).count()
    partial = distinct_pairs.map_batches(_count, batch_format="pyarrow",
                                         zero_copy_batch=True)
    return (partial.groupby(key_col).sum("n")
            .rename_columns({"sum(n)": "n_distinct"}))


# --------------------------------------------------------------------------
# HyperLogLog — the mergeable scale path for distinct counting
# --------------------------------------------------------------------------

def hll_registers(ds, key_col: str = "event_type",
                  val_col: str = "user_id", p: int = 12):
    """Sparse HyperLogLog register table per key: (key, reg_idx,
    register).  Per-block partials are O(2^p) dense arrays collapsed to
    their nonzero entries; the global merge is an elementwise max — a
    ``groupby(key, reg_idx).max``.  The hash is the first 64 bits of
    md5(str(val)), so the whole sketch — idx, rank, max — is exactly
    replayable in SQL (the driver oracle does); the estimate is
    :func:`hll_estimate` over this table."""
    shift = 64 - p
    m = 1 << p
    mask = np.uint64((1 << shift) - 1)

    def _partial(batch: pa.Table) -> pa.Table:
        import hashlib
        # hash only the block's DISTINCT values (values repeat heavily in
        # event streams) — dictionary-encode, md5 per unique, gather
        venc = pc.dictionary_encode(
            batch[val_col].cast(pa.string()).combine_chunks()
            if isinstance(batch[val_col], pa.ChunkedArray)
            else batch[val_col].cast(pa.string()))
        if isinstance(venc, pa.ChunkedArray):
            venc = venc.combine_chunks()
        uh = np.fromiter(
            (int(hashlib.md5((v or "").encode()).hexdigest()[:16], 16)
             for v in venc.dictionary.to_pylist()),
            dtype=np.uint64, count=len(venc.dictionary))
        h = uh[venc.indices.to_numpy(zero_copy_only=False)
               .astype(np.int64)]
        idx = (h >> np.uint64(shift)).astype(np.int64)
        w = h & mask
        bl = np.zeros(len(w), np.int64)
        nz = w > 0
        bl[nz] = np.floor(
            np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
        rank = shift - bl + 1          # w == 0 → shift + 1
        keys = batch[key_col]
        enc = pc.dictionary_encode(
            keys.combine_chunks() if isinstance(keys, pa.ChunkedArray)
            else keys)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        kidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        nk = len(enc.dictionary)
        reg = np.zeros(nk * m, np.int64)
        np.maximum.at(reg, kidx * m + idx, rank)
        nzr = np.flatnonzero(reg)
        return pa.table({
            key_col: enc.dictionary.take(pa.array(nzr // m)),
            "reg_idx": pa.array(nzr % m, pa.int64()),
            "register": pa.array(reg[nzr], pa.int64()),
        })

    partial = ds.select_columns([key_col, val_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
    return (partial.groupby([key_col, "reg_idx"]).max("register")
            .rename_columns({"max(register)": "register"}))


def hll_estimate(registers: pa.Table, p: int = 12,
                 key_col: str = "event_type") -> dict[str, float]:
    """Standard HLL estimate (with the small-range linear-counting
    correction) from a sparse register table."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    out: dict[str, float] = {}
    keys = registers[key_col].to_pylist()
    idxs = np.asarray(registers["reg_idx"], dtype=np.int64)
    regs = np.asarray(registers["register"], dtype=np.int64)
    for key in sorted(set(keys)):
        sel = np.array([k == key for k in keys])
        dense = np.zeros(m, np.int64)
        dense[idxs[sel]] = regs[sel]
        est = alpha * m * m / np.sum(np.exp2(-dense.astype(np.float64)))
        zeros = int((dense == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        out[key] = float(est)
    return out


# --------------------------------------------------------------------------
# Per-key top-k with map-side combiner
# --------------------------------------------------------------------------

def _topk_select(batch: pa.Table, *, key_col: str, sort_col: str,
                 id_col: str, k: int) -> pa.Table:
    """Keep the top-k rows per key within one table (sort_col desc,
    id_col asc tie-break) — used both as the map-side combiner and the
    per-group finalizer."""
    keys = batch[key_col]
    enc = pc.dictionary_encode(
        keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    kidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = np.asarray(batch[sort_col], dtype=np.int64)
    ids = np.asarray(batch[id_col], dtype=np.int64)
    order = np.lexsort((ids, -vals, kidx))
    ks = kidx[order]
    new = np.ones(len(ks), bool)
    new[1:] = ks[1:] != ks[:-1]
    # rank within key run = position − position of run start
    run_start = np.maximum.accumulate(np.where(new, np.arange(len(ks)), 0))
    rank = np.arange(len(ks)) - run_start
    return batch.take(pa.array(order[rank < k]))


def topk_per_key(ds, key_col: str, sort_col: str, k: int = 5,
                 id_col: str = "doc_id", n_parts: int = 16):
    """Top-k rows per key (sort_col desc, id asc ties): each block first
    collapses to its local top-k per key, so the shuffle carries at most
    k × (keys per block) rows — the combiner pattern for windowed top-N."""
    partial = ds.select_columns([key_col, sort_col, id_col]).map_batches(
        functools.partial(_topk_select, key_col=key_col, sort_col=sort_col,
                          id_col=id_col, k=k),
        batch_format="pyarrow", zero_copy_batch=True)
    return hash_group_apply(
        partial, [key_col],
        functools.partial(_topk_select, key_col=key_col, sort_col=sort_col,
                          id_col=id_col, k=k), n_parts=n_parts)


# --------------------------------------------------------------------------
# Bottom-k hash sample per key (deterministic uniform stratum sample)
# --------------------------------------------------------------------------

def _bottomk_select(batch: pa.Table, *, key_col: str, id_col: str,
                    k: int) -> pa.Table:
    """Keep the k rows with smallest md5(str(id)) per key — deterministic
    on any partitioning, so block-level partials compose exactly."""
    import hashlib
    if "fp" in batch.column_names:
        fps = np.asarray(batch["fp"].to_pylist(), dtype="S32")
    else:
        ids_s = batch[id_col].cast(pa.string()).to_pylist()
        fps = np.asarray([hashlib.md5((s or "").encode()).hexdigest()
                          for s in ids_s], dtype="S32")
        batch = batch.append_column(
            "fp", pa.array([f.decode() for f in fps], pa.string()))
    keys = batch[key_col]
    enc = pc.dictionary_encode(
        keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    kidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((fps, kidx))
    ks = kidx[order]
    new = np.ones(len(ks), bool)
    new[1:] = ks[1:] != ks[:-1]
    run_start = np.maximum.accumulate(np.where(new, np.arange(len(ks)), 0))
    rank = np.arange(len(ks)) - run_start
    return batch.take(pa.array(order[rank < k]))


def bottomk_hash_sample(ds, key_col: str = "source", k: int = 10,
                        id_col: str = "doc_id", n_parts: int = 16):
    """Deterministic uniform k-sample per key: the k rows whose
    md5(str(id)) sorts lowest.  Identical output on any partitioning or
    retry (the hash is the order), and the block-level bottom-k combiner
    bounds the shuffle at k rows per key per block.  Doubles as a
    bottom-k sketch of per-key cardinality."""
    partial = ds.select_columns([key_col, id_col]).map_batches(
        functools.partial(_bottomk_select, key_col=key_col, id_col=id_col,
                          k=k),
        batch_format="pyarrow", zero_copy_batch=True)
    return hash_group_apply(
        partial, [key_col],
        functools.partial(_bottomk_select, key_col=key_col, id_col=id_col,
                          k=k), n_parts=n_parts)


# --------------------------------------------------------------------------
# JSON-ish property extraction
# --------------------------------------------------------------------------

def extract_props(events, field: str = "k", props_col: str = "props",
                  key_col: str = "event_type"):
    """Pull an integer field out of a JSON-ish string column with one
    vectorized ``extract_regex`` kernel, then aggregate per key."""
    pattern = '"' + field + '":\\s*(?P<v>-?\\d+)'

    def _extract(batch: pa.Table) -> pa.Table:
        ex = pc.extract_regex(batch[props_col], pattern)
        v = pc.cast(pc.struct_field(ex, "v"), pa.int64())
        return pa.table({key_col: batch[key_col], "v": v})

    ex = events.select_columns([key_col, props_col]).map_batches(
        _extract, batch_format="pyarrow", zero_copy_batch=True)
    agg = ex.groupby(key_col).aggregate(
        *[a for a in _prop_aggs()])
    return agg.rename_columns({
        "count(v)": "n", "sum(v)": "sum_v", "min(v)": "min_v",
        "max(v)": "max_v"})


def _prop_aggs():
    from ray.data.aggregate import Count, Max, Min, Sum
    return [Count("v"), Sum("v"), Min("v"), Max("v")]


# --------------------------------------------------------------------------
# Count-min sketch — mergeable token-frequency sketch
# --------------------------------------------------------------------------

# token → (depth,) bucket row, memoized per worker process (link.py's
# warm-task pattern): real corpora repeat most of their vocabulary across
# batches, so the md5 work amortizes to once per token per worker
_CMS_MEMO: dict = {}


def _cms_buckets(uniq: list, depth: int, width: int) -> np.ndarray:
    from trustfuse_ray.stages.dedup import _md5_token64

    memo = _CMS_MEMO.setdefault((depth, width), {})
    out = np.empty((len(uniq), depth), np.int64)
    for i, t in enumerate(uniq):
        row = memo.get(t)
        if row is None:
            row = np.array([_md5_token64(f"{j}:{t}") % width
                            for j in range(depth)], np.int64)
            if len(memo) < 2_000_000:  # bound per-process memory
                memo[t] = row
        out[i] = row
    return out


def _cms_partial(batch: pa.Table, *, depth: int, width: int,
                 text_col: str) -> pa.Table:
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], "")),
        r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    enc = pc.dictionary_encode(flat)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = enc.dictionary.to_pylist()
    counts = np.bincount(code, minlength=len(uniq)).astype(np.int64)
    reg = np.zeros(depth * width, np.int64)
    b = _cms_buckets(uniq, depth, width)
    for j in range(depth):
        np.add.at(reg, j * width + b[:, j], counts)
    nz = np.flatnonzero(reg)
    return pa.table({
        "row_j": pa.array(nz // width, pa.int64()),
        "bucket": pa.array(nz % width, pa.int64()),
        "n": pa.array(reg[nz], pa.int64()),
    })


def cms_registers(docs, depth: int = 4, width: int = 1024,
                  text_col: str = "text"):
    """Count-min sketch over whitespace tokens as a sparse cell table
    ``(row_j, bucket, n)``: cell (j, b) counts token occurrences with
    ``md5_64(f"{j}:{token}") % width == b``.  Per-block partials are a
    dense (depth × width) int64 matrix collapsed to nonzero cells, so the
    merge is a tiny ``groupby.sum`` over ≤ depth×width keys; like the HLL
    sketch the hash is md5-keyed, making the whole sketch exactly
    replayable in SQL (``md5_number_lower``).  Point estimate for a token
    = min over its depth cells (upper-bounds the true count)."""
    partial = docs.select_columns([text_col]).map_batches(
        functools.partial(_cms_partial, depth=depth, width=width,
                          text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True)
    return (partial.groupby(["row_j", "bucket"]).sum("n")
            .rename_columns({"sum(n)": "n"}))


def cms_estimate(registers: pa.Table, tokens: list[str], depth: int = 4,
                 width: int = 1024) -> dict[str, int]:
    """Point-estimate token counts from a sparse CMS cell table (min over
    the token's depth cells; absent cell = 0)."""
    from trustfuse_ray.stages.dedup import _md5_token64

    cells = {(int(r), int(b)): int(n) for r, b, n in zip(
        registers["row_j"].to_pylist(), registers["bucket"].to_pylist(),
        registers["n"].to_pylist())}
    out: dict[str, int] = {}
    for t in tokens:
        est = None
        for j in range(depth):
            b = int(_md5_token64(f"{j}:{t}") % width)
            v = cells.get((j, b), 0)
            est = v if est is None else min(est, v)
        out[t] = int(est or 0)
    return out


# --------------------------------------------------------------------------
# TF-IDF distinctive terms per group
# --------------------------------------------------------------------------

def tfidf_top_terms(docs, group_col: str = "source", k: int = 5,
                    text_col: str = "text", n_parts: int = 16):
    """Top-k distinctive whitespace tokens per group by tf-idf.  tf =
    token occurrences within the group; idf = ln(n_groups / df) where df
    counts groups containing the token.  The score is an integer —
    ``tf × round(ln(n_groups/df)·1e9)`` — so engine and SQL rank
    identically (ties break by token).

    Shape: block-level (group, token, n) partials collapse each block to
    its distinct pairs before ONE exchange on (group, token); df and the
    final top-k run over the aggregated pair table (vocab × groups rows —
    corpus-size-independent)."""
    def _pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], "")),
            r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        grp = batch[group_col]
        genc = pc.dictionary_encode(
            grp.combine_chunks() if isinstance(grp, pa.ChunkedArray)
            else grp)
        if isinstance(genc, pa.ChunkedArray):
            genc = genc.combine_chunks()
        gidx = genc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        grep = np.repeat(gidx, lens)
        nv = len(enc.dictionary)
        key = grep * nv + code
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            group_col: genc.dictionary.take(pa.array(uk // nv)),
            "token": enc.dictionary.take(pa.array(uk % nv)),
            "tf": pa.array(cnt.astype(np.int64), pa.int64()),
        })

    from trustfuse_ray.stages.common import _add_part, plasma_exchange

    pairs = docs.select_columns([group_col, text_col]).map_batches(
        _pairs, batch_format="pyarrow", zero_copy_batch=True)
    agg = (pairs.groupby([group_col, "token"]).sum("tf")
           .rename_columns({"sum(tf)": "tf"}).materialize())
    # the group count is the one (tiny) global scalar
    groups = agg.select_columns([group_col]).unique(group_col)
    ng = len(groups) if groups else 0

    # df never materializes on the driver: partition the (group, token, tf)
    # table by token — every row of a token co-locates, so df is simply the
    # token's run length inside the partition
    scored_schema = pa.schema([(group_col, pa.string()),
                               ("token", pa.string()), ("tf", pa.int64()),
                               ("df", pa.int64()), ("score", pa.int64())])

    def _score_part(tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return scored_schema.empty_table()
        order = pc.sort_indices(tbl, sort_keys=[("token", "ascending")])
        tbl = tbl.take(order)
        toks = tbl["token"].to_pandas().to_numpy(dtype=object)
        n = len(toks)
        head = np.ones(n, dtype=bool)
        head[1:] = toks[1:] != toks[:-1]
        run_id = np.cumsum(head) - 1
        df = np.bincount(run_id).astype(np.int64)[run_id]
        tf = np.asarray(tbl["tf"], dtype=np.int64)
        idf = np.round(np.log(ng / df.astype(np.float64))
                       * 1e9).astype(np.int64)
        return pa.table({
            group_col: tbl[group_col], "token": tbl["token"],
            "tf": pa.array(tf, pa.int64()),
            "df": pa.array(df, pa.int64()),
            "score": pa.array(tf * idf, pa.int64()),
        })

    keyed = agg.map_batches(
        functools.partial(_add_part, keys=["token"], n_parts=n_parts),
        batch_format="pyarrow", zero_copy_batch=True)
    in_schema = pa.schema([(group_col, pa.string()), ("token", pa.string()),
                           ("tf", pa.int64()), ("__part", pa.int32())])
    scored = plasma_exchange([keyed], _score_part, n_parts,
                             part_col="__part", empty_schema=in_schema)

    def _topk(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[
            ("score", "descending"), ("token", "ascending")])
        return group.take(order[:k])

    out_schema = pa.schema([(group_col, pa.string()),
                            ("token", pa.string()), ("tf", pa.int64()),
                            ("df", pa.int64()), ("score", pa.int64())])
    return hash_group_apply(scored, [group_col], _topk, n_parts=n_parts,
                            plasma_schema=out_schema)


# --------------------------------------------------------------------------
# Multi-level (rollup) aggregate
# --------------------------------------------------------------------------

def _rollup_partial(batch: pa.Table, *, keys: tuple[str, ...],
                    value_col: str, sentinel: str) -> pa.Table:
    """Map-side rollup partial: pre-aggregate the block at EVERY prefix
    level of ``keys`` (collapsed keys take ``sentinel``), so the one
    exchange carries ≤ levels × distinct-keys rows per block."""
    empty = pa.schema([(k, pa.string()) for k in keys]
                      + [("v", pa.int64()), ("n", pa.int64())])
    if len(batch) == 0:
        return empty.empty_table()
    t = pa.table({**{k: batch[k].cast(pa.string()) for k in keys},
                  "v": batch[value_col].cast(pa.int64()),
                  "n": pa.array(np.ones(len(batch), np.int64))})
    outs = []
    for lvl in range(len(keys), -1, -1):
        gks = list(keys[:lvl])
        if gks:
            g = (pa.TableGroupBy(t, gks)
                 .aggregate([("v", "sum"), ("n", "sum")])
                 .rename_columns(gks + ["v", "n"]))
        else:
            g = pa.table({"v": pa.array([int(pc.sum(t["v"]).as_py() or 0)],
                                        pa.int64()),
                          "n": pa.array([len(batch)], pa.int64())})
        arrs = {k: (g[k] if k in g.column_names
                    else pa.array([sentinel] * len(g), pa.string()))
                for k in keys}
        outs.append(pa.table({**arrs, "v": g["v"], "n": g["n"]}))
    return pa.concat_tables(outs)


def rollup_counts(docs, keys: tuple[str, ...] = ("source", "lang"),
                  value_col: str = "n_chars", sentinel: str = "ALL"):
    """Rollup aggregate (SQL ``GROUP BY ROLLUP``): row count and value sum
    at every prefix level of ``keys``, collapsed levels marked with
    ``sentinel``.  One pass, one small shuffle — every level is derived
    map-side from the finest block partial, so adding levels costs no
    extra exchange."""
    partial = docs.select_columns(list(keys) + [value_col]).map_batches(
        functools.partial(_rollup_partial, keys=tuple(keys),
                          value_col=value_col, sentinel=sentinel),
        batch_format="pyarrow", zero_copy_batch=True)
    agg = partial.groupby(list(keys)).sum(["v", "n"])

    def _finish(batch: pa.Table) -> pa.Table:
        return pa.table({**{k: batch[k] for k in keys},
                         "n_rows": batch["sum(n)"],
                         "value_sum": batch["sum(v)"]})

    return agg.map_batches(_finish, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Per-group outlier flag (exact integer z² test)
# --------------------------------------------------------------------------

def group_outliers(ds, key_col: str = "source", value_col: str = "n_chars",
                   id_col: str = "doc_id", k: int = 3):
    """Flag rows whose value deviates more than ``k`` standard deviations
    from their group mean — the per-source length-outlier filter — using
    the EXACT integer inequality ``(n·v − S)² > k²·(n·Q − S²)`` (S = Σv,
    Q = Σv²; equivalent to z² > k² with the population σ), so no float
    sqrt/stddev ever enters and engine and SQL agree bit-for-bit.

    Shape: per-block (key, S, Q, n) partials → one tiny groupby → the
    stats table broadcasts via ``ray.put`` (O(#keys) rows) → one streaming
    flag pass.  Degenerate groups (σ = 0 or singleton) flag nothing.
    The vectorized int64 path is used only when a per-batch bounds check
    proves no product can exceed 2^63; otherwise the flag falls back to
    arbitrary-precision Python ints (matching the oracle's HUGEINT)."""
    import ray

    def _stats_partial(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        enc = pc.dictionary_encode(
            keys.combine_chunks() if isinstance(keys, pa.ChunkedArray)
            else keys)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        kidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.asarray(batch[value_col], dtype=np.int64)
        nk = len(enc.dictionary)
        # exact int64 accumulation (float-weighted bincount would lose
        # exactness once a block partial exceeds 2^53)
        s = np.zeros(nk, np.int64)
        q = np.zeros(nk, np.int64)
        np.add.at(s, kidx, v)
        np.add.at(q, kidx, v * v)
        n = np.bincount(kidx, minlength=nk).astype(np.int64)
        return pa.table({key_col: enc.dictionary,
                         "s": pa.array(s, pa.int64()),
                         "q": pa.array(q, pa.int64()),
                         "n": pa.array(n, pa.int64())})

    stats = (ds.select_columns([key_col, value_col]).map_batches(
        _stats_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key_col).sum(["s", "q", "n"]).to_pandas())
    lut = {r[key_col]: (int(r["sum(s)"]), int(r["sum(q)"]),
                        int(r["sum(n)"]))
           for _, r in stats.iterrows()}
    lut_ref = ray.put(lut)

    def _flag(batch: pa.Table) -> pa.Table:
        m = ray.get(lut_ref)
        keys = batch[key_col]
        enc = pc.dictionary_encode(
            keys.combine_chunks() if isinstance(keys, pa.ChunkedArray)
            else keys)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        kidx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq = enc.dictionary.to_pylist()
        su = np.array([m.get(u, (0, 0, 0))[0] for u in uniq], np.int64)
        qu = np.array([m.get(u, (0, 0, 0))[1] for u in uniq], np.int64)
        nu = np.array([m.get(u, (0, 0, 0))[2] for u in uniq], np.int64)
        v = np.asarray(batch[value_col], dtype=np.int64)
        s, q, n = su[kidx], qu[kidx], nu[kidx]
        # var_num = n²σ², dev = n(v − μ).  int64 is exact only while
        # n·q, s² and dev² stay below 2^63 — guard and fall back to
        # arbitrary-precision Python ints when any group could overflow
        # (the oracle computes in HUGEINT, so silent wraparound would
        # silently diverge)
        lim = int(np.iinfo(np.int64).max)
        safe = True
        if len(nu):
            mq = int(nu.max()) * max(abs(int(qu.max()) if len(qu) else 0),
                                     1)
            ms = int(max(abs(su.max()), abs(su.min())) if len(su) else 0)
            mv = int(max(abs(v.max()), abs(v.min()))) if len(v) else 0
            md = int(nu.max()) * mv + ms
            safe = (mq < lim and ms * ms < lim and md * md < lim
                    and k * k * mq < lim)
        if safe:
            var_num = n * q - s * s
            dev = n * v - s
            out = (n > 1) & (var_num > 0) & (dev * dev > k * k * var_num)
        else:
            out = np.zeros(len(v), dtype=bool)
            for i in range(len(v)):
                ni, si, qi = int(n[i]), int(s[i]), int(q[i])
                var_num = ni * qi - si * si
                dev = ni * int(v[i]) - si
                out[i] = (ni > 1 and var_num > 0
                          and dev * dev > k * k * var_num)
        return pa.table({
            id_col: batch[id_col].cast(pa.int64()),
            key_col: batch[key_col],
            value_col: pa.array(v, pa.int64()),
            "is_outlier": pa.array(out, pa.bool_()),
        })

    return ds.select_columns([id_col, key_col, value_col]).map_batches(
        _flag, batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------------------
# PMI top bigrams
# --------------------------------------------------------------------------

def _bigram_partial(batch: pa.Table, text_col: str) -> pa.Table:
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], "")),
        _SPLIT_RX)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
    enc = pc.dictionary_encode(toks.flatten())
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    docix = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
    if len(code) < 2:
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    same = docix[1:] == docix[:-1]
    a, b = code[:-1][same], code[1:][same]
    v = len(enc.dictionary)
    key = a * v + b
    uk, cnt = np.unique(key, return_counts=True)
    dic = enc.dictionary
    return pa.table({
        "a": dic.take(pa.array(uk // v)),
        "b": dic.take(pa.array(uk % v)),
        "n": pa.array(cnt.astype(np.int64), pa.int64()),
    })


def pmi_top_bigrams(docs, k: int = 20, min_count: int = 5,
                    text_col: str = "text"):
    """Top-k adjacent-token bigrams by pointwise mutual information,
    restricted to bigrams with count ≥ ``min_count``.  Integer score
    ``round(ln(n_ab·T² / (B·n_a·n_b))·1e9)`` (T = tokens, B = bigrams)
    so engine and SQL rank identically; ties break by (a, b).

    Scale shape: block-level distinct-pair combiners bound both
    exchanges by block vocabulary; the FULL unigram vocabulary is never
    broadcast — after the min_count filter the (small) candidate token
    set broadcasts, unigram partials are filtered map-side against it,
    and only those counts reach the driver."""
    import ray

    bi = (docs.select_columns([text_col]).map_batches(
        functools.partial(_bigram_partial, text_col=text_col),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["a", "b"]).sum("n").rename_columns({"sum(n)": "n"}))
    bi = bi.filter(expr=f"n >= {int(min_count)}").materialize()
    b_total = None  # total bigrams = sum over UNfiltered partials

    def _uni_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], "")),
            _SPLIT_RX)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        enc = pc.dictionary_encode(toks.flatten())
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(idx, minlength=len(enc.dictionary))
        return pa.table({"token": enc.dictionary,
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    # materialize the (block-vocab-bounded) unigram partials once — the
    # sum, the candidate filter and the final agg all reuse them instead
    # of re-tokenizing the corpus per consumer
    uni_partial = docs.select_columns([text_col]).map_batches(
        _uni_partial, batch_format="pyarrow",
        zero_copy_batch=True).materialize()
    t_total = int(uni_partial.sum("n") or 0)
    # total bigram count per doc = tokens - 1 → T - n_docs
    n_docs = docs.count()
    b_total = t_total - n_docs
    # candidate tokens (small after min_count): broadcast, filter map-side
    cand = bi.to_pandas()
    if len(cand) == 0:
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
            "n_ab": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64())}))
    cand_tokens = sorted(set(cand["a"]) | set(cand["b"]))
    tok_ref = ray.put(pa.array(cand_tokens, pa.string()))

    def _filter_uni(batch: pa.Table) -> pa.Table:
        cands = ray.get(tok_ref)  # zero-copy local plasma read
        return batch.filter(pc.is_in(batch["token"], value_set=cands))

    uni = (uni_partial.map_batches(_filter_uni, batch_format="pyarrow",
                                   zero_copy_batch=True)
           .groupby("token").sum("n").to_pandas())
    un = dict(zip(uni["token"], uni["sum(n)"].astype(int)))
    na = cand["a"].map(un).to_numpy(dtype=np.float64)
    nb = cand["b"].map(un).to_numpy(dtype=np.float64)
    nab = cand["n"].to_numpy(dtype=np.float64)
    x = nab * float(t_total) * float(t_total) / (
        float(b_total) * na * nb)
    score = np.round(np.log(x) * 1e9).astype(np.int64)
    out = cand.assign(score=score).rename(columns={"n": "n_ab"})
    out = out.sort_values(["score", "a", "b"],
                          ascending=[False, True, True]).head(k)
    return ray.data.from_arrow(pa.table({
        "a": pa.array(out["a"], pa.string()),
        "b": pa.array(out["b"], pa.string()),
        "n_ab": pa.array(out["n_ab"].astype(np.int64), pa.int64()),
        "score": pa.array(out["score"].astype(np.int64), pa.int64())}))


# --------------------------------------------------------------------------
# BPE vocabulary induction: adjacent-character-pair counts
# --------------------------------------------------------------------------

def char_pair_keys(col) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized per-doc adjacent character pairs inside whitespace
    tokens: per-doc words Arrow-joined with ' ', docs joined with '\\n',
    decoded to a codepoint ndarray via utf-32-le (unicode-exact — DuckDB
    ``substr`` replays it).  Returns (docix, keys) with
    ``key = left << 21 | right``; separators never pair, so word and doc
    boundaries are respected without any per-row loop.

    Whitespace boundary: Arrow's RE2 ``\s`` is ASCII ([\t\n\f\r ]),
    while DuckDB's ``\s`` also matches Unicode spaces (NBSP, em-space) —
    identical on ASCII corpora (all fixtures here); pin an explicit
    ``[\t\n\f\r ]`` class on the SQL side if a corpus carries Unicode
    whitespace."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(col.cast(pa.string())), _SPLIT_RX)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    joined = pc.binary_join(toks, " ").to_pylist()
    s = "\n".join(d or "" for d in joined)
    cp = np.frombuffer(s.encode("utf-32-le"), np.uint32)
    if len(cp) < 2:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64))
    lens = np.fromiter((len(d or "") for d in joined), dtype=np.int64,
                       count=len(joined))
    bounds = np.cumsum(lens + 1)
    left, right = cp[:-1], cp[1:]
    mask = ((left != 32) & (left != 10) & (right != 32) & (right != 10))
    pos = np.nonzero(mask)[0]
    docix = np.searchsorted(bounds, pos, side="right").astype(np.int64)
    keys = ((left[pos].astype(np.int64) << 21)
            | right[pos].astype(np.int64))
    return docix, keys


def bpe_pair_counts(docs, text_col: str = "text", min_count: int = 2):
    """BPE vocabulary induction, iteration 0: global counts of adjacent
    character pairs inside whitespace tokens — the statistic the first
    BPE merge rule maximizes (Sennrich et al. 2016).

    Map-side: each block collapses to its distinct (l, r, n) pair
    partials in ONE vectorized pass — words are Arrow-joined into a
    single space-separated string, decoded to a codepoint ndarray via
    utf-32-le (unicode-exact, so DuckDB ``substr`` replays it), and
    pair keys are counted with np.unique.  Exchange volume is bounded
    by the block's distinct pair count (≤ alphabet²), never by corpus
    size; the final groupby-sum is over that tiny pair space.  Pairs
    below ``min_count`` drop after global aggregation."""
    def _partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({"l": pa.array([], pa.string()),
                          "r": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if not len(batch):
            return empty
        _, keys = char_pair_keys(batch[text_col])
        if not len(keys):
            return empty
        uniq, cnt = np.unique(keys, return_counts=True)
        return pa.table({
            "l": pa.array([chr(int(k) >> 21) for k in uniq], pa.string()),
            "r": pa.array([chr(int(k) & 0x1FFFFF) for k in uniq],
                          pa.string()),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    partial = docs.select_columns([text_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
    total = partial.groupby(["l", "r"]).sum("n").rename_columns(
        {"sum(n)": "n"})
    return total.filter(expr=f"n >= {int(min_count)}")


def charlm_scores(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Character-bigram LM quality score (a KenLM-style perplexity proxy
    for corpus filtering): per doc, the sum over its within-word adjacent
    character pairs of ``bitlen(c_lr + 1) − bitlen(c_l· + 1)`` — an
    integer log2 of the smoothed conditional bigram probability, exactly
    replayable in SQL via ``length(bin(n + 1))`` (the DSIR trick).  Lower
    (more negative) = less typical character sequences.

    Shape: phase 1 reuses the BPE pair kernel for GLOBAL pair counts
    (bounded by alphabet², collected once and ``ray.put``-broadcast with
    their left-marginals); phase 2 is one streaming pass — pair keys map
    to counts via searchsorted, per-doc sums via bincount.  Docs with no
    pairs score 0."""
    import ray

    rows = bpe_pair_counts(docs, text_col=text_col,
                           min_count=1).take_all()
    keys = np.array([(ord(r["l"]) << 21) | ord(r["r"]) for r in rows],
                    dtype=np.int64)
    ns = np.array([r["n"] for r in rows], dtype=np.int64)
    order = np.argsort(keys)
    keys, ns = keys[order], ns[order]
    lmap: dict[int, int] = {}
    for k, n in zip(keys, ns):
        lmap[int(k) >> 21] = lmap.get(int(k) >> 21, 0) + int(n)
    lkeys = np.array(sorted(lmap), dtype=np.int64)
    lns = np.array([lmap[int(k)] for k in lkeys], dtype=np.int64)
    ref = ray.put((keys, ns, lkeys, lns))

    def _bitlen(x: np.ndarray) -> np.ndarray:
        # frexp exponent == bit length for positive ints (exact, no log2
        # rounding risk)
        return np.frexp(x.astype(np.float64))[1].astype(np.int64)

    def _score(batch: pa.Table) -> pa.Table:
        ks, cnts, lks, lcs = ray.get(ref)
        docix, pk = char_pair_keys(batch[text_col])
        n = len(batch)
        if len(pk):
            ix = np.searchsorted(ks, pk)
            lx = np.searchsorted(lks, pk >> 21)
            # every batch pair was counted in the global phase-1 pass;
            # a miss would mean silent mis-scoring, so fail loudly
            if (ix >= len(ks)).any() or (ks[np.minimum(
                    ix, len(ks) - 1)] != pk).any():
                raise ValueError("charlm: pair missing from global counts")
            c_lr = cnts[ix]
            c_l = lcs[lx]
            contrib = _bitlen(c_lr + 1) - _bitlen(c_l + 1)
            score = np.bincount(docix, weights=contrib,
                                minlength=n).astype(np.int64)
        else:
            score = np.zeros(n, np.int64)
        return pa.table({id_col: batch[id_col],
                         "lm_score": pa.array(score)})

    return docs.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pyarrow", zero_copy_batch=True)


def rule_violations(ds, rules):
    """Data-quality gate: ``rules`` maps rule name → a vectorized
    predicate ``pa.Table -> BooleanArray`` that is TRUE for VIOLATING
    rows.  Each block reduces to one O(#rules)-row partial (rule, n);
    a tiny groupby-sum finishes — constraint checking at corpus scale
    costs one streaming pass and a fixed-size exchange.  Every rule
    appears in the output even at zero violations."""
    names = sorted(rules)

    def _partial(batch: pa.Table) -> pa.Table:
        ns = []
        for name in names:
            mask = rules[name](batch)
            if isinstance(mask, pa.ChunkedArray):
                mask = mask.combine_chunks()
            ns.append(int(pc.sum(pc.fill_null(mask, False)).as_py() or 0))
        return pa.table({"rule": pa.array(names, pa.string()),
                         "n_violations": pa.array(ns, pa.int64())})

    partial = ds.map_batches(_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
    return (partial.groupby("rule").sum("n_violations")
            .rename_columns({"sum(n_violations)": "n_violations"}))


def table_profile(ds, columns):
    """Per-column corpus profile: row count, null count and exact distinct
    count for the named columns — the schema-health report an ingestion
    pipeline emits per partition.  Each block collapses to its distinct
    (column, value-as-string) pairs plus null/row partials; the global
    distinct finishes in one groupby bounded by Σ per-column
    cardinalities, never rows.  (Cast-to-string keys the distinct without
    per-type branches; exact for string/int columns — the profile
    columns.)"""
    def _partial(batch: pa.Table) -> pa.Table:
        names, kinds, vals = [], [], []
        for c in columns:
            col = batch[c]
            names.append(c)
            kinds.append("rows")
            vals.append(str(len(batch)))
            names.append(c)
            kinds.append("nulls")
            vals.append(str(int(pc.sum(
                pc.is_null(col).cast(pa.int64())).as_py() or 0)))
            u = pc.unique(pc.drop_null(col.combine_chunks()
                          if isinstance(col, pa.ChunkedArray) else col)
                          .cast(pa.string()))
            for v in u.to_pylist():
                names.append(c)
                kinds.append("val")
                vals.append(v)
        return pa.table({"column": pa.array(names, pa.string()),
                         "kind": pa.array(kinds, pa.string()),
                         "v": pa.array(vals, pa.string())})

    part = ds.select_columns(list(columns)).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)

    def _roll(group: pa.Table) -> pa.Table:
        kinds = group["kind"].to_pylist()
        vs = group["v"].to_pylist()
        n_rows = sum(int(v) for k, v in zip(kinds, vs) if k == "rows")
        n_null = sum(int(v) for k, v in zip(kinds, vs) if k == "nulls")
        nd = len({v for k, v in zip(kinds, vs) if k == "val"})
        return pa.table({
            "column": group["column"][:1],
            "n_rows": pa.array([n_rows], pa.int64()),
            "n_null": pa.array([n_null], pa.int64()),
            "n_distinct": pa.array([nd], pa.int64())})

    return hash_group_apply(
        part, ["column"], _roll, n_parts=min(8, max(1, len(columns))),
        plasma_schema=pa.schema([("column", pa.string()),
                                 ("n_rows", pa.int64()),
                                 ("n_null", pa.int64()),
                                 ("n_distinct", pa.int64())]))


def source_token_divergence(docs, text_col: str = "text",
                            source_col: str = "source",
                            n_parts: int = 32):
    """Per-source token-distribution shift vs the whole corpus — the
    mixing diagnostic that flags a feed drifting away from the corpus
    distribution.  Integer KL-proxy: for each (source, token),
    ``n_s · (bitlen(n_s + 1) − bitlen(n + 1))`` summed per source (the
    DSIR/charlm bit-length log, so SQL replays it exactly; more negative
    = the source's tokens are rarer corpus-wide).

    Shape: per-block (source, token, n) combine → ONE token co-partition
    computes the global count in-group and emits per-source contribution
    partials → final tiny source groupby."""
    from trustfuse_ray.stages.common import hash_group_apply

    def _partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch[text_col].cast(pa.string())),
            _SPLIT_RX)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        srcs = batch[source_col].to_pylist()
        flat_src = pa.array(np.repeat(np.asarray(srcs, dtype=object),
                                      lens.astype(np.int64)))
        t = pa.table({"source": flat_src, "token": toks.flatten()})
        g = t.group_by(["source", "token"]).aggregate([("token", "count")])
        return g.rename_columns(["source", "token", "n"])

    def _contrib(group: pa.Table) -> pa.Table:
        ns = np.asarray(group["n"], dtype=np.int64)
        # finish the global combine for this token, then score per source
        srcs = group["source"].to_pylist()
        agg: dict[str, int] = {}
        for s, n in zip(srcs, ns):
            agg[s] = agg.get(s, 0) + int(n)
        glob = sum(agg.values())
        bg = (glob + 1).bit_length()
        out_s = sorted(agg)
        contrib = [agg[s] * ((agg[s] + 1).bit_length() - bg)
                   for s in out_s]
        return pa.table({"source": pa.array(out_s, pa.string()),
                         "c": pa.array(contrib, pa.int64())})

    partial = docs.select_columns([source_col, text_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
    per_tok = hash_group_apply(
        partial, ["token"], _contrib, n_parts=n_parts,
        plasma_schema=pa.schema([("source", pa.string()),
                                 ("c", pa.int64())]))
    return (per_tok.groupby("source").sum("c")
            .rename_columns({"sum(c)": "div_fx"}))


def heavy_hitter_postings(docs, k: int = 20, text_col: str = "text",
                          id_col: str = "doc_id"):
    """Inverted-index postings for the corpus's top-``k`` tokens: one
    (token, doc_id) row per distinct containment — the retrieval-side
    data product (bounded: heavy hitters only, so the posting table is
    k × df rows, never vocabulary-sized).

    Shape: the top-k vocabulary comes from :func:`top_tokens` (map-side
    combine) and broadcasts via ``ray.put``; the posting pass is one
    streaming filter per block with a per-block distinct."""
    import ray

    vocab = [r["token"] for r in top_tokens(docs, k=k,
                                            text_col=text_col).take_all()]
    vref = ray.put(set(vocab))

    def _post(batch: pa.Table) -> pa.Table:
        vs = ray.get(vref)
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch[text_col].cast(pa.string())),
            _SPLIT_RX)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = np.repeat(np.asarray(batch[id_col], dtype=np.int64),
                        lens.astype(np.int64))
        flat = toks.flatten()
        # vocab filter + (token, doc) dedup fully in Arrow/numpy: is_in
        # mask, dictionary-encode survivors, unique on the packed key
        keep = pc.is_in(flat, value_set=pa.array(sorted(vs))).to_numpy(
            zero_copy_only=False)
        enc = pc.dictionary_encode(flat.filter(pa.array(keep)))
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        d = ids[keep]
        nv = max(len(enc.dictionary), 1)
        uk = np.unique(d * nv + code)
        tok_arr = enc.dictionary.take(pa.array(uk % nv))
        out = pa.table({"token": tok_arr,
                        id_col: pa.array(uk // nv, pa.int64())})
        order = pc.sort_indices(out, sort_keys=[("token", "ascending"),
                                                (id_col, "ascending")])
        return out.take(order)

    posts = docs.select_columns([id_col, text_col]).map_batches(
        _post, batch_format="pyarrow", zero_copy_batch=True)
    # finish the global distinct (a doc can span blocks only if its id
    # repeats; also dedups retry artifacts)
    return (posts.groupby(["token", id_col]).count()
            .drop_columns(["count()"]))


def winsorized_stats(ds, key_col: str = "event_type",
                     value_col: str = "value",
                     q_lo: float = 0.01, q_hi: float = 0.99,
                     fx_scale: int = 1000, n_parts: int = 16):
    """Outlier-robust per-key aggregation: clip values at the key's
    discrete [q_lo, q_hi] quantiles (the value at ``floor(q·(n−1))`` of
    the sorted group — the same rule as :func:`value_quantiles`, so both
    sides agree bit-for-bit), then report clip counts and the
    fixed-point sum ``Σ floor(clipped · fx_scale)`` (integer, so the
    groupby-sum is order-free and SQL-exact).

    Shape: quantile cut + clip + sum all happen inside ONE key
    co-partition (group = locality unit, as value_quantiles documents).
    Returns (key, n, n_clipped_low, n_clipped_high, sum_clipped_fx)."""
    def _wins(group: pa.Table) -> pa.Table:
        vals = np.asarray(group[value_col], dtype=np.float64)
        vs = np.sort(vals)
        n = len(vs)
        lo = vs[int(np.floor(q_lo * (n - 1)))]
        hi = vs[int(np.floor(q_hi * (n - 1)))]
        clipped = np.clip(vals, lo, hi)
        return pa.table({
            key_col: group[key_col][:1],
            "n": pa.array([n], pa.int64()),
            "n_clipped_low": pa.array([int((vals < lo).sum())], pa.int64()),
            "n_clipped_high": pa.array([int((vals > hi).sum())],
                                       pa.int64()),
            "sum_clipped_fx": pa.array(
                [int(np.floor(clipped * fx_scale).astype(np.int64).sum())],
                pa.int64())})

    return hash_group_apply(
        ds.select_columns([key_col, value_col]), [key_col], _wins,
        n_parts=n_parts,
        plasma_schema=pa.schema([(key_col, pa.string()),
                                 ("n", pa.int64()),
                                 ("n_clipped_low", pa.int64()),
                                 ("n_clipped_high", pa.int64()),
                                 ("sum_clipped_fx", pa.int64())]))


_BPE_X, _BPE_Y = "\x1e", "\x1f"  # symbol-boundary sentinels (never in text)


def _bpe_apply(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the learned merge rules in order to one word; merge
    application is left-to-right non-overlapping — expressed as a plain
    string replace over a two-char-boundary representation so DuckDB
    ``replace`` reproduces it byte-for-byte (the pattern consumes the
    left half of the following boundary, keeping back-to-back merges
    adjacent)."""
    X, Y = _BPE_X, _BPE_Y
    rep = (X + Y) + (X + Y).join(word) + (X + Y)
    for l, r in merges:
        rep = rep.replace(Y + l + X + Y + r + X, Y + l + r + X)
    return [s for s in rep.split(X + Y) if s]


def bpe_merges(docs, n_merges: int = 4, text_col: str = "text"):
    """BPE vocabulary induction, full trainer loop (Sennrich et al. 2016):
    ``n_merges`` rounds of (global adjacent-pair counts over the word
    vocabulary → argmax pair, ties to the lexicographically smallest →
    merge everywhere).  Returns one row per learned rule
    (merge_idx, l, r, n) where n is the pair's occurrence-weighted count
    the round it won.

    Scale shape: the corpus is read ONCE into a distinct-word count table
    (exchange bounded by the word vocabulary — the classic trainer trick);
    each round is one streaming pass over that vocab (the per-word Python
    walk is vocab-bounded, never corpus-bounded), a tiny (l, r) pair
    groupby, and a per-block argmax reduce, so the driver only ever sees
    ≤ #blocks candidate rows per round.  The merge list itself is O(n_merges)
    and ships via closure capture."""
    import re

    import ray.data as rd

    def _word_counts(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(
                pc.fill_null(batch[text_col].cast(pa.string()), "")),
            r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        flat = flat.filter(pc.not_equal(flat, ""))
        if len(flat) == 0:
            return pa.table({"word": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = np.bincount(idx, minlength=len(enc.dictionary))
        return pa.table({"word": enc.dictionary,
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    vocab = docs.select_columns([text_col]).map_batches(
        _word_counts, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("word").sum("n").rename_columns({"sum(n)": "n"}).materialize()

    merges: list[tuple[str, str]] = []
    won: list[int] = []
    for _round in range(n_merges):
        cur = list(merges)

        def _pair_partial(batch: pa.Table) -> pa.Table:
            out: dict[tuple[str, str], int] = {}
            for word, n in zip(batch["word"].to_pylist(),
                               batch["n"].to_pylist()):
                syms = _bpe_apply(word, cur)
                for a, b in zip(syms, syms[1:]):
                    out[(a, b)] = out.get((a, b), 0) + int(n)
            if not out:
                return pa.table({"l": pa.array([], pa.string()),
                                 "r": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            ks = list(out)
            return pa.table({
                "l": pa.array([k[0] for k in ks], pa.string()),
                "r": pa.array([k[1] for k in ks], pa.string()),
                "n": pa.array([out[k] for k in ks], pa.int64())})

        def _block_best(batch: pa.Table) -> pa.Table:
            if not len(batch):
                return batch
            best = None
            for n, l, r in zip(batch["n"].to_pylist(),
                               batch["l"].to_pylist(),
                               batch["r"].to_pylist()):
                if (best is None or n > best[0]
                        or (n == best[0] and (l, r) < (best[1], best[2]))):
                    best = (n, l, r)
            # max count, ties to the lexicographically SMALLEST (l, r) —
            # the SQL ``ORDER BY n DESC, l, r LIMIT 1`` rule exactly
            return pa.table({"l": pa.array([best[1]], pa.string()),
                             "r": pa.array([best[2]], pa.string()),
                             "n": pa.array([best[0]], pa.int64())})

        cands = (vocab.map_batches(_pair_partial, batch_format="pyarrow",
                                   zero_copy_batch=True)
                 .groupby(["l", "r"]).sum("n")
                 .rename_columns({"sum(n)": "n"})
                 .map_batches(_block_best, batch_format="pyarrow")
                 .take_all())
        if not cands:
            break
        top = None
        for c in cands:
            if (top is None or c["n"] > top["n"]
                    or (c["n"] == top["n"]
                        and (c["l"], c["r"]) < (top["l"], top["r"]))):
                top = c
        merges.append((top["l"], top["r"]))
        won.append(int(top["n"]))

    return rd.from_arrow(pa.table({
        "merge_idx": pa.array(range(len(merges)), pa.int64()),
        "l": pa.array([m[0] for m in merges], pa.string()),
        "r": pa.array([m[1] for m in merges], pa.string()),
        "n": pa.array(won, pa.int64())}))


def bpe_encode(docs, n_merges: int = 4, text_col: str = "text",
               id_col: str = "doc_id"):
    """Apply a learned BPE merge list to the corpus: per document, the
    subword token count under the trained vocabulary (the padding/packing
    statistic a tokenizer change shifts).  Trains via :func:`bpe_merges`
    (tiny result), broadcasts the merge list by closure, then ONE
    streaming pass over the corpus — no exchange at all on the encode
    side.  Returns (doc_id, n_words, n_tokens)."""
    import re

    merges = [(r["l"], r["r"])
              for r in bpe_merges(docs, n_merges=n_merges,
                                  text_col=text_col).take_all()]

    def _encode(batch: pa.Table) -> pa.Table:
        ids, n_words, n_tokens = [], [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            words = [w for w in re.split(r"\s+", (t or "").strip()) if w]
            ids.append(did)
            n_words.append(len(words))
            n_tokens.append(sum(len(_bpe_apply(w, merges)) for w in words))
        return pa.table({
            id_col: pa.array(ids, batch[id_col].type),
            "n_words": pa.array(n_words, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64())})

    return docs.select_columns([id_col, text_col]).map_batches(
        _encode, batch_format="pyarrow", zero_copy_batch=True)


def histogram_quantiles(ds, key_col: str = "event_type",
                        value_col: str = "value", lo: float = 0.0,
                        hi: float = 1000.0, bins: int = 20,
                        qs: tuple[float, ...] = (0.5, 0.9, 0.99)):
    """Approximate per-key quantiles from the mergeable fixed-width
    histogram — the unbounded-key-space path where
    :func:`value_quantiles`'s one-task-per-key exact sort does not hold:
    per-block partials are O(keys × bins) regardless of rows, and each
    quantile reports its bin's UPPER EDGE (deterministic integer bin
    arithmetic, so SQL replays it bit-for-bit).  Returns
    (key, n, p50..p99 upper edges as float64)."""
    width = (hi - lo) / bins
    hist = value_histogram(ds, key_col=key_col, value_col=value_col,
                           lo=lo, hi=hi, bins=bins)

    def _quant(group: pa.Table) -> pa.Table:
        b = np.asarray(group["bin"], dtype=np.int64)
        n = np.asarray(group["n"], dtype=np.int64)
        order = np.argsort(b)
        b, n = b[order], n[order]
        total = int(n.sum())
        cum = np.cumsum(n)
        row = {key_col: group[key_col][:1],
               "n": pa.array([total], pa.int64())}
        for q in qs:
            rank = int(np.floor(q * (total - 1)))
            idx = int(np.searchsorted(cum, rank + 1))
            edge = lo + (float(b[idx]) + 1.0) * width
            row[f"p{int(q * 100)}"] = pa.array([edge], pa.float64())
        return pa.table(row)

    out_schema = pa.schema(
        [(key_col, pa.string()), ("n", pa.int64())]
        + [(f"p{int(q * 100)}", pa.float64()) for q in qs])
    return hash_group_apply(hist, [key_col], _quant, n_parts=8,
                            plasma_schema=out_schema)


def oov_rates(docs, k: int = 64, text_col: str = "text",
              id_col: str = "doc_id"):
    """Out-of-vocabulary audit: per document, how many whitespace tokens
    fall outside the corpus top-``k`` vocabulary — the coverage statistic
    a vocab-pruning decision needs.  The top-k vocab is a tiny
    driver-collected list (broadcast by closure); the scan is one
    streaming pass.  Returns (doc_id, n_tokens, n_oov)."""
    import re

    vocab = {r["token"] for r in top_tokens(docs, k=k,
                                            text_col=text_col).take_all()}

    def _scan(batch: pa.Table) -> pa.Table:
        ids, nt, no = [], [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            toks = [w for w in re.split(r"\s+", (t or "").strip()) if w]
            ids.append(did)
            nt.append(len(toks))
            no.append(sum(1 for w in toks if w not in vocab))
        return pa.table({
            id_col: pa.array(ids, batch[id_col].type),
            "n_tokens": pa.array(nt, pa.int64()),
            "n_oov": pa.array(no, pa.int64())})

    return docs.select_columns([id_col, text_col]).map_batches(
        _scan, batch_format="pyarrow", zero_copy_batch=True)


def dataset_card(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset-card statistics: the one-row corpus summary a release
    ships — doc count, total whitespace words, distinct sources and
    language labels, and exact-duplicate docs (md5 text fingerprints).
    All integers; every number replays in SQL.

    Shape: counts and word sums reduce from tiny per-block partials;
    every DISTINCT count is a distributed map-side-dedup → groupby →
    count-rows pipeline (the fingerprint universe never lands on the
    driver — only six scalars do)."""
    import hashlib
    import re

    def _partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        words = sum(len([w for w in re.split(r"\s+", (t or "").strip())
                         if w]) for t in texts)
        return pa.table({
            "n_docs": pa.array([len(texts)], pa.int64()),
            "n_words": pa.array([words], pa.int64())})

    def _distinct_count(col_fn) -> int:
        def _dd(batch: pa.Table) -> pa.Table:
            t = col_fn(batch)
            return t.group_by(t.column_names).aggregate([])

        return (docs.map_batches(_dd, batch_format="pyarrow",
                                 zero_copy_batch=True)
                .groupby("k").count().count())

    def _fp(batch: pa.Table) -> pa.Table:
        return pa.table({"k": pa.array(
            [hashlib.md5((t or "").encode()).hexdigest()
             for t in batch[text_col].to_pylist()], pa.string())})

    parts = docs.select_columns([text_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    n_docs = sum(p["n_docs"] for p in parts)
    n_words = sum(p["n_words"] for p in parts)
    n_texts = _distinct_count(_fp)
    n_sources = _distinct_count(lambda b: pa.table(
        {"k": b["source"].cast(pa.string())}))
    n_langs = _distinct_count(lambda b: pa.table(
        {"k": b["lang"].cast(pa.string())}))
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "n_docs": pa.array([n_docs], pa.int64()),
        "n_words": pa.array([n_words], pa.int64()),
        "n_sources": pa.array([n_sources], pa.int64()),
        "n_langs": pa.array([n_langs], pa.int64()),
        "n_distinct_texts": pa.array([n_texts], pa.int64()),
        "n_exact_dups": pa.array([n_docs - n_texts], pa.int64())}))


def bm25_topk(docs, terms: tuple[str, ...], k: int = 20,
              text_col: str = "text", id_col: str = "doc_id"):
    """BM25 ranking (exact-integer variant): top-``k`` docs for a fixed
    term set under the classic k1=1.2 / b=0.75 weighting, evaluated in
    pure integer arithmetic so DuckDB replays every score bit-for-bit —
    idf ≈ bit_length(N // df) (integer log2) and the tf saturation
    term becomes, after clearing the rational constants,

        contrib = idf_bits · (22·tf·avglen·2^20)
                  // (10·avglen·tf + 3·avglen + 9·len)

    with ``avglen = total_words // N`` (floor).  The standard lexical
    ranker next to the dense/late-interaction retrievers.

    Shape: pass 1 computes per-doc (len, tf per term) partials and the
    tiny global (N, total_words, df) aggregates; pass 2 scores
    streaming with the broadcast scalars; the top-k is a distributed
    sort+limit."""
    terms = tuple(terms)

    def _stats(batch: pa.Table) -> pa.Table:
        # fully vectorized: Arrow split → flat token array + doc index via
        # np.repeat; per-doc lengths and per-term tfs are bincounts over
        # boolean masks (same kernel shape as _uni_partial above)
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], "")),
            _SPLIT_RX)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        nlist = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        nlist = np.nan_to_num(nlist.astype(np.float64)).astype(np.int64)
        docix = np.repeat(np.arange(len(toks), dtype=np.int64), nlist)
        flat = toks.flatten()
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        lens = np.bincount(docix[nonempty], minlength=len(toks))
        cols = {id_col: batch[id_col],
                "len": pa.array(lens.astype(np.int64), pa.int64())}
        for j, t in enumerate(terms):
            m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            cols[f"tf{j}"] = pa.array(
                np.bincount(docix[m], minlength=len(toks)).astype(np.int64),
                pa.int64())
        return pa.table(cols)

    stats = docs.select_columns([id_col, text_col]).map_batches(
        _stats, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def _agg(batch: pa.Table) -> pa.Table:
        row = {"n": pa.array([len(batch)], pa.int64()),
               "words": pa.array([int(np.asarray(
                   batch["len"], dtype=np.int64).sum())], pa.int64())}
        for j in range(len(terms)):
            row[f"df{j}"] = pa.array([int((np.asarray(
                batch[f"tf{j}"], dtype=np.int64) > 0).sum())], pa.int64())
        return pa.table(row)

    parts = stats.map_batches(_agg, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    n_docs = sum(p["n"] for p in parts)
    avglen = sum(p["words"] for p in parts) // max(n_docs, 1)
    dfs = [sum(p[f"df{j}"] for p in parts) for j in range(len(terms))]
    idf_bits = [max(0, (n_docs // df)).bit_length() if df else 0
                for df in dfs]

    SCALE = 1 << 20

    def _score(batch: pa.Table) -> pa.Table:
        ln = np.asarray(batch["len"], dtype=np.int64)
        score = np.zeros(len(batch), dtype=np.int64)
        for j in range(len(terms)):
            tf = np.asarray(batch[f"tf{j}"], dtype=np.int64)
            num = idf_bits[j] * 22 * tf * avglen * SCALE
            den = 10 * avglen * tf + 3 * avglen + 9 * ln
            score += np.where(den > 0, num // np.maximum(den, 1), 0)
        return pa.table({id_col: batch[id_col],
                         "score_fx": pa.array(score, pa.int64())})

    scored = stats.map_batches(_score, batch_format="pyarrow",
                               zero_copy_batch=True)
    return (scored.sort(["score_fx", id_col], descending=[True, False])
            .limit(k))


def lang_distribution(docs, text_col: str = "text"):
    """Corpus language mix: per labelled language, document count and
    whitespace-token total — the distribution slice of the dataset card.
    One streaming pass of per-block (lang, docs, words) partials; the
    rollup groupby is bounded by the language label set."""

    def _partial(batch: pa.Table) -> pa.Table:
        langs = pc.fill_null(batch["lang"].cast(pa.string()), "")
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], "")),
            _SPLIT_RX)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        nlist = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        nlist = np.nan_to_num(nlist.astype(np.float64)).astype(np.int64)
        docix = np.repeat(np.arange(len(toks), dtype=np.int64), nlist)
        nonempty = pc.not_equal(
            toks.flatten(), "").to_numpy(zero_copy_only=False)
        words = np.bincount(docix[nonempty], minlength=len(toks))
        t = pa.table({"lang": langs,
                      "n_docs": pa.array(np.ones(len(batch), np.int64)),
                      "n_words": pa.array(words.astype(np.int64))})
        return (t.group_by(["lang"])
                .aggregate([("n_docs", "sum"), ("n_words", "sum")])
                .rename_columns(["lang", "n_docs", "n_words"]))

    return (docs.select_columns(["lang", text_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang").sum(["n_docs", "n_words"])
        .rename_columns({"sum(n_docs)": "n_docs",
                         "sum(n_words)": "n_words"}))


def k_anonymity_audit(docs, k: int = 5, cols: tuple = ("lang", "source"),
                      len_col: str = "n_chars", len_bucket: int = 100):
    """Privacy audit over quasi-identifiers: group documents by the
    quasi-identifier tuple (the categorical ``cols`` plus the length
    bucket ``n_chars // len_bucket``) and report each group's size and
    whether it violates k-anonymity (``group_n < k``) — the re-identification
    risk report a release pipeline runs before publishing metadata.

    Scale shape: map-side pre-counted quasi-tuples per block, then one
    groupby bounded by the quasi-identifier cardinality — document text
    never enters the pipeline."""
    def _partial(batch: pa.Table) -> pa.Table:
        data = {c: batch[c].cast(pa.string()) for c in cols}
        data["len_bucket"] = pa.array(
            np.asarray(batch[len_col], dtype=np.int64) // len_bucket,
            pa.int64())
        data["n"] = pa.array(np.ones(len(batch), np.int64))
        tbl = pa.table(data)
        keys = list(cols) + ["len_bucket"]
        return (pa.TableGroupBy(tbl, keys, use_threads=False)
                .aggregate([("n", "sum")])
                .rename_columns(keys + ["n"]))

    keys = list(cols) + ["len_bucket"]
    agg = (docs.select_columns(list(cols) + [len_col])
           .map_batches(_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby(keys).sum("n").rename_columns({"sum(n)": "group_n"}))

    def _risk(batch: pa.Table) -> pa.Table:
        n = np.asarray(batch["group_n"], dtype=np.int64)
        return batch.append_column(
            "at_risk", pa.array(n < k))

    return agg.map_batches(_risk, batch_format="pyarrow",
                           zero_copy_batch=True)


def l_diversity_audit(docs, l: int = 2, qi_cols: tuple = ("source",),
                      sensitive: str = "lang", len_col: str = "n_chars",
                      len_bucket: int = 100):
    """Privacy audit complementing :func:`k_anonymity_audit`: for each
    quasi-identifier group (the categorical ``qi_cols`` plus the length
    bucket) count DISTINCT values of the ``sensitive`` attribute — a
    group where everyone shares one sensitive value leaks it even when
    the group itself is large (l-diversity, Machanavajjhala et al.).

    Scale shape: map-side pre-count of (QI, sensitive) tuples, one
    groupby bounded by QI × sensitive cardinality, then an arrow-side
    rollup to one row per QI group — no text, no row-level shuffle."""
    keys = list(qi_cols) + ["len_bucket"]

    def _partial(batch: pa.Table) -> pa.Table:
        data = {c: batch[c].cast(pa.string()) for c in qi_cols}
        data["len_bucket"] = pa.array(
            np.asarray(batch[len_col], dtype=np.int64) // len_bucket,
            pa.int64())
        data[sensitive] = batch[sensitive].cast(pa.string())
        data["n"] = pa.array(np.ones(len(batch), np.int64))
        tbl = pa.table(data)
        return (pa.TableGroupBy(tbl, keys + [sensitive],
                                use_threads=False)
                .aggregate([("n", "sum")])
                .rename_columns(keys + [sensitive, "n"]))

    tuples = (docs.select_columns(list(qi_cols) + [len_col, sensitive])
              .map_batches(_partial, batch_format="pyarrow",
                           zero_copy_batch=True)
              .groupby(keys + [sensitive]).sum("n"))

    def _roll(batch: pa.Table) -> pa.Table:
        t = pa.table({**{c: batch[c] for c in keys},
                      "group_n": batch["sum(n)"].cast(pa.int64()),
                      "l_distinct": pa.array(
                          np.ones(len(batch), np.int64))})
        return (pa.TableGroupBy(t, keys, use_threads=False)
                .aggregate([("group_n", "sum"), ("l_distinct", "sum")])
                .rename_columns(keys + ["group_n", "l_distinct"]))

    agg = (tuples.map_batches(_roll, batch_format="pyarrow",
                              zero_copy_batch=True)
           .groupby(keys).sum(["group_n", "l_distinct"])
           .rename_columns({"sum(group_n)": "group_n",
                            "sum(l_distinct)": "l_distinct"}))

    def _risk(batch: pa.Table) -> pa.Table:
        d = np.asarray(batch["l_distinct"], dtype=np.int64)
        return batch.append_column("at_risk", pa.array(d < l))

    return agg.map_batches(_risk, batch_format="pyarrow",
                           zero_copy_batch=True)


# observed Benford first-digit expectation, permille (floor(log10(1+1/d)
# * 1000)) — shared literal constants with the SQL oracle so the
# comparison is exact integer math on both sides
BENFORD_PERMILLE = (301, 176, 124, 96, 79, 66, 57, 51, 45)


def benford_audit(orders, amount_col: str = "o_totalprice",
                  group_col: str = "o_orderpriority"):
    """Fraud/quality screen: first-significant-digit distribution of a
    monetary column per group vs the Benford expectation, as exact
    permille integers.  Natural spending data tracks Benford closely;
    synthetic or manipulated partitions drift.

    Scale shape: digit extraction is one vectorized string slice per
    block; the groupby is bounded by groups × 9 digits."""
    def _partial(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[amount_col], dtype=np.float64) * 100.0
        cents = np.where(v >= 0, np.floor(v + 0.5),
                         -np.floor(-v + 0.5)).astype(np.int64)
        digit = pc.utf8_slice_codeunits(
            pa.array(np.abs(cents).astype(str)), 0, 1)
        t = pa.table({
            "grp": batch[group_col].cast(pa.string()),
            "digit": pc.cast(digit, pa.int64()),
            "n": pa.array(np.ones(len(batch), np.int64)),
        }).filter(pc.greater(pc.field("digit"), 0))
        return (pa.TableGroupBy(t, ["grp", "digit"], use_threads=False)
                .aggregate([("n", "sum")])
                .rename_columns(["grp", "digit", "n"]))

    agg = (orders.select_columns([group_col, amount_col])
           .map_batches(_partial, batch_format="pyarrow",
                        zero_copy_batch=True)
           .groupby(["grp", "digit"]).sum("n")
           .rename_columns({"sum(n)": "n"}))

    def _tot(batch: pa.Table) -> pa.Table:
        t = pa.table({"grp": batch["grp"],
                      "total": batch["n"].cast(pa.int64())})
        return (pa.TableGroupBy(t, "grp", use_threads=False)
                .aggregate([("total", "sum")])
                .rename_columns(["grp", "total"]))

    totals = (agg.map_batches(_tot, batch_format="pyarrow",
                              zero_copy_batch=True)
              .groupby("grp").sum("total")
              .rename_columns({"sum(total)": "total"}))
    tot_map = {r["grp"]: r["total"] for r in totals.take_all()}

    def _final(batch: pa.Table) -> pa.Table:
        g = batch["grp"].to_pylist()
        d = np.asarray(batch["digit"], dtype=np.int64)
        n = np.asarray(batch["n"], dtype=np.int64)
        tot = np.array([tot_map[x] for x in g], dtype=np.int64)
        obs = n * 1000 // np.maximum(tot, 1)
        exp = np.array(BENFORD_PERMILLE, dtype=np.int64)[d - 1]
        return pa.table({
            "grp": batch["grp"], "digit": batch["digit"],
            "n": batch["n"],
            "obs_permille": pa.array(obs, pa.int64()),
            "benford_permille": pa.array(exp, pa.int64()),
            "dev_permille": pa.array(np.abs(obs - exp), pa.int64()),
        })

    return agg.map_batches(_final, batch_format="pyarrow",
                           zero_copy_batch=True)


def gini_by_group(ds, group_col: str, id_col: str, amount_col: str,
                  n_parts: int = 32):
    """Per-group Gini coefficient (exact permille) of an integer amount
    per member — the inequality audit (spend concentration per nation,
    token share per source, ...).  Uses the sorted-rank identity
    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) with a deterministic total
    order (amount, then member id), all int64.

    Scale shape: one hash co-partition on the group key; each group
    sorts only its own members (numpy argsort) — no global sort, no
    driver materialization."""
    from trustfuse_ray.stages.common import hash_group_apply

    out_schema = pa.schema([(group_col, pa.string()),
                            ("n_members", pa.int64()),
                            ("total", pa.int64()),
                            ("gini_permille", pa.int64())])

    def _gini(group: pa.Table) -> pa.Table:
        x = np.asarray(group[amount_col], dtype=np.int64)
        ids = np.asarray(group[id_col], dtype=np.int64)
        order = np.lexsort((ids, x))
        xs = x[order]
        n = len(xs)
        s = int(xs.sum())
        if s <= 0:
            g = 0
        else:
            i = np.arange(1, n + 1, dtype=np.int64)
            num = 2 * int((i * xs).sum()) - (n + 1) * s
            g = num * 1000 // (n * s)
        return pa.table({group_col: group[group_col][:1],
                         "n_members": pa.array([n], pa.int64()),
                         "total": pa.array([s], pa.int64()),
                         "gini_permille": pa.array([g], pa.int64())})

    return hash_group_apply(ds, [group_col], _gini, n_parts=n_parts,
                            plasma_schema=out_schema)


def passage_best_windows(docs, terms: tuple, window: int = 32,
                         stride: int = 16, k: int = 10,
                         id_col: str = "doc_id", text_col: str = "text"):
    """Passage ranking: per document, the best ``window``-token span
    (stride ``stride``) by query-term hit count; globally the top-``k``
    documents by (hits desc, doc_id) — the passage-selection step
    between retrieval and reading.

    Shape: one streaming pass — split, term-hit mask, cumulative-sum
    window scores via run-index arithmetic (no per-doc Python), per-doc
    argmax in-block; the global top-k is a sort+limit on the one-row-
    per-matching-doc table."""
    terms = list(terms)

    def _best(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], "")),
            r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = toks.flatten()
        hit = pc.is_in(flat, value_set=pa.array(terms)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cs = np.concatenate(([0], np.cumsum(hit)))
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        ends = starts + lens
        nw = (np.maximum(lens - window, 0) + stride - 1) // stride + 1
        doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), nw)
        woff = np.arange(int(nw.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(nw)))[:-1], nw)
        ws = starts[doc_of] + woff * stride
        we = np.minimum(ws + window, ends[doc_of])
        hits = cs[we] - cs[ws]
        # per-doc argmax by (hits desc, win_idx asc): windows are emitted
        # in ascending win_idx per doc, so a stable max-scan suffices
        order = np.lexsort((woff, -hits, doc_of))
        head = np.ones(len(order), dtype=bool)
        head[1:] = doc_of[order][1:] != doc_of[order][:-1]
        sel = order[head]
        ids = np.asarray(batch[id_col], dtype=np.int64)
        keep = hits[sel] > 0
        return pa.table({
            "doc_id": pa.array(ids[doc_of[sel][keep]], pa.int64()),
            "win_idx": pa.array(woff[sel][keep], pa.int64()),
            "hits": pa.array(hits[sel][keep], pa.int64())})

    best = docs.select_columns([id_col, text_col]).map_batches(
        _best, batch_format="pyarrow", zero_copy_batch=True)
    top = best.sort(["hits", "doc_id"],
                    descending=[True, False]).limit(k).take_all()
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in top], pa.int64()),
        "win_idx": pa.array([r["win_idx"] for r in top], pa.int64()),
        "hits": pa.array([r["hits"] for r in top], pa.int64()),
        "rank": pa.array(range(1, len(top) + 1), pa.int64())})


def trending_tokens(transcripts, k: int = 5,
                    day_us: int = 86_400_000_000,
                    text_col: str = "text", ts_col: str = "ts",
                    n_parts: int = 16):
    """Trending terms per day: top-``k`` whitespace tokens by count for
    every UTC day of the transcript stream (empty tokens dropped,
    ties → token asc) — the streaming-analytics rollup behind topic
    monitoring.

    Shape: per-block (day, token) bincount partials (dictionary-encode,
    one row per distinct pair per block), one bounded exchange, per-day
    top-k in a day co-partition."""
    from trustfuse_ray.stages.common import hash_group_apply

    def _pairs(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], "")),
            r"\s+")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(
            zero_copy_only=False).astype(np.int64)
        day = (batch[ts_col].cast(pa.int64()).to_numpy(
            zero_copy_only=False) // day_us)
        flat = toks.flatten()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        enc = pc.dictionary_encode(flat)
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        drep = np.repeat(day, lens)
        nv = len(enc.dictionary)
        dmin = drep.min() if len(drep) else 0
        key = (drep - dmin) * nv + code
        key = key[keep]
        uk, cnt = np.unique(key, return_counts=True)
        return pa.table({
            "day": pa.array(uk // nv + dmin, pa.int64()),
            "token": enc.dictionary.take(pa.array(uk % nv)),
            "n": pa.array(cnt.astype(np.int64), pa.int64())})

    agg = (transcripts.select_columns([ts_col, text_col]).map_batches(
        _pairs, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["day", "token"]).sum("n")
        .rename_columns({"sum(n)": "n"}))

    out_schema = pa.schema([("day", pa.int64()), ("token", pa.string()),
                            ("n", pa.int64())])

    def _topk(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("n", "descending"),
                                                  ("token", "ascending")])
        return group.take(order[:k]).select(["day", "token", "n"])

    return hash_group_apply(agg, ["day"], _topk, n_parts=n_parts,
                            plasma_schema=out_schema)


def vocab_richness(docs, text_col: str = "text",
                   key_col: str = "source"):
    """Per-source vocabulary richness: total whitespace tokens, distinct
    vocabulary size, and the integer-permille type-token ratio.

    100-TB shape: tokens are reduced to per-block (source, token, n)
    partials (dictionary-encode + bincount — no Python token loop), so the
    one exchange carries the block-vocabulary-bounded distinct pairs, never
    the corpus; the second rollup ships only per-block (source, vocab_n,
    tok_n) partials."""
    import functools

    agg = (docs.select_columns([key_col, text_col]).map_batches(
        functools.partial(_key_token_partial, text_col=text_col,
                          key_col=key_col),
        batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key_col, "token"]).sum("n")
        .rename_columns({"sum(n)": "n"}))

    def _per_key(batch: pa.Table) -> pa.Table:
        t = pa.table({key_col: batch[key_col],
                      "vocab_part": pa.array(
                          np.ones(len(batch), np.int64)),
                      "tok_part": batch["n"]})
        return (pa.TableGroupBy(t, key_col, use_threads=False)
                .aggregate([("vocab_part", "sum"), ("tok_part", "sum")])
                .rename_columns([key_col, "vocab_part", "tok_part"]))

    rolled = (agg.map_batches(_per_key, batch_format="pyarrow",
                              zero_copy_batch=True)
              .groupby(key_col)
              .sum(["vocab_part", "tok_part"]))

    def _fin(batch: pa.Table) -> pa.Table:
        vocab = batch["sum(vocab_part)"].to_numpy(zero_copy_only=False)
        toks = batch["sum(tok_part)"].to_numpy(zero_copy_only=False)
        return pa.table({
            key_col: batch[key_col],
            "n_tokens": pa.array(toks.astype(np.int64), pa.int64()),
            "vocab_size": pa.array(vocab.astype(np.int64), pa.int64()),
            "ttr_permille": pa.array(
                vocab * 1000 // np.maximum(toks, 1), pa.int64())})

    return rolled.map_batches(_fin, batch_format="pyarrow",
                              zero_copy_batch=True)


def _key_token_partial(batch: pa.Table, *, text_col: str,
                       key_col: str) -> pa.Table:
    """Block-level (key, token, n) partial counts — the vocab_richness
    map side (same kernel family as the trending_tokens day pairs)."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.fill_null(batch[text_col], "")),
        r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = toks.flatten()
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    tenc = pc.dictionary_encode(flat)
    if isinstance(tenc, pa.ChunkedArray):
        tenc = tenc.combine_chunks()
    kenc = pc.dictionary_encode(batch[key_col].combine_chunks()
                                if isinstance(batch[key_col],
                                              pa.ChunkedArray)
                                else batch[key_col])
    if isinstance(kenc, pa.ChunkedArray):
        kenc = kenc.combine_chunks()
    kcode = np.repeat(
        kenc.indices.to_numpy(zero_copy_only=False).astype(np.int64),
        lens)
    tcode = tenc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nv = len(tenc.dictionary)
    key = (kcode * nv + tcode)[keep]
    uk, cnt = np.unique(key, return_counts=True)
    return pa.table({
        key_col: kenc.dictionary.take(pa.array(uk // nv)),
        "token": tenc.dictionary.take(pa.array(uk % nv)),
        "n": pa.array(cnt.astype(np.int64), pa.int64())})
