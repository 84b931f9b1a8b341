"""Data-selection operators for training-corpus construction.

DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling", public arXiv:2302.03169):
score each document by the log-ratio of hashed-unigram bucket frequencies
under a target slice of the corpus versus the raw corpus, then keep the
highest-weight documents.  No reference analog (SURVEY.md §2 fuses KG
claims); this is a first-class LLM-pipeline operator.

This implementation is deterministic end-to-end so it sits under the
driver's DuckDB oracle gate:

* buckets are md5-keyed — ``_md5_token64(token) & (n_buckets-1)`` equals
  DuckDB ``md5_number_lower(token) & (n_buckets-1)``;
* the "log" is the exact integer bit length — ``(n+1).bit_length()``
  equals SQL ``length(bin(n + 1))`` — a floor-log2 proxy that avoids any
  float ``ln`` cross-engine drift while preserving the DSIR ranking
  semantics (documented deviation: bit-length vs natural log).

100-TB shape: the fit is a per-block dense bucket histogram collapsed to
nonzero cells → ONE tiny groupby over ≤ n_buckets keys (corpus-size
independent); the fitted model (two int64 vectors) broadcasts via
``ray.put`` once and is read zero-copy by every scoring task; scoring is
a single streaming pass with a per-batch segmented sum.  Nothing
corpus-sized ever reaches the driver.
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _token_codes(text_col) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """(doc index per token, dictionary code per token, unique tokens) for
    one batch column — whitespace tokenization identical to the SQL replay
    ``string_split_regex(trim(coalesce(text, '')), '\\s+')``."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.fill_null(text_col, "")), r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
    enc = pc.dictionary_encode(toks.flatten())
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    code = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    docix = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
    return docix, code, enc.dictionary.to_pylist()


def _uniq_buckets(uniq: list[str], n_buckets: int) -> np.ndarray:
    from trustfuse_ray.stages.dedup import _md5_token64

    h = np.fromiter((_md5_token64(t) for t in uniq), dtype=np.uint64,
                    count=len(uniq))
    return (h & np.uint64(n_buckets - 1)).astype(np.int64)


def _bucket_counts_partial(batch: pa.Table, *, n_buckets: int,
                           text_col: str, lang_col: str,
                           target_lang: str) -> pa.Table:
    """Per-block dense (raw, target) bucket histograms → nonzero cells.
    The exchange after this carries ≤ n_buckets rows per block."""
    docix, code, uniq = _token_codes(batch[text_col])
    if len(code) == 0:
        return pa.table({"bucket": pa.array([], pa.int64()),
                         "raw_n": pa.array([], pa.int64()),
                         "tgt_n": pa.array([], pa.int64())})
    bucket_tok = _uniq_buckets(uniq, n_buckets)[code]
    raw = np.bincount(bucket_tok, minlength=n_buckets)
    tgt_doc = np.asarray(pc.equal(pc.fill_null(batch[lang_col], ""),
                                  target_lang), dtype=bool)
    tmask = tgt_doc[docix]
    tgt = np.bincount(bucket_tok[tmask], minlength=n_buckets)
    nz = np.flatnonzero(raw)
    return pa.table({"bucket": pa.array(nz, pa.int64()),
                     "raw_n": pa.array(raw[nz], pa.int64()),
                     "tgt_n": pa.array(tgt[nz], pa.int64())})


def hashed_bucket_model(docs, n_buckets: int = 1024, text_col: str = "text",
                        lang_col: str = "lang", target_lang: str = "en"):
    """Fit the hashed-unigram bucket counts: Dataset of (bucket, raw_n,
    tgt_n), ≤ n_buckets rows total after the combine."""
    partial = docs.select_columns([text_col, lang_col]).map_batches(
        functools.partial(_bucket_counts_partial, n_buckets=n_buckets,
                          text_col=text_col, lang_col=lang_col,
                          target_lang=target_lang),
        batch_format="pyarrow", zero_copy_batch=True)
    return (partial.groupby("bucket").sum(["raw_n", "tgt_n"])
            .rename_columns({"sum(raw_n)": "raw_n", "sum(tgt_n)": "tgt_n"}))


def _score_lut(buckets: np.ndarray, raw_n: np.ndarray, tgt_n: np.ndarray,
               n_buckets: int) -> np.ndarray:
    """Per-bucket integer weight: bitlen(tgt+1) − bitlen(raw+1).  Buckets
    unseen at fit time score 0 (both sides bitlen(1))."""
    lut = np.zeros(n_buckets, dtype=np.int64)
    for b, r, t in zip(buckets, raw_n, tgt_n):
        lut[int(b)] = (int(t) + 1).bit_length() - (int(r) + 1).bit_length()
    return lut


def dsir_importance(docs, n_buckets: int = 1024, text_col: str = "text",
                    lang_col: str = "lang", target_lang: str = "en",
                    id_col: str = "doc_id"):
    """DSIR importance weights: (id, dsir_score) with score = Σ over the
    doc's tokens of the fitted bucket log-ratio proxy.  Fit → broadcast →
    one streaming scoring pass."""
    model = hashed_bucket_model(docs, n_buckets=n_buckets,
                                text_col=text_col, lang_col=lang_col,
                                target_lang=target_lang)
    # bounded driver materialization: ≤ n_buckets rows by construction
    mt = model.to_pandas()
    if len(mt) and "bucket" in mt.columns:
        lut = _score_lut(mt["bucket"].to_numpy(), mt["raw_n"].to_numpy(),
                         mt["tgt_n"].to_numpy(), n_buckets)
    else:  # empty corpus: every bucket unseen, weight 0
        lut = np.zeros(n_buckets, dtype=np.int64)
    lut_ref = ray.put(lut)

    def _score(batch: pa.Table) -> pa.Table:
        w = ray.get(lut_ref)  # zero-copy read from the local object store
        docix, code, uniq = _token_codes(batch[text_col])
        scores = np.zeros(len(batch), dtype=np.int64)
        if len(code):
            tok_w = w[_uniq_buckets(uniq, n_buckets)[code]]
            np.add.at(scores, docix, tok_w)
        return pa.table({id_col: batch[id_col].cast(pa.int64()),
                         "dsir_score": pa.array(scores, pa.int64())})

    return docs.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pyarrow", zero_copy_batch=True)


def dsir_select(docs, frac: float = 0.25, n_buckets: int = 1024,
                text_col: str = "text", lang_col: str = "lang",
                target_lang: str = "en", id_col: str = "doc_id"):
    """DSIR selection: keep the top ``frac`` of documents by importance
    weight, ties at the cutoff score all included (deterministic — output
    may exceed ceil(frac·n) by the tie count).

    Scale shape: the threshold comes from an exact score HISTOGRAM
    (scores are small ints — sums of bit-length diffs — so distinct
    scores are few), never a global sort; per-block partials collapse to
    (score, n) rows before one tiny groupby.  The score table is
    materialized once (it is (id, int64) — tiny next to the corpus) so
    the histogram and the filter don't recompute the fit."""
    scores = dsir_importance(docs, n_buckets=n_buckets, text_col=text_col,
                             lang_col=lang_col, target_lang=target_lang,
                             id_col=id_col).materialize()

    def _hist(batch: pa.Table) -> pa.Table:
        s = np.asarray(batch["dsir_score"], dtype=np.int64)
        u, c = np.unique(s, return_counts=True)
        return pa.table({"dsir_score": pa.array(u, pa.int64()),
                         "hn": pa.array(c.astype(np.int64), pa.int64())})

    hist = (scores.map_batches(_hist, batch_format="pyarrow",
                               zero_copy_batch=True)
            .groupby("dsir_score").sum("hn").to_pandas())
    n_total = int(hist["sum(hn)"].sum()) if len(hist) else 0
    if n_total == 0:
        return scores
    k = int(np.ceil(frac * n_total))
    order = np.argsort(-hist["dsir_score"].to_numpy())
    s_desc = hist["dsir_score"].to_numpy()[order]
    cum = np.cumsum(hist["sum(hn)"].to_numpy()[order])
    thr = int(s_desc[int(np.argmax(cum >= k))])

    def _keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater_equal(batch["dsir_score"],
                                             pa.scalar(thr, pa.int64())))

    return scores.map_batches(_keep, batch_format="pyarrow",
                              zero_copy_batch=True)
