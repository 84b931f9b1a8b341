"""Static conflicting-dataset sources — the reference's folder-of-TSV
layout (`/root/reference/trustfuse/conflicting_dataset/dataset.py:269-334`):
headerless ISO-8859-1 TSV files, one temporal bucket per file, configured
header lists (`/root/reference/settings.py:27-66`), junk trailing columns
dropped.  Re-expressed as ``ray.data.read_csv`` with explicit Arrow CSV
options + a wide→long melt into the engine claim IR (replacing
``Model.transform_data``'s per-row loops, `model.py:121-167`, with a
vectorized unpivot)."""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.csv

import ray.data

from trustfuse_ray.stages.common import fnv64


def read_static_tsv(data_dir: str, headers: list[str], sep: str = "\t",
                    encoding: str = "ISO-8859-1", engine: str = "pandas"):
    """Read a conflicting_data/ or ground_truth/ folder: one bucket per file
    (bucket ids follow sorted filename order, as the reference's dict
    insertion order does).  Extra trailing columns beyond ``headers`` are
    dropped (dataset.py:302-310).

    Default engine is the pandas reader, which matches the reference's
    parsing exactly (ragged rows → NaN, empty fields → NaN) and emits a
    ``__row`` order column so downstream claim ids preserve the reference's
    row order (its tie-breaks depend on it).  These curated corpora are
    small; engine="arrow" gives the distributed reader for big regular
    TSVs."""
    files = sorted(glob.glob(os.path.join(data_dir, "*")))
    bucket_of = {os.path.abspath(f): i for i, f in enumerate(files)}

    if engine == "pandas":
        return _read_static_tsv_pandas(files, bucket_of, headers, sep,
                                       encoding)

    with open(files[0], encoding=encoding) as fh:
        ncols = len(fh.readline().rstrip("\n").split(sep))
    spare = [f"__junk{i}" for i in range(max(0, ncols - len(headers)))]
    names = list(headers) + spare
    ds = ray.data.read_csv(
        files,
        read_options=pa.csv.ReadOptions(column_names=names,
                                        encoding=encoding),
        parse_options=pa.csv.ParseOptions(delimiter=sep),
        convert_options=pa.csv.ConvertOptions(
            column_types={n: pa.string() for n in names},
            # pandas (the reference reader) turns empty fields into NaN;
            # Arrow would otherwise yield "" and create phantom claims
            strings_can_be_null=True),
        include_paths=True,
    )

    def _finish(batch: pa.Table) -> pa.Table:
        paths = [bucket_of.get(os.path.abspath(p), 0)
                 for p in batch["path"].to_pylist()]
        keep = batch.select(list(headers))
        return keep.append_column("bucket_id", pa.array(paths, pa.int32()))

    return ds.map_batches(_finish, batch_format="pyarrow",
                          zero_copy_batch=True)


def _read_static_tsv_pandas(files, bucket_of, headers, sep, encoding):
    import pandas as pd

    tables = []
    for f in files:
        df = pd.read_csv(f, header=None, sep=sep, encoding=encoding,
                         dtype=str)
        df = df.iloc[:, :len(headers)]
        df.columns = list(headers)[:df.shape[1]]
        for h in headers[df.shape[1]:]:
            df[h] = None
        df["bucket_id"] = bucket_of[os.path.abspath(f)]
        df["__row"] = range(len(df))  # preserves the reference's row order
        tables.append(pa.Table.from_pandas(df, preserve_index=False))
    tbl = pa.concat_tables([t.cast(tables[0].schema) for t in tables])
    tbl = tbl.set_column(tbl.schema.get_field_index("bucket_id"),
                         "bucket_id",
                         tbl["bucket_id"].cast(pa.int32()))
    return ray.data.from_arrow(tbl)


def melt_to_claims(wide, entity_col: str, attrs: list[str],
                   attribute_types: dict[str, str],
                   source_col: str = "Source"):
    """Wide per-source rows → long claim IR (one row per non-null
    (source, entity, attr, value)).

    claim_id: when the wide table carries a ``__row`` column (the pandas
    static reader emits one) ids are ORDER-PRESERVING —
    ((bucket·2^30 + row)·64 + attr_idx)·256 — so claim order inside every
    fact equals the reference's row-major order (its tie-breaks at
    saturated scores depend on it, e.g. TruthFinder's argmax over s==1.0
    claims).  Otherwise a content hash (stable across partitionings; exact
    duplicates collide intentionally — they dedup anyway)."""
    import pyarrow.compute as pc

    from trustfuse_ray.stages.canon import extract_number_with_commas

    def _melt(batch: pa.Table) -> pa.Table:
        parts = []
        n = len(batch)
        src = batch[source_col]
        ent = pc.cast(batch[entity_col], pa.string())
        bucket = batch["bucket_id"] if "bucket_id" in batch.column_names \
            else pa.array([0] * n, pa.int32())
        rows = (batch["__row"].to_pylist()
                if "__row" in batch.column_names else None)
        for attr_idx, attr in enumerate(attrs):
            if attr not in batch.column_names:
                continue
            val = pc.cast(batch[attr], pa.string())
            vtype = attribute_types.get(attr, "string")
            if vtype == "quantity":
                vnum = extract_number_with_commas(val)
                vstr = pc.replace_substring(pc.utf8_trim_whitespace(val),
                                            ",", "")
            else:
                vnum = pa.nulls(n, pa.float64())
                vstr = pc.utf8_trim_whitespace(val)
            if rows is not None:
                cid = [((b * (1 << 30) + r) * 64 + attr_idx) * 256
                       for b, r in zip(bucket.to_pylist(), rows)]
            else:
                cid = [fnv64(f"{b}|{s}|{e}|{attr}|{v}")
                       if v is not None else 0
                       for b, s, e, v in zip(bucket.to_pylist(),
                                             src.to_pylist(),
                                             ent.to_pylist(),
                                             val.to_pylist())]
            t = pa.table({
                "claim_id": pa.array(cid, pa.int64()),
                "bucket_id": pc.cast(bucket, pa.int32()),
                "source": pc.cast(src, pa.string()),
                "entity": ent,
                "attr": pa.array([attr] * n, pa.string()),
                "value_str": vstr,
                "value_num": vnum,
                "value_type": pa.array([vtype] * n, pa.string()),
                "raw_value": val,
                "conv_id": pa.array([""] * n, pa.string()),
                "turn_idx": pa.array([0] * n, pa.int32()),
            })
            parts.append(t.filter(pc.is_valid(val)))
        if not parts:
            return _empty_claims()
        return pa.concat_tables(parts)

    return wide.map_batches(_melt, batch_format="pyarrow",
                            zero_copy_batch=True)


def _empty_claims() -> pa.Table:
    return pa.table({
        "claim_id": pa.array([], pa.int64()),
        "bucket_id": pa.array([], pa.int32()),
        "source": pa.array([], pa.string()),
        "entity": pa.array([], pa.string()),
        "attr": pa.array([], pa.string()),
        "value_str": pa.array([], pa.string()),
        "value_num": pa.array([], pa.float64()),
        "value_type": pa.array([], pa.string()),
        "raw_value": pa.array([], pa.string()),
        "conv_id": pa.array([], pa.string()),
        "turn_idx": pa.array([], pa.int32()),
    })


def cumulative_bucket_view(claims, up_to_bucket: int):
    """The WikiConflict cumulative-bucket semantics
    (`dataset.py:362-379`: bucket b concatenates all previous buckets) as a
    PREDICATE (bucket_id <= b) — never a physical concat, avoiding the
    reference's quadratic memory growth (SURVEY.md §7.5)."""
    import pyarrow.compute as pc

    def _f(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less_equal(batch["bucket_id"], up_to_bucket))

    return claims.map_batches(_f, batch_format="pyarrow",
                              zero_copy_batch=True)


def write_static_tsv(claims, out_dir: str, attrs: list[str],
                     sep: str = "\t", encoding: str = "ISO-8859-1",
                     n_parts: int = 16):
    """Writer half of :func:`read_static_tsv` — long claim IR back to the
    reference's StaticDataset folder layout
    (`/root/reference/trustfuse/conflicting_dataset/dataset.py:269-334`):
    one headerless TSV per bucket named ``bucket-<k>.tsv`` (zero-padded so
    sorted filename order = bucket order), columns
    ``Source  Entity  <attrs…>  junk``, ISO-8859-1.  Cells carry each
    claim's original surface (``raw_value``); missing (source, entity,
    attr) cells are empty, which the reader round-trips to null.  Rows are
    (source, entity)-sorted, so file bytes are deterministic under any
    block layout.  One (bucket_id) exchange; ``out_dir`` must be shared
    storage on a multi-node cluster.  Values must not contain the
    separator or newlines (true of the reference corpora).

    Returns the manifest Dataset (bucket_id, rows, md5)."""
    import hashlib

    from trustfuse_ray.stages.common import hash_group_apply

    os.makedirs(out_dir, exist_ok=True)
    aidx = {a: i for i, a in enumerate(attrs)}

    def _write(group: pa.Table) -> pa.Table:
        b = int(group["bucket_id"][0].as_py())
        cells: dict[tuple, list] = {}
        for s, e, a, raw, cid in zip(group["source"].to_pylist(),
                                     group["entity"].to_pylist(),
                                     group["attr"].to_pylist(),
                                     group["raw_value"].to_pylist(),
                                     group["claim_id"].to_pylist()):
            if a not in aidx:
                continue
            row = cells.setdefault((s, e), [None] * (len(attrs) + 1))
            j = aidx[a]
            # duplicate claims for one cell: keep the lowest claim_id
            # (deterministic; the reader only ever saw one cell anyway)
            if row[j] is None or cid < row[j][1]:
                row[j] = (raw, cid)
        lines = []
        for (s, e) in sorted(cells):
            row = cells[(s, e)]
            vals = ["" if c is None else c[0] for c in row[:len(attrs)]]
            lines.append(sep.join([s, e] + vals + ["x"]))
        body = ("\n".join(lines) + "\n" if lines else "").encode(encoding)
        with open(os.path.join(out_dir, f"bucket-{b:02d}.tsv"), "wb") as f:
            f.write(body)
        return pa.table({
            "bucket_id": pa.array([b], pa.int64()),
            "rows": pa.array([len(lines)], pa.int64()),
            "md5": pa.array([hashlib.md5(body).hexdigest()], pa.string())})

    pruned = claims.select_columns(
        ["bucket_id", "source", "entity", "attr", "raw_value", "claim_id"])
    return hash_group_apply(
        pruned, ["bucket_id"], _write, n_parts=n_parts,
        plasma_schema=pa.schema([("bucket_id", pa.int64()),
                                 ("rows", pa.int64()),
                                 ("md5", pa.string())]))
