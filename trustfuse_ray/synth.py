"""Deterministic synthetic transcript corpus (the engine's primary input).

BASELINE.json's input_hint mandates Parquet transcript tables
``(conv_id, turn_idx, role, text, tool, ts)``.  The driver's testdata has no
transcript table, so we synthesize one deterministically (seed=42, no wall
clock) per scale factor, mirroring how the reference constructs conflicting
claims for its Book/Flight corpora (per-source accuracy with wrong-value
pools, cf. /root/reference/data/input_trustfuse/book/conflicting_data/ and
FIXTURES.md F1):

* each turn's ``text`` embeds 0–3 templated claim sentences
  ``"The <attr> of <mention> is <value>."``;
* the claiming *source* is the ``role:tool`` pair (reference column `Source`);
* each source asserts the true value with per-source accuracy in
  [0.55, 0.95], else a wrong value from a small per-fact pool;
* a few hot entities get ~50x claim volume (skew / salting path);
* subject *mentions* are alias surface forms (exercise entity linking);
* quantity values are formatted with thousands separators and occasional
  stray spaces (exercise canonicalization kernels).

Everything (transcripts, alias table, golden truth, attribute types) is
written under a cache dir keyed by the scale name; generation is pure given
(seed, n_conv) so reruns are byte-stable.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
BASE_TS = np.datetime64("2026-01-01T00:00:00", "us")

ROLES = ("user", "assistant", "tool")
TOOLS = (
    "search", "wiki", "db", "kb", "web", "crawler",
    "scraper", "api", "cache", "index", "feed", "",
)
STRING_ATTRS = ("color", "capital", "category", "status")
QUANTITY_ATTRS = ("population", "height", "price")
ENTITY_ATTRS = ("neighbor",)
ATTRS = STRING_ATTRS + QUANTITY_ATTRS + ENTITY_ATTRS
ATTR_TYPES = {
    **{a: "string" for a in STRING_ATTRS},
    **{a: "quantity" for a in QUANTITY_ATTRS},
    **{a: "entity" for a in ENTITY_ATTRS},
}

# Claim sentence grammar shared with the extractor and the DuckDB oracle.
CLAIM_SENTENCE_RE = r"The ([a-z_]+) of ([A-Za-z0-9_ ]+?) is ([A-Za-z0-9_, ]+?)\."

N_CONV_BY_SF = {"sf0.001": 160, "sf0.01": 1600, "sf0.1": 128000,
                # larger corpora for the scaling bench (synthesized to /tmp;
                # the N→4N criterion measures the regime where per-node work
                # dominates fixed cost, which sf0.1's ~85 CPU-seconds cannot)
                "sf0.2": 256000, "sf0.4": 512000,
                # 10× the bench corpus: the one-off superlinearity probe
                # (VERDICT r4 #6) — confirms the linear walls observed
                # sf0.2→sf0.4 hold another 2.5×
                "sf1.0": 1280000}
FILLERS = (
    "Let me check that for you",
    "Here is what I found",
    "Searching the knowledge base now",
    "That matches the earlier record",
    "I will verify this claim",
)


def sf_name(sf_dir: str) -> str:
    return Path(sf_dir).name or "sf0.001"


def cache_dir(sf_dir: str, root: str = "/tmp/trustfuse_ray_data") -> str:
    return os.path.join(root, sf_name(sf_dir))


def _entity_names(n: int) -> list[str]:
    return [f"E{i:05d}" for i in range(n)]


def _aliases_for(entity: str) -> list[str]:
    i = int(entity[1:])
    return [entity, f"entity {i}", f"node {i} prime"]


def generate(sf_dir: str, root: str = "/tmp/trustfuse_ray_data",
             n_conv: int | None = None, n_files: int | None = None) -> str:
    """Generate (or reuse) the synthetic corpus for a scale dir; returns its path."""
    out = cache_dir(sf_dir, root)
    marker = os.path.join(out, "_SUCCESS")
    if n_conv is None:
        n_conv = N_CONV_BY_SF.get(sf_name(sf_dir), 200)
    if n_files is None:
        n_files = 32 if n_conv >= 32000 else 8
    stamp = f"seed={SEED} n_conv={n_conv} v5 files={n_files}"
    if os.path.exists(marker) and Path(marker).read_text() == stamp:
        return out
    os.makedirs(os.path.join(out, "transcripts"), exist_ok=True)

    rng = np.random.default_rng(SEED)
    n_entities = max(40, n_conv // 4)
    entities = _entity_names(n_entities)
    n_hot = 3  # hot entities: ~50x claim volume

    # --- ground truth: one true value per (entity, attr) --------------------
    truth_rows = {"entity": [], "attr": [], "value_str": [], "value_num": [],
                  "value_type": []}
    true_str = {}   # (ei, attr) -> canonical string value
    true_num = {}   # (ei, attr) -> int value (quantity)
    for ei in range(n_entities):
        for attr in ATTRS:
            t = ATTR_TYPES[attr]
            if t == "quantity":
                v = int(rng.integers(100, 10_000_000))
                true_num[(ei, attr)] = v
                s = str(v)
                vn = float(v)
            elif t == "entity":
                s = entities[int(rng.integers(0, n_entities))]
                vn = None
            else:
                s = f"{attr}_v{int(rng.integers(0, 4))}"
                vn = None
            true_str[(ei, attr)] = s
            truth_rows["entity"].append(entities[ei])
            truth_rows["attr"].append(attr)
            truth_rows["value_str"].append(s)
            truth_rows["value_num"].append(vn)
            truth_rows["value_type"].append(t)

    def wrong_values(ei: int, attr: str) -> list[str]:
        t = ATTR_TYPES[attr]
        if t == "quantity":
            v = true_num[(ei, attr)]
            return [str(max(1, v // 2)), str(v * 2 + 1), str(v * 10 + 3)]
        if t == "entity":
            return [entities[(ei + k) % n_entities] for k in (1, 2, 3)]
        tv = true_str[(ei, attr)]
        pool = [f"{attr}_v{j}" for j in range(6)]
        return [p for p in pool if p != tv][:3]

    # --- sources with per-source accuracy -----------------------------------
    sources = []
    for role in ROLES:
        for tool in TOOLS:
            if role == "user" and tool:
                continue
            if role != "user" and not tool:
                continue
            sources.append(f"{role}:{tool}")
    src_acc = {s: float(a) for s, a in
               zip(sources, rng.uniform(0.55, 0.95, size=len(sources)))}

    # --- conversations ------------------------------------------------------
    turns_per_conv = rng.integers(4, 17, size=n_conv)
    conv_ids, turn_idxs, roles_c, texts, tools_c, tss = [], [], [], [], [], []
    # entity sampling weights: hot entities dominate
    w = np.ones(n_entities)
    w[:n_hot] = 50.0
    w /= w.sum()

    n_turns_total = int(turns_per_conv.sum())
    ent_pool = rng.choice(n_entities, size=n_turns_total * 3, p=w)
    attr_pool = rng.integers(0, len(ATTRS), size=n_turns_total * 3)
    nclaims_pool = rng.choice(4, size=n_turns_total, p=[0.25, 0.35, 0.25, 0.15])
    role_pool = rng.integers(0, 3, size=n_turns_total)
    tool_pool = rng.integers(0, len(TOOLS) - 1, size=n_turns_total)
    lie_pool = rng.random(size=n_turns_total * 3)
    alias_pool = rng.integers(0, 3, size=n_turns_total * 3)
    wrong_pick = rng.integers(0, 3, size=n_turns_total * 3)
    filler_pool = rng.integers(0, len(FILLERS), size=n_turns_total)
    spacey = rng.random(size=n_turns_total * 3)

    p = 0  # claim cursor
    g = 0  # turn cursor
    for ci in range(n_conv):
        cid = f"conv-{ci:06d}"
        k = int(turns_per_conv[ci])
        # shuffled turn order within the file exercises reassembly (FIXTURES F1)
        order = rng.permutation(k)
        for local_i in range(k):
            ti = int(order[local_i])
            role = ROLES[role_pool[g]]
            tool = "" if role == "user" else TOOLS[tool_pool[g]]
            source_ok = role != "user"
            nc = int(nclaims_pool[g]) if source_ok else 0
            sents = [FILLERS[filler_pool[g]] + "."]
            src = f"{role}:{tool}"
            for _ in range(nc):
                ei = int(ent_pool[p])
                attr = ATTRS[attr_pool[p] % len(ATTRS)]
                if lie_pool[p] < src_acc[src]:
                    val = true_str[(ei, attr)]
                else:
                    val = wrong_values(ei, attr)[wrong_pick[p]]
                if ATTR_TYPES[attr] == "quantity" and len(val) > 3:
                    # thousands separators in the surface form
                    val = f"{int(val):,}"
                if spacey[p] < 0.15:
                    val = val + " "  # stray trailing space pre-period
                mention = _aliases_for(entities[ei])[alias_pool[p]]
                sents.append(f"The {attr} of {mention} is {val}.")
                p += 1
            conv_ids.append(cid)
            turn_idxs.append(ti)
            roles_c.append(role)
            tools_c.append(tool)
            texts.append(" ".join(sents))
            tss.append(BASE_TS + np.timedelta64(ci * 3600 + ti * 7, "s"))
            g += 1

    table = pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles_c, pa.string()),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array(tools_c, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
        }
    )
    # one file per hash partition of conv_id → resumable, parallel read
    part = np.array([hash_conv(c) % n_files for c in conv_ids])
    for f in range(n_files):
        pq.write_table(table.filter(pa.array(part == f)),
                       os.path.join(out, "transcripts", f"part-{f:05d}.parquet"))

    pq.write_table(pa.table({k: pa.array(v) for k, v in truth_rows.items()}),
                   os.path.join(out, "truth.parquet"))
    al_alias, al_ent = [], []
    for e in entities:
        for a in _aliases_for(e):
            al_alias.append(a)
            al_ent.append(e)
    pq.write_table(pa.table({"alias": al_alias, "entity": al_ent}),
                   os.path.join(out, "aliases.parquet"))
    pq.write_table(
        pa.table({"source": list(src_acc), "acc": list(src_acc.values())}),
        os.path.join(out, "source_acc.parquet"))
    with open(os.path.join(out, "attr_types.json"), "w") as fh:
        json.dump(ATTR_TYPES, fh)
    Path(marker).write_text(stamp)
    return out


N_DOCS_BY_SF = {"sf0.001": 1000, "sf0.01": 5000, "sf0.1": 40000,
                "sf0.2": 80000, "sf0.4": 160000, "sf1.0": 400000}


def generate_documents(sf_dir: str, root: str = "/tmp/trustfuse_ray_data",
                       n_docs: int | None = None) -> str:
    """Deterministic synthetic document corpus with PLANTED duplicates for
    the dedup operators: ~2% exact copies and ~5% near-duplicates (a few
    word substitutions) of earlier docs.  Returns the parquet path."""
    out = cache_dir(sf_dir, root)
    os.makedirs(out, exist_ok=True)
    # sharded directory (one row group per ~2.5k docs): a single-file,
    # single-row-group corpus reads as ONE Ray block, serializing every
    # downstream stage behind a repartition of the full text payload
    path = os.path.join(out, "docs_synth")
    marker = os.path.join(out, "_DOCS_SUCCESS")
    if n_docs is None:
        n_docs = N_DOCS_BY_SF.get(sf_name(sf_dir), 1000)
    stamp = f"seed={SEED} n_docs={n_docs} v2-sharded"
    if os.path.exists(marker) and Path(marker).read_text() == stamp:
        return path

    rng = np.random.default_rng(SEED + 1)
    vocab = [f"w{i:03d}" for i in range(500)]
    texts: list[str] = []
    kind: list[str] = []
    dup_of: list[int] = []
    for i in range(n_docs):
        r = rng.random()
        if i > 10 and r < 0.02:  # exact duplicate
            j = int(rng.integers(0, i))
            texts.append(texts[j])
            kind.append("exact_dup")
            dup_of.append(j)
        elif i > 10 and r < 0.07:  # near duplicate: few substitutions
            j = int(rng.integers(0, i))
            words = texts[j].split()
            for _ in range(max(1, len(words) // 25)):
                words[int(rng.integers(0, len(words)))] = \
                    vocab[int(rng.integers(0, len(vocab)))]
            texts.append(" ".join(words))
            kind.append("near_dup")
            dup_of.append(j)
        else:
            ln = int(rng.integers(40, 150))
            idx = rng.integers(0, len(vocab), size=ln)
            texts.append(" ".join(vocab[k] for k in idx))
            kind.append("original")
            dup_of.append(-1)
    tbl = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "kind": pa.array(kind, pa.string()),
        "dup_of": pa.array(dup_of, pa.int64()),
    })
    os.makedirs(path, exist_ok=True)
    shard = 2500
    n_shards = max(1, -(-n_docs // shard))
    for s in range(n_shards):
        pq.write_table(tbl.slice(s * shard, shard),
                       os.path.join(path, f"part-{s:05d}.parquet"))
    Path(marker).write_text(stamp)
    return path


def generate_multiline_documents(sf_dir: str,
                                 root: str = "/tmp/trustfuse_ray_data",
                                 n_docs: int | None = None) -> str:
    """Deterministic multi-line document corpus for LINE-level dedup: each
    doc is a newline-joined mix of boilerplate lines drawn from a shared
    pool (headers / footers / template fragments — the mass-duplicated text
    real crawls carry) and unique body lines.  Returns the sharded parquet
    directory path."""
    out = cache_dir(sf_dir, root)
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "docs_lines")
    marker = os.path.join(out, "_LINES_SUCCESS")
    if n_docs is None:
        n_docs = N_DOCS_BY_SF.get(sf_name(sf_dir), 1000)
    stamp = f"seed={SEED} n_docs={n_docs} v1-lines"
    if os.path.exists(marker) and Path(marker).read_text() == stamp:
        return path

    rng = np.random.default_rng(SEED + 9)
    vocab = [f"w{i:03d}" for i in range(400)]

    def _line(tag: str = "") -> str:
        ln = int(rng.integers(4, 10))
        idx = rng.integers(0, len(vocab), size=ln)
        body = " ".join(vocab[k] for k in idx)
        return body + tag

    pool = [_line() for _ in range(max(50, n_docs // 20))]
    texts: list[str] = []
    uniq = 0
    for _ in range(n_docs):
        n_lines = int(rng.integers(3, 12))
        lines: list[str] = []
        for _ in range(n_lines):
            if rng.random() < 0.45:  # boilerplate: duplicated across docs
                lines.append(pool[int(rng.integers(0, len(pool)))])
            else:  # unique body line (suffix guarantees uniqueness)
                uniq += 1
                lines.append(_line(f" u{uniq:07d}"))
        texts.append("\n".join(lines))
    tbl = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    os.makedirs(path, exist_ok=True)
    shard = 2500
    n_shards = max(1, -(-n_docs // shard))
    for s in range(n_shards):
        pq.write_table(tbl.slice(s * shard, shard),
                       os.path.join(path, f"part-{s:05d}.parquet"))
    Path(marker).write_text(stamp)
    return path


def hash_conv(conv_id: str) -> int:
    """Stable conversation hash (no PYTHONHASHSEED dependence)."""
    h = 2166136261
    for ch in conv_id.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return h


def generate_jsonl(sf_dir: str, root: str = "/tmp/trustfuse_ray_data") -> str:
    """Materialize the transcripts as shard JSONL files — the common LLM
    ingest format this engine must also read.  Deterministic
    byte-for-byte from the parquet corpus (sorted keys, ISO timestamps),
    one .jsonl per parquet shard so a JSONL read parallelizes exactly
    like the parquet read."""
    import json as _json

    out = generate(sf_dir, root)
    d = os.path.join(out, "transcripts_jsonl")
    marker = os.path.join(out, "_JSONL_SUCCESS")
    stamp = "v1 " + Path(os.path.join(out, "_SUCCESS")).read_text()
    if os.path.exists(marker) and Path(marker).read_text() == stamp:
        return d
    os.makedirs(d, exist_ok=True)
    src_dir = os.path.join(out, "transcripts")
    for f in sorted(os.listdir(src_dir)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(src_dir, f))
        with open(os.path.join(d, f[:-8] + ".jsonl"), "w") as fh:
            for r in t.to_pylist():
                r["ts"] = r["ts"].isoformat()
                fh.write(_json.dumps(r, sort_keys=True) + "\n")
    Path(marker).write_text(stamp)
    return d

def generate_claims_tsv(sf_dir: str,
                        root: str = "/tmp/trustfuse_ray_data") -> str:
    """Materialize a reference-layout conflicting-claims TSV folder —
    the StaticDataset input format
    (`/root/reference/trustfuse/conflicting_dataset/dataset.py:269-334`):
    headerless TSV, one temporal bucket per file (sorted-filename order),
    columns ``Source  Entity  <ATTRS…>  junk`` with a junk trailing
    column the reader must drop.  Deterministic (seed-derived coverage,
    accuracy draws from the corpus's own per-source accuracies); value
    surfaces reuse generate()'s quirks (thousands separators, stray
    trailing spaces) so the canonicalization kernels are exercised on
    the TSV path too.  Content is pure ASCII — valid ISO-8859-1 for the
    reference-parity reader AND valid UTF-8 for the DuckDB oracle."""
    out = generate(sf_dir, root)
    d = os.path.join(out, "claims_tsv")
    marker = os.path.join(out, "_TSV_SUCCESS")
    stamp = "v1 " + Path(os.path.join(out, "_SUCCESS")).read_text()
    if os.path.exists(marker) and Path(marker).read_text() == stamp:
        return d
    os.makedirs(d, exist_ok=True)

    truth = pq.read_table(os.path.join(out, "truth.parquet"))
    src_t = pq.read_table(os.path.join(out, "source_acc.parquet"))
    sources = src_t["source"].to_pylist()
    accs = np.asarray(src_t["acc"], dtype=np.float64)
    ents = sorted(set(truth["entity"].to_pylist()))
    tstr = {(e, a): v for e, a, v in zip(truth["entity"].to_pylist(),
                                         truth["attr"].to_pylist(),
                                         truth["value_str"].to_pylist())}

    rng = np.random.default_rng(SEED + 7)
    n_buckets = 4
    for b in range(n_buckets):
        lines = []
        # per bucket each source covers a ~30% entity slice
        cov = rng.random((len(sources), len(ents))) < 0.30
        present = rng.random((len(sources), len(ents), len(ATTRS))) < 0.80
        lie = rng.random((len(sources), len(ents), len(ATTRS)))
        wrong = rng.integers(0, 3, size=(len(sources), len(ents),
                                         len(ATTRS)))
        spacey = rng.random((len(sources), len(ents), len(ATTRS))) < 0.10
        for si, s in enumerate(sources):
            for ei in np.flatnonzero(cov[si]):
                e = ents[ei]
                cells = []
                for ai, a in enumerate(ATTRS):
                    if not present[si, ei, ai]:
                        cells.append("")
                        continue
                    tv = tstr[(e, a)]
                    if lie[si, ei, ai] < accs[si]:
                        v = tv
                    else:
                        k = int(wrong[si, ei, ai])
                        if ATTR_TYPES[a] == "quantity":
                            n = int(tv)
                            v = str([max(1, n // 2), n * 2 + 1,
                                     n * 10 + 3][k])
                        elif ATTR_TYPES[a] == "entity":
                            v = ents[(ei + k + 1) % len(ents)]
                        else:
                            pool = [f"{a}_v{j}" for j in range(6)
                                    if f"{a}_v{j}" != tv]
                            v = pool[k]
                    if ATTR_TYPES[a] == "quantity" and len(v) > 3:
                        v = f"{int(v):,}"
                    if spacey[si, ei, ai]:
                        v = v + " "
                    cells.append(v)
                lines.append("\t".join([s, e] + cells + ["x"]))
        with open(os.path.join(d, f"bucket-{b:02d}.tsv"), "w",
                  encoding="ISO-8859-1") as fh:
            fh.write("\n".join(lines) + "\n")
    Path(marker).write_text(stamp)
    return d


def generate_events_csv_gz(sf_dir: str,
                           root: str = "/tmp/trustfuse_ray_data") -> str:
    """Materialize the events table as gzip-compressed CSV shards — the
    compressed-text dump format web-scale ingestion commonly starts
    from.  Deterministic byte-for-byte (sorted by event_id, ISO
    timestamps, fixed header), 4 shards by ``event_id % 4`` so the read
    parallelizes."""
    import csv
    import gzip

    out = cache_dir(sf_dir, root)
    d = os.path.join(out, "events_csv_gz")
    marker = os.path.join(out, "_EVENTS_CSV_SUCCESS")
    stamp = "v1 " + sf_name(sf_dir)
    if os.path.exists(marker) and Path(marker).read_text() == stamp:
        return d
    os.makedirs(d, exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    rows = sorted(t.to_pylist(), key=lambda r: r["event_id"])
    shards = [[] for _ in range(4)]
    for r in rows:
        shards[r["event_id"] % 4].append(r)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for i, shard in enumerate(shards):
        path = os.path.join(d, f"events-{i:02d}.csv.gz")
        with gzip.open(path, "wt", newline="") as fh:
            w = csv.writer(fh)
            w.writerow(cols)
            for r in shard:
                w.writerow([r["event_id"], r["ts"].isoformat(sep=" "),
                            r["user_id"], r["event_type"],
                            repr(r["value"]), r["props"]])
    Path(marker).write_text(stamp)
    return d


def generate_events_orc(sf_dir: str,
                        root: str = "/tmp/trustfuse_ray_data") -> str:
    """Materialize the events table as ORC shards (4 files by
    ``event_id % 4``, rows sorted by event_id) — a columnar format Ray
    Data has no native reader for, exercising the custom-datasource
    ingestion pattern (binary file → Arrow decode per block)."""
    from pyarrow import orc as _orc

    out = cache_dir(sf_dir, root)
    d = os.path.join(out, "events_orc")
    marker = os.path.join(out, "_EVENTS_ORC_SUCCESS")
    stamp = "v1 " + sf_name(sf_dir)
    if os.path.exists(marker) and Path(marker).read_text() == stamp:
        return d
    os.makedirs(d, exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    import pyarrow.compute as _pc
    order = _pc.sort_indices(t, sort_keys=[("event_id", "ascending")])
    t = t.take(order)
    part = _pc.bit_wise_and(t["event_id"], 3)
    for i in range(4):
        mask = _pc.equal(part, i)
        _orc.write_table(t.filter(mask),
                         os.path.join(d, f"events-{i:02d}.orc"))
    Path(marker).write_text(stamp)
    return d


def generate_events_feather(sf_dir: str,
                            root: str = "/tmp/trustfuse_ray_data") -> str:
    """Materialize the events table as Arrow IPC (Feather v2) shards —
    the zero-copy interchange format analytics tools hand off in; Ray
    Data has no native reader, so ingestion goes through the same
    custom-datasource pattern as ORC (binary file → per-block decode)."""
    from pyarrow import feather as _feather

    out = cache_dir(sf_dir, root)
    d = os.path.join(out, "events_feather")
    marker = os.path.join(out, "_EVENTS_FEATHER_SUCCESS")
    stamp = "v1 " + sf_name(sf_dir)
    if os.path.exists(marker) and Path(marker).read_text() == stamp:
        return d
    os.makedirs(d, exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    import pyarrow.compute as _pc
    order = _pc.sort_indices(t, sort_keys=[("event_id", "ascending")])
    t = t.take(order)
    part = _pc.bit_wise_and(t["event_id"], 3)
    for i in range(4):
        mask = _pc.equal(part, i)
        _feather.write_feather(
            t.filter(mask), os.path.join(d, f"events-{i:02d}.feather"),
            compression="zstd")
    Path(marker).write_text(stamp)
    return d
