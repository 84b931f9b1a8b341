"""LTM — Latent Truth Model (multi-truth), faithful to
`/root/reference/trustfuse/models/ltm.py:7-290`.

LTM is per-attribute: value-level boolean facts with a per-source confusion
matrix SHARED across all entities of the attribute, inferred by collapsed
Gibbs sampling — inherently sequential within an attribute.  Distributed
shape: one hash-partitioned shuffle on (bucket_id, attr); each group task
runs the full sampler locally with an RNG seeded from (bucket_id, attr)
(the reference uses the unseeded global ``random`` — SURVEY.md §7.5).

Semantics kept:
* boolean-claim IR with synthesized NEGATIVE claims: a source that covered
  an entity under this attr but did not assert value v gets a "0" claim for
  (entity, v) (ltm.py:117-166);
* priors alpha_set=[[50,50],[100,10000]], beta_set=[10,10] mapped through
  the reference's reversed indexing (ltm.py:32-39);
* collapsed-Gibbs flip probability p_tf/(ptf+p_tf) with the −1 count
  correction on the current cell (ltm.py:183-223);
* samples collected per fact when i > burnin and i % thin == 0, averaged
  over sample_size = max_itr//thin − burnin//thin (ltm.py:178-229);
* multi-truth output: values with posterior ≥ output_threshold (0.9);
* source quality = Bayesian recall/specificity (ltm.py:253-290).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from trustfuse_ray.stages.common import fnv64, hash_group_apply


def _ltm_group(batch: pa.Table, *, max_itr: int, burnin: int, thin: int,
               threshold: float, alpha_set, beta_set,
               output: str = "triples") -> pa.Table:
    order = pc.sort_indices(batch, sort_keys=[("claim_id", "ascending")])
    batch = batch.take(order)
    bid = batch["bucket_id"][0].as_py()
    attr = batch["attr"][0].as_py()
    ents = batch["entity"].to_pylist()
    vals = batch["value_str"].to_pylist()
    srcs = batch["source"].to_pylist()
    vtype = batch["value_type"][0].as_py()

    # boolean-claim IR (ltm.py:117-166)
    fid_of: dict[tuple, int] = {}
    fact_entity: list[str] = []
    fact_value: list[str] = []
    claims: list[dict[str, str]] = []  # fid -> {source: "1"/"0"}
    entity_fids: dict[str, list[int]] = {}
    source_entities: dict[str, list[str]] = {}
    for e, v, s in zip(ents, vals, srcs):
        key = (e, v)
        if key not in fid_of:
            fid_of[key] = len(fact_entity)
            fact_entity.append(e)
            fact_value.append(v)
            claims.append({})
            entity_fids.setdefault(e, []).append(fid_of[key])
        claims[fid_of[key]][s] = "1"
        source_entities.setdefault(s, []).append(e)
    for s, covered in source_entities.items():
        for e in covered:
            for f in entity_fids[e]:
                if s not in claims[f]:
                    claims[f][s] = "0"

    # priors with the reference's reversed indexing:
    # alpha[str(i)][str(j)] = alpha_set[1-i][1-j]; beta[str(i)] = beta_set[1-i]
    alpha = {str(i): {str(j): alpha_set[1 - i][1 - j] for j in (0, 1)}
             for i in (0, 1)}
    beta = {str(i): beta_set[1 - i] for i in (0, 1)}

    rng = np.random.default_rng(fnv64(f"ltm|{bid}|{attr}"))
    n_facts = len(fact_entity)
    truth = ["1" if rng.uniform(0, 1) >= 0.5 else "0"
             for _ in range(n_facts)]
    prob = [0.0] * n_facts
    sample_size = max_itr // thin - burnin // thin

    # per-source confusion counts n[source][truth][claim]
    sm: dict[str, dict[str, dict[str, int]]] = {}
    for f in range(n_facts):
        for s, c in claims[f].items():
            m = sm.setdefault(s, {"0": {"0": 0, "1": 0},
                                  "1": {"0": 0, "1": 0}})
            m[truth[f]][c] += 1

    for i in range(1, max_itr + 1):
        for f in range(n_facts):
            tv = truth[f]
            itv = str(1 - int(tv))
            ptf = beta[tv]
            p_tf = beta[itv]
            for s, c in claims[f].items():
                ic = str(1 - int(c))
                m = sm[s]
                ptf = (ptf * (m[tv][c] - 1 + alpha[tv][c])
                       / (m[tv][c] + m[tv][ic] - 1
                          + alpha[tv][c] + alpha[tv][ic]))
                p_tf = (p_tf * (m[itv][c] + alpha[itv][c])
                        / (m[itv][c] + m[itv][ic]
                           + alpha[itv][c] + alpha[itv][ic]))
            if rng.uniform(0, 1) < p_tf / (ptf + p_tf):
                truth[f] = itv
                for s, c in claims[f].items():
                    sm[s][tv][c] -= 1
                    sm[s][itv][c] += 1
            if i > burnin and i % thin == 0 and sample_size > 0:
                prob[f] += int(truth[f]) / sample_size

    # multi-truth emission (ltm.py:240-250)
    rows = {"bucket_id": [], "entity": [], "attr": [], "value_str": [],
            "value_num": [], "value_type": [], "conf": [], "n_claims": [],
            "winner_claim_id": []}
    for f in range(n_facts):
        if prob[f] >= threshold:
            rows["bucket_id"].append(bid)
            rows["entity"].append(fact_entity[f])
            rows["attr"].append(attr)
            rows["value_str"].append(fact_value[f])
            try:
                rows["value_num"].append(float(fact_value[f])
                                         if vtype == "quantity" else None)
            except ValueError:
                rows["value_num"].append(None)
            rows["value_type"].append(vtype)
            rows["conf"].append(prob[f])
            rows["n_claims"].append(
                sum(1 for c in claims[f].values() if c == "1"))
            rows["winner_claim_id"].append(-1)

    # source quality (ltm.py:253-290): soft confusion under posterior probs
    q = {s: {"tp": 0.0, "fn": 0.0, "tn": 0.0, "fp": 0.0} for s in sm}
    for f in range(n_facts):
        for s, c in claims[f].items():
            if c == "1":
                q[s]["tp"] += prob[f]
                q[s]["fp"] += 1 - prob[f]
            else:
                q[s]["fn"] += prob[f]
                q[s]["tn"] += 1 - prob[f]
    a_tp, a_fn = alpha["1"]["1"], alpha["1"]["0"]
    a_tn, a_fp = alpha["0"]["0"], alpha["0"]["1"]
    wq = {"bucket_id": [], "attr": [], "source": [], "recall": [],
          "specificity": []}
    for s in sorted(q):
        d = q[s]
        wq["bucket_id"].append(bid)
        wq["attr"].append(attr)
        wq["source"].append(s)
        wq["recall"].append(
            (d["tp"] + a_tp) / (d["tp"] + d["fn"] + a_tp + a_fn))
        wq["specificity"].append(
            (d["tn"] + a_tn) / (d["tn"] + d["fp"] + a_tn + a_fp))

    triples = pa.table({
        "bucket_id": pa.array(rows["bucket_id"], pa.int32()),
        "entity": pa.array(rows["entity"], pa.string()),
        "attr": pa.array(rows["attr"], pa.string()),
        "value_str": pa.array(rows["value_str"], pa.string()),
        "value_num": pa.array(rows["value_num"], pa.float64()),
        "value_type": pa.array(rows["value_type"], pa.string()),
        "conf": pa.array(rows["conf"], pa.float64()),
        "n_claims": pa.array(rows["n_claims"], pa.int32()),
        "winner_claim_id": pa.array(rows["winner_claim_id"], pa.int64()),
    })
    if output == "quality":
        return quality_table(wq)
    return triples


def quality_table(wq) -> pa.Table:
    return pa.table({
        "bucket_id": pa.array(wq["bucket_id"], pa.int32()),
        "attr": pa.array(wq["attr"], pa.string()),
        "source": pa.array(wq["source"], pa.string()),
        "recall": pa.array(wq["recall"], pa.float64()),
        "specificity": pa.array(wq["specificity"], pa.float64()),
    })


def run_ltm(claims, max_itr: int = 10, burnin: int = 8, thin: int = 2,
            threshold: float = 0.9,
            alpha_set=((50, 50), (100, 10000)), beta_set=(10, 10),
            n_parts: int = 64, output: str = "triples"):
    """claims Dataset → multi-truth triples Dataset (LTM); pass
    ``output="quality"`` for the per-(attr, source) recall/specificity table.

    The shuffle key is (bucket_id, attr): the sampler needs every fact of an
    attribute in one task (shared source confusion matrix)."""
    return hash_group_apply(
        claims, ["bucket_id", "attr"],
        functools.partial(_ltm_group, max_itr=max_itr, burnin=burnin,
                          thin=thin, threshold=threshold,
                          alpha_set=alpha_set, beta_set=beta_set,
                          output=output),
        n_parts=n_parts)


def _neg_group(g: pa.Table) -> pa.Table:
    """One (bucket, attr, entity) group → its boolean claim grid."""
    bid = g["bucket_id"][0].as_py()
    attr = g["attr"][0].as_py()
    ent = g["entity"][0].as_py()
    vals = g["value_str"].to_pylist()
    srcs = g["source"].to_pylist()
    uv = sorted(set(vals))
    us = sorted(set(srcs))
    vi = {v: i for i, v in enumerate(uv)}
    si = {s: i for i, s in enumerate(us)}
    lab = np.zeros((len(us), len(uv)), dtype=np.int32)
    for v, s in zip(vals, srcs):
        lab[si[s], vi[v]] = 1
    ns, nv = len(us), len(uv)
    return pa.table({
        "bucket_id": pa.array(np.full(ns * nv, bid, dtype=np.int32)),
        "entity": pa.array([ent] * (ns * nv), pa.string()),
        "attr": pa.array([attr] * (ns * nv), pa.string()),
        "value_str": pa.array(list(uv) * ns, pa.string()),
        "source": pa.array(np.repeat(np.array(us, dtype=object), nv),
                           pa.string()),
        "label": pa.array(lab.ravel(), pa.int32()),
    })


def ltm_negative_claims(claims, n_parts: int = 64):
    """The DETERMINISTIC half of LTM: the boolean-claim IR with synthesized
    negative claims (reference ltm.py:117-166) — a source that covered an
    entity under an attribute but did not assert value v gets a "0" claim
    for (entity, v); asserting sources get "1".

    Pure set algebra (unlike the Gibbs chain), so it is SQL-expressible and
    sits under the hash-match correctness gate.  Shape: map-side distinct
    combiner (the shuffle moves only distinct assertion rows), then ONE
    hash exchange on (bucket_id, attr, entity); each group emits its
    |sources| × |values| grid — bounded by per-entity fan-in, never a
    global product.

    Returns Dataset(bucket_id, entity, attr, value_str, source, label).
    """
    keep = ["bucket_id", "entity", "attr", "value_str", "source"]

    def _distinct(batch: pa.Table) -> pa.Table:
        batch = batch.select(keep).filter(pc.is_valid(batch["value_str"]))
        return pa.TableGroupBy(batch, keep, use_threads=False).aggregate([])

    combined = claims.map_batches(_distinct, batch_format="pyarrow",
                                  zero_copy_batch=True)
    return hash_group_apply(
        combined, ["bucket_id", "attr", "entity"], _neg_group,
        n_parts=n_parts,
        plasma_schema=pa.schema([
            ("bucket_id", pa.int32()), ("entity", pa.string()),
            ("attr", pa.string()), ("value_str", pa.string()),
            ("source", pa.string()), ("label", pa.int32())]))
