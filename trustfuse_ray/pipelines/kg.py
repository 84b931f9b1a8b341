"""Flagship end-to-end KG-construction pipeline (north star):

read transcripts → triple extraction (actor pool) → entity linking +
canonicalization (actor pool, broadcast alias index) → fusion (conflict
resolution per canonical entity via the single packed-fact shuffle) →
fused triple Parquet with per-partition lineage.

Reference lifecycle analog: `/root/reference/fusion_pipeline.py:30-109`
re-targeted from Wikidata revisions to conversation transcripts
(SURVEY.md §3.3).
"""

from __future__ import annotations

import json
import os

import ray.data

from trustfuse_ray import synth
from trustfuse_ray.fuse import make_model, run_fusion
from trustfuse_ray.stages.extract import extract_triples
from trustfuse_ray.stages.link import link_and_canonicalize


def read_transcripts(data_dir: str):
    """Parquet transcripts reader; one file per conv-hash partition."""
    return ray.data.read_parquet(os.path.join(data_dir, "transcripts"))


def build_claims(data_dir: str, concurrency: int | tuple = (1, 8)):
    """transcripts → canonical long claim table (extraction + linking)."""
    with open(os.path.join(data_dir, "attr_types.json")) as fh:
        attr_types = json.load(fh)
    transcripts = read_transcripts(data_dir)
    mentions = extract_triples(transcripts, concurrency=concurrency)
    return link_and_canonicalize(
        mentions, os.path.join(data_dir, "aliases.parquet"), attr_types,
        concurrency=concurrency)


def run_kg_pipeline(sf_dir: str, model: str = "CRH", out_dir: str | None = None,
                    concurrency: int | tuple = (1, 8), **model_kwargs):
    """Full pipeline over the synthetic corpus for ``sf_dir``.

    Returns (triples Dataset, weights dict). If ``out_dir`` is given the
    triples are written as Parquet with a source-weights sidecar.
    """
    data_dir = synth.generate(sf_dir)
    claims = build_claims(data_dir, concurrency=concurrency)
    triples, weights = run_fusion(claims, make_model(model, **model_kwargs))
    if out_dir:
        triples = triples.materialize()
        triples.write_parquet(os.path.join(out_dir, "triples"))
        with open(os.path.join(out_dir, "source_weights.json"), "w") as fh:
            json.dump({str(b): w for b, w in weights.items()}, fh, indent=1)
    return triples, weights
