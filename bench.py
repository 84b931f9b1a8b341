"""Benchmark driver.

Headline: the flagship KG pipeline (extract → link/canon → fusion) over the
deterministic synthetic transcript corpus for $GRAFT_SF_DIR (default
/root/testdata/sf0.1), plus representative operator pipelines.  Prints ONE
JSON line.

``--scaling``: runs the headline pipeline twice in fresh processes at
num_cpus=8 and num_cpus=32 on the same input and reports throughput at both
plus scaling efficiency = (T8/T32)/4 — the sandbox stand-in for N vs 4N
cluster nodes (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _run_benchmarks(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             log_to_driver=False)
    from trustfuse_ray import synth
    from trustfuse_ray.fuse import make_model
    from trustfuse_ray.fuse.base import pack_facts, run_fusion_packed
    from trustfuse_ray.pipelines.kg import build_claims
    from trustfuse_ray.pipelines import queries as Q
    from trustfuse_ray.stages.dedup import minhash_lsh_pairs
    from trustfuse_ray.stages.windows import sessionize

    data_dir = synth.generate(sf_dir)  # cached; excluded from timings
    timings: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    claims = timed("kg_extract_link",
                   lambda: build_claims(data_dir).materialize())
    counts["claims"] = claims.count()
    packed = timed("pack_facts", lambda: pack_facts(claims).materialize())

    for model in ("Voting", "CRH", "TruthFinder"):
        def _fuse(m=model):
            triples, _ = run_fusion_packed(packed, make_model(m),
                                           materialize=False)
            return triples.materialize()
        t = timed(f"fuse_{model.lower()}", _fuse)
        counts[f"triples_{model.lower()}"] = t.count()
        if model == "CRH":
            timed("write_triples", lambda: t.write_parquet(
                os.path.join("/tmp/trustfuse_ray_bench", "triples")))

    timed("minhash_dedup", lambda: minhash_lsh_pairs(
        Q._tbl(sf_dir, "documents"), threshold=0.5).materialize())
    timed("sessionize", lambda: sessionize(
        Q._tbl(sf_dir, "events")).materialize())
    timed("q1_pricing_summary",
          lambda: Q.q1_pricing_summary(sf_dir).materialize())
    timed("ann_topk", lambda: Q.q_ann_topk(sf_dir).materialize())

    kg_secs = (timings["kg_extract_link"] + timings["pack_facts"]
               + timings["fuse_crh"])
    result = {
        "metric": "trustfuse_ray kg pipeline + operator suite wall time",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": os.path.basename(sf_dir.rstrip("/")),
        "num_cpus": num_cpus,
        "fused_triples_per_sec": round(
            counts["triples_crh"] / kg_secs, 1) if kg_secs else None,
        "claims": counts["claims"],
        "triples": counts["triples_crh"],
    }
    ray.shutdown()
    return result


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--_single" in sys.argv:
        print(json.dumps(_run_benchmarks(sf_dir, num_cpus)))
        return

    if "--scaling" in sys.argv:
        results = {}
        for cpus in (8, 32):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus),
                       GRAFT_SF_DIR=sf_dir)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--_single"],
                env=env, capture_output=True, text=True, check=True)
            results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])
        kg8 = (results[8]["queries"]["kg_extract_link"]
               + results[8]["queries"]["pack_facts"]
               + results[8]["queries"]["fuse_crh"])
        kg32 = (results[32]["queries"]["kg_extract_link"]
                + results[32]["queries"]["pack_facts"]
                + results[32]["queries"]["fuse_crh"])
        tp8 = results[8]["triples"] / kg8
        tp32 = results[32]["triples"] / kg32
        print(json.dumps({
            "metric": "kg pipeline scaling efficiency 8→32 cpus",
            "value": round((tp32 / tp8) / 4, 3),
            "unit": "efficiency",
            "sf": results[8]["sf"],
            "throughput_8cpu_triples_per_sec": round(tp8, 1),
            "throughput_32cpu_triples_per_sec": round(tp32, 1),
            "total_secs_8cpu": results[8]["value"],
            "total_secs_32cpu": results[32]["value"],
            "queries_8cpu": results[8]["queries"],
            "queries_32cpu": results[32]["queries"],
        }))
        return

    print(json.dumps(_run_benchmarks(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
