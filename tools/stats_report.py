"""Capture ds.stats() for the headline pipeline stages → BENCH_STATS.md.

Evidence artifact for per-stage wall-time tuning (the Ray Data stats dump
shows where time goes: task counts, per-stage wall/cpu time, block sizes).
Usage: python tools/stats_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS",
                                                          "32")),
             include_dashboard=False, log_to_driver=False)
    from trustfuse_ray import synth
    from trustfuse_ray.fuse import make_model
    from trustfuse_ray.fuse.base import FusionSession, pack_facts
    from trustfuse_ray.pipelines.kg import build_claims

    data_dir = synth.generate(sf_dir)
    sections = []

    t0 = time.perf_counter()
    claims = build_claims(data_dir).materialize()
    sections.append(("extract + link + canonicalize (fused warm-task pool)",
                     time.perf_counter() - t0, claims.stats()))

    t0 = time.perf_counter()
    packed = pack_facts(claims).materialize()
    sections.append(("fact packing (hash-partitioned shuffle)",
                     time.perf_counter() - t0, packed.stats()))

    t0 = time.perf_counter()
    session = FusionSession(packed, materialize=False)
    triples, _ = session.run(make_model("CRH"))
    triples = triples.materialize()
    sections.append(("CRH fusion (10 rounds, shard-actor pool) + emit",
                     time.perf_counter() - t0, triples.stats()))
    session.close()

    from trustfuse_ray.pipelines import queries as Q
    from trustfuse_ray.pipelines.curate import curate_documents

    t0 = time.perf_counter()
    packed_docs = curate_documents(Q._tbl(sf_dir, "documents")).materialize()
    sections.append(("doc curation (signals → filter → dedup → pack, "
                     "plasma exchanges)",
                     time.perf_counter() - t0, packed_docs.stats()))

    import ray.data as rd

    from trustfuse_ray.stages.curation import line_dedup

    lines_path = synth.generate_multiline_documents(sf_dir)
    t0 = time.perf_counter()
    ld = line_dedup(rd.read_parquet(lines_path)).materialize()
    sections.append(("line-level dedup (line-hash exchange → winner set → "
                     "co-partitioned reconstruct)",
                     time.perf_counter() - t0, ld.stats()))

    from trustfuse_ray.stages.graph import pagerank

    t0 = time.perf_counter()
    pr = pagerank(Q.und_edges_from_triples(triples), rounds=5).materialize()
    sections.append(("pagerank (5 fixed-point rounds, plasma exchanges "
                     "over the CRH property graph)",
                     time.perf_counter() - t0, pr.stats()))

    t0 = time.perf_counter()
    dsel = Q.q_dsir_select(sf_dir).materialize()
    sections.append(("dsir select (bucket fit → broadcast score → "
                     "histogram cutoff)",
                     time.perf_counter() - t0, dsel.stats()))

    out = ["# BENCH_STATS — ds.stats() for the headline pipeline stages",
           "",
           f"Input: {sf_dir} synthetic corpus "
           f"({claims.count()} claims → {triples.count()} triples), "
           f"num_cpus={int(ray.cluster_resources()['CPU'])}.", ""]
    for title, secs, stats in sections:
        out.append(f"## {title} — {secs:.2f}s wall")
        out.append("")
        out.append("```")
        out.append(stats.strip())
        out.append("```")
        out.append("")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_STATS.md"), "w") as fh:
        fh.write("\n".join(out))
    print("wrote BENCH_STATS.md")
    ray.shutdown()


if __name__ == "__main__":
    main()
