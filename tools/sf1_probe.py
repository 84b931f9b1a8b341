"""One-off sf1.0 (10× bench corpus) superlinearity probe (VERDICT r4 #6):
run the headline KG pipeline and minhash dedup once at 8 and at 32 CPUs on
the same input and record wall, throughput, and peak machine RSS — confirms
the linear walls observed sf0.2→sf0.4 hold another 2.5× and no stage (pack
shuffle, shard-actor RSS, line-dedup exchange) goes superlinear.

Usage: python tools/sf1_probe.py [sf_dir]   (default /root/testdata/sf1.0)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, os, sys, time
sys.path.insert(0, %(root)r)
import ray
cpus = int(os.environ["PROBE_CPUS"])
ray.init(address="local", num_cpus=cpus, include_dashboard=False,
         log_to_driver=False)
from trustfuse_ray import synth
from trustfuse_ray.fuse import make_model
from trustfuse_ray.fuse.base import FusionSession
from trustfuse_ray.pipelines.kg import build_claims
from trustfuse_ray.stages.dedup import minhash_lsh_pairs
import ray.data as rd
sf = os.environ["PROBE_SF_DIR"]
data_dir = synth.generate(sf)
docs_path = synth.generate_documents(sf)
t0 = time.perf_counter()
claims = build_claims(data_dir).materialize()
session = FusionSession(claims=claims)
try:
    triples, _ = session.run(make_model("CRH"))
    n = triples.count()
finally:
    session.close()
kg_secs = time.perf_counter() - t0
t0 = time.perf_counter()
pairs = minhash_lsh_pairs(rd.read_parquet(docs_path),
                          threshold=0.6).materialize()
mh_secs = time.perf_counter() - t0
print(json.dumps({"cpus": cpus, "kg_secs": round(kg_secs, 2),
                  "triples": n, "tps": round(n / kg_secs, 1),
                  "minhash_secs": round(mh_secs, 2),
                  "pairs": pairs.count(),
                  "claims": claims.count()}))
ray.shutdown()
"""


def _used_mib() -> int:
    with open("/proc/meminfo") as f:
        info = {l.split(":")[0]: int(l.split()[1]) for l in f}
    return (info["MemTotal"] - info["MemAvailable"]) // 1024


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    results = []
    for cpus in (8, 32):
        peak = {"v": 0}
        stop = threading.Event()

        def _sample():
            while not stop.is_set():
                peak["v"] = max(peak["v"], _used_mib())
                time.sleep(1)

        th = threading.Thread(target=_sample, daemon=True)
        th.start()
        env = dict(os.environ, PROBE_CPUS=str(cpus), PROBE_SF_DIR=sf)
        out = subprocess.run([sys.executable, "-c", _CHILD % {"root": ROOT}],
                             env=env, capture_output=True, text=True)
        stop.set()
        th.join()
        if out.returncode != 0:
            sys.stderr.write(out.stderr[-4000:])
            raise SystemExit(out.returncode)
        r = json.loads(out.stdout.strip().splitlines()[-1])
        r["peak_machine_rss_mib"] = peak["v"]
        results.append(r)
    tps = {r["cpus"]: r["tps"] for r in results}
    print(json.dumps({
        "metric": "sf1.0 superlinearity probe", "sf": os.path.basename(sf),
        "legs": results,
        "speedup_8_to_32": round(tps[32] / tps[8], 3),
    }))


if __name__ == "__main__":
    main()
