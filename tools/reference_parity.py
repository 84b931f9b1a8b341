"""Head-to-head parity: run the REFERENCE TrustFuse implementation on its
own Book corpus (with light stubs for its missing UI deps) and our engine on
the same files, then compare fused truths — the north rule's "matches the
reference's emitted triples on its own test inputs, P/R ≥ 0.95".

Usage: python tools/reference_parity.py [model]   (model ∈ Voting|CRH|TruthFinder)

Known benign divergences (tolerated by the 0.95 gate):
* the reference's ``set()`` iteration makes its own tie-breaks run-dependent;
  ours are deterministic (lexicographic);
* the reference keeps duplicate (source, value) re-assertions inside one
  bucket; we dedup them (its own dataset-construction semantics,
  generate_buckets.py:182-189).
"""

from __future__ import annotations

import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
BOOK = os.path.join(REF, "data/input_trustfuse/book")
BOOK_HEADER = ["Source", "ISBN", "Title", "Author list"]
BOOK_HEADER_GT = ["ISBN", "Author list"]
ATTR_TYPES = {"Title": "string", "Author list": "string"}


def _stub_reference_deps():
    """Fake the reference's UI-only imports (tqdm/tabulate/networkx/pyvis)
    so its core dataset+model code runs here."""
    def passthrough(it=None, *a, **kw):
        return it

    tqdm_mod = types.ModuleType("tqdm")
    tqdm_mod.tqdm = passthrough
    sys.modules.setdefault("tqdm", tqdm_mod)

    tab = types.ModuleType("tabulate")
    tab.tabulate = lambda *a, **kw: ""
    sys.modules.setdefault("tabulate", tab)

    nx = types.ModuleType("networkx")

    class DiGraph:  # only used by DynamicDataset partial orders
        def __init__(self, *a, **kw):
            self._node = {}

    nx.DiGraph = DiGraph
    sys.modules.setdefault("networkx", nx)

    pyvis = types.ModuleType("pyvis")
    pyvis_net = types.ModuleType("pyvis.network")

    class Network:
        def __init__(self, *a, **kw):
            pass

    pyvis_net.Network = Network
    pyvis.network = pyvis_net
    sys.modules.setdefault("pyvis", pyvis)
    sys.modules.setdefault("pyvis.network", pyvis_net)

    # scipy.stats.chi2.cdf → our regularized-incomplete-gamma stand-in
    from trustfuse_ray.functions.similarity import chi2_cdf

    scipy = types.ModuleType("scipy")
    stats = types.ModuleType("scipy.stats")

    class _Chi2:
        @staticmethod
        def cdf(x, df):
            return chi2_cdf(x, df)

    stats.chi2 = _Chi2()
    scipy.stats = stats
    sys.modules.setdefault("scipy", scipy)
    sys.modules.setdefault("scipy.stats", stats)


def run_reference(model_name: str):
    _stub_reference_deps()
    sys.path.insert(0, REF)
    from trustfuse.conflicting_dataset.dataset import StaticDataset

    with open(os.path.join(
            REF, "data/configurations/crh/book/"
                 "preprocess_configuration.json")) as fh:
        config = json.load(fh)

    class _P:  # progress shim with .tqdm
        @staticmethod
        def tqdm(it, *a, **kw):
            return it

    ds = StaticDataset(BOOK, headers=(BOOK_HEADER, BOOK_HEADER_GT),
                       entity_col_name="ISBN", attribute_types=ATTR_TYPES)
    ds.apply_data_preprocessing(config, progress=_P)
    ds.apply_metadata_preprocessing(config, progress=_P)

    if model_name == "CRH":
        from trustfuse.models.crh import CRH as RefModel
        model = RefModel(ds, progress=_P, max_itr=10)
    elif model_name == "TruthFinder":
        from trustfuse.models.truthfinder import TruthFinder as RefModel
        model = RefModel(ds, progress=_P, max_itr=10)
    else:
        raise SystemExit(f"unsupported reference model {model_name}")

    truths = {}
    for bid, inputs in model.model_input.items():
        results = model.fuse(ds, bid, inputs, progress=_P)
        for e, attrs in results[bid]["truth"].items():
            for a, vals in attrs.items():
                if vals and vals != [None]:
                    truths[(str(e), a)] = [str(v) for v in vals]
    return truths


def run_ours(model_name: str):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 log_to_driver=False)
    from trustfuse_ray.fuse import make_model, run_fusion
    from trustfuse_ray.sources.static import melt_to_claims, read_static_tsv
    from trustfuse_ray.stages.preprocess import (apply_preprocessing,
                                                 focus_attributes)

    wide = read_static_tsv(os.path.join(BOOK, "conflicting_data"),
                           BOOK_HEADER)
    claims = melt_to_claims(wide, entity_col="ISBN",
                            attrs=["Title", "Author list"],
                            attribute_types=ATTR_TYPES)
    config = [{"function": "extract_authors", "attributes": ["Author list"],
               "modify_structure": True}]
    claims = apply_preprocessing(claims, config)
    claims = focus_attributes(claims, attributes=["Author list"])
    triples, weights = run_fusion(claims, make_model(model_name),
                                  dedup_claims=False)
    ours = {}
    for r in triples.take_all():
        # pandas int-parses zero-padded ISBNs in the reference; normalize
        ours.setdefault((r["entity"].lstrip("0") or "0", r["attr"]),
                        []).append(r["value_str"])
    return ours


def main():
    model_name = sys.argv[1] if len(sys.argv) > 1 else "CRH"
    ref = run_reference(model_name)
    ref = {(e.lstrip("0") or "0", a): v for (e, a), v in ref.items()}
    ours = run_ours(model_name)

    common = set(ref) & set(ours)
    agree = sum(1 for k in common if set(ours[k]) & set(ref[k]))
    tp = agree
    p = tp / len(ours) if ours else 0
    r = tp / len(ref) if ref else 0
    print(json.dumps({
        "model": model_name,
        "reference_facts": len(ref),
        "engine_facts": len(ours),
        "common_keys": len(common),
        "agreeing_truths": agree,
        "precision_vs_reference": round(p, 4),
        "recall_vs_reference": round(r, 4),
        "gate": "PASS" if (p >= 0.95 and r >= 0.95) else "FAIL",
    }, indent=1))
    sys.exit(0 if (p >= 0.95 and r >= 0.95) else 1)


if __name__ == "__main__":
    main()
