"""North-rule gate, verified against the ACTUAL reference implementation
running on its own corpus (not just our sequential oracles): CRH on one
Flight daily bucket must agree on ≥ 95% of fused truths.

Full multi-corpus results (Book, Flight, WikiConflict; CRH, TruthFinder,
CATD, GTM) are produced by ``python tools/reference_parity.py`` and recorded
in BASELINE.md; this test keeps the fastest pair in the pytest gate.
"""

import os

import pytest


@pytest.mark.skipif(not os.path.isdir("/root/reference"),
                    reason="reference checkout not available")
def test_crh_flight_parity_vs_reference():
    from tools.reference_parity import (DATASETS, _flight_subset,
                                        run_ours, run_reference)

    spec = dict(DATASETS["flight"])
    spec["folder"] = _flight_subset()
    ref = run_reference("CRH", spec)
    ref = {((e.lstrip("0") or "0") if e.isdigit() else e, a): v
           for (e, a), v in ref.items()}
    ours = run_ours("CRH", spec)

    def norm(vals):
        out = set()
        for v in vals:
            try:
                out.add(repr(float(v)))
            except (TypeError, ValueError):
                out.add(str(v))
        return out

    common = set(ref) & set(ours)
    agree = sum(1 for k in common if norm(ours[k]) & norm(ref[k]))
    p = agree / len(ours)
    r = agree / len(ref)
    assert p >= 0.95 and r >= 0.95, (p, r)
