"""Fusion model registry (reference: settings.MODEL_MAP,
`/root/reference/settings.py:70-108`)."""

from trustfuse_ray.fuse.base import FusionModel, pack_facts, run_fusion
from trustfuse_ray.fuse.crh import CRH
from trustfuse_ray.fuse.truthfinder import TruthFinder
from trustfuse_ray.fuse.voting import Voting


def model_map() -> dict:
    from trustfuse_ray.fuse.accu import Accu
    from trustfuse_ray.fuse.catd import CATD
    from trustfuse_ray.fuse.gtm import GTM
    from trustfuse_ray.fuse.kdem import KDEm
    from trustfuse_ray.fuse.slimfast import SLiMFast

    return {"Voting": Voting, "CRH": CRH, "TruthFinder": TruthFinder,
            "ACCU": Accu, "CATD": CATD, "GTM": GTM, "KDEm": KDEm,
            "SLIMFAST": SLiMFast}


MODEL_PARAMETERS = {
    "Voting": {},
    "CRH": {"max_itr": 10},
    "TruthFinder": {"max_itr": 10},
    "CATD": {},
    "GTM": {},
    "KDEm": {},
    "ACCU": {},
    "SLIMFAST": {},
}


def make_model(name: str, **overrides) -> FusionModel:
    params = dict(MODEL_PARAMETERS.get(name, {}))
    params.update(overrides)
    return model_map()[name](**params)


__all__ = ["FusionModel", "pack_facts", "run_fusion", "Voting", "CRH",
           "TruthFinder", "make_model", "model_map", "MODEL_PARAMETERS"]
