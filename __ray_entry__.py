"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module; nothing
here (or in trustfuse_ray) calls ``ray.init``/``ray.shutdown``.

``entry``: flagship KG pipeline (extract → link/canon → CRH fusion) over the
deterministic synthetic transcript corpus derived from sf0.001.
``queries`` / ``oracle_sql``: one entry per implemented operator/pipeline
(SURVEY.md §2 + training-data operators); see
trustfuse_ray/pipelines/queries.py.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from trustfuse_ray.pipelines.kg import run_kg_pipeline

    triples, _weights = run_kg_pipeline("/root/testdata/sf0.001", model="CRH")
    return triples


def queries() -> dict[str, Callable[[str], Any]]:
    from trustfuse_ray.pipelines.queries import queries_map

    return queries_map()


def oracle_sql() -> dict[str, str]:
    from trustfuse_ray.pipelines.queries import oracle_sql_map

    return oracle_sql_map("/root/testdata/sf0.01")
