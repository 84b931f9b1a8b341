"""Registry-level regression guards: driver-window ordering and oracle
SQL compilability (EXPLAIN, no execution) for every registered query."""

import duckdb
import pytest


def test_driver_window_is_first_50_and_oracled():
    from trustfuse_ray.pipelines.queries import (_DRIVER_WINDOW,
                                                 _NO_ORACLE_TAIL,
                                                 oracle_sql_map,
                                                 queries_map)

    q = queries_map()
    names = list(q)
    assert names[:50] == _DRIVER_WINDOW
    assert len(set(_DRIVER_WINDOW)) == 50
    omap = oracle_sql_map("/root/testdata/sf0.01")
    missing = [n for n in _DRIVER_WINDOW if n not in omap]
    assert missing == [], f"window entries without oracles: {missing}"
    # the documented oracle-less rows stay pinned at the very end
    assert names[-len(_NO_ORACLE_TAIL):] == _NO_ORACLE_TAIL


def test_every_oracle_compiles():
    from trustfuse_ray import synth
    from trustfuse_ray.pipelines.queries import oracle_sql_map

    sf = "/root/testdata/sf0.01"
    synth.generate(sf)
    synth.generate_documents(sf)
    synth.generate_multiline_documents(sf)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf}/{t}.parquet')")
    bad = []
    for name, sql in oracle_sql_map(sf).items():
        try:
            con.sql(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e).splitlines()[0]))
    assert bad == [], f"oracles failed to compile: {bad}"
