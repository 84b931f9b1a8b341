"""Round-5 wave 16: distributed Pareto skyline — planted dominance cases."""

import numpy as np
import pyarrow as pa


def _block(rows):
    return pa.table({
        "p_partkey": pa.array([r[0] for r in rows], pa.int64()),
        "p_size": pa.array([r[1] for r in rows], pa.int64()),
        "price_cents": pa.array([r[2] for r in rows], pa.int64())})


def _keys(tbl):
    return sorted(tbl["p_partkey"].to_pylist())


def test_skyline_block_basic_dominance():
    from trustfuse_ray.pipelines.queries import _skyline_block

    # (size, price): (10, 500) dominates (9, 600) and (10, 700);
    # (20, 900) survives (bigger size), (5, 100) survives (cheaper).
    rows = [(1, 10, 500), (2, 9, 600), (3, 10, 700),
            (4, 20, 900), (5, 5, 100)]
    assert _keys(_skyline_block(_block(rows))) == [1, 4, 5]


def test_skyline_block_ties_all_survive():
    from trustfuse_ray.pipelines.queries import _skyline_block

    # identical (size, price) pairs do not dominate each other
    rows = [(1, 10, 500), (2, 10, 500), (3, 10, 501)]
    assert _keys(_skyline_block(_block(rows))) == [1, 2]


def test_skyline_block_strict_dominance_same_price():
    from trustfuse_ray.pipelines.queries import _skyline_block

    # same price, larger size dominates
    rows = [(1, 10, 500), (2, 11, 500)]
    assert _keys(_skyline_block(_block(rows))) == [2]


def test_skyline_local_prune_is_lossless():
    from trustfuse_ray.pipelines.queries import _skyline_block

    # block-split invariance: skyline(skyline(A) U skyline(B)) ==
    # skyline(A U B) for a seeded random point set
    rng = np.random.default_rng(7)
    n = 400
    rows = [(i, int(rng.integers(1, 40)), int(rng.integers(100, 9999)))
            for i in range(n)]
    whole = _keys(_skyline_block(_block(rows)))
    a, b = _block(rows[:137]), _block(rows[137:])
    merged = pa.concat_tables([_skyline_block(a), _skyline_block(b)])
    split = _keys(_skyline_block(merged.combine_chunks()))
    assert split == whole and len(whole) >= 1


def test_part_skyline_matches_quadratic_oracle():
    import duckdb

    from trustfuse_ray.pipelines.queries import q_part_skyline

    sf0001 = "/root/testdata/sf0.001"
    got = (q_part_skyline(sf0001).to_pandas()
           .sort_values("p_partkey").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM "
                f"read_parquet('{sf0001}/part.parquet')")
    exp = con.execute("""
        WITH v AS (SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
                          CAST(round(p_retailprice * 100) AS BIGINT)
                            AS price_cents FROM part)
        SELECT * FROM v WHERE NOT EXISTS (
          SELECT 1 FROM v o
          WHERE o.p_size >= v.p_size AND o.price_cents <= v.price_cents
            AND (o.p_size > v.p_size OR o.price_cents < v.price_cents))
        ORDER BY p_partkey""").df()
    assert got["p_partkey"].tolist() == exp["p_partkey"].tolist()
    assert got["price_cents"].tolist() == exp["price_cents"].tolist()
