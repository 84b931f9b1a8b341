"""Round-5 wave 16: Kendall tau between retriever rankings."""


def test_rank_correlation_self_consistent():
    """End-to-end on sf0.001: the tau identity conc+disc == C(n,2) holds
    and tau is within [-1000, 1000]."""
    from trustfuse_ray.pipelines.queries import q_rank_correlation

    row = q_rank_correlation("/root/testdata/sf0.001").take_all()[0]
    n = row["n_common"]
    assert row["n_pairs"] == n * (n - 1) // 2
    assert row["concordant"] + row["discordant"] == row["n_pairs"]
    assert -1000 <= row["tau_permille"] <= 1000
    if row["n_pairs"]:
        expect = ((row["concordant"] - row["discordant"]) * 1000
                  ) // row["n_pairs"]
        # floor((C-D)*1000/P) == integer floor-division for both signs
        assert row["tau_permille"] == expect


def test_rank_correlation_matches_scipy_kendall():
    """The permille statistic agrees with an independent O(n^2) tau-a
    computed straight from the two rank maps."""
    import duckdb

    from trustfuse_ray.pipelines.queries import (oracle_sql_map,
                                                 q_rank_correlation)

    sf = "/root/testdata/sf0.001"
    got = q_rank_correlation(sf).take_all()[0]
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    exp = con.execute(oracle_sql_map(sf)["rank_correlation"]).df().iloc[0]
    for c in ("n_common", "n_pairs", "concordant", "discordant",
              "tau_permille"):
        assert got[c] == int(exp[c]), (c, got[c], exp[c])
