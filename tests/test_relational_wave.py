"""Execution parity for the round-5 relational wave (TPC-H Q6/Q15/Q16/
Q18/Q19/Q22 shapes) at sf0.001 — the driver's correctness protocol
(column-name set, row count, order-insensitive values) against the same
DuckDB oracles the driver runs at sf0.01."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from selfcheck import normalize, to_pandas, values_equal  # noqa: E402

SF = "/root/testdata/sf0.001"
WAVE = ["q6_forecast_revenue", "q15_top_supplier", "q16_supplier_cnt",
        "q18_large_volume_customer", "q19_disjunctive_revenue",
        "q22_global_sales_opportunity", "rollup_revenue", "events_pivot",
        "events_set_ops", "embedding_gram", "pca_project",
        "orders_above_cust_avg", "nation_revenue_share",
        "events_daily_dense", "embedding_outliers",
        "q7_volume_shipping", "q8_market_share", "q9_product_profit",
        "q12_late_priority", "q13_customer_distribution",
        "q17_small_quantity_revenue", "q21_waiting_suppliers",
        "q2_min_cost_supplier", "q11_important_stock",
        "q20_part_promotion", "refusal_hedge_profile", "kg_calibration",
        "customer_spend_ntile", "customer_order_reconciliation",
        "transcripts_jsonl_profile", "claims_tsv_ingest",
        "er_pair_quality", "corpus_shard_stats", "dedup_cluster_quality",
        "kg_source_retraction", "er_blocking_quality", "ann_recall_at_k",
        "events_late_profile", "conv_context_amplification",
        "boolean_retrieval", "q1_incremental", "claims_tsv_fuse_voting",
        "multimodal_wav_features", "kmeans_clusters", "mmr_diverse",
        "kg_hits", "kg_triple_lineage", "shard_overlap_matrix",
        "export_jsonl_manifest", "claims_tsv_roundtrip",
        "kg_model_agreement"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM "
              f"read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", WAVE)
def test_relational_wave_matches_oracle(ray_session, con, name):
    from trustfuse_ray.pipelines.queries import oracle_sql_map, queries_map

    got = normalize(to_pandas(queries_map()[name](SF)))
    want = normalize(con.sql(oracle_sql_map(SF)[name]).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    assert values_equal(got, want), f"{name}: value mismatch"
