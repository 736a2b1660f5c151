"""Replicates the driver's correctness gate locally at sf0.001:
run every queries() entry AND its oracle_sql() through DuckDB over the same
parquet views, then compare row count + schema + order-insensitive values.
"""

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import importlib
    import sys
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m
    importlib.reload(m)
    return m


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def compare(name, ours: pd.DataFrame, oracle: pd.DataFrame):
    a, b = normalize(ours), normalize(oracle)
    assert list(a.columns) == list(b.columns), \
        f"{name} columns: {list(a.columns)} vs {list(b.columns)}"
    assert len(a) == len(b), f"{name} rows: {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if a[c].dtype.kind == "f":
            import numpy as np
            assert np.allclose(av.astype(float), bv.astype(float),
                               rtol=0, atol=1e-9, equal_nan=True), \
                f"{name}.{c} float mismatch"
        else:
            assert (av == bv).all(), f"{name}.{c} value mismatch"


def oracle_names(entry_mod):
    return sorted(entry_mod.oracle_sql().keys())


def test_all_queries_have_unique_names(entry_mod):
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25


@pytest.mark.parametrize("name", [
    "q1_pricing_summary", "top_orders", "customers_per_region",
    "referential_lineitem_orders", "events_by_type", "uniqueness_orders",
    "profile_lineitem", "validate_orders", "validate_lineitem",
    "orders_violation_counts", "dedup_docs_exact", "dup_groups_prefix24",
    "token_count_docs", "quality_docs", "lang_id_docs", "fingerprint_docs",
    "ann_topk", "embedding_neardup", "ngram_jaccard_docs",
    "ann_topk_ivf",
    "skew_lineitem", "histogram_lineitem", "q3_shipping",
    "q3_shipping_priority", "q12_shipping_delay_bands",
])
def test_query_matches_oracle(entry_mod, con, name):
    qs = entry_mod.queries()
    sql = entry_mod.oracle_sql()[name]
    ours = to_pandas(qs[name](SF_DIR))
    oracle = con.execute(sql).df()
    compare(name, ours, oracle)


@pytest.mark.parametrize("name", [
    "clips_validation", "clips_violation_counts", "grouped_stats_codec",
    "speaking_rate_clips",
    "profile_sketches_lineitem", "drift_lineitem", "minhash_lsh_docs",
    "simhash_docs", "embedding_neardup_lsh",
    "media_image_features", "media_frame_sample", "audio_features_clips",
    "audio_pitch_clips", "audio_cmvn_clips", "kmeans_embeddings", "audio_specaugment_clips", "cluster_balanced_sample",
    "embedding_pca_evr", "embedding_linear_probe", "bpe_train_docs",
    "audio_loudnorm_clips",
])
def test_rows_only_queries_run(entry_mod, name):
    out = to_pandas(entry_mod.queries()[name](SF_DIR))
    assert out is not None
    assert len(out.columns) > 0


def test_entry_smoke(entry_mod):
    out = to_pandas(entry_mod.entry())
    assert len(out) >= 1
    assert out["n"].iloc[0] > 0


@pytest.mark.parametrize("name", [
    "orders_by_segment", "events_tumbling_hour", "events_sessions",
    "normalize_docs", "repetition_docs", "pii_docs", "contamination_docs",
    "shuffle_docs", "pack_docs", "drift_psi_bins_lineitem",
    "events_user_windows", "docs_ntile", "custkeys_without_orders",
    "referential_shuffle_lineitem", "events_pivot_hour_bands",
    "lineitem_median_qty", "docs_string_agg", "oov_docs",
    "dup_clusters_docs", "quantiles_lineitem", "lineitem_mode_qty",
    "grouped_distinct_lineitem", "corr_lineitem", "rollup_lineitem",
    "unigram_logprob_docs", "top_tokens_docs", "events_gapfill_hour",
    "winsorize_lineitem", "fd_part_supplier", "tfidf_docs", "funnel_click_purchase",
    "retention_weekly", "interval_join_events", "chunk_docs",
    "zscore_lineitem", "grouped_p90_lineitem", "mixture_docs",
    "percent_rank_lineitem", "event_bigrams",
    "embedding_dup_clusters",
    "events_lag_delta", "events_throttle", "q5_nation_revenue",
    "q10_returned_revenue", "repeat_customers",
    "q13_order_distribution", "q18_large_orders", "weighted_sample_docs",
    "copurchase_parts", "weighted_avg_lineitem",
    "mad_lineitem", "user_entropy_events", "centroids_embeddings",
    "customer_spend_deciles", "big_spenders", "brand_share",
    "weekly_revenue_wow", "gini_spend", "ship_latency_by_priority",
    "latest_event_per_user_type", "events_rle_compress",
    "top_event_by_value_per_user", "docs_percentrank_by_source",
    "lineitem_unpivot", "events_conditional_agg",
    "revenue_trend_theilsen", "null_profile_lineitem",
    "events_rolling_stats", "weekly_hhi_by_segment",
    "wau_rolling_7d", "chi2_event_weekday", "heavy_hitter_parts",
    "regr_slope_lineitem",
    "orders_with_high_discount", "parts_all_low_discount",
    "q4_late_orders", "q14_promo_share", "q17_small_qty_revenue",
    "q19_disjunctive_revenue", "q22_idle_rich_customers",
    "covar_lineitem", "customer_cume_dist", "dense_rank_brands",
    "cube_lineitem", "percentile_cont_lineitem", "events_lead_delta",
    "supplier_balance_by_region", "partkeys_union",
    "first_event_per_user", "props_k_stats",
    "customer_order_gap_median", "events_dow_hour_heatmap",
    "part_color_counts", "priority_label_counts", "quarterly_revenue",
    "embedding_component_stats", "spearman_lineitem",
    "session_duration_stats", "weighted_median_qty",
    "order_line_coverage", "orders_above_segment_avg",
    "user_twap_value", "events_ohlc_hourly", "user_growth_daily",
    "grouping_sets_lineitem", "trimmed_mean_qty",
    "orders_1997_high_value", "join_skew_profile",
    "events_type_share_daily", "corr_matrix_lineitem",
    "mutual_info_flag_status",
    "q6_forecast_revenue", "q7_volume_shipping", "q8_market_share",
    "q15_top_supplier", "q21_waiting_suppliers",
    "kl_source_divergence_docs", "length_band_docs",
])
def test_new_query_matches_oracle(entry_mod, con, name):
    qs = entry_mod.queries()
    sql = entry_mod.oracle_sql()[name]
    ours = to_pandas(qs[name](SF_DIR))
    oracle = con.execute(sql).df()
    compare(name, ours, oracle)
