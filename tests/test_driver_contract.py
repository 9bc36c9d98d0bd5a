"""Driver-contract stability: every queries() entry keeps its column names
(the driver's value-hash compare sorts columns by NAME — silent renames would
desync the Ray result from its SQL oracle), every oracle key has a query, and
entry() produces the flagship violation schema."""

import json

import pytest

EXPECTED_COLUMNS = json.loads("""
{"anti_join_customers_without_orders": ["c_custkey"], "anti_join_shuffle": ["c_custkey"], "asof_join_events": ["event_id", "ckpt_ts", "ckpt_value"], "chunk_docs": ["doc_id", "chunk_id", "chunk"], "clean_docs": ["doc_id", "text_clean"], "curated_docs": ["doc_id"], "curated_docs_neardup": ["doc_id"], "customer_balance_quartiles": ["c_custkey", "c_nationkey", "quartile"], "customer_order_counts": ["c_custkey", "n_orders", "spend_cents"], "dedup_docs_keep_min": ["doc_id"], "distinct_parts": ["n_distinct"], "doc_langid": ["doc_id", "lang_pred"], "doc_length_buckets": ["bucket", "n_docs", "total_tokens", "padded_tokens", "pad_waste"], "dup_custkeys_orders": ["o_custkey", "dup_count"], "embedding_dim_stats": ["pos", "n", "mean_v", "vmin", "vmax"], "embedding_dup_groups": ["vec_id", "rep"], "embedding_near_dup_lsh": ["a", "b"], "embedding_pairs_cos03": ["a", "b"], "events_hourly": ["event_type", "hour", "n", "total"], "events_in_sessions": ["event_id", "session_start", "session_end"], "events_lag_gap": ["event_id", "user_id", "gap_us"], "events_sessionized": ["event_id", "session_start", "session_end"], "events_sessions_30m": ["user_id", "session_start", "session_end", "n_events"], "events_sliding_1h": ["event_id", "cnt_window"], "events_sliding_value_1h": ["event_id", "sum_window"], "events_type_pivot": ["hour_of_day", "cnt_click", "cnt_error", "cnt_purchase", "cnt_signup", "cnt_view"], "fingerprint_docs": ["doc_id", "fingerprint"], "group_distinct": ["event_type", "distinct_users", "hll_ok"], "group_quantiles": ["l_returnflag", "med", "p50_ok"], "hamming_pairs_orders": ["a", "b", "hamming"], "images_drift": ["column", "metric", "ok"], "images_phash_neardup": ["a", "b", "hamming"], "images_resize": ["rows", "ok_rows"], "images_rule_counts": ["rule_id", "n"], "images_validate": ["image_id", "rule_id", "column", "offending_value"], "knn_embeddings": ["query_id", "neighbor_id"], "knn_ivf": ["query_id", "neighbor_id", "score"], "lang_distribution": ["lang", "n"], "lang_drift_psi": ["psi_value", "drift_ok"], "lineitem_quantiles_exact": ["q", "value"], "minhash_pairs_docs": ["a", "b", "jaccard_est"], "multimodal_audio": ["audio_id", "n_samples", "rms", "zero_crossings", "band_energy"], "multimodal_video": ["video_id", "frame_index", "frame"], "ngram_jaccard_docs": ["a", "b", "jaccard"], "orders_join_customer": ["c_mktsegment", "n_orders", "revenue"], "orders_running_total": ["o_orderkey", "o_custkey", "running_cents"], "pack_docs_greedy": ["doc_id", "pack_id", "oversize"], "prepare_training_data": ["doc_id", "split", "pack_id"], "prepare_training_data_chunked": ["doc_id", "chunk_id", "split", "pos", "pack_id"], "pricing_summary": ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price", "count_order"], "profile_lineitem": ["column_name", "cnt", "nulls", "vmin", "vmax"], "profile_sketches": ["column_name", "distinct_cnt", "med", "sketch_ok"], "redact_docs": ["doc_id", "redacted", "n_email", "n_phone"], "region_nation_counts": ["r_name", "n_nations"], "revenue_by_nation": ["n_name", "n_orders", "revenue"], "revenue_rollup": ["r_name", "n_name", "revenue_cents"], "rules_customer": ["c_custkey", "rule_id", "col"], "rules_documents": ["doc_id", "rule_id", "col"], "rules_embeddings": ["vec_id", "rule_id", "col"], "rules_events": ["event_id", "rule_id", "col"], "rules_lineitem_crossfield": ["l_orderkey", "rule_id", "col"], "rules_orders": ["o_orderkey", "rule_id", "col"], "rules_orders_cond": ["o_orderkey", "rule_id", "col"], "rules_part_supplier": ["row_key", "rule_id", "col", "tbl"], "sample_docs_hash": ["doc_id"], "shuffle_docs": ["doc_id", "pos"], "simhash_pairs_docs": ["a", "b", "hamming"], "split_docs": ["doc_id", "split"], "stratified_docs_by_lang": ["doc_id", "lang"], "text_quality": ["doc_id", "quality"], "token_counts": ["doc_id", "n_tokens"], "top_customers": ["o_custkey", "n_orders"], "top_orders_per_customer": ["o_custkey", "o_orderkey"], "unique_orderkeys": ["o_orderkey", "dup_count"], "verdicts_customer_by_segment": ["partition", "rows", "failed_rows"], "violation_counts_customer": ["rule_id", "n"], "vocab_topk": ["word", "cnt"], "doc_repetition": ["doc_id", "n_lines", "dup_line_frac", "dup_token_frac", "top_token_frac"], "decontaminate_docs": ["doc_id", "lang", "source"], "weighted_sample_docs": ["doc_id", "lang", "n_chars"], "source_overlap": ["source_a", "source_b", "n_shared"], "label_centroids": ["label", "pos", "n", "mean_v", "vmin", "vmax"], "events_value_outliers": ["event_id", "event_type", "value"], "source_quality_report": ["source", "n_docs", "n_tokens", "avg_quality", "avg_dup_token_frac"], "frequent_users": ["user_id", "n"], "events_props_stats": ["event_type", "n_with_k", "sum_k", "min_k", "max_k"], "latest_event_per_user": ["event_id", "ts", "user_id", "event_type", "value"], "top_event_type_per_user": ["user_id", "event_type", "cnt"], "lineitem_corr": ["l_returnflag", "n", "corr"], "lineitem_rank": ["l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "rank", "dense_rank", "pct_rank"], "tfidf_terms": ["doc_id", "term", "score"], "docs_quality_band": ["doc_id", "quality"], "events_cube": ["event_type", "hour_of_day", "n", "vmin", "vmax"], "nations_agg": ["r_name", "nations", "n_nations"], "events_hourly_uniques": ["hour", "n_users"], "nation_counts_full_outer": ["nationkey", "n_customers", "n_suppliers"], "dup_orders_composite": ["o_custkey", "o_orderdate", "dup_count"], "events_moving_avg": ["event_id", "user_id", "avg_w"], "cap_docs_per_source": ["doc_id", "source"], "user_hours_click_and_purchase": ["user_id", "hour"], "user_hours_click_no_purchase": ["user_id", "hour"], "price_histogram": ["bin", "n"], "doc_char_entropy": ["doc_id", "char_entropy"], "revenue_by_nationkey_salted": ["c_nationkey", "n_orders", "revenue_cents"], "order_price_median": ["o_orderpriority", "med_price"], "order_price_share": ["o_orderkey", "o_orderpriority", "price_share"], "part_name_typo_pairs": ["a", "b"], "embedding_covariance": ["i", "j", "cov"], "customers_with_orders": ["c_custkey"], "events_lead_gap": ["event_id", "user_id", "gap_us"], "events_since_first": ["event_id", "user_id", "since_us"], "user_event_type_entropy": ["user_id", "type_entropy"], "knn_self_join": ["vec_id", "neighbor_id"], "knn_join_ivf": ["vec_id", "neighbor_id"], "embedding_kmeans": ["vec_id", "cluster"], "events_mad_outliers": ["event_id", "event_type", "value"], "events_funnel": ["user_id", "t1", "t2", "t3"], "events_chi2": ["chi2", "dof", "n"], "lineitem_price_pctrank": ["l_orderkey", "l_linenumber", "l_extendedprice", "rank", "dense_rank", "pct_rank"], "label_diversity": ["label", "n", "mean_cos"], "mix_docs_budget": ["doc_id", "source", "n_chars"], "events_value_trend": ["event_type", "n", "slope", "intercept"], "events_cohort_retention": ["cohort", "offset", "n_users"], "events_ab_ttest": ["t", "dof", "n_a", "n_b", "mean_a", "mean_b"], "part_name_typo2_pairs": ["a", "b"], "lineitem_qty_quartiles": ["l_returnflag", "p25", "med", "p75"], "lineitem_price_winsorized": ["l_orderkey", "l_linenumber", "l_returnflag", "price_w"], "supplier_part_cooccur": ["a", "b", "n_shared"], "part_name_linkage": ["a", "b"], "events_resurrected": ["event_id", "user_id", "gap_us"], "click_then_purchase": ["event_id", "user_id", "next_us"], "events_distinct_types_running": ["event_id", "user_id", "n_types"], "knn_pq": ["query_id", "neighbor_id"]}
""")


def _columns_of(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pa.Table):
        return list(res.column_names)
    if isinstance(res, pd.DataFrame):
        return list(res.columns)
    return list(res.schema().names)


def test_registry_shape():
    import __ray_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(EXPECTED_COLUMNS) == set(qs), (
        "queries() drifted from the recorded contract — update "
        "EXPECTED_COLUMNS deliberately when adding/removing queries")
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 53


@pytest.mark.parametrize("name", sorted(EXPECTED_COLUMNS))
def test_query_columns_stable(name, ray_session):
    import __ray_entry__ as E

    res = E.queries()[name]("/root/testdata/sf0.001")
    assert _columns_of(res) == EXPECTED_COLUMNS[name], name
