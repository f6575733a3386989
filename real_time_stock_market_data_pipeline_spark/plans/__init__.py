from .queries import QUERIES, flagship  # noqa: F401
from .oracles import ORACLES  # noqa: F401
from .indicator_parity import INDICATOR_ORACLES
from .text_parity import TEXT_ORACLES
from .embedding_parity import EMBEDDING_ORACLES

ORACLES.update(INDICATOR_ORACLES)
ORACLES.update(TEXT_ORACLES)
ORACLES.update(EMBEDDING_ORACLES)

# ---------------------------------------------------------------------------
# Registration order = the order the driver checks queries in; the driver's
# CORRECTNESS file records rows for the FIRST 50 registrations only, so
# ordering is part of the correctness-evidence budget.  The window is
# ROTATED each round so every query gets a fresh driver row at least every
# other round.  Round-7 rotation policy:
#   1. sp2_stratified_sample FIRST — the round's one red r06 row (oracle
#      HUGEINT→BIGINT cast fixed this round) must re-verify;
#   2. the 43 queries whose newest driver row is r05 (rotated out of the
#      r06 window) — they'd otherwise go two rounds stale;
#   3. queries NEW or CHANGED this round: txt8 (distributed segmentation
#      path), txt9/t10/sp5 (new), dd6/dd7 (large-star/small-star
#      connected components underneath).
#   That fills the 50 slots exactly.  The tail (every query green in
#   CORRECTNESS_r06 and unchanged) re-verifies opportunistically and stays
#   covered every run by tests/test_parity.py at sf0.001 and by the
#   pre-commit parity harness at sf0.01 (102/102 this round).
# ---------------------------------------------------------------------------
_PRIORITY = [
    # 1 — the red r06 row, freshly fixed
    "sp2_stratified_sample",
    # 2 — newest driver row is r05: rotate back in
    "dd3_minhash_signatures", "dd4_minhash_candidates",
    "dd5_simhash", "emb1_knn_cosine", "emb2_label_centroids",
    "emb3_lsh_near_dup", "emb6_centered_lsh",
    "j2_analytics_dashboard", "j4_prediction_dashboard",
    "j11_range_join", "p4_recent_window",
    "p7_validated_ticks", "p9_dedup_ticks", "p3_time_window_filter",
    "j1_tick_dashboard", "j6_region_revenue",
    "j7_orders_without_big_lineitems", "j8_industry_rollup",
    "a4_daily_summary", "w1_latest_per_day", "w_all_indicators",
    "p5_equality_filter", "p6_flag_filter", "o1_top_events",
    "o3_training_fetch", "o4_latest_row", "o5_price_history",
    "o6_sorted_rollup", "a1_grouped_max", "a2_global_max",
    "a6_hourly_counts", "a7_dup_detection", "d1_distinct_event_types",
    "su1_set_ops", "sk1_salted_daily_summary", "q1_pricing_summary",
    "t9_session_windows", "mm1_media_meta",
    "j10_asof_quote", "s13_model_roundtrip", "u2_arima_forecast",
    "u3_linreg_metrics", "u4_linreg_predictions",
    # 3 — new or changed this round (fills the window to exactly 50)
    "txt8_bpe_tokenize", "txt9_bpe_incremental", "t10_throttle",
    "sp5_sequence_packing", "dd6_dup_clusters", "dd7_dedup_summary",
    # 4 — tail: green r06 rows, unchanged this round; parity-gate-pinned
    # (emb7 exercises the same new CC code as dd6/dd7, which hold window
    # slots; its distributed/driver path equality is pytest-pinned)
    "emb7_embedding_clusters", "dd2_ngram_jaccard", "txt5_bpe_tokens",
    "f1_scalar_suite", "dd1_exact_dedup",
    "w2_sma", "w3_ema", "w4_rsi", "w5_bollinger", "w6_macd",
    "w7_volatility", "w8_price_change", "w9_ml_features",
    "txt1_token_stats", "txt2_quality", "txt3_langid", "txt4_fingerprint",
    "w10_throttled_volatility", "p8_extreme_filter",
    "j5_dim_lookup", "a3_active_series",
    "mm3_bmp_pixel_stats", "mm4_wav_stats", "mm5_avi_frame_stats",
    "mm6_png_roundtrip_stats", "flagship", "s14_arima_registry",
    "mm2_image_dims", "t6_alerts", "j3_alert_feed",
    "emb4_ivf_topk", "emb5_ivf_trained_recall", "s9_analytics_upsert",
    "sp1_hash_split", "dq1_expectations", "a9_sketch_rollup",
    "dd8_contamination", "txt6_vocab", "txt7_bpe_merges",
    "emb8_ivf_index_search",
    "a10_value_histogram", "a11_daily_type_pivot", "a12_rollup_sets",
    "sp3_capped_per_group", "sp4_balanced_mixture", "dq2_volume_anomalies",
    # txt10/sp6/sp7/a13/w11/emb9 are NEW in r7 but the window is budgeted;
    # they are parity-pinned now and take window slots in the r8 rotation
    "txt10_repetition", "sp6_temperature_mixture", "sp7_corpus_pipeline",
    "a13_ohlc_candles", "w11_vwap", "emb9_quantized_recall",
    "dd10_exact_decontamination", "txt11_pii_redaction",
    "dd9_incremental_minhash",
]

_missing = [n for n in _PRIORITY if n not in QUERIES]
_unlisted = [n for n in QUERIES if n not in _PRIORITY]
assert not _missing, f"priority list names unknown queries: {_missing}"
assert not _unlisted, f"queries missing from priority list: {_unlisted}"

_ordered = {name: QUERIES[name] for name in _PRIORITY}
QUERIES.clear()
QUERIES.update(_ordered)
