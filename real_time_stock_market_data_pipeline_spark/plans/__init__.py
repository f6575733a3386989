from .queries import QUERIES, flagship  # noqa: F401
from .oracles import ORACLES  # noqa: F401
from .indicator_parity import INDICATOR_ORACLES
from .text_parity import TEXT_ORACLES
from .embedding_parity import EMBEDDING_ORACLES

ORACLES.update(INDICATOR_ORACLES)
ORACLES.update(TEXT_ORACLES)
ORACLES.update(EMBEDDING_ORACLES)

# ---------------------------------------------------------------------------
# Registration order = the order the driver checks queries in; round 1's
# CORRECTNESS file recorded rows for the FIRST 50 registrations only, so
# ordering is part of the correctness-evidence budget.  Policy:
#   1. families with NEW or previously-missing evidence first (the round-1
#      run never reached dd2-dd5/emb1-emb4; u2-u4 were no_oracle; j2/j4/
#      p4/s13/emb5 are new this round);
#   2. then one representative per SURVEY §2 row;
#   3. the tail: queries already green in CORRECTNESS_r01.json whose shape
#      duplicates an earlier entry (sk1 = salted twin of a4, o4/o5 = the
#      same TakeOrdered/WindowGroupLimit ops as o1/w1, q1 generalizes a4,
#      ...).  They re-verify opportunistically if the window allows and
#      remain pytest-parity-covered (tests/test_parity.py checks ALL).
# ---------------------------------------------------------------------------
_PRIORITY = [
    # 1 — new/previously-unchecked evidence
    "dd2_ngram_jaccard", "dd3_minhash_signatures", "dd4_minhash_candidates",
    "dd5_simhash", "emb1_knn_cosine", "emb2_label_centroids",
    "emb3_lsh_near_dup", "emb4_ivf_topk", "emb5_ivf_trained_recall",
    "emb6_centered_lsh",
    "u2_arima_forecast", "u3_linreg_metrics", "u4_linreg_predictions",
    "j2_analytics_dashboard", "j4_prediction_dashboard",
    "j10_asof_quote", "j11_range_join", "p4_recent_window",
    "s13_model_roundtrip",
    # 2 — one representative per SURVEY row
    "p7_validated_ticks", "p9_dedup_ticks", "p3_time_window_filter",
    "j1_tick_dashboard", "j5_dim_lookup",
    "j6_region_revenue", "j7_orders_without_big_lineitems",
    "j8_industry_rollup", "a3_active_series",
    "a4_daily_summary", "w1_latest_per_day",
    "f1_scalar_suite",
    "w2_sma", "w3_ema", "w4_rsi", "w5_bollinger", "w6_macd",
    "w7_volatility", "w8_price_change", "w9_ml_features",
    "t6_alerts", "p8_extreme_filter", "w_all_indicators",
    "w10_throttled_volatility", "j3_alert_feed",
    "txt1_token_stats", "txt2_quality", "txt3_langid", "txt4_fingerprint",
    "txt5_bpe_tokens", "dd1_exact_dedup",
    # 3 — already evidenced (r01 green row and/or a dedicated plan test)
    "p5_equality_filter", "o3_training_fetch", "o1_top_events",
    "a1_grouped_max",
    "su1_set_ops", "sk1_salted_daily_summary", "q1_pricing_summary",
    "t9_session_windows", "mm1_media_meta", "o4_latest_row",
    "o5_price_history", "a2_global_max", "a6_hourly_counts",
    "d1_distinct_event_types", "p6_flag_filter", "o6_sorted_rollup",
    "a7_dup_detection",
]

_missing = [n for n in _PRIORITY if n not in QUERIES]
_unlisted = [n for n in QUERIES if n not in _PRIORITY]
assert not _missing, f"priority list names unknown queries: {_missing}"
assert not _unlisted, f"queries missing from priority list: {_unlisted}"

_ordered = {name: QUERIES[name] for name in _PRIORITY}
QUERIES.clear()
QUERIES.update(_ordered)
