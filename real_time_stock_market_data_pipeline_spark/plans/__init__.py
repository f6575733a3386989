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
# other round.  Round-5 rotation policy:
#   1. the 17 queries whose only driver row is from round 1 (stale three
#      rounds: p5/p6/o1/o3-o6/a1/a2/a6/a7/d1/su1/sk1/q1/t9/mm1) go first;
#   2. then queries CHANGED this round (asof fix -> j10, score_latest fix
#      -> s13/u2-u4, emb5 trainer cost, j3 plan) plus one representative
#      per SURVEY §2 family;
#   3. the tail: queries green in CORRECTNESS_r02-r04 for three consecutive
#      rounds AND pinned by dedicated pytest parity/plan tests (w2-w9,
#      txt1-5, f1, dd1, w10, p8, j5, a3).  They re-verify opportunistically
#      and remain pytest-parity-covered (tests/test_parity.py checks ALL).
# ---------------------------------------------------------------------------
_PRIORITY = [
    # 1 — stale since round 1: rotate into the driver window first
    "p5_equality_filter", "p6_flag_filter", "o1_top_events",
    "o3_training_fetch", "o4_latest_row", "o5_price_history",
    "o6_sorted_rollup", "a1_grouped_max", "a2_global_max",
    "a6_hourly_counts", "a7_dup_detection", "d1_distinct_event_types",
    "su1_set_ops", "sk1_salted_daily_summary", "q1_pricing_summary",
    "t9_session_windows", "mm1_media_meta",
    # 2 — changed this round or family representative
    "j10_asof_quote", "s13_model_roundtrip", "u2_arima_forecast",
    "u3_linreg_metrics", "u4_linreg_predictions",
    "emb5_ivf_trained_recall", "j3_alert_feed",
    "s9_analytics_upsert", "mm2_image_dims", "mm3_bmp_pixel_stats",
    "dd2_ngram_jaccard", "dd3_minhash_signatures", "dd4_minhash_candidates",
    "dd5_simhash", "emb1_knn_cosine", "emb2_label_centroids",
    "emb3_lsh_near_dup", "emb4_ivf_topk", "emb6_centered_lsh",
    "j2_analytics_dashboard", "j4_prediction_dashboard",
    "j11_range_join", "p4_recent_window",
    "p7_validated_ticks", "p9_dedup_ticks", "p3_time_window_filter",
    "j1_tick_dashboard", "j6_region_revenue",
    "j7_orders_without_big_lineitems", "j8_industry_rollup",
    "a4_daily_summary", "w1_latest_per_day",
    "t6_alerts", "w_all_indicators",
    # 3 — three-rounds-green (r02-r04) and pytest-pinned
    "f1_scalar_suite", "dd1_exact_dedup",
    "w2_sma", "w3_ema", "w4_rsi", "w5_bollinger", "w6_macd",
    "w7_volatility", "w8_price_change", "w9_ml_features",
    "txt1_token_stats", "txt2_quality", "txt3_langid", "txt4_fingerprint",
    "txt5_bpe_tokens",
    "w10_throttled_volatility", "p8_extreme_filter",
    "j5_dim_lookup", "a3_active_series",
]

_missing = [n for n in _PRIORITY if n not in QUERIES]
_unlisted = [n for n in QUERIES if n not in _PRIORITY]
assert not _missing, f"priority list names unknown queries: {_missing}"
assert not _unlisted, f"queries missing from priority list: {_unlisted}"

_ordered = {name: QUERIES[name] for name in _PRIORITY}
QUERIES.clear()
QUERIES.update(_ordered)
