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
# other round.  Round-13 rotation policy (executes the r12 verdict's item 1
# exactly — CORRECTNESS_r12 was 50/50 green, so every query rotates in on
# evidence age alone):
#   1. the 40 r10-green queries FROZEN out of the r12 window lead — their
#      newest driver row is r10 and turns three rounds old otherwise
#      (named as mandatory r13 leads in the r12 policy note and the r12
#      verdict: section-3 overflow a1_grouped_max..mm1_media_meta plus the
#      whole frozen section 4 emb12_incremental_pq..j5_dim_lookup);
#   2. queries NEW this round: emb20 (D4 prototype diversification —
#      drop the top-drop_frac most-prototypical members per cluster,
#      Tirumala et al. 2023), dd14 (snapshot-aware exact dedup with the
#      keep-LATEST recency policy over the normalized full-URL key),
#      mm12 (multimodal sequence packing: joint token+patch budget,
#      whole-doc next-fit, images never split), dq4 (index recall-drift
#      monitor + rebuild_ivf_index retrain-and-swap lifecycle), and
#      sp13 (sp12's pipeline gated by the TRAINED txt18 classifier,
#      with per-domain rule-vs-model disagreement), and txt20 (CCNet
#      head/middle/tail perplexity buckets per language — the graded
#      form txt15's binary gate ships as, with the per-bucket cut
#      values in the rows);
#   3. the r11-green queries in their r11-window order, oldest evidence
#      first, fill the remaining slots to exactly 50;
#   FROZEN FOR R14 (named, deliberate): the r11-green queries that do not
#   fit wait one round — each is pytest-parity-pinned at sf0.001 every
#   run, and each family keeps a driver row in this window (the emb4/5/8
#   IVF shapes ride emb9/emb12-emb14's in-window rows; the mm2-mm9
#   perceptual shapes ride mm1/mm10's in-window rows; dd1/dd8/dd11 ride
#   dd2/dd9/dd10/dd12/dd13's in-window rows; the sp1/sp3/sp4/sp9 sampling
#   shapes ride sp6-sp8's in-window rows; w2/w3/w12-w14 ride
#   w4-w11's in-window rows).  They MUST lead the r14 window, together
#   with any r12-green queries whose evidence is then two rounds old.
#   The 50 r12-green queries (CORRECTNESS_r12, zero failures) form the
#   tail in their r12-window order; the whole registry stays covered
#   every run by tests/test_parity.py at sf0.001 and the pre-commit
#   parity harness at sf0.01.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # 1 — r10-green, frozen out of the r12 window: mandatory r13 leads
    "a1_grouped_max", "a2_global_max", "a6_hourly_counts",
    "d1_distinct_event_types", "su1_set_ops", "j1_tick_dashboard",
    "mm1_media_meta", "emb12_incremental_pq", "dq3_embedding_audit",
    "emb13_ivfpq_recall", "txt14_doc_retrieval",
    "dd12_neardup_decontamination", "mm10_crossmodal_decontamination",
    "dd13_compacted_table", "emb14_incremental_ivfpq",
    "sp8_decontaminated_pipeline", "txt10_repetition",
    "sp6_temperature_mixture", "sp7_corpus_pipeline", "a13_ohlc_candles",
    "w11_vwap", "emb9_quantized_recall", "dd10_exact_decontamination",
    "txt11_pii_redaction", "dd9_incremental_minhash",
    "emb7_embedding_clusters", "dd2_ngram_jaccard", "txt5_bpe_tokens",
    "f1_scalar_suite", "w4_rsi", "w5_bollinger", "w6_macd", "w7_volatility",
    "w8_price_change", "w9_ml_features", "txt2_quality", "txt3_langid",
    "w10_throttled_volatility", "p8_extreme_filter", "j5_dim_lookup",
    # 2 — new this round (window trimmed to 50 below)
    "emb20_d4_prototypes", "dd14_snapshot_dedup", "mm12_multimodal_packing",
    "dq4_index_recall_drift", "sp13_model_curated_corpus",
    "txt20_ccnet_buckets",
    # 3 — r11-green rotations, r11-window order (fill the window to 50)
    "a3_active_series", "mm3_bmp_pixel_stats", "mm4_wav_stats",
    "mm5_avi_frame_stats", "mm6_png_roundtrip_stats", "flagship",
    "s14_arima_registry", "mm2_image_dims", "t6_alerts", "j3_alert_feed",
    # 4 — r11-green, FROZEN FOR R14 (see policy note above)
    "emb4_ivf_topk", "emb5_ivf_trained_recall", "s9_analytics_upsert",
    "sp1_hash_split", "dq1_expectations", "a9_sketch_rollup",
    "dd8_contamination", "txt6_vocab", "txt7_bpe_merges",
    "emb8_ivf_index_search", "a10_value_histogram", "a11_daily_type_pivot",
    "a12_rollup_sets", "sp3_capped_per_group", "sp4_balanced_mixture",
    "dq2_volume_anomalies", "emb15_semantic_dedup",
    "emb16_semdedup_keep_policy", "mm11_triad_decontamination",
    "sp9_dup_aware_split", "emb17_incremental_semdedup",
    "txt15_perplexity_filter", "emb18_filtered_ann",
    "txt16_duplicated_ngrams", "dd1_exact_dedup", "w2_sma", "w3_ema",
    "txt1_token_stats", "txt4_fingerprint", "emb10_incremental_ivf",
    "txt12_bigram_lm", "txt13_feature_hash", "mm7_dhash_pairs",
    "w12_series_similarity", "w13_series_all_pairs",
    "dd11_incremental_decontamination", "mm8_audio_pairs", "mm9_video_pairs",
    "emb11_pq_recall", "w14_series_banded_neardup",
    # 5 — green in CORRECTNESS_r12 (zero failures), in r12-window order
    "sp2_stratified_sample", "dd3_minhash_signatures",
    "dd4_minhash_candidates", "dd5_simhash", "emb1_knn_cosine",
    "emb2_label_centroids", "emb3_lsh_near_dup", "emb6_centered_lsh",
    "j2_analytics_dashboard", "j4_prediction_dashboard", "j11_range_join",
    "p7_validated_ticks", "p9_dedup_ticks", "j6_region_revenue",
    "j7_orders_without_big_lineitems", "j8_industry_rollup",
    "a4_daily_summary", "w1_latest_per_day", "w_all_indicators",
    "o3_training_fetch", "sk1_salted_daily_summary", "q1_pricing_summary",
    "t9_session_windows", "j10_asof_quote", "s13_model_roundtrip",
    "u2_arima_forecast", "u3_linreg_metrics", "u4_linreg_predictions",
    "txt8_bpe_tokenize", "txt9_bpe_incremental", "t10_throttle",
    "sp5_sequence_packing", "dd6_dup_clusters", "dd7_dedup_summary",
    "txt17_span_dedup", "txt18_quality_classifier", "sp10_domain_caps",
    "sp11_domain_mixture", "emb19_filtered_ivfpq",
    "txt19_incremental_span_dedup", "sp12_curated_corpus",
    "p3_time_window_filter", "p4_recent_window", "p5_equality_filter",
    "p6_flag_filter", "a7_dup_detection", "o1_top_events", "o4_latest_row",
    "o5_price_history", "o6_sorted_rollup",
]

_missing = [n for n in _PRIORITY if n not in QUERIES]
_unlisted = [n for n in QUERIES if n not in _PRIORITY]
assert not _missing, f"priority list names unknown queries: {_missing}"
assert not _unlisted, f"queries missing from priority list: {_unlisted}"

_ordered = {name: QUERIES[name] for name in _PRIORITY}
QUERIES.clear()
QUERIES.update(_ordered)
