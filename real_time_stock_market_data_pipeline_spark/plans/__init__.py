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
# other round.  Round-14 rotation policy (executes the r13 verdict's item 1
# exactly — CORRECTNESS_r13 was 50/50 green, so every query rotates in on
# evidence age alone):
#   1. the 46 r11-green queries FROZEN out of the r13 window lead — their
#      newest driver row is r11 and turns three rounds old otherwise
#      (named as mandatory r14 leads in the r13 policy note and the r13
#      verdict: the 6 fills displaced by the r13 new queries
#      mm6_png_roundtrip_stats..j3_alert_feed plus the whole frozen
#      section emb4_ivf_topk..w14_series_banded_neardup);
#   2. queries NEW this round: dq5 (recall-drift monitors + rebuild
#      lifecycle for the OTHER three index families — IVF-PQ serving
#      tier, flat PQ, semantic — matching dq4's IVF monitor), txt21
#      (DSIR importance resampling, Xie et al. 2023: hashed-n-gram
#      importance weights between a raw and a target distribution, then
#      weighted sampling), txt22 (BM25 retrieval: df-aggregate on the
#      token key, join-back, per-(query, doc) score, top-k), and dd15
#      (paragraph-hash dedup — the CCNet pre-LM step; the paragraph
#      unit sits between dd1's doc level and txt17's 13-gram spans);
#   3. the r12-green queries in their r12-window order, oldest evidence
#      first, fill the remaining slots to exactly 50;
#   FROZEN FOR R15 (named, deliberate): whatever r12-green queries do not
#   fit wait one round — each is pytest-parity-pinned at sf0.001 every
#   run.  They MUST lead the r15 window, together with any r13-green
#   queries whose evidence is then two rounds old.  The 50 r13-green
#   queries (CORRECTNESS_r13, zero failures) form the tail in their
#   r13-window order; the whole registry stays covered every run by
#   tests/test_parity.py at sf0.001 and the pre-commit parity harness
#   at sf0.01.
#   R15 WINDOW PLAN (committed r14): all four r14 new-query slots were
#   spent, so the round's four additional finished queries are STAGED
#   instead of registered (R15_STAGED below — sp14_doremi_mixture,
#   sp15_curriculum_shards, dd16_semantic_decontamination,
#   mm13_image_text_alignment; parity-pinned by tests/test_staged_r15.py).
#   At r15: promote all four into QUERIES/ORACLES and put them in the
#   window TOGETHER WITH 46 of the 49 r12-green queries (r12-window
#   order, oldest first) = exactly 50;
#   the displaced r12-green tail entries wait for r16 — legal under the
#   no-starvation policy because inside/outside evidence both bottom out
#   at r12 (max(inside) <= min(outside) holds), and every further new
#   r15 query can displace one more r12 fill under the same argument.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # 1 — r11-green, frozen out of the r13 window: mandatory r14 leads
    # (the 6 fills displaced by the six new r13 queries first, then the
    # frozen-for-r14 block in its committed order)
    "mm6_png_roundtrip_stats", "flagship", "s14_arima_registry",
    "mm2_image_dims", "t6_alerts", "j3_alert_feed",
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
    # 2 — new this round (window trimmed to 50 below)
    "dq5_serving_drift_monitors", "txt21_dsir_resample",
    "txt22_bm25_retrieval", "dd15_paragraph_dedup",
    # 3 — green in CORRECTNESS_r12 (zero failures), r12-window order;
    #     entries past slot 50 are FROZEN FOR R15
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
    # 4 — green in CORRECTNESS_r13 (zero failures), r13-window order
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
    "emb20_d4_prototypes", "dd14_snapshot_dedup", "mm12_multimodal_packing",
    "dq4_index_recall_drift", "sp13_model_curated_corpus",
    "txt20_ccnet_buckets", "a3_active_series", "mm3_bmp_pixel_stats",
    "mm4_wav_stats", "mm5_avi_frame_stats",
]

_missing = [n for n in _PRIORITY if n not in QUERIES]
_unlisted = [n for n in QUERIES if n not in _PRIORITY]
assert not _missing, f"priority list names unknown queries: {_missing}"
assert not _unlisted, f"queries missing from priority list: {_unlisted}"

_ordered = {name: QUERIES[name] for name in _PRIORITY}
QUERIES.clear()
QUERIES.update(_ordered)

# --- STAGED FOR R15 -----------------------------------------------------------
# Finished queries whose REGISTRATION waits for the r15 window (the r14
# evidence window is exactly full: 46 rotation leads + 4 new queries; a
# fifth registration would sit outside the driver's 50-row window with no
# evidence and trip test_window_rotation_never_starves_a_query).  Each is
# parity-checked against its DuckDB oracle at sf0.001 on every pytest run
# (tests/test_staged_r15.py).  R15 promotion: move each into QUERIES/
# ORACLES in its home module and slot the name into the r15 window leads.
from .embedding_parity import R15_STAGED_EMBEDDING  # noqa: E402
from .queries import R15_STAGED_MM  # noqa: E402
from .text_parity import R15_STAGED_TEXT  # noqa: E402

R15_STAGED = {**R15_STAGED_TEXT, **R15_STAGED_EMBEDDING, **R15_STAGED_MM}
assert not set(R15_STAGED) & set(QUERIES), "staged query already registered"
