"""Mimics the driver's correctness gate: every oracle-backed query must match
its DuckDB twin exactly (row count, columns, values) at sf0.001."""

from __future__ import annotations

import pytest

from real_time_stock_market_data_pipeline_spark.plans import ORACLES, QUERIES
from real_time_stock_market_data_pipeline_spark.plans.parity import (
    check_query,
    duck_connection,
)


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, duck, name):
    res = check_query(name, QUERIES[name](spark, sf_dir), ORACLES.get(name), duck)
    assert res.ok, f"{name}: {res.errors}"


def test_every_query_has_oracle_or_is_documented():
    # queries without an oracle get only the weaker rows-only check;
    # keep that set explicit so it never grows silently.
    rows_only = set(QUERIES) - set(ORACLES)
    allowed = {name for name in rows_only if name.startswith(("u2_", "u3_", "u4_", "t_"))}
    assert rows_only == allowed, f"missing oracles: {rows_only - allowed}"


def test_r18_driver_window_pinned():
    """The driver records correctness rows for the FIRST 50 registrations
    only, so the window IS part of the round's evidence plan: the 22
    r14-green entries displaced past slot 50 by the r17 window (the
    "FROZEN FOR R18" block, oldest evidence in the registry) lead, new
    r18 queries follow, and the r15-green rotations fill to exactly 50
    in r15-window order (oldest evidence first).  An accidental
    import-order or registration change would silently spend the
    evidence budget on the wrong queries — fail loudly instead."""
    from real_time_stock_market_data_pipeline_spark.plans import QUERIES

    names = list(QUERIES)
    leads = [
        "emb18_filtered_ann",
        "txt16_duplicated_ngrams", "dd1_exact_dedup", "w2_sma", "w3_ema",
        "txt1_token_stats", "txt4_fingerprint", "emb10_incremental_ivf",
        "txt12_bigram_lm", "txt13_feature_hash", "mm7_dhash_pairs",
        "w12_series_similarity", "w13_series_all_pairs",
        "dd11_incremental_decontamination", "mm8_audio_pairs",
        "mm9_video_pairs", "emb11_pq_recall", "w14_series_banded_neardup",
        "dq5_serving_drift_monitors", "txt21_dsir_resample",
        "txt22_bm25_retrieval", "dd15_paragraph_dedup",
    ]
    assert names[:22] == leads
    # new r18 queries sit directly after the displaced-r14 leads; each
    # one displaces one r15 fill off the window tail
    new_r18 = [n for n in names[22:50] if n not in _R15_WINDOW_ORDER]
    n_new = len(new_r18)
    assert names[22:22 + n_new] == new_r18  # new queries are contiguous
    assert names[22 + n_new:50] == _R15_WINDOW_ORDER[: 28 - n_new]
    # slot 50 boundary: the frozen-for-r19 block starts at index 50 with
    # the first displaced r15 fill
    assert names[50] == _R15_WINDOW_ORDER[28 - n_new]


# the r15-window order the round-18 fills draw from (the full 50-entry
# r15-green block): any slot of the 50 not taken by a displaced-r14 lead
# or a new r18 query is filled from this list front-to-back, and
# displaced entries head the frozen-for-r19 block.
_R15_WINDOW_ORDER = [
    "sp14_doremi_mixture", "sp15_curriculum_shards",
    "dd16_semantic_decontamination", "mm13_image_text_alignment",
    "dd17_quality_survivors", "sp16_doremi_manifest",
    "dq6_contamination_audit", "txt23_incremental_bm25",
    "emb21_index_deletion", "sp17_epoch_shuffle",
    "emb22_late_interaction", "emb23_matryoshka_recall",
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
    "sp11_domain_mixture",
]


def test_window_rotation_never_starves_a_query():
    """The AUTOMATED form of the rotation policy (the r11 verdict flagged
    the window as growing hand-maintained state): the driver's 50-row
    window must contain (a) every query with no green driver row yet and
    (b) only queries whose newest green evidence is no FRESHER than any
    query left outside — i.e. no query outside the window has strictly
    older evidence than one inside.  The pinned-order test above checks
    the round's exact plan; this one checks the POLICY, so a future
    rotation that silently starves a query fails even if someone updates
    the pin to match it."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        try:
            rows = json.load(open(f))
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            green = (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)
                and not row.get("err")
            )
            if green and name in QUERIES:
                newest[name] = max(newest.get(name, 0), rnd)
    if not newest:
        pytest.skip("no driver CORRECTNESS artifacts present")
    names = list(QUERIES)
    window, outside = names[:50], names[50:]
    never_rowed = [n for n in names if n not in newest]
    assert all(n in window for n in never_rowed), (
        f"queries with no driver evidence left outside the window: "
        f"{[n for n in never_rowed if n not in window]}"
    )
    rowed_in = [newest[n] for n in window if n in newest]
    missing_outside = [n for n in outside if n not in newest]
    assert not missing_outside  # outside queries must all carry evidence
    if rowed_in and outside:
        assert max(rowed_in) <= min(newest[n] for n in outside), (
            "a query outside the window has strictly older evidence than "
            "one inside — the rotation is starving it"
        )
