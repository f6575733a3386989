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


def test_r11_driver_window_pinned():
    """The driver records correctness rows for the FIRST 50 registrations
    only, so the window IS part of the round's evidence plan: the 26
    r08-green queries frozen out of the r10 window lead (their newest
    driver row is r08), the new/reworked r11 queries follow (emb15's
    scale rework replaces its plan AND oracle, so its r10 row is for the
    old query), and r09-green rotations fill to exactly 50.  An
    accidental import-order or registration change would silently spend
    the evidence budget on the wrong queries — fail loudly instead."""
    from real_time_stock_market_data_pipeline_spark.plans import QUERIES

    names = list(QUERIES)
    assert names[:26] == [
        "a3_active_series", "mm3_bmp_pixel_stats", "mm4_wav_stats",
        "mm5_avi_frame_stats", "mm6_png_roundtrip_stats", "flagship",
        "s14_arima_registry",
        "mm2_image_dims", "t6_alerts", "j3_alert_feed",
        "emb4_ivf_topk", "emb5_ivf_trained_recall", "s9_analytics_upsert",
        "sp1_hash_split", "dq1_expectations", "a9_sketch_rollup",
        "dd8_contamination", "txt6_vocab", "txt7_bpe_merges",
        "emb8_ivf_index_search",
        "a10_value_histogram", "a11_daily_type_pivot", "a12_rollup_sets",
        "sp3_capped_per_group", "sp4_balanced_mixture",
        "dq2_volume_anomalies",
    ]
    # new/reworked r11 queries sit directly after the r08 leads
    assert names[26:34] == [
        "emb15_semantic_dedup", "emb16_semdedup_keep_policy",
        "mm11_triad_decontamination", "sp9_dup_aware_split",
        "emb17_incremental_semdedup", "txt15_perplexity_filter",
        "emb18_filtered_ann", "txt16_duplicated_ngrams",
    ]
    # slot 50 boundary: the frozen-for-r12 block starts at index 50
    assert names[49] == "w14_series_banded_neardup"
    assert names[50] == "sp2_stratified_sample"
