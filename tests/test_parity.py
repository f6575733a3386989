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


def test_r12_driver_window_pinned():
    """The driver records correctness rows for the FIRST 50 registrations
    only, so the window IS part of the round's evidence plan: the 34
    r09-green queries frozen out of the r11 window lead (their newest
    driver row is r09 and turns three rounds old otherwise), new r12
    queries follow, and r10-green rotations fill to exactly 50.  An
    accidental import-order or registration change would silently spend
    the evidence budget on the wrong queries — fail loudly instead."""
    from real_time_stock_market_data_pipeline_spark.plans import QUERIES

    names = list(QUERIES)
    assert names[:34] == [
        "sp2_stratified_sample",
        "dd3_minhash_signatures", "dd4_minhash_candidates", "dd5_simhash",
        "emb1_knn_cosine", "emb2_label_centroids", "emb3_lsh_near_dup",
        "emb6_centered_lsh",
        "j2_analytics_dashboard", "j4_prediction_dashboard",
        "j11_range_join",
        "p7_validated_ticks", "p9_dedup_ticks",
        "j6_region_revenue", "j7_orders_without_big_lineitems",
        "j8_industry_rollup",
        "a4_daily_summary", "w1_latest_per_day", "w_all_indicators",
        "o3_training_fetch",
        "sk1_salted_daily_summary", "q1_pricing_summary",
        "t9_session_windows",
        "j10_asof_quote", "s13_model_roundtrip", "u2_arima_forecast",
        "u3_linreg_metrics", "u4_linreg_predictions",
        "txt8_bpe_tokenize", "txt9_bpe_incremental", "t10_throttle",
        "sp5_sequence_packing", "dd6_dup_clusters", "dd7_dedup_summary",
    ]
    # new r12 queries sit directly after the r09 leads; r10-green
    # rotations fill the window to 50 (oldest evidence first)
    assert names[34:41] == [
        "txt17_span_dedup", "txt18_quality_classifier",
        "sp10_domain_caps", "sp11_domain_mixture", "emb19_filtered_ivfpq",
        "txt19_incremental_span_dedup", "sp12_curated_corpus",
    ]
    assert names[41] == "p3_time_window_filter"
    # slot 50 boundary: the frozen-for-r13 block starts at index 50
    assert names[49] == "o6_sorted_rollup"
    assert names[50] == "a1_grouped_max"


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
