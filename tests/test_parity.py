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


def test_r10_driver_window_pinned():
    """The driver records correctness rows for the FIRST 50 registrations
    only, so the window IS part of the round's evidence plan: the 16
    queries frozen out of the r9 window lead (their newest driver row is
    r07), the 4 never-rowed late-r9 registrations follow, new r10 queries
    come next, and r08-green rotations fill to exactly 50.  An accidental
    import-order or registration change would silently spend the
    evidence budget on the wrong queries — fail loudly instead."""
    from real_time_stock_market_data_pipeline_spark.plans import QUERIES

    names = list(QUERIES)
    assert names[:16] == [
        "p3_time_window_filter", "p4_recent_window", "p5_equality_filter",
        "p6_flag_filter", "a7_dup_detection", "o1_top_events",
        "o4_latest_row", "o5_price_history", "o6_sorted_rollup",
        "a1_grouped_max", "a2_global_max", "a6_hourly_counts",
        "d1_distinct_event_types", "su1_set_ops", "j1_tick_dashboard",
        "mm1_media_meta",
    ]
    assert names[16:20] == [
        "emb12_incremental_pq", "dq3_embedding_audit", "emb13_ivfpq_recall",
        "txt14_doc_retrieval",
    ]
    # new r10 queries sit directly after the never-rowed block
    assert names[20:26] == [
        "dd12_neardup_decontamination", "mm10_crossmodal_decontamination",
        "dd13_compacted_table", "emb14_incremental_ivfpq",
        "sp8_decontaminated_pipeline", "emb15_semantic_dedup",
    ]
    # slot 50 boundary: the frozen-for-r11 block starts at index 50
    assert names[49] == "j5_dim_lookup"
    assert names[50] == "a3_active_series"
