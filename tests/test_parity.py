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


def test_r9_driver_window_pinned():
    """The driver records correctness rows for the FIRST 50 registrations
    only, so the window IS part of the round's evidence plan: the 10
    named r9 waiters must lead (5 r06-stale + 5 never-rowed), the 6 new
    r9 queries follow, and the total window is exactly 50.  An accidental
    import-order or registration change would silently spend the
    evidence budget on the wrong queries — fail loudly instead."""
    from real_time_stock_market_data_pipeline_spark.plans import QUERIES

    names = list(QUERIES)
    assert names[:10] == [
        "dd1_exact_dedup", "w2_sma", "w3_ema", "txt1_token_stats",
        "txt4_fingerprint", "emb10_incremental_ivf", "txt12_bigram_lm",
        "txt13_feature_hash", "mm7_dhash_pairs", "w12_series_similarity",
    ]
    assert names[10:16] == [
        "w13_series_all_pairs", "dd11_incremental_decontamination",
        "mm8_audio_pairs", "mm9_video_pairs", "emb11_pq_recall",
        "w14_series_banded_neardup",
    ]
    # slot 50 boundary: the frozen-for-r10 block starts at index 50
    assert names[49] == "dd7_dedup_summary"
    assert names[50] == "p3_time_window_filter"
