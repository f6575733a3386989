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


def test_r16_driver_window_pinned():
    """The driver records correctness rows for the FIRST 50 registrations
    only, so the window IS part of the round's evidence plan: the 12
    r12-green entries displaced by the r15 leads (the "FROZEN FOR R16"
    block, oldest evidence in the registry) lead, new r16 queries
    follow, and the r13-green rotations fill to exactly 50 in r13-window
    order (oldest evidence first).  An accidental import-order or
    registration change would silently spend the evidence budget on the
    wrong queries — fail loudly instead."""
    from real_time_stock_market_data_pipeline_spark.plans import QUERIES

    names = list(QUERIES)
    leads = [
        "emb19_filtered_ivfpq", "txt19_incremental_span_dedup",
        "sp12_curated_corpus", "p3_time_window_filter", "p4_recent_window",
        "p5_equality_filter", "p6_flag_filter", "a7_dup_detection",
        "o1_top_events", "o4_latest_row", "o5_price_history",
        "o6_sorted_rollup",
    ]
    assert names[:12] == leads
    # new r16 queries sit directly after the displaced-r12 leads; each
    # one displaces one r13 fill off the window tail
    new_r16 = [n for n in names[12:50] if n not in _R13_WINDOW_ORDER]
    n_new = len(new_r16)
    assert names[12:12 + n_new] == new_r16  # new queries are contiguous
    assert names[12 + n_new:50] == _R13_WINDOW_ORDER[: 38 - n_new]
    # slot 50 boundary: the frozen-for-r17 block starts at index 50 with
    # the first displaced r13 fill
    assert names[50] == _R13_WINDOW_ORDER[38 - n_new]


# the r13-window order the round-16 fills draw from (the full 50-entry
# r13-green block): any slot of the 50 not taken by a displaced-r12 lead
# or a new r16 query is filled from this list front-to-back, and
# displaced entries head the frozen-for-r17 block.
_R13_WINDOW_ORDER = [
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
