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
