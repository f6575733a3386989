"""S13 model persistence: train → save → load → score must reproduce the
in-memory model's predictions exactly (the registry round-trip the reference
gets from joblib + the ml_models table)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline_spark.ml.persistence import (
    load_models,
    save_models,
    score_arima_1step,
    score_latest,
    train_arima_models,
    train_models,
)
from real_time_stock_market_data_pipeline_spark.ml.regression import _ols_fit, _windows


def _series_df(spark, prices_by_symbol):
    rows = []
    for sym, prices in prices_by_symbol.items():
        for i, p in enumerate(prices):
            rows.append(
                (sym, i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), float(p))
            )
    return spark.createDataFrame(
        rows,
        "company_id string, tick_id long, trade_datetime timestamp, current_price double",
    )


@pytest.fixture(scope="module")
def ticks(spark):
    rng = np.random.default_rng(5)
    return _series_df(
        spark,
        {
            "A": 100 + np.cumsum(rng.normal(0, 1, 60)),
            "B": 50 + np.cumsum(rng.normal(0, 2, 40)),
            "SHORT": [1.0, 2.0, 3.0],  # below the window+2 gate → no model
        },
    )


def test_roundtrip_identical_predictions(spark, ticks, tmp_path):
    models = train_models(ticks)
    direct = {
        r.company_id: r.predicted_price
        for r in score_latest(ticks, models).collect()
    }
    path = str(tmp_path / "models")
    save_models(models, path)
    loaded = load_models(spark, path)
    reloaded = {
        r.company_id: r.predicted_price
        for r in score_latest(ticks, loaded).collect()
    }
    assert direct == reloaded  # bit-identical: same coefficients, same fold
    assert set(direct) == {"A", "B"}


def test_scored_prediction_matches_numpy(spark, ticks):
    models = train_models(ticks)
    got = {r.company_id: r for r in score_latest(ticks, models).collect()}
    pdf = ticks.filter(F.col("company_id") == "A").orderBy("trade_datetime").toPandas()
    prices = pdf["current_price"].to_numpy()
    X, y = _windows(prices, 5)
    beta = _ols_fit(X, y)
    want = float(beta[0] + beta[1:] @ prices[-5:])
    assert got["A"].predicted_price == pytest.approx(want, rel=1e-12)
    assert got["A"].predicted_date == got["A"].timestamp + dt.timedelta(days=1)
    assert got["A"].confidence_score == 0.8


def test_score_respects_model_window(spark, ticks):
    """Models trained with a non-default window must score with THEIR
    window: non-NULL predictions matching the numpy fold on the last w
    prices (the old code hardcoded WINDOW_SIZE and NULL-padded w<5)."""
    for w in (3, 8):
        models = train_models(ticks, window=w)
        got = {r.company_id: r for r in score_latest(ticks, models).collect()}
        assert set(got) == {"A", "B"}  # SHORT still below the w+2 train gate
        pdf = (
            ticks.filter(F.col("company_id") == "A")
            .orderBy("trade_datetime")
            .toPandas()
        )
        prices = pdf["current_price"].to_numpy()
        X, y = _windows(prices, w)
        beta = _ols_fit(X, y)
        want = float(beta[0] + beta[1:] @ prices[-w:])
        assert got["A"].predicted_price is not None
        assert got["A"].predicted_price == pytest.approx(want, rel=1e-12)


def test_score_mixed_window_registry(spark, ticks):
    """A registry holding models of different windows scores each symbol
    with its own window length."""
    m3 = train_models(ticks.filter(F.col("company_id") == "A"), window=3)
    m8 = train_models(ticks.filter(F.col("company_id") == "B"), window=8)
    models = m3.unionByName(m8)
    got = {r.company_id: r for r in score_latest(ticks, models).collect()}
    assert set(got) == {"A", "B"}
    for sym, w in (("A", 3), ("B", 8)):
        pdf = (
            ticks.filter(F.col("company_id") == sym)
            .orderBy("trade_datetime")
            .toPandas()
        )
        prices = pdf["current_price"].to_numpy()
        X, y = _windows(prices, w)
        beta = _ols_fit(X, y)
        want = float(beta[0] + beta[1:] @ prices[-w:])
        assert got[sym].predicted_price == pytest.approx(want, rel=1e-12)


def test_model_table_schema_and_gate(spark, ticks):
    models = train_models(ticks).collect()
    by_sym = {r.company_id: r for r in models}
    assert set(by_sym) == {"A", "B"}
    a = by_sym["A"]
    assert a.model_type == "LinearRegression"
    assert a.window == 5 and len(a.beta) == 6
    assert a.n_windows == 60 - 6


# ---------------------------------------------------------------------------
# ARIMA registry rows (the reference's ml_models ARIMA surface)
# ---------------------------------------------------------------------------


def test_arima_registry_rows_match_fit(spark, ticks):
    """Registry fields reproduce arima._fit_best run directly on the same
    series; symbols under the 50-observation gate emit no row."""
    import pandas as pd

    from real_time_stock_market_data_pipeline_spark.ml.arima import _fit_best

    reg = {r.company_id: r for r in train_arima_models(ticks).collect()}
    assert set(reg) == {"A"}  # B has 40 obs, SHORT 3 — both gated out
    pdf = ticks.filter(F.col("company_id") == "A").toPandas()
    x = (
        pdf.sort_values("trade_datetime")["current_price"]
        .to_numpy(dtype=np.float64)
    )
    best = _fit_best(x)
    row = reg["A"]
    assert (row.order_p, row.order_d, row.order_q) == (best["p"], best["d"], best["q"])
    assert row.model_type == "ARIMA" and row.n_obs == len(x)
    assert abs(row.aic - best["aic"]) < 1e-9
    assert list(row.coefs) == [float(c) for c in best["coefs"]]
    assert len(row.xd_tail) == best["p"] and len(row.eps_tail) == best["q"]
    assert len(row.diff_tails) == best["d"]


def test_arima_registry_score_reproduces_forecast(spark, ticks, tmp_path):
    """score_arima_1step over the PERSISTED+RELOADED registry must equal the
    fitted model's own 1-step forecast — the JVM fold replays the numpy
    addition order, so the match is (near-)bitwise."""
    from real_time_stock_market_data_pipeline_spark.ml.arima import forecast

    path = str(tmp_path / "arima_models")
    save_models(train_arima_models(ticks), path)
    scored = {r.company_id: r for r in score_arima_1step(load_models(spark, path)).collect()}
    fc = {
        r.company_id: r
        for r in forecast(ticks, steps=1).filter(F.col("step") == 1).collect()
    }
    assert set(scored) == set(fc) == {"A"}
    s, f = scored["A"], fc["A"]
    assert abs(s.forecast_1 - f.forecast) <= 1e-9 * max(1.0, abs(f.forecast))
    assert s.ci_lo <= s.forecast_1 <= s.ci_hi
    assert (s.order_p, s.order_d, s.order_q) == (f.order_p, f.order_d, f.order_q)


def test_arima_registry_scores_many_symbols(spark, sf_dir):
    """Fixture-wide: every symbol past the gate gets a registry row whose
    registry score matches its fresh fit's step-1 forecast."""
    from real_time_stock_market_data_pipeline_spark.ml.arima import forecast
    from real_time_stock_market_data_pipeline_spark.operators.relational import (
        valid_tick_predicate,
    )
    from real_time_stock_market_data_pipeline_spark.sources.readers import (
        ticks_from_events,
    )

    t = ticks_from_events(spark, sf_dir).filter(valid_tick_predicate())
    scored = score_arima_1step(train_arima_models(t)).toPandas().set_index("company_id")
    fc = (
        forecast(t, steps=1)
        .filter(F.col("step") == 1)
        .toPandas()
        .set_index("company_id")
    )
    assert len(scored) == len(fc) > 0
    diff = (scored["forecast_1"] - fc["forecast"]).abs()
    tol = 1e-9 * np.maximum(1.0, fc["forecast"].abs())
    assert (diff <= tol).all()
