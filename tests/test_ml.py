from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline_spark.ml.arima import forecast
from real_time_stock_market_data_pipeline_spark.ml.regression import (
    batch_predictions,
    train_metrics,
)
from real_time_stock_market_data_pipeline_spark.plans.queries import QUERIES


def _series_df(spark, prices_by_symbol):
    rows = []
    for sym, prices in prices_by_symbol.items():
        for i, p in enumerate(prices):
            rows.append(
                (sym, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), float(p))
            )
    return spark.createDataFrame(
        rows, "company_id string, trade_datetime timestamp, current_price double"
    )


def test_ols_recovers_linear_series_exactly(spark):
    """y = prices[i+1] of a pure linear ramp is a linear function of the
    window → OLS must predict with ~zero error."""
    df = _series_df(spark, {"L": [100 + 2 * i for i in range(60)]})
    m = train_metrics(df).collect()[0]
    assert m.n_train > 0 and m.n_test > 0
    assert m.mse < 1e-12

    preds = batch_predictions(df).orderBy("timestamp").collect()
    # window ends at i → predicts prices[i+1] = price at i + 2
    for r in preds[:-1]:
        assert abs(r.predicted_price - (r.predicted_price // 2 * 2)) < 1e6  # sanity
    assert preds[0].prediction_type == "next_price"
    assert preds[0].confidence_score == 0.8
    assert preds[0].predicted_date == preds[0].timestamp + dt.timedelta(days=1)


def test_lr_short_series_emits_nothing(spark):
    df = _series_df(spark, {"S": [1.0, 2.0, 3.0]})
    assert batch_predictions(df).count() == 0


def test_arima_gate_and_shape(spark):
    rng = np.random.default_rng(7)
    walk = 100 + np.cumsum(rng.normal(0, 1, 120))
    df = _series_df(spark, {"A": walk, "SHORT": [1.0] * 10})
    out = forecast(df, steps=5).collect()
    by_sym = {}
    for r in out:
        by_sym.setdefault(r.company_id, []).append(r)
    assert "SHORT" not in by_sym  # 50-obs gate
    rows = sorted(by_sym["A"], key=lambda r: r.step)
    assert [r.step for r in rows] == [1, 2, 3, 4, 5]
    for r in rows:
        assert r.ci_lo <= r.forecast <= r.ci_hi
        assert np.isfinite(r.aic)
        assert 0 <= r.order_p <= 5 and 0 <= r.order_d <= 2 and 0 <= r.order_q <= 5
        # the reference's AIC→confidence proxy (analytics_consumer.py:372-377)
        assert r.prediction_confidence == max(
            0.0, min(1.0, 1.0 / (1.0 + abs(r.aic) / 100.0))
        )
        assert 0.0 <= r.prediction_confidence <= 1.0
    # intervals widen with horizon
    widths = [r.ci_hi - r.ci_lo for r in rows]
    assert widths == sorted(widths)
    # forecasts stay near the walk's endpoint (sanity, not precision)
    assert abs(rows[0].forecast - walk[-1]) < 20


def test_arima_deterministic(spark):
    rng = np.random.default_rng(11)
    walk = 50 + np.cumsum(rng.normal(0, 0.5, 100))
    df = _series_df(spark, {"D": walk})
    a = [tuple(r) for r in forecast(df, steps=3).orderBy("step").collect()]
    b = [tuple(r) for r in forecast(df, steps=3).orderBy("step").collect()]
    assert a == b


@pytest.mark.parametrize("name", ["u2_arima_forecast", "u3_linreg_metrics", "u4_linreg_predictions"])
def test_ml_queries_run_on_testdata(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n > 0


def test_u2_full_forecast_five_steps_per_symbol(spark, sf_dir):
    from real_time_stock_market_data_pipeline_spark.plans.queries import (
        u2_arima_forecast_full,
    )

    df = u2_arima_forecast_full(spark, sf_dir)
    counts = df.groupBy("company_id").count().collect()
    assert counts and all(r["count"] == 5 for r in counts)


def test_adf_selects_zero_for_stationary_one_for_walk():
    from real_time_stock_market_data_pipeline_spark.ml.arima import _select_d

    rng = np.random.default_rng(3)
    stationary = rng.normal(0, 1, 200)
    assert _select_d(stationary) == 0
    walk = np.cumsum(rng.normal(0, 1, 200)) + 100
    assert _select_d(walk) >= 1


def test_ljung_box_white_vs_autocorrelated():
    from real_time_stock_market_data_pipeline_spark.ml.arima import (
        LB_CHI2_10_95,
        _ljung_box_q,
    )

    rng = np.random.default_rng(21)
    white = rng.normal(0, 1, 300)
    assert _ljung_box_q(white) < LB_CHI2_10_95
    # strongly autocorrelated residuals (AR(1), phi=0.9) must be rejected
    ar = np.zeros(300)
    for i in range(1, 300):
        ar[i] = 0.9 * ar[i - 1] + rng.normal(0, 0.1)
    assert _ljung_box_q(ar) > LB_CHI2_10_95


def test_forecast_emits_residual_validation(spark):
    rng = np.random.default_rng(13)
    walk = 100 + np.cumsum(rng.normal(0, 1, 120))
    df = _series_df(spark, {"A": walk})
    rows = forecast(df, steps=3).collect()
    assert all(np.isfinite(r.lb_q) for r in rows)
    # a random walk's differenced series is white noise: the chosen fit
    # should leave white residuals
    assert all(r.resid_white for r in rows)
