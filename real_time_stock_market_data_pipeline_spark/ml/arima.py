"""Per-symbol ARIMA forecasting as a grouped map (reference U2:
ml/arima_forecasting.py).

Reference behavior: per symbol, grid-search (p ≤ 5, d ∈ ADF-candidates,
q ≤ 5) by AIC with statsmodels, gate ≥ 50 observations, forecast k steps
with confidence intervals, AIC→confidence transform downstream.

Spark-first reshaping: ``applyInPandas`` per symbol — model fitting is
per-key work that parallelizes across symbols; each group is bounded by the
reference's own 1000-tick cache.  statsmodels is not in this environment, so
the estimator is a self-contained numpy ARIMA:

  * d is selected by an Augmented Dickey-Fuller test (constant, no trend,
    one lagged difference): the smallest d ∈ {0,1,2} whose d-differenced
    series rejects a unit root at the 5% critical value — the reference's
    ADF candidate step (arima_forecasting.py:84-103);
  * the (p, q) grid is the reference's full p ≤ 5, q ≤ 5
    (arima_forecasting.py:104-123);
  * AR(p) via conditional least squares;
  * MA(q) via Hannan–Rissanen: long-AR residuals become regressors;
  * AIC = n·ln(SSE/n) + 2(p+q+1), minimized over the grid in deterministic
    (p, q) iteration order (ties → first wins, like the reference's loop
    order, arima_forecasting.py:108-110);
  * k-step recursive forecast, undifferenced back; 95% intervals from the
    residual std (widening with √horizon);
  * if every grid fit is degenerate, a random-walk ARIMA(0,1,0) fallback
    forecasts the last observation (the reference falls back to a fixed
    small order on fit failure, arima_forecasting.py:118-123) — so every
    symbol past the 50-observation gate emits exactly ``steps`` rows, a
    property the driver oracle checks arithmetically.

Everything is deterministic: no RNG, fixed iteration order, closed-form
solves.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MIN_OBSERVATIONS = 50  # reference arima_forecasting.py:45
MAX_P, MAX_D, MAX_Q = 5, 2, 5  # reference grid (arima_forecasting.py:104)
Z95 = 1.959963984540054
ADF_CRIT_5PCT = -2.86  # Dickey-Fuller 5% critical value (constant, no trend)


def _adf_stat(x: np.ndarray, lags: int = 1) -> float:
    """Augmented Dickey-Fuller t-statistic (constant, no trend, fixed lag):
    Δx_t = α + γ·x_{t-1} + Σ_{i≤lags} δ_i·Δx_{t-i} + ε; returns t(γ).
    Degenerate systems (constant series, too short) return 0.0 — i.e. fail
    to reject the unit root, pushing d upward, which is always safe."""
    dx = np.diff(x)
    n = len(dx) - lags
    if n <= lags + 3:
        return 0.0
    y = dx[lags:]
    cols = [np.ones(n), x[lags:-1]]
    for i in range(1, lags + 1):
        cols.append(dx[lags - i : len(dx) - i])
    A = np.column_stack(cols)
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    resid = y - A @ beta
    dof = n - A.shape[1]
    if dof <= 0:
        return 0.0
    s2 = float(resid @ resid) / dof
    try:
        cov = s2 * np.linalg.inv(A.T @ A)
    except np.linalg.LinAlgError:
        return 0.0
    se = math.sqrt(max(cov[1, 1], 0.0))
    if se == 0.0 or not math.isfinite(se):
        return 0.0
    return float(beta[1]) / se


LB_LAGS = 10
# χ²(10) upper 5% quantile — Ljung-Box critical value at the reference's lag
# count (arima_forecasting.py residual validation).
LB_CHI2_10_95 = 18.307038053275146


def _ljung_box_q(resid: np.ndarray, lags: int = LB_LAGS) -> float:
    """Ljung-Box portmanteau statistic Q = n(n+2)·Σ_{k≤L} ρ_k²/(n−k) on the
    fit residuals; Q below the χ²(L) 5% critical value ⇒ residuals look like
    white noise (the model captured the autocorrelation)."""
    n = len(resid)
    if n <= lags + 1:
        return float("nan")
    r = resid - resid.mean()
    denom = float(r @ r)
    if denom <= 0:
        return 0.0
    q = 0.0
    for k in range(1, lags + 1):
        rho = float(r[k:] @ r[:-k]) / denom
        q += rho * rho / (n - k)
    return n * (n + 2) * q


def _select_d(x: np.ndarray) -> int:
    """Smallest d whose differenced series is ADF-stationary at 5%."""
    for d in range(MAX_D + 1):
        xd = np.diff(x, n=d) if d else x
        if len(xd) < MIN_OBSERVATIONS // 2:
            break
        if _adf_stat(xd) < ADF_CRIT_5PCT:
            return d
    return MAX_D


HR_LONG_P = 10  # Hannan–Rissanen stage-1 AR order (fixed — shared by the grid)


def _hr_residual_proxies(x: np.ndarray) -> np.ndarray | None:
    """Stage 1 of Hannan–Rissanen, ONCE per series: a long-AR fit whose
    residuals proxy the unobserved MA shocks for every (p, q) in the grid.
    The old per-(p,q) variant recomputed this 35× per symbol."""
    n = len(x)
    long_p = min(HR_LONG_P, n // 3)
    if long_p < 1 or n - long_p <= long_p + 1:
        return None
    A = np.hstack(
        [np.ones((n - long_p, 1))]
        + [x[long_p - k : n - k, None] for k in range(1, long_p + 1)]
    )
    yv = x[long_p:]
    beta, *_ = np.linalg.lstsq(A, yv, rcond=None)
    eps = np.zeros(n)
    eps[long_p:] = yv - A @ beta
    return eps


def _css_fit(
    x: np.ndarray, p: int, q: int, eps: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray, float] | None:
    """Conditional-least-squares ARMA(p,q) fit on a (differenced) series.

    Returns (coefs [c, ar..., ma...], residuals, sse) or None if the system
    is degenerate.  ``eps`` = precomputed Hannan–Rissanen residual proxies
    (``_hr_residual_proxies``); computed on demand when omitted."""
    n = len(x)
    if eps is None:
        eps = _hr_residual_proxies(x)
    if eps is None:
        return None
    # stage 2: regress on p lags of x and q lags of eps
    m = max(p, q, min(HR_LONG_P, n // 3))
    rows = n - m
    if rows <= p + q + 1:
        return None
    cols = [np.ones((rows, 1))]
    cols += [x[m - k : n - k, None] for k in range(1, p + 1)]
    cols += [eps[m - k : n - k, None] for k in range(1, q + 1)]
    A2 = np.hstack(cols)
    y2 = x[m:]
    coefs, *_ = np.linalg.lstsq(A2, y2, rcond=None)
    resid = y2 - A2 @ coefs
    sse = float(resid @ resid)
    if not math.isfinite(sse) or sse <= 0:
        return None
    return coefs, resid, sse


def _fit_best(x: np.ndarray) -> dict:
    """ADF picks d; AIC grid search over p ≤ 5, q ≤ 5 in deterministic
    (p, q) order.  Always returns a model: degenerate grids fall back to a
    random-walk ARIMA(0,1,0)."""
    d = _select_d(x)
    xd = np.diff(x, n=d) if d else x
    eps = _hr_residual_proxies(xd)
    best = None
    for p in range(MAX_P + 1):
        for q in range(MAX_Q + 1):
            if p == 0 and q == 0:
                continue
            fit = _css_fit(xd, p, q, eps)
            if fit is None:
                continue
            coefs, resid, sse = fit
            nn = len(resid)
            k = p + q + 1
            aic = nn * math.log(sse / nn) + 2 * k
            if best is None or aic < best["aic"] - 1e-12:
                best = {
                    "p": p, "d": d, "q": q, "coefs": coefs,
                    "resid": resid, "sse": sse, "aic": aic,
                }
    if best is None:
        dx = np.diff(x) if len(x) > 1 else np.zeros(1)
        sse = max(float(dx @ dx), 1e-12)
        nn = max(len(dx), 1)
        best = {
            "p": 0, "d": 1, "q": 0, "coefs": np.array([0.0]),
            "resid": dx, "sse": sse, "aic": nn * math.log(sse / nn) + 2.0,
        }
    return best


def _forecast(x: np.ndarray, best: dict, steps: int) -> tuple[np.ndarray, float]:
    p, d, q = best["p"], best["d"], best["q"]
    coefs = best["coefs"]
    xd = np.diff(x, n=d) if d else x.copy()
    hist = list(xd)
    eps_hist = list(best["resid"][-max(q, 1):]) if q else []
    sigma = math.sqrt(best["sse"] / len(best["resid"]))
    out = []
    for _ in range(steps):
        val = coefs[0]
        for k in range(1, p + 1):
            val += coefs[k] * hist[-k]
        for k in range(1, q + 1):
            val += coefs[p + k] * (eps_hist[-k] if k <= len(eps_hist) else 0.0)
        out.append(val)
        hist.append(val)
        if q:
            eps_hist.append(0.0)  # future shocks have zero expectation
    fc = np.array(out)
    # undifference: integrate d times against the series tail
    for i in range(d):
        tail = x if i == d - 1 else np.diff(x, n=d - 1 - i)
        fc = np.cumsum(fc) + tail[-1]
    return fc, sigma


def forecast(
    df: DataFrame,
    steps: int = 5,
    key: str = "company_id",
    ts: str = "trade_datetime",
    price: str = "current_price",
) -> DataFrame:
    """Per-symbol k-step forecast table:
    (key, step, forecast, ci_lo, ci_hi, aic, order_p, order_d, order_q).
    Symbols below the 50-observation gate emit no rows (reference gate)."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [key, "step", "forecast", "ci_lo", "ci_hi", "aic",
                "prediction_confidence",
                "order_p", "order_d", "order_q", "lb_q", "resid_white"]
        pdf = pdf.sort_values(ts, kind="mergesort")
        x = pdf[price].to_numpy(dtype=np.float64)
        sym = pdf[key].iloc[0]
        if len(x) < MIN_OBSERVATIONS:
            return pd.DataFrame(columns=cols)
        best = _fit_best(x)
        fc, sigma = _forecast(x, best, steps)
        widen = sigma * Z95 * np.sqrt(np.arange(1, steps + 1))
        lb_q = _ljung_box_q(best["resid"])
        return pd.DataFrame(
            {
                key: sym,
                "step": np.arange(1, steps + 1),
                "forecast": fc,
                "ci_lo": fc - widen,
                "ci_hi": fc + widen,
                "aic": best["aic"],
                # the reference's AIC→confidence proxy, clamped to [0, 1]
                # (analytics/analytics_consumer.py:372-377)
                "prediction_confidence": max(
                    0.0, min(1.0, 1.0 / (1.0 + abs(best["aic"]) / 100.0))
                ),
                "order_p": best["p"],
                "order_d": best["d"],
                "order_q": best["q"],
                "lb_q": lb_q,
                # the reference's residual validation: white residuals ⇒ the
                # order captured the autocorrelation (Ljung-Box, 5%, 10 lags)
                "resid_white": bool(lb_q < LB_CHI2_10_95) if math.isfinite(lb_q) else False,
            },
            columns=cols,
        )

    key_type = dict(df.dtypes)[key]
    schema = (
        f"{key} {key_type}, step int, forecast double, ci_lo double, ci_hi double, "
        "aic double, prediction_confidence double, "
        "order_p int, order_d int, order_q int, lb_q double, "
        "resid_white boolean"
    )
    from .regression import grouped_map_input

    return grouped_map_input(df, key, ts, price).groupBy(key).applyInPandas(run, schema=schema)
