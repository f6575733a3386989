"""Sliding-window linear regression (reference U3/U4:
ml/train_linear_regression.py, ml/batch_predict_linear_regression.py).

Reference behavior: per ticker, features = last WINDOW_SIZE=5 prices,
label = next price; sklearn LinearRegression on an 80/20 split (seed 42);
batch scoring emits (timestamp, predicted_price, predicted_date = ts + 1 day,
confidence 0.8, type 'next_price').

Spark-first reshaping: one model PER SYMBOL, trained inside an
``applyInPandas`` grouped map with closed-form OLS (numpy lstsq — sklearn's
LinearRegression is the same least-squares solution; sklearn itself is not
in this environment).  Grouped-map training parallelizes across symbols —
the right shape when model count is large and per-model data fits an
executor (here ≤1000 rows/symbol by the reference's own cache bound).
Deviation (documented): the 80/20 split is deterministic-modulo
(idx % 5 == 4 → test) instead of sklearn's seeded shuffle, whose RNG we
can't reproduce without sklearn.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def grouped_map_input(df: DataFrame, key: str, *cols: str) -> DataFrame:
    """Prepare a DataFrame for a CPU-heavy grouped map: prune to the used
    columns (Catalyst can't see into the Python function) and pin an
    explicit hash partitioning on the key.  The pinned partition count
    matters: the pruned shuffle is tiny in BYTES, so AQE would coalesce it
    to 1-2 partitions — right for byte-bound stages, wrong for model-fitting
    stages whose cost is per GROUP.  An explicit count keeps every core
    busy; groupBy reuses the partitioning (no second shuffle)."""
    parts = df.sparkSession.sparkContext.defaultParallelism
    return df.select(key, *cols).repartition(parts, key)

WINDOW_SIZE = 5  # reference shared/config.py:147 ml window_size
TEST_FRACTION_MOD = 5  # every 5th window → test (20%)
CONFIDENCE = 0.8  # reference batch_predict_linear_regression.py:74


def _windows(prices: np.ndarray, window: int) -> tuple[np.ndarray, np.ndarray]:
    """X[i] = prices[i-w:i], y[i] = prices[i+1] for i in [w, n-2]
    (exact reference indexing, train_linear_regression.py:36-42)."""
    n = len(prices)
    if n < window + 2:
        return np.empty((0, window)), np.empty(0)
    idx = np.arange(window, n - 1)
    X = np.stack([prices[i - window : i] for i in idx])
    y = prices[idx + 1]
    return X, y


def _ols_fit(X: np.ndarray, y: np.ndarray) -> np.ndarray:
    """[intercept, coefs...] via least squares."""
    A = np.hstack([np.ones((len(X), 1)), X])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    return beta


def train_metrics(
    df: DataFrame,
    key: str = "company_id",
    ts: str = "trade_datetime",
    price: str = "current_price",
    window: int = WINDOW_SIZE,
) -> DataFrame:
    """Per-symbol train + holdout MSE — the U3 surface."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts, kind="mergesort")
        prices = pdf[price].to_numpy(dtype=np.float64)
        X, y = _windows(prices, window)
        sym = pdf[key].iloc[0]
        if len(y) < TEST_FRACTION_MOD:
            return pd.DataFrame(
                [[sym, len(y), 0, np.nan, "LinearRegression"]],
                columns=[key, "n_train", "n_test", "mse", "model_type"],
            )
        test_mask = np.arange(len(y)) % TEST_FRACTION_MOD == TEST_FRACTION_MOD - 1
        beta = _ols_fit(X[~test_mask], y[~test_mask])
        pred = np.hstack([np.ones((test_mask.sum(), 1)), X[test_mask]]) @ beta
        mse = float(np.mean((pred - y[test_mask]) ** 2))
        return pd.DataFrame(
            [[sym, int((~test_mask).sum()), int(test_mask.sum()), mse, "LinearRegression"]],
            columns=[key, "n_train", "n_test", "mse", "model_type"],
        )

    key_type = dict(df.dtypes)[key]
    schema = (
        f"{key} {key_type}, n_train long, n_test long, mse double, model_type string"
    )
    return grouped_map_input(df, key, ts, price).groupBy(key).applyInPandas(fit, schema=schema)


def batch_predictions(
    df: DataFrame,
    key: str = "company_id",
    ts: str = "trade_datetime",
    price: str = "current_price",
    window: int = WINDOW_SIZE,
) -> DataFrame:
    """Per-symbol batch scoring — the U4 surface: train on all full windows,
    then score every window end (reference scores the latest 100 rows with a
    pre-trained model; we fold train+score into one deterministic pass)."""

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts, kind="mergesort")
        prices = pdf[price].to_numpy(dtype=np.float64)
        stamps = pdf[ts].to_numpy()
        sym = pdf[key].iloc[0]
        X, y = _windows(prices, window)
        cols = [key, "timestamp", "predicted_price", "predicted_date",
                "confidence_score", "prediction_type"]
        if len(y) == 0:
            return pd.DataFrame(columns=cols)
        beta = _ols_fit(X, y)
        # score every full window (batch_predict indexing: i in [w, n-1])
        idx = np.arange(window, len(prices))
        Xs = np.stack([prices[i - window : i] for i in idx])
        preds = np.hstack([np.ones((len(Xs), 1)), Xs]) @ beta
        t = pd.Series(stamps[idx])
        return pd.DataFrame(
            {
                key: sym,
                "timestamp": t,
                "predicted_price": preds,
                "predicted_date": t + pd.Timedelta(days=1),
                "confidence_score": CONFIDENCE,
                "prediction_type": "next_price",
            },
            columns=cols,
        )

    key_type = dict(df.dtypes)[key]
    schema = (
        f"{key} {key_type}, timestamp timestamp, predicted_price double, "
        "predicted_date timestamp, confidence_score double, prediction_type string"
    )
    return grouped_map_input(df, key, ts, price).groupBy(key).applyInPandas(score, schema=schema)


def gj_solve(A: list[list[int]], b: list[int]) -> list[float]:
    """Gauss-Jordan elimination WITHOUT pivoting, fixed operation order —
    the bit-exact twin of the unrolled SQL elimination in
    plans/text_parity.sql_quality_classifier (txt18).  Both sides start
    from the same exact-integer normal equations and perform the same
    IEEE-754 double ops in the same order, so the coefficients come out
    bit-identical and the scored corpus hash-compares across engines —
    which is why this is a hand-rolled scalar loop and NOT
    numpy.linalg.solve (LAPACK pivots and blocks; its op order is
    unspecified and differs from any SQL rendering).

    No pivoting is safe here by construction: A is a ridge-regularized
    Gram matrix (positive definite — every leading principal minor is
    positive), so pivots never vanish.  d is the FEATURE dimension
    (17 for txt18): d³ scalar ops on the driver, microseconds —
    training cost lives in the distributed aggregate, never here."""
    d = len(b)
    M = [[float(A[i][j]) for j in range(d)] + [float(b[i])] for i in range(d)]
    for k in range(d):
        piv = M[k][k]
        norm = [M[k][j] / piv for j in range(d + 1)]
        for i in range(d):
            if i != k:
                f = M[i][k]
                M[i] = [M[i][j] - f * norm[j] for j in range(d + 1)]
        M[k] = norm
    return [M[i][d] for i in range(d)]
