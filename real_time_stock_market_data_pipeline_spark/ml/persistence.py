"""Model persistence (S13) — fitted per-symbol coefficients as a plain
parquet table, the Spark-native analogue of the reference's joblib dump +
``ml_models`` registry (reference ml/arima_forecasting.py:251-277,
ml/train_linear_regression.py:61-77, db/enhanced_schema.sql:159-178).

Layout: one row per (company_id, model_type) with the OLS coefficient vector
``beta`` as ``array<double>`` ([intercept, c_1..c_w], oldest-lag first — the
same layout ml/regression._ols_fit produces).  A parquet model table keyed by
symbol IS the registry: versioning = overwrite-by-path, lookup = broadcast
join, no external store.

Scoring is Spark-first: the saved coefficient table is tiny (one short array
per symbol), so ``score_latest`` broadcasts it and computes
``beta[0] + Σ beta[j]·price_j`` as a JVM ``zip_with``/``aggregate`` fold over
the last ``window`` prices per symbol — no Python in the scoring path, one
WindowGroupLimit + one partial-aggregated groupBy on the fact side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .regression import WINDOW_SIZE, _ols_fit, _windows, grouped_map_input
from ..sources.readers import read_parquet_cached_schema as _read_pq

MODEL_TYPE = "LinearRegression"


def train_models(
    df: DataFrame,
    key: str = "company_id",
    ts: str = "trade_datetime",
    price: str = "current_price",
    window: int = WINDOW_SIZE,
) -> DataFrame:
    """Per-symbol OLS fit over all full sliding windows → one model row per
    symbol with ≥ window+2 observations (same fit as
    regression.batch_predictions; symbols below the bound emit no row)."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts, kind="mergesort")
        prices = pdf[price].to_numpy(dtype=np.float64)
        cols = [key, "model_type", "window", "n_windows", "beta"]
        X, y = _windows(prices, window)
        if len(y) == 0:
            return pd.DataFrame(columns=cols)
        beta = _ols_fit(X, y)
        sym = pdf[key].iloc[0]
        return pd.DataFrame(
            [[sym, MODEL_TYPE, window, len(y), list(map(float, beta))]],
            columns=cols,
        )

    key_type = dict(df.dtypes)[key]
    schema = (
        f"{key} {key_type}, model_type string, window int, n_windows long, "
        "beta array<double>"
    )
    return grouped_map_input(df, key, ts, price).groupBy(key).applyInPandas(fit, schema=schema)


ARIMA_MODEL_TYPE = "ARIMA"


def train_arima_models(
    df: DataFrame,
    key: str = "company_id",
    ts: str = "trade_datetime",
    price: str = "current_price",
) -> DataFrame:
    """The ARIMA surface of the reference's ``ml_models`` registry
    (ml/arima_forecasting.py:251-277, db/enhanced_schema.sql:159-178): one
    row per symbol past the 50-observation gate with the fitted
    (order_p, order_d, order_q), AIC, n_obs, residual sigma — and the
    minimal SCORING STATE so 1-step forecasts come FROM the registry
    without refitting:

      * ``coefs``       — [c, ar_1..ar_p, ma_1..ma_q] (arima._css_fit),
      * ``xd_tail``     — last p values of the d-differenced series,
      * ``eps_tail``    — last q CSS residuals (the MA shocks),
      * ``diff_tails``  — [diff^{d-1}(x)[-1], …, diff^0(x)[-1]], the
        integration constants in arima._forecast's fold order.

    Per-symbol grouped map (one Arrow batch per symbol — model fitting is
    per-key work); the registry itself is broadcast-sized: ≤ p+q+1 doubles
    of coefficients plus ≤ p+q+d tail values per symbol."""
    import math

    from .arima import MIN_OBSERVATIONS, _fit_best

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        cols = [
            key, "model_type", "order_p", "order_d", "order_q",
            "aic", "n_obs", "sigma", "coefs", "xd_tail", "eps_tail",
            "diff_tails",
        ]
        pdf = pdf.sort_values(ts, kind="mergesort")
        x = pdf[price].to_numpy(dtype=np.float64)
        if len(x) < MIN_OBSERVATIONS:
            return pd.DataFrame(columns=cols)
        best = _fit_best(x)
        p, d, q = best["p"], best["d"], best["q"]
        xd = np.diff(x, n=d) if d else x
        sigma = math.sqrt(best["sse"] / len(best["resid"]))
        diff_tails = [
            float((np.diff(x, n=d - 1 - i) if d - 1 - i else x)[-1])
            for i in range(d)
        ]
        return pd.DataFrame(
            [[
                pdf[key].iloc[0], ARIMA_MODEL_TYPE, p, d, q,
                float(best["aic"]), len(x), float(sigma),
                [float(c) for c in best["coefs"]],
                [float(v) for v in (xd[-p:] if p else [])],
                [float(v) for v in (best["resid"][-q:] if q else [])],
                diff_tails,
            ]],
            columns=cols,
        )

    key_type = dict(df.dtypes)[key]
    schema = (
        f"{key} {key_type}, model_type string, order_p int, order_d int, "
        "order_q int, aic double, n_obs long, sigma double, "
        "coefs array<double>, xd_tail array<double>, "
        "eps_tail array<double>, diff_tails array<double>"
    )
    return grouped_map_input(df, key, ts, price).groupBy(key).applyInPandas(fit, schema=schema)


def score_arima_1step(models: DataFrame, key: str = "company_id") -> DataFrame:
    """1-step ARIMA forecast FROM the registry — no refit, no tick scan,
    pure JVM column algebra over the broadcast-sized model table:

        ŷ = fold(c  →  +ar_k·xd[-k]  →  +ma_k·ε[-k]  →  +Σ diff_tails)

    The single ``aggregate`` folds the concatenated term list in exactly
    arima._forecast's addition order, so the registry score reproduces the
    fitted forecast's step-1 value bit-for-bit (tested); the 95% interval
    uses the persisted residual sigma."""
    from .arima import Z95

    ar_terms = F.zip_with(
        F.slice("coefs", 2, F.col("order_p")),
        F.reverse("xd_tail"),
        lambda a, b: a * b,
    )
    ma_terms = F.zip_with(
        F.slice("coefs", F.col("order_p") + 2, F.col("order_q")),
        F.reverse("eps_tail"),
        lambda a, b: a * b,
    )
    fc = F.aggregate(
        F.concat(ar_terms, ma_terms, F.col("diff_tails")),
        F.element_at("coefs", 1),
        lambda acc, x: acc + x,
    )
    return models.select(
        key, "model_type", "order_p", "order_d", "order_q",
        fc.alias("forecast_1"),
        (fc - F.lit(Z95) * F.col("sigma")).alias("ci_lo"),
        (fc + F.lit(Z95) * F.col("sigma")).alias("ci_hi"),
    )


def save_models(models: DataFrame, path: str) -> None:
    """Persist the registry (overwrite = publish a new model version)."""
    models.write.mode("overwrite").parquet(path)


def load_models(spark: SparkSession, path: str) -> DataFrame:
    return _read_pq(spark, path)


def score_latest(
    ticks: DataFrame,
    models: DataFrame,
    key: str = "company_id",
    ts: str = "trade_datetime",
    tiebreak: str = "tick_id",
    price: str = "current_price",
) -> DataFrame:
    """One next-price prediction per symbol from its persisted model: the
    last ``window`` prices (ascending) are the feature vector, exactly the
    reference's latest-window scoring
    (ml/batch_predict_linear_regression.py:55-74).

    The feature length is driven by EACH MODEL ROW's ``window`` column, not
    the training-time default: the rank pre-filter keeps the registry's MAX
    window per symbol (a WindowGroupLimit with a literal bound — the max is
    one aggregate over the broadcast-sized model table, the only driver
    action here), and the scoring fold slices both ``beta`` and the price
    history to that model's own window.  Models trained with any window
    score correctly; mixed-window registries score each symbol with its
    own length."""
    maxw_row = models.agg(F.max("window")).collect()
    maxw = int(maxw_row[0][0]) if maxw_row and maxw_row[0][0] is not None else WINDOW_SIZE
    w = Window.partitionBy(key).orderBy(F.col(ts).desc(), F.col(tiebreak).desc())
    feats = (
        ticks.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.lit(maxw))  # WindowGroupLimit
        .groupBy(key)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(ts), F.col(tiebreak), F.col(price)))
                ),
                lambda s: s[price].cast("double"),
            ).alias("__feats"),
            F.count(F.lit(1)).alias("__n"),
            F.max(ts).alias("timestamp"),
        )
    )
    m = models.select(
        key, "model_type", "window", F.col("beta").alias("__beta")
    )
    pred = F.element_at("__beta", 1) + F.aggregate(
        F.zip_with(
            F.slice("__beta", 2, F.col("window")),
            F.slice("__feats", -F.col("window"), F.col("window")),
            lambda a, b: a * b,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        feats.join(F.broadcast(m), key)
        .filter(F.col("__n") >= F.col("window"))
        .select(
            key,
            "model_type",
            "timestamp",
            pred.alias("predicted_price"),
            (F.col("timestamp") + F.expr("INTERVAL 1 DAY")).alias("predicted_date"),
            F.lit(0.8).alias("confidence_score"),
        )
    )
