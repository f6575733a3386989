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


def save_models(models: DataFrame, path: str) -> None:
    """Persist the registry (overwrite = publish a new model version)."""
    models.write.mode("overwrite").parquet(path)


def load_models(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


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
