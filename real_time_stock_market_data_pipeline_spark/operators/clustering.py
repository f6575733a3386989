"""Deterministic distributed KMeans (Lloyd's) — the IVF centroid trainer.

``ivf_topk`` (operators/similarity.py) needs a codebook; round 1 borrowed
label centroids.  This trainer produces one from the data alone, Spark-first:

  * **init**: a deterministic stride sample — the corpus ordered by
    ``vec_id`` yields every ⌊n/k⌋-th vector as a seed.  RNG-free (same
    seeds every run/engine) yet spread across the whole id range, the
    deterministic stand-in for KMeans' random-sample init.  (Farthest-point
    init was tried and rejected: it pins seeds on outliers, which starves
    the dense lists and measurably hurts IVF recall.);
  * **assign**: broadcast the k centroids, per-vector argmax cosine
    (JVM ``zip_with``/``aggregate`` dot products, row_number tiebreak on
    centroid id — no Python, no shuffle);
  * **update**: per-(centroid, dim) mean via ``posexplode`` + one partially
    aggregated ``groupBy`` — the only shuffle, k·d tiny rows out;
  * repeat ``n_iter`` times (fixed count, no convergence RNG).

The per-iteration ``collect()`` moves exactly k·d doubles (the new
codebook) to the driver — that is the legitimate driver-side footprint of
distributed KMeans, not a data collect.  At 100 TB you fit on a sampled
fraction (``df.sample``) and/or fewer iterations; assignment of the full
corpus happens once, inside ``ivf_topk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import cosine_col


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    vec_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Fit k centroids; returns a small DataFrame (centroid_id, <vec>) with
    double-array centroids, suitable as ``ivf_topk``'s ``centroids``."""
    spark = df.sparkSession
    corpus = df.select(F.col(vec_id), F.col(vec))
    schema = f"centroid_id int, {vec} array<double>"
    n = corpus.count()
    stride = max(n // k, 1)
    w = Window.orderBy(F.col(vec_id).asc())
    seed_rows = (
        corpus.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") - 1) % stride == 0)
        .orderBy(F.col(vec_id).asc())
        .limit(k)
        .collect()
    )
    cents = [
        (i, [float(x) for x in r[vec]]) for i, r in enumerate(seed_rows)
    ]
    for _ in range(n_iter):
        cdf = spark.createDataFrame(cents, schema)
        c = cdf.select(F.col("centroid_id"), F.col(vec).alias("__cent"))
        w = Window.partitionBy(vec_id).orderBy(
            F.col("__sim").desc(), F.col("centroid_id").asc()
        )
        assigned = (
            corpus.join(F.broadcast(c))
            .withColumn("__sim", cosine_col(F.col(vec), F.col("__cent")))
            .withColumn("__rk", F.row_number().over(w))
            .filter("__rk = 1")
            .select("centroid_id", F.col(vec).alias("__v"))
        )
        dim_means = (
            assigned.select(
                "centroid_id", F.posexplode(F.col("__v")).alias("dim", "val")
            )
            .groupBy("centroid_id", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in dim_means:
            by_cid.setdefault(r.centroid_id, {})[r.dim] = r.m
        new_cents = []
        for cid, old in cents:
            dims = by_cid.get(cid)
            if not dims:  # empty cluster keeps its previous centroid
                new_cents.append((cid, old))
            else:
                new_cents.append((cid, [dims[i] for i in sorted(dims)]))
        cents = new_cents
    return spark.createDataFrame(cents, schema)
