"""Deterministic KMeans (IVF centroid trainer) invariants."""

from __future__ import annotations

import numpy as np
import pytest

from real_time_stock_market_data_pipeline_spark.operators.clustering import kmeans_fit


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.default_rng(9)
    # three directionally-separated blobs (assignment metric is cosine, so
    # clusters must differ in direction, not just offset)
    rows = []
    for b in range(3):
        center = np.zeros(8)
        center[b] = 5.0
        for i in range(30):
            v = (center + rng.normal(0, 0.3, 8)).tolist()
            rows.append((b * 30 + i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_deterministic(vecs):
    a = sorted(map(tuple, kmeans_fit(vecs, k=3, n_iter=3).collect()))
    b = sorted(map(tuple, kmeans_fit(vecs, k=3, n_iter=3).collect()))
    assert a == b


def test_kmeans_recovers_blobs(vecs):
    cents = kmeans_fit(vecs, k=3, n_iter=5).collect()
    assert len(cents) == 3
    # each centroid's dominant dimension should be one blob axis at ≈5
    dominant = sorted(int(np.argmax(r.embedding)) for r in cents)
    assert dominant == [0, 1, 2]
    for r in cents:
        assert max(r.embedding) == pytest.approx(5.0, abs=0.5)


def test_kmeans_centroid_shape(vecs):
    cents = kmeans_fit(vecs, k=3, n_iter=2).collect()
    assert all(len(r.embedding) == 8 for r in cents)
    assert sorted(r.centroid_id for r in cents) == [0, 1, 2]


def test_kmeans_job_budget(spark, vecs):
    # Seeding is one distributed job chain (range partition + per-partition
    # rank), not a count() + global sort; each Lloyd iteration is one
    # assign+update action.  AQE materializes each exchange as its own job,
    # so the bound is loose in job units but tight enough to catch a
    # reintroduced extra action per fit or per iteration (measured: 16).
    vecs.count()  # warm the input outside the counted group
    sc = spark.sparkContext
    sc.setJobGroup("km-budget", "kmeans job budget")
    try:
        kmeans_fit(vecs, k=3, n_iter=2).collect()
        n_jobs = len(sc.statusTracker().getJobIdsForGroup("km-budget"))
    finally:
        sc.setJobGroup(None, None)
    assert n_jobs <= 18, f"kmeans_fit ran {n_jobs} jobs; budget is 18"


def test_ivf_tolerates_null_and_ragged_vectors(spark, vecs):
    """A NULL or wrong-length embedding must not crash the Arrow argmax —
    such rows assign to the lowest-cid list (zero vector), matching the
    old broadcast-join path's assign-anyway behavior."""
    from pyspark.sql import functions as F

    from real_time_stock_market_data_pipeline_spark.operators.similarity import ivf_topk

    bad = spark.createDataFrame(
        [(9001, None), (9002, [1.0, 2.0])],
        "vec_id long, embedding array<float>",
    ).withColumn("label", F.lit("x"))
    corpus = vecs.unionByName(bad.select(*vecs.columns))
    cents = kmeans_fit(vecs, k=3, n_iter=1)
    q = vecs.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ivf_topk(q, corpus, cents, k=5, n_probe=3)
    got = out.groupBy("query_id").count().collect()
    assert got and all(r["count"] == 5 for r in got)
