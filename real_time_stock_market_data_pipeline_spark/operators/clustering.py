"""Deterministic distributed KMeans (Lloyd's) — the IVF centroid trainer.

``ivf_topk`` (operators/similarity.py) needs a codebook; round 1 borrowed
label centroids.  This trainer produces one from the data alone, Spark-first:

  * **init**: a deterministic stride sample — the corpus ordered by
    ``vec_id`` yields every ⌊n/k⌋-th vector as a seed.  RNG-free (same
    seeds every run/engine) yet spread across the whole id range, the
    deterministic stand-in for KMeans' random-sample init.  The global
    rank is computed scalably: range-repartition on ``vec_id`` + a
    per-partition ``row_number`` (parallel window) + broadcast partition
    offsets — NOT an unpartitioned window, which would drag the whole
    corpus through one partition; the separate ``count()`` action is
    folded into the same plan (total row count rides on the tiny
    per-partition-counts frame).  (Farthest-point init was tried and
    rejected: it pins seeds on outliers, which starves the dense lists
    and measurably hurts IVF recall; a pure hash sample was tried and
    rejected too — it measurably degrades IVF recall@10 on the
    weak-structure fixture vs the spread stride seeds.);
  * **assign**: argmax cosine against the driver-side codebook via the
    Arrow-batched matmul (similarity.centroid_argmax_pandas, lowest-cid
    tiebreak) — a pure projection: no join, no window, no shuffle, no
    per-row Python;
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

from contextlib import contextmanager

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .similarity import centroid_argmax_pandas


@contextmanager
def _no_aqe(spark):
    """AQE re-plans each tiny codebook-sized reduction as extra jobs —
    pure scheduling overhead for the fit's fixed-shape actions (seed
    collect, per-iteration k·d mean collect), so it is off around exactly
    those actions and restored after.  Correctness never depended on it:
    the lazy localCheckpoint pins the seed partition boundaries either
    way.  AQE applies per-action at execution time, so scoping the conf
    around the ``collect()`` calls leaves every other plan untouched.

    Caveat: the conf is session-global, so an action another thread starts
    INSIDE one of these short windows also runs without AQE — acceptable
    for this library's single-driver-thread usage; a shared multi-tenant
    session should drop the optimization rather than widen the caveat."""
    before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", before)


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
    # Global rank by vec_id without a global sort: range partitions are
    # ordered by construction, so rank = partition offset + within-partition
    # row_number.  The offsets frame is one tiny row per partition (the
    # windows below run over ≤ n_partitions rows, not the corpus) and
    # carries the total count — no separate count() action.  The lazy
    # localCheckpoint is load-bearing for correctness, not just cost: the
    # offsets branch and the rank branch MUST see the same partition
    # boundaries, and two independent range exchanges re-sample them
    # (ReuseExchange does not collapse these branches under AQE).
    n_parts = spark.sparkContext.defaultParallelism
    parted = (
        corpus.repartitionByRange(n_parts, F.col(vec_id).asc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    # constant-valued partition key: the frame is one row per partition
    # (≤ n_parts rows), so a single-group window is intentional — pmod(pid,1)
    # is 0 for every row but not foldable, which keeps WindowExec from
    # logging the single-partition warning meant for corpus-sized frames
    tiny = Window.partitionBy(F.pmod(F.col("__pid"), F.lit(1))).orderBy(
        F.col("__pid").asc()
    )
    offsets = (
        parted.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "__pid",
            F.coalesce(
                F.sum("__cnt").over(
                    tiny.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).alias("__off"),
            F.sum("__cnt")
            .over(
                tiny.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("__n"),
        )
    )
    wpid = Window.partitionBy("__pid").orderBy(F.col(vec_id).asc())
    stride = F.greatest(F.floor(F.col("__n") / k), F.lit(1))
    seed_plan = (
        parted.withColumn("__rn", F.row_number().over(wpid))
        .join(F.broadcast(offsets), "__pid")
        .withColumn("__rank", F.col("__off") + F.col("__rn"))
        .filter((F.col("__rank") - 1) % stride == 0)
        .orderBy(F.col("__rank").asc())
        .limit(k)
    )
    with _no_aqe(spark):
        seed_rows = seed_plan.collect()
    cents = [
        (i, [float(x) for x in r[vec]]) for i, r in enumerate(seed_rows)
    ]
    # The Lloyd loop re-reads the corpus every iteration — pin it once.
    # Assignment is a PURE PROJECTION against the driver-side codebook via
    # the Arrow-batched argmax (similarity.centroid_argmax_pandas — one
    # numpy matmul per batch): no createDataFrame, no broadcast join, no
    # row_number window, and none of the per-iteration codegen/interpreted
    # cost of an inlined k·d expression that changes every iteration.  The
    # per-(centroid, dim) mean groupBy is the single shuffle per iteration,
    # and the single action per iteration moves exactly k·d tiny rows to
    # the driver.
    corpus = corpus.persist()
    try:
        for _ in range(n_iter):
            assigned = corpus.select(
                centroid_argmax_pandas(cents)(F.col(vec)).alias("centroid_id"),
                F.col(vec).alias("__v"),
            )
            means_plan = (
                assigned.select(
                    "centroid_id", F.posexplode(F.col("__v")).alias("dim", "val")
                )
                .groupBy("centroid_id", "dim")
                .agg(F.avg(F.col("val").cast("double")).alias("m"))
            )
            with _no_aqe(spark):
                dim_means = means_plan.collect()
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
    finally:
        corpus.unpersist()
    return spark.createDataFrame(cents, schema)
