"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the correctness baseline (|Q|×|C| cross join —
use only with a bounded query set).  The scale paths:

  * ``lsh_near_dup_pairs`` — hyperplane-sign buckets: candidates meet only
    inside a bucket, so the join shuffles on the bucket key.  More planes →
    smaller buckets → higher precision / lower recall.
  * ``ivf_topk`` — inverted-file search: assign every vector to its nearest
    of K centroids (broadcast), probe only ``n_probe`` closest lists per
    query.  Classic IVF-Flat, expressed as two broadcast joins + one
    shuffle on the list id.

All dot products run as JVM higher-order functions (``zip_with`` +
``aggregate``) — vectorized, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    vec_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (queries broadcast)."""
    q = queries.select(
        F.col(query_id), F.col(vec).alias("__qvec")
    )
    c = corpus.select(F.col(vec_id), F.col(vec).alias("__cvec"))
    from pyspark.sql import Window

    scored = (
        c.join(F.broadcast(q))
        .withColumn("cosine_sim", cosine_col(F.col("__qvec"), F.col("__cvec")))
        .drop("__qvec", "__cvec")
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine_sim").desc(), F.col(vec_id).asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def center_embeddings(df: DataFrame, vec: str = "embedding") -> DataFrame:
    """Subtract the per-dimension corpus mean from every vector (appended as
    ``<vec>_centered``).  Sign-bucket LSH keys come from coordinate
    hyperplanes; on uncentered data (e.g. all-positive ReLU embeddings)
    every vector lands in the all-signs-positive bucket and the bucket join
    degenerates to a cross join.  Centering moves the hyperplanes through
    the data centroid so each plane splits the mass ~evenly — the cheap
    stand-in for a random rotation.  One tiny aggregate (d doubles) is
    broadcast back as a literal; the per-row subtraction is a JVM
    ``zip_with``."""
    # Per-dim means via one posexplode aggregate: d rows out, no wide state.
    means_rows = (
        df.select(F.posexplode(F.col(vec)).alias("i", "x"))
        .groupBy("i")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .collect()
    )
    means = [r.m for r in sorted(means_rows, key=lambda r: r.i)]
    mean_arr = F.array(*[F.lit(float(m)) for m in means])
    return df.withColumn(
        f"{vec}_centered",
        F.zip_with(F.col(vec), mean_arr, lambda x, m: x.cast("double") - m),
    )


def sign_bucket_col(vec: Column, n_planes: int = 16) -> Column:
    """Hyperplane-sign LSH key from the leading dims' signs (a 16-bit int).
    With standardized embeddings the coordinate planes act as fixed random
    hyperplanes; for anisotropic data pass a rotated vector instead."""
    bits = [
        F.when(F.element_at(vec, i + 1).cast("double") > 0, F.lit(2**i)).otherwise(F.lit(0))
        for i in range(n_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 16,
    vec_id: str = "vec_id",
    vec: str = "embedding",
    center: bool = False,
) -> DataFrame:
    """(vec_a, vec_b, cosine_sim ≥ threshold) within sign buckets.

    ``center=True`` buckets on mean-centered vectors (``center_embeddings``)
    — required for anisotropic/all-positive embeddings where raw signs pile
    everything into one hot bucket; exact cosine still uses the RAW vectors,
    so only candidate generation changes, not the verified similarity."""
    if center:
        centered = center_embeddings(df, vec)
        keyed = centered.select(
            F.col(vec_id), F.col(vec),
            sign_bucket_col(F.col(f"{vec}_centered"), n_planes).alias("bucket"),
        )
    else:
        keyed = df.select(
            F.col(vec_id), F.col(vec),
            sign_bucket_col(F.col(vec), n_planes).alias("bucket"),
        )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{vec_id}") < F.col(f"b.{vec_id}")),
        )
        .withColumn("cosine_sim", cosine_col(F.col(f"a.{vec}"), F.col(f"b.{vec}")))
        .filter(F.col("cosine_sim") >= threshold)
        .select(
            F.col(f"a.{vec_id}").alias("vec_a"),
            F.col(f"b.{vec_id}").alias("vec_b"),
            F.col("a.bucket").alias("bucket"),
            "cosine_sim",
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    query_id: str = "query_id",
    vec_id: str = "vec_id",
    vec: str = "embedding",
    centroid_id: str = "centroid_id",
) -> DataFrame:
    """IVF-Flat approximate top-k.

    ``centroids``: (centroid_id, embedding) — e.g. per-label centroids from
    plans/embedding_parity.sql_centroids or a KMeans fit.  Corpus vectors are
    assigned to their nearest centroid (broadcast argmin); each query probes
    its ``n_probe`` nearest lists.  The only shuffle is the list-id join.
    """
    from pyspark.sql import Window

    cent = centroids.select(F.col(centroid_id), F.col(vec).alias("__centvec"))

    assigned = (
        corpus.join(F.broadcast(cent))
        .withColumn("__sim", cosine_col(F.col(vec), F.col("__centvec")))
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(vec_id).orderBy(F.col("__sim").desc(), F.col(centroid_id))
            ),
        )
        .filter("__rk = 1")
        .select(F.col(vec_id), F.col(vec).alias("__cvec"), F.col(centroid_id))
    )
    probes = (
        queries.join(F.broadcast(cent))
        .withColumn("__sim", cosine_col(F.col(vec), F.col("__centvec")))
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy(query_id).orderBy(F.col("__sim").desc(), F.col(centroid_id))
            ),
        )
        .filter(F.col("__rk") <= n_probe)
        .select(F.col(query_id), F.col(vec).alias("__qvec"), F.col(centroid_id))
    )
    scored = (
        probes.join(assigned, centroid_id)
        .withColumn("cosine_sim", cosine_col(F.col("__qvec"), F.col("__cvec")))
        .select(query_id, vec_id, "cosine_sim")
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine_sim").desc(), F.col(vec_id).asc())
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
