"""Similarity-search queries over the ``embeddings`` table (64-dim float
vectors): brute-force cosine top-k, per-label centroids, and sign-bucketed
(SimHash-style LSH) near-duplicate pairs.  Dual-dialect like the other
parity modules — dot products are sequential index folds with explicit
DOUBLE casts, so both engines produce bit-identical similarity values.

Scale design:
  * brute-force KNN is the correctness baseline: |Q| × |C| pairs — fine for
    a bounded query set, quadratic otherwise.  The scale path is EMB3's
    bucketing (hyperplane-sign LSH): candidates meet only inside a bucket,
    so the join shuffles on the bucket key instead of crossing everything.
  * per-dim centroid aggregation shuffles once on (label, dim) with exact
    decimal accumulation — partial aggregation makes it map-combined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .dialect import d, elem, fold, list_len, r6t, seq
from .queries import QUERIES

N_QUERY_VECS = 5
TOP_K = 10


def _dot(dialect: str, a: str, b: str) -> str:
    prods = (
        f"{'transform' if dialect == 'spark' else 'list_transform'}"
        f"({seq(dialect, '1', list_len(dialect, a))}, i -> "
        f"CAST({elem(dialect, a, 'CAST(i AS INT)')} AS DOUBLE) * "
        f"CAST({elem(dialect, b, 'CAST(i AS INT)')} AS DOUBLE))"
    )
    return fold(dialect, prods, "acc + x")


def _cosine(dialect: str, a: str, b: str) -> str:
    return (
        f"({_dot(dialect, a, b)}) / "
        f"(sqrt({_dot(dialect, a, a)}) * sqrt({_dot(dialect, b, b)}))"
    )


def sql_knn(dialect: str) -> str:
    """EMB1 — brute-force cosine top-k: query vecs (vec_id < 5) × all
    candidates, rank by rounded similarity with vec_id tie-break (total
    order → deterministic top-k in both engines)."""
    cos = _cosine(dialect, "q.embedding", "c.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id, c.label,
         {r6t(cos)} AS cosine_sim
  FROM embeddings q CROSS JOIN embeddings c
  WHERE q.vec_id < {N_QUERY_VECS} AND c.vec_id <> q.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC) AS rk
  FROM scored
)
SELECT query_id, vec_id, label, cosine_sim, rk
FROM ranked WHERE rk <= {TOP_K}
"""


def sql_centroids(dialect: str) -> str:
    """EMB2 — per-label centroids in long form (label, dim, centroid):
    one shuffle on (label, dim), exact decimal accumulation."""
    dims = seq(dialect, "1", list_len(dialect, "embedding"))
    if dialect == "spark":
        exploded = (
            f"SELECT label, dim, CAST(element_at(embedding, dim) AS DOUBLE) AS val "
            f"FROM embeddings LATERAL VIEW explode({dims}) _e AS dim"
        )
    else:
        exploded = (
            f"SELECT label, unnest({dims}) AS dim, NULL AS val FROM embeddings"
        )
        # DuckDB: unnest once, then index — rewrite with a positional join
        exploded = (
            "SELECT e.label, i.dim, CAST(e.embedding[i.dim] AS DOUBLE) AS val "
            "FROM embeddings e CROSS JOIN "
            "(SELECT unnest(generate_series(1, 64)) AS dim) i "
            "WHERE i.dim <= len(e.embedding)"
        )
    return f"""
WITH vals AS ({exploded})
SELECT label, dim,
       {r6t("CAST(SUM(CAST(val AS DECIMAL(18,6))) AS DOUBLE) / COUNT(val)")}
         AS centroid,
       COUNT(val) AS n_vectors
FROM vals
GROUP BY label, dim
"""


def _bucketed_pair_ctes(dialect: str) -> str:
    """keyed + pairs CTE text shared by EMB3 (pair listing) and EMB7
    (cluster rollup)."""
    bits = " + ".join(
        f"(CASE WHEN CAST({elem(dialect, 'embedding', str(i))} AS DOUBLE) > {d('0.0')} "
        f"THEN {2 ** (i - 1)} ELSE 0 END)"
        for i in range(1, 17)
    )
    cos = _cosine(dialect, "a.embedding", "b.embedding")
    return f"""keyed AS (
  SELECT vec_id, label, embedding, {bits} AS bucket
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
         {r6t(cos)} AS cosine_sim
  FROM keyed a JOIN keyed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)"""


def sql_bucketed_near_dup(dialect: str) -> str:
    """EMB3 — hyperplane-sign LSH near-dup: bucket = sign pattern of the
    first 16 dims (a 16-bit key); exact cosine verified only inside buckets.
    The bucket join is the sole shuffle — the 100 TB path, traded against
    recall for pairs straddling a sign boundary."""
    return f"""
WITH {_bucketed_pair_ctes(dialect)}
SELECT vec_a, vec_b, bucket, cosine_sim
FROM pairs WHERE cosine_sim >= {d('0.2')}
"""


def sql_centered_near_dup(dialect: str) -> str:
    """EMB6 — the centered variant of EMB3 (operators/similarity
    ``center_embeddings``): bucket on sign(x_i − mean_i) for the first 16
    dims, so anisotropic/all-positive embeddings can't pile into one hot
    bucket.  The 16 per-dim means are one aggregate pass cross-joined back
    as scalars; exact cosine still verifies on the RAW vectors, so
    centering changes candidate generation only."""
    # decimal-accumulated means (order-independent, bit-identical across
    # engines — a plain avg() could differ in the last ulp and flip the
    # bucket of a value sitting exactly on a hyperplane)
    mean_cols = ", ".join(
        f"CAST(SUM(CAST(CAST({elem(dialect, 'embedding', str(i))} AS DOUBLE) "
        f"AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS m{i}"
        for i in range(1, 17)
    )
    bits = " + ".join(
        f"(CASE WHEN CAST({elem(dialect, 'embedding', str(i))} AS DOUBLE) - m{i} "
        f"> {d('0.0')} THEN {2 ** (i - 1)} ELSE 0 END)"
        for i in range(1, 17)
    )
    cos = _cosine(dialect, "a.embedding", "b.embedding")
    return f"""
WITH means AS (
  SELECT {mean_cols} FROM embeddings
),
keyed AS (
  SELECT vec_id, label, embedding, {bits} AS bucket
  FROM embeddings CROSS JOIN means
),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
         {r6t(cos)} AS cosine_sim
  FROM keyed a JOIN keyed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, bucket, cosine_sim
FROM pairs WHERE cosine_sim >= {d('0.2')}
"""


N_LISTS = 8  # IVF codebook size (deterministic seeds: lowest vec_ids)
N_PROBE = 2  # lists probed per query


def sql_ivf_topk(dialect: str) -> str:
    """EMB4 — IVF-Flat approximate top-k, the 100 TB ANN scale path
    (operators/similarity.ivf_topk is the DataFrame twin).

    Deterministic codebook: the ``N_LISTS`` lowest-id embeddings act as
    list centroids (no RNG — a KMeans fit would replace ``cent`` in
    production).  Every corpus vector is assigned to its nearest list
    (broadcast argmin, rounded sim + centroid-id tie-break so both engines
    pick identical lists); each query probes its ``N_PROBE`` nearest lists
    and scores exact cosine only there — the list-id join is the sole
    shuffle, vs. emb1's full cross product."""
    acos = _cosine(dialect, "e.embedding", "c.cvec")
    qcos = _cosine(dialect, "q.embedding", "c.cvec")
    scos = _cosine(dialect, "p.qvec", "a.embedding")
    return f"""
WITH cent AS (
  SELECT vec_id AS centroid_id, embedding AS cvec
  FROM embeddings WHERE vec_id < {N_LISTS}
),
asim AS (
  SELECT e.vec_id, e.label, e.embedding, c.centroid_id, {acos} AS c0
  FROM embeddings e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, label, embedding, centroid_id
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY {r6t('c0')} DESC, centroid_id ASC) AS rk
    FROM asim
  ) t WHERE rk = 1
),
qsim AS (
  SELECT q.vec_id AS query_id, q.embedding AS qvec, c.centroid_id, {qcos} AS c0
  FROM embeddings q CROSS JOIN cent c
  WHERE q.vec_id < {N_QUERY_VECS}
),
probes AS (
  SELECT query_id, qvec, centroid_id
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY {r6t('c0')} DESC, centroid_id ASC) AS rk
    FROM qsim
  ) t WHERE rk <= {N_PROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id, a.label, {scos} AS c0
  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
  WHERE a.vec_id <> p.query_id
)
SELECT query_id, vec_id, label, cosine_sim, rk
FROM (
  SELECT query_id, vec_id, label, {r6t('c0')} AS cosine_sim,
         row_number() OVER (
           PARTITION BY query_id ORDER BY {r6t('c0')} DESC, vec_id ASC) AS rk
  FROM scored
) t WHERE rk <= {TOP_K}
"""


_BODIES = {
    "emb1_knn_cosine": sql_knn,
    "emb2_label_centroids": sql_centroids,
    "emb3_lsh_near_dup": sql_bucketed_near_dup,
    "emb4_ivf_topk": sql_ivf_topk,
    "emb6_centered_lsh": sql_centered_near_dup,
}

EMBEDDING_ORACLES = {name: body("duck") for name, body in _BODIES.items()}


def _make_query(body):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
        return spark.sql(body("spark"))

    return fn


for _name, _body in _BODIES.items():
    QUERIES[_name] = _make_query(_body)


def sql_embedding_clusters(dialect: str) -> str:
    """EMB7 — embedding near-dup CLUSTERS: connected components over the
    EMB3 pair graph (cosine ≥ 0.2 inside sign-LSH buckets), labeled by the
    component's min vec_id, with size and canonical flag — the embedding
    twin of DD6.  SQL = recursive transitive closure (DuckDB oracle only;
    see plans/text_parity.sql_dup_clusters for why Spark cannot run
    set-UNION recursion); the engine path is operators.dedup.dup_clusters."""
    return f"""
WITH RECURSIVE {_bucketed_pair_ctes(dialect)},
nd AS (SELECT vec_a, vec_b FROM pairs WHERE cosine_sim >= {d('0.2')}),
edges AS (
  SELECT vec_a AS u, vec_b AS v FROM nd
  UNION
  SELECT vec_b AS u, vec_a AS v FROM nd
),
reach AS (
  SELECT u, u AS lbl FROM edges
  UNION
  SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.u
),
cc AS (SELECT u AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY u),
sizes AS (SELECT cluster_id, count(*) AS cluster_size FROM cc GROUP BY cluster_id)
SELECT cc.vec_id, cc.cluster_id, sizes.cluster_size,
       (cc.vec_id = cc.cluster_id) AS is_canonical
FROM cc JOIN sizes ON cc.cluster_id = sizes.cluster_id
"""


def _emb7_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMB7, Spark side: EMB3's SQL pair plan feeding dup_clusters."""
    from ..operators.dedup import dup_clusters

    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    pairs = spark.sql(sql_bucketed_near_dup("spark")).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    cc = dup_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "cluster_id").select(
        "vec_id",
        "cluster_id",
        "cluster_size",
        (F.col("vec_id") == F.col("cluster_id")).alias("is_canonical"),
    )


QUERIES["emb7_embedding_clusters"] = _emb7_clusters
EMBEDDING_ORACLES["emb7_embedding_clusters"] = sql_embedding_clusters("duck")


def sql_embedding_audit(dialect: str) -> str:
    """DQ3 — data-quality audit for the EMBEDDING table, the dq1/dq2
    companion for the similarity family's input contract: per label, the
    vector count, dimensionality violations (≠ 64), vectors containing
    NaN elements, zero-norm vectors (undefined cosine — the emb-family
    operators divide by the norm), plus deterministic norm statistics
    (decimal-accumulated mean of the ROUNDED per-vector norm, min/max
    rounded norms).  A broken encoder shows up here before it poisons
    dedup/ANN results downstream.  One fused scan, one map-combinable
    aggregate on the label — the dq1 single-pass shape; per-vector norms
    are sequential index folds, so both engines produce bit-identical
    doubles."""
    norm2 = fold(
        dialect,
        (f"{'transform' if dialect == 'spark' else 'list_transform'}"
         f"(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"),
        "acc + x",
    )
    has_nan = (
        f"{list_len(dialect, ('filter(embedding, x -> isnan(CAST(x AS DOUBLE)))' if dialect == 'spark' else 'list_filter(embedding, x -> isnan(CAST(x AS DOUBLE)))'))} > 0"
    )
    rnorm = r6t(f"sqrt({norm2})")
    return f"""
WITH per_vec AS (
  SELECT label,
         {list_len(dialect, "embedding")} AS dim,
         CASE WHEN {has_nan} THEN 1 ELSE 0 END AS with_nan,
         CASE WHEN {has_nan} THEN NULL ELSE {rnorm} END AS rnorm
  FROM embeddings
  WHERE embedding IS NOT NULL
)
SELECT label,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN dim <> 64 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dim_mismatch,
       CAST(sum(with_nan) AS BIGINT) AS n_with_nan,
       CAST(sum(CASE WHEN rnorm <= {d("0.0")} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero_norm,
       {r6t(f"CAST(sum(CAST(rnorm AS DECIMAL(18,6))) AS DOUBLE) / count(rnorm)")}
         AS mean_norm,
       min(rnorm) AS min_norm,
       max(rnorm) AS max_norm
FROM per_vec
GROUP BY label
"""


QUERIES["dq3_embedding_audit"] = _make_query(sql_embedding_audit)
EMBEDDING_ORACLES["dq3_embedding_audit"] = sql_embedding_audit("duck")


# --- EMB15: SemDeDup (semantic dedup: cluster, then dedup within) -----------
SEMDEDUP_K = 16  # coarse clusters — shrinks the pairwise term by ~k
# Within-cluster verification threshold.  NOT emb3's 0.2: LSH sign buckets
# are tiny (16-bit keys), so a loose floor stays selective there, but a
# coarse cluster holds ~n/k vectors and random 64-dim cosines reach 0.2
# routinely (σ ≈ d^-1/2 = 0.125) — at 0.2 the transitive closure chains
# ~98% of the corpus into one component and "dedup" ≈ drop everything.
# 0.95 keeps only true semantic duplicates (SemDeDup's operating range).
SEMDEDUP_THRESHOLD = "0.95"


def _semantic_ctes(dialect: str) -> str:
    """assigned + nd CTE text shared by EMB15's Spark side and its DuckDB
    oracle: deterministic stride-seed clustering (kmeans_fit's n_iter=0
    seed rule — rank by vec_id, every ⌊n/k⌋-th vector, EXPRESSIBLE in
    both engines so the oracle can recompute membership), argmax-cosine
    assignment with lowest-cid ties, then candidate pairs ONLY within a
    cluster (the SemDeDup point: pair work drops from n² to Σ_c n_c²),
    exact-cosine verified at the strict SemDeDup threshold (see SEMDEDUP_THRESHOLD).  All numerics are
    sequential folds — bit-identical across engines, so the argmax and
    the threshold cut agree exactly."""
    k = SEMDEDUP_K
    # norms are precomputed per vector/seed: sqrt(dot(x,x)) cached in a
    # column is the SAME IEEE ops as _cosine's inline form, so values stay
    # bit-identical while the pair stage drops from three 64-dim folds per
    # pair to one (the fold is interpreted per element — it dominates)
    cos_assign = (
        f"({_dot(dialect, 'r.embedding', 's.cvec')}) / (r.nrm * s.cnrm)"
    )
    cos_pair = (
        f"({_dot(dialect, 'a.embedding', 'b.embedding')}) / (a.nrm * b.nrm)"
    )
    # Planted fixture: the synthetic corpus holds no true semantic twins
    # (max organic within-cluster cosine ≈ 0.48), so every 25th vector
    # re-enters under a new id with a deterministic ±0.3% per-dim gain
    # ripple — cosine ≈ 0.999 to its source, the "same content,
    # different encoder-run noise" case SemDeDup exists to catch.  Both
    # dialects compute the identical ripple (index bases aligned).
    if dialect == "spark":
        ident = "transform(embedding, x -> CAST(x AS DOUBLE))"
        pert = (
            "transform(embedding, (x, i) -> CAST(x AS DOUBLE) * "
            "(CAST(1.0 AS DOUBLE) + CAST(0.001 AS DOUBLE) * "
            "CAST(pmod(i + 1, 7) - 3 AS DOUBLE)))"
        )
    else:
        ident = "list_transform(embedding, x -> CAST(x AS DOUBLE))"
        pert = (
            "list_transform(embedding, (x, i) -> CAST(x AS DOUBLE) * "
            "(1.0 + 0.001 * (CAST(i % 7 AS DOUBLE) - 3)))"
        )
    return f"""corpus AS (
  SELECT vec_id, {ident} AS embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {SEMDEDUP_PLANT_BASE} AS vec_id, {pert} AS embedding
  FROM embeddings WHERE vec_id % 25 = 0
),
ranked AS (
  SELECT vec_id, embedding, sqrt({_dot(dialect, "embedding", "embedding")}) AS nrm,
         row_number() OVER (ORDER BY vec_id ASC) AS rn,
         count(*) OVER () AS n
  FROM corpus
),
seeds AS (
  SELECT CAST(row_number() OVER (ORDER BY rn ASC) - 1 AS INT) AS cid,
         embedding AS cvec, nrm AS cnrm
  FROM (
    SELECT rn, embedding, nrm FROM ranked
    WHERE (rn - 1) % greatest(CAST(floor(CAST(n AS DOUBLE) / {k}) AS BIGINT), 1) = 0
    ORDER BY rn ASC LIMIT {k}
  ) s0
),
scored AS (
  SELECT r.vec_id, r.embedding, r.nrm, s.cid, {cos_assign} AS cs
  FROM ranked r CROSS JOIN seeds s
),
assigned AS (
  SELECT vec_id, embedding, nrm, cid FROM (
    SELECT vec_id, embedding, nrm, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC) AS rk
    FROM scored
  ) t WHERE rk = 1
),
nd AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cid
  FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE {cos_pair} >= {d(SEMDEDUP_THRESHOLD)}
)"""


def sql_semantic_dedup(dialect: str) -> str:
    """EMB15 — SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication"): cluster the
    corpus coarsely, then find duplicates ONLY within clusters and keep
    one canonical survivor per connected component.  The embedding twin
    of sp8's gate-the-pipeline story: emb3/emb6 bucket by hyperplane
    SIGNS, SemDeDup buckets by cluster MEMBERSHIP — the shape that
    scales semantic dedup to web corpora (pair work Σ_c n_c², never n²).
    Output: every vector with its cluster id, its dup-component label
    (itself when unique), and the keep flag.  SQL = recursive closure
    (DuckDB oracle only — see sql_embedding_clusters); the engine path
    composes kmeans_fit seeds + operators/similarity.semantic_dedup_pairs
    + dedup.dup_clusters."""
    return f"""
WITH RECURSIVE {_semantic_ctes(dialect)},
edges AS (
  SELECT vec_a AS u, vec_b AS v FROM nd
  UNION
  SELECT vec_b AS u, vec_a AS v FROM nd
),
reach AS (
  SELECT u, u AS lbl FROM edges
  UNION
  SELECT e.u, r.lbl FROM edges e JOIN reach r ON e.v = r.u
),
cc AS (SELECT u AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY u)
SELECT a.vec_id, a.cid,
       COALESCE(cc.cluster_id, a.vec_id) AS dup_group,
       (COALESCE(cc.cluster_id, a.vec_id) = a.vec_id) AS keep
FROM assigned a LEFT JOIN cc ON a.vec_id = cc.vec_id
"""


SEMDEDUP_PLANT_BASE = 1_000_000


def planted_semantic_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The emb15 fixture as a DataFrame — the SAME spark-dialect exprs the
    CTE rendering uses (one definition; the operator-vs-rendering pin
    test consumes this), with a guard: organic vec_ids must sit below
    the planted-id offset or twin ids would collide with real ones and
    the rank-based seed selection would tie nondeterministically."""
    emb = load_table(spark, sf_dir, "embeddings")
    max_id = emb.agg(F.max("vec_id")).first()[0]
    if max_id is not None and max_id >= SEMDEDUP_PLANT_BASE:
        raise ValueError(
            f"emb15 fixture: corpus vec_ids reach {max_id} ≥ the planted-id "
            f"offset {SEMDEDUP_PLANT_BASE}; raise SEMDEDUP_PLANT_BASE (and "
            "the CTE rendering's literal) above the id range"
        )
    return emb.selectExpr(
        "vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding"
    ).unionByName(
        emb.filter("vec_id % 25 = 0").selectExpr(
            f"vec_id + {SEMDEDUP_PLANT_BASE} AS vec_id",
            "transform(embedding, (x, i) -> CAST(x AS DOUBLE) * "
            "(CAST(1.0 AS DOUBLE) + CAST(0.001 AS DOUBLE) * "
            "CAST(pmod(i + 1, 7) - 3 AS DOUBLE))) AS embedding",
        )
    )


def _emb15_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EMB15, Spark side: ONE rendered plan computes the assignment
    (bit-identical to the oracle's CTEs), a lazy localCheckpoint pins it,
    and the within-cluster pair stage self-joins the CHECKPOINTED frame
    (dot/(nrm·nrm) — the same IEEE ops as the rendering's nd CTE, which
    only the DuckDB oracle executes; a second spark.sql plan would
    re-run the O(n·k) scoring subtree three more times).  dup_clusters
    runs the closure (Spark cannot run set-UNION recursion), and every
    vector comes back with its keep flag.  Production uses
    operators/similarity.semantic_dedup_pairs (same math from a trained
    kmeans codebook — pinned ≡ this rendering by test) and trains with
    n_iter > 0; the seed-only rule here exists so the ORACLE can
    recompute cluster membership exactly."""
    from ..operators.dedup import dup_clusters

    planted_semantic_corpus(spark, sf_dir)  # runs the id-range guard
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    assigned = spark.sql(
        f"WITH {_semantic_ctes('spark')} "
        "SELECT vec_id, embedding, nrm, cid FROM assigned"
    ).localCheckpoint(eager=False)
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = (
        F.aggregate(
            F.zip_with(
                F.col("a.embedding"),
                F.col("b.embedding"),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (F.col("a.nrm") * F.col("b.nrm"))
    )
    pairs = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= float(SEMDEDUP_THRESHOLD))
        .select(F.col("a.vec_id").alias("doc_a"), F.col("b.vec_id").alias("doc_b"))
    )
    cc = dup_clusters(pairs).select(
        F.col("doc_id").alias("vec_id"), F.col("cluster_id")
    )
    return (
        assigned.join(cc, "vec_id", "left")
        .select(
            "vec_id",
            "cid",
            F.coalesce("cluster_id", "vec_id").alias("dup_group"),
            (F.coalesce("cluster_id", "vec_id") == F.col("vec_id")).alias("keep"),
        )
    )


QUERIES["emb15_semantic_dedup"] = _emb15_semantic_dedup
EMBEDDING_ORACLES["emb15_semantic_dedup"] = sql_semantic_dedup("duck")
