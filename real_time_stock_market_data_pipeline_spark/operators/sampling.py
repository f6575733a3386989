"""Deterministic sampling & dataset-split operators for corpus preparation.

A training-data pipeline must split a corpus into train/val/test and draw
reproducible subsamples.  RNG-based splits (``df.randomSplit``,
``TABLESAMPLE``) are unstable across engines, partitionings, and reruns —
a document's assignment would change when the cluster layout does.  These
operators instead bucket each row by a deterministic content hash of its id
(the engine-neutral polynomial fold, plans/dialect.tok_hash), so:

  * the same id lands in the same split on ANY engine (oracle-checkable);
  * re-ingesting or repartitioning never moves a document between splits —
    the property that prevents test-set leakage across pipeline runs;
  * per-stratum ratios concentrate tightly around the target weights
    (hash uniformity), without a per-stratum shuffle: the assignment is a
    pure per-row projection, embarrassingly parallel at 100 TB.

No reference counterpart (the reference pipeline has no corpus tooling);
this extends its engine to the training-data workload (SURVEY.md §7.2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 100
# Split thresholds over the 100 hash buckets: [0,80) train, [80,90) val,
# [90,100) test.  Mirrored verbatim in plans/text_parity.sql_hash_split.
SPLIT_BOUNDS = {"train": (0, 80), "val": (80, 90), "test": (90, 100)}


def hash_bucket_col(id_col: str = "doc_id", n_buckets: int = N_BUCKETS) -> Column:
    """Deterministic bucket in [0, n_buckets) from the id's string form."""
    # imported lazily: plans/__init__ renders oracle SQL that imports THIS
    # module's constants at package-load time — a module-level dialect
    # import here would close the cycle with sampling half-initialized
    from ..plans.dialect import tok_hash

    return F.expr(tok_hash("spark", f"CAST({id_col} AS STRING)")) % n_buckets


def split_col(id_col: str = "doc_id") -> Column:
    """'train' | 'val' | 'test' assignment from the id hash bucket."""
    b = hash_bucket_col(id_col)
    expr = F.lit(None).cast("string")
    for name, (lo, hi) in SPLIT_BOUNDS.items():
        expr = F.when((b >= lo) & (b < hi), F.lit(name)).otherwise(expr)
    return expr


def assign_split(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Add (bucket, split) columns — a pure projection, no shuffle.

    A NULL id hashes to NULL → NULL bucket and split (and
    ``deterministic_sample`` drops such rows): rows without identity have
    no stable split, and silently defaulting them to one would leak them
    between splits across runs.  Gate upstream with dq-style NOT NULL
    checks if NULL ids are possible."""
    return df.withColumn("bucket", hash_bucket_col(id_col)).withColumn(
        "split", split_col(id_col)
    )


def dup_aware_split(
    df: DataFrame, clusters: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Cluster-coherent split assignment — closes the leak channel plain
    per-doc hash splitting leaves open: if doc A lands in train and its
    near-duplicate A' in test, the test set is contaminated even though
    both splits are individually deterministic (``assign_split`` hashes
    each doc independently, so a dup PAIR straddles the boundary with
    probability ≈ 2·p_train·p_test).  Here every doc hashes by its
    DUP-COMPONENT label instead — ``coalesce(cluster_id, own id)``, with
    ``clusters`` = ``dedup.dup_clusters`` output (doc_id, cluster_id) —
    so an entire near-dup component lands in ONE split by construction;
    singletons (absent from ``clusters``) keep their own-id assignment,
    identical to ``assign_split``'s.

    Scale shape: one left join on the doc id (high-cardinality equi-join;
    the cluster map is collision-sized — far smaller than the corpus)
    plus a pure projection.  Deterministic, stable under reruns and
    repartitioning, nested with every other hash-derived op (same id
    hash).  Adds (cluster_id nullable, bucket, split)."""
    joined = df.join(
        clusters.select(F.col(id_col), "cluster_id"), id_col, "left"
    ).withColumn("__skey", F.coalesce(F.col("cluster_id"), F.col(id_col)))
    return (
        joined.withColumn("bucket", hash_bucket_col("__skey"))
        .withColumn("split", split_col("__skey"))
        .drop("__skey")
    )


def deterministic_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Keep rows whose hash bucket falls under ``rate`` — a reproducible
    ~rate subsample that is STABLE under reruns and repartitioning, and
    NESTED: sample(0.1) ⊆ sample(0.3) ⊆ sample(1.0), which lets scaling
    experiments grow the corpus monotonically."""
    return df.filter(hash_bucket_col(id_col, n_buckets) < int(rate * n_buckets))


def temperature_sample(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Temperature-based mixture sampling at α = 0.5 — the standard
    multilingual rebalancing (sample group i with probability ∝ n_i^α):
    the smallest group keeps everything and a group n times larger keeps
    a √(n_min/n) fraction, flattening the mixture without equalizing it
    (α = 1 is proportional / no change, α = 0 is sp4's full balancing —
    this sits between).

    The keep rule is EXACT INTEGER arithmetic: keep iff
    ``bucket² · n_group < B² · n_min``, which is algebraically
    (bucket/B) < √(n_min/n_group) — the α = ½ keep rate — but with no
    sqrt or float division, so every engine and rerun agrees at the cut
    (same design as sp4's integer rule; a √ computed in floats could
    diverge in the last ulp exactly at a bucket boundary).

    One tiny group-count aggregate + a per-row filter; no corpus shuffle.
    Deterministic, nested with the other hash-derived ops (same id hash),
    and stable under repartitioning.  Adds (bucket, kept)."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n_grp"))
    n_min = counts.agg(F.min("__n_grp").alias("__n_min"))
    b = hash_bucket_col(id_col, n_buckets)
    return (
        df.join(F.broadcast(counts), group_col)
        .crossJoin(F.broadcast(n_min))
        .withColumn("bucket", b)
        .withColumn(
            "kept",
            F.col("bucket") * F.col("bucket") * F.col("__n_grp")
            < F.lit(n_buckets * n_buckets) * F.col("__n_min"),
        )
        .drop("__n_grp", "__n_min")
    )


PACK_CAPACITY = 512  # tokens per packed sequence
PACK_SHARDS = 8  # parallel packing units; scale with the corpus


def pack_sequences(
    df: DataFrame,
    capacity: int = PACK_CAPACITY,
    n_shards: int = PACK_SHARDS,
    id_col: str = "doc_id",
    text: str = "text",
    extra_partition: tuple[str, ...] = (),
) -> DataFrame:
    """Greedy sequence packing — assign each document to the fixed-capacity
    training sequence (bin) where its first token lands, concatenate-and-
    chunk style: documents fill bins in a deterministic pseudo-random
    order and may straddle a bin boundary (the standard pretraining-loader
    contract).  Adds (shard, n_tok, bin).

    Packing is inherently sequential — each bin index depends on the
    running token total — so the scale unit is the SHARD: documents are
    hash-bucketed into ``n_shards`` independent packing streams, each
    packed by one window cumulative sum (one shuffle on the shard key,
    one per-shard sort).  At 100 TB you raise ``n_shards`` with the
    corpus so a shard stays task-sized; packing quality is unaffected
    because the hash order is already a uniform shuffle.  All JVM
    expressions — no Python, no driver state; deterministic under
    reruns and repartitionings (same property as ``assign_split``).
    ``extra_partition`` names passthrough columns that further split the
    packing streams (e.g. pack each train/val/test split separately)."""
    from pyspark.sql import Window
    from .text import tokens_col

    base = df.select(
        *extra_partition,
        F.col(id_col),
        hash_bucket_col(id_col, n_shards).alias("shard"),
        F.size(tokens_col(text)).alias("n_tok"),
        hash_bucket_col(id_col, 1 << 30).alias("__ord"),
    )
    w = (
        Window.partitionBy(*extra_partition, "shard")
        .orderBy(F.col("__ord").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tok").over(w)
    return base.withColumn(
        "bin",
        F.floor((cum - F.col("n_tok")) / F.lit(float(capacity))).cast("int"),
    ).drop("__ord")


MM_PACK_CAPACITY = 160  # joint token+patch budget per multimodal sequence


def pack_multimodal_sequences(
    df: DataFrame,
    capacity: int = MM_PACK_CAPACITY,
    n_shards: int = PACK_SHARDS,
    id_col: str = "doc_id",
    text: str = "text",
    images: str = "images",
    patch: int = 16,
) -> DataFrame:
    """Sequence packing for INTERLEAVED text+image training data: a doc's
    cost = its token count + Σ per-image patch cost (ceil(w/p)·ceil(h/p)
    from the REAL container headers — ``multimodal.image_patch_costs``),
    and bins respect the joint budget with documents (hence images) kept
    WHOLE — the no-split rule multimodal loaders need because an image's
    patches cannot straddle two training sequences.  Contrast
    ``pack_sequences``: text-only pretraining concatenates-and-chunks
    (docs may straddle), so its bin is a pure cumsum; the whole-doc rule
    here is next-fit — a doc that would overflow the open bin closes it
    and starts the next — which is a RECURSIVE fold (the wasted tail of
    each bin depends on every earlier placement), not a window cumsum.

    Scale shape mirrors ``throttle_batch``'s sequential-walk contract:
    one shuffle on the shard key, a per-partition sort, then ONE Arrow
    ``mapInPandas`` walk (linear, carrying (shard, bin, fill) across
    batch boundaries — safe because a shard's rows are contiguous in
    partition-sort order).  Shards are independent packing streams; at
    100 TB you raise ``n_shards`` so a shard stays task-sized.  A doc
    larger than ``capacity`` gets a bin of its own (next-fit never
    splits it).  Returns (id, shard, n_tok, n_patches, cost, bin) with
    bin numbering per shard."""
    from collections.abc import Iterator

    import pandas as pd

    from .multimodal import image_patch_costs
    from .text import tokens_col

    cap = int(capacity)
    if cap <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    idt = df.schema[id_col].dataType.simpleString()
    base = df.select(
        F.col(id_col),
        hash_bucket_col(id_col, n_shards).cast("int").alias("shard"),
        F.size(tokens_col(text)).cast("long").alias("n_tok"),
        image_patch_costs(patch)(F.col(images)).alias("n_patches"),
        hash_bucket_col(id_col, 1 << 30).alias("__ord"),
    ).withColumn("cost", F.col("n_tok") + F.col("n_patches"))
    out_cols = [id_col, "shard", "n_tok", "n_patches", "cost"]
    out_schema = (
        f"{id_col} {idt}, shard int, n_tok long, n_patches long, "
        "cost long, bin int"
    )

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cur = None
        b = 0
        fill = 0
        for pdf in batches:
            if not len(pdf):
                continue
            shards = pdf["shard"].to_numpy()
            costs = pdf["cost"].to_numpy()
            bins = [0] * len(pdf)
            for i in range(len(pdf)):
                if shards[i] != cur:
                    cur, b, fill = shards[i], 0, 0
                c = int(costs[i])
                if fill > 0 and fill + c > cap:
                    b += 1
                    fill = 0
                bins[i] = b
                fill += c
            yield pdf[out_cols].assign(bin=bins)

    return (
        base.repartition("shard")
        .sortWithinPartitions("shard", "__ord", id_col)
        .mapInPandas(walk, out_schema)
    )


def capped_per_group(
    df: DataFrame,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen DETERMINISTICALLY by the
    id-hash order — the class-balancing cut of corpus prep (cap each
    language/source so one crawl cannot dominate training).

    Hash-rank instead of "first N": arrival order is nondeterministic
    across reruns and partitionings, while the hash order is a stable
    pseudo-random shuffle — the kept subset is unbiased w.r.t. document
    content AND reproducible.  One shuffle on the group key (row_number
    window); groups under the cap pass through whole.  Nested with
    ``deterministic_sample`` and ``assign_split``: all three derive from
    the same id hash, so capping never disturbs split membership.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        hash_bucket_col(id_col, 1 << 30).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )
