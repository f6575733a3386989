"""Session-memoized fixture artifacts shared across verification queries.

The ANN verification league (emb13 / emb19 / emb21) each train the SAME
default IVF-PQ quantizer pair on the SAME full embeddings table inside
their query — deliberate per-query self-containment that costs one
redundant k-means fit per query in a bench/driver session (the r15
verdict's remaining structural trim).  The fit is a pure deterministic
function of the corpus (k-means seeding is partition-offset based over
the same single-source scan), so memoizing it per (Spark application,
sf_dir) is VALUE-INVISIBLE: every consumer receives bit-identical
codebooks whether it hits or misses, queries stay independently runnable
(a miss just trains as before), and no cross-query state can leak
because the cache key pins both the session and the corpus.

Cached at the ``ivfpq_build`` level (quantizers + the encoded index
frame) rather than ``ivfpq_fit`` so emb13's index consumer shares the
residual pass too; the index frame is localCheckpoint-materialized
inside ``ivfpq_build`` and is corpus-row-sized (vec_id, list_id,
pq_codes) — session-resident like the dd2 snapshot rule.

dq4/dq5 keep their own fits ON PURPOSE: they train different quantizers
(custom n_lists/m/k, different n_iter) on a fixture SEGMENT, not the
full table — nothing to share.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sources.readers import load_table

_IVFPQ_BUILD_CACHE: dict[tuple[str, str], tuple] = {}


def shared_ivfpq_build(spark: SparkSession, sf_dir: str):
    """(coarse, fine, index) for the DEFAULT ``ivfpq_build(emb, n_iter=2)``
    over the full embeddings table — trained at most once per Spark
    application per sf_dir."""
    from ..operators.similarity import ivfpq_build

    key = (spark.sparkContext.applicationId, sf_dir)
    got = _IVFPQ_BUILD_CACHE.get(key)
    if got is None:
        emb = load_table(spark, sf_dir, "embeddings")
        got = ivfpq_build(emb, n_iter=2)
        _IVFPQ_BUILD_CACHE[key] = got
    return got
