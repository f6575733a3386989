"""Focused pins for the r19 optimization-round operator internals:
the written-codebook memo prime (``_prime_pq_codebook_memo`` — the value
a primed entry serves must equal what a collect would return, and a
later rewrite must still invalidate), the single-scan purge metrics
(values ≡ the old two-scan formulas), the rebuild coverage validation
now raising BETWEEN the coarse and fine fits, and the clear
dim-mismatch errors on the arrow encode paths.  Each change alters HOW
a value is produced or WHEN an error surfaces, never the value — these
tests pin that."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline_spark.operators import similarity as sim


def _fixture_vectors(spark, n=64, dim=8):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: (F.col("id") * 7 + j * 3).cast("double") % 11.0,
        ).alias("embedding"),
    )


def _memo_key(spark, dir_path):
    import os

    return (spark.sparkContext.applicationId, os.path.abspath(dir_path))


def test_init_pq_index_prime_equals_fresh_read(spark, tmp_path):
    """The primed entry must be bit-identical to what the collect path
    returns — the value-invisibility contract of the prime."""
    df = _fixture_vectors(spark)
    cbs = sim.pq_fit(df, m=2, k=4, n_iter=1)
    path = str(tmp_path / "pqidx")
    sim.init_pq_index(spark, cbs, path)
    key = _memo_key(spark, f"{path}/codebooks")
    primed = sim._STORE_CODEBOOK_CACHE.get(key)
    assert primed is not None, "init_pq_index must prime the memo"
    # force the collect path and compare values exactly
    sim._STORE_CODEBOOK_CACHE.pop(key)
    fresh = sim.load_pq_codebooks(spark, path)
    assert fresh == primed[1]
    # and the token matches what a fresh read stores, so the primed
    # entry would have been served verbatim
    assert sim._STORE_CODEBOOK_CACHE[key][0] == primed[0]


def test_prime_still_invalidates_on_rewrite(spark, tmp_path):
    """A rewrite BYPASSING init (new part files) must defeat the primed
    entry exactly as it defeats a collected one (fs-token contract)."""
    df = _fixture_vectors(spark)
    cbs = sim.pq_fit(df, m=2, k=4, n_iter=1)
    path = str(tmp_path / "pqidx")
    sim.init_pq_index(spark, cbs, path)
    assert sim.load_pq_codebooks(spark, path) == [
        [[float(x) for x in c] for c in cb] for cb in cbs
    ]
    # out-of-band rewrite with DIFFERENT values
    rows = [(j, c, [float(j + c + 1)] * 4) for j in range(2) for c in range(4)]
    spark.createDataFrame(
        rows, "sub_id int, centroid_id int, centroid array<double>"
    ).write.mode("overwrite").parquet(f"{path}/codebooks")
    got = sim.load_pq_codebooks(spark, path)
    assert got == [[[float(j + c + 1)] * 4 for c in range(4)] for j in range(2)]


def test_rebuild_pq_codes_primes_installed_path(spark, tmp_path):
    df = _fixture_vectors(spark)
    cbs = sim.pq_fit(df, m=2, k=4, n_iter=1)
    path = str(tmp_path / "pqstore")
    sim.init_pq_index(spark, cbs, path)
    sim.update_pq_codes(spark, df, path)
    sim.rebuild_pq_codes(spark, df, path, n_iter=1)
    key = _memo_key(spark, f"{path}/codebooks")
    primed = sim._STORE_CODEBOOK_CACHE.get(key)
    assert primed is not None
    sim._STORE_CODEBOOK_CACHE.pop(key)
    assert sim.load_pq_codebooks(spark, path) == primed[1]
    # no stale staging entries survive the swap
    import os

    stale = [
        k for k in sim._STORE_CODEBOOK_CACHE
        if isinstance(k, tuple) and "__staging_" in str(k[1])
        and str(tmp_path) in str(k[1])
    ]
    assert stale == []
    assert os.path.isdir(f"{path}/codes")


def test_rebuild_ivfpq_primes_both_levels(spark, tmp_path):
    df = _fixture_vectors(spark)
    coarse, fine = sim.ivfpq_fit(df, n_lists=4, m=2, k=4, n_iter=1)
    path = str(tmp_path / "ivfpq")
    sim.init_ivfpq_index(spark, coarse, fine, path)
    sim.update_ivfpq_index(spark, df, path)
    sim.rebuild_ivfpq_index(spark, df, path, n_lists=4, n_iter=1)
    for lvl in ("coarse", "fine"):
        key = _memo_key(spark, f"{path}/{lvl}/codebooks")
        primed = sim._STORE_CODEBOOK_CACHE.get(key)
        assert primed is not None, lvl
        sim._STORE_CODEBOOK_CACHE.pop(key)
        assert sim.load_pq_codebooks(spark, f"{path}/{lvl}") == primed[1], lvl


def test_rebuild_ivfpq_coverage_raises_before_fine_fit(spark, tmp_path, monkeypatch):
    """The r18 verdict's failure-path item: a doomed rebuild must raise
    the coverage mismatch after the COARSE fit, never paying the fine
    retrain — and still mutate nothing on disk."""
    import os

    df = _fixture_vectors(spark)
    coarse, fine = sim.ivfpq_fit(df, n_lists=4, m=2, k=4, n_iter=1)
    path = str(tmp_path / "ivfpq")
    sim.init_ivfpq_index(spark, coarse, fine, path)
    sim.update_ivfpq_index(spark, df, path)
    calls = []
    real_fit = sim.pq_fit

    def counting_fit(*args, **kwargs):
        calls.append(kwargs.get("m", args[1] if len(args) > 1 else None))
        return real_fit(*args, **kwargs)

    monkeypatch.setattr(sim, "pq_fit", counting_fit)
    before = sorted(os.listdir(str(tmp_path)))
    with pytest.raises(ValueError, match="covers"):
        # corpus missing half the accumulated ids — partial coverage
        sim.rebuild_ivfpq_index(
            spark, df.filter("vec_id % 2 = 0"), path, n_lists=4, n_iter=1
        )
    assert len(calls) == 1, "fine fit must not run on the doomed path"
    assert sorted(os.listdir(str(tmp_path))) == before  # no fs mutation


def test_purge_partitioned_single_scan_metrics(spark, tmp_path):
    """touched/n_purged from the one-job groupBy must equal the old
    collect+count pair's values."""
    df = _fixture_vectors(spark)
    coarse, fine = sim.ivfpq_fit(df, n_lists=4, m=2, k=4, n_iter=1)
    path = str(tmp_path / "ivfpq")
    sim.init_ivfpq_index(spark, coarse, fine, path)
    sim.update_ivfpq_index(spark, df, path)
    dels = df.filter("vec_id % 5 = 0").select("vec_id")
    n_dels = dels.count()
    sim.delete_from_ivfpq_index(spark, dels, path)
    res = sim.purge_ivfpq_tombstones(spark, path)
    assert res["n_purged"] == n_dels
    idx = spark.read.parquet(f"{path}/index")
    assert idx.count() == 64 - n_dels
    assert idx.join(dels, "vec_id", "left_semi").count() == 0


def test_purge_doc_keyed_single_scan_metrics(spark, tmp_path):
    from real_time_stock_market_data_pipeline_spark.operators.takedown import (
        purge_doc_keyed_table,
        tombstone_doc_keyed_table,
    )

    path = str(tmp_path / "tab")
    tab = spark.range(40).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("v")
    )
    tab.write.parquet(path)
    ids = spark.range(40).filter("id % 4 = 0").select(F.col("id").alias("doc_id"))
    tombstone_doc_keyed_table(spark, ids, path)
    res = purge_doc_keyed_table(spark, path)
    assert res["n_purged"] == 10
    left = spark.read.parquet(path)
    assert left.count() == 30
    assert left.filter("doc_id % 4 = 0").count() == 0


def test_purge_semantic_single_scan_metrics(spark, tmp_path):
    """n_purged_assigned / n_purged_pairs from the one-scan aggregates
    must match the old two-scan formulas, including the either-end pair
    retraction."""
    from real_time_stock_market_data_pipeline_spark.operators.takedown import (
        purge_semantic_index,
        tombstone_semantic_index,
    )

    root = str(tmp_path / "sem")
    assigned = spark.range(20).select(
        F.col("id").alias("vec_id"), F.lit(0).alias("cid")
    )
    assigned.write.parquet(f"{root}/assigned")
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3), (4, 5), (6, 7), (8, 9)], "vec_a long, vec_b long"
    )
    pairs.write.parquet(f"{root}/pairs")
    # delete 0 (pair end a), 3 (pair end b), 11 (no pair)
    dels = spark.createDataFrame([(0,), (3,), (11,)], "vec_id long")
    tombstone_semantic_index(spark, dels, root)
    res = purge_semantic_index(spark, root)
    assert res["n_purged_assigned"] == 3
    assert res["n_purged_pairs"] == 2  # (0,1) and (2,3)
    left = spark.read.parquet(f"{root}/pairs")
    assert sorted(tuple(r) for r in left.collect()) == [(4, 5), (6, 7), (8, 9)]


def test_pq_encode_dim_mismatch_is_loud(spark):
    """A dim-changing rebuild corpus must die with the CLEAR error, not
    numpy's opaque reshape message (r18 ADVICE)."""
    df = _fixture_vectors(spark, dim=8)
    cbs = sim.pq_fit(df, m=2, k=4, n_iter=1)
    wider = _fixture_vectors(spark, dim=12)
    with pytest.raises(Exception, match="dim-changing rebuild"):
        sim.pq_encode(wider, cbs, arrow=True).select("pq_codes").collect()
