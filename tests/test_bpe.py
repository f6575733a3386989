"""BPE merge training: hand-computed merges, python-reference equality for
the distributed path, determinism, and the monotone-count invariant."""

from __future__ import annotations

from real_time_stock_market_data_pipeline_spark.operators import bpe


def test_hand_computed_merges(spark):
    """Classic fixture: {'low':5,'lower':2,'newest':6,'widest':3} — the
    first merges must be es(9) -> est(9) -> lo(7), the textbook trace."""
    docs = spark.createDataFrame(
        [(1, " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3))],
        "doc_id LONG, text STRING",
    )
    merges = bpe.train_bpe_merges(docs, n_merges=3)
    assert [(a, b, c) for a, b, c in merges] == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("l", "o", 7),
    ]


def test_distributed_path_matches_driver_path(spark, sf_dir):
    """max_driver_words=0 forces the per-round Spark loop; it must learn
    exactly the driver union of the python greedy loop."""
    from real_time_stock_market_data_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    fast = bpe.train_bpe_merges(docs, n_merges=6)
    dist = bpe.train_bpe_merges(docs, n_merges=6, max_driver_words=0)
    assert fast == dist and len(fast) == 6


def test_monotone_counts_and_determinism(spark, sf_dir):
    from real_time_stock_market_data_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    m1 = bpe.train_bpe_merges(docs, n_merges=12)
    m2 = bpe.train_bpe_merges(docs, n_merges=12)
    assert m1 == m2
    counts = [c for _, _, c in m1]
    assert counts == sorted(counts, reverse=True)
    frame = bpe.merges_frame(spark, m1)
    assert frame.filter("NOT count_monotone").count() == 0


def test_apply_bpe_matches_python_segmentation(spark):
    """The broadcast-join tokenization equals per-word python segmentation,
    and respects the word/char bounds."""
    docs = spark.createDataFrame(
        [(1, "low lower newest"), (2, "widest low")],
        "doc_id LONG, text STRING",
    )
    merges = bpe.train_bpe_merges(docs, n_merges=4)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    out = {r["doc_id"]: r for r in bpe.apply_bpe(docs, merges).collect()}
    exp1 = sum(len(bpe._segment(w, ranks)) for w in "low lower newest".split())
    exp2 = sum(len(bpe._segment(w, ranks)) for w in "widest low".split())
    assert out[1]["n_bpe_tokens"] == exp1 and out[1]["n_words"] == 3
    assert out[2]["n_bpe_tokens"] == exp2 and out[2]["n_words"] == 2


def test_apply_bpe_vocab_guard(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b c")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="persisted incremental table"):
        bpe.apply_bpe(docs, [], max_driver_words=1)
