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


def test_apply_bpe_distributed_matches_driver(spark, sf_dir):
    """max_driver_words=0 forces the pandas-UDF segmentation path; per-doc
    token counts must equal the driver-segmented broadcast path exactly."""
    from real_time_stock_market_data_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(60)
    merges = bpe.train_bpe_merges(docs, n_merges=8)
    cols = ["doc_id", "n_words", "n_bpe_tokens"]
    fast = sorted(map(tuple, bpe.apply_bpe(docs, merges).select(*cols).collect()))
    dist = sorted(
        map(
            tuple,
            bpe.apply_bpe(docs, merges, max_driver_words=0).select(*cols).collect(),
        )
    )
    assert fast == dist and len(fast) == 60


def test_train_distributed_codepoint_safe(spark):
    """Non-BMP regression (surrogate pairs): Spark's zero-width split must
    yield CODE POINTS like the python path's list(word) — both training
    paths learn identical merges on emoji-bearing text."""
    text = " ".join(["\U0001f600\U0001f601x"] * 4 + ["\U0001f600\U0001f601y"] * 3)
    docs = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    fast = bpe.train_bpe_merges(docs, n_merges=2)
    dist = bpe.train_bpe_merges(docs, n_merges=2, max_driver_words=0)
    assert fast == dist
    assert fast[0][:2] == ("\U0001f600", "\U0001f601") and fast[0][2] == 7


def test_incremental_segmentation_table(spark, sf_dir, tmp_path):
    """Second batch segments ONLY unseen words (zero recompute on full
    overlap), and tokenization via the persisted table equals one-shot
    apply_bpe on the union."""
    from real_time_stock_market_data_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.train_bpe_merges(docs, n_merges=8)
    b1 = docs.filter("doc_id % 2 = 0")
    b2 = docs.filter("doc_id % 2 = 1")
    path = str(tmp_path / "segmap")

    m1 = bpe.update_segmentation_table(b1, merges, path)
    assert m1["n_new_segmented"] == m1["n_batch_words"] > 0

    m2 = bpe.update_segmentation_table(b2, merges, path)
    expected_new = (
        bpe.word_counts(b2)
        .select("word")
        .join(bpe.word_counts(b1).select("word"), "word", "left_anti")
        .count()
    )
    assert m2["n_new_segmented"] == expected_new < m2["n_batch_words"]

    # re-ingesting batch 1 recomputes nothing
    m3 = bpe.update_segmentation_table(b1, merges, path)
    assert m3["n_new_segmented"] == 0

    cols = ["doc_id", "n_words", "n_bpe_tokens"]
    via_table = sorted(
        map(tuple, bpe.apply_bpe_with_table(docs, path).select(*cols).collect())
    )
    oneshot = sorted(map(tuple, bpe.apply_bpe(docs, merges).select(*cols).collect()))
    assert via_table == oneshot


def test_tokenize_and_encode_docs(spark, tmp_path):
    """tokenize_docs reassembles per-word segmentations in word order
    (pinned against the python reference), and encode_docs maps them to
    the deterministic vocab ids."""
    docs = spark.createDataFrame(
        [(1, "low lower newest"), (2, "widest low")],
        "doc_id LONG, text STRING",
    )
    merges = bpe.train_bpe_merges(docs, n_merges=4)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    path = str(tmp_path / "segmap")
    bpe.update_segmentation_table(docs, merges, path)

    got = {r["doc_id"]: r["bpe_tokens"] for r in bpe.tokenize_docs(docs, path).collect()}
    exp = {
        1: [t for w in "low lower newest".split() for t in bpe._segment(w, ranks)],
        2: [t for w in "widest low".split() for t in bpe._segment(w, ranks)],
    }
    assert got == exp

    vocab = {r["token"]: r["token_id"] for r in bpe.token_vocab(spark, path).collect()}
    assert sorted(vocab.values()) == list(range(len(vocab)))
    ids = {r["doc_id"]: r["token_ids"] for r in bpe.encode_docs(docs, path).collect()}
    assert ids == {d: [vocab[t] for t in toks] for d, toks in exp.items()}
