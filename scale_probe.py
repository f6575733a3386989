"""Scale probes behind COVERAGE.md's "Scale behavior (measured)" table.

Generates synthetic scale-up inputs in /tmp and times representative
queries warm (second run) so growth factors are comparable:

  * events ×10  — 1M rows / 15k symbols (vs sf0.1's 100k / 150): the
    per-symbol window chain, grouped-map indicators (flagship), daily
    summary, ML fits.
  * documents ×4 + ADVERSARIAL hot shingle — 20k docs (vs 5k) where EVERY
    document shares one viral trigram: without the dd2 stop-shingle cut the
    shared-shingle candidate join would produce 20k²/2 pairs through that
    shingle; with the cut (document frequency > 128 dropped) the probe must
    stay ~linear.

Usage: python scale_probe.py  → one JSON line per probe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from real_time_stock_market_data_pipeline_spark.plans import (
    QUERIES,
    flagship,
)
from real_time_stock_market_data_pipeline_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = "/tmp/real_time_stock_market_data_pipeline_spark_scale_probe"

N_EVENTS, N_SYMBOLS = 1_000_000, 15_000
DOC_COPIES = 4
EMB_COPIES = 10
VIRAL = " the common viral phrase every document now shares"

EVENT_QUERIES = [
    "a4_daily_summary", "w_all_indicators", "t6_alerts",
    "u3_linreg_metrics", "u2_arima_forecast", "s14_arima_registry",
    "a9_sketch_rollup", "dq1_expectations", "t10_throttle",
    "a13_ohlc_candles", "w11_vwap",
]
DOC_QUERIES = [
    "dd2_ngram_jaccard", "dd3_minhash_signatures", "txt2_quality",
    "mm3_bmp_pixel_stats", "mm4_wav_stats", "mm5_avi_frame_stats",
    "dd6_dup_clusters", "sp1_hash_split", "dd8_contamination", "txt6_vocab",
    "txt9_bpe_incremental", "sp5_sequence_packing", "sp6_temperature_mixture",
    "txt10_repetition",
    "dd9_incremental_minhash", "dd10_exact_decontamination",
    "txt11_pii_redaction", "txt12_bigram_lm", "txt13_feature_hash",
    "mm7_dhash_pairs",
    "dd11_incremental_decontamination", "mm8_audio_pairs",
    "mm9_video_pairs", "txt14_doc_retrieval",
    "dd12_neardup_decontamination", "mm10_crossmodal_decontamination",
    "dd13_compacted_table", "sp8_decontaminated_pipeline",
    "mm11_triad_decontamination", "sp9_dup_aware_split",
    "txt15_perplexity_filter", "txt16_duplicated_ngrams",
    "txt17_span_dedup", "txt18_quality_classifier",
    "sp10_domain_caps", "sp11_domain_mixture",
    "txt19_incremental_span_dedup", "sp12_curated_corpus",
    "dd14_snapshot_dedup", "mm12_multimodal_packing",
    "sp13_model_curated_corpus", "txt20_ccnet_buckets",
    "txt21_dsir_resample", "txt22_bm25_retrieval", "dd15_paragraph_dedup",
    "sp14_doremi_mixture", "sp15_curriculum_shards",
    "mm13_image_text_alignment",
    "dd17_quality_survivors", "sp16_doremi_manifest",
    "dq6_contamination_audit", "txt23_incremental_bm25",
    "sp17_epoch_shuffle", "emb22_late_interaction",
    "sp20_resume_manifest", "txt26_retrieval_leaderboard",
    "sp21_incremental_curriculum", "dq10_curriculum_drift",
]
# w12/w13 need MULTI-DAY per-symbol series (≥ 10 shared trading days); the
# standard ×10 events probe packs its 1 M rows into ~3 hours of one day, so
# these two get a dedicated wide-day scale-up instead (below).
WIDE_DAY_QUERIES = ["w12_series_similarity", "w13_series_all_pairs",
                    "w14_series_banded_neardup"]
N_WIDE_EVENTS, N_WIDE_SYMBOLS = 1_000_000, 1_500
EMB_QUERIES = [
    "emb2_label_centroids", "emb4_ivf_topk", "emb5_ivf_trained_recall",
    "emb7_embedding_clusters", "emb10_incremental_ivf", "emb11_pq_recall",
    "emb12_incremental_pq", "dq3_embedding_audit", "emb13_ivfpq_recall",
    "emb14_incremental_ivfpq", "emb15_semantic_dedup",
    "emb16_semdedup_keep_policy", "emb17_incremental_semdedup",
    "emb18_filtered_ann", "emb19_filtered_ivfpq", "emb20_d4_prototypes",
    "dd16_semantic_decontamination",
    "emb21_index_deletion", "emb23_matryoshka_recall",
]


def build_scaled(spark) -> str:
    out = os.path.join(SCRATCH, "sfX")
    os.makedirs(out, exist_ok=True)
    # events ×10: deterministic synthetic walk, 15k symbols
    ev = (
        spark.range(N_EVENTS)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % N_SYMBOLS).alias("user_id"),
            F.lit("purchase").alias("event_type"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(secs=(F.col("id") / F.lit(100.0)))
            ).alias("ts"),
            (100.0 + F.sin(F.col("id") / 7.0) * 5.0
             + (F.col("id") % 97).cast("double") / 10.0).alias("value"),
            F.concat(F.lit('{"k": '), (F.col("id") % 1000).cast("string"), F.lit("}"))
            .alias("props"),
        )
    )
    ev.write.mode("overwrite").parquet(f"{out}/events.parquet")
    # documents ×4 with a viral shingle appended to EVERY text
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n = docs.count()
    copies = [
        docs.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(VIRAL)).alias("text"),
            "lang", "source", "n_chars",
        )
        for i in range(DOC_COPIES)
    ]
    allc = copies[0]
    for c in copies[1:]:
        allc = allc.unionByName(c)
    allc.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    # embeddings ×10: replicated vec_ids with a deterministic per-element
    # perturbation so copies are near- but not exact duplicates (keeps the
    # ANN candidate structure realistic instead of degenerate exact ties)
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n_emb = emb.count()

    def _perturb(i: int):
        fi = float(i)
        return lambda x, j: (
            x + F.sin(x * F.lit(fi) + j.cast("double")) * F.lit(0.01)
        ).cast("float")

    ecopies = [emb]
    for i in range(1, EMB_COPIES):
        ecopies.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * n_emb)).alias("vec_id"),
                "label",
                F.transform("embedding", _perturb(i)).alias("embedding"),
            )
        )
    alle = ecopies[0]
    for c in ecopies[1:]:
        alle = alle.unionByName(c)
    alle.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    # unscaled dims/facts dq1's fk checks join against (events is the
    # scaled axis of that probe)
    for t in ("customer", "nation", "region", "orders", "lineitem"):
        spark.read.parquet(f"{BASE}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    return out


def build_wide_days(spark) -> str:
    """events ×10 spread over ~70 DAYS (6 s tick spacing, 1500 symbols —
    sf0.1's symbol count — at ~9 ticks per symbol-day): the
    series-similarity queries aggregate to one close per symbol-day and
    join on the day, so their scale axis is Σ_d S_d² (w13 pair work),
    not raw tick count — this layout grows it 2.3× over sf0.1
    (1500²/2·70 vs 1500²/2·30 day-buckets) while the standard probe's
    single-day packing would starve the ≥10-shared-days gate
    entirely."""
    out = os.path.join(SCRATCH, "sfW")
    os.makedirs(out, exist_ok=True)
    ev = (
        spark.range(N_WIDE_EVENTS)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % N_WIDE_SYMBOLS).alias("user_id"),
            F.lit("purchase").alias("event_type"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(secs=(F.col("id") * F.lit(6.0)))
            ).alias("ts"),
            (100.0 + F.sin(F.col("id") / 7.0) * 5.0
             + (F.col("id") % 97).cast("double") / 10.0).alias("value"),
            F.concat(F.lit('{"k": '), (F.col("id") % 1000).cast("string"), F.lit("}"))
            .alias("props"),
        )
    )
    ev.write.mode("overwrite").parquet(f"{out}/events.parquet")
    spark.read.parquet(f"{BASE}/customer.parquet").write.mode("overwrite").parquet(
        f"{out}/customer.parquet"
    )
    return out


def timed(fn, *args) -> float:
    fn(*args).write.format("noop").mode("overwrite").save()  # warmup run
    t0 = time.perf_counter()
    fn(*args).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def probe_pq_serving(spark, base: str, scaled: str) -> list[dict]:
    """Isolates the PQ SERVE stage (fit + encode happen once, outside the
    timer — production amortizes them) to evidence the r9 verdict's
    fixed-shortlist requirement: with the constant PQ_SHORTLIST default
    the exact-rerank stage touches a FIXED number of float rows per
    query at any corpus size, while the old corpus-proportional
    max(50, n/10) fallback's rerank input grows with the corpus.  The
    deterministic evidence is rerank_rows (shortlist×queries actually
    entering the float fetch); the timings show the serve-path trend."""
    from real_time_stock_market_data_pipeline_spark.operators.similarity import (
        PQ_SHORTLIST,
        pq_encode,
        pq_fit,
        pq_rerank_topk,
        pq_search,
    )
    from real_time_stock_market_data_pipeline_spark.sources.readers import load_table

    rows = []
    for variant in ("fixed", "proportional"):
        rec: dict[str, float] = {}
        for tag, d in (("base", base), ("scaled", scaled)):
            emb = load_table(spark, d, "embeddings")
            n = emb.count()
            cbs = pq_fit(emb, n_iter=1)
            codes = pq_encode(emb, cbs).select("vec_id", "pq_codes").persist()
            codes.count()
            q = emb.filter(F.col("vec_id") < 5).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            shortlist = (
                PQ_SHORTLIST if variant == "fixed" else max(50, n // 10)
            )
            rec[tag] = timed(
                lambda *_: pq_rerank_topk(
                    q, codes, emb, cbs, k=10, shortlist=shortlist
                )
            )
            rec[f"{tag}_rerank_rows"] = pq_search(
                q, codes, cbs, k=shortlist
            ).count()
            codes.unpersist()
        rec["factor"] = round(rec["scaled"] / max(rec["base"], 1e-9), 2)
        rows.append({"probe": f"pq_serve_{variant}_shortlist", **rec})
    return rows


def probe_semdedup_k_scaling(spark, scaled: str) -> list[dict]:
    """emb15's scale knob, now the DEFAULT (r10 verdict item 1): with k
    FIXED, cluster sizes grow with the corpus and the within-cluster
    pair stage pays Σ_c n_c² ≈ n²/k — the quadratic term behind the old
    emb15 probe's ~9× at 10× vectors.  ``semdedup_k`` derives k from the
    corpus at constant expected cluster size and ``semantic_dedup_pairs``
    auto-selects Arrow assignment + the blocked per-cluster GEMM with
    that k.  This probe isolates the PAIR stage (fit outside the timer)
    at base and ×10 under (a) the shipped defaults and (b) the old fixed
    k=16, recording that the DEFAULT path is the ≈flat one — not a knob
    a caller must remember to turn."""
    from real_time_stock_market_data_pipeline_spark.operators.clustering import (
        kmeans_fit,
    )
    from real_time_stock_market_data_pipeline_spark.operators.similarity import (
        semantic_dedup_pairs,
        semdedup_k,
    )

    timings: dict[str, dict[str, float]] = {
        "default_autok": {},
        "fixed_k16": {},
    }
    ks: dict[str, dict[str, int]] = {"default_autok": {}, "fixed_k16": {}}
    for tag, d in (("base", BASE), ("scaled", scaled)):
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        n = emb.count()
        for mode in timings:
            k = semdedup_k(n) if mode == "default_autok" else 16
            cents = [
                (int(r.centroid_id), [float(x) for x in r.embedding])
                for r in kmeans_fit(emb, k=k, n_iter=0).collect()
            ]
            # arrow=None: the auto path under test — switches with k
            timings[mode][tag] = timed(
                lambda *_: semantic_dedup_pairs(emb, cents)
            )
            ks[mode][tag] = k
    rows = []
    for mode, rec in timings.items():
        rows.append(
            {
                "probe": f"semdedup_pairs_{mode}",
                **rec,
                "k_base": ks[mode]["base"],
                "k_scaled": ks[mode]["scaled"],
                "factor": round(rec["scaled"] / max(rec["base"], 1e-9), 2),
            }
        )
    return rows


def probe_ivf_lists_scaling(spark, scaled: str) -> list[dict]:
    """The IVF analogue of probe_semdedup_k_scaling: with the list count
    FROZEN at the init-time default, the candidate rows a query batch
    scans grow LINEARLY with the corpus (n·n_probe/n_lists); with
    ``ivf_lists_for``'s √n rule — the ``rebuild_*(k=None)`` default —
    candidate growth is √n at the same n_probe.  The deterministic
    evidence is candidate_rows (rows inside the probed list partitions,
    exactly what the search scans and scores); timings show the local
    trend but under-state the gap at this scale, where 50k×64 floats fit
    in page cache and per-partition file overhead dominates — at 100 TB
    the candidate bytes ARE the cost.  Fit + build happen outside the
    timer (production amortizes them across the rebuilt index's life)."""
    from real_time_stock_market_data_pipeline_spark.operators.clustering import (
        kmeans_fit,
    )
    from real_time_stock_market_data_pipeline_spark.operators.similarity import (
        IVFPQ_LISTS,
        build_ivf_index,
        centroid_topn_pandas,
        ivf_lists_for,
        search_ivf_index,
    )

    n_probe = 2
    rows = []
    for mode in ("sqrt_lists", "fixed_lists"):
        rec: dict[str, float] = {}
        nl: dict[str, int] = {}
        for tag, d in (("base", BASE), ("scaled", scaled)):
            emb = spark.read.parquet(f"{d}/embeddings.parquet").selectExpr(
                "vec_id",
                "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding",
            )
            n = emb.count()
            n_lists = ivf_lists_for(n) if mode == "sqrt_lists" else IVFPQ_LISTS
            idx = os.path.join(SCRATCH, f"ivf_{mode}_{tag}")
            cents_df = kmeans_fit(emb, k=n_lists, n_iter=1)
            build_ivf_index(emb, cents_df, idx)
            q = emb.filter(F.col("vec_id") < 20).select(
                F.col("vec_id").alias("query_id"), "embedding"
            )
            rec[tag] = timed(
                lambda *_: search_ivf_index(
                    spark, idx, q, k=10, n_probe=n_probe
                )
            )
            cents = [
                (int(r.centroid_id), [float(x) for x in r.embedding])
                for r in cents_df.collect()
            ]
            probed = (
                q.select(
                    F.explode(
                        centroid_topn_pandas(sorted(cents), n_probe)(
                            F.col("embedding")
                        )
                    ).alias("centroid_id")
                )
                .distinct()
            )
            rec[f"{tag}_candidate_rows"] = (
                spark.read.parquet(f"{idx}/lists")
                .join(probed, "centroid_id", "semi")
                .count()
            )
            nl[tag] = n_lists
        rows.append(
            {
                "probe": f"ivf_search_{mode}",
                **rec,
                "lists_base": nl["base"],
                "lists_scaled": nl["scaled"],
                "factor": round(rec["scaled"] / max(rec["base"], 1e-9), 2),
                "candidate_factor": round(
                    rec["scaled_candidate_rows"]
                    / max(rec["base_candidate_rows"], 1),
                    2,
                ),
            }
        )
    return rows


def probe_doc_table_compaction(spark) -> dict:
    """Evidences the r9 verdict's small-files item: the anti-join+append
    tables accrete one file set per batch forever, so after N batches
    every table read (each batch's own anti-join included) pays O(N)
    file listing/opens.  Build the dd11 test-shingle table as 40
    fragmented micro-appends, time the per-run gate, compact
    (compact_doc_keyed_table — range-clustered, crash-safe swap), time it
    again: file count collapses to byte-need and the read cost stops
    scaling with batch count."""
    import shutil

    from real_time_stock_market_data_pipeline_spark.maintenance import (
        compact_doc_keyed_table,
    )
    from real_time_stock_market_data_pipeline_spark.operators.dedup import (
        contaminated_docs_from_table,
        update_test_shingle_table,
    )
    from real_time_stock_market_data_pipeline_spark.operators.sampling import (
        SPLIT_BOUNDS,
        hash_bucket_col,
    )
    from real_time_stock_market_data_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, BASE, "documents")
    b = hash_bucket_col()
    lo, hi = SPLIT_BOUNDS["test"]
    test = docs.filter((b >= lo) & (b < hi)).select("doc_id", "text")
    train = docs.filter(b < SPLIT_BOUNDS["train"][1]).select("doc_id", "text")
    path = os.path.join(SCRATCH, "compaction_probe_tab")
    shutil.rmtree(path, ignore_errors=True)
    n_batches = 40
    for k in range(n_batches):
        update_test_shingle_table(
            test.filter(f"doc_id % {n_batches} = {k}").repartition(4), path
        )

    def n_files() -> int:
        return sum(
            1
            for f in os.listdir(path)
            if not f.startswith(("_", ".")) and os.path.isfile(os.path.join(path, f))
        )

    files_frag = n_files()
    t_frag = timed(lambda *_: contaminated_docs_from_table(train, path))
    compact_doc_keyed_table(spark, path)
    files_comp = n_files()
    t_comp = timed(lambda *_: contaminated_docs_from_table(train, path))
    return {
        "probe": "doc_table_compaction",
        "n_batches": n_batches,
        "files_fragmented": files_frag,
        "files_compacted": files_comp,
        "gate_s_fragmented": t_frag,
        "gate_s_compacted": t_comp,
        "factor": round(t_comp / max(t_frag, 1e-9), 2),
    }


def main() -> None:
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = set(sys.argv[2].split(","))
    spark = get_spark("scale_probe")
    results: dict[str, dict[str, float]] = {}
    std = [n for n in EVENT_QUERIES + DOC_QUERIES + EMB_QUERIES
           if only is None or n in only]
    wide = [n for n in WIDE_DAY_QUERIES if only is None or n in only]
    want_flagship = only is None or "flagship" in only
    scaled = None
    if std or want_flagship:
        scaled = build_scaled(spark)
        for name in std:
            fn = QUERIES[name]
            results[name] = {
                "base": timed(fn, spark, BASE),
                "scaled": timed(fn, spark, scaled),
            }
        if want_flagship:
            results["flagship"] = {
                "base": timed(flagship, spark, BASE),
                "scaled": timed(flagship, spark, scaled),
            }
    if wide:
        wide_dir = build_wide_days(spark)
        for name in wide:
            results[name] = {
                "base": timed(QUERIES[name], spark, BASE),
                "scaled": timed(QUERIES[name], spark, wide_dir),
            }
    for name, r in results.items():
        r["factor"] = round(r["scaled"] / max(r["base"], 1e-9), 2)
        print(json.dumps({"probe": name, **r}))
    if only is None or "pq_serve" in only:
        if scaled is None:
            scaled = build_scaled(spark)
        for row in probe_pq_serving(spark, BASE, scaled):
            print(json.dumps(row))
    if only is None or "compaction" in only:
        print(json.dumps(probe_doc_table_compaction(spark)))
    if only is None or "semdedup_k" in only:
        if scaled is None:
            scaled = build_scaled(spark)
        for row in probe_semdedup_k_scaling(spark, scaled):
            print(json.dumps(row))
    if only is None or "ivf_lists" in only:
        if scaled is None:
            scaled = build_scaled(spark)
        for row in probe_ivf_lists_scaling(spark, scaled):
            print(json.dumps(row))


if __name__ == "__main__":
    main()
