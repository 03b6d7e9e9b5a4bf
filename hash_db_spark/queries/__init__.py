"""Central registry of driver-checkable queries.

Each operator module contributes ``QUERIES: dict[str, Query]`` where
``Query.fn`` is ``(spark, sf_dir) -> DataFrame`` and ``Query.oracle`` is the
equivalent DuckDB SQL (or None for non-SQL-expressible ops — the driver then
records a weaker rows-only check).

Column-name discipline: the driver sorts columns by name before value-hashing,
so every computed column is aliased identically in the Spark plan and in the
oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None


def all_queries() -> dict[str, Query]:
    from hash_db_spark.queries import (
        ansi_queries,
        array_queries,
        dedup_queries,
        dialect_queries,
        document_queries,
        curation_queries,
        graph_queries,
        html_queries,
        kv_queries,
        multimodal_queries,
        pipeline_queries,
        relational_queries,
        sampling_queries,
        similarity_queries,
        sketch_queries,
        skew_queries,
        sources_queries,
        temporal_queries,
        text_queries,
        udf_queries,
        web_queries,
    )

    # Module order matters: the driver verifies registry entries in order
    # and caps the run at the first 50.
    #
    # ROUND-11 WINDOW, computed mechanically by scripts/compute_reverify.py
    # at r11 HEAD. State at computation: 353 entries (319 + the 34
    # registrations queued under the r10 throttle, all uncommented this
    # round — the full r11 queue, VERDICT r10 #1), 34 never-checked (the
    # queued registrations), 5 stale (csv/jsonl/orc/xml_roundtrip +
    # hive_partition_prune — all tainted by the pid-keyed _tmp fix,
    # VERDICT r10 what's-wrong #1). 39 slots consumed; the remaining 11
    # start the VERDICT r10 #2 staleness rotation: 10 go to the oldest
    # driver facts (the r01 KV/relational core — 28 entries whose only
    # fact predates 9 rounds of refactoring), 1 spare for late taint.
    #
    # Registration throttle (VERDICT r08 #1) stays: new operators built
    # this round land implemented + parity-tested with their
    # registration commented as "r13 QUEUE CANDIDATE" — r12's queue is
    # already closed at 31.
    #
    # r12 QUEUE STATE (carried from r10): 31 candidates (grep '^#   "'
    # under queries/) — session 7d's 4 (term_burstiness,
    # session_type_pmi, quality_calibration, soft_dedup_sample),
    # session 8's 9 (bitext_margin_mine, context_fit_report,
    # sampling_ess_report, dedup_containment, dedup_method_eval,
    # embedding_outliers, vocab_heaps_fit, vocab_oov_report,
    # eval_ngram_coverage), session 9's 18 (host_kcore,
    # host_clustering_coef, host_adamic_adar, dedup_edit_verify,
    # skew_key_report, scrub_secrets, stream_secret_scrub,
    # l_diversity_audit, ppl_tertile_buckets, retrieve_prf_rocchio,
    # t5_span_examples, dp_noisy_counts, cluster_balanced_sample,
    # bucketed_join_serve, anchor_query_pairs, curation_funnel_report,
    # user_type_entropy, score_quantile_blend). CLOSED — new work
    # queues for r13.
    # r13 QUEUE STATE (carried from r10): 5 candidates —
    # host_graph_profile, kfold_balance, rfm_segments,
    # url_path_templates, bitext_length_filter.
    #
    # r12 WINDOW PLAN (written at r11 end for the next session): after
    # CORRECTNESS_r11 lands, uncomment the 31 r12 candidates (-> 384
    # entries) and re-run compute_reverify; expected need-set = 31
    # never-checked + any taint, leaving ~15 rotation slots for the
    # oldest facts (18 r01 entries remain after the r11 window, then
    # the 34-entry r02 dialect/Cypher cohort — oldest first). Every
    # r12/r13 candidate already carries, as of the r11 session: a
    # DuckDB oracle, parity green at sf0.001/0.01/0.1, a plan-shape
    # pin in tests/test_plan_quality.py (or a documented exception),
    # and a 10x scale probe — registration is a pure slot operation.
    # Ordering: cheap codegen entries first to absorb the window's
    # JVM/codegen warmup; heavy entries (codec decodes, kneser-ney,
    # session paths) interleaved, never clustered.
    priority = [
        # --- cheap openers (absorb warmup; r01 rotation members) -----
        "kv_query_begins",     # r01 fact — staleness rotation
        "kv_get",              # r01
        "kv_between",          # r01
        "select_where_eq",     # r01
        # --- never driver-checked (the full r11 queue, 34) -----------
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
        # --- stale: pid-keyed _tmp fix taint (VERDICT r10 wrong #1) --
        "csv_roundtrip",       # r02 fact
        "jsonl_roundtrip",     # r03
        "orc_roundtrip",       # r03
        "hive_partition_prune",  # r04
        "xml_roundtrip",       # r10
        # --- staleness rotation, oldest r01 facts (VERDICT r10 #2) ---
        "kv_both_between",     # r01
        "kv_query_begins_desc",  # r01
        "kv_pk_sk_begins",     # r01
        "kv_before_than",      # r01
        "kv_greater_than",     # r01
        "q1_pricing_summary",  # r01
        # 49 entries; 1 spare slot reserved for late-round taint.
    ]
    registry: dict[str, Query] = {}
    for mod in (
        document_queries,
        graph_queries,
        dialect_queries,
        temporal_queries,
        multimodal_queries,
        udf_queries,
        sampling_queries,
        sketch_queries,
        array_queries,
        skew_queries,
        ansi_queries,
        pipeline_queries,
        sources_queries,
        kv_queries,
        relational_queries,
        text_queries,
        dedup_queries,
        similarity_queries,
        web_queries,
        html_queries,
        curation_queries,
    ):
        overlap = registry.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        registry.update(mod.QUERIES)
    ordered = {n: registry[n] for n in priority if n in registry}
    ordered.update(registry)  # existing keys keep their (earlier) position
    return ordered
