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

    # Module order matters: the driver verifies registry entries in order and
    # caps the run at the first 50. ROUND-8 PRIORITY, computed mechanically
    # by scripts/compute_reverify.py at r08 HEAD (after its cycle-soundness
    # fix and the r06/r07 gate-ref registration): 7 never-driver-checked
    # entries first (the six r06 additions that rounds 6-7 left unverified
    # plus this round's dedup_image_in_video), then the 57 stale entries
    # (code changed since their last green driver round) oldest-green-first
    # — all 17 r01, all 12 r02, and the first 14 of 19 r03. That fills the
    # 50-slot window exactly.
    #
    # ROUND-9 WINDOW HEAD (recomputed at r08 session-4 end:
    # 286 entries, 43 never-checked, 58 stale, 185 fresh; the r08 gate
    # below covers 7 never-checked + 43 stale, leaving 36 never-checked
    # + 15 stale = 51 r09-head candidates — one more than the 50-slot
    # window; r09 additions, r09 taint, and the overflow queue for r10.
    # Recompute before trusting, but this is the plan of record):
    #   never-checked (r08 session-2/3 additions, all sim-green):
    #     dedup_audio_pairs, dedup_image_incremental,
    #     dedup_audio_incremental, media_dup_clusters, bpe_encode_corpus,
    #     warc_extract, crawl_prep, line_dedup_docs,
    #     line_boilerplate_strip, line_containment, line_clean_prep,
    #     link_host_graph, pagerank_hosts, robots_rules,
    #     robots_url_filter, fetch_schedule, rank_weighted_caps,
    #     stream_line_dedup, crawl_prep_polite, warc_extract_gz,
    #     html_text_extract, html_anchor_texts, sitemap_discover,
    #     html_corpus_prep, quality_classifier, weighted_doc_sample,
    #     embedding_dim_stats, classifier_sample_prep,
    #     stream_quality_gate, doc_lang_segments, decontaminate_mask,
    #     crawl_frontier_schedule, lm_trigram_interp,
    #     corpus_health_report, dedup_budget_select,
    #     robots_sitemap_refs, embedding_project_jl,
    #     embedding_whiten_norms, mixture_temperature,
    #     gopher_quality_gate, source_dup_matrix, winnow_fingerprints,
    #     winnow_dup_pairs, doc_boundary_overlap, mixture_temp_select,
    #     winnow_components, dup_cluster_histogram (r08 session-4
    #     additions, all sim-green; 297 entries -> 62 r09-head
    #     candidates: TWELVE never-checked entries overflow to the r10
    #     queue head)
    #   newly stale (r08's degree_histogram explode fix; re-simmed green):
    #     graph_degree_hist
    #   r03-green residual (5, incl. the session-4 join-removal taint on
    #     top_ngrams_per_lang — re-simmed green): stratified_sample,
    #     stream_sessions, stream_stateful_counter, top_ngrams_per_lang,
    #     unpivot_measures
    #   r04-green residual (9, bloom_decontaminate re-simmed green after
    #     the session-4 prefilter fix): bloom_decontaminate,
    #     cdc_scd2_history, cms_user_counts, fts_phrase, histo_quantiles,
    #     sim_topk_ivf_kmeans, stream_dedup_within_wm, stream_stream_join,
    #     zorder_values
    # plus anything r09's own code changes taint; r09 additions after.
    # Session-4 end assurance: full-registry sim at the FINAL session-4
    # HEAD = 294/294 matches, failures=[] (295s serialized).
    priority = [
        # --- never driver-checked (7): cheap url entries first to
        # absorb the window's JVM/codegen warmup ---------------------
        "url_dedup",
        "url_host_domains",
        "host_doc_caps",
        "bpe_train_merges",
        "dedup_image_phash",
        "dedup_video_frames",
        "dedup_image_in_video",
        # --- stale, green r01 (17) ----------------------------------
        "kv_set",
        "kv_clear",
        "insert_rows",
        "update_where",
        "fts_and",
        "fts_or",
        "fts_mixed",
        "fts_with_where",
        "text_subword_tokens",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_simhash_pairs",
        "dedup_embedding",
        "sim_topk_brute",
        "sim_topk_ivf",
        "sim_topk_lsh",
        # --- stale, green r02 (12) ----------------------------------
        "asof_join",
        "cdc_latest_view",
        "doc_path_where",
        "graph_n_hop",
        "graph_triangles",
        "hash_sample",
        "kmeans_clusters",
        "mix_weights",
        "stream_dedup",
        "stream_mv_join",
        "stream_tumbling_daily",
        "train_val_test",
        # --- stale, green r03 (first 14 of 19) ----------------------
        "contamination_check",
        "dedup_apply_keep",
        "dedup_components",
        "dedup_embedding_lsh",
        "dedup_incremental",
        "dedup_span_grams",
        "grouped_quantiles",
        "grouping_sets",
        "pack_sequences",
        "profile_columns",
        "profile_quantiles",
        "scrub_pattern_counts",
        "scrub_redact",
        "sim_topk_quantized",
        # 50 entries. NO further additions to this list this round — a
        # new entry would displace a never-checked/stale slot and ship
        # as an unverified claim; r09's queue is the place for it.
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
