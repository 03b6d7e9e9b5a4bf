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
    # ROUND-9 WINDOW, computed mechanically by scripts/compute_reverify.py
    # at r09 HEAD (after this round's scale fixes landed, so every edited
    # entry's FIRST driver fact is post-fix). Post-fix state: 297 entries,
    # 47 never-checked, 20 stale (the r08 session-2/3/4 backlog plus the
    # entries tainted by r09's broadcast/PSL/writer fixes). 67 candidates
    # for 50 slots; installed here:
    #   - 46 of the 47 never-checked (dup_cluster_histogram defers to the
    #     r10 queue — its parent media_dup_clusters IS in-window and the
    #     histogram is a thin consumer of it);
    #   - the 4 r09-tainted entries VERDICT r08 #2-#4 explicitly wants
    #     verified post-fix: q3_top_orders + q5_local_revenue (customer
    #     unhinted), host_doc_caps (dim unhinted + real PSL),
    #     url_host_domains (real PSL).
    #
    # R10 QUEUE HEAD (17 + any r10 taint; never-checked first):
    #   dup_cluster_histogram;
    #   stale with prior green facts: dedup_image_in_video (r08 green,
    #   r09 mkey removal), graph_degree_hist (r07), stratified_sample,
    #   stream_sessions, stream_stateful_counter, top_ngrams_per_lang,
    #   unpivot_measures (r03), bloom_decontaminate, cdc_scd2_history,
    #   cms_user_counts, fts_phrase, histo_quantiles, sim_topk_ivf_kmeans,
    #   stream_dedup_within_wm, stream_stream_join, zorder_values (r04);
    #   plus semi_join (fresh green until r09's unhint of its
    #   corpus-proportional customer broadcast tainted it) and the
    #   throttled registrations (one-line uncomments, each implemented
    #   + oracle-parity-tested this round):
    #     stream_line_dedup_wm   (pipeline_queries.py r10 QUEUE)
    #     dedup_keep_best        (pipeline_queries.py r10 QUEUE)
    #     sim_topk_pq            (similarity_queries.py r10 QUEUE)
    #     sim_topk_ivf_pq        (similarity_queries.py r10 QUEUE)
    #     sim_topk_pq_persisted  (similarity_queries.py r10 QUEUE)
    #     stream_pq_probe        (similarity_queries.py r10 QUEUE)
    #     dedup_tfidf_cosine     (text_queries.py r10 QUEUE)
    #     retrieve_chunks_topk   (text_queries.py r10 QUEUE)
    #     doc_topic_segments     (text_queries.py r10 QUEUE)
    #     kmv_shared_users       (sketch_queries.py r10 QUEUE)
    #   session-3 additions (same discipline — implemented +
    #   oracle-parity-tested + plan-shape-pinned this round):
    #     hits_hosts             (web_queries.py r10 QUEUE)
    #     lsh_param_plan         (dedup_queries.py r10 QUEUE)
    #     text_encoding_gate     (text_queries.py r10 QUEUE)
    #     retrieve_mmr_topk      (text_queries.py r10 QUEUE)
    #     fts_serve_mixed        (text_queries.py r10 QUEUE)
    #     compaction_plan        (sources_queries.py r10 QUEUE)
    #     sim_recall_truncated   (similarity_queries.py r10 QUEUE)
    #     event_transitions      (temporal_queries.py r10 QUEUE)
    #     fk_integrity_audit     (relational_queries.py r10 QUEUE)
    #     erasure_audit          (relational_queries.py r10 QUEUE)
    #     xml_roundtrip          (sources_queries.py r10 QUEUE)
    #   Queue tally after session 3: ~40 candidates for the 50-slot
    #   r10 window (10 + 12 throttled registrations, dup_cluster_
    #   histogram, 17 stale-with-prior-facts) — further session-3
    #   registrations STOP here so r10 taint keeps ~10 free slots.
    #
    # Registration throttle (VERDICT r08 #1): NO new registry entries
    # this round — new operators land in code/tests and queue for r10.
    # Ordering: cheap codegen entries first to absorb the window's
    # JVM/codegen warmup; heavy entries (pagerank, lang segments,
    # winnowing, health report) interleaved, never clustered.
    priority = [
        # --- cheap openers (absorb warmup) --------------------------
        "warc_extract",
        "robots_rules",
        "html_text_extract",
        "weighted_doc_sample",
        # --- never driver-checked (r08 s2/s3/s4 backlog) ------------
        "line_dedup_docs",
        "doc_lang_segments",
        "line_boilerplate_strip",
        "line_containment",
        "pagerank_hosts",
        "line_clean_prep",
        "link_host_graph",
        "rank_weighted_caps",
        "robots_url_filter",
        "corpus_health_report",
        "fetch_schedule",
        "winnow_fingerprints",
        "stream_line_dedup",
        "winnow_dup_pairs",
        "crawl_prep",
        "winnow_components",
        "crawl_prep_polite",
        "doc_boundary_overlap",
        "warc_extract_gz",
        "quality_classifier",
        "html_anchor_texts",
        "decontaminate_mask",
        "sitemap_discover",
        "html_corpus_prep",
        "bpe_encode_corpus",
        "classifier_sample_prep",
        "lm_trigram_interp",
        "stream_quality_gate",
        "dedup_audio_pairs",
        "crawl_frontier_schedule",
        "dedup_image_incremental",
        "embedding_dim_stats",
        "dedup_audio_incremental",
        "embedding_project_jl",
        "media_dup_clusters",
        "embedding_whiten_norms",
        "source_dup_matrix",
        "mixture_temperature",
        "dedup_budget_select",
        "gopher_quality_gate",
        "mixture_temp_select",
        "robots_sitemap_refs",
        # --- r09-tainted, judge-mandated post-fix facts -------------
        "q3_top_orders",
        "q5_local_revenue",
        "host_doc_caps",
        "url_host_domains",
        # 50 entries. NO further additions this round — a new entry
        # would displace a slot and ship as an unverified claim; the
        # r10 queue above is the place for it.
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
