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
        graph_queries,
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
    # caps the run at the first 50. Round-5 PRIORITY: the 37 entries the
    # r01-r04 union has never checked (exactly the set listed in
    # COVERAGE.md's Totals paragraph; recomputed this session as
    # all_queries() minus the union of CORRECTNESS_r01..r04 keys). The four
    # slow ones at sf0.01 in driver_sim (train_prep ~21s, graph_components
    # ~17s, dedup_components_star ~8s, semdedup_drop ~7s) are interleaved —
    # positions ~6/14/23/31 — so the window never pays them back-to-back.
    # Remaining slots backfill with entries whose code changed this round.
    priority = [
        # --- never driver-checked (37) -------------------------------
        "graph_degree_hist",
        "cypher_optional",
        "cypher_where",
        "cypher_count",
        "events_hourly_profile",
        "graph_components",  # slow: recursive-CTE oracle
        "dialect_group_aggs",
        "dialect_compare",
        "decayed_activity",
        "asof_nearest",
        "interval_merge",
        "multimodal_meta_stats",
        "doc_length_histogram",
        "train_prep",  # slow: composed full-pipeline oracle
        "multimodal_ppm_decode",
        "multimodal_wav_decode",
        "multimodal_y4m_decode",
        "training_order",
        "split_leakage_audit",
        "stream_hll_users",
        "stream_cms_users",
        "bloom_prejoin",
        "dedup_components_star",  # slow: large-star/small-star iterations
        "rank_global_scalable",
        "ansi_grouping_flags",
        "ansi_cube",
        "lm_perplexity_gate",
        "select_token_budget",
        "mixture_token_budget",
        "text_token_entropy",
        "semdedup_drop",  # slow: k-means bucket oracle
        "kv_count_by_prefix",
        "corpus_snapshot_diff",
        "langid_confusion",
        "dedup_rate_report",
        "negative_samples",
        "sim_topk_ivf_persisted",
        # --- backfill: code changed this round (re-verify) -----------
        "asof_tolerance",
        "asof_forward",
        "cms_merge_heavy_hitters",
        # --- new this round ------------------------------------------
        "bpe_merge_candidates",
        "pivot_lang_source",
        "scd2_asof_lookup",
        "interval_coverage",
        "multimodal_wav_energy",
        "minhash_est_error",
        "sim_recall_report",
        "dedup_embedding_incremental",
        "pack_manifest",
        "vocab_zipf_fit",
        # 50 entries — the window is now entirely priority slots; NO
        # further additions this round (a new entry would displace one
        # of these and ship as an unverified claim — r06's queue is the
        # place for it).
        #
        # ROUND-6 TODO (first thing next session): rebuild this list as
        # (1) any r05 window entry CORRECTNESS_r05.json reports
        # non-green, then (2) entries whose code changes in r06, then
        # (3) r06 additions. If r05 is fully green, the r01-r05 union
        # covers all 243 names and the whole window is free for new
        # work. Recompute the never-checked set as all_queries() minus
        # the union of CORRECTNESS_r01..r05 keys — don't trust prose.
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
    ):
        overlap = registry.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        registry.update(mod.QUERIES)
    ordered = {n: registry[n] for n in priority if n in registry}
    ordered.update(registry)  # existing keys keep their (earlier) position
    return ordered
