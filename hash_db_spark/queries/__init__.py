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
    )

    # Module order matters: the driver verifies registry entries in order and
    # caps the run at the first 50. Round-4 PRIORITY: the 43 entries the
    # driver has never checked (r01 ∪ r02 ∪ r03 covered 146/189 — the
    # remaining ansi_* shapes, as-of variants, stream-stream join, CMS/
    # histogram/bloom sketches, bigram LM, hive pruning, z-order, SCD2)
    # go first so the r01-r04 union covers every registry name, then the
    # entries whose code changed this round for re-verification.
    #
    # ROUND-5 TODO (first thing next session): replace this list with the
    # 28-entry r05 priority queue recorded at the end of COVERAGE.md's
    # Totals paragraph (every entry added after the r04 window froze),
    # then backfill with any r04 window entry the gate reported non-green.
    priority = [
        # --- never driver-checked (43) -------------------------------
        # as-of variants / stream-stream join
        "asof_tolerance",
        "asof_forward",
        "stream_stream_join",
        # sketches
        "histo_quantiles",
        "cms_user_counts",
        "cms_merge_heavy_hitters",
        "bloom_decontaminate",
        # bigram LM / layout / storage
        "doc_bigram_logprob",
        "hive_partition_prune",
        "zorder_values",
        "cdc_scd2_history",
        # ANSI family (every remaining shape)
        "ansi_q6_filtered_agg",
        "ansi_left_join",
        "ansi_cte_window",
        "ansi_rollup",
        "ansi_intersect",
        "ansi_except",
        "ansi_case_buckets",
        "ansi_date_string_funcs",
        "ansi_ntile",
        "ansi_q4_order_priority",
        "ansi_q14_promo_share",
        "ansi_self_join_pairs",
        "ansi_having_in",
        "ansi_lead_lag",
        "ansi_window_frames",
        "ansi_scalar_subquery",
        "ansi_q10_returned_items",
        "ansi_q18_large_orders",
        "ansi_q19_disjunctive_preds",
        "ansi_percent_rank",
        "ansi_value_histogram",
        "ansi_q7_nation_volume",
        "ansi_q8_market_share",
        "ansi_q9_product_profit",
        "ansi_q11_important_stock",
        "ansi_q13_custdist",
        "ansi_q15_top_supplier",
        "ansi_q16_supplier_cnt",
        "ansi_q17_small_qty_revenue",
        "ansi_q20_excess_suppliers",
        "ansi_q21_waiting_supplier",
        "ansi_q22_idle_customers",
        # --- new this round ------------------------------------------
        "cypher_var_length",
        "dedup_strip_spans",
        "stream_dedup_within_wm",
        "fts_phrase",
        "sim_topk_ivf_kmeans",
        "dialect_order_limit",
        "dialect_distinct",
        # The changed dedup paths (pointer-doubling components, hot-band
        # caps in minhash/simhash/incremental/embedding_lsh) hold prior
        # green driver rows and are re-verified by the gate-faithful
        # driver_sim locally; all 50 window slots go to never-checked
        # entries so the r01-r04 union covers the whole registry.
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
    ):
        overlap = registry.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        registry.update(mod.QUERIES)
    ordered = {n: registry[n] for n in priority if n in registry}
    ordered.update(registry)  # existing keys keep their (earlier) position
    return ordered
