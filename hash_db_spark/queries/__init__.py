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
    # caps the run at the first 50. Round-3 PRIORITY: the 3 entries that
    # failed the r02 gate (fixed: HUGEINT→float64 sums, list-cell row sort)
    # go first for re-verification, then 47 entries the driver has never
    # checked (r01 ∪ r02 covered 99/178). The ~30 remaining ansi_* TPC-H
    # shapes rotate forward next round — their family already has green
    # representatives.
    priority = [
        # re-verify (fixed this round)
        "array_ops",
        "sessionize",
        "profile_columns",
        # pipeline prep (scrub/chunk/pack/quality/span/fuzzy)
        "pack_sequences",
        "dedup_span_grams",
        "scrub_redact",
        "scrub_pattern_counts",
        "chunk_tokens",
        "doc_logfreq",
        "vocab_top_share",
        "quality_gate",
        "dedup_apply_keep",
        "fuzzy_name_match",
        # custom stateful streaming
        "stream_stateful_counter",
        "stream_sessions",
        # documents / graph / dialect stragglers
        "doc_json_agg",
        "doc_path_two_level",
        "graph_pagerank",
        "cypher_shared_var",
        "cypher_left_arrow",
        "cypher_merge_attrs",
        "dialect_group_count",
        # temporal / window stragglers
        "interval_bin_join",
        "ts_similar_users",
        "sliding_2d",
        # multimodal stragglers
        "multimodal_resize",
        "multimodal_frame_sample",
        # UDF stragglers
        "udf_grouped_agg",
        "udf_sql_registered",
        # profiling / sampling / reshaping stragglers
        "profile_quantiles",
        "stratified_sample",
        "unpivot_measures",
        "grouped_quantiles",
        "grouping_sets",
        # arrays / skew stragglers
        "array_agg_sorted",
        "salted_group_count",
        "salted_sum",
        # interchange formats
        "jsonl_roundtrip",
        "orc_roundtrip",
        # text / dedup / similarity stragglers
        "tfidf_top_terms",
        "text_repetition",
        "contamination_check",
        "top_ngrams_per_lang",
        "dedup_incremental",
        "dedup_embedding_lsh",
        "dedup_components",
        "sim_topk_quantized",
        # ANSI representatives (q12 carried a HUGEINT fix; q2 is the
        # hardest correlated-subquery shape)
        "ansi_q12_priority_split",
        "ansi_q2_min_cost_supplier",
        "ansi_exists_subquery",
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
