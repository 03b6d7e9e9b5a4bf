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
    # caps the run at the first 50 (CORRECTNESS_r01 has exactly 50 keys).
    # PRIORITY is therefore a hand-picked 50: breadth-first across every
    # family the driver has never verified (r01 covered kv/relational/text/
    # dedup/similarity only), so each SURVEY §2 row and each pipeline
    # capability gets at least one hard-gate-green representative this
    # round; unlisted entries follow in module order and rotate forward in
    # later rounds.
    priority = [
        # documents (D1-D3, R14)
        "doc_json_get",
        "doc_shred_roundtrip",
        "doc_shred_infer",
        "doc_path_where",
        "doc_path_select",
        # graph / Cypher (G2-G7 + free wins)
        "graph_node_scan",
        "graph_n_hop",
        "graph_triangles",
        "cypher_1hop",
        "cypher_chain",
        "cypher_merge_match",
        "cypher_return_names",
        "cypher_attr_match",
        "cypher_return_attrs",
        "cypher_social_graph",
        # SQL dialect front end (R3/R5/R6/R9/R10/R11/R12)
        "dialect_select_where",
        "dialect_join",
        "dialect_fts",
        "dialect_insert",
        "dialect_update",
        "dialect_create_join",
        # temporal
        "asof_join",
        "range_join",
        "sessionize",
        "tumbling_daily",
        # Structured Streaming (incl. R9 materialized view)
        "stream_tumbling_daily",
        "stream_dedup",
        "stream_mv_join",
        # multimodal
        "multimodal_features",
        "multimodal_meta_filter",
        # UDF surface
        "udf_pandas_scalar",
        "udf_grouped_map",
        "udf_python_udtf",
        # profiling / sampling / reshaping
        "profile_columns",
        "hash_sample",
        "train_val_test",
        "mix_weights",
        "pivot_counts",
        "gap_fill",
        # sketches
        "hll_distinct_users",
        "hll_merge_rollup",
        # arrays / skew / ANSI / interchange / CDC representatives
        "array_ops",
        "salted_join",
        "ansi_full_outer_join",
        "csv_roundtrip",
        "cdc_latest_view",
        # ranking / clustering / event analytics
        "fts_bm25_rank",
        "kmeans_clusters",
        "funnel_stages",
        "cohort_retention",
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
