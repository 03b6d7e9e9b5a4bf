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
    # caps the run (CORRECTNESS_r01 stopped at exactly the first 50 entries).
    # Rotate so families the driver has not yet verified run FIRST; families
    # already green in a previous round's CORRECTNESS file run last.
    # PRIORITY hoists individual never-verified entries (new this round)
    # ahead of everything, regardless of their home module.
    priority = [
        "dedup_components",
        "contamination_check",
        "top_ngrams_per_lang",
        "text_repetition",
        "dedup_embedding_lsh",
        "dedup_incremental",
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
