"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``hash_db_spark/``; queries are registered in
``hash_db_spark/queries/`` (one module per operator family from SURVEY §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hash_db_spark.queries import all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: KV range scan over the derived
    kv(pk, sk, value) facade — exercises ingest, partition-key filter,
    sort-key range, and distributed ordering (SURVEY §7 Phase 1)."""
    from hash_db_spark.catalog import kv_view, load_table
    from hash_db_spark.operators import kv as K

    kv = kv_view(load_table(spark, SMOKE_SF_DIR, "events"))
    return K.query_pk_sk_begins(kv, "user#", "click#2024-01-")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (omitted for
    non-SQL-expressible operators -> weaker rows-only check)."""
    return {
        name: q.oracle for name, q in all_queries().items() if q.oracle is not None
    }
