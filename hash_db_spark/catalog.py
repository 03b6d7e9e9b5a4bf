"""Table catalog: maps logical table names to Parquet-backed DataFrames.

The reference keeps everything in per-node dicts keyed by consistent hash
(/root/reference/client.py:25, /root/reference/consistent_hashing.py:46-53);
here storage is columnar Parquet and partitioning is Spark's shuffle
exchange — the catalog is just name→path resolution plus derived views.

Derived views:
- ``kv(pk, sk, value)`` — the reference's DynamoDB-style facade
  (/root/reference/server.py:82 key format), deterministically derived
  from the ``events`` fixture so KV operators have oracle-checkable data.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing storage quirks.

    events.ts is TIMESTAMP(NANOS) on disk; with
    spark.sql.legacy.parquet.nanosAsLong it arrives as a long which we
    floor-divide to microseconds — the same truncation DuckDB applies when
    casting ns→µs, so oracle comparisons agree."""
    if name == "events":
        # Runtime-settable; needed even on sessions we didn't build (the
        # driver's harness constructs its own SparkSession).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every fixture table as a DataFrame keyed by name."""
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register all tables (plus derived views) as temp views for spark.sql."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    kv = kv_view(tables["events"])
    kv.createOrReplaceTempView("kv")
    tables["kv"] = kv
    return tables


def kv_view(events: DataFrame) -> DataFrame:
    """Derive the reference's kv(pk, sk, value) table from events.

    pk = 'user#<user_id>' (partition key — the reference consistent-hashes
    this, /root/reference/server.py:83); sk = '<event_type>#<ts>' (sort key —
    lexicographic order on the ISO timestamp matches the reference's trie
    ordering, /root/reference/hash-db.py:90-101); value = event payload.

    Scale note: because pk/sk are *derived* concat expressions here,
    predicates on them cannot push into the parquet scan (visible in
    .explain as an empty PushedFilters). A production deployment stores
    kv as real (pk, sk, value) columns — partitioned/bucketed by pk —
    and every operator in operators/kv.py then gets scan-level pushdown
    and partition pruning for free; the operators themselves are already
    declarative filters so no code changes.
    """
    return events.select(
        F.concat(F.lit("user#"), F.col("user_id").cast("string")).alias("pk"),
        F.concat(
            F.col("event_type"),
            F.lit("#"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
        ).alias("sk"),
        F.format_string("%.2f", F.col("value")).alias("value"),
    )


# DuckDB-side equivalent of kv_view, used to build oracle SQL strings.
KV_ORACLE_CTE = """
kv AS (
  SELECT 'user#' || CAST(user_id AS VARCHAR) AS pk,
         event_type || '#' || strftime(ts, '%Y-%m-%dT%H:%M:%S') AS sk,
         printf('%.2f', value) AS value
  FROM events
)
""".strip()
