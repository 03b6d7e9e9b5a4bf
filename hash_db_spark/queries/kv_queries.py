"""Driver-checkable queries for the KV operators (SURVEY §2.1 K1-K9).

The kv(pk, sk, value) view is derived deterministically from the events
fixture (catalog.kv_view) so every operator has a DuckDB oracle. Parameters
are chosen to return non-trivial row sets at sf=0.01 (user 42 has ~73 events
across all five event types).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hash_db_spark.catalog import KV_ORACLE_CTE, kv_view, load_table
from hash_db_spark.operators import kv as K
from hash_db_spark.queries import Query


def _kv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kv_view(load_table(spark, sf_dir, "events"))


def _oracle(where: str) -> str:
    return f"WITH {KV_ORACLE_CTE} SELECT pk, sk, value FROM kv WHERE {where}"


PK = "user#42"


def q_kv_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    kv = _kv(spark, sf_dir)
    # Point-read an existing key: take min sk for the pk deterministically.
    sk = (
        kv.filter(kv.pk == PK)
        .agg({"sk": "min"})
        .collect()[0][0]
    )
    return K.kv_get(kv, PK, sk)


def q_kv_query_begins(spark: SparkSession, sf_dir: str) -> DataFrame:
    return K.query_begins(_kv(spark, sf_dir), PK, "click#")


def q_kv_query_begins_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return K.query_begins(_kv(spark, sf_dir), PK, "purchase#", desc=True)


def q_kv_pk_sk_begins(spark: SparkSession, sf_dir: str) -> DataFrame:
    return K.query_pk_sk_begins(_kv(spark, sf_dir), "user#4", "error#")


def q_kv_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    return K.query_between(
        _kv(spark, sf_dir), PK, "click#2024-01-05", "click#2024-01-20"
    )


def q_kv_both_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    return K.both_between(
        _kv(spark, sf_dir), "user#10", "user#12", "view#2024-01-01", "view#2024-01-31"
    )


def q_kv_before_than(spark: SparkSession, sf_dir: str) -> DataFrame:
    return K.query_before_than(
        _kv(spark, sf_dir), PK, "signup#", "signup#2024-01-15"
    )


def q_kv_greater_than(spark: SparkSession, sf_dir: str) -> DataFrame:
    return K.query_greater_than(
        _kv(spark, sf_dir), PK, "signup#", "signup#2024-01-15"
    )


def q_kv_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1 upsert: overwrite every 'error#...' value for user#42 with 'seen',
    then read the pk back — exercises anti-join + union upsert semantics."""
    kv = _kv(spark, sf_dir)
    updates = (
        kv.filter((kv.pk == PK) & kv.sk.startswith("error#"))
        .selectExpr("pk", "sk", "'seen' AS value")
    )
    return K.query_begins(K.kv_set(kv, updates), PK, "error#")


def q_kv_clear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K9 delete: remove the lexicographically-first error key, re-scan."""
    kv = _kv(spark, sf_dir)
    sk = (
        kv.filter((kv.pk == PK) & kv.sk.startswith("error#"))
        .agg({"sk": "min"})
        .collect()[0][0]
    )
    return K.query_begins(K.kv_clear(kv, PK, sk), PK, "error#")


def q_kv_count_by_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item counts per sort-key FAMILY under one partition key (the
    'how many of each entity type does this user have' scan a KV app
    issues constantly) — prefix scan + map-combined aggregate, no
    row materialization to the client."""
    import pyspark.sql.functions as F

    kv = _kv(spark, sf_dir)
    scan = K.query_begins(kv, PK, "")
    fam = F.substring_index(F.col("sk"), "#", 1)
    return scan.groupBy(fam.alias("sk_family")).agg(
        F.count(F.lit(1)).alias("n")
    )


KV_COUNT_ORACLE = f"""
WITH {KV_ORACLE_CTE}
SELECT split_part(sk, '#', 1) AS sk_family, count(*) AS n
FROM kv WHERE pk = '{PK}' GROUP BY sk_family
"""


QUERIES = {
    "kv_count_by_prefix": Query(q_kv_count_by_prefix, KV_COUNT_ORACLE),
    "kv_get": Query(
        q_kv_get,
        f"WITH {KV_ORACLE_CTE} SELECT pk, sk, value FROM kv "
        f"WHERE pk = '{PK}' AND sk = (SELECT min(sk) FROM kv WHERE pk = '{PK}')",
    ),
    "kv_query_begins": Query(
        q_kv_query_begins,
        _oracle(f"pk = '{PK}' AND sk LIKE 'click#%'"),
    ),
    "kv_query_begins_desc": Query(
        q_kv_query_begins_desc,
        _oracle(f"pk = '{PK}' AND sk LIKE 'purchase#%'"),
    ),
    "kv_pk_sk_begins": Query(
        q_kv_pk_sk_begins,
        _oracle("pk LIKE 'user#4%' AND sk LIKE 'error#%'"),
    ),
    "kv_between": Query(
        q_kv_between,
        _oracle(
            f"pk = '{PK}' AND sk BETWEEN 'click#2024-01-05' AND 'click#2024-01-20'"
        ),
    ),
    "kv_both_between": Query(
        q_kv_both_between,
        _oracle(
            "pk BETWEEN 'user#10' AND 'user#12' "
            "AND sk BETWEEN 'view#2024-01-01' AND 'view#2024-01-31'"
        ),
    ),
    "kv_before_than": Query(
        q_kv_before_than,
        _oracle(f"pk = '{PK}' AND sk LIKE 'signup#%' AND sk < 'signup#2024-01-15'"),
    ),
    "kv_greater_than": Query(
        q_kv_greater_than,
        _oracle(f"pk = '{PK}' AND sk LIKE 'signup#%' AND sk > 'signup#2024-01-15'"),
    ),
    "kv_set": Query(
        q_kv_set,
        f"WITH {KV_ORACLE_CTE} "
        f"SELECT pk, sk, 'seen' AS value FROM kv "
        f"WHERE pk = '{PK}' AND sk LIKE 'error#%'",
    ),
    "kv_clear": Query(
        q_kv_clear,
        f"WITH {KV_ORACLE_CTE} "
        f"SELECT pk, sk, value FROM kv "
        f"WHERE pk = '{PK}' AND sk LIKE 'error#%' "
        f"AND sk <> (SELECT min(sk) FROM kv WHERE pk = '{PK}' AND sk LIKE 'error#%')",
    ),
}
