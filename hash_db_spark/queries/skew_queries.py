"""Driver-checkable queries: skew-handling operators. The salting is an
internal execution detail — results are identical to the naive forms, so
the oracles are the plain unsalted SQL (that identity IS the correctness
statement)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.operators import skew as S
from hash_db_spark.queries import Query


def q_salted_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.salted_group_count(
        load_table(spark, sf_dir, "events"), "event_type"
    )


def q_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.salted_sum(
        load_table(spark, sf_dir, "events"), "event_type", "value"
    )


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return S.salted_join(ev, cust, "user_id", "c_custkey").select(
        "event_id", "user_id", "c_mktsegment"
    )


QUERIES = {
    "salted_group_count": Query(
        q_salted_group_count,
        "SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type",
    ),
    "salted_sum": Query(
        q_salted_sum,
        "SELECT event_type, round(sum(value), 2) AS sum_value "
        "FROM events GROUP BY event_type",
    ),
    "salted_join": Query(
        q_salted_join,
        "SELECT event_id, user_id, c_mktsegment FROM events "
        "JOIN customer ON user_id = c_custkey",
    ),
}
