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


def q_rank_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global row_number / ntile(7) / percent_rank over the WHOLE
    customer table with NO single-task Window (operators/rank.py: range
    partition + per-partition rank + driver offsets) — the scale-safe
    answer to the `ansi_ntile` pattern, which documents the funnel this
    operator removes. The oracle is the naive global window: identity of
    results is the correctness statement."""
    from hash_db_spark.operators.rank import ntile_global

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    return ntile_global(
        cust,
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        n=7,
        out="septile",
        rn_col="rn",
        prank_col="prank",
    ).select("c_custkey", "rn", "septile", "prank")


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    return S.salted_join(ev, cust, "user_id", "c_custkey").select(
        "event_id", "user_id", "c_mktsegment"
    )


def q_skew_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew census over the three hottest shuffle keys in the
    schema (lineitem's orderkey/suppkey, events' user_id): per-key-
    distribution Gini, top-1/top-10 share, max multiplicity — the
    numbers that decide salting vs AQE-split vs nothing BEFORE the
    100 TB shuffle runs. Gini comes from the count-of-counts frame
    (O(sqrt(n_rows)) rows), never a per-key global window
    (operators/skew.py:key_skew_report)."""
    li = load_table(spark, sf_dir, "lineitem")
    ev = load_table(spark, sf_dir, "events")
    return (
        S.key_skew_report(li, "l_orderkey", "lineitem.l_orderkey")
        .unionAll(S.key_skew_report(li, "l_suppkey", "lineitem.l_suppkey"))
        .unionAll(S.key_skew_report(ev, "user_id", "events.user_id"))
    )


def _skew_key_report_oracle() -> str:
    parts = [
        S.sql_key_skew_report("lineitem", "l_orderkey", "lineitem.l_orderkey"),
        S.sql_key_skew_report("lineitem", "l_suppkey", "lineitem.l_suppkey"),
        S.sql_key_skew_report("events", "user_id", "events.user_id"),
    ]
    return " UNION ALL ".join(f"SELECT * FROM ({p})" for p in parts)


# r12 QUEUE CANDIDATE (session 9):
#   "skew_key_report": Query(q_skew_key_report, _skew_key_report_oracle()),


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
    "rank_global_scalable": Query(
        q_rank_global,
        """
        SELECT c_custkey,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               CAST(ntile(7) OVER w AS INT) AS septile,
               round(percent_rank() OVER w, 6) AS prank
        FROM customer
        WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey ASC)
        """,
    ),
}
