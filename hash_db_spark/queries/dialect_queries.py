"""Driver-checkable queries executed through the reference-dialect SQL
front end (sql/dialect.py) against the fixture catalog — proving a
reference user's own SQL runs unchanged on this engine."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hash_db_spark.catalog import load_tables
from hash_db_spark.sql import SqlEngine
from hash_db_spark.queries import Query


def _engine(spark: SparkSession, sf_dir: str) -> SqlEngine:
    return SqlEngine(spark, load_tables(spark, sf_dir))


def q_dialect_select_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _engine(spark, sf_dir).sql(
        "select customer.c_custkey, customer.c_name from customer "
        "where customer.c_mktsegment = 'BUILDING'"
    )


def q_dialect_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _engine(spark, sf_dir).sql(
        "select orders.o_orderkey, customer.c_name from orders "
        "inner join customer on orders.o_custkey = customer.c_custkey"
    )


def q_dialect_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _engine(spark, sf_dir).sql(
        "select customer.c_mktsegment, count(*) from customer "
        "group by customer.c_mktsegment"
    )


def q_dialect_fts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _engine(spark, sf_dir).sql(
        "select documents.doc_id, documents.lang from documents "
        "where documents.text ~ 'spark & join' and documents.lang = 'en'"
    )


def q_dialect_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    eng.sql("insert into notes (title, score) values ('first', 10)")
    eng.sql("insert into notes (title, score) values ('second', 20)")
    eng.sql("insert into notes (title, body) values ('third', 'hello world')")
    return eng.sql("select * from notes")


DIALECT_INSERT_ORACLE = """
SELECT 1 AS id, 'first' AS title, CAST(10 AS BIGINT) AS score, NULL AS body
UNION ALL SELECT 2, 'second', 20, NULL
UNION ALL SELECT 3, 'third', NULL, 'hello world'
"""


def q_dialect_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    eng.sql(
        "update customer set customer.c_mktsegment = 'PREMIUM' "
        "where customer.c_mktsegment = 'AUTOMOBILE'"
    )
    return eng.sql(
        "select customer.c_custkey, customer.c_mktsegment from customer"
    )


def q_dialect_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison operators in WHERE (free win — the reference grammar
    only has ``=``): a price band plus an inequality, ANDed."""
    return _engine(spark, sf_dir).sql(
        "select orders.o_orderkey, orders.o_totalprice from orders "
        "where orders.o_totalprice >= 400000 "
        "and orders.o_totalprice < 500000 and orders.o_orderstatus != 'F'"
    )


def q_dialect_group_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sum/avg/min/max in a grouped dialect select (free win — the
    reference's only aggregate is count(*)). Integer source column keeps
    the cross-engine sums exact."""
    return _engine(spark, sf_dir).sql(
        "select orders.o_orderstatus, count(*), sum(orders.o_custkey), "
        "avg(orders.o_custkey), min(orders.o_custkey), "
        "max(orders.o_custkey) from orders group by orders.o_orderstatus"
    )


def q_dialect_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Free-win clauses (SURVEY §2.2: the reference sorts only in the KV
    API, K8): ORDER BY + LIMIT through the dialect compiles to
    TakeOrderedAndProject — per-partition top-k, no global sort.
    Tie-break on c_custkey keeps the top-10 deterministic."""
    return _engine(spark, sf_dir).sql(
        "select customer.c_custkey, customer.c_name, customer.c_acctbal "
        "from customer where customer.c_mktsegment = 'BUILDING' "
        "order by customer.c_acctbal desc, customer.c_custkey asc limit 10"
    )


def q_dialect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT through the dialect (free win, SURVEY §2.2)."""
    return _engine(spark, sf_dir).sql(
        "select distinct orders.o_orderpriority, orders.o_orderstatus "
        "from orders"
    )


def q_dialect_create_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = _engine(spark, sf_dir)
    eng.sql(
        "create join inner join nation on nation.n_nationkey = supplier.s_nationkey"
    )
    return eng.materialized_view("supplier").select(
        "s_suppkey", "s_name", "n_name"
    )


QUERIES = {
    "dialect_select_where": Query(
        q_dialect_select_where,
        "SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'",
    ),
    "dialect_join": Query(
        q_dialect_join,
        "SELECT o_orderkey, c_name FROM orders "
        "JOIN customer ON o_custkey = c_custkey",
    ),
    "dialect_group_count": Query(
        q_dialect_group_count,
        "SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY 1",
    ),
    "dialect_fts": Query(
        q_dialect_fts,
        "SELECT doc_id, lang FROM documents WHERE "
        "list_contains(string_split(replace(text, ',', ''), ' '), 'spark') "
        "AND list_contains(string_split(replace(text, ',', ''), ' '), 'join') "
        "AND lang = 'en'",
    ),
    "dialect_insert": Query(q_dialect_insert, DIALECT_INSERT_ORACLE),
    "dialect_update": Query(
        q_dialect_update,
        "SELECT c_custkey, CASE WHEN c_mktsegment = 'AUTOMOBILE' "
        "THEN 'PREMIUM' ELSE c_mktsegment END AS c_mktsegment FROM customer",
    ),
    "dialect_group_aggs": Query(
        q_dialect_group_aggs,
        "SELECT o_orderstatus, count(*) AS cnt, "
        "CAST(sum(o_custkey) AS BIGINT) AS sum_o_custkey, "
        "avg(o_custkey) AS avg_o_custkey, "
        "min(o_custkey) AS min_o_custkey, "
        "max(o_custkey) AS max_o_custkey "
        "FROM orders GROUP BY o_orderstatus",
    ),
    "dialect_compare": Query(
        q_dialect_compare,
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice >= 400000 AND o_totalprice < 500000 "
        "AND o_orderstatus != 'F'",
    ),
    "dialect_order_limit": Query(
        q_dialect_order_limit,
        "SELECT c_custkey, c_name, c_acctbal FROM customer "
        "WHERE c_mktsegment = 'BUILDING' "
        "ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 10",
    ),
    "dialect_distinct": Query(
        q_dialect_distinct,
        "SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders",
    ),
    "dialect_create_join": Query(
        q_dialect_create_join,
        "SELECT s_suppkey, s_name, n_name FROM supplier "
        "JOIN nation ON n_nationkey = s_nationkey",
    ),
}
