"""Driver-checkable queries: document/JSON operators (SURVEY §2.3).

The nested-doc scenario (A3 people_docs in FIXTURES.md) is synthesized
in-query from customer⋈orders — build nested array<struct> with a
deterministic sort, then run the reference's ``~hobbies[]~name``-style
path queries over it. The oracle computes the same flattened result
relationally, which is exactly the point: shred/explode must round-trip
to plain relational semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.types import IntegerType

from hash_db_spark.catalog import load_table
from hash_db_spark.operators import documents as D
from hash_db_spark.queries import Query


def q_doc_json_get(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shallow JSON path over events.props (no shred)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        D.json_get("props", "k").cast("int").alias("k"),
    ).filter(F.col("k") >= 90)


def q_doc_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over an extracted JSON field."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", D.json_get("props", "k").cast("int").alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_doc_shred_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1+D2: shred (from_json) then rehydrate-extract — fields must
    survive the round trip exactly."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    shredded = D.shred(ev.select("event_id", "props"), "props", "k INT")
    return shredded.select(
        "event_id", F.col("props").getField("k").alias("k")
    )


def _people_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3-shaped nested collection: one doc per customer, hobbies =
    sorted distinct order-priorities (array<struct<name:string>>)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    hobbies = (
        orders.groupBy("o_custkey")
        .agg(
            F.array_sort(F.collect_set(F.col("o_orderpriority"))).alias("ps")
        )
        .select(
            "o_custkey",
            F.transform(
                F.col("ps"), lambda p: F.struct(p.alias("name"))
            ).alias("hobbies"),
        )
    )
    return cust.join(
        hobbies, cust.c_custkey == hobbies.o_custkey
    ).select("c_custkey", F.col("c_name").alias("name"), "hobbies")


def q_doc_path_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select * from people where people.~hobbies[]~name = '1-URGENT'
    (example.py:324-335 shape)."""
    docs = _people_docs(spark, sf_dir)
    return D.filter_path(
        docs, "hobbies[]~name", "1-URGENT", "c_custkey", "name",
        leaf_alias="hobby",
    )


def q_doc_path_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """select people.~hobbies[]~name from people (example.py:341-344)."""
    docs = _people_docs(spark, sf_dir)
    return D.select_path(docs, "hobbies[]~name", "hobby", "c_custkey")


def q_doc_path_two_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level nested path ~orders[]~items[]~qty: customer → orders
    array → lineitems array, flattened by chained explodes (each [] is
    one explode — exactly the reference's one-SQL-row-per-leaf shredding,
    server.py:320-328)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 100)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    items = (
        li.filter(F.col("l_quantity") >= 45)
        .groupBy("l_orderkey")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("l_linenumber").alias("line"),
                        F.col("l_quantity").alias("qty"),
                    )
                )
            ).alias("items")
        )
    )
    nested_orders = (
        orders.join(items, orders.o_orderkey == items.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("o_orderkey").alias("okey"), F.col("items"))
                )
            ).alias("orders")
        )
    )
    docs = cust.join(
        nested_orders, cust.c_custkey == nested_orders.o_custkey
    ).select("c_custkey", "orders")
    out, leaf = D.compile_path(docs, "orders[]~items[]~qty", "qty")
    okey = F.col("__path0").getField("okey")
    line = F.col("__path1").getField("line")
    return out.select(
        "c_custkey", okey.alias("okey"), line.alias("line"), leaf
    )


def q_doc_shred_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 with schema inference: heterogeneous JSON docs (the 'vip' field
    only exists on some documents — to_json drops nulls) are shredded with
    NO caller-supplied schema; inference merges per-document shapes the
    way the reference's type registry does (server.py:196-229)."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 300)
    orders = load_table(spark, sf_dir, "orders")
    hobbies = (
        orders.groupBy("o_custkey")
        .agg(F.array_sort(F.collect_set(F.col("o_orderpriority"))).alias("ps"))
        .select(
            "o_custkey",
            F.transform(F.col("ps"), lambda p: F.struct(p.alias("name"))).alias(
                "hobbies"
            ),
        )
    )
    docs = cust.join(hobbies, cust.c_custkey == hobbies.o_custkey).select(
        "c_custkey",
        F.to_json(
            F.struct(
                F.col("c_name").alias("name"),
                F.col("c_acctbal").alias("acctbal"),
                F.when(F.col("c_acctbal") > 5000, F.lit("Y")).alias("vip"),
                F.col("hobbies"),
            )
        ).alias("doc"),
    )
    shredded = D.shred_infer(docs, "doc")
    return shredded.select(
        "c_custkey",
        F.col("doc").getField("name").alias("name"),
        F.col("doc").getField("acctbal").alias("acctbal"),
        F.col("doc").getField("vip").alias("vip"),
        F.size(F.col("doc").getField("hobbies")).cast("bigint").alias("n_hobbies"),
    )


DOC_SHRED_INFER_ORACLE = """
SELECT c_custkey, c_name AS name, c_acctbal AS acctbal,
       CASE WHEN c_acctbal > 5000 THEN 'Y' END AS vip,
       n_hobbies
FROM customer
JOIN (
  SELECT o_custkey, count(DISTINCT o_orderpriority) AS n_hobbies
  FROM orders GROUP BY o_custkey
) h ON o_custkey = c_custkey
WHERE c_custkey <= 300
"""


DOC_TWO_LEVEL_ORACLE = """
SELECT c_custkey, o_orderkey AS okey, l_linenumber AS line, l_quantity AS qty
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_custkey <= 100 AND l_quantity >= 45
"""


QUERIES = {
    "doc_json_get": Query(
        q_doc_json_get,
        "SELECT event_id, CAST(props->>'$.k' AS INT) AS k FROM events "
        "WHERE CAST(props->>'$.k' AS INT) >= 90",
    ),
    "doc_json_agg": Query(
        q_doc_json_agg,
        "SELECT event_type, round(avg(CAST(props->>'$.k' AS INT)), 4) AS avg_k, "
        "max(CAST(props->>'$.k' AS INT)) AS max_k FROM events GROUP BY event_type",
    ),
    "doc_shred_roundtrip": Query(
        q_doc_shred_roundtrip,
        "SELECT event_id, CAST(props->>'$.k' AS INT) AS k FROM events "
        "WHERE event_id < 100",
    ),
    "doc_path_where": Query(
        q_doc_path_where,
        "SELECT DISTINCT c_custkey, c_name AS name, o_orderpriority AS hobby "
        "FROM customer JOIN orders ON o_custkey = c_custkey "
        "WHERE o_orderpriority = '1-URGENT'",
    ),
    "doc_path_select": Query(
        q_doc_path_select,
        "SELECT DISTINCT c_custkey, o_orderpriority AS hobby "
        "FROM customer JOIN orders ON o_custkey = c_custkey",
    ),
    "doc_path_two_level": Query(q_doc_path_two_level, DOC_TWO_LEVEL_ORACLE),
    "doc_shred_infer": Query(q_doc_shred_infer, DOC_SHRED_INFER_ORACLE),
}
