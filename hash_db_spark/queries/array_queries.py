"""Driver-checkable queries: array/collection function family (free win —
the reference has no collection types at all; SURVEY §1.3 notes only
strings and ints exist there). Spark arrays ↔ DuckDB lists."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.queries import Query


def q_array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic array aggregation: per nation, the sorted list of
    its supplier names (collect_list is unordered — array_sort makes the
    value hashable cross-engine)."""
    sup = load_table(spark, sf_dir, "supplier")
    # array_join: the driver's pandas-side row sort can't order list
    # cells (unhashable), so the output surface is the joined string.
    return (
        sup.groupBy("s_nationkey")
        .agg(F.array_sort(F.collect_list("s_name")).alias("names_a"))
        .select(
            F.col("s_nationkey").cast("int").alias("nationkey"),
            F.array_join("names_a", "|").alias("names"),
            F.size("names_a").alias("n"),
        )
    )


ARRAY_AGG_ORACLE = """
SELECT CAST(s_nationkey AS INT) AS nationkey,
       array_to_string(list_sort(list(s_name)), '|') AS names,
       CAST(len(list(s_name)) AS INT) AS n
FROM supplier GROUP BY s_nationkey
"""


def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Element ops over a built array: per order, sorted linenumbers —
    size, first element, membership, sliced head."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 2000)
    arr = (
        li.groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("l_linenumber")).alias("lines"))
    )
    # head2 is emitted as a joined string: the driver compare sorts rows
    # in pandas, and a list-typed cell is unhashable there.
    return arr.select(
        "l_orderkey",
        F.size("lines").alias("n_lines"),
        F.element_at("lines", 1).alias("first_line"),
        F.array_contains("lines", 3).alias("has_line3"),
        F.array_join(F.slice("lines", 1, 2).cast("array<string>"), ",").alias(
            "head2"
        ),
    )


ARRAY_OPS_ORACLE = """
SELECT l_orderkey,
       CAST(len(lines) AS INT) AS n_lines,
       lines[1] AS first_line,
       list_contains(lines, 3) AS has_line3,
       array_to_string(lines[1:2], ',') AS head2
FROM (
  SELECT l_orderkey, list_sort(list(l_linenumber)) AS lines
  FROM lineitem WHERE l_orderkey <= 2000 GROUP BY l_orderkey
)
"""


QUERIES = {
    "array_agg_sorted": Query(q_array_agg_sorted, ARRAY_AGG_ORACLE),
    "array_ops": Query(q_array_ops, ARRAY_OPS_ORACLE),
}
