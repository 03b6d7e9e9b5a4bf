"""Skew-handling operators (SURVEY §7 scale design).

The reference's consistent-hash partitioner sends every row of a hot
partition key to ONE node (/root/reference/consistent_hashing.py:46-53) —
a hot key melts that node. At Spark scale the same pathology appears as a
straggler reduce task. Two standard remedies, both result-identical to
their naive forms (so the DuckDB oracle is just the unsalted query):

- salted aggregation: two-phase — spray each key across N sub-keys,
  partial-agg, then merge. (AQE's skew-join splitting handles *joins*
  automatically; aggregation skew still needs this.)
- salted join: replicate the small side N× with salt ids, spray the
  skewed fact side, join on (key, salt). Use when AQE cannot help —
  e.g. a broadcast-too-big dimension against one hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def salted_group_count(
    df: DataFrame, key: str, salt_buckets: int = 16
) -> DataFrame:
    """GROUP BY key count(*) with a two-phase salted shuffle. The first
    aggregation distributes a hot key over ``salt_buckets`` reducers;
    the second merges the per-salt partials (salt_buckets rows per key —
    trivial). Result is byte-identical to a plain groupBy count."""
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(key, "__salt").agg(
        F.count(F.lit(1)).alias("__partial")
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("cnt"))


def salted_sum(
    df: DataFrame, key: str, value: str, salt_buckets: int = 16
) -> DataFrame:
    """Salted two-phase SUM(value) GROUP BY key (same pattern)."""
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(key, "__salt").agg(F.sum(value).alias("__p"))
    return partial.groupBy(key).agg(
        F.round(F.sum("__p"), 2).alias("sum_value")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Inner equijoin with the fact side sprayed over salt buckets and
    the dim side replicated salt_buckets×. Shuffle key becomes
    (key, salt), splitting any hot key across salt_buckets reducers.
    Result is identical to fact.join(dim, fact_key == dim_key)."""
    fact_s = fact.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    dim_s = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    out = fact_s.join(
        dim_s,
        (F.col(fact_key) == F.col(dim_key)) & (fact_s["__salt"] == dim_s["__salt"]),
    )
    return out.drop("__salt")
