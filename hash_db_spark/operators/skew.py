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


def key_skew_report(df: DataFrame, key: str, key_name: str) -> DataFrame:
    """One-row skew census of a join/aggregation key: (key_name, n_rows,
    n_keys, max_key_rows, top1_share, top10_share, gini) — the planning
    numbers that decide whether a shuffle on this key needs salting, an
    AQE skew split, or nothing. Run it BEFORE burning a cluster-day on
    a 100 TB join, not after the straggler task appears.

    gini is the Gini coefficient of the per-key row-count distribution
    (0 = uniform, ->1 = one key owns everything). It needs a full
    ordering of key counts, which would be a global single-task window
    over n_keys rows — a funnel at billions of keys. Instead it's
    computed from the COUNT-OF-COUNTS frame (multiplicity c -> m keys):
    ranks within an equal-count block contribute c * (m*cum_before +
    m*(m+1)/2), so Gini = (2*S1 - (n+1)*T) / (n*T) falls out of one
    tiny window. The frame is provably small: distinct multiplicities
    c_1 < c_2 < ... with sum(c_i * m_i) = n_rows means at most
    O(sqrt(n_rows)) distinct values (1+2+...+k <= T) — ~10^6 rows at a
    10^12-row fact, trivially one task. top10_share is a TakeOrdered
    (sort-limit), never a full sort."""
    from pyspark.sql import Window

    counts = (
        df.select(F.col(key).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cc = counts.groupBy("c").agg(F.count(F.lit(1)).alias("m"))
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    ranked = cc.withColumn("cum_before", F.coalesce(F.sum("m").over(w), F.lit(0)))
    stats = ranked.agg(
        F.sum(F.col("c") * F.col("m")).alias("t"),
        F.sum("m").alias("n_keys"),
        F.max("c").alias("max_key_rows"),
        F.sum(
            F.col("c")
            * (
                F.col("m") * F.col("cum_before")
                + F.col("m") * (F.col("m") + 1) / 2.0
            )
        ).alias("s1"),
    )
    top10 = (
        counts.orderBy(F.col("c").desc(), F.col("k").asc())
        .limit(10)
        .agg(F.sum("c").alias("top10"))
    )
    return (
        stats.crossJoin(top10)
        .select(
            F.lit(key_name).alias("key_name"),
            F.col("t").alias("n_rows"),
            "n_keys",
            "max_key_rows",
            F.round(F.col("max_key_rows") / F.col("t"), 6).alias("top1_share"),
            F.round(F.col("top10") / F.col("t"), 6).alias("top10_share"),
            F.round(
                (2.0 * F.col("s1") - (F.col("n_keys") + 1) * F.col("t"))
                / (F.col("n_keys") * F.col("t")),
                6,
            ).alias("gini"),
        )
    )


def sql_key_skew_report(table: str, key: str, key_name: str) -> str:
    return f"""
SELECT '{key_name}' AS key_name, n_rows, n_keys, max_key_rows,
       round(CAST(max_key_rows AS DOUBLE) / n_rows, 6) AS top1_share,
       round(CAST((
         SELECT sum(c) FROM (
           SELECT count(*) AS c FROM {table} GROUP BY {key}
           ORDER BY c DESC LIMIT 10
         )
       ) AS DOUBLE) / n_rows, 6) AS top10_share,
       round((2.0 * s1 - (n_keys + 1) * n_rows) / (n_keys * n_rows), 6)
         AS gini
FROM (
  SELECT sum(c * m) AS n_rows, sum(m) AS n_keys, max(c) AS max_key_rows,
         sum(c * (m * cum_before + m * (m + 1) / 2.0)) AS s1
  FROM (
    SELECT c, m,
           COALESCE(sum(m) OVER (ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS cum_before
    FROM (
      SELECT c, count(*) AS m FROM (
        SELECT count(*) AS c FROM {table} GROUP BY {key}
      ) GROUP BY c
    )
  )
)
"""
