"""Driver-checkable queries: deterministic HLL distinct sketches.

Two entries over ``events``:
- hll_distinct_users — per-event-type approximate distinct users beside
  the exact count (150/group → exercises the linear-counting branch).
- hll_merge_rollup — global distinct event_ids (10k → raw-HLL branch)
  computed by MERGING per-event-type register sketches, demonstrating
  that per-shard partial sketches roll up to the same estimate the full
  scan would produce (max is associative).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hash_db_spark.catalog import load_table
from hash_db_spark.functions import sketches as S
from hash_db_spark.queries import Query


def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = S.hll_distinct(ev, "user_id", "event_type")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return h.join(exact, "event_type").orderBy("event_type")


def q_hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    shard_sketches = S.register_rows(ev, "event_id", "event_type")
    merged = shard_sketches.groupBy("reg").agg(F.max("mj").alias("mj"))
    est = S.estimate(merged)
    exact = ev.agg(F.countDistinct("event_id").alias("exact_distinct"))
    return est.crossJoin(exact)


HLL_USERS_ORACLE = f"""
SELECT h.event_type, h.approx_distinct, x.exact_distinct
FROM (
  WITH regs AS ({S.sql_register_rows("events", "user_id", "event_type")}),
  {S.sql_estimate("event_type")}
) h
JOIN (
  SELECT event_type, count(DISTINCT user_id) AS exact_distinct
  FROM events GROUP BY event_type
) x USING (event_type)
ORDER BY event_type
"""

HLL_ROLLUP_ORACLE = f"""
SELECT h.approx_distinct, x.exact_distinct
FROM (
  WITH regs0 AS ({S.sql_register_rows("events", "event_id", "event_type")}),
  regs AS (SELECT reg, max(mj) AS mj FROM regs0 GROUP BY reg),
  {S.sql_estimate("")}
) h
CROSS JOIN (
  SELECT count(DISTINCT event_id) AS exact_distinct FROM events
) x
"""


QUERIES = {
    "hll_distinct_users": Query(q_hll_distinct_users, HLL_USERS_ORACLE),
    "hll_merge_rollup": Query(q_hll_merge_rollup, HLL_ROLLUP_ORACLE),
}
