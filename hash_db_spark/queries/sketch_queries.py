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


def q_stream_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING distinct-count sketch: the HLL register maxima are a
    streaming aggregation (groupBy max — complete mode, state = at most
    groups x 256 skinny rows regardless of stream length); the estimate
    is computed from the final register table. Lands on the same answer
    as the batch sketch — the oracle is the batch SQL, making this a
    driver-checked STREAMING entry, not a parity-only one."""
    from hash_db_spark.streaming import windows as W

    stream = W.read_events_stream(spark, sf_dir)
    regs = S.register_rows(stream, "user_id", "event_type")
    final_regs = W.run_stream_to_memory(regs, output_mode="complete")
    est = S.estimate(final_regs, "event_type")
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type").orderBy("event_type")


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


def q_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min point estimates for a probe set of users, beside the
    exact count — est >= exact always (min over rows only over-counts)."""
    ev = load_table(spark, sf_dir, "events")
    cells = S.cms_cells(ev, "user_id")
    probes = ev.filter(F.col("user_id") <= 40).select("user_id").distinct()
    est = S.cms_estimate(cells, probes, "user_id")
    exact = (
        ev.filter(F.col("user_id") <= 40)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    return est.join(exact, "user_id")


def q_bloom_prejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction (the runtime-filter technique):
    the dimension's key set becomes a tiny bit list broadcast to the
    fact scan, which drops non-joining rows MAP-SIDE before the exact
    join — at 100 TB this is the difference between shuffling the whole
    fact table and shuffling the ~joining fraction. False positives
    survive the prefilter and are removed by the exact join, so the
    result is bit-identical to the plain join (the oracle).

    The prefilter is applied MAP-SIDE (bloom_member_pred: the bit set
    is a <=m-int collect folded into one mask literal) — no .distinct()
    over the fact, no groupBy per probe key, no broadcast of any
    corpus-derived candidate set; the only broadcast left is the
    key-bounded dimension itself (c_custkey <= 100)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select("c_custkey", "c_mktsegment")
    )
    bits = S.bloom_bits(dim, "c_custkey")
    pre = ev.filter(S.bloom_member_pred(bits, "user_id"))
    return pre.join(
        F.broadcast(dim), pre.user_id == dim.c_custkey
    ).select("event_id", "user_id", "c_mktsegment")


BLOOM_PREJOIN_ORACLE = """
SELECT event_id, user_id, c_mktsegment
FROM events JOIN customer ON user_id = c_custkey
WHERE c_custkey <= 100
"""


def q_stream_cms_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING count-min: the cell grid is a streaming groupBy-count
    (complete mode — state is the fixed d x w grid regardless of stream
    length); point estimates come from the final cell table and land on
    the batch sketch's exact answer, so the batch SQL is the oracle."""
    from hash_db_spark.streaming import windows as W

    stream = W.read_events_stream(spark, sf_dir)
    cells = S.cms_cells(stream, "user_id")
    final_cells = W.run_stream_to_memory(cells, output_mode="complete")
    ev = load_table(spark, sf_dir, "events")
    probes = ev.filter(F.col("user_id") <= 40).select("user_id").distinct()
    est = S.cms_estimate(final_cells, probes, "user_id")
    exact = (
        ev.filter(F.col("user_id") <= 40)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("exact_n"))
    )
    return est.join(exact, "user_id")


CMS_USERS_ORACLE = f"""
WITH cells AS ({S.sql_cms_cells("events", "user_id", "")}),
probes AS (SELECT DISTINCT user_id FROM events WHERE user_id <= 40),
pc AS ({S.sql_cms_probe_cells("SELECT user_id FROM probes", "user_id")})
SELECT pc.user_id, min(coalesce(cells.c, 0)) AS est, x.exact_n
FROM pc
LEFT JOIN cells ON pc.row = cells.row AND pc.col = cells.col
JOIN (
  SELECT user_id, count(*) AS exact_n FROM events
  WHERE user_id <= 40 GROUP BY user_id
) x ON x.user_id = pc.user_id
GROUP BY pc.user_id, x.exact_n
"""


def q_cms_merge_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters from MERGED per-event-type sketch shards: cell-wise
    sums reconstruct the global grid exactly, then every distinct user is
    screened against a frequency threshold. No false negatives: CMS only
    over-counts, so every truly-heavy key survives the screen; the exact
    join afterward is what discards the (rare) false positives."""
    ev = load_table(spark, sf_dir, "events")
    shards = S.cms_cells(ev, "user_id", "event_type")
    merged = shards.groupBy("row", "col").agg(F.sum("c").alias("c"))
    probes = ev.select("user_id").distinct()
    est = S.cms_estimate(merged, probes, "user_id", pre_merged=True).filter(
        F.col("est") >= 25
    )
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    return est.join(exact, "user_id")


CMS_MERGE_ORACLE = f"""
WITH shards AS ({S.sql_cms_cells("events", "user_id", "event_type")}),
cells AS (
  SELECT row, col, CAST(sum(c) AS BIGINT) AS c FROM shards GROUP BY row, col
),
probes AS (SELECT DISTINCT user_id FROM events),
pc AS ({S.sql_cms_probe_cells("SELECT user_id FROM probes", "user_id")}),
est AS (
  SELECT pc.user_id, min(coalesce(cells.c, 0)) AS est
  FROM pc LEFT JOIN cells ON pc.row = cells.row AND pc.col = cells.col
  GROUP BY pc.user_id
)
SELECT est.user_id, est.est, x.exact_n
FROM est
JOIN (SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id) x
  ON x.user_id = est.user_id
WHERE est.est >= 25
"""





def q_kmv_shared_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated distinct shared users per event-type pair from KMV
    sketches alone — the intersection query exact count-distinct needs
    a corpus self-join for; sketches make it (groups x k)-sized."""
    from hash_db_spark.catalog import load_table
    from hash_db_spark.functions import sketches as SK

    ev = load_table(spark, sf_dir, "events")
    return SK.kmv_pair_intersections(
        SK.kmv_sketch(ev, "user_id", "event_type")
    )


def _kmv_shared_oracle() -> str:
    from hash_db_spark.functions import sketches as SK

    return SK.sql_kmv_pair_intersections("events", "user_id", "event_type")


def q_stream_bloom_prejoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The runtime-filter shape on a STREAM: each micro-batch of events
    is prefiltered map-side by the broadcast bloom mask (the
    bloom_member_pred literal — no state, no shuffle added to the
    stream) before the stream-static exact join with the key-bounded
    dimension. At 100 TB-scale ingest this drops non-joining events at
    the source scan instead of carrying them into join state. Result is
    bit-identical to the batch join, so it shares BLOOM_PREJOIN_ORACLE."""
    from hash_db_spark.streaming import windows as W

    dim = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 100)
        .select("c_custkey", "c_mktsegment")
    )
    bits = S.bloom_bits(dim, "c_custkey")
    ev = W.read_events_stream(spark, sf_dir).select("event_id", "user_id")
    pre = ev.filter(S.bloom_member_pred(bits, "user_id"))
    joined = pre.join(
        F.broadcast(dim), pre.user_id == dim.c_custkey
    ).select("event_id", "user_id", "c_mktsegment")
    return W.run_stream_to_memory(joined, output_mode="append")


# The QUERIES literal lives at module tail so every registered fn is
# already bound; compute_reverify explodes it per-entry either way.
QUERIES = {
    "hll_distinct_users": Query(q_hll_distinct_users, HLL_USERS_ORACLE),
    "stream_hll_users": Query(q_stream_hll_users, HLL_USERS_ORACLE),
    "hll_merge_rollup": Query(q_hll_merge_rollup, HLL_ROLLUP_ORACLE),
    "cms_user_counts": Query(q_cms_user_counts, CMS_USERS_ORACLE),
    "stream_cms_users": Query(q_stream_cms_users, CMS_USERS_ORACLE),
    "bloom_prejoin": Query(q_bloom_prejoin, BLOOM_PREJOIN_ORACLE),
    "cms_merge_heavy_hitters": Query(
        q_cms_merge_heavy_hitters, CMS_MERGE_ORACLE
    ),
    # registered r10 (queued r09 under the VERDICT r08 #1 throttle):
    # KMV/theta-style distinct-intersection sketch — the set operation
    # HLL can't serve.
    "kmv_shared_users": Query(q_kmv_shared_users, _kmv_shared_oracle()),
    # registered r11 (queued r10 under the VERDICT r08 #1 throttle):
    "stream_bloom_prejoin": Query(
        q_stream_bloom_prejoin, BLOOM_PREJOIN_ORACLE
    ),
}
