"""Driver-checkable queries: temporal operators + Structured Streaming.

The streaming entries (stream_*) actually run a Structured Streaming
pipeline (file source → trigger(availableNow) → memory sink) and are
hash-compared against *batch* DuckDB oracles — stream/batch parity is the
correctness statement. Batch temporal entries check the as-of/range/
session/window operators directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.operators import temporal as T
from hash_db_spark.streaming import windows as W
from hash_db_spark.queries import Query


def _events(spark, sf_dir) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- as-of join --------------------------------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the user's latest click at-or-before it."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    joined = T.asof_join(
        purchases, clicks, key="user_id", left_time="ts", right_time="ts",
        right_payload=["click_id"],
    )
    return joined.select("event_id", "user_id", "ts", "asof_click_id")


ASOF_ORACLE = """
SELECT p.event_id, p.user_id, p.ts, c.event_id AS asof_click_id
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND c.ts <= p.ts
"""


def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 15-minute tolerance: clicks further back
    than the tolerance do NOT match (payload stays NULL) — the
    merge_asof(tolerance=...) contract. Payload = the matched click ts
    itself, which is tie-proof (equal timestamps collapse to one value)."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    joined = T.asof_join(
        purchases, clicks, key="user_id", left_time="ts", right_time="cts",
        right_payload=["cts"], tolerance="15 minutes",
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("asof_cts").alias("matched_ts")
    )


ASOF_TOL_ORACLE = """
SELECT p.event_id, p.user_id, p.ts,
       (SELECT max(c.ts) FROM events c
         WHERE c.user_id = p.user_id AND c.event_type = 'click'
           AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 15 MINUTE)
       AS matched_ts
FROM events p WHERE p.event_type = 'purchase'
"""


def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for each purchase, the user's EARLIEST click at or
    after it (time-to-next-action analysis)."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    joined = T.asof_join(
        purchases, clicks, key="user_id", left_time="ts", right_time="cts",
        right_payload=["cts"], direction="forward",
    )
    return joined.select(
        "event_id", "user_id", "ts", F.col("asof_cts").alias("next_click_ts")
    )


def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of (pandas merge_asof's third direction):
    for each purchase, the click closest in time either way, ties
    backward. Both fills ride one shuffle."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts")
    )
    joined = T.asof_join_nearest(
        purchases, clicks, key="user_id", left_time="ts", right_time="cts",
        right_payload=["cts"],
    )
    return joined.select(
        "event_id", "user_id", "ts",
        F.col("asof_cts").alias("nearest_click_ts"),
    )


ASOF_NEAREST_ORACLE = """
SELECT event_id, user_id, ts,
       CASE WHEN f IS NULL THEN b
            WHEN b IS NULL THEN f
            WHEN (ts - b) <= (f - ts) THEN b ELSE f END AS nearest_click_ts
FROM (
  SELECT p.event_id, p.user_id, p.ts,
         (SELECT max(c.ts) FROM events c
           WHERE c.user_id = p.user_id AND c.event_type = 'click'
             AND c.ts <= p.ts) AS b,
         (SELECT min(c.ts) FROM events c
           WHERE c.user_id = p.user_id AND c.event_type = 'click'
             AND c.ts >= p.ts) AS f
  FROM events p WHERE p.event_type = 'purchase'
)
"""


ASOF_FWD_ORACLE = """
SELECT p.event_id, p.user_id, p.ts,
       (SELECT min(c.ts) FROM events c
         WHERE c.user_id = p.user_id AND c.event_type = 'click'
           AND c.ts >= p.ts)
       AS next_click_ts
FROM events p WHERE p.event_type = 'purchase'
"""


# --- range join --------------------------------------------------------------

def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click/purchase pairs of the same user within 1 hour before the
    purchase (inclusive bounds)."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("cts")
    )
    return T.range_join(
        purchases, clicks, key="user_id", left_time="pts", right_time="cts",
        lower="1 hour", upper="0 seconds",
    ).select("purchase_id", "click_id", F.col("l.user_id").alias("user_id"))


RANGE_ORACLE = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
"""


# --- sessionization ----------------------------------------------------------

def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.sessionize(
        _events(spark, sf_dir),
        key="user_id", time="ts", gap="1 hour", order_tiebreak="event_id",
    )


SESSIONIZE_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts > lag(ts) OVER w + INTERVAL 1 HOUR
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sessions AS (
  SELECT user_id, ts,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC,
                               event_id ASC
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sessions GROUP BY user_id, session_id
"""


# --- windowed aggregation (batch) -------------------------------------------

def q_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.tumbling_counts(_events(spark, sf_dir), "1 day")


TUMBLING_ORACLE = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_start,
       CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS win_end,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2, 3
"""


def q_sliding_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.sliding_counts(_events(spark, sf_dir), "2 days", "1 day")


SLIDING_ORACLE = """
WITH starts AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS ws, event_type FROM events
  UNION ALL
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) - INTERVAL 1 DAY, event_type
  FROM events
)
SELECT ws AS win_start, ws + INTERVAL 2 DAY AS win_end,
       event_type, count(*) AS n
FROM starts GROUP BY 1, 2, 3
"""


def q_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union per user: every event opens a 15-minute activity
    window; overlapping/touching windows coalesce into islands (uptime
    stitching). One shuffle on the key."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("e"),
    )
    return T.merge_intervals(ev, key="user_id", start="s", end="e",
                             tiebreak="event_id")


INTERVAL_MERGE_ORACLE = """
WITH iv AS (
  SELECT user_id, event_id, ts AS s, ts + INTERVAL 15 MINUTE AS e FROM events
),
pm AS (
  SELECT user_id, event_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM iv
),
lab AS (
  SELECT user_id, s, e,
         sum(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM pm
)
SELECT user_id, min(s) AS merged_start, max(e) AS merged_end,
       count(*) AS n_intervals
FROM lab GROUP BY user_id, island
"""


def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total covered activity per user: the merged islands from
    interval_merge reduced to (user, covered microseconds, island
    count) — the uptime/SLA aggregate. Composes on the same single
    shuffle; the per-user reduction is map-side partial on top."""
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("e"),
    )
    merged = T.merge_intervals(
        ev, key="user_id", start="s", end="e", tiebreak="event_id"
    )
    return merged.groupBy("user_id").agg(
        F.sum(
            # timestampdiff works directly on the TIMESTAMP_NTZ columns
            # (events ts after nanos normalization) — timezone
            # independent, unlike a cast-to-TIMESTAMP + unix_micros
            # difference, which a DST-observing session tz would skew
            # by an hour on islands straddling a transition.
            F.expr("timestampdiff(MICROSECOND, merged_start, merged_end)")
        ).alias("covered_us"),
        F.count(F.lit(1)).alias("n_islands"),
    )


INTERVAL_COVERAGE_ORACLE = f"""
WITH merged AS ({INTERVAL_MERGE_ORACLE})
SELECT user_id,
       CAST(sum(epoch_us(merged_end) - epoch_us(merged_start)) AS BIGINT)
         AS covered_us,
       count(*) AS n_islands
FROM merged GROUP BY user_id
"""


# --- Structured Streaming entries (stream vs batch oracle) ------------------

def q_stream_tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = W.read_events_stream(spark, sf_dir)
    return W.run_stream_to_memory(W.tumbling_counts(stream, "1 day"))


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dropDuplicates on (user_id, event_type); projecting the
    key columns makes the surviving row-choice irrelevant."""
    stream = W.read_events_stream(spark, sf_dir)
    deduped = W.stream_dedup(stream, ["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    return W.run_stream_to_memory(deduped, output_mode="append")


def q_stream_dedup_within_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.6's dropDuplicatesWithinWatermark: state bounded by the
    watermark horizon instead of all-time key cardinality."""
    stream = W.read_events_stream(spark, sf_dir)
    deduped = W.stream_dedup_within_watermark(
        stream, ["user_id", "event_type"]
    ).select("user_id", "event_type")
    return W.run_stream_to_memory(deduped, output_mode="append")


def q_stream_mv_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized view: stream⋈static-dim join + agg (the
    scalable 'create join', reference server.py:806-894)."""
    stream = W.read_events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment")
    )
    mv = W.materialized_view_stream(
        stream, cust, F.col("user_id") == F.col("c_custkey"), ["c_mktsegment"]
    )
    return W.run_stream_to_memory(mv)


STREAM_MV_ORACLE = """
SELECT c_mktsegment, count(*) AS n, round(sum(value), 2) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (purchase ⋈ same-user
    clicks within the preceding hour) — state bounded by the watermark
    horizon; equals the batch range join under availableNow."""
    stream = W.read_events_stream(spark, sf_dir)
    joined = W.stream_interval_join(stream, lookback="1 hour")
    return W.run_stream_to_memory(joined, output_mode="append")


STREAM_STREAM_ORACLE = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
"""


def q_interval_bin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless point-in-interval join, binned: purchases that happened
    inside each day's error envelope (first..last error of that day).
    The bin-grid equijoin replaces the BroadcastNestedLoopJoin a keyless
    range predicate would otherwise force."""
    ev = load_table(spark, sf_dir, "events")
    windows = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("day", "ts").alias("win_day"))
        .agg(F.min("ts").alias("w_start"), F.max("ts").alias("w_end"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    joined = T.point_in_interval_join(
        purchases, "ts", windows, "w_start", "w_end", bin_width="1 day"
    )
    return joined.select("event_id", "user_id", "win_day")


INTERVAL_BIN_ORACLE = """
WITH windows AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS win_day,
         min(ts) AS w_start, max(ts) AS w_end
  FROM events WHERE event_type = 'error' GROUP BY 1
)
SELECT e.event_id, e.user_id, w.win_day
FROM events e JOIN windows w
  ON e.ts >= w.w_start AND e.ts <= w.w_end
WHERE e.event_type = 'purchase'
"""


def q_ts_similar_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed time-series similarity search: top-10 users whose
    daily activity series correlates with user 42's."""
    return T.similar_activity_users(
        load_table(spark, sf_dir, "events"), probe_user=42, k=10
    )


FUNNEL_STEPS = ["view", "click", "purchase"]


def q_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.funnel(_events(spark, sf_dir), FUNNEL_STEPS)


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.cohort_retention(_events(spark, sf_dir))


DECAY_REF = "2024-07-01"
DECAY_HALF_LIFE_DAYS = 30.0


def q_decayed_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted per-user activity — the feature-store staple:
    each event contributes 0.5^(age_days / half_life) as of a reference
    instant, summed per user. Pure map-side expression + one
    map-combined shuffle. Each weight quantizes to integer MICRO-units
    before the sum: a raw double sum is addition-order-dependent in its
    last ulp, and a value astride a rounding boundary then renders
    differently per engine/run — integer sums are exact in any order,
    so the result is bit-stable at any corpus size."""
    ev = _events(spark, sf_dir)
    age_days = (
        F.lit(F.unix_timestamp(F.lit(DECAY_REF).cast("timestamp")))
        - F.unix_timestamp("ts")
    ) / F.lit(86400.0)
    w = F.pow(F.lit(0.5), age_days / F.lit(DECAY_HALF_LIFE_DAYS))
    micro = F.round(w * F.lit(1e6), 0).cast("long")
    # Final 4dp via integer HALF-UP division, not float round(): the
    # micro sum makes exact .5 ties COMMON, and Spark rounds HALF_UP
    # while DuckDB rounds HALF_EVEN — (n + 50) DIV 100 is the same
    # integer on both.
    return (
        ev.groupBy("user_id")
        .agg(
            F.sum(micro).alias("__m"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            (F.expr("(__m + 50) div 100") / F.lit(1e4)).alias("activity"),
            "n_events",
        )
    )


DECAYED_ORACLE = f"""
SELECT user_id,
       ((sum(CAST(round(pow(0.5,
         (epoch('{DECAY_REF}'::TIMESTAMP) - epoch(ts)) / 86400.0
           / {DECAY_HALF_LIFE_DAYS}) * 1000000, 0) AS BIGINT)) + 50) // 100)
         / 10000.0 AS activity,
       count(*) AS n_events
FROM events GROUP BY user_id
"""


def q_hourly_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events by hour-of-day and type — the traffic-shape report behind
    capacity planning; one map-combined shuffle over two small keys."""
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        F.hour("ts").alias("hour"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))


HOURLY_PROFILE_ORACLE = """
SELECT CAST(extract(hour FROM ts) AS INT) AS hour, event_type,
       count(*) AS n
FROM events GROUP BY hour, event_type
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences (operators/temporal.py:event_transitions) — one user
    shuffle, |types|^2 output."""
    return T.event_transitions(_events(spark, sf_dir))




ANOM_Z = 3.5  # Iglewicz-Hoaglin modified-z cutoff


def q_event_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user activity anomaly screen: modified z-score
    (Iglewicz & Hoaglin 1993 — public) of each user's event count
    against the corpus median/MAD — median-based, so the outliers being
    hunted cannot poison the baseline the way mean/stddev lets them.
    Emits every user with the score and the flag (cutoff 3.5).

    Scale shape: one map-side-combined per-user count; the median and
    MAD are two corpus aggregates over that user-dimension frame whose
    single-row results attach via broadcast-sized cross joins — no
    corpus-wide window, no second scan of events."""
    ev = _events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    med = per_user.agg(
        F.expr("percentile(n_events, 0.5)").alias("med")
    )
    mad = (
        per_user.crossJoin(med)
        .agg(
            F.expr("percentile(abs(n_events - med), 0.5)").alias("mad"),
            F.first("med").alias("med"),
        )
    )
    rz = F.round(
        F.lit(0.6745)
        * (F.col("n_events") - F.col("med"))
        / F.col("mad"),
        6,
    )
    return per_user.crossJoin(mad).select(
        "user_id",
        "n_events",
        rz.alias("rz"),
        (F.abs(rz) > ANOM_Z).alias("is_anomaly"),
    )


EVENT_RATE_ANOM_ORACLE = f"""
WITH per_user AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
),
med AS (SELECT quantile_cont(n_events, 0.5) AS med FROM per_user),
mad AS (
  SELECT quantile_cont(abs(n_events - med), 0.5) AS mad, any_value(med) AS med
  FROM per_user, med
)
SELECT user_id, n_events,
       round(0.6745 * (n_events - med) / mad, 6) AS rz,
       abs(round(0.6745 * (n_events - med) / mad, 6)) > {3.5} AS is_anomaly
FROM per_user, mad
"""


# --- session path mining -----------------------------------------------------

def q_session_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most common session event-type paths — the sequence
    report behind funnel discovery, over the exact session definition
    `sessionize` already proves (operators/temporal.py:session_paths)."""
    return T.session_paths_topk(
        _events(spark, sf_dir),
        key="user_id", time="ts", gap="1 hour",
        order_tiebreak="event_id", step_col="event_type", k=20,
    )


SESSION_PATHS_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts > lag(ts) OVER w + INTERVAL 1 HOUR
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sessions AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC,
                               event_id ASC
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
),
paths AS (
  SELECT user_id, session_id,
         string_agg(event_type, '>' ORDER BY ts ASC, event_id ASC) AS path
  FROM sessions GROUP BY user_id, session_id
)
SELECT path, count(*) AS n
FROM paths GROUP BY path
ORDER BY n DESC, path ASC
LIMIT 20
"""

def q_ewma_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA control chart (Roberts 1959) over event values:
    truncated-EWMA forecast from the previous 16 events (fixed linear
    combination of lag columns — no recurrence, no overflow), alert on
    a 1.5x relative departure. One user-keyed window shuffle."""
    return T.ewma_alerts(load_table(spark, sf_dir, "events"))


SESSION_PMI_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts > lag(ts) OVER w + INTERVAL 1 HOUR
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
sessions AS (
  SELECT user_id, event_type,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC,
                               event_id ASC
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
),
pres AS (SELECT DISTINCT user_id, session_id, event_type AS t FROM sessions),
n_cte AS (
  SELECT CAST(count(*) AS DOUBLE) AS n
  FROM (SELECT DISTINCT user_id, session_id FROM pres)
),
per_type AS (SELECT t, count(*) AS n_t FROM pres GROUP BY t),
pairs AS (
  SELECT a.t AS type_a, b.t AS type_b, count(*) AS n_ab
  FROM pres a JOIN pres b
    ON a.user_id = b.user_id AND a.session_id = b.session_id
   AND a.t < b.t
  GROUP BY a.t, b.t
)
SELECT p.type_a, p.type_b, CAST(p.n_ab AS BIGINT) AS n_ab,
       CAST(sign(x.v) * floor(abs(x.v) * 1000000 + 0.5) AS BIGINT)
         AS pmi_micro
FROM pairs p
JOIN per_type ta ON ta.t = p.type_a
JOIN per_type tb ON tb.t = p.type_b
CROSS JOIN LATERAL (
  SELECT ln((CAST(p.n_ab AS DOUBLE) * (SELECT n FROM n_cte))
            / (CAST(ta.n_t AS DOUBLE) * CAST(tb.n_t AS DOUBLE))) AS v
) x
ORDER BY type_a, type_b
"""


def q_session_type_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type association inside gap sessions: PMI over exact
    session-presence counts (Church & Hanks 1990), one ln per pair
    micro-quantized. Bounded by the type alphabet squared — never by
    event volume."""
    return T.session_type_pmi(
        load_table(spark, sf_dir, "events"),
        key="user_id", time="ts", gap="1 hour",
        order_tiebreak="event_id", type_col="event_type",
    )


# r12 QUEUE CANDIDATE (the r11 queue closed at 34 — session 7):
#   "session_type_pmi": Query(q_session_type_pmi, SESSION_PMI_ORACLE),


def q_user_type_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral entropy over event types: the bot/script
    screen (near-zero entropy = one action on repeat) and engagement
    spread census, one stacked pair of map-combined aggregations
    (operators/temporal.py:user_type_entropy)."""
    return T.user_type_entropy(load_table(spark, sf_dir, "events"))


# r12 QUEUE CANDIDATE (session 9):
#   "user_type_entropy": Query(
#       q_user_type_entropy, T.sql_user_type_entropy()),


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (Hughes 1994 — the classic behavioral triage):
    per user, recency (days since last event, against the corpus max),
    frequency (event count), monetary (value sum), each quartile-scored
    1-4 — '444' is the most-recent/most-active/highest-value cell.
    Quartiles are EXACT global ntiles over total orders computed with
    the distributed range-partition ranker (operators/rank.py), never a
    single-task window; the corpus max timestamp is one broadcast
    scalar."""
    from hash_db_spark.operators.rank import ntile_global

    ev = load_table(spark, sf_dir, "events")
    cmax = ev.agg(F.max(F.to_date("ts")).alias("cmax"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("value"), 2).alias("monetary"),
        )
        .crossJoin(F.broadcast(cmax))
        .select(
            "user_id",
            F.datediff("cmax", "last_day").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    r = ntile_global(
        per_user,
        [F.col("recency_days").desc(), F.col("user_id").asc()],
        n=4,
        out="r_q",
    )
    f = ntile_global(
        r,
        [F.col("frequency").asc(), F.col("user_id").asc()],
        n=4,
        out="f_q",
    )
    m = ntile_global(
        f,
        [F.col("monetary").asc(), F.col("user_id").asc()],
        n=4,
        out="m_q",
    )
    return m.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        "r_q",
        "f_q",
        "m_q",
        F.concat(
            F.col("r_q").cast("string"),
            F.col("f_q").cast("string"),
            F.col("m_q").cast("string"),
        ).alias("segment"),
    )


RFM_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         date_diff('day', max(CAST(ts AS DATE)),
                   (SELECT max(CAST(ts AS DATE)) FROM events))
           AS recency_days,
         count(*) AS frequency,
         round(sum(value), 2) AS monetary
  FROM events GROUP BY user_id
)
SELECT user_id, recency_days, frequency, monetary,
       CAST(ntile(4) OVER (ORDER BY recency_days DESC, user_id ASC) AS INT)
         AS r_q,
       CAST(ntile(4) OVER (ORDER BY frequency ASC, user_id ASC) AS INT)
         AS f_q,
       CAST(ntile(4) OVER (ORDER BY monetary ASC, user_id ASC) AS INT)
         AS m_q,
       CAST(ntile(4) OVER (ORDER BY recency_days DESC, user_id ASC) AS VARCHAR)
       || CAST(ntile(4) OVER (ORDER BY frequency ASC, user_id ASC) AS VARCHAR)
       || CAST(ntile(4) OVER (ORDER BY monetary ASC, user_id ASC) AS VARCHAR)
         AS segment
FROM per_user
"""


# r13 QUEUE CANDIDATE (session 9; the r12 queue is closed):
#   "rfm_segments": Query(q_rfm_segments, RFM_ORACLE),


# The QUERIES literal lives at module tail so every registered fn is
# already bound; compute_reverify explodes it per-entry either way.
QUERIES = {
    "events_hourly_profile": Query(q_hourly_profile, HOURLY_PROFILE_ORACLE),
    "decayed_activity": Query(q_decayed_activity, DECAYED_ORACLE),
    "funnel_stages": Query(q_funnel_stages, T.sql_funnel(FUNNEL_STEPS)),
    "cohort_retention": Query(q_cohort_retention, T.sql_cohort_retention()),
    "asof_join": Query(q_asof_join, ASOF_ORACLE),
    "asof_tolerance": Query(q_asof_tolerance, ASOF_TOL_ORACLE),
    "asof_forward": Query(q_asof_forward, ASOF_FWD_ORACLE),
    "asof_nearest": Query(q_asof_nearest, ASOF_NEAREST_ORACLE),
    "interval_merge": Query(q_interval_merge, INTERVAL_MERGE_ORACLE),
    "interval_coverage": Query(
        q_interval_coverage, INTERVAL_COVERAGE_ORACLE
    ),
    "range_join": Query(q_range_join, RANGE_ORACLE),
    "interval_bin_join": Query(q_interval_bin_join, INTERVAL_BIN_ORACLE),
    "ts_similar_users": Query(
        q_ts_similar_users, T.sql_similar_activity_users(probe_user=42, k=10)
    ),
    "sessionize": Query(q_sessionize, SESSIONIZE_ORACLE),
    "tumbling_daily": Query(q_tumbling_daily, TUMBLING_ORACLE),
    "sliding_2d": Query(q_sliding_2d, SLIDING_ORACLE),
    "stream_tumbling_daily": Query(q_stream_tumbling_daily, TUMBLING_ORACLE),
    "stream_dedup": Query(
        q_stream_dedup,
        "SELECT DISTINCT user_id, event_type FROM events",
    ),
    "stream_dedup_within_wm": Query(
        q_stream_dedup_within_wm,
        "SELECT DISTINCT user_id, event_type FROM events",
    ),
    "stream_mv_join": Query(q_stream_mv_join, STREAM_MV_ORACLE),
    "stream_stream_join": Query(q_stream_stream_join, STREAM_STREAM_ORACLE),
    # registered r10 (queued r09 under the VERDICT r08 #1 throttle):
    "event_transitions": Query(
        q_event_transitions, T.sql_event_transitions()),
    # registered r11 (queued r10 under the VERDICT r08 #1 throttle):
    "event_rate_anomalies": Query(
        q_event_rate_anomalies, EVENT_RATE_ANOM_ORACLE
    ),
    "session_paths_topk": Query(q_session_paths_topk, SESSION_PATHS_ORACLE),
    "ewma_alerts": Query(q_ewma_alerts, T.sql_ewma_alerts()),
}
