"""Temporal operators: as-of join, range join, sessionization, windowed
aggregation (batch forms; streaming counterparts in streaming/windows.py).

The reference's only temporal capability is lexicographic timestamp range
scans (/root/reference/hash-db.py:100-101). These operators are the Spark
"free wins plus": standard time-series analytics the SQL surface exposes.

Scale notes:
- the as-of join is the union+window merge (no per-row subquery, no
  nested-loop): both sides shuffle ONCE on the key, then a single
  sort-within-partition forward-fills the latest right row. This is the
  only as-of formulation that survives 100 TB — a theta-join
  (r.t <= l.t) would be a broadcast nested loop.
- the range join is an equijoin on key with the time predicate applied
  inside the join — never a pure interval cross join.
- sessionization is two windows over one (user, ts) sort — one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the nearest right row on
    the same key — ``backward``: latest with ``right_time <= left_time``
    (DuckDB ``ASOF JOIN`` semantics, inclusive); ``forward``: earliest
    with ``right_time >= left_time``. ``tolerance`` (e.g. "15 minutes")
    bounds the match distance — beyond it the payload stays NULL (the
    pandas ``merge_asof(tolerance=...)`` contract). Unmatched left rows
    keep NULLs.

    Implementation: tag and union both sides, sort by (key, time, side)
    with right rows first on ties — time ascending for backward,
    descending for forward — then ``last(payload, ignorenulls)`` over an
    unbounded-preceding window forward-fills; the matched right
    timestamp rides along so the tolerance check is a post-hoc column
    predicate. Still ONE shuffle regardless of options.
    """
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_right"),
        "*",
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_right"),
        F.col(right_time).alias("__r___mt"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    t_order = (
        F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    )
    # Fill ONE struct of (matched time, payload...) atomically: filling
    # time and payload with independent last(ignorenulls) calls lets a
    # NULL payload in the matched row be papered over by a STALE older
    # row's payload. The struct is NULL only on left rows (skipped by
    # ignorenulls); its fields keep the matched row's values, NULLs
    # included. A NULL left_time matches nothing (merge_asof contract) —
    # without the guard the window frame would still hand it a fill.
    # Symmetrically, a NULL right_time row is never a match candidate:
    # it sorts nulls-first in the ascending window and would otherwise
    # donate its payload (with __mt NULL, so the tolerance predicate
    # also evaluates NULL) to left rows that should stay unmatched.
    cand = F.when(
        (F.col("__is_right") == 1) & F.col("__r___mt").isNotNull(),
        F.struct(
            F.col("__r___mt").alias("mt"),
            *[F.col(f"__r_{c}").alias(c) for c in right_payload],
        ),
    )
    # cand rides the window ORDER as the final key: several right rows
    # sharing one (key, right_time) would otherwise tie completely and
    # the fill would take whichever the shuffle ordered last — with the
    # struct ascending, ties resolve deterministically to the GREATEST
    # payload tuple (merge_intervals/sessionize demand an explicit
    # tiebreak for the same reason).
    w = (
        Window.partitionBy("__k")
        .orderBy(t_order, F.col("__is_right").desc(), cand.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill_cols = ["__mt", *[f"asof_{c}" for c in right_payload]]
    m = F.when(
        F.col("__t").isNotNull(),
        F.last(cand, ignorenulls=True).over(w),
    )
    filled = unioned.select(
        "*",
        m.getField("mt").alias("__mt"),
        *[m.getField(c).alias(f"asof_{c}") for c in right_payload],
    )
    if tolerance is not None:
        tol = F.expr(f"INTERVAL {tolerance}")
        # Evaluate the predicate against a preserved copy of the matched
        # timestamp so each column's null-out is independent of the order
        # fill_cols is processed in (nulling __mt first must not be what
        # makes the payload columns go NULL).
        filled = filled.withColumn("__in_tol",
            F.col("__mt") >= F.col("__t") - tol
            if direction == "backward"
            else F.col("__mt") <= F.col("__t") + tol,
        )
        for c in fill_cols:
            filled = filled.withColumn(
                c, F.when(F.col("__in_tol"), F.col(c))
            )
        filled = filled.drop("__in_tol")
    return filled.filter(F.col("__is_right") == 0).drop(
        "__k", "__t", "__is_right", "__mt", "__r___mt",
        *[f"__r_{c}" for c in right_payload],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
) -> DataFrame:
    """As-of with ``direction='nearest'`` (the pandas ``merge_asof``
    third direction): for each left row, the right row minimizing
    |right_time - left_time|, ties broken backward.

    Implementation: the same tag-and-union as ``asof_join``, but BOTH
    fill directions ride the one shuffle — two Windows over the same
    key partition (ascending for the backward fill, descending for the
    forward fill; Spark re-sorts within partitions, no second
    exchange), then a per-row interval comparison picks the closer
    side. NULL on one side falls back to the other."""
    lt = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(0).alias("__is_right"),
        "*",
    )
    rt = right.select(
        F.col(key).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(1).alias("__is_right"),
        F.col(right_time).alias("__r___mt"),
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # Atomic struct fill + NULL-left-time guard: see asof_join. Without
    # the struct, a NULL payload in the matched row is papered over by a
    # stale older row; without the guard, a NULL left_time sorts last in
    # the descending window and spuriously "matches" the minimum right
    # time. NULL right_time rows are excluded as match candidates for
    # the same reason as in asof_join.
    pstruct = F.when(
        (F.col("__is_right") == 1) & F.col("__r___mt").isNotNull(),
        F.struct(
            F.col("__r___mt").alias("mt"),
            *[F.col(f"__r_{c}").alias(c) for c in right_payload],
        ),
    )
    # pstruct as the final window key: ties on (key, right_time)
    # resolve deterministically to the greatest payload tuple in BOTH
    # directions (see asof_join).
    wb = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_right").desc(), pstruct.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").desc(), F.col("__is_right").desc(), pstruct.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    guard = F.col("__t").isNotNull()
    mb = F.when(guard, F.last(pstruct, ignorenulls=True).over(wb))
    mf = F.when(guard, F.last(pstruct, ignorenulls=True).over(wf))
    filled = unioned.select("*", mb.alias("__mb"), mf.alias("__mf"))
    tb, tf = F.col("__mb.mt"), F.col("__mf.mt")
    use_b = F.col("__mf").isNull() | (
        F.col("__mb").isNotNull()
        & ((F.col("__t") - tb) <= (tf - F.col("__t")))
    )
    picked = [
        F.when(use_b, F.col(f"__mb.{c}"))
        .otherwise(F.col(f"__mf.{c}"))
        .alias(f"asof_{c}")
        for c in right_payload
    ]
    keep = [c for c in left.columns]
    return filled.filter(F.col("__is_right") == 0).select(*keep, *picked)


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lower: str,
    upper: str,
) -> DataFrame:
    """Pairs with equal key and ``left_time - lower <= right_time <=
    left_time + upper`` (interval literals like '1 hour'). The key
    equijoin carries the shuffle; the time band is a join-side filter."""
    lo = F.expr(f"INTERVAL {lower}")
    hi = F.expr(f"INTERVAL {upper}")
    lcol, rcol = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    return (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (rcol >= lcol - lo)
            & (rcol <= lcol + hi),
        )
    )


def merge_intervals(
    df: DataFrame,
    key: str,
    start: str,
    end: str,
    tiebreak: str,
) -> DataFrame:
    """Coalesce overlapping/touching [start, end) intervals per key into
    islands — the interval-union operator (uptime stitching, span
    coverage). Returns (key, merged_start, merged_end, n_intervals).

    Classic islands formulation: sort per key, an interval starts a new
    island when its start exceeds the running max end of everything
    before it; the cumulative island count labels rows; one groupBy
    merges. Single shuffle on the key; windows ordered within
    partitions. ``tiebreak`` makes the order total so both engines
    number islands identically."""
    order = [
        F.col(start).asc(), F.col(end).asc(), F.col(tiebreak).asc()
    ]
    w_prev = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max = F.max(end).over(w_prev)
    new_island = F.when(
        prev_max.isNull() | (F.col(start) > prev_max), 1
    ).otherwise(0)
    labeled = df.withColumn(
        "__island", F.sum(new_island).over(w_cum)
    )
    return labeled.groupBy(key, "__island").agg(
        F.min(start).alias("merged_start"),
        F.max(end).alias("merged_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    ).drop("__island")


def sessionize(
    events: DataFrame,
    key: str,
    time: str,
    gap: str,
    order_tiebreak: str,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    previous event of the same key exceeds ``gap``. Returns per-session
    (key, session_id, n_events, session_start, session_end); session_id
    numbers sessions per key from 1 in time order."""
    w = Window.partitionBy(key).orderBy(
        F.col(time).asc(), F.col(order_tiebreak).asc()
    )
    gap_i = F.expr(f"INTERVAL {gap}")
    flagged = events.withColumn(
        "__new",
        F.when(
            F.lag(time).over(w).isNull()
            | (F.col(time) > F.lag(time).over(w) + gap_i),
            1,
        ).otherwise(0),
    )
    cum = Window.partitionBy(key).orderBy(
        F.col(time).asc(), F.col(order_tiebreak).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessioned = flagged.withColumn("session_id", F.sum("__new").over(cum))
    return (
        sessioned.groupBy(key, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(time).alias("session_start"),
            F.max(time).alias("session_end"),
        )
    )


def tumbling_agg(
    events: DataFrame,
    time: str,
    duration: str,
    group_cols: list[str],
    aggs: list[Column],
) -> DataFrame:
    """Tumbling event-time windows via the built-in window() function —
    identical semantics to the Structured Streaming version
    (streaming/windows.py), which is the point: batch and stream share
    one definition. Emits win_start/win_end columns."""
    out = events.groupBy(
        F.window(F.col(time), duration).alias("win"), *group_cols
    ).agg(*aggs)
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        *[c for c in out.columns if c != "win"],
    )


def point_in_interval_join(
    points: DataFrame,
    p_time: str,
    intervals: DataFrame,
    i_start: str,
    i_end: str,
    bin_width: str = "1 day",
) -> DataFrame:
    """Keyless point-in-interval join WITHOUT a nested-loop theta join:
    both sides map to a time grid — a point to its one bin, an interval
    to every bin it touches — candidates meet on the bin equijoin, and
    the exact containment predicate filters. A point meets an interval
    in exactly one bin (its own), so no dedupe step is needed.

    Shuffle is O(points + intervals x avg_bins_per_interval); without
    binning Spark can only BroadcastNestedLoopJoin a keyless range
    predicate, which dies when neither side broadcasts. Choose
    ``bin_width`` near the typical interval length: wider bins -> fewer
    replicated interval rows but more false candidates per bin.

    Returns points x matching-interval columns (inner join).
    """
    bw = F.expr(f"INTERVAL {bin_width}")
    # bin index = epoch seconds div bin seconds (computed via date math so
    # it works for any interval literal)
    binsec = F.unix_timestamp(
        F.to_timestamp(F.lit("1970-01-01 00:00:00")) + bw
    ) - F.unix_timestamp(F.to_timestamp(F.lit("1970-01-01 00:00:00")))
    p = points.withColumn(
        "__bin", (F.unix_timestamp(F.col(p_time)) / binsec).cast("long")
    )
    iv = intervals.withColumn(
        "__bins",
        F.sequence(
            (F.unix_timestamp(F.col(i_start)) / binsec).cast("long"),
            (F.unix_timestamp(F.col(i_end)) / binsec).cast("long"),
        ),
    ).withColumn("__bin", F.explode("__bins")).drop("__bins")
    return (
        p.join(iv, "__bin")
        .filter(
            (F.col(p_time) >= F.col(i_start)) & (F.col(p_time) <= F.col(i_end))
        )
        .drop("__bin")
    )


def similar_activity_users(
    events: DataFrame,
    probe_user: int,
    k: int = 10,
    time: str = "ts",
    user: str = "user_id",
) -> DataFrame:
    """Time-series similarity search: which users' daily activity series
    correlate most with a probe user's (Pearson corr over the days both
    were active). The distributed-top-k-similarity-search shape: the
    probe's series is a tiny broadcast; the corpus series stream joins it
    on the day key, one aggregation computes corr per user, and the
    result is per-partition top-k (TakeOrdered), never a global sort.

    Returns (user_id, days, r) — days = common active days, r = corr at
    6dp — ordered by (r desc, user asc), self excluded; users with
    undefined correlation (constant series) are filtered on both engines.
    """
    daily = events.groupBy(
        F.col(user).alias("uid"), F.date_trunc("day", F.col(time)).alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    probe = daily.filter(F.col("uid") == probe_user).select(
        "day", F.col("n").alias("pn")
    )
    return (
        daily.filter(F.col("uid") != probe_user)
        .join(F.broadcast(probe), "day")
        .groupBy(F.col("uid").alias(user))
        .agg(
            F.count(F.lit(1)).alias("days"),
            F.round(F.corr("n", "pn"), 6).alias("r"),
        )
        .filter(F.col("r").isNotNull())
        .orderBy(F.col("r").desc(), F.col(user).asc())
        .limit(k)
    )


def sql_similar_activity_users(
    probe_user: int, k: int = 10, table: str = "events"
) -> str:
    return f"""
WITH daily AS (
  SELECT user_id AS uid, date_trunc('day', ts) AS day, count(*) AS n
  FROM {table} GROUP BY 1, 2
),
probe AS (SELECT day, n AS pn FROM daily WHERE uid = {probe_user}),
scored AS (
  SELECT d.uid AS user_id, count(*) AS days, round(corr(d.n, p.pn), 6) AS r
  FROM daily d JOIN probe p USING (day)
  WHERE d.uid <> {probe_user}
  GROUP BY d.uid
)
SELECT user_id, days, r FROM scored
WHERE r IS NOT NULL
ORDER BY r DESC, user_id ASC
LIMIT {k}
"""


# --- funnel analysis --------------------------------------------------------


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Ordered-funnel conversion: one row with, for each step i, the
    number of users whose events contain step 1..i in strict time order
    (columns s1_users, s2_users, ...).

    ONE shuffle total: events group to their user, the per-user event
    list is sorted and folded left-to-right with a built-in higher-order
    ``aggregate`` (state = the first qualifying timestamp per stage), and
    the stage flags collapse in a map-side-combinable global count. The
    per-user fold touches each event once — no per-stage self-join, which
    at 100 TB would be len(steps) corpus shuffles instead of one. The HOF
    runs interpreted, but over per-user arrays, not the corpus width.
    """
    evs = df.select(
        F.col(user_col).alias("u"),
        F.struct(
            F.col(time_col).alias("ts"),
            F.col(tiebreak).alias("tb"),
            F.col(type_col).alias("tp"),
        ).alias("e"),
    )
    k = len(steps)
    init = F.struct(
        *[F.lit(None).cast("timestamp").alias(f"t{i}") for i in range(1, k + 1)]
    )

    def fold(acc, e):
        fields = []
        for i in range(1, k + 1):
            t = acc[f"t{i}"]
            cond = t.isNull() & (e["tp"] == steps[i - 1])
            if i > 1:
                prev = acc[f"t{i-1}"]
                cond = cond & prev.isNotNull() & (e["ts"] > prev)
            fields.append(F.when(cond, e["ts"]).otherwise(t).alias(f"t{i}"))
        return F.struct(*fields)

    per_user = evs.groupBy("u").agg(
        F.aggregate(
            F.sort_array(F.collect_list("e")), init, fold
        ).alias("f")
    )
    return per_user.agg(
        *[
            F.count(F.col(f"f.t{i}")).alias(f"s{i}_users")
            for i in range(1, k + 1)
        ]
    )


def sql_funnel(
    steps: list[str],
    table: str = "events",
    user_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
) -> str:
    """Oracle via chained min-qualifying-timestamp CTEs — a different
    formulation (per-stage joins) that must agree with the fold."""
    ctes = [
        f"""s1 AS (
  SELECT {user_col} AS u, min({time_col}) AS t
  FROM {table} WHERE {type_col} = '{steps[0]}' GROUP BY 1
)"""
    ]
    for i in range(2, len(steps) + 1):
        ctes.append(
            f"""s{i} AS (
  SELECT e.{user_col} AS u, min(e.{time_col}) AS t
  FROM {table} e JOIN s{i-1} p ON e.{user_col} = p.u
  WHERE e.{type_col} = '{steps[i-1]}' AND e.{time_col} > p.t
  GROUP BY 1
)"""
        )
    counts = ", ".join(
        f"(SELECT count(*) FROM s{i}) AS s{i}_users"
        for i in range(1, len(steps) + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT {counts}"


# --- cohort retention -------------------------------------------------------


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """(cohort_day, day_offset, users): distinct active users per first-
    seen-day cohort and day offset — the standard retention triangle.

    Two shuffles: the first-seen aggregate (map-side partial min) and
    the (cohort, offset) distinct-count; the cohort frame joins back on
    the same user key, so with bucketed storage the join is co-located.
    """
    firsts = df.groupBy(F.col(user_col).alias("u")).agg(
        F.date_trunc("day", F.min(time_col)).alias("cohort_day")
    )
    return (
        df.select(
            F.col(user_col).alias("u"),
            F.date_trunc("day", F.col(time_col)).alias("day"),
        )
        .join(firsts, "u")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .agg(F.countDistinct("u").alias("users"))
    )


def sql_cohort_retention(
    table: str = "events",
    user_col: str = "user_id",
    time_col: str = "ts",
) -> str:
    return f"""
WITH firsts AS (
  SELECT {user_col} AS u,
         date_trunc('day', min({time_col})) AS cohort_day
  FROM {table} GROUP BY 1
),
activity AS (
  SELECT {user_col} AS u, date_trunc('day', {time_col}) AS day FROM {table}
)
SELECT CAST(f.cohort_day AS TIMESTAMP) AS cohort_day,
       CAST(date_diff('day', CAST(f.cohort_day AS DATE), CAST(a.day AS DATE))
            AS INT) AS day_offset,
       count(DISTINCT a.u) AS users
FROM activity a JOIN firsts f USING (u)
GROUP BY 1, 2
"""


# --- event-transition matrix -------------------------------------------------


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: (from_type, to_type, n, p) where p = P(to | from) —
    the behavioral fingerprint funnels/retention summarize away, used
    for anomaly detection (a transition that never happens organically)
    and simulation seeding. Order is (ts, event_id) so simultaneous
    events sequence deterministically on both engines.

    Scale shape: ONE shuffle on user_id for the lead() window (each
    user's timeline is one partition's work — no global window), then a
    map-side-combined groupBy whose output is |types|^2 rows; the
    per-from normalization window runs on that tiny matrix, not the
    corpus."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    nxt = (
        events.select(user_col, ts_col, id_col, type_col)
        .withColumn("to_type", F.lead(type_col).over(w))
        .filter(F.col("to_type").isNotNull())
    )
    counts = nxt.groupBy(
        F.col(type_col).alias("from_type"), "to_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    wf = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wf).cast("double"),
            6,
        ).alias("p"),
    )


def sql_event_transitions(
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> str:
    return f"""
WITH nxt AS (
  SELECT {type_col} AS from_type,
         lead({type_col}) OVER (
           PARTITION BY {user_col} ORDER BY {ts_col}, {id_col}
         ) AS to_type
  FROM {table}
),
c AS (
  SELECT from_type, to_type, count(*) AS n
  FROM nxt WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE)
             / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE),
             6) AS p
FROM c
"""


def session_paths(
    events: DataFrame,
    key: str,
    time: str,
    gap: str,
    order_tiebreak: str,
    step_col: str,
) -> DataFrame:
    """(key, session_id, path): each gap-based session's ordered step
    sequence as a '>'-joined string — the sequence-mining primitive
    (top paths, funnel discovery) over the same session definition
    sessionize() aggregates. Order inside a session is total
    (time, tiebreak), so the path string is deterministic.

    Scale shape: one per-key window pass (the sessionize machinery) +
    one (key, session) aggregation; the collect_list is per SESSION —
    bounded by session length, never corpus-sized."""
    w = Window.partitionBy(key).orderBy(
        F.col(time).asc(), F.col(order_tiebreak).asc()
    )
    gap_i = F.expr(f"INTERVAL {gap}")
    flagged = events.withColumn(
        "__new",
        F.when(
            F.lag(time).over(w).isNull()
            | (F.col(time) > F.lag(time).over(w) + gap_i),
            1,
        ).otherwise(0),
    )
    cum = Window.partitionBy(key).orderBy(
        F.col(time).asc(), F.col(order_tiebreak).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessioned = flagged.withColumn("session_id", F.sum("__new").over(cum))
    steps = F.array_sort(
        F.collect_list(
            F.struct(F.col(time), F.col(order_tiebreak), F.col(step_col))
        )
    )
    return (
        sessioned.groupBy(key, "session_id")
        .agg(
            F.array_join(steps.getField(step_col), ">").alias("path"),
        )
    )


def session_paths_topk(
    events: DataFrame,
    key: str,
    time: str,
    gap: str,
    order_tiebreak: str,
    step_col: str,
    k: int = 20,
) -> DataFrame:
    """Top-k most common session paths (n desc, path asc tie-break) —
    the 'what do users actually do' report. Ends in
    TakeOrderedAndProject: no global sort."""
    paths = session_paths(events, key, time, gap, order_tiebreak, step_col)
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    from hash_db_spark.operators.relational import top_k

    return top_k(counts, [F.col("n").desc(), F.col("path").asc()], k)


# --- EWMA control-chart anomaly alerts -----------------------------------------

EWMA_ALPHA = 0.25
EWMA_WINDOW = 16  # truncated-EWMA depth: 0.75^16 < 1% residual weight


def ewma_alerts(
    events: DataFrame,
    alpha: float = EWMA_ALPHA,
    w: int = EWMA_WINDOW,
) -> DataFrame:
    """(event_id, user_id, value, ewma_prev_micro, alert): per-user
    EWMA control chart (Roberts 1959, the classic SPC smoother) over
    event values, truncated to the last ``w`` observations — a
    TRUNCATED ewma is a fixed linear combination of ``w`` lag columns,
    so it is exactly expressible in both engines with a FIXED
    evaluation order (no sequential recurrence, no prefix-power trick
    whose decay^-n overflows on long histories; 0.75^16 leaves < 1%
    residual weight, so truncation error is below the alert band).
    ``ewma_prev`` smooths STRICTLY PRIOR events (lags 1..w,
    renormalized over the lags that exist); an event alerts when it
    departs its own forecast by the relative band
    |x - ewma| > 1.5|ewma| + 1. First event per user never alerts.

    Scale shape: ONE user-keyed shuffle (the lag window); the w lag
    columns are a map-side projection after the sort — per-user
    history length never matters.

    The lags are NAMED intermediate columns on purpose: Catalyst does not
    deduplicate repeated ``lag(...).over(...)`` subtrees, so inlining
    ``ewma_prev`` (which references every lag twice) at each of its ~5 use
    sites exploded the Window operator to 320 frame processors per row
    (20x the work and a 324-column window buffer). Naming the lags pins
    the Window node at exactly ``w`` expressions; the arithmetic keeps the
    identical left-to-right term order, so results are bit-identical."""
    from pyspark.sql import Window

    from hash_db_spark.operators.curation import micro_col

    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = events.select(
        "event_id",
        "user_id",
        "value",
        *[
            F.lag("value", j).over(win).alias(f"_lag{j}")
            for j in range(1, w + 1)
        ],
    )
    num = F.lit(0.0)
    den = F.lit(0.0)
    for j in range(1, w + 1):
        c = alpha * (1.0 - alpha) ** (j - 1)
        lj = F.col(f"_lag{j}")
        num = num + F.when(lj.isNotNull(), lj * F.lit(c)).otherwise(0.0)
        den = den + F.when(lj.isNotNull(), F.lit(c)).otherwise(0.0)
    ewma_prev = F.when(den > 0, num / den)
    alert = F.when(
        ewma_prev.isNull(), F.lit(False)
    ).otherwise(
        F.abs(F.col("value") - ewma_prev)
        > F.lit(1.5) * F.abs(ewma_prev) + F.lit(1.0)
    )
    return lagged.select(
        "event_id",
        "user_id",
        "value",
        micro_col(ewma_prev).alias("ewma_prev_micro"),
        alert.alias("alert"),
    )


def sql_ewma_alerts(
    table: str = "events",
    alpha: float = EWMA_ALPHA,
    w: int = EWMA_WINDOW,
) -> str:
    """Oracle twin: identical lag set, identical left-to-right term
    order, identical micro quantization point."""
    from hash_db_spark.operators.curation import sql_micro

    win = "OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    num_terms = ["0.0"]
    den_terms = ["0.0"]
    for j in range(1, w + 1):
        c = repr(alpha * (1.0 - alpha) ** (j - 1))
        lj = f"lag(value, {j}) {win}"
        num_terms.append(
            f"CASE WHEN {lj} IS NOT NULL THEN {lj} * {c} ELSE 0.0 END"
        )
        den_terms.append(f"CASE WHEN {lj} IS NOT NULL THEN {c} ELSE 0.0 END")
    num = " + ".join(num_terms)
    den = " + ".join(den_terms)
    return f"""
WITH lagged AS (
  SELECT event_id, user_id, value,
         CASE WHEN ({den}) > 0 THEN ({num}) / ({den}) END AS ewma_prev
  FROM {table}
)
SELECT event_id, user_id, value,
       {sql_micro('ewma_prev')} AS ewma_prev_micro,
       CASE WHEN ewma_prev IS NULL THEN FALSE
            ELSE abs(value - ewma_prev) > 1.5 * abs(ewma_prev) + 1.0
       END AS alert
FROM lagged
"""


def session_type_pmi(
    events: DataFrame,
    key: str,
    time: str,
    gap: str,
    order_tiebreak: str,
    type_col: str,
) -> DataFrame:
    """(type_a, type_b, n_ab, pmi_micro): pointwise mutual information
    between event-type pairs co-occurring in the same gap-based session
    (Church & Hanks 1990's association measure over the sessionize()
    session definition) — which behaviors travel together, the signal
    behind next-action suggestion and funnel discovery.

    PMI(a,b) = ln(P(a,b) / (P(a)P(b))) over session-level presence:
    all four counts (sessions, sessions-with-a, -with-b, -with-both)
    are exact integers; the single ln runs once per surviving pair and
    is micro-quantized. Pairs come from a session-keyed self-join of
    the DISTINCT (session, type) presence rows — bounded by (session
    count x type-alphabet^2), never by event count; a < b
    deduplicates the symmetric pair.

    Scale shape: one window pass for session labels, one distinct,
    one session-keyed pair join, one tiny (type, type) reduction."""
    w = Window.partitionBy(key).orderBy(
        F.col(time).asc(), F.col(order_tiebreak).asc()
    )
    gap_i = F.expr(f"INTERVAL {gap}")
    flagged = events.withColumn(
        "__new",
        F.when(
            F.lag(time).over(w).isNull()
            | (F.col(time) > F.lag(time).over(w) + gap_i),
            1,
        ).otherwise(0),
    )
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    labeled = flagged.withColumn("session_id", F.sum("__new").over(cum))
    pres = (
        labeled.select(key, "session_id", F.col(type_col).alias("t"))
        .distinct()
        .localCheckpoint(eager=True)  # feeds three counts + the pair join
    )
    n_sessions = pres.select(key, "session_id").distinct().count()
    per_type = pres.groupBy("t").agg(F.count(F.lit(1)).alias("n_t"))
    a = pres.select(key, "session_id", F.col("t").alias("ta"))
    b = pres.select(key, "session_id", F.col("t").alias("tb"))
    pairs = (
        a.join(b, [key, "session_id"])
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    from hash_db_spark.operators.curation import micro_col

    joined = (
        pairs.join(
            F.broadcast(per_type.select(F.col("t").alias("ta"),
                                        F.col("n_t").alias("n_a"))),
            "ta",
        )
        .join(
            F.broadcast(per_type.select(F.col("t").alias("tb"),
                                        F.col("n_t").alias("n_b"))),
            "tb",
        )
    )
    pmi = F.log(
        (F.col("n_ab").cast("double") * F.lit(float(n_sessions)))
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    return joined.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("n_ab").cast("long").alias("n_ab"),
        micro_col(pmi).alias("pmi_micro"),
    ).orderBy("type_a", "type_b")


def user_type_entropy(
    events: DataFrame, key: str = "user_id", type_col: str = "event_type"
) -> DataFrame:
    """(user_id, n_events, n_types, type_entropy): Shannon entropy
    (bits) of each user's event-type distribution — the behavioral-
    diversity census. Scripted/bot traffic collapses to near-zero
    entropy (one action repeated); engaged users spread mass across
    types. The log-domain identity H = log2(n) - sum(c*log2(c))/n
    keeps everything one pass over (user, type) counts — two stacked
    map-combined aggregations, no windows, no joins; the same shape
    at 10^9 users as at 10^3."""
    cnt = events.groupBy(
        F.col(key).alias("user_id"), F.col(type_col).alias("t")
    ).agg(F.count(F.lit(1)).alias("c"))
    return cnt.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(
            F.log2(F.sum("c"))
            - F.sum(F.col("c") * F.log2("c")) / F.sum("c"),
            6,
        ).alias("type_entropy"),
    )


def sql_user_type_entropy(
    table: str = "events", key: str = "user_id", type_col: str = "event_type"
) -> str:
    return f"""
SELECT user_id, sum(c) AS n_events, count(*) AS n_types,
       round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS type_entropy
FROM (
  SELECT {key} AS user_id, {type_col} AS t, count(*) AS c
  FROM {table} GROUP BY 1, 2
)
GROUP BY user_id
"""
