"""Unit tests: as-of join, range join, sessionization, and streaming
windows on small controlled event data."""

from __future__ import annotations

from datetime import datetime

import pytest
import pyspark.sql.functions as F

from hash_db_spark.operators import temporal as T
from hash_db_spark.streaming import windows as W


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", ts("2024-01-01T10:00:05")),
            (2, "A", ts("2024-01-01T10:01:00")),
            (3, "B", ts("2024-01-01T10:00:30")),
            (4, "C", ts("2024-01-01T10:00:00")),  # no quotes for C
        ],
        ["trade_id", "sym", "ts"],
    )
    quotes = spark.createDataFrame(
        [
            (101, "A", ts("2024-01-01T10:00:00")),
            (102, "A", ts("2024-01-01T10:00:05")),  # exactly at trade 1
            (103, "A", ts("2024-01-01T10:00:59")),
            (104, "B", ts("2024-01-01T10:00:00")),
            (105, "B", ts("2024-01-01T10:00:31")),  # after trade 3
        ],
        ["quote_id", "sym", "ts"],
    )
    return trades, quotes


def test_asof_join_semantics(trades_quotes):
    trades, quotes = trades_quotes
    got = {
        r.trade_id: r.asof_quote_id
        for r in T.asof_join(
            trades, quotes, key="sym", left_time="ts", right_time="ts",
            right_payload=["quote_id"],
        ).collect()
    }
    assert got == {
        1: 102,   # inclusive: quote at the same instant wins
        2: 103,   # latest at-or-before
        3: 104,   # 105 is in the future
        4: None,  # no quotes for C → NULL, row kept
    }


def test_range_join_band(trades_quotes):
    trades, quotes = trades_quotes
    tr = trades.select("trade_id", "sym", F.col("ts").alias("tts"))
    qt = quotes.select("quote_id", "sym", F.col("ts").alias("qts"))
    got = {
        (r.trade_id, r.quote_id)
        for r in T.range_join(
            tr, qt, key="sym", left_time="tts", right_time="qts",
            lower="30 seconds", upper="0 seconds",
        ).collect()
    }
    # quote 105 (10:00:31) is after trade 3 (10:00:30) → excluded by upper=0.
    assert got == {(1, 101), (1, 102), (2, 103), (3, 104)}


def test_sessionize_gap(spark):
    ev = spark.createDataFrame(
        [
            (1, 7, ts("2024-01-01T10:00:00")),
            (2, 7, ts("2024-01-01T10:20:00")),   # same session (gap 30m)
            (3, 7, ts("2024-01-01T11:30:00")),   # new session
            (4, 8, ts("2024-01-01T10:00:00")),   # other user
        ],
        ["event_id", "user_id", "ts"],
    )
    got = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
        for r in T.sessionize(
            ev, key="user_id", time="ts", gap="30 minutes",
            order_tiebreak="event_id",
        ).collect()
    }
    assert got[(7, 1)] == (2, ts("2024-01-01T10:00:00"), ts("2024-01-01T10:20:00"))
    assert got[(7, 2)][0] == 1
    assert got[(8, 1)][0] == 1


def test_stream_session_window_matches_gap_semantics(spark, sf_dir):
    """session_window (streaming-native) agrees with batch sessionize:
    win_start = session_start, win_end = session_end + gap."""
    from hash_db_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    stream_style = W.session_windows(ev, "30 minutes")  # batch exec of same expr
    batch = T.sessionize(
        ev, key="user_id", time="ts", gap="30 minutes", order_tiebreak="event_id"
    )
    a = {
        (r.user_id, r.win_start, r.win_end, r.n_events)
        for r in stream_style.collect()
    }
    b = {
        (
            r.user_id,
            r.session_start,
            # session_window's end = last event + gap
            r.session_end + __import__("datetime").timedelta(minutes=30),
            r.n_events,
        )
        for r in batch.collect()
    }
    assert a == b


def test_stream_watermark_append_mode(spark, sf_dir):
    """Windowed agg with watermark in append mode emits only finalized
    windows — all but those within the watermark horizon of max ts."""
    stream = W.read_events_stream(spark, sf_dir)
    agg = W.tumbling_counts(W.with_watermark(stream, "1 hour"), "1 day")
    out = W.run_stream_to_memory(agg, output_mode="append")
    batch = W.tumbling_counts(
        __import__("hash_db_spark.catalog", fromlist=["load_table"]).load_table(
            spark, sf_dir, "events"
        ),
        "1 day",
    )
    n_out, n_batch = out.count(), batch.count()
    # Final watermark = max_ts - 1h, so at most the last day's windows are
    # withheld; everything emitted must be a subset of the batch result.
    assert 0 < n_out <= n_batch
    joined = out.join(
        batch, ["win_start", "win_end", "event_type", "n", "sum_value"]
    )
    assert joined.count() == n_out


def test_point_in_interval_join_multi_bin(spark):
    """Intervals spanning several grid bins still match each contained
    point exactly once; boundary points (== start or == end) match."""
    import datetime as dt

    from hash_db_spark.operators.temporal import point_in_interval_join

    d = dt.datetime
    points = spark.createDataFrame(
        [
            (1, d(2024, 1, 1, 12)),   # inside iv A (spans 3 days)
            (2, d(2024, 1, 3, 23)),   # inside iv A near end
            (3, d(2024, 1, 10, 0)),   # == start of iv B
            (4, d(2024, 1, 11, 0)),   # == end of iv B
            (5, d(2024, 1, 20, 0)),   # matches nothing
        ],
        "pid long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("A", d(2024, 1, 1, 6), d(2024, 1, 3, 23, 30)),
            ("B", d(2024, 1, 10, 0), d(2024, 1, 11, 0)),
        ],
        "name string, s timestamp, e timestamp",
    )
    got = sorted(
        (r.pid, r.name)
        for r in point_in_interval_join(
            points, "ts", intervals, "s", "e", bin_width="1 day"
        ).collect()
    )
    assert got == [(1, "A"), (2, "A"), (3, "B"), (4, "B")]


def test_asof_tolerance_and_forward(spark):
    import datetime as dt

    t = lambda m: dt.datetime(2024, 1, 1, 10, 0) + dt.timedelta(  # noqa: E731
        minutes=m
    )
    left = spark.createDataFrame(
        [(1, t(0)), (2, t(30))], ["lid", "lts"]
    )
    right = spark.createDataFrame(
        # 9:50 for lid=1 (within 15m); nothing within 15m before 10:30
        [(100, t(-10)), (200, t(45))], ["rid", "rts"]
    )
    from hash_db_spark.operators.temporal import asof_join

    back = {
        r.lid: r.asof_rid
        for r in asof_join(
            left.withColumn("k", F.lit(1)), right.withColumn("k", F.lit(1)),
            key="k", left_time="lts", right_time="rts",
            right_payload=["rid"], tolerance="15 minutes",
        ).collect()
    }
    assert back == {1: 100, 2: None}  # 10:30's latest right (9:50) too old

    fwd = {
        r.lid: r.asof_rid
        for r in asof_join(
            left.withColumn("k", F.lit(1)), right.withColumn("k", F.lit(1)),
            key="k", left_time="lts", right_time="rts",
            right_payload=["rid"], direction="forward",
        ).collect()
    }
    assert fwd == {1: 200, 2: 200}  # earliest right at-or-after each left


def test_stream_interval_join_matches_batch(spark, sf_dir):
    """Watermarked stream-stream interval join == the batch range join."""
    stream = W.read_events_stream(spark, sf_dir)
    got = W.run_stream_to_memory(
        W.stream_interval_join(stream, lookback="1 hour"),
        output_mode="append",
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    p = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    c = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    batch = p.join(
        c,
        F.expr("pu = cu AND cts >= pts - INTERVAL 1 HOUR AND cts <= pts"),
    ).select("purchase_id", "click_id")
    a = {(r.purchase_id, r.click_id) for r in got.collect()}
    b = {(r.purchase_id, r.click_id) for r in batch.collect()}
    assert a == b and len(a) > 0


def test_stream_interval_join_lookback_exceeds_watermark(spark, sf_dir):
    """lookback > watermark is a VALID config: the join-state horizon
    derives from the time-range condition (state kept until the query
    watermark passes cts + lookback), so no in-window rows are lost —
    the stream result still equals the batch range join."""
    stream = W.read_events_stream(spark, sf_dir)
    got = W.run_stream_to_memory(
        W.stream_interval_join(stream, lookback="3 hours", watermark="2 hours"),
        output_mode="append",
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    p = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    c = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    batch = p.join(
        c,
        F.expr("pu = cu AND cts >= pts - INTERVAL 3 HOUR AND cts <= pts"),
    ).select("purchase_id", "click_id")
    a = {(r.purchase_id, r.click_id) for r in got.collect()}
    b = {(r.purchase_id, r.click_id) for r in batch.collect()}
    assert a == b and len(a) > 0


def test_asof_null_payload_not_papered_over(spark):
    """The matched row's NULL payload must come through as NULL, not be
    replaced by a stale older row's value (atomic struct fill)."""
    from datetime import datetime as dt

    left = spark.createDataFrame(
        [(1, "k", dt(2024, 1, 1, 10, 0, 11))], ["id", "sym", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("k", dt(2024, 1, 1, 10, 0, 5), "x"),
            ("k", dt(2024, 1, 1, 10, 0, 10), None),  # matched, NULL payload
        ],
        ["sym", "ts", "val"],
    )
    for fn in (
        lambda: T.asof_join(
            left, right, key="sym", left_time="ts", right_time="ts",
            right_payload=["val"],
        ),
        lambda: T.asof_join_nearest(
            left, right, key="sym", left_time="ts", right_time="ts",
            right_payload=["val"],
        ),
    ):
        rows = fn().collect()
        assert len(rows) == 1
        assert rows[0]["asof_val"] is None, "stale payload leaked"


def test_asof_null_left_time_matches_nothing(spark):
    from datetime import datetime as dt

    left = spark.createDataFrame(
        [(1, "k", None)], "id int, sym string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", dt(2024, 1, 1, 10, 0, 5), "x")], ["sym", "ts", "val"]
    )
    for direction in ("backward", "forward"):
        rows = T.asof_join(
            left, right, key="sym", left_time="ts", right_time="ts",
            right_payload=["val"], direction=direction,
        ).collect()
        assert rows[0]["asof_val"] is None, direction
    rows = T.asof_join_nearest(
        left, right, key="sym", left_time="ts", right_time="ts",
        right_payload=["val"],
    ).collect()
    assert rows[0]["asof_val"] is None, "nearest"


def test_asof_null_right_time_never_matches(spark):
    """A right row with NULL timestamp must not donate its payload: it
    sorts nulls-first in the ascending backward window and, unguarded,
    would fill left rows that should stay unmatched (with __mt NULL, so
    a tolerance predicate would also evaluate NULL, not False)."""
    from datetime import datetime as dt

    left = spark.createDataFrame(
        [(1, "k", dt(2024, 1, 1, 10, 0, 0))], ["id", "sym", "ts"]
    )
    right = spark.createDataFrame(
        [("k", None, "ghost")], "sym string, ts timestamp, val string"
    )
    for direction in ("backward", "forward"):
        rows = T.asof_join(
            left, right, key="sym", left_time="ts", right_time="ts",
            right_payload=["val"], direction=direction,
        ).collect()
        assert rows[0]["asof_val"] is None, direction
        rows = T.asof_join(
            left, right, key="sym", left_time="ts", right_time="ts",
            right_payload=["val"], direction=direction,
            tolerance="15 minutes",
        ).collect()
        assert rows[0]["asof_val"] is None, f"{direction}+tolerance"
    rows = T.asof_join_nearest(
        left, right, key="sym", left_time="ts", right_time="ts",
        right_payload=["val"],
    ).collect()
    assert rows[0]["asof_val"] is None, "nearest"


def test_asof_nearest_picks_closer_side_ties_backward(spark):
    from datetime import datetime as dt

    left = spark.createDataFrame(
        [
            (1, "k", dt(2024, 1, 1, 10, 0, 10)),  # closer to 10:00:12
            (2, "k", dt(2024, 1, 1, 10, 0, 7)),   # tie 10:00:02/10:00:12
        ],
        ["id", "sym", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("k", dt(2024, 1, 1, 10, 0, 2), "early"),
            ("k", dt(2024, 1, 1, 10, 0, 12), "late"),
        ],
        ["sym", "ts", "val"],
    )
    got = {
        r["id"]: r["asof_val"]
        for r in T.asof_join_nearest(
            left, right, key="sym", left_time="ts", right_time="ts",
            right_payload=["val"],
        ).collect()
    }
    assert got == {1: "late", 2: "early"}  # tie -> backward


def test_merge_intervals_edges(spark):
    from datetime import datetime as dt

    iv = spark.createDataFrame(
        [
            # overlapping pair -> one island
            ("a", 1, dt(2024, 1, 1, 10, 0), dt(2024, 1, 1, 10, 30)),
            ("a", 2, dt(2024, 1, 1, 10, 20), dt(2024, 1, 1, 10, 50)),
            # touching (start == prev end) merges
            ("a", 3, dt(2024, 1, 1, 10, 50), dt(2024, 1, 1, 11, 0)),
            # gap -> new island
            ("a", 4, dt(2024, 1, 1, 12, 0), dt(2024, 1, 1, 12, 10)),
            # contained interval must not extend the island
            ("b", 5, dt(2024, 1, 1, 9, 0), dt(2024, 1, 1, 10, 0)),
            ("b", 6, dt(2024, 1, 1, 9, 10), dt(2024, 1, 1, 9, 20)),
        ],
        ["k", "tid", "s", "e"],
    )
    got = sorted(
        (r["k"], r["merged_start"], r["merged_end"], r["n_intervals"])
        for r in T.merge_intervals(iv, "k", "s", "e", "tid").collect()
    )
    assert got == [
        ("a", dt(2024, 1, 1, 10, 0), dt(2024, 1, 1, 11, 0), 3),
        ("a", dt(2024, 1, 1, 12, 0), dt(2024, 1, 1, 12, 10), 1),
        ("b", dt(2024, 1, 1, 9, 0), dt(2024, 1, 1, 10, 0), 2),
    ]


# --- event-transition matrix -------------------------------------------------


def test_event_transitions_hand_computed(spark):
    """Two users, hand-derived matrix: u1 a->b->a, u2 a->b. Transitions:
    a->b x2, b->a x1; P(b|a)=1.0, P(a|b)=0.5... wait u2 contributes
    a->b only, u1 contributes a->b, b->a. So from a: 2x to b (p=1.0);
    from b: 1x to a (p=1.0)."""
    import datetime as dt

    from hash_db_spark.operators.temporal import event_transitions

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 10, "a"),
        (2, t0 + dt.timedelta(minutes=1), 10, "b"),
        (3, t0 + dt.timedelta(minutes=2), 10, "a"),
        (4, t0, 20, "a"),
        (5, t0 + dt.timedelta(minutes=1), 20, "b"),
    ]
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type"]
    )
    got = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in event_transitions(ev).collect()
    }
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}


def test_event_transitions_simultaneous_ties_deterministic(spark):
    """Equal timestamps sequence by event_id — the cross-engine
    determinism contract."""
    import datetime as dt

    from hash_db_spark.operators.temporal import event_transitions

    t0 = dt.datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [(2, t0, 1, "b"), (1, t0, 1, "a"), (3, t0, 1, "c")],
        ["event_id", "ts", "user_id", "event_type"],
    )
    got = {(r.from_type, r.to_type) for r in event_transitions(ev).collect()}
    assert got == {("a", "b"), ("b", "c")}


def test_event_transitions_oracle_parity(spark, sf_dir):
    """Driver-style compare for the r10-queued event_transitions entry,
    plus the stochastic-matrix law: each from-row's probabilities sum
    to 1."""
    import duckdb

    from hash_db_spark.operators.temporal import sql_event_transitions
    from hash_db_spark.queries.temporal_queries import q_event_transitions

    got = sorted(tuple(r) for r in q_event_transitions(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(sql_event_transitions()).fetchall()
    )
    con.close()
    assert got == want and len(got) > 0
    sums = {}
    for f, _, _, p in got:
        sums[f] = sums.get(f, 0.0) + p
    for f, s in sums.items():
        assert abs(s - 1.0) < 1e-4, (f, s)


# --- robust event-rate anomaly screen -----------------------------------------


def test_event_rate_anomalies_flags_planted_outlier(spark):
    """20 ordinary users (4-6 events) + one bot (100 events): exactly
    the bot flags, and the robust baseline (median/MAD) is NOT dragged
    by the outlier the way a mean/stddev screen would be."""
    import datetime as dt

    from hash_db_spark.queries.temporal_queries import q_event_rate_anomalies

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    eid = 0
    for u in range(20):
        for j in range(4 + u % 3):
            rows.append((eid, t0, u, "click", 0.0, "{}"))
            eid += 1
    for j in range(100):
        rows.append((eid, t0, 999, "click", 0.0, "{}"))
        eid += 1
    ev = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import tempfile
    from pathlib import Path

    d = Path(tempfile.mkdtemp(prefix="anomfix"))
    ev.write.mode("overwrite").parquet(str(d / "events.parquet"))
    got = {r.user_id: r for r in q_event_rate_anomalies(spark, str(d)).collect()}
    assert got[999].is_anomaly
    assert all(not got[u].is_anomaly for u in range(20))


def test_event_rate_anomalies_oracle_parity(spark, sf_dir):
    """Driver-style compare for the r11-candidate event_rate_anomalies
    (the uniform fixture legitimately flags nobody — rz still compares
    value-exactly)."""
    import duckdb

    from hash_db_spark.queries.temporal_queries import (
        EVENT_RATE_ANOM_ORACLE,
        q_event_rate_anomalies,
    )

    got = sorted(
        tuple(r) for r in q_event_rate_anomalies(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(EVENT_RATE_ANOM_ORACLE).fetchall()
    )
    con.close()
    assert got == want and len(got) > 0


class TestEwmaAlerts:
    def test_forecast_and_band(self, spark):
        """Hand-checkable: constant series never alerts after warmup;
        a 10x spike against a settled forecast does."""
        from datetime import datetime

        from hash_db_spark.operators import temporal as T

        rows = [
            (i, datetime(2024, 1, 1, 0, i), 1, "t", v, "")
            for i, v in enumerate([10.0, 10.0, 10.0, 10.0, 100.0])
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        got = {r.event_id: r for r in T.ewma_alerts(ev).collect()}
        assert got[0].ewma_prev_micro is None and not got[0].alert
        # constant history: forecast == 10 exactly (weights renormalize)
        assert got[3].ewma_prev_micro == 10_000_000
        assert not got[3].alert
        # spike: |100 - 10| > 1.5*10 + 1
        assert got[4].alert

    def test_oracle_parity_fixture(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.catalog import load_table
        from hash_db_spark.operators import temporal as T

        got = sorted(
            tuple(r)
            for r in T.ewma_alerts(
                load_table(spark, sf_dir, "events")
            ).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS "
            f"SELECT * FROM '{sf_dir}/events.parquet'"
        )
        want = sorted(
            tuple(r) for r in con.execute(T.sql_ewma_alerts()).fetchall()
        )
        con.close()
        assert got == want
        flags = {r[4] for r in got}
        assert flags == {True, False}

    def test_single_shuffle(self, spark, sf_dir):
        from hash_db_spark.catalog import load_table
        from hash_db_spark.operators import temporal as T

        plan = (
            T.ewma_alerts(load_table(spark, sf_dir, "events"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Exchange") == 1  # the user-keyed window sort


class TestSessionPmi:
    def test_known_association(self, spark):
        """Types that always co-occur get positive PMI; types that
        never do are absent from the pair table."""
        from datetime import datetime, timedelta

        from hash_db_spark.operators import temporal as T

        rows = []
        eid = 0
        # 4 sessions for user 1: {a,b} always together
        for s in range(4):
            base = datetime(2024, 1, 1 + s)
            for t, off in (("a", 0), ("b", 1)):
                rows.append((eid, base + timedelta(minutes=off), 1, t, 0.0, ""))
                eid += 1
        # 4 sessions for user 2: {c} alone
        for s in range(4):
            rows.append((eid, datetime(2024, 2, 1 + s), 2, "c", 0.0, ""))
            eid += 1
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        got = {
            (r.type_a, r.type_b): r
            for r in T.session_type_pmi(
                ev, "user_id", "ts", "1 hour", "event_id", "event_type"
            ).collect()
        }
        assert set(got) == {("a", "b")}
        r = got[("a", "b")]
        # P(a,b)=4/8, P(a)=P(b)=4/8 -> pmi = ln(0.5/0.25) = ln 2
        assert r.n_ab == 4
        assert r.pmi_micro == 693147

    def test_oracle_parity_fixture(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.temporal_queries import (
            SESSION_PMI_ORACLE,
            q_session_type_pmi,
        )

        got = [tuple(r) for r in q_session_type_pmi(spark, sf_dir).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS "
            f"SELECT * FROM '{sf_dir}/events.parquet'"
        )
        want = [
            tuple(r) for r in con.execute(SESSION_PMI_ORACLE).fetchall()
        ]
        con.close()
        assert got == want and len(got) > 0


class TestUserTypeEntropy:
    """Behavioral entropy census
    (operators/temporal.py:user_type_entropy)."""

    def test_known_values(self, spark):
        from hash_db_spark.operators.temporal import user_type_entropy

        rows = (
            [(1, "click")] * 8  # bot: one action -> H = 0
            + [(2, "a"), (2, "b"), (2, "c"), (2, "d")]  # uniform 4 -> H = 2
            + [(3, "x")] * 3 + [(3, "y")]  # 3:1 -> H = 2 - 3*log2(3)/4
        )
        df = spark.createDataFrame(rows, ["user_id", "event_type"])
        got = {
            r.user_id: (r.n_events, r.n_types, r.type_entropy)
            for r in user_type_entropy(df).collect()
        }
        import math

        assert got[1] == (8, 1, 0.0)
        assert got[2] == (4, 4, 2.0)
        assert got[3] == (4, 2, round(2 - 3 * math.log2(3) / 4, 6))

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.operators.temporal import sql_user_type_entropy
        from hash_db_spark.queries.temporal_queries import (
            q_user_type_entropy,
        )

        got = sorted(tuple(r) for r in q_user_type_entropy(spark, sf_dir).collect())
        assert len(got) > 0
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(sql_user_type_entropy()).fetchall()
        )
        con.close()
        assert got == want


def test_rfm_segments_oracle_parity_and_laws(spark, sf_dir):
    """Exact-quartile RFM: DuckDB parity plus the quartile laws —
    each score column is 1..4 with near-equal cell counts, and the
    best-recency quartile's members have recency <= the worst's."""
    import duckdb

    from hash_db_spark.queries.temporal_queries import (
        RFM_ORACLE,
        q_rfm_segments,
    )

    rows = q_rfm_segments(spark, sf_dir).collect()
    assert len(rows) > 0
    got = sorted(tuple(r) for r in rows)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(RFM_ORACLE).fetchall())
    con.close()
    assert got == want
    from collections import Counter

    for col in ("r_q", "f_q", "m_q"):
        c = Counter(getattr(r, col) for r in rows)
        assert set(c) == {1, 2, 3, 4}
        assert max(c.values()) - min(c.values()) <= 1  # SQL NTILE law
    best = [r.recency_days for r in rows if r.r_q == 4]
    worst = [r.recency_days for r in rows if r.r_q == 1]
    assert max(best) <= min(worst)
