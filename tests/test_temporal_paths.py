"""Session path mining: deterministic path strings, DuckDB parity, and
consistency with the proven sessionize aggregation."""

from __future__ import annotations

import duckdb


def test_paths_topk_parity(spark, sf_dir):
    from hash_db_spark.queries.temporal_queries import (
        SESSION_PATHS_ORACLE,
        q_session_paths_topk,
    )

    got = sorted(tuple(r) for r in q_session_paths_topk(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = sorted(tuple(r) for r in con.execute(SESSION_PATHS_ORACLE).fetchall())
    con.close()
    assert got == want and len(got) > 0


def test_paths_agree_with_sessionize(spark, sf_dir):
    """Every session produced by session_paths has the same step count
    sessionize reports for it — one definition, two views."""
    import pyspark.sql.functions as F

    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators import temporal as T

    ev = load_table(spark, sf_dir, "events")
    paths = T.session_paths(
        ev, key="user_id", time="ts", gap="1 hour",
        order_tiebreak="event_id", step_col="event_type",
    ).select(
        "user_id",
        "session_id",
        (F.size(F.split("path", ">")) ).alias("n_steps"),
    )
    sess = T.sessionize(
        ev, key="user_id", time="ts", gap="1 hour",
        order_tiebreak="event_id",
    ).select("user_id", "session_id", "n_events")
    mismatch = (
        paths.join(sess, ["user_id", "session_id"], "full")
        .filter(
            F.col("n_steps").isNull()
            | F.col("n_events").isNull()
            | (F.col("n_steps") != F.col("n_events"))
        )
        .count()
    )
    assert mismatch == 0
