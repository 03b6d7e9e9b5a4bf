"""Approximate-aggregate surface: sketches cannot hash-match a DuckDB
oracle (different algorithms), so they are verified by tolerance against
exact answers — the correct contract for approx operators."""

from __future__ import annotations

import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table


def test_approx_count_distinct_tolerance(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) / exact <= 0.05


def test_percentile_approx_tolerance(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    exact = orders.select(F.expr("percentile(o_totalprice, 0.5)")).collect()[0][0]
    approx = orders.select(
        F.percentile_approx("o_totalprice", 0.5, 10000)
    ).collect()[0][0]
    assert abs(approx - exact) / exact <= 0.01


def test_datasketch_vs_exact_on_groups(spark, sf_dir):
    """Per-group approx distinct stays within rsd bounds for every group."""
    ev = load_table(spark, sf_dir, "events")
    joined = (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    for r in joined:
        assert abs(r.approx - r.exact) / max(r.exact, 1) <= 0.06, r
