"""Deterministic HLL sketch: accuracy, merge-associativity, plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.functions import sketches as S


def test_hll_accuracy_within_rse(spark):
    """Estimate within 3x the theoretical 6.5% standard error on a known
    cardinality, for both the linear-counting and raw-HLL regimes."""
    for n in (100, 20_000):
        df = spark.range(n).select(F.col("id").alias("k"))
        est = S.hll_distinct(df, "k").collect()[0]["approx_distinct"]
        assert abs(est - n) / n < 0.20, (n, est)


def test_hll_merge_equals_direct(spark, sf_dir):
    """Merging per-shard register sketches (max per register) must give
    the exact same estimate as sketching the whole table directly."""
    ev = load_table(spark, sf_dir, "events")
    direct = S.hll_distinct(ev, "user_id").collect()[0]["approx_distinct"]
    shards = S.register_rows(ev, "user_id", "event_type")
    merged_regs = shards.groupBy("reg").agg(F.max("mj").alias("mj"))
    merged = S.estimate(merged_regs).collect()[0]["approx_distinct"]
    assert direct == merged


def test_hll_register_shuffle_is_partial(spark, sf_dir):
    """The only corpus-sized work is map-side: the (group, reg) exchange
    must sit above a partial_max aggregate, so each task emits at most
    groups x 256 rows regardless of input size."""
    from hash_db_spark.plans.inspect import formatted_plan

    ev = load_table(spark, sf_dir, "events")
    plan = formatted_plan(S.hll_distinct(ev, "user_id", "event_type"))
    assert "partial_max" in plan


# ------------------------------------------------------------- count-min


def test_cms_never_undercounts(spark, sf_dir):
    """min-over-rows only over-counts: est >= exact for every probe."""
    ev = load_table(spark, sf_dir, "events")
    cells = S.cms_cells(ev, "user_id")
    probes = ev.select("user_id").distinct()
    est = S.cms_estimate(cells, probes, "user_id")
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    bad = est.join(exact, "user_id").filter(F.col("est") < F.col("n"))
    assert bad.count() == 0


def test_cms_shard_merge_equals_global(spark, sf_dir):
    """Cell-wise summed per-type shards == the single global grid."""
    ev = load_table(spark, sf_dir, "events")
    direct = {
        (r.row, r.col): r.c for r in S.cms_cells(ev, "user_id").collect()
    }
    shards = S.cms_cells(ev, "user_id", "event_type")
    merged = {
        (r.row, r.col): r.c
        for r in shards.groupBy("row", "col")
        .agg(F.sum("c").alias("c"))
        .collect()
    }
    assert direct == merged


def test_cms_grid_is_bounded(spark, sf_dir):
    """The sketch never exceeds D*W cells no matter the key cardinality."""
    ev = load_table(spark, sf_dir, "events")
    assert S.cms_cells(ev, "event_id").count() <= S.CMS_D * S.CMS_W
