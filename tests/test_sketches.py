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


# ----------------------------------------------------------------- bloom


def test_bloom_no_false_negatives(spark):
    """Every true member must survive the screen (candidate ⊇ members)."""
    members = spark.createDataFrame(
        [(f"key{i}",) for i in range(200)], ["s"]
    )
    others = spark.createDataFrame(
        [(f"other{i}",) for i in range(500)], ["s"]
    )
    bits = S.bloom_bits(members, "s")
    assert bits.count() <= S.BLOOM_M
    cand = {
        r.s for r in S.bloom_candidates(bits, members.union(others), "s").collect()
    }
    assert {f"key{i}" for i in range(200)} <= cand
    # With n=200, m=8192, k=3 the fp rate is ~0.02% — essentially no
    # non-member should pass at this fill factor.
    assert len(cand - {f"key{i}" for i in range(200)}) <= 5


def test_histogram_quantile_error_bounded(spark, sf_dir):
    """Histogram estimates must sit within one bin width of the exact
    quantile."""
    from hash_db_spark.functions.profiling import (
        binned_histogram,
        histogram_quantiles,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lo, hi, bins = 0.0, 600000.0, 256
    hist = binned_histogram(orders, "o_totalprice", lo, hi, bins)
    est = {
        r.p: r.q_est
        for r in histogram_quantiles(hist, (0.25, 0.5, 0.9), lo, hi, bins).collect()
    }
    exact = orders.approxQuantile("o_totalprice", [0.25, 0.5, 0.9], 0.0)
    width = (hi - lo) / bins
    for p, ex in zip((0.25, 0.5, 0.9), exact):
        assert abs(est[p] - ex) <= width, (p, est[p], ex)


def test_histogram_shard_merge(spark, sf_dir):
    """Per-shard histograms summed bin-wise == the global histogram."""
    from hash_db_spark.functions.profiling import binned_histogram

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lo, hi = 0.0, 600000.0
    direct = {
        r.bin: r.cnt for r in binned_histogram(orders, "o_totalprice", lo, hi).collect()
    }
    merged = {}
    for st in [r.o_orderstatus for r in orders.select("o_orderstatus").distinct().collect()]:
        shard = binned_histogram(
            orders.filter(F.col("o_orderstatus") == st), "o_totalprice", lo, hi
        )
        for r in shard.collect():
            merged[r.bin] = merged.get(r.bin, 0) + r.cnt
    assert direct == merged


def test_cms_estimate_merges_sharded_cells(spark, sf_dir):
    """Passing per-shard cells (group_cols) straight into cms_estimate
    must NOT under-count: estimates are taken over merged (row, col)
    sums, so they match the un-sharded sketch exactly (ADVICE r3)."""
    ev = load_table(spark, sf_dir, "events")
    probes = ev.select("user_id").distinct().limit(50)
    direct = {
        r.user_id: r.est
        for r in S.cms_estimate(S.cms_cells(ev, "user_id"), probes, "user_id").collect()
    }
    sharded = S.cms_cells(ev, "user_id", "event_type").drop("event_type")
    via_shards = {
        r.user_id: r.est
        for r in S.cms_estimate(sharded, probes, "user_id").collect()
    }
    assert direct == via_shards


# --- KMV theta-style sketches (round-9 session 2) ---------------------------


class TestKMV:
    @staticmethod
    def _events(spark):
        """Three segments with KNOWN overlap: a={0..99}, b={50..149}
        (|a&b|=50), c={200..299} (disjoint from both)."""
        rows = (
            [("a", u) for u in range(100)]
            + [("b", u) for u in range(50, 150)]
            + [("c", u) for u in range(200, 300)]
        )
        return spark.createDataFrame(rows, ["seg", "user_id"])

    def test_exact_when_set_fits_in_sketch(self, spark):
        from hash_db_spark.functions import sketches as SK

        df = self._events(spark).filter("user_id < 30 or seg = 'c'")
        sk = SK.kmv_sketch(df, "user_id", "seg", k=64)
        est = {r.grp: r.est for r in SK.kmv_estimate(sk, k=64).collect()}
        assert est["a"] == 30.0  # 30 < k: sketch holds the whole set
        assert "b" not in est  # b's members are all filtered out
        # c has 100 > k members: the estimator kicks in; k=64 keeps it
        # within a tight band of the truth (deterministic value)
        assert 60.0 <= est["c"] <= 160.0

    def test_intersection_estimates_track_truth(self, spark):
        from hash_db_spark.functions import sketches as SK

        sk = SK.kmv_sketch(self._events(spark), "user_id", "seg", k=64)
        got = {
            (r.grp_a, r.grp_b): r.est_shared
            for r in SK.kmv_pair_intersections(sk, k=64).collect()
        }
        # |a & b| = 50 of ~150 union; k=64 of 150 sampled -> expect
        # the estimate within a generous +-40% band (deterministic
        # value, band documents the k=64 resolution)
        assert 30 <= got[("a", "b")] <= 70, got
        # disjoint pairs estimate (near) zero
        assert got[("a", "c")] < 10
        assert got[("b", "c")] < 10

    def test_oracle_parity_fixture(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.catalog import load_table
        from hash_db_spark.functions import sketches as SK

        ev = load_table(spark, sf_dir, "events")
        sk = SK.kmv_sketch(ev, "user_id", "event_type")
        got = sorted(
            (r.grp_a, r.grp_b, float(r.est_shared))
            for r in SK.kmv_pair_intersections(sk).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS "
            f"SELECT * FROM '{sf_dir}/events.parquet'"
        )
        want = sorted(
            (a, b, float(x))
            for a, b, x in con.execute(
                SK.sql_kmv_pair_intersections(
                    "events", "user_id", "event_type"
                )
            ).fetchall()
        )
        con.close()
        assert got == want and len(got) > 0

    def test_sketch_is_k_bounded(self, spark):
        from hash_db_spark.functions import sketches as SK

        sk = SK.kmv_sketch(self._events(spark), "user_id", "seg", k=16)
        per_grp = {
            r.grp: r.n
            for r in sk.groupBy("grp").count().withColumnRenamed(
                "count", "n"
            ).collect()
        }
        assert all(n <= 16 for n in per_grp.values())

    def test_merge_equals_sketch_of_union(self, spark):
        """Mergeability: merging per-batch sketches equals sketching
        the unioned data — the property that lets daily sketches roll
        up without revisiting members."""
        from hash_db_spark.functions import sketches as SK

        ev = self._events(spark)
        batch1 = ev.filter("user_id % 2 = 0")
        batch2 = ev.filter("user_id % 2 = 1")
        merged = SK.kmv_merge(
            SK.kmv_sketch(batch1, "user_id", "seg", k=32),
            SK.kmv_sketch(batch2, "user_id", "seg", k=32),
            k=32,
        )
        direct = SK.kmv_sketch(ev, "user_id", "seg", k=32)
        got = sorted((r.grp, r.rank, r.h) for r in merged.collect())
        want = sorted((r.grp, r.rank, r.h) for r in direct.collect())
        assert got == want and len(got) > 0


class TestStreamBloomPrejoin:
    def test_stream_matches_batch_join(self, spark, sf_dir):
        """The streaming runtime-filter probe lands on exactly the
        batch join's rows (bloom false positives die in the exact
        stream-static join), and the map-side prefilter adds no
        stream-side shuffle or state."""
        from hash_db_spark.queries.sketch_queries import (
            q_bloom_prejoin,
            q_stream_bloom_prejoin,
        )

        got = sorted(
            tuple(r) for r in q_stream_bloom_prejoin(spark, sf_dir).collect()
        )
        want = sorted(tuple(r) for r in q_bloom_prejoin(spark, sf_dir).collect())
        assert got == want and len(got) > 0

    def test_member_pred_is_shuffle_free(self, spark, sf_dir):
        """bloom_member_pred on a static frame compiles to a pure
        Filter over the scan — the property that makes it safe to bolt
        onto a stream (no state, no exchange)."""
        from hash_db_spark.catalog import load_table
        from hash_db_spark.functions import sketches as SK
        from hash_db_spark.plans.inspect import formatted_plan

        dim = load_table(spark, sf_dir, "customer").filter(
            "c_custkey <= 100"
        )
        bits = SK.bloom_bits(dim, "c_custkey")
        ev = load_table(spark, sf_dir, "events")
        pre = ev.filter(SK.bloom_member_pred(bits, "user_id"))
        assert "Exchange" not in formatted_plan(pre)
