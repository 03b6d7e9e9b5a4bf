"""Scale-plumbing tests: salted results are identical to naive forms;
bucketed tables join without an exchange; partitioned writes prune."""

from __future__ import annotations

import io
import contextlib

import pytest
import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.operators import skew as S


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_group_count_identical(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    salted = {
        (r.event_type, r.cnt)
        for r in S.salted_group_count(ev, "event_type").collect()
    }
    plain = {
        (r.event_type, r["count"])
        for r in ev.groupBy("event_type").count().collect()
    }
    assert salted == plain


def test_salted_join_identical(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    salted = {
        (r.event_id, r.c_mktsegment)
        for r in S.salted_join(ev, cust, "user_id", "c_custkey").collect()
    }
    plain = {
        (r.event_id, r.c_mktsegment)
        for r in ev.join(cust, ev.user_id == cust.c_custkey).collect()
    }
    assert salted == plain


def test_salted_join_shuffles_on_composite_key(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plan = _plan(S.salted_join(ev, cust, "user_id", "c_custkey"))
    # The join key must include the salt — that's the whole point.
    assert "__salt" in plan


def test_bucketed_join_no_shuffle(spark, tmp_path_factory):
    """Two tables bucketed by the join key join WITHOUT a shuffle
    exchange — the 'co-located join' the reference approximates by
    inserting join partners next to rows (server.py:806-894), done
    the Spark way."""
    import uuid

    a = spark.range(0, 10000).withColumn("va", F.col("id") * 2)
    b = spark.range(0, 10000).withColumn("vb", F.col("id") * 3)
    ta, tb = f"ba_{uuid.uuid4().hex[:8]}", f"bb_{uuid.uuid4().hex[:8]}"
    a.write.bucketBy(8, "id").sortBy("id").saveAsTable(ta)
    b.write.bucketBy(8, "id").sortBy("id").saveAsTable(tb)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Force the sort-merge path (tiny test tables would broadcast);
        # bucketed SMJ must need NO shuffle exchange on either side.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(ta).join(spark.table(tb), "id")
        plan = _plan(joined)
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Partition-by-column writes give scan-time partition pruning —
    the engine's answer to the reference's per-pk routing."""
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_type")
    ev.write.partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = _plan(back)
    assert "PartitionFilters" in plan
    n_click = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == n_click


class TestAtomicPublication:
    def test_publish_flip_and_crash_isolation(self, spark, tmp_path):
        """Version 2's staging is invisible until the pointer flips; a
        'crash' that stages v3 without flipping leaves readers on v2;
        republishing lands on v4 (orphans never get reused)."""
        from hash_db_spark.sources import writers as W

        path = str(tmp_path / "idx")
        v1 = spark.range(10).selectExpr("id", "id * 2 AS val")
        assert W.publish_version(v1, path) == 1
        assert W.read_published(spark, path).count() == 10

        v2 = spark.range(25).selectExpr("id", "id * 3 AS val")
        assert W.publish_version(v2, path) == 2
        got = W.read_published(spark, path)
        assert got.count() == 25
        assert got.filter("val != id * 3").count() == 0

        # simulate a crash mid-stage: v3 files land, pointer never flips
        spark.range(999).selectExpr("id", "id AS val").write.mode(
            "overwrite"
        ).parquet(f"{path}/v=3")
        assert W.read_published_version(spark, path) == 2
        assert W.read_published(spark, path).count() == 25

        # the next successful publish supersedes the orphan
        v4 = spark.range(7).selectExpr("id", "id + 1 AS val")
        n = W.publish_version(v4, path)
        assert n >= 3 and W.read_published(spark, path).count() == 7

    def test_empty_pointer_is_torn(self, spark, tmp_path):
        import pytest

        from hash_db_spark.sources import writers as W

        path = str(tmp_path / "idx2")
        W.publish_version(spark.range(3), path)
        # empty the pointer (torn write shape)
        spark.range(0).selectExpr("CAST(id AS INT) AS v").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{path}/_latest")
        with pytest.raises(ValueError, match="torn pointer"):
            W.read_published_version(spark, path)


def test_ivf_published_serving_parity(spark, sf_dir):
    """The published-index serving path returns exactly what the plain
    persisted path returns — and a second publish supersedes cleanly."""
    from hash_db_spark.queries.similarity_queries import (
        q_sim_topk_ivf_persisted,
        q_sim_topk_ivf_published,
    )

    got = sorted(
        tuple(r) for r in q_sim_topk_ivf_published(spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r) for r in q_sim_topk_ivf_persisted(spark, sf_dir).collect()
    )
    assert got == want and len(got) > 0
    # republish: version advances, results unchanged
    again = sorted(
        tuple(r) for r in q_sim_topk_ivf_published(spark, sf_dir).collect()
    )
    assert again == want


class TestVacuumPlan:
    def test_classification_table(self, spark, tmp_path):
        """live/retained/expired/orphan land exactly where the
        protocol says; orphans stay invisible to readers."""
        from hash_db_spark.sources import writers as W

        store = str(tmp_path / "store")
        df = spark.range(3).selectExpr("id", "id * 2 AS x")
        for _ in range(4):
            W.publish_version(df.coalesce(1), store)
        # crash mid-publish: staged, pointer not flipped
        df.coalesce(1).write.parquet(f"{store}/v=5")
        plan = {
            r.version: (r.status, r.action)
            for r in W.vacuum_plan(spark, store, keep=2).collect()
        }
        assert plan == {
            1: ("expired", "delete"),
            2: ("expired", "delete"),
            3: ("retained", "keep"),
            4: ("live", "keep"),
            5: ("orphan", "delete"),
        }
        assert W.read_published_version(spark, store) == 4

    def test_keep_window_widens(self, spark, tmp_path):
        from hash_db_spark.sources import writers as W

        store = str(tmp_path / "store")
        df = spark.range(2)
        for _ in range(3):
            W.publish_version(df.coalesce(1), store)
        plan = {
            r.version: r.action
            for r in W.vacuum_plan(spark, store, keep=3).collect()
        }
        assert plan == {1: "keep", 2: "keep", 3: "keep"}

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.sources_queries import (
            _vacuum_plan_oracle,
            q_vacuum_plan,
        )

        got = [tuple(r) for r in q_vacuum_plan(spark, sf_dir).collect()]
        want = [
            tuple(r)
            for r in duckdb.connect()
            .execute(_vacuum_plan_oracle())
            .fetchall()
        ]
        assert got == want
        assert [r[2] for r in got] == [
            "expired", "expired", "retained", "live", "orphan",
        ]


def test_vacuum_plan_refuses_pointerless_store(spark, tmp_path):
    """A store with staged v-dirs but NO pointer is indistinguishable
    from a torn first publish — vacuum must refuse, not guess."""
    import pytest

    from hash_db_spark.sources import writers as W

    store = str(tmp_path / "store")
    spark.range(3).coalesce(1).write.parquet(f"{store}/v=1")
    with pytest.raises(Exception):
        W.vacuum_plan(spark, store)


class TestKeySkewReport:
    """Gini-from-count-of-counts skew census
    (operators/skew.py:key_skew_report)."""

    def test_uniform_keys_gini_zero(self, spark):
        from hash_db_spark.operators.skew import key_skew_report

        df = spark.createDataFrame(
            [(k, i) for k in range(8) for i in range(5)], ["k", "v"]
        )
        r = key_skew_report(df, "k", "uni").collect()[0]
        assert r.n_rows == 40 and r.n_keys == 8 and r.max_key_rows == 5
        assert r.gini == 0.0
        assert r.top1_share == 0.125
        assert r.top10_share == 1.0  # only 8 keys exist

    def test_hand_computed_gini(self, spark):
        """counts {a:1, b:1, c:2, d:4}: sorted x=(1,1,2,4), n=4, T=8,
        S1 = 1*1+1*2+2*3+4*4 = 25, G = (2*25 - 5*8)/(4*8) = 10/32."""
        from hash_db_spark.operators.skew import key_skew_report

        rows = [("a",)] + [("b",)] + [("c",)] * 2 + [("d",)] * 4
        df = spark.createDataFrame(rows, ["k"])
        r = key_skew_report(df, "k", "h").collect()[0]
        assert r.gini == round(10 / 32, 6)
        assert r.top1_share == 0.5

    def test_one_hot_key_dominates(self, spark):
        """999 rows on one key + 1 each on 9 keys: gini near 1, top1
        share ~0.99 — the melt-one-reducer shape the report flags."""
        from hash_db_spark.operators.skew import key_skew_report

        rows = [("hot",)] * 999 + [(f"k{i}",) for i in range(9)]
        r = key_skew_report(
            spark.createDataFrame(rows, ["k"]), "k", "hot"
        ).collect()[0]
        assert r.top1_share > 0.99
        assert r.gini > 0.85

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.skew_queries import (
            _skew_key_report_oracle,
            q_skew_key_report,
        )

        got = sorted(tuple(r) for r in q_skew_key_report(spark, sf_dir).collect())
        assert len(got) == 3
        con = duckdb.connect()
        for t in ("lineitem", "events"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        want = sorted(
            tuple(r)
            for r in con.execute(_skew_key_report_oracle()).fetchall()
        )
        con.close()
        assert got == want
