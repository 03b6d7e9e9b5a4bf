"""Mixture-targeted sampling: proportions, stability, and plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.operators import sampling as SM


WEIGHTS = {f"src{i}": (2.0 if i < 4 else 0.5) / 16.0 for i in range(20)}


def test_mix_hits_target_proportions(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = SM.mix_to_weights(docs, "doc_id", "source", WEIGHTS)
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    total = sum(got.values())
    # md5 buckets are uniform but the strata are tiny at sf0.001; allow
    # wide slack — the oracle-parity entry checks exactness, this checks
    # the *shape* of the mixture (heavy strata ~4x the light ones).
    heavy = sum(got.get(f"src{i}", 0) for i in range(4)) / 4
    light = sum(got.get(f"src{i}", 0) for i in range(4, 20)) / 16
    assert heavy > 2 * light, got
    assert total > 0


def test_mix_binding_stratum_keeps_all(spark, sf_dir):
    """The binding stratum's rate is exactly 1.0 — it keeps every row
    (largest-feasible-output guarantee, no upsampling)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = {r["source"]: r["n"] for r in docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    out = SM.mix_to_weights(docs, "doc_id", "source", WEIGHTS)
    got = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    binding = min(counts, key=lambda s: counts[s] / WEIGHTS[s])
    assert got[binding] == counts[binding]


def test_mix_membership_stable_under_other_strata_growth(spark, sf_dir):
    """Adding rows to a NON-binding stratum must not change which rows of
    the binding stratum survive (content-addressed fate)."""
    docs = load_table(spark, sf_dir, "documents")
    base = SM.mix_to_weights(docs, "doc_id", "source", WEIGHTS)
    binding_ids = {
        r["doc_id"] for r in base.filter(F.col("source") == "src0").collect()
    }
    grown = docs.union(
        docs.filter(F.col("source") == "src5").withColumn(
            "doc_id", F.col("doc_id") + 1_000_000
        )
    )
    regrown = SM.mix_to_weights(grown, "doc_id", "source", WEIGHTS)
    binding_ids2 = {
        r["doc_id"] for r in regrown.filter(F.col("source") == "src0").collect()
    }
    assert binding_ids == binding_ids2


def test_mix_plan_is_broadcast_mapside(spark, sf_dir):
    """The rate table must broadcast: the corpus-sized side is never
    shuffled (the only exchanges aggregate the tiny per-stratum counts)."""
    from hash_db_spark.plans.inspect import formatted_plan, summarize

    docs = load_table(spark, sf_dir, "documents")
    out = SM.mix_to_weights(docs, "doc_id", "source", WEIGHTS)
    s = summarize(out)
    assert s.broadcast_joins >= 1
    assert "SortMergeJoin" not in formatted_plan(out)


def test_training_order_deterministic_and_seed_sensitive(spark):
    from hash_db_spark.operators import sampling as SM

    df = spark.createDataFrame([(i,) for i in range(100)], ["doc_id"])
    o1 = [r.doc_id for r in SM.training_order(df, "doc_id").collect()]
    o2 = [r.doc_id for r in SM.training_order(df, "doc_id").collect()]
    o3 = [r.doc_id for r in SM.training_order(df, "doc_id", seed="epoch1").collect()]
    assert o1 == o2                      # reproducible
    assert sorted(o1) == list(range(100))  # a permutation
    assert o1 != o3                      # new seed -> new order
    assert o1 != list(range(100))        # actually shuffled


class TestKfoldAssign:
    """Content-addressed k-fold CV assignment
    (operators/sampling.py:kfold_assign)."""

    def test_append_stability_and_determinism(self, spark):
        from hash_db_spark.operators.sampling import kfold_assign

        base = spark.createDataFrame(
            [(i,) for i in range(200)], ["doc_id"]
        )
        a = {r.doc_id: r.fold for r in kfold_assign(base, "doc_id").collect()}
        bigger = spark.createDataFrame(
            [(i,) for i in range(300)], ["doc_id"]
        )
        b = {r.doc_id: r.fold for r in kfold_assign(bigger, "doc_id").collect()}
        assert all(b[i] == a[i] for i in a)  # appends never move rows
        assert set(a.values()) <= set(range(5))
        # rough balance: every fold populated, none > 2x expected
        from collections import Counter

        c = Counter(a.values())
        assert len(c) == 5 and max(c.values()) < 80

    def test_seed_rotation_redraws(self, spark):
        from hash_db_spark.operators.sampling import kfold_assign

        df = spark.createDataFrame([(i,) for i in range(100)], ["doc_id"])
        a = {r.doc_id: r.fold for r in kfold_assign(df, "doc_id").collect()}
        b = {
            r.doc_id: r.fold
            for r in kfold_assign(df, "doc_id", seed="kf2").collect()
        }
        assert a != b

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.sampling_queries import (
            _kfold_balance_oracle,
            q_kfold_balance,
        )

        got = sorted(tuple(r) for r in q_kfold_balance(spark, sf_dir).collect())
        assert len(got) > 0
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(_kfold_balance_oracle()).fetchall()
        )
        con.close()
        assert got == want
