"""Deterministic k-means: totality, determinism, and scale shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.operators import clustering as C


def test_kmeans_total_assignment(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = C.kmeans_assign(emb)
    n = emb.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    stats = out.agg(
        F.countDistinct("cluster").alias("k"),
        F.min("cluster").alias("lo"),
        F.max("cluster").alias("hi"),
    ).collect()[0]
    assert 1 <= stats["k"] <= 8
    assert stats["lo"] >= 1 and stats["hi"] <= 8


def test_kmeans_partitioning_invariant(spark, sf_dir):
    """Assignment is a pure function of content — repartitioning the
    input must not change any cluster id (no order-dependent float
    accumulation: centroid sums are exact integers)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = {r["vec_id"]: r["cluster"] for r in C.kmeans_assign(emb).collect()}
    b = {
        r["vec_id"]: r["cluster"]
        for r in C.kmeans_assign(emb.repartition(13)).collect()
    }
    assert a == b


def test_kmeans_no_corpus_shuffle_in_assignment(spark, sf_dir):
    """The output plan is a mapInPandas over the scan — no join and no
    corpus-sized exchange (the centroid matrix rides a broadcast
    variable, not a join)."""
    from hash_db_spark.plans.inspect import formatted_plan

    emb = load_table(spark, sf_dir, "embeddings")
    plan = formatted_plan(C.kmeans_assign(emb))
    for op in ("SortMergeJoin", "BroadcastHashJoin", "Exchange"):
        assert op not in plan, op
