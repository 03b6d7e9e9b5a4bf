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


# --- greedy k-center coreset ---------------------------------------------------


def test_kcenter_picks_cluster_extremes(spark):
    """Three tight, well-separated clusters: the first three picks must
    land in three DIFFERENT clusters (the whole point of farthest-point
    traversal), and the gap curve is monotone non-increasing."""
    from hash_db_spark.operators import clustering as CL

    def vec(base, eps):
        v = [0.0] * 8
        v[base] = 10.0
        v[(base + 1) % 8] = eps
        return v

    rows = [(c * 10 + i, vec(c * 3, 0.01 * i)) for c in range(3) for i in range(4)]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = CL.kcenter_select(emb, k=3).collect()
    clusters = {r.vec_id // 10 for r in got}
    assert clusters == {0, 1, 2}
    gaps = [r.gap_micro for r in got if r.gap_micro is not None]
    assert gaps == sorted(gaps, reverse=True)


def test_kcenter_oracle_parity_fixture(spark, sf_dir):
    import duckdb

    from hash_db_spark.queries.similarity_queries import (
        _kcenter_oracle,
        q_coreset_kcenter,
    )

    got = [tuple(r) for r in q_coreset_kcenter(spark, sf_dir).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = [tuple(r) for r in con.execute(_kcenter_oracle()).fetchall()]
    con.close()
    assert got == want
    assert len(got) == 8
    assert got[0][2] is None  # seed carries no gap


def test_kcenter_gap_curve_is_covering_radius(spark, sf_dir):
    """gap_micro at pick i equals the max over remaining points of the
    min-d2 to the first i-1 centers — verified directly for pick 2."""
    import pyspark.sql.functions as F

    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators import clustering as CL
    from hash_db_spark.operators.similarity import _dvec

    emb = load_table(spark, sf_dir, "embeddings")
    sel = CL.kcenter_select(emb, k=2).collect()
    seed_id, second = sel[0].vec_id, sel[1]
    corpus = emb.select(
        F.col("vec_id"), _dvec("embedding").alias("v")
    )
    seed_v = corpus.filter(F.col("vec_id") == seed_id).collect()[0]["v"]
    lit_c = F.array(*[F.lit(float(x)) for x in seed_v])
    d2 = F.aggregate(
        F.zip_with("v", lit_c, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    far = (
        corpus.filter(F.col("vec_id") != seed_id)
        .select(
            "vec_id",
            F.floor(d2 * CL.KC_MICRO + F.lit(0.5)).cast("long").alias("m"),
        )
        .orderBy(F.col("m").desc(), F.col("vec_id").asc())
        .limit(1)
        .collect()[0]
    )
    assert (far.vec_id, far.m) == (second.vec_id, second.gap_micro)


class TestEmbeddingOutliers:
    """Distance-to-nearest-centroid tail
    (operators/clustering.py:embedding_outliers)."""

    def test_planted_orthogonal_outlier_ranks_first(self, spark):
        """Two tight clusters along axes 0 and 1; one vector along
        axis 3 belongs to neither — lowest best-cosine, rank 1."""
        import random

        from hash_db_spark.operators.clustering import embedding_outliers

        rng = random.Random(7)
        rows = []
        for i in range(12):
            base = [1.0, 0.0, 0.0, 0.0] if i % 2 else [0.0, 1.0, 0.0, 0.0]
            rows.append(
                (i, [b + rng.uniform(-0.05, 0.05) for b in base])
            )
        rows.append((99, [0.0, 0.0, 0.0, 1.0]))
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        got = embedding_outliers(emb, k=2, topn=5).collect()
        assert got[0].vec_id == 99 and got[0].rank == 1
        # ranking ascends with best-cosine
        cs = [r.cos_micro for r in got]
        assert cs == sorted(cs)

    def test_oracle_parity_fixture(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.similarity_queries import (
            _embedding_outliers_oracle,
            q_embedding_outliers,
        )

        got = [
            tuple(r) for r in q_embedding_outliers(spark, sf_dir).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS "
            f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
        )
        want = [
            tuple(r)
            for r in con.execute(_embedding_outliers_oracle()).fetchall()
        ]
        con.close()
        assert got == want and len(got) == 50

    def test_topn_is_heap_not_global_sort(self, spark, sf_dir):
        from hash_db_spark.queries.similarity_queries import (
            q_embedding_outliers,
        )

        plan = q_embedding_outliers(
            spark, sf_dir
        )._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestClusterBalancedSample:
    """Sqrt-allocation diversity sampling
    (operators/clustering.py:cluster_balanced_sample)."""

    def test_sqrt_allocation_flattens_imbalance(self, spark):
        """Two tight clusters, 180 vs 20 members: proportional
        allocation would split a 60-budget 54/6; sqrt allocation gives
        the small cluster ~2.25x its proportional share. Bernoulli
        realization is content-addressed, so just check the kept
        PROPORTIONS land near the sqrt quotas, and reproducibility."""
        import math

        from hash_db_spark.operators.clustering import (
            cluster_balanced_sample,
        )

        rows = []
        for i in range(180):
            rows.append((i, [10.0 + (i % 7) * 0.01, 0.1, 0.0, 0.0]))
        for i in range(20):
            rows.append((1000 + i, [0.0, 0.0, 9.0 + (i % 5) * 0.01, 0.3]))
        emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
        got = cluster_balanced_sample(emb, k=2, target=60).collect()
        again = cluster_balanced_sample(emb, k=2, target=60).collect()
        assert sorted(r.vec_id for r in got) == sorted(r.vec_id for r in again)
        by_cl = {}
        for r in got:
            by_cl.setdefault(r.vec_id >= 1000, 0)
            by_cl[r.vec_id >= 1000] += 1
        s_big, s_small = math.sqrt(180), math.sqrt(20)
        q_big = int(60 * math.floor(s_big * 1000)
                    // (math.floor(s_big * 1000) + math.floor(s_small * 1000)))
        q_small = int(60 * math.floor(s_small * 1000)
                      // (math.floor(s_big * 1000) + math.floor(s_small * 1000)))
        # Bernoulli noise: allow +-60% of quota but assert the ORDER
        # and that the small cluster beat its proportional share (6)
        assert abs(by_cl[False] - q_big) <= 0.6 * q_big
        assert abs(by_cl[True] - q_small) <= 0.6 * q_small + 2
        assert by_cl[True] > 6  # sqrt > proportional for the minority

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.similarity_queries import (
            _cluster_balanced_oracle,
            q_cluster_balanced_sample,
        )

        got = sorted(
            tuple(r) for r in q_cluster_balanced_sample(spark, sf_dir).collect()
        )
        assert len(got) > 0
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS "
            f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(_cluster_balanced_oracle()).fetchall()
        )
        con.close()
        assert got == want
