"""Margin-kNN bitext mining (operators/bitext.py): the Artetxe &
Schwenk ratio margin must demote hub vectors, flag forward-backward
consistency, stay parity-exact vs the DuckDB oracle, and keep a
join-free scan plan."""

from __future__ import annotations

import pytest

from hash_db_spark.operators import bitext as B


def _sides(spark, srcs, dsts):
    src = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in srcs], ["id", "v"]
    )
    dst = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in dsts], ["id", "v"]
    )
    return src, dst


HUB_SRCS = [
    (1, [0.95, 0.1, 0.1, 0.15]),
    (2, [0.1, 0.95, 0.1, 0.15]),
    (3, [0.5, 0.6, 0.55, 0.5]),
    (4, [0.6, 0.5, 0.5, 0.55]),
    (5, [0.55, 0.55, 0.5, 0.6]),
]
HUB_DSTS = [
    (100, [1.0, 1.0, 1.0, 1.0]),  # the hub: close to every source
    (101, [1.0, 0.0, 0.0, 0.2]),  # true counterpart of source 1
    (102, [0.0, 1.0, 0.0, 0.2]),  # true counterpart of source 2
]


class TestMarginLaws:
    def test_margin_demotes_hubs(self, spark):
        """Every hub pair has HIGHER raw cosine (~0.997) than the true
        pairs (~0.989), yet the margin ranks the true pairs first —
        the exact failure mode of raw-cosine mining the margin exists
        to fix (Artetxe & Schwenk 2019, section 3)."""
        src, dst = _sides(spark, HUB_SRCS, HUB_DSTS)
        rows = B.margin_mine(src, dst, k=2, topn=10).collect()
        by_rank = {r.rank: r for r in rows}
        assert {
            (by_rank[1].src_id, by_rank[1].dst_id),
            (by_rank[2].src_id, by_rank[2].dst_id),
        } == {(1, 101), (2, 102)}
        # ...even though raw cosine says the hub pairs are "better":
        hub_cos = max(r.cos_micro for r in rows if r.dst_id == 100)
        true_cos = max(r.cos_micro for r in rows if r.dst_id != 100)
        assert hub_cos > true_cos

    def test_mutual_flags_forward_backward_consistency(self, spark):
        src, dst = _sides(spark, HUB_SRCS, HUB_DSTS)
        rows = {r.src_id: r for r in B.margin_mine(src, dst, k=2).collect()}
        assert rows[1].mutual and rows[1].dst_id == 101
        assert rows[2].mutual and rows[2].dst_id == 102
        # hub's own best source is 5, so (5,hub) is mutual, (3,hub) not
        assert rows[5].mutual and rows[5].dst_id == 100
        assert not rows[3].mutual and rows[3].dst_id == 100

    def test_identical_pair_ranks_first(self, spark):
        """A source identical to a unique-direction target margins at
        the top with mutual=True and cos_micro == 1e6."""
        src, dst = _sides(
            spark,
            [(1, [1, 0, 0, 0]), (2, [0.4, 0.5, 0.6, 0.2])],
            [(10, [1, 0, 0, 0]), (11, [0, 0.2, 0.9, 0.1])],
        )
        top = B.margin_mine(src, dst, k=2).collect()[0]
        assert (top.src_id, top.dst_id) == (1, 10)
        assert top.cos_micro == 1_000_000 and top.mutual

    def test_broadcast_guard_refuses_oversized_target(self, spark, monkeypatch):
        monkeypatch.setattr(B, "MAX_BROADCAST_VECTORS", 2)
        src, dst = _sides(spark, HUB_SRCS, HUB_DSTS)
        with pytest.raises(ValueError, match="IVF/LSH"):
            B.margin_mine(src, dst)


def test_oracle_parity_fixture(spark, sf_dir):
    import duckdb

    from hash_db_spark.queries.similarity_queries import (
        _bitext_oracle,
        q_bitext_margin_mine,
    )

    got = [tuple(r) for r in q_bitext_margin_mine(spark, sf_dir).collect()]
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    want = [tuple(r) for r in con.execute(_bitext_oracle()).fetchall()]
    con.close()
    assert got == want and len(got) > 0
    # margins hover around 1.0 by construction; sanity-bound them
    for _, _, _, margin_micro, _, _ in got:
        assert 500_000 < margin_micro < 2_000_000


def test_scan_plan_has_no_join_operators(spark, sf_dir):
    """The pair scan is a broadcast-variable Arrow pass, not a plan
    join: no CartesianProduct / BroadcastNestedLoopJoin anywhere, and
    the only plan joins are the lang attach + the bounded fwd/bwd
    merge."""
    from hash_db_spark.queries.similarity_queries import q_bitext_margin_mine

    plan = q_bitext_margin_mine(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


class TestBitextLengthFilter:
    """Gale-Church length-ratio verification
    (queries/similarity_queries.py:q_bitext_length_filter)."""

    def test_oracle_parity_and_band_law(self, spark, sf_dir):
        import math

        import duckdb

        from hash_db_spark.queries.similarity_queries import (
            BITEXT_LOG_DEV_MAX,
            _bitext_length_oracle,
            q_bitext_length_filter,
        )

        rows = q_bitext_length_filter(spark, sf_dir).collect()
        assert len(rows) > 0
        got = sorted(tuple(r) for r in rows)
        con = duckdb.connect()
        for t in ("documents", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        want = sorted(
            tuple(r)
            for r in con.execute(_bitext_length_oracle()).fetchall()
        )
        con.close()
        assert got == want
        # band law: aligned <=> log_dev within the band; the median
        # pair itself always passes (log_dev 0 exists or near)
        for r in rows:
            assert r.aligned == (r.log_dev <= BITEXT_LOG_DEV_MAX)
            assert r.log_dev >= 0.0
        assert min(r.log_dev for r in rows) < 0.05


class TestMarginMineIVF:
    """IVF-composed margin mining (operators/bitext.py:margin_mine_ivf)
    — the registered headline per VERDICT r10 #5."""

    def test_full_probe_equals_exact_baseline(self, spark, sf_dir):
        """With nprobe >= the number of cells and no list truncation,
        the candidate set is every (src, dst) pair, so the IVF form
        must reproduce the broadcast-exact margin_mine row for row —
        the approximation's only degree of freedom is candidate
        coverage, never the margin math."""
        src, dst = _fixture_sides(spark, sf_dir)
        exact = sorted(map(tuple, B.margin_mine(src, dst).collect()))
        ivf = sorted(
            map(
                tuple,
                B.margin_mine_ivf(
                    src, dst, stride=1, nprobe=10_000_000
                ).collect(),
            )
        )
        assert ivf == exact

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        got = sorted(
            map(
                tuple,
                B.margin_mine_ivf(
                    _fixture_sides(spark, sf_dir)[0],
                    _fixture_sides(spark, sf_dir)[1],
                ).collect(),
            )
        )
        assert len(got) > 0
        con = duckdb.connect()
        for t in ("documents", "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        want = sorted(
            tuple(r)
            for r in con.execute(
                B.sql_margin_mine_ivf("en", "fr")
            ).fetchall()
        )
        con.close()
        assert got == want

    def test_plan_no_corpus_broadcast(self, spark, sf_dir):
        """VERDICT r10 #5's done-condition: the plan's candidate
        generation is the cogrouped per-cell scorer, with no cartesian
        or broadcast-nested-loop operator anywhere."""
        from hash_db_spark.plans.inspect import formatted_plan

        src, dst = _fixture_sides(spark, sf_dir)
        # the candidate generator (pre-checkpoint, so the full lineage
        # is visible): per-cell cogrouped scorer, no pair cross-product
        cand_plan = formatted_plan(B.ivf_candidate_pairs(src, dst))
        assert "FlatMapCoGroupsInPandas" in cand_plan, cand_plan
        assert "CartesianProduct" not in cand_plan, cand_plan
        assert "BroadcastNestedLoop" not in cand_plan, cand_plan
        # the full miner's rescore tail: still no cartesian/BNL
        plan = formatted_plan(B.margin_mine_ivf(src, dst))
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoop" not in plan, plan

    def test_cell_cap_truncates_deterministically(self, spark):
        """The inverted-list cap keeps the LOWEST ids per cell (the
        deterministic FAISS-style truncation the oracle replays): with
        one cell and cap=2, only the two lowest dst ids can appear."""
        src, dst = _sides(spark, HUB_SRCS, [(0, [1.0, 0, 0, 0]),
                                            (8, [0, 1.0, 0, 0]),
                                            (9, [0, 0, 1.0, 0]),
                                            (16, [1.0, 1.0, 0, 0])])
        rows = B.margin_mine_ivf(
            src, dst, stride=1000, nprobe=1, cell_cap=2
        ).collect()
        # stride=1000 -> only id 0 is a centroid -> one cell; cap keeps
        # dst ids {0, 8}
        assert rows and {r.dst_id for r in rows} <= {0, 8}


def _fixture_sides(spark, sf_dir):
    import pyspark.sql.functions as F

    from hash_db_spark.catalog import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    sides = emb.join(docs, emb.vec_id == docs.doc_id).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v"),
        "lang",
    )
    return (
        sides.filter(F.col("lang") == "en").drop("lang"),
        sides.filter(F.col("lang") == "fr").drop("lang"),
    )


def test_ivf_offline_centroids_escape_hatch(spark):
    """Past the strided default's growth, a fixed offline centroid
    frame (the kmeans_fit artifact shape) drives assignment — same
    candidate semantics, centroid ids taken from the supplied frame."""
    src, dst = _sides(spark, HUB_SRCS, HUB_DSTS)
    cents = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        ["id", "v"],
    )
    got = B.ivf_candidate_pairs(
        src, dst, nprobe=1, centroids=cents
    ).collect()
    assert got  # every side assigns to one of the two supplied cells
    # and the strided default on a target with NO id%stride hit raises
    import pytest as _pt

    with _pt.raises(ValueError, match="no centroid ids"):
        B.ivf_candidate_pairs(
            src,
            dst.filter("id = 101"),
            stride=1000,
        ).collect()
