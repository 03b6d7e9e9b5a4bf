"""DSIR importance resampling (operators/curation.py): structural laws
on an unambiguous synthetic corpus, exact-integer parity vs the DuckDB
oracle on the real fixture, and the plan shapes the 100 TB story rests
on (bounded broadcast model dim, TakeOrderedAndProject resample)."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from hash_db_spark.operators import curation as C


@pytest.fixture(scope="module")
def corpus(spark):
    # Target docs (is_t) speak 'aurora'; raw-only docs speak 'quartz'.
    # 'common' appears everywhere, so it carries no signal.
    rows = (
        [(i, "aurora common aurora", True) for i in range(6)]
        + [(10 + i, "quartz common quartz", False) for i in range(6)]
        + [(20, "aurora common quartz", False)]
    )
    return spark.createDataFrame(rows, ["doc_id", "text", "is_t"]).cache()


def test_target_distinctive_docs_weigh_higher(corpus):
    w = {
        r.doc_id: r.w_micro
        for r in C.dsir_weights(corpus, F.col("is_t")).collect()
    }
    # every aurora-speaking doc outweighs every quartz-speaking doc,
    # and the mixed doc sits strictly between the two blocks
    assert min(w[i] for i in range(6)) > w[20]
    assert w[20] > max(w[10 + i] for i in range(6))


def test_identical_text_identical_weight(corpus):
    w = C.dsir_weights(corpus, F.col("is_t")).collect()
    by_text = {}
    texts = {
        r.doc_id: r.text for r in corpus.select("doc_id", "text").collect()
    }
    for r in w:
        by_text.setdefault(texts[r.doc_id], set()).add(
            (r.n_feats, r.w_micro)
        )
    # weight is a pure function of the text (content-addressed features)
    assert all(len(v) == 1 for v in by_text.values())


def test_resample_is_subset_sized_and_deterministic(corpus):
    w = C.dsir_weights(corpus, F.col("is_t"))
    a = sorted(tuple(r) for r in C.dsir_resample(w, 5).collect())
    b = sorted(tuple(r) for r in C.dsir_resample(w, 5).collect())
    assert a == b
    assert len(a) == 5
    ids = {r[0] for r in a}
    assert ids <= set(range(6)) | set(range(10, 16)) | {20}


def test_resample_prefers_heavy_docs(corpus):
    """With weights in the tens of nats, the Gumbel noise (O(1) nats)
    cannot overturn the target block: a 6-of-13 draw lands mostly on
    the aurora speakers."""
    w = C.dsir_weights(corpus, F.col("is_t"))
    picked = {r.doc_id for r in C.dsir_resample(w, 6).collect()}
    assert len(picked & set(range(6))) >= 4


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con


def test_weights_oracle_parity_fixture(spark, sf_dir):
    from hash_db_spark.queries.curation_queries import q_dsir_weights

    got = sorted(tuple(r) for r in q_dsir_weights(spark, sf_dir).collect())
    con = _duck(sf_dir)
    want = sorted(
        tuple(r)
        for r in con.execute(C.sql_dsir_weights("lang = 'en'")).fetchall()
    )
    con.close()
    assert got == want
    assert len(got) > 0


def test_resample_oracle_parity_fixture(spark, sf_dir):
    from hash_db_spark.queries.curation_queries import (
        DSIR_SAMPLE_N,
        q_dsir_resample,
    )

    got = sorted(tuple(r) for r in q_dsir_resample(spark, sf_dir).collect())
    con = _duck(sf_dir)
    want = sorted(
        tuple(r)
        for r in con.execute(
            C.sql_dsir_resample("lang = 'en'", DSIR_SAMPLE_N)
        ).fetchall()
    )
    con.close()
    assert got == want
    assert len(got) == DSIR_SAMPLE_N


def test_dsir_plan_shapes(spark, sf_dir):
    """The model dim joins broadcast (it is hard-bounded at 64k rows);
    nothing degenerates to a cartesian/nested-loop; the resample is
    TakeOrderedAndProject, never a global sort."""
    from hash_db_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    w = C.dsir_weights(docs, F.col("lang") == "en")
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    r = C.dsir_resample(w, 8)
    rplan = r._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in rplan


def test_stream_gate_matches_batch_and_enriches_target(spark, sf_dir):
    """The streaming gate (published dim + shipped operating point)
    equals the batch filter exactly, and the kept set is
    target-enriched: the en share above the gate exceeds the corpus en
    share (the whole point of importance weighting)."""
    import duckdb

    from hash_db_spark.catalog import load_table
    from hash_db_spark.queries.curation_queries import (
        _stream_dsir_gate_oracle,
        q_stream_dsir_gate,
    )

    got = sorted(
        tuple(r) for r in q_stream_dsir_gate(spark, sf_dir).collect()
    )
    con = _duck(sf_dir)
    want = sorted(
        tuple(r)
        for r in con.execute(_stream_dsir_gate_oracle()).fetchall()
    )
    con.close()
    assert got == want
    docs = load_table(spark, sf_dir, "documents")
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    kept_en = sum(1 for r in got if langs[r[0]] == "en") / len(got)
    corpus_en = sum(1 for v in langs.values() if v == "en") / len(langs)
    assert kept_en > corpus_en


class TestEssReport:
    """Kish ESS diagnostics (operators/curation.py:ess_report)."""

    def _run(self, spark, rows):
        import pyspark.sql.functions as F

        from hash_db_spark.operators import curation as C

        w = spark.createDataFrame(
            [(i, lw) for i, (lw, _) in enumerate(rows)],
            ["doc_id", "w_micro"],
        )
        d = spark.createDataFrame(
            [(i, g) for i, (_, g) in enumerate(rows)], ["doc_id", "source"]
        )
        return {r.source: r for r in C.ess_report(w, d).collect()}

    def test_uniform_weights_give_full_ess(self, spark):
        """Equal log-weights: every e == 1000, ESS == n exactly."""
        got = self._run(spark, [(500_000, "a")] * 4)
        r = got["a"]
        assert r.n_docs == 4
        assert r.ess_milli == 4_000  # ESS = 4.0
        assert r.ess_ratio_micro == 1_000_000
        assert r.max_share_micro == 250_000  # 1/4

    def test_peaked_weights_collapse_ess(self, spark):
        """One doc ln(1000) nats above the rest: e = (1000, 1, 1, 1);
        ESS = 1003^2/1000003 ~ 1.006 — the resample is one document."""
        import math

        lw = int(round(math.log(1000.0) * 1e6))
        got = self._run(spark, [(lw, "a")] + [(0, "a")] * 3)
        r = got["a"]
        assert r.ess_milli == round(1003.0**2 / 1_000_003.0 * 1000)
        assert r.ess_ratio_micro < 300_000  # far below uniform's 1.0
        assert r.max_share_micro == round(1000.0 / 1003.0 * 1e6)

    def test_shift_invariance_across_slices(self, spark):
        """Adding a constant to a slice's log-weights must not change
        its ESS (the stabilization IS that shift): two slices with the
        same internal spread report identical diagnostics."""
        got = self._run(
            spark,
            [(0, "a"), (-700_000, "a"), (-(10**9), "b"),
             (-(10**9) - 700_000, "b")],
        )
        assert (got["a"].ess_milli, got["a"].max_share_micro) == (
            got["b"].ess_milli, got["b"].max_share_micro
        )

    def test_oracle_parity_fixture(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.curation_queries import (
            _sampling_ess_oracle,
            q_sampling_ess_report,
        )

        got = [
            tuple(r) for r in q_sampling_ess_report(spark, sf_dir).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = [
            tuple(r) for r in con.execute(_sampling_ess_oracle()).fetchall()
        ]
        con.close()
        assert got == want and len(got) > 0
        for _, n, ess_milli, ratio, share in got:
            # ESS in [1, n]; shares in (0, 1]
            assert 1_000 <= ess_milli <= n * 1_000
            assert 0 < share <= 1_000_000 and 0 < ratio <= 1_000_000

    def test_plan_broadcasts_slice_max_only(self, spark, sf_dir):
        from hash_db_spark.queries.curation_queries import (
            q_sampling_ess_report,
        )

        plan = q_sampling_ess_report(
            spark, sf_dir
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
