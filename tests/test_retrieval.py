"""Hashed-embedding chunk retrieval: relevance ordering on known text,
totality guards, oracle parity, and the no-join/top-k plan shape."""

from __future__ import annotations

import duckdb
import pytest

from hash_db_spark.operators import retrieval as RT

TERMS = ["spark", "query", "join"]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark query join spark query join spark query join"),
        (2, "spark table scan row filter batch window sort order"),
        (3, "apple banana cherry date elderberry fig grape melon"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_most_relevant_chunk_ranks_first(docs):
    got = sorted(
        RT.retrieve_chunks(docs, "text", "doc_id", TERMS, k=3).collect(),
        key=lambda r: r.rank,
    )
    assert got[0].id == 1  # the all-query-terms doc
    assert got[0].cos > (got[1].cos if len(got) > 1 else -1)


def test_irrelevant_chunks_score_low_or_absent(docs):
    got = RT.retrieve_chunks(docs, "text", "doc_id", TERMS, k=10).collect()
    by_id = {r.id: r.cos for r in got}
    # fruit doc shares no term; any residual score is hash collision
    # noise, strictly below the exact-match doc
    assert by_id.get(3, 0.0) < by_id[1]


def test_zero_vector_query_raises(docs):
    # two tokens hashing to the same bucket with opposite signs would
    # be data-dependent; an empty term list is the guaranteed zero
    with pytest.raises(ValueError):
        RT.retrieve_chunks(docs, "text", "doc_id", [], k=3)


def test_driver_hash_matches_plan_hash(spark):
    """The driver-side query hashing must equal the in-plan hashing —
    hash the same tokens both ways."""
    import pyspark.sql.functions as F

    toks = ["spark", "query", "join", "zebra", "Ω-unicode"]
    qv = RT._hash_query(toks, RT.RETR_DIMS)
    rows = (
        spark.createDataFrame([(t,) for t in toks], ["tok"])
        .select(
            RT._tok_dim(F.col("tok"), RT.RETR_DIMS).alias("dim"),
            RT._tok_sign(F.col("tok")).alias("sign"),
        )
        .collect()
    )
    want: dict[int, int] = {}
    for r in rows:
        want[r.dim] = want.get(r.dim, 0) + r.sign
    assert qv == want


def test_oracle_parity_fixture(spark, sf_dir):
    from hash_db_spark.catalog import load_table

    got = (
        RT.retrieve_chunks(
            load_table(spark, sf_dir, "documents"),
            "text",
            "doc_id",
            TERMS,
            k=10,
        )
        .toPandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.execute(
            RT.sql_retrieve_chunks(
                "documents", "text", "doc_id", TERMS, k=10
            )
        )
        .df()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    con.close()
    assert len(got) == len(want) == 10
    for c in ("id", "chunk_idx", "rank"):
        assert [int(x) for x in got[c]] == [int(x) for x in want[c]], c
    assert [round(float(x), 6) for x in got["cos"]] == [
        round(float(x), 6) for x in want["cos"]
    ]


def test_plan_scores_without_joins_and_heap_topk(spark, sf_dir):
    """Scoring is a literal-array projection (no join anywhere in the
    plan) and the top-k is TakeOrderedAndProject, not a global sort."""
    from hash_db_spark.catalog import load_table

    df = RT.retrieve_chunks(
        load_table(spark, sf_dir, "documents"), "text", "doc_id", TERMS, k=5
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan


# --- TextTiling topic segmentation ------------------------------------------


class TestTextTiling:
    def test_topic_shift_splits_at_the_boundary(self, spark):
        # 2 windows of fruit talk, then 2 windows of database talk
        fruit = "apple banana cherry grape melon peach pear plum kiwi fig"
        db = "query table index scan join filter sort merge hash batch"
        text = " ".join([fruit] * 4 + [db] * 4)  # 80 tokens = 4 windows
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        got = sorted(
            RT.text_tiling_segments(df, "text", "doc_id").collect(),
            key=lambda r: r.start_idx,
        )
        assert len(got) == 2
        assert (got[0].start_idx, got[0].end_idx) == (0, 1)
        assert (got[1].start_idx, got[1].end_idx) == (2, 3)

    def test_uniform_doc_is_one_segment(self, spark):
        words = "query table index scan join filter sort merge hash batch"
        df = spark.createDataFrame(
            [(1, " ".join([words] * 8))], ["doc_id", "text"]
        )
        got = RT.text_tiling_segments(df, "text", "doc_id").collect()
        assert len(got) == 1
        assert got[0].n_chunks == 4

    def test_short_doc_is_one_segment(self, spark):
        df = spark.createDataFrame(
            [(1, "just a few words"), (2, "x")], ["doc_id", "text"]
        )
        got = RT.text_tiling_segments(df, "text", "doc_id").collect()
        assert {(r.doc_id, r.n_chunks) for r in got} == {(1, 1), (2, 1)}

    def test_oracle_parity_fixture(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.catalog import load_table

        got = sorted(
            tuple(int(x) for x in r)
            for r in RT.text_tiling_segments(
                load_table(spark, sf_dir, "documents"), "text", "doc_id"
            ).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(int(x) for x in row)
            for row in con.execute(
                RT.sql_text_tiling_segments("documents", "text", "doc_id")
            ).fetchall()
        )
        con.close()
        assert got == want and len(got) > 0


# --- MMR diversity-aware top-k -----------------------------------------------


def test_mmr_skips_redundant_duplicate(spark):
    """doc 2 is an exact duplicate of doc 1: plain top-2 would return
    both; MMR's second pick must jump to doc 3 (relevant but not
    redundant) because the duplicate's pairwise dot wipes out its
    relevance at lambda=0.7."""
    from hash_db_spark.operators.retrieval import mmr_rerank

    filler = " ".join(f"tok{i}" for i in range(15))
    other = " ".join(f"oth{i}" for i in range(15))
    rows = [
        (1, f"apple {filler}"),
        (2, f"apple {filler}"),     # exact dup of 1
        (3, f"apple {other}"),      # relevant, different content
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = sorted(
        (r.sel_rank, r.id)
        for r in mmr_rerank(df, "text", "doc_id", ["apple"], k=2).collect()
    )
    assert got[0] == (1, 1)
    assert got[1] == (2, 3)


def test_mmr_first_pick_is_plain_argmax(spark, sf_dir):
    """Pick 1 carries no diversity penalty, so it must equal the top-1
    of the relevance ranking — ties to the retrieval path."""
    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators.retrieval import mmr_rerank, retrieve_chunks
    from hash_db_spark.queries.text_queries import RETRIEVE_TERMS

    docs = load_table(spark, sf_dir, "documents")
    mmr1 = (
        mmr_rerank(docs, "text", "doc_id", RETRIEVE_TERMS, k=1)
        .collect()[0]
    )
    assert mmr1.sel_rank == 1 and mmr1.rel > 0


def test_retrieve_mmr_oracle_parity(spark, sf_dir):
    """Driver-style compare for the r10-queued retrieve_mmr_topk entry:
    every greedy pick identical on both engines (exact ints, so any
    divergence would be a real bug, not float noise)."""
    import duckdb

    from hash_db_spark.queries.text_queries import (
        _retrieve_mmr_oracle,
        q_retrieve_mmr_topk,
    )

    got = sorted(tuple(r) for r in q_retrieve_mmr_topk(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(_retrieve_mmr_oracle()).fetchall()
    )
    con.close()
    assert got == want and len(got) == 5
    # 5 distinct chunks, ranks 1..5
    assert sorted(r[0] for r in got) == [1, 2, 3, 4, 5]
    assert len({(i, c) for _, i, c, _ in got}) == 5


def test_mmr_quantitatively_diversifies(spark, sf_dir):
    """The point of MMR, measured: mean pairwise similarity (exact-int
    dot) inside the MMR top-5 must be <= that of the plain relevance
    top-5 drawn from the same pool."""
    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators.retrieval import (
        hashed_chunk_vectors,
        mmr_rerank,
    )
    from hash_db_spark.queries.text_queries import RETRIEVE_TERMS

    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents")
    cv = hashed_chunk_vectors(docs, "text", "doc_id", size=16, overlap=0)

    def mean_pair_dot(members):  # bounded set: drive via one local join
        rows = cv.join(
            cv.sparkSession.createDataFrame(members, ["id", "chunk_idx"]),
            ["id", "chunk_idx"],
        ).collect()
        vecs = {}
        for r in rows:
            vecs.setdefault((r.id, r.chunk_idx), {})[r.dim] = r.val
        ks = list(vecs)
        dots = [
            sum(vecs[a].get(d, 0) * vecs[b][d] for d in vecs[b])
            for i, a in enumerate(ks)
            for b in ks[i + 1:]
        ]
        return sum(dots) / len(dots)

    mmr = [
        (r.id, r.chunk_idx)
        for r in mmr_rerank(docs, "text", "doc_id", RETRIEVE_TERMS, k=5).collect()
    ]
    # plain = top-5 by rel from the same scoring (lambda -> all relevance)
    plain = [
        (r.id, r.chunk_idx)
        for r in mmr_rerank(
            docs, "text", "doc_id", RETRIEVE_TERMS, k=5, pool_n=5
        ).collect()
    ]  # pool of exactly 5 leaves greedy no choice: the relevance top-5
    assert mean_pair_dot(mmr) <= mean_pair_dot(plain)


# --- hybrid RRF fusion --------------------------------------------------------


def test_rrf_fuses_both_rankers(spark):
    """A doc that is #1 lexically and #1 semantically must out-rank a
    doc strong in only one ranker; single-ranker docs still appear."""
    from hash_db_spark.operators.retrieval import hybrid_rrf

    rows = [
        (1, "alpha beta alpha beta alpha beta"),  # strong both ways
        (2, "alpha alpha gamma delta unrelated words here"),  # lexical-ish
        (3, "zeta eta theta iota kappa"),  # matches nothing
        (4, "beta beta beta other stuff padding text"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = hybrid_rrf(df, "text", "doc_id", ["alpha", "beta"], topn=4).collect()
    assert got[0].doc_id == 1
    assert got[0].rank == 1
    by_id = {r.doc_id: r for r in got}
    # doc 3 shares no query term: absent from BM25 (posting filter),
    # but dense cosine still ranks it — strictly below the fused winner
    assert by_id[3].lex_rank is None
    assert by_id[3].rrf_micro < by_id[1].rrf_micro
    # fused key is the exact integer sum of the two quantized terms
    for r in got:
        expect = 0
        for rk in (r.lex_rank, r.sem_rank):
            if rk is not None:
                expect += int(1.0 / (60 + rk) * 1_000_000 + 0.5)
        assert r.rrf_micro == expect


def test_rrf_oracle_parity_fixture(spark, sf_dir):
    import duckdb

    from hash_db_spark.queries.text_queries import (
        _hybrid_rrf_oracle,
        q_retrieve_hybrid_rrf,
    )

    got = [tuple(r) for r in q_retrieve_hybrid_rrf(spark, sf_dir).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(_hybrid_rrf_oracle()).fetchall()]
    con.close()
    assert got == want
    assert len(got) == 10


def test_rrf_plan_is_bounded_after_rankers(spark, sf_dir):
    """Both fusion inputs end in TakeOrderedAndProject (per-partition
    heaps); no cartesian anywhere."""
    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators.retrieval import hybrid_rrf

    docs = load_table(spark, sf_dir, "documents")
    plan = (
        hybrid_rrf(docs, "text", "doc_id", ["spark", "query"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "CartesianProduct" not in plan


def test_rrf_rejects_zero_vector_query(spark):
    """Empty/unhashable term lists must fail loudly in BOTH rankers'
    composition, not return an empty fused frame."""
    import pytest

    from hash_db_spark.operators.retrieval import hybrid_rrf

    df = spark.createDataFrame([(1, "some text")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        hybrid_rrf(df, "text", "doc_id", [])


# --- Rocchio pseudo-relevance feedback -------------------------------------------


def test_prf_pulls_in_cooccurring_vocabulary(spark):
    """The expansion effect itself: doc 20 shares NO query term but
    shares the feedback docs' co-occurring vocabulary; round 1 can't
    rank it, Rocchio round 2 must."""
    rows = [
        # feedback set: query terms + a co-occurring word, 16+ tokens
        (1, " ".join(["spark query join shuffle"] * 4)),
        (2, " ".join(["spark query join shuffle"] * 4)),
        # expansion target: only the co-occurring word, repeated
        (20, " ".join(["shuffle"] * 16)),
        # distractor: unrelated vocabulary
        (30, " ".join(["apple banana cherry date"] * 4)),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    r1 = {
        (r.id, r.chunk_idx): r.cos
        for r in RT.retrieve_chunks(docs, "text", "doc_id", TERMS, k=10).collect()
    }
    r2rows = RT.prf_rocchio_retrieve(
        docs, "text", "doc_id", TERMS, k=10, k0=2
    ).collect()
    r2 = {(r.id, r.chunk_idx): r.cos for r in r2rows}
    ranks = {(r.id, r.chunk_idx): r.rank for r in r2rows}
    doc20_r2 = [k for k in r2 if k[0] == 20]
    assert doc20_r2, "expansion failed to retrieve the co-occurring doc"
    # round 2: doc 20 must STRICTLY outrank the unrelated distractor
    d20 = min(ranks[k] for k in doc20_r2)
    assert all(d20 < ranks[k] for k in ranks if k[0] == 30)
    # and the expansion must have grown doc 20's margin over doc 30:
    # round 1 scores them (near-)equal (neither matches the query),
    # round 2 separates them by the feedback vocabulary
    m1 = max(r1.get(k, 0.0) for k in doc20_r2) - max(
        (r1[k] for k in r1 if k[0] == 30), default=0.0
    )
    m2 = max(r2[k] for k in doc20_r2) - max(
        (r2[k] for k in r2 if k[0] == 30), default=0.0
    )
    assert m2 > m1 + 0.1, (m1, m2)


def test_prf_zero_query_raises(spark):
    docs = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    import pytest as _pt

    with _pt.raises(ValueError):
        RT.prf_rocchio_retrieve(docs, "text", "doc_id", [], k=3)


def test_prf_oracle_parity(spark, sf_dir):
    from hash_db_spark.queries.text_queries import (
        _retrieve_prf_oracle,
        q_retrieve_prf_rocchio,
    )

    got = sorted(tuple(r) for r in q_retrieve_prf_rocchio(spark, sf_dir).collect())
    assert len(got) > 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(_retrieve_prf_oracle()).fetchall()
    )
    con.close()
    assert got == want
