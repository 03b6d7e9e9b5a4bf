"""Unit tests: FTS fold semantics (R5, modeled on the reference's
items.search scenario /root/reference/example.py:296-306) and the
text-analysis function library."""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from hash_db_spark.operators.fts import compile_fts, fts_filter
from hash_db_spark.functions import text as T

ROWS = [
    (1, "blah sentence"),
    (2, "nonsense words here"),
    (3, "blah nonsense"),
    (4, "totally unrelated"),
    (5, "comma,stripped tokens"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, ["id", "search"])


def ids(df):
    return sorted(r.id for r in df.collect())


def test_fts_single_token(docs):
    assert ids(fts_filter(docs, "search", "blah")) == [1, 3]


def test_fts_and(docs):
    assert ids(fts_filter(docs, "search", "blah & nonsense")) == [3]


def test_fts_or(docs):
    # example.py's 'blah | nonsense | notthere' shape.
    assert ids(fts_filter(docs, "search", "blah | nonsense | notthere")) == [1, 2, 3]


def test_fts_mode_switch_applies_to_subsequent_terms(docs):
    # 'blah | nonsense & here' folds ((blah OR nonsense) AND here) → only 2.
    assert ids(fts_filter(docs, "search", "blah | nonsense & here")) == [2]


def test_fts_comma_stripped_at_index_time(docs):
    # Reference strips commas when building postings (server.py:733):
    # 'comma,stripped' indexes as token 'commastripped'.
    assert ids(fts_filter(docs, "search", "commastripped")) == [5]
    assert ids(fts_filter(docs, "search", "comma")) == []


def test_fts_empty_query_raises(docs):
    with pytest.raises(ValueError):
        compile_fts("search", "")


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "a bb a ccc")], ["id", "t"])
    row = df.select(
        T.token_count("t").alias("n"),
        T.distinct_token_count("t").alias("d"),
        T.avg_token_length("t").alias("avg"),
        T.lexical_diversity("t").alias("div"),
    ).collect()[0]
    assert row.n == 4
    assert row.d == 3
    assert row.avg == pytest.approx(7 / 4)
    assert row.div == pytest.approx(0.75)


def test_lang_id_markers_and_tie_priority(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the hat"),   # en
            (2, "le chat et la mer"),      # fr
            (3, "xyz qqq zzz"),            # no markers → und
            (4, "the le"),                 # 1-1 tie → priority order (en)
        ],
        ["id", "t"],
    )
    got = {r.id: r.g for r in df.select("id", T.lang_id("t").alias("g")).collect()}
    assert got == {1: "en", 2: "fr", 3: "und", 4: "en"}


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [
            (1, "Hello,  World"),
            (2, "hello world"),   # same after normalization
            (3, "world hello"),   # same bag, different order
        ],
        ["id", "t"],
    )
    rows = {
        r.id: (r.fp, r.bag)
        for r in df.select(
            "id",
            T.fingerprint("t").alias("fp"),
            T.bag_fingerprint("t").alias("bag"),
        ).collect()
    }
    assert rows[1][0] == rows[2][0]   # exact fingerprint normalizes case/commas/spaces
    assert rows[1][0] != rows[3][0]   # order matters for exact fp
    assert rows[1][1] == rows[3][1]   # bag fingerprint is order-insensitive


def test_phrase_match_adjacency(spark):
    """Phrase match requires consecutive in-order tokens, not mere
    co-occurrence; repeated tokens and boundary positions covered."""
    from hash_db_spark.operators.fts import phrase_filter

    rows = [
        (1, "the quick brown fox"),
        (2, "brown the quick fox"),     # co-occurring, wrong order
        (3, "quick brown"),             # exact at boundaries
        (4, "x quick quick brown y"),   # repeated first word
        (5, "quick"),                   # shorter than the phrase
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {r.id for r in phrase_filter(df, "t", "quick brown").collect()}
    assert got == {1, 3, 4}
    single = {r.id for r in phrase_filter(df, "t", "quick").collect()}
    assert single == {1, 2, 3, 4, 5}


# --- encoding-quality gate ---------------------------------------------------


def test_encoding_gate_controlled_strings(spark):
    """Each corruption class counted independently; clean text passes."""
    from hash_db_spark.functions import text as T

    rows = [
        (1, "perfectly clean ascii text"),
        (2, "lossy � decode � here"),
        (3, "bell\x07 and null\x00 bytes"),
        (4, "cafÃ© and qâ€™s mojibake"),
        (5, "tabs\tand\nnewlines\rare fine"),
    ]
    df = spark.createDataFrame(rows, ["id", "t"])
    got = {
        r.id: (r.nr, r.nc, r.nm, r.ok)
        for r in df.select(
            "id",
            T.replacement_char_count("t").alias("nr"),
            T.control_char_count("t").alias("nc"),
            T.mojibake_marker_count("t").alias("nm"),
            T.encoding_ok("t").alias("ok"),
        ).collect()
    }
    assert got[1] == (0, 0, 0, True)
    assert got[2] == (2, 0, 0, False)
    assert got[3] == (0, 2, 0, False)
    assert got[4] == (0, 0, 2, False)
    assert got[5] == (0, 0, 0, True)


def test_text_encoding_gate_oracle_parity(spark, sf_dir):
    """Driver-style compare for the r10-queued text_encoding_gate entry."""
    import duckdb

    from hash_db_spark.queries.text_queries import (
        _text_encoding_gate_oracle,
        q_text_encoding_gate,
    )

    got = sorted(tuple(r) for r in q_text_encoding_gate(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(_text_encoding_gate_oracle()).fetchall()
    )
    con.close()
    assert got == want
    # the synthetic corruption families are actually flagged
    assert any(not ok for *_, ok in got)
    assert any(ok for *_, ok in got)


# --- posting-list FTS serving ------------------------------------------------


def test_fts_index_probe_matches_scan(spark, sf_dir, tmp_path):
    """Serve == scan on all three fold shapes, and the probe plan prunes
    to the term buckets (PartitionFilters on tok_bucket)."""
    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators.fts import fts_filter, fts_index_query
    from hash_db_spark.plans.inspect import formatted_plan
    from hash_db_spark.queries.text_queries import FTS_AND, FTS_MIXED, FTS_OR
    from hash_db_spark.sources.writers import write_fts_index

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "fts_idx")
    write_fts_index(docs, path)
    for q in (FTS_AND, FTS_OR, FTS_MIXED):
        served = fts_index_query(spark, path, q)
        scanned = sorted(
            r.doc_id for r in fts_filter(docs, "text", q).select("doc_id").collect()
        )
        assert sorted(r.doc_id for r in served.collect()) == scanned
        assert len(scanned) > 0
    plan = formatted_plan(fts_index_query(spark, path, FTS_AND))
    pf = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "tok_bucket" in pf  # term buckets prune partitions


def test_fts_serve_mixed_oracle_parity(spark, sf_dir):
    """Driver-style compare for the r10-queued fts_serve_mixed entry
    (same oracle as the registered fts_mixed scan entry)."""
    import duckdb

    from hash_db_spark.queries.text_queries import (
        FTS_MIXED,
        _fts_oracle,
        q_fts_serve_mixed,
    )

    got = sorted(r.doc_id for r in q_fts_serve_mixed(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        r[0] for r in con.execute(_fts_oracle(FTS_MIXED, "doc_id")).fetchall()
    )
    con.close()
    assert got == want and len(got) > 0


def test_fts_index_append_and_guard(spark, sf_dir, tmp_path):
    """Appending a second batch makes its docs servable; a modulus
    mismatch or torn index refuses the append (the minhash/dhash
    append-guard discipline)."""
    import pytest
    import pyspark.sql.functions as F

    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators.fts import fts_index_query
    from hash_db_spark.sources.writers import write_fts_index

    docs = load_table(spark, sf_dir, "documents")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "fts_inc")
    write_fts_index(first, path)
    n1 = fts_index_query(spark, path, "spark | query").count()
    write_fts_index(second, path, mode="append")
    n2 = fts_index_query(spark, path, "spark | query").count()
    assert n2 > n1
    # full-index parity with a one-shot build
    full_path = str(tmp_path / "fts_full")
    write_fts_index(docs, full_path)
    assert sorted(
        r.doc_id for r in fts_index_query(spark, path, "spark | query").collect()
    ) == sorted(
        r.doc_id
        for r in fts_index_query(spark, full_path, "spark | query").collect()
    )
    with pytest.raises(ValueError, match="token_buckets"):
        write_fts_index(second, path, token_buckets=32, mode="append")


def test_streaming_fts_ingest_matches_batch_build(spark, sf_dir, tmp_path):
    """Stream the corpus in 3 micro-batches through the foreachBatch
    indexing loop: the final index must serve every fold shape exactly
    like a one-shot batch build."""
    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators.fts import fts_index_query
    from hash_db_spark.queries.text_queries import FTS_MIXED, FTS_OR
    from hash_db_spark.sources.writers import write_fts_index
    from hash_db_spark.streaming import windows as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_parts")
    docs.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    idx = str(tmp_path / "fts_stream_idx")
    q = W.streaming_fts_ingest(
        stream, index_path=idx, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    batch_idx = str(tmp_path / "fts_batch_idx")
    write_fts_index(docs, batch_idx)
    for query in (FTS_OR, FTS_MIXED):
        got = sorted(r.doc_id for r in fts_index_query(spark, idx, query).collect())
        want = sorted(
            r.doc_id for r in fts_index_query(spark, batch_idx, query).collect()
        )
        assert got == want and len(got) > 0


# --- text normalization --------------------------------------------------


def test_normalize_text_rules_and_idempotence(spark):
    """Each fold rule on controlled strings; normalize(normalize(x)) ==
    normalize(x); post-normalization the encoding gate's control
    counter reads zero."""
    from hash_db_spark.functions import text as T

    rows = [
        (1, "a‘b’ “q”  x–y—z… n b"),
        (2, "ctl\x07 and\x00 null"),
        (3, "  lots   of\t\twhitespace \n here  "),
        (4, "already clean ascii"),
    ]
    df = spark.createDataFrame(rows, ["i", "t"])
    out = df.select(
        "i",
        T.normalize_text("t").alias("n1"),
        T.normalize_text(T.normalize_text("t")).alias("n2"),
        T.control_char_count(T.normalize_text("t")).alias("nc"),
    )
    got = {r.i: (r.n1, r.n2, r.nc) for r in out.collect()}
    assert got[1][0] == 'a\'b\' "q" x-y-z... n b'
    assert got[2][0] == "ctl and null"
    assert got[3][0] == "lots of whitespace here"
    assert got[4][0] == "already clean ascii"
    for n1, n2, nc in got.values():
        assert n1 == n2 and nc == 0


def test_text_normalize_oracle_parity(spark, sf_dir):
    """Character-for-character parity on the corrupted wire corpus for
    the r11-candidate text_normalize entry."""
    import duckdb

    from hash_db_spark.queries.text_queries import (
        _text_normalize_oracle,
        q_text_normalize,
    )

    got = sorted(tuple(r) for r in q_text_normalize(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(_text_normalize_oracle()).fetchall()
    )
    con.close()
    assert got == want and len(got) == 500


def test_tokenizer_fertility_oracle_parity(spark, sf_dir):
    """Parity for the r11-candidate tokenizer_fertility, plus the
    domain law: fertility >= 1 (a word is at least one subword)."""
    import duckdb

    from hash_db_spark.queries.text_queries import (
        _tokenizer_fertility_oracle,
        q_tokenizer_fertility,
    )

    got = sorted(tuple(r) for r in q_tokenizer_fertility(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(_tokenizer_fertility_oracle()).fetchall()
    )
    con.close()
    assert got == want and len(got) >= 3
    for _, n_docs, words, subwords, fert in got:
        assert n_docs > 0 and words > 0
        assert subwords >= words and fert >= 1.0


class TestBurstiness:
    def test_bursty_term_outranks_uniform_term(self, spark):
        """'burst' appears 5x in each of 5 docs (of 25); 'flat' once in
        every doc — same total mass, wildly different dispersion."""
        from hash_db_spark.operators import corpus_stats as CS

        rows = [
            (i, ("burst " * 5 if i < 5 else "pad ") + "flat")
            for i in range(25)
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {
            r.tok: r
            for r in CS.term_burstiness(
                docs, "text", "doc_id", min_df=5, topn=10
            ).collect()
        }
        assert got["burst"].vmr_micro > got["flat"].vmr_micro
        assert got["flat"].vmr_micro < 1_000_000  # under-dispersed
        assert got["burst"].rank < got["flat"].rank

    def test_oracle_parity_fixture(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.text_queries import (
            _term_burstiness_oracle,
            q_term_burstiness,
        )

        got = [tuple(r) for r in q_term_burstiness(spark, sf_dir).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = [
            tuple(r)
            for r in con.execute(_term_burstiness_oracle()).fetchall()
        ]
        con.close()
        assert got == want and len(got) > 0


class TestHeapsFit:
    def test_open_vocab_beta_near_one_closed_near_zero(self, spark):
        """Every-token-unique corpus: vocab == tokens at every level,
        so the log-log slope is exactly 1. Closed 3-word corpus:
        vocab constant, slope 0."""
        from hash_db_spark.operators import corpus_stats as CS

        uniq = spark.createDataFrame(
            [(i, f"w{i}a w{i}b w{i}c w{i}d") for i in range(64)],
            ["doc_id", "text"],
        )
        rows = CS.vocab_heaps_fit(uniq, "text", "doc_id").collect()
        assert len(rows) >= 4
        assert all(r.beta_micro == 1_000_000 for r in rows)
        assert all(r.vocab == r.n_tokens for r in rows)

        closed = spark.createDataFrame(
            [(i, "aa bb cc aa bb cc") for i in range(64)],
            ["doc_id", "text"],
        )
        rows = CS.vocab_heaps_fit(closed, "text", "doc_id").collect()
        assert all(r.vocab == 3 for r in rows)
        assert all(r.beta_micro == 0 for r in rows)

    def test_levels_are_nested_halvings(self, spark, sf_dir):
        """Level j+1 is a subset of level j: docs/tokens/vocab all
        non-increasing with depth, and level 0 is the full corpus."""
        from hash_db_spark.catalog import load_table
        from hash_db_spark.operators import corpus_stats as CS

        docs = load_table(spark, sf_dir, "documents")
        rows = CS.vocab_heaps_fit(docs, "text", "doc_id").collect()
        assert rows[0].level == 0
        total = docs.count()
        assert rows[0].n_docs == total  # no empty docs in the fixture
        for a, b in zip(rows, rows[1:]):
            assert b.n_docs <= a.n_docs
            assert b.n_tokens <= a.n_tokens
            assert b.vocab <= a.vocab

    def test_oracle_parity_fixture(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.pipeline_queries import (
            _vocab_heaps_oracle,
            q_vocab_heaps_fit,
        )

        got = [tuple(r) for r in q_vocab_heaps_fit(spark, sf_dir).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = [
            tuple(r) for r in con.execute(_vocab_heaps_oracle()).fetchall()
        ]
        con.close()
        assert got == want and len(got) > 0

    def test_one_token_shuffle_no_big_joins(self, spark, sf_dir):
        from hash_db_spark.queries.pipeline_queries import q_vocab_heaps_fit

        plan = q_vocab_heaps_fit(
            spark, sf_dir
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestVocabOovReport:
    def test_known_and_unknown_slices(self, spark):
        """Vocab = top-2 'en' tokens (freq desc, tok asc tie-break).
        A slice speaking only vocab words reads 0 OOV; a disjoint
        slice reads 100%."""
        from hash_db_spark.operators import corpus_stats as CS

        docs = spark.createDataFrame(
            [
                (1, "en", "aa aa aa bb bb cc"),   # freqs: aa 3, bb 2, cc 1
                (2, "xx", "aa bb aa bb"),          # fully in vocab
                (3, "yy", "zz qq zz"),             # fully OOV
            ],
            ["doc_id", "lang", "text"],
        )
        got = {
            r.grp: r
            for r in CS.vocab_oov_report(docs, "text", vocab_size=2).collect()
        }
        assert got["xx"].oov_tokens == 0
        assert got["xx"].oov_pct_micro == 0
        assert got["yy"].oov_pct_micro == 1_000_000
        assert got["yy"].type_oov_pct_micro == 1_000_000
        # 'en' itself pays for the budget: cc is out
        assert got["en"].oov_tokens == 1 and got["en"].oov_types == 1

    def test_tie_break_is_lexicographic(self, spark):
        """bb and cc tie at freq 1 with budget for one of them: bb
        (lexicographically first) enters the vocab."""
        from hash_db_spark.operators import corpus_stats as CS

        docs = spark.createDataFrame(
            [(1, "en", "aa aa cc bb"), (2, "xx", "bb"), (3, "yy", "cc")],
            ["doc_id", "lang", "text"],
        )
        got = {
            r.grp: r
            for r in CS.vocab_oov_report(docs, "text", vocab_size=2).collect()
        }
        assert got["xx"].oov_tokens == 0  # bb in vocab
        assert got["yy"].oov_tokens == 1  # cc out

    def test_oracle_parity_fixture(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.pipeline_queries import (
            _vocab_oov_oracle,
            q_vocab_oov_report,
        )

        got = [tuple(r) for r in q_vocab_oov_report(spark, sf_dir).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = [
            tuple(r) for r in con.execute(_vocab_oov_oracle()).fetchall()
        ]
        con.close()
        assert got == want and len(got) == 5  # the fixture's 5 langs
        for _, n_tok, oov_tok, _, n_ty, oov_ty, _ in got:
            assert 0 <= oov_tok <= n_tok and 0 <= oov_ty <= n_ty

    def test_vocab_join_broadcasts(self, spark, sf_dir):
        from hash_db_spark.queries.pipeline_queries import q_vocab_oov_report

        plan = q_vocab_oov_report(
            spark, sf_dir
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # the V-bounded vocab side
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestEvalNgramCoverage:
    def test_hand_computed_curve(self, spark):
        """Bench doc 'a b c d'; corpus contains all its unigrams and
        bigrams, one of two trigrams, no 4-gram."""
        import pyspark.sql.functions as F

        from hash_db_spark.operators import corpus_stats as CS

        docs = spark.createDataFrame(
            [
                (1, "a b c d"),             # bench
                (10, "a b c x"),            # covers 'a b c', bigrams a b/b c
                (11, "c d y z"),            # covers 'c d'
            ],
            ["doc_id", "text"],
        )
        got = {
            r.n: r
            for r in CS.eval_ngram_coverage(
                docs, "text", "doc_id", F.col("doc_id") < 10
            ).collect()
        }
        assert (got[1].bench_grams, got[1].covered) == (4, 4)
        assert (got[2].bench_grams, got[2].covered) == (3, 3)
        assert (got[3].bench_grams, got[3].covered) == (2, 1)
        assert got[3].coverage_pct_micro == 500_000
        assert (got[4].bench_grams, got[4].covered) == (1, 0)
        assert got[4].coverage_pct_micro == 0

    def test_oracle_parity_fixture(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.text_queries import (
            _eval_ngram_coverage_oracle,
            q_eval_ngram_coverage,
        )

        got = [
            tuple(r) for r in q_eval_ngram_coverage(spark, sf_dir).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = [
            tuple(r)
            for r in con.execute(_eval_ngram_coverage_oracle()).fetchall()
        ]
        con.close()
        assert got == want and [r[0] for r in got] == [1, 2, 3, 4]
        for _, bench, covered, pct in got:
            assert 0 <= covered <= bench
            assert 0 <= pct <= 1_000_000
        # the fixture's closed vocab saturates unigrams
        assert got[0][3] == 1_000_000

    def test_bench_set_broadcasts_no_cartesian(self, spark, sf_dir):
        from hash_db_spark.queries.text_queries import q_eval_ngram_coverage

        plan = q_eval_ngram_coverage(
            spark, sf_dir
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
