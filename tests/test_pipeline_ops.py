"""Unit tests for the training-pipeline preparation operators: PII
scrubbing (inline fixtures — the synthetic corpus has no PII shapes),
token chunking, corpus log-frequency scoring, and repeated-span
detection. Oracle parity for the registry queries is covered by
tests/test_oracle_parity.py; these tests pin the operator semantics on
hand-checkable inputs."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from hash_db_spark.functions import scrub
from hash_db_spark.operators import chunking, corpus_stats
from hash_db_spark.operators.dedup import repeated_ngram_spans


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (1, "contact bob.smith+x@example.co.uk or 10.0.0.1 now"),
        (2, "call 555-123-4567 re invoice 42"),
        (3, "clean text with no sensitive content"),
        (4, "a@b.io and 192.168.001.255 and 555 123 4567 and 7"),
    ]
    return spark.createDataFrame(rows, "id long, t string")


def test_redact_masks_all_kinds(pii_df):
    got = {
        r.id: r.red
        for r in pii_df.select(
            "id", scrub.redact("t", ("email", "ipv4", "phone", "number")).alias("red")
        ).collect()
    }
    assert got[1] == "contact <EMAIL> or <IP> now"
    assert got[2] == "call <PHONE> re invoice <NUM>"
    assert got[3] == "clean text with no sensitive content"
    assert got[4] == "<EMAIL> and <IP> and <PHONE> and <NUM>"


def test_redact_single_char_email(spark):
    df = spark.createDataFrame([(1, "a@b.io")], "id long, t string")
    assert (
        df.select(scrub.redact("t", ("email",)).alias("r")).first().r
        == "<EMAIL>"
    )


def test_number_runs_last_and_specific_first(pii_df):
    # With only 'number', the digits inside emails/IPs are eaten.
    red = (
        pii_df.filter("id = 1")
        .select(scrub.redact("t", ("number",)).alias("r"))
        .first()
        .r
    )
    assert "<NUM>.<NUM>.<NUM>.<NUM>" in red


def test_pattern_counts(pii_df):
    got = {
        r.id: (r.ne, r.ni, r.np, r.nn)
        for r in pii_df.select(
            "id",
            scrub.pattern_count("t", "email").alias("ne"),
            scrub.pattern_count("t", "ipv4").alias("ni"),
            scrub.pattern_count("t", "phone").alias("np"),
            scrub.pattern_count("t", "number").alias("nn"),
        ).collect()
    }
    assert got[1] == (1, 1, 0, 4)  # 10.0.0.1 contributes 4 number runs
    assert got[2] == (0, 0, 1, 4)
    assert got[3] == (0, 0, 0, 0)


def test_redact_unknown_kind_raises():
    with pytest.raises(ValueError, match="unknown scrub kinds"):
        scrub.redact(F.lit("x"), ("ssn",))


@pytest.fixture(scope="module")
def chunk_df(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(20))),  # 20 tokens
        (2, "a b c"),  # shorter than one chunk
        (3, ""),  # no tokens -> no chunks
    ]
    return spark.createDataFrame(rows, "id long, t string")


def test_token_chunks_windows(chunk_df):
    out = chunking.token_chunks(chunk_df, "t", "id", size=16, overlap=4)
    rows = {(r.id, r.chunk_idx): r for r in out.collect()}
    # doc 1: starts at token 1 and 13 (stride 12)
    assert rows[(1, 0)].n_tokens == 16
    assert rows[(1, 0)].chunk_text.startswith("t0 t1 ")
    assert rows[(1, 1)].n_tokens == 8  # tokens 13..20
    assert rows[(1, 1)].chunk_text == "t12 t13 t14 t15 t16 t17 t18 t19"
    # overlap: last 4 of chunk 0 are first 4 of chunk 1
    assert rows[(1, 0)].chunk_text.split()[-4:] == rows[(1, 1)].chunk_text.split()[:4]
    assert rows[(2, 0)].chunk_text == "a b c"
    assert not any(k[0] == 3 for k in rows)


def test_token_chunks_rejects_bad_overlap(chunk_df):
    with pytest.raises(ValueError):
        chunking.token_chunks(chunk_df, "t", "id", size=8, overlap=8)


def test_doc_logfreq_score(spark):
    # corpus: 'x' occurs 4 times, 'y' twice, 'z' once
    df = spark.createDataFrame(
        [(1, "x x y"), (2, "x x y z")], "id long, t string"
    )
    got = {
        r.id: (r.n_tokens, r.logfreq_score)
        for r in corpus_stats.doc_logfreq_score(df, "t", "id").collect()
    }
    lx, ly, lz = math.log10(4), math.log10(2), math.log10(1)
    assert got[1] == (3, round((2 * lx + ly) / 3, 6))
    assert got[2] == (4, round((2 * lx + ly + lz) / 4, 6))


def test_repeated_ngram_spans(spark):
    span = "one two three four five six seven eight"
    rows = [
        (1, f"start {span} end"),
        (2, f"{span} trailing words here"),
        (3, "completely different text with no shared span at all"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = repeated_ngram_spans(df, "t", "id", n=8, min_docs=2).collect()
    grams = {r.gram: (r.n_docs, r.doc_ids) for r in out}
    assert grams[span] == (2, [1, 2])
    # no 8-gram of doc 3 repeats
    assert all("different" not in g for g in grams)


def test_n_hop_reach_shortest_and_cycles(spark):
    from hash_db_spark.operators.graph import n_hop_reach

    edges = spark.createDataFrame(
        [
            ("a", "b", "E"),
            ("b", "c", "E"),
            ("c", "a", "E"),  # cycle back to start
            ("b", "d", "E"),
            ("d", "e", "X"),  # different rel
            ("a", "c", "E"),  # shortcut: c reachable at hop 1 and hop 2
        ],
        "src string, dst string, rel string",
    )
    got = {
        r.id: r.hops
        for r in n_hop_reach(edges, "a", max_hops=4).collect()
    }
    # shortest hop wins; the cycle never revisits 'a'; e via X at hop 3
    assert got == {"b": 1, "c": 1, "d": 2, "e": 3}

    only_e = {
        r.id: r.hops
        for r in n_hop_reach(edges, "a", max_hops=4, rels=["E"]).collect()
    }
    assert only_e == {"b": 1, "c": 1, "d": 2}

    rev = {
        r.id: r.hops
        for r in n_hop_reach(edges, "c", max_hops=2, reverse=True).collect()
    }
    assert rev == {"b": 1, "a": 1}


def test_pack_chunks_offset_packing(spark):
    rows = [
        ("a", 1, 0, 10),
        ("a", 1, 1, 10),
        ("a", 2, 0, 10),
        ("a", 2, 1, 3),
        ("b", 3, 0, 25),
    ]
    chunks = spark.createDataFrame(
        rows, "lang string, id long, chunk_idx int, n_tokens int"
    )
    got = {
        (r.shard, r.seq_id): (r.n_chunks, r.seq_tokens)
        for r in __import__("hash_db_spark.operators.chunking", fromlist=["x"])
        .pack_chunks(chunks, budget=20, shard_col="lang")
        .collect()
    }
    # shard a offsets: 0,10,20,30 -> seqs 0,0,1,1 ; shard b: offset 0 -> seq 0
    assert got == {("a", 0): (2, 20), ("a", 1): (2, 13), ("b", 0): (1, 25)}


def test_apply_dedup_keep_transitive(spark):
    from hash_db_spark.operators.dedup import apply_dedup_keep

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 7)], "doc_id long, text string"
    )
    # chain 1~2, 2~3 (one cluster -> keep 1) and 5~6 (keep 5); 4 unpaired
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.9), (5, 6, 0.8)],
        "id_a long, id_b long, jac double",
    )
    kept = sorted(r.doc_id for r in apply_dedup_keep(docs, pairs, "doc_id").collect())
    assert kept == [1, 4, 5]


def test_vocab_top_share_exact(spark):
    from hash_db_spark.operators.corpus_stats import vocab_top_share

    df = spark.createDataFrame(
        [(1, "x x x y"), (2, "x y z")], "id long, t string"
    )
    got = [(r.tok, r.freq, r.share) for r in vocab_top_share(df, "t", topn=2).collect()]
    assert got == [("x", 4, round(4 / 7, 6)), ("y", 2, round(2 / 7, 6))]


def test_apply_dedup_keep_no_pairs(spark):
    """No near-dup pairs → every document survives."""
    from hash_db_spark.operators.dedup import apply_dedup_keep

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(3)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([], "id_a long, id_b long, jac double")
    kept = sorted(r.doc_id for r in apply_dedup_keep(docs, pairs, "doc_id").collect())
    assert kept == [0, 1, 2]


def test_bigram_logprob_hand_computed(spark):
    """'a b' x2 and 'a c': P(b|a)=2/3, P(c|a)=1/3 — exact MLE ratios."""
    import math

    from hash_db_spark.operators.corpus_stats import doc_bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo")], ["id", "t"]
    )
    got = {
        r.id: (r.n_bigrams, r.bigram_logprob)
        for r in doc_bigram_logprob(df, "t", "id").collect()
    }
    assert 4 not in got  # <2 tokens → no bigrams → dropped
    assert got[1] == (1, round(math.log10(2 / 3), 6))
    assert got[2] == got[1]
    assert got[3] == (1, round(math.log10(1 / 3), 6))


def test_pack_manifest_consistent_with_pack_chunks(spark):
    """Aggregating the manifest reproduces pack_chunks exactly, and
    start_tok is each chunk's global offset mod budget with chunks
    laid out gap-free in (id, chunk_idx) order within a shard."""
    from hash_db_spark.operators import chunking

    rows = [
        ("en", 1, 0, 10), ("en", 1, 1, 10), ("en", 2, 0, 50),
        ("en", 3, 0, 30), ("de", 9, 0, 7), ("de", 9, 1, 7),
    ]
    chunks = spark.createDataFrame(
        rows, ["lang", "id", "chunk_idx", "n_tokens"]
    )
    manifest = chunking.pack_manifest(chunks, budget=64, shard_col="lang")
    agg = {
        (r.shard, r.seq_id): (r.n, r.toks)
        for r in manifest.groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("toks")
        )
        .collect()
    }
    packed = {
        (r.shard, r.seq_id): (r.n_chunks, r.seq_tokens)
        for r in chunking.pack_chunks(
            chunks, budget=64, shard_col="lang"
        ).collect()
    }
    assert agg == packed
    got = {
        (r.shard, r.id, r.chunk_idx): (r.seq_id, r.start_tok)
        for r in manifest.collect()
    }
    # en layout: offsets 0,10,20,70 -> seqs 0,0,0,1; start_toks 0,10,20,6
    assert got[("en", 1, 0)] == (0, 0)
    assert got[("en", 1, 1)] == (0, 10)
    assert got[("en", 2, 0)] == (0, 20)
    assert got[("en", 3, 0)] == (1, 6)
    assert got[("de", 9, 0)] == (0, 0)
    assert got[("de", 9, 1)] == (0, 7)


def test_pack_unsharded_warns(spark):
    """shard_col=None must warn loudly (single-task funnel), a real
    shard column must not."""
    import warnings

    from hash_db_spark.operators import chunking

    chunks = spark.createDataFrame(
        [(1, 0, 10, "en"), (2, 0, 12, "de")],
        ["id", "chunk_idx", "n_tokens", "lang"],
    )
    with warnings.catch_warnings(record=True) as w:
        # NOTE: resetwarnings()+simplefilter("default") does NOT
        # reinstate CPython's stock ignore::ResourceWarning default
        # filter, so a ResourceWarning WOULD still be recorded here —
        # re-add that stock filter explicitly so this block genuinely
        # simulates default visibility (the original bug emitted
        # ResourceWarning, which users never saw). The class assertion
        # below is the second, belt-and-braces guard.
        warnings.resetwarnings()
        warnings.simplefilter("default")
        warnings.filterwarnings("ignore", category=ResourceWarning)
        chunking.pack_chunks(chunks, budget=16)
        chunking.pack_manifest(chunks, budget=16)
    assert sum("ONE task" in str(x.message) for x in w) == 2
    assert all(issubclass(x.category, RuntimeWarning) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        chunking.pack_chunks(chunks, budget=16, shard_col="lang")
    assert not w


# --- masked-LM example construction ------------------------------------------


def test_mlm_examples_reconstructable_and_parity(spark, sf_dir):
    """The supervision law: substituting each target 'pos:token' back
    into input_text at pos reconstructs the clean token stream exactly;
    mask rate lands near 1/MLM_MOD; full oracle parity."""
    import duckdb

    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators.chunking import (
        MLM_MOD,
        MLM_TOKEN,
        mlm_examples,
        sql_mlm_examples,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = mlm_examples(docs, "text", "doc_id")
    got = {r.id: r for r in out.collect()}
    originals = {
        r.doc_id: r.text.replace(",", "").split()
        for r in docs.select("doc_id", "text").collect()
    }
    masked_total = tokens_total = 0
    for i, r in got.items():
        toks = r.input_text.split(" ")
        for pair in (r.targets.split(" ") if r.targets else []):
            pos, tok = pair.split(":", 1)
            assert toks[int(pos) - 1] == MLM_TOKEN
            toks[int(pos) - 1] = tok
        assert toks == originals[i]
        masked_total += r.n_masked
        tokens_total += len(toks)
    rate = masked_total / tokens_total
    assert abs(rate - 1 / MLM_MOD) < 0.03, rate

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            sql_mlm_examples("documents", "text", "doc_id")
        ).fetchall()
    )
    con.close()
    assert sorted(tuple(r) for r in out.collect()) == want


def test_pack_efficiency_laws_and_parity(spark, sf_dir):
    """Oracle parity for the r11-candidate pack_efficiency, plus the
    packing laws: fill_rate in (0, 1]; n_seqs is exactly
    ceil(total/budget); straddlers < n_chunks (a chunk shorter than the
    budget can't straddle more than one boundary, and the first chunk
    of every shard never straddles from start 0... it can — only
    assert the count stays below the chunk count)."""
    import duckdb
    import math

    from hash_db_spark.queries.pipeline_queries import (
        _pack_efficiency_oracle,
        q_pack_efficiency,
    )

    got = sorted(tuple(r) for r in q_pack_efficiency(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(_pack_efficiency_oracle()).fetchall()
    )
    con.close()
    assert got == want and len(got) >= 3
    for _, n_chunks, total, n_seqs, fill, straddlers in got:
        assert n_seqs == math.ceil(total / 64)
        assert 0 < fill <= 1.0
        assert 0 <= straddlers < n_chunks


class TestCDCChunks:
    def test_resyncs_after_prefix_edit(self, spark):
        """The CDC property fixed-size chunking lacks: a prefix edit
        shifts every token position, yet all chunks after the first
        boundary re-synchronize and hash identically."""
        from hash_db_spark.operators import chunking as CH

        text = (
            "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
            "omega one two three four five six"
        )
        both = spark.createDataFrame(
            [(1, text), (2, "PREFIXA PREFIXB " + text)], ["doc_id", "text"]
        )
        ch = CH.cdc_chunks(both, "text", "doc_id").toPandas()
        h1 = set(ch[ch.id == 1].chunk_hash)
        h2 = set(ch[ch.id == 2].chunk_hash)
        assert len(h1) >= 3
        # every chunk except the edited head region survives
        assert len(h1 & h2) >= len(h1) - 1

    def test_chunks_partition_the_doc(self, spark, sf_dir):
        """Chunk token counts sum to the doc's token count and chunk
        indexes are dense from 0."""
        import pyspark.sql.functions as F

        from hash_db_spark.catalog import load_table
        from hash_db_spark.functions.text import token_count
        from hash_db_spark.operators import chunking as CH

        docs = load_table(spark, sf_dir, "documents").limit(50)
        ch = CH.cdc_chunks(docs, "text", "doc_id")
        per_doc = ch.groupBy("id").agg(
            F.sum("n_toks").alias("s"),
            F.min("chunk_idx").alias("lo"),
            F.max("chunk_idx").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        want = docs.select(
            F.col("doc_id").alias("id"), token_count("text").alias("want_s")
        )
        rows = per_doc.join(want, "id").collect()
        assert rows
        for r in rows:
            assert r.s == r.want_s
            assert r.lo == 0 and r.hi == r.n - 1

    def test_report_parity_with_duckdb(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.operators import chunking as CH
        from hash_db_spark.queries.pipeline_queries import q_cdc_dedup_report

        got = (
            q_cdc_dedup_report(spark, sf_dir)
            .toPandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = (
            con.execute(
                CH.sql_cdc_dedup_report("documents", "text", "doc_id")
            )
            .df()
            .sort_values("id")
            .reset_index(drop=True)
        )
        con.close()
        assert len(got) == len(want) > 0
        for c in ("n_chunks", "n_toks", "shared_chunks", "shared_toks"):
            assert (
                got[c].astype("int64").values == want[c].astype("int64").values
            ).all(), c


class TestLossMask:
    def test_parity_and_bounds(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.operators import chunking as CH
        from hash_db_spark.queries.pipeline_queries import q_train_loss_mask

        got = (
            q_train_loss_mask(spark, sf_dir)
            .toPandas()
            .sort_values(["id", "chunk_idx"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
        )
        want = (
            con.execute(
                CH.sql_loss_mask_report("events", "props", "event_id")
            )
            .df()
            .sort_values(["id", "chunk_idx"])
            .reset_index(drop=True)
        )
        con.close()
        assert len(got) == len(want) > 0
        for c in ("chunk_idx", "n_tokens", "n_masked"):
            assert (
                got[c].astype("int64").values == want[c].astype("int64").values
            ).all(), c
        assert (got.n_masked <= got.n_tokens).all()
        assert (got.n_masked > 0).any()  # the fixture has real hits

    def test_counts_only_redaction_tokens(self, spark):
        from hash_db_spark.operators import chunking as CH

        df = spark.createDataFrame(
            [(1, "mail me at bob@x.io or call 555-123-4567 today ok")],
            ["doc_id", "text"],
        )
        rows = CH.loss_mask_report(
            df, "text", "doc_id", kinds=("email", "phone", "number")
        ).collect()
        # "bob@x.io" -> <EMAIL>, "555-123-4567" -> <PHONE>: 2 masked
        assert sum(r.n_masked for r in rows) == 2


class TestLuhnScrub:
    def test_known_checksums(self, spark):
        """Textbook vectors: real test PANs pass, off-by-one fails."""
        from hash_db_spark.functions import scrub

        rows = [
            (1, "4111111111111111", True),   # Visa test number
            (2, "5500005555555559", True),   # MC test number
            (3, "4111111111111112", False),  # last digit bumped
            (4, "1234567890123456", False),
        ]
        df = spark.createDataFrame(rows, ["id", "pan", "expect"])
        got = df.select(
            "id", "expect", scrub.luhn_valid(df.pan).alias("ok")
        ).collect()
        assert all(r.ok == r.expect for r in got)

    def test_redacts_only_valid(self, spark):
        from hash_db_spark.functions import scrub

        df = spark.createDataFrame(
            [(1, "a 4111111111111111 b 4111111111111112 c")], ["id", "t"]
        )
        red = df.select(scrub.redact_pan("t").alias("r")).collect()[0].r
        assert red == "a <PAN> b 4111111111111112 c"

    def test_oracle_parity_fixture(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.pipeline_queries import (
            _scrub_luhn_oracle,
            q_scrub_luhn,
        )

        got = sorted(tuple(r) for r in q_scrub_luhn(spark, sf_dir).collect())
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r) for r in con.execute(_scrub_luhn_oracle()).fetchall()
        )
        con.close()
        assert got == want
        # ~1/10 of random check digits pass Luhn — both classes present
        n_valid = sum(r[2] for r in got)
        assert 0 < n_valid < len(got) / 5

    def test_map_side_only(self, spark, sf_dir):
        from hash_db_spark.catalog import load_table
        from hash_db_spark.queries.pipeline_queries import q_scrub_luhn

        plan = (
            q_scrub_luhn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan  # pure projection, no shuffle


class TestDriftPsi:
    def test_identical_populations_zero_psi(self, spark):
        import pyspark.sql.functions as F

        from hash_db_spark.operators import corpus_stats as CS

        df = spark.createDataFrame(
            [(i, 100 + i % 5) for i in range(50)], ["doc_id", "n_chars"]
        )
        bucket = (F.col("n_chars") % 5).cast("int")
        rows = {r.bucket: r for r in CS.drift_psi(df, df, bucket).collect()}
        assert rows[-1].psi_micro == 0  # identical dists -> psi == 0

    def test_disjoint_populations_major_drift(self, spark):
        import pyspark.sql.functions as F

        from hash_db_spark.operators import corpus_stats as CS

        ref = spark.createDataFrame([(i, 0) for i in range(40)], ["id", "b"])
        cur = spark.createDataFrame([(i, 1) for i in range(40)], ["id", "b"])
        rows = {
            r.bucket: r
            for r in CS.drift_psi(ref, cur, F.col("b").cast("int")).collect()
        }
        assert rows[-1].psi_micro > 250_000  # >> 0.25 rule of thumb

    def test_oracle_parity_and_stability_baseline(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.pipeline_queries import (
            _corpus_drift_psi_oracle,
            q_corpus_drift_psi,
        )

        got = sorted(
            tuple(r) for r in q_corpus_drift_psi(spark, sf_dir).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(_corpus_drift_psi_oracle()).fetchall()
        )
        con.close()
        assert got == want
        total = [r for r in got if r[0] == -1][0]
        assert 0 <= total[3] < 100_000  # even/odd split: psi << 0.1


class TestContextFitReport:
    def test_hand_computed_economics(self, spark):
        """3 docs of 2/5/8 tokens at L=4: truncation loses (5-4)+(8-4)=5
        of 15 tokens; naive padding wastes 12-10=2 of 12 slots; ideal
        packing needs ceil(10/4)=3 sequences wasting 2 of 12."""
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b c d e"), (3, "a b c d e f g h")],
            ["doc_id", "text"],
        )
        rows = chunking.context_fit_report(docs, "text", lens=(4,)).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.context_len, r.n_docs, r.docs_truncated) == (4, 3, 2)
        assert (r.tokens_total, r.tokens_lost) == (15, 5)
        assert r.lost_pct_micro == 333333  # 5/15
        assert r.pad_pct_micro == 166667  # 2/12
        assert r.packed_seqs == 3
        assert r.packed_pad_pct_micro == 166667  # 2/12

    def test_empty_docs_excluded_and_lens_ordered(self, spark):
        docs = spark.createDataFrame(
            [(1, ""), (2, "x y z")], ["doc_id", "text"]
        )
        rows = chunking.context_fit_report(
            docs, "text", lens=(8, 2)
        ).collect()
        assert [r.context_len for r in rows] == [2, 8]
        assert all(r.n_docs == 1 for r in rows)
        # L=8 fits everything: zero loss, ideal packing = 1 sequence
        fit = rows[1]
        assert fit.tokens_lost == 0 and fit.lost_pct_micro == 0
        assert fit.packed_seqs == 1

    def test_oracle_parity_fixture(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.pipeline_queries import (
            _context_fit_oracle,
            q_context_fit_report,
        )

        got = [tuple(r) for r in q_context_fit_report(spark, sf_dir).collect()]
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = [
            tuple(r) for r in con.execute(_context_fit_oracle()).fetchall()
        ]
        con.close()
        assert got == want and len(got) == len(chunking.CONTEXT_LENS)
        # packing never wastes more than naive padding; truncation loss
        # decreases monotonically with L
        for r_ in got:
            assert r_[8] <= r_[6]
        losses = [r_[5] for r_ in got]
        assert losses == sorted(losses, reverse=True)

    def test_single_shuffle_no_joins(self, spark, sf_dir):
        from hash_db_spark.queries.pipeline_queries import q_context_fit_report

        plan = q_context_fit_report(
            spark, sf_dir
        )._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan and "CartesianProduct" not in plan
        # one reduction keyed by L plus the output ordering
        assert plan.count("Exchange hashpartitioning") <= 1


class TestSecretScrub:
    """Entropy-gated credential scrubbing
    (functions/scrub.py:secret_exprs)."""

    def test_entropy_known_values(self, spark):
        from hash_db_spark.functions.scrub import shannon_entropy

        df = spark.createDataFrame(
            [("aaaa",), ("abab",), ("abcd",)], ["s"]
        )
        got = {
            r.s: r.h
            for r in df.select(
                "s", F.round(shannon_entropy("s"), 6).alias("h")
            ).collect()
        }
        assert got["aaaa"] == 0.0
        assert got["abab"] == 1.0
        assert got["abcd"] == 2.0

    def test_hex_key_caught_filler_spared(self, spark):
        """An md5 hex key (entropy ~3.7+) is redacted; a 24-char 'ab'
        filler (entropy 1.0) and normal words are untouched."""
        import hashlib

        from hash_db_spark.functions.scrub import secret_exprs

        key = hashlib.md5(b"0").hexdigest()
        txt = f"hello api_key {key} pad {'ab' * 12} world"
        df = spark.createDataFrame([(1, txt)], ["id", "t"])
        n_c, n_v, max_e, red = secret_exprs("t")
        r = df.select(
            n_c.alias("nc"), n_v.alias("nv"),
            max_e.alias("me"), red.alias("red"),
        ).collect()[0]
        assert r.nc == 2  # key + filler are both candidate-shaped
        assert r.nv == 1  # only the key clears the entropy gate
        assert r.me > 3.0
        assert key not in r.red and "<SECRET>" in r.red
        assert "ab" * 12 in r.red  # decoy survives

    def test_no_candidates_is_clean(self, spark):
        from hash_db_spark.functions.scrub import secret_exprs

        df = spark.createDataFrame([(1, "just short words here")], ["id", "t"])
        n_c, n_v, max_e, red = secret_exprs("t")
        r = df.select(
            n_c.alias("nc"), n_v.alias("nv"),
            max_e.alias("me"), red.alias("red"),
        ).collect()[0]
        assert (r.nc, r.nv, r.me) == (0, 0, 0.0)
        assert r.red == "just short words here"

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.pipeline_queries import (
            _scrub_secrets_oracle,
            q_scrub_secrets,
        )

        got = sorted(tuple(r) for r in q_scrub_secrets(spark, sf_dir).collect())
        assert len(got) > 0
        assert all(r[2] >= 1 for r in got)  # every doc's planted key found
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(_scrub_secrets_oracle()).fetchall()
        )
        con.close()
        assert got == want


class TestPplTertiles:
    """CCNet head/middle/tail bucketing
    (operators/corpus_stats.py:ppl_tertile_buckets)."""

    def test_buckets_partition_and_order(self, spark):
        """9 docs, one language, engineered score spread: tertiles are
        3/3/3 and every head score >= every middle >= every tail."""
        from hash_db_spark.operators.corpus_stats import ppl_tertile_buckets

        # common bigram 'a b' is high-probability; rare suffixes lower
        # a doc's mean logprob the more of them it has
        rows = []
        for i in range(9):
            common = ["a b"] * (9 - i)
            rare = [f"z{i} y{i}"] * (i + 1)
            rows.append((i, "en", " ".join(common + rare)))
        df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
        got = ppl_tertile_buckets(df, "text", "doc_id").collect()
        by_bucket = {}
        for r in got:
            by_bucket.setdefault(r.ppl_bucket, []).append(r.bigram_logprob)
        assert {k: len(v) for k, v in by_bucket.items()} == {
            "head": 3, "middle": 3, "tail": 3,
        }
        assert min(by_bucket["head"]) >= max(by_bucket["middle"])
        assert min(by_bucket["middle"]) >= max(by_bucket["tail"])

    def test_per_language_cutoffs_are_independent(self, spark):
        """A language whose docs all score identically lands entirely
        in 'head' (score == both cutoffs) regardless of the other
        language's spread."""
        from hash_db_spark.operators.corpus_stats import ppl_tertile_buckets

        rows = [(i, "xx", "a b a b a b") for i in range(4)]
        rows += [(10 + i, "yy", " ".join([f"w{j}{i} v{j}{i}" for j in range(4)])) for i in range(4)]
        df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
        got = ppl_tertile_buckets(df, "text", "doc_id").collect()
        xx = [r for r in got if r.lang == "xx"]
        assert xx and all(r.ppl_bucket == "head" for r in xx)

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.operators import corpus_stats
        from hash_db_spark.queries.pipeline_queries import (
            q_ppl_tertile_buckets,
        )

        got = sorted(tuple(r) for r in q_ppl_tertile_buckets(spark, sf_dir).collect())
        assert len(got) > 0
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(
                corpus_stats.sql_ppl_tertile_buckets(
                    "documents", "text", "doc_id"
                )
            ).fetchall()
        )
        con.close()
        assert got == want


class TestT5SpanCorruption:
    """Block-addressed span corruption
    (operators/chunking.py:t5_span_examples)."""

    def test_reconstruction_law(self, spark):
        """Input + targets reconstruct the original: substituting each
        sentinel's target span back into the input yields the clean
        token stream — for every doc in a 30-doc corpus."""
        from hash_db_spark.operators.chunking import t5_span_examples

        rows = [
            (i, " ".join(f"w{i}x{j}" for j in range(5 + (i * 7) % 23)))
            for i in range(30)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = t5_span_examples(df, "text", "doc_id").collect()
        assert len(got) == 30
        orig = dict(rows)
        corrupted = 0
        for r in got:
            spans = {}
            if r.targets:
                parts = r.targets.split(" ")
                cur = None
                for p in parts:
                    if p.startswith("<extra_id_"):
                        cur = p
                        spans[cur] = []
                    else:
                        spans[cur].append(p)
            rebuilt = []
            for tok in r.input_text.split(" "):
                if tok.startswith("<extra_id_"):
                    rebuilt.extend(spans[tok])
                else:
                    rebuilt.append(tok)
            assert " ".join(rebuilt) == orig[r.id], r.id
            assert r.n_spans == len(spans)
            corrupted += r.n_spans
        assert corrupted > 0  # the corpus actually exercises corruption

    def test_sentinels_numbered_in_order(self, spark):
        """Sentinels appear as <extra_id_0>, <extra_id_1>, ... in
        stream order, identically numbered in input and targets."""
        from hash_db_spark.operators.chunking import t5_span_examples

        rows = [(1, " ".join(f"t{j}" for j in range(64)))]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        r = t5_span_examples(df, "text", "doc_id").collect()[0]
        in_sents = [t for t in r.input_text.split(" ") if t.startswith("<extra")]
        tgt_sents = [t for t in r.targets.split(" ") if t.startswith("<extra")]
        assert in_sents == tgt_sents
        assert in_sents == [f"<extra_id_{i}>" for i in range(len(in_sents))]

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.text_queries import (
            _t5_span_oracle,
            q_t5_span_examples,
        )

        got = sorted(tuple(r) for r in q_t5_span_examples(spark, sf_dir).collect())
        assert len(got) > 0
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r) for r in con.execute(_t5_span_oracle()).fetchall()
        )
        con.close()
        assert got == want


class TestCurationFunnel:
    """Gate-cascade survivor funnel
    (queries/pipeline_queries.py:q_curation_funnel_report)."""

    def test_funnel_is_monotone_and_consistent(self, spark, sf_dir):
        from hash_db_spark.queries.pipeline_queries import (
            q_curation_funnel_report,
        )

        rows = sorted(
            q_curation_funnel_report(spark, sf_dir).collect(),
            key=lambda r: r.stage_idx,
        )
        assert [r.stage for r in rows] == [
            "raw", "quality_gate", "near_dup_keep",
        ]
        assert rows[0].n_dropped == 0
        for prev, cur in zip(rows, rows[1:]):
            assert cur.n_docs <= prev.n_docs
            assert cur.n_dropped == prev.n_docs - cur.n_docs
        assert rows[1].n_dropped > 0  # the quality gate bites

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from hash_db_spark.queries.pipeline_queries import (
            _curation_funnel_oracle,
            q_curation_funnel_report,
        )

        got = sorted(
            tuple(r) for r in q_curation_funnel_report(spark, sf_dir).collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(_curation_funnel_oracle()).fetchall()
        )
        con.close()
        assert got == want


def test_stream_secret_scrub_matches_batch(spark, sf_dir):
    """The streaming scrub (stateless projection, availableNow) must
    equal the batch oracle exactly — and flag every doc (each carries
    a planted key)."""
    import duckdb

    from hash_db_spark.queries.pipeline_queries import (
        _stream_secret_scrub_oracle,
        q_stream_secret_scrub,
    )

    got = sorted(tuple(r) for r in q_stream_secret_scrub(spark, sf_dir).collect())
    assert len(got) > 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(_stream_secret_scrub_oracle()).fetchall()
    )
    con.close()
    assert got == want
