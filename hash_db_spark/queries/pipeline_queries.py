"""Driver-checkable queries: training-pipeline preparation operators —
PII scrubbing, token-window chunking, corpus-frequency quality scoring,
repeated-span detection, and custom stateful streaming.

The synthetic documents fixture is plain lowercase words, so the scrub
queries run over events.props (JSON strings with digits — nonzero
redactions); the email/ipv4/phone patterns are exercised on inline
fixtures in tests/test_pipeline_ops.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hash_db_spark.catalog import load_table
from hash_db_spark.functions import scrub
from hash_db_spark.operators import chunking, corpus_stats, lines
from hash_db_spark.operators import dedup as D
from hash_db_spark.queries import Query

CHUNK_SIZE = 16
CHUNK_OVERLAP = 4
SPAN_N = 8

# Line-level dedup instantiation: the synthetic fixture is single-line
# text (no '\n' structure), so "lines" are non-overlapping 2-token
# windows — short enough that the 31-word fixture vocabulary produces
# real cross-document repetition (at sf0.01: 13.7k line instances,
# 944 distinct) instead of a vacuous no-op. On a real corpus the line
# frame comes from split(text, '\n') instead; the operators are
# splitter-agnostic.
LINE_TOKENS = 2
BOILERPLATE_DF = 8


def _line_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = chunking.token_chunks(
        load_table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        size=LINE_TOKENS,
        overlap=0,
    )
    return ch.select(
        "id", F.col("chunk_idx").alias("line_idx"), F.col("chunk_text").alias("line")
    )


def _lines_cte() -> str:
    inner = chunking.sql_token_chunks(
        "documents", "text", "doc_id", size=LINE_TOKENS, overlap=0
    )
    return (
        "lines AS (SELECT id, chunk_idx AS line_idx, chunk_text AS line "
        f"FROM ({inner}))"
    )


def q_line_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lines.line_dedup_docs(_line_frame(spark, sf_dir))


def q_line_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lines.strip_boilerplate_docs(_line_frame(spark, sf_dir), BOILERPLATE_DF)


# Containment cap chosen BELOW the fixture's max line-df (29 at sf0.01)
# so the gate exercises the hot-set correction path, not just the fast
# no-hot branch.
CONTAIN_THRESHOLD = 0.9
CONTAIN_MAX_DF = 20


def q_line_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lines.line_containment_pairs(
        _line_frame(spark, sf_dir), CONTAIN_THRESHOLD, CONTAIN_MAX_DF
    )


def q_line_clean_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lines.line_clean_prep(
        _line_frame(spark, sf_dir), BOILERPLATE_DF, min_lines=2
    )


def q_stream_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming line-level dedup: documents stream -> stateless line
    explode (token windows) -> dropDuplicates on the line value. Only
    the line column is projected, so which instance survives is
    irrelevant (stream_dedup's trick) and the batch oracle is plain
    DISTINCT. State grows with all-time distinct-line cardinality —
    for an unbounded crawl, key the dedup on ingest time and use
    dropDuplicatesWithinWatermark (stream_dedup_within_watermark),
    same trade documented there."""
    from hash_db_spark.streaming import windows as SW

    docs = SW.read_documents_stream(spark, sf_dir)
    ch = chunking.token_chunks(
        docs, "text", "doc_id", size=LINE_TOKENS, overlap=0
    )
    deduped = ch.select(F.col("chunk_text").alias("line")).dropDuplicates(
        ["line"]
    )
    return SW.run_stream_to_memory(deduped, output_mode="append")


def _stream_line_dedup_oracle() -> str:
    inner = chunking.sql_token_chunks(
        "documents", "text", "doc_id", size=LINE_TOKENS, overlap=0
    )
    return f"SELECT DISTINCT chunk_text AS line FROM ({inner})"


def q_stream_line_dedup_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION form of stream_line_dedup (VERDICT r08 #5): the
    same stateless line explode, deduped with dropDuplicatesWithin-
    Watermark so state is GUARANTEED bounded — a line's entry evicts
    once the watermark passes its event time + 1 day, instead of
    growing with all-time distinct-line cardinality. Event time is the
    deterministic synthetic ingest timestamp (closed form over doc_id,
    the synth-payload discipline), so both engines see the same rows.
    Batch parity: under availableNow every row is inside the horizon,
    so the result equals DISTINCT over the line — the same oracle as
    the unbounded form. At-least-once contract: a duplicate arriving
    later than the delay re-emits (stream_dedup_within_watermark's
    documented trade)."""
    from hash_db_spark.streaming import windows as SW

    docs = SW.read_documents_stream(spark, sf_dir)
    ch = chunking.token_chunks(
        docs, "text", "doc_id", size=LINE_TOKENS, overlap=0
    )
    lines_ts = ch.select(
        F.col("chunk_text").alias("line"),
        F.timestamp_seconds(1577836800 + (F.col("id") % 86400)).alias("ts"),
    )
    deduped = SW.stream_dedup_within_watermark(
        lines_ts, ["line"], delay="1 day"
    ).select("line")
    return SW.run_stream_to_memory(deduped, output_mode="append")


# Oracle: identical to _stream_line_dedup_oracle() — the watermark
# changes the STATE bound, not the availableNow result set.


def q_scrub_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        scrub.redact("props", ("email", "ipv4", "number")).alias("redacted"),
    )


SCRUB_REDACT_ORACLE = f"""
SELECT event_id,
       {scrub.sql_redact('props', ('email', 'ipv4', 'number'))} AS redacted
FROM events
"""


def q_scrub_pattern_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        scrub.pattern_count("props", "number").alias("n_number"),
        scrub.pattern_count("props", "email").alias("n_email"),
    ).filter(F.col("n_number") > 0)


SCRUB_COUNTS_ORACLE = f"""
SELECT event_id,
       {scrub.sql_pattern_count('props', 'number')} AS n_number,
       {scrub.sql_pattern_count('props', 'email')} AS n_email
FROM events
WHERE {scrub.sql_pattern_count('props', 'number')} > 0
"""


def q_chunk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunking.token_chunks(
        load_table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        size=CHUNK_SIZE,
        overlap=CHUNK_OVERLAP,
    )


def q_doc_logfreq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_stats.doc_logfreq_score(
        load_table(spark, sf_dir, "documents"), "text", "doc_id"
    )


def q_doc_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_stats.doc_bigram_logprob(
        load_table(spark, sf_dir, "documents"), "text", "doc_id"
    )


def q_lm_perplexity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality gate: score docs under the corpus bigram
    model, drop the worst decile (exact-quantile cutoff, broadcast
    scalar)."""
    return corpus_stats.lm_gate(
        load_table(spark, sf_dir, "documents"), "text", "doc_id"
    )


TOKEN_BUDGET = 6000


def q_select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: take documents in priority order
    (longest first, id tie-break) until the running token count spends
    the budget — distributed global cumsum (operators/rank.take_to_budget),
    no single-task window."""
    from hash_db_spark.functions.text import token_count
    from hash_db_spark.operators.rank import take_to_budget

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", token_count("text").alias("n_toks")
    )
    return take_to_budget(
        docs,
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        "n_toks",
        TOKEN_BUDGET,
    ).select("doc_id", "n_toks", "cum_weight")


def _token_budget_oracle() -> str:
    from hash_db_spark.functions.text import sql_token_count

    return f"""
WITH t AS (
  SELECT doc_id, n_chars, {sql_token_count('text')} AS n_toks FROM documents
)
SELECT doc_id, n_toks, cum_weight FROM (
  SELECT doc_id, n_toks,
         CAST(sum(n_toks) OVER (ORDER BY n_chars DESC, doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_weight
  FROM t
) WHERE cum_weight <= {TOKEN_BUDGET}
"""


STRATUM_BUDGETS = {"en": 3000, "de": 1500, "fr": 800}


def q_mixture_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture assembly under per-language token budgets: within each
    language take the longest docs first until that language's budget is
    spent — ONE partitioned window, no global funnel."""
    from hash_db_spark.functions.text import token_count
    from hash_db_spark.operators.rank import take_to_budget_by_stratum

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", token_count("text").alias("n_toks")
    )
    return take_to_budget_by_stratum(
        docs,
        "lang",
        STRATUM_BUDGETS,
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        "n_toks",
    ).select("doc_id", "lang", "n_toks", "cum_weight")


def _mixture_budget_oracle() -> str:
    from hash_db_spark.functions.text import sql_token_count

    cases = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in STRATUM_BUDGETS.items()
    )
    return f"""
WITH t AS (
  SELECT doc_id, lang, n_chars, {sql_token_count('text')} AS n_toks
  FROM documents
)
SELECT doc_id, lang, n_toks, cum_weight FROM (
  SELECT doc_id, lang, n_toks,
         CAST(sum(n_toks) OVER (PARTITION BY lang
              ORDER BY n_chars DESC, doc_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_weight
  FROM t
) WHERE cum_weight <= CASE lang {cases} ELSE 0 END
"""


def q_dedup_strip_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring scrub (the transformation side of
    dedup_span_grams): documents rewritten with every cross-document
    repeated 8-gram span removed."""
    return D.strip_hot_spans(
        load_table(spark, sf_dir, "documents"), "text", "doc_id", n=SPAN_N
    )


def q_dedup_span_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # doc_ids is surfaced as a joined string: the driver compare sorts
    # rows in pandas and list-typed cells are unhashable there.
    spans = D.repeated_ngram_spans(
        load_table(spark, sf_dir, "documents"), "text", "doc_id", n=SPAN_N
    )
    return spans.select(
        "gram",
        "n_docs",
        F.array_join(F.col("doc_ids").cast("array<string>"), ",").alias(
            "doc_ids"
        ),
    )


def q_stream_stateful_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState per-user running counter, executed with
    availableNow into a memory sink; the single-batch final state equals
    the batch aggregate, which is the oracle."""
    from hash_db_spark.streaming import windows as W

    stream = W.read_events_stream(spark, sf_dir)
    return W.run_stream_to_memory(
        W.stateful_user_counter(stream), output_mode="update"
    )


STATEFUL_ORACLE = """
SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY user_id
"""


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-native session windows (session_window is the
    streaming-capable gap-session operator; the batch equivalent is
    operators/temporal.sessionize, verified separately)."""
    from hash_db_spark.streaming import windows as W

    stream = W.read_events_stream(spark, sf_dir)
    return W.run_stream_to_memory(
        W.session_windows(stream, gap="30 minutes"), output_mode="complete"
    )


# Gap-session islands: a session ends when the next event is more than
# the gap away; win_end = last event + gap (session_window semantics).
STREAM_SESSIONS_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
),
sessions AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT min(ts) AS win_start,
       max(ts) + INTERVAL 30 MINUTE AS win_end,
       user_id,
       count(*) AS n_events
FROM sessions GROUP BY user_id, sid
"""


def q_dedup_apply_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup application: MinHash pairs → clusters → keep one
    representative per cluster; report surviving doc counts per lang."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5)
    kept = D.apply_dedup_keep(docs, pairs, "doc_id")
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


def _apply_keep_oracle() -> str:
    return D.sql_apply_dedup_keep(
        "documents",
        "doc_id",
        D.sql_minhash_lsh_pairs("documents", "text", "doc_id", threshold=0.5),
        "SELECT lang, count(*) AS n_kept",
    ) + " GROUP BY lang"


def q_vocab_top_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_stats.vocab_top_share(
        load_table(spark, sf_dir, "documents"), "text", topn=10
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk documents, then pack chunks into ~64-token training
    sequences per lang shard (offset packing, deterministic order)."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunking.token_chunks(
        docs, "text", "doc_id", size=CHUNK_SIZE, overlap=CHUNK_OVERLAP
    )
    with_lang = chunks.join(
        docs.select(F.col("doc_id").alias("id"), "lang"), "id"
    )
    return chunking.pack_chunks(with_lang, budget=64, shard_col="lang")


def _pack_oracle() -> str:
    chunks = chunking.sql_token_chunks(
        "documents", "text", "doc_id", CHUNK_SIZE, CHUNK_OVERLAP
    )
    with_lang = (
        f"SELECT c.*, d.lang FROM ({chunks}) c "
        f"JOIN documents d ON d.doc_id = c.id"
    )
    return chunking.sql_pack_chunks(with_lang, budget=64, shard_col="lang")


def q_vocab_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-exponent corpus QA: OLS slope/intercept of the log-log
    rank-frequency curve over the whole vocabulary; the frequency rank
    rides the distributed global-rank operator (no single-task
    window)."""
    return corpus_stats.vocab_zipf_fit(
        load_table(spark, sf_dir, "documents"), "text"
    )


def q_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The loader-facing packing manifest: one row per placed chunk
    with its (seq_id, start_tok) position — what a training data
    loader consumes to assemble sequences and cut attention masks,
    without re-deriving the packing."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunking.token_chunks(
        docs, "text", "doc_id", size=CHUNK_SIZE, overlap=CHUNK_OVERLAP
    )
    with_lang = chunks.join(
        docs.select(F.col("doc_id").alias("id"), "lang"), "id"
    )
    return chunking.pack_manifest(with_lang, budget=64, shard_col="lang")


def _pack_manifest_oracle() -> str:
    chunks = chunking.sql_token_chunks(
        "documents", "text", "doc_id", CHUNK_SIZE, CHUNK_OVERLAP
    )
    with_lang = (
        f"SELECT c.*, d.lang FROM ({chunks}) c "
        f"JOIN documents d ON d.doc_id = c.id"
    )
    return chunking.sql_pack_manifest(with_lang, budget=64, shard_col="lang")


def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed ingest gate — the filter stack a corpus actually ships
    through: quality score, language allowlist, token-length band;
    reports pass counts by source."""
    from hash_db_spark.functions.text import quality_score, token_count

    docs = load_table(spark, sf_dir, "documents")
    passed = docs.filter(
        (quality_score("text") >= 0.5)
        & F.col("lang").isin("en", "de", "fr")
        & token_count("text").between(10, 200)
    )
    return passed.groupBy("source").agg(F.count(F.lit(1)).alias("n_pass"))


def _quality_gate_oracle() -> str:
    from hash_db_spark.functions.text import sql_quality_score, sql_token_count

    return f"""
SELECT source, count(*) AS n_pass
FROM documents
WHERE {sql_quality_score('text')} >= 0.5
  AND lang IN ('en', 'de', 'fr')
  AND {sql_token_count('text')} BETWEEN 10 AND 200
GROUP BY source
"""


def q_train_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE end-to-end training-data preparation pipeline as one lazy
    plan: quality gate → MinHash near-dup removal (keep one per
    cluster) → token-window chunking → per-lang sequence packing →
    per-lang sequence/token counts. Every stage is the already-verified
    operator; this entry proves they COMPOSE — one Catalyst plan, no
    driver materialization between stages.

    The dedup stage runs a 32-hash signature (16 bands x 2 rows): at
    threshold 0.5 the s-curve still gives ~0.99 candidate recall
    (1-(1-0.5^2)^16), and the 4x-narrower signature expression cuts the
    composed plan's codegen + compute dominance at gate scale (measured
    10.0s -> 2.2s for the pair stage at sf0.01, identical pair set).
    The standalone dedup_minhash_lsh entry keeps the full 128-hash
    signature."""
    from hash_db_spark.functions.text import quality_score, token_count

    docs = load_table(spark, sf_dir, "documents")
    gated = docs.filter(
        (quality_score("text") >= 0.5)
        & F.col("lang").isin("en", "de", "fr")
        & token_count("text").between(10, 200)
    )
    pairs = D.minhash_lsh_pairs(
        gated, "text", "doc_id", threshold=0.5, num_hashes=32
    )
    kept = D.apply_dedup_keep(gated, pairs, "doc_id")
    chunks = chunking.token_chunks(
        kept, "text", "doc_id", size=CHUNK_SIZE, overlap=CHUNK_OVERLAP
    )
    with_lang = chunks.join(
        kept.select(F.col("doc_id").alias("id"), "lang"), "id"
    )
    packed = chunking.pack_chunks(with_lang, budget=64, shard_col="lang")
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_sequences"),
        F.sum("seq_tokens").cast("long").alias("n_tokens"),
    )


def _train_prep_oracle() -> str:
    from hash_db_spark.functions.text import sql_quality_score, sql_token_count

    gate = (
        "SELECT * FROM documents "
        f"WHERE {sql_quality_score('text')} >= 0.5 "
        "AND lang IN ('en', 'de', 'fr') "
        f"AND {sql_token_count('text')} BETWEEN 10 AND 200"
    )
    pairs_sql = D.sql_minhash_lsh_pairs(
        f"({gate}) gdocs", "text", "doc_id", threshold=0.5, num_hashes=32
    )
    kept_sql = D.sql_apply_dedup_keep(
        f"({gate}) gdocs", "doc_id", pairs_sql, "SELECT *"
    )
    # Hoist the dedup survivors into ONE materialized CTE: the kept set
    # feeds both the chunker and the lang re-join, and inlining the full
    # gate+minhash+components pipeline twice doubled the oracle's cost
    # (the gate pays the oracle's wall time too).
    chunks_sql = chunking.sql_token_chunks(
        "kept", "text", "doc_id", CHUNK_SIZE, CHUNK_OVERLAP
    )
    with_lang = (
        f"SELECT c.*, d.lang FROM ({chunks_sql}) c "
        "JOIN kept d ON d.doc_id = c.id"
    )
    packed = chunking.sql_pack_chunks(with_lang, budget=64, shard_col="lang")
    return (
        f"WITH kept AS MATERIALIZED ({kept_sql}) "
        "SELECT shard, count(*) AS n_sequences, "
        "CAST(sum(seq_tokens) AS BIGINT) AS n_tokens "
        f"FROM ({packed}) p GROUP BY shard"
    )


def q_fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by edit distance: a small probe list (supplier
    names deterministically corrupted — 5th char deleted) matched against
    the supplier table at levenshtein <= 2.

    Scale shape: the probe side of a fuzzy lookup is small by nature, so
    it broadcasts and the corpus is scanned once. A LARGE-large fuzzy
    join needs q-gram blocking (shared-gram equijoin prefilter) first —
    same candidate-then-verify shape as dedup.ngram_jaccard_pairs."""
    sup = load_table(spark, sf_dir, "supplier")
    probes = sup.filter(F.col("s_suppkey") % 97 == 0).select(
        F.col("s_suppkey").alias("probe_key"),
        F.concat(
            F.substring("s_name", 1, 4), F.expr("substring(s_name, 6)")
        ).alias("probe_name"),
    )
    return (
        F.broadcast(probes)
        .join(
            sup,
            F.levenshtein(F.col("probe_name"), F.col("s_name")) <= 2,
        )
        .select(
            "probe_key",
            "s_suppkey",
            F.levenshtein(F.col("probe_name"), F.col("s_name")).alias("dist"),
        )
    )


FUZZY_ORACLE = """
WITH probes AS (
  SELECT s_suppkey AS probe_key,
         substr(s_name, 1, 4) || substr(s_name, 6) AS probe_name
  FROM supplier WHERE s_suppkey % 97 = 0
)
SELECT probe_key, s_suppkey,
       levenshtein(probe_name, s_name) AS dist
FROM probes JOIN supplier ON levenshtein(probe_name, s_name) <= 2
"""




def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production keep policy: per MinHash dup cluster, keep the
    HIGHEST-quality member (quality_score_fast), not the min id —
    (keep_id, cluster, n_members, q) per cluster."""
    from hash_db_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5)
    return D.keep_best_per_cluster(
        docs, pairs, "doc_id", T.quality_score_fast("text")
    )


def _keep_best_oracle() -> str:
    from hash_db_spark.functions import text as T

    return D.sql_keep_best_per_cluster(
        "documents",
        "doc_id",
        D.sql_minhash_lsh_pairs("documents", "text", "doc_id", threshold=0.5),
        T.sql_quality_score_fast("text"),
    )


def q_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report over the loader manifest: per shard,
    sequences used, capacity fill rate, and the chunks that STRADDLE a
    sequence boundary (each straddler forces the loader to split its
    attention span) — the number that decides whether the packing
    budget fits the chunk-length distribution. Pure aggregation of the
    proven pack_manifest placement (one window + one groupBy)."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunking.token_chunks(
        docs, "text", "doc_id", size=CHUNK_SIZE, overlap=CHUNK_OVERLAP
    )
    with_lang = chunks.join(
        docs.select(F.col("doc_id").alias("id"), "lang"), "id"
    )
    m = chunking.pack_manifest(with_lang, budget=64, shard_col="lang")
    return m.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("total_toks"),
        F.expr("(sum(n_tokens) + 63) DIV 64").cast("long").alias("n_seqs"),
        F.round(
            F.sum("n_tokens").cast("double")
            / (F.expr("(sum(n_tokens) + 63) DIV 64") * F.lit(64.0)),
            6,
        ).alias("fill_rate"),
        F.sum(
            F.when(F.col("start_tok") + F.col("n_tokens") > 64, 1).otherwise(0)
        ).cast("long").alias("n_straddlers"),
    )


def _pack_efficiency_oracle() -> str:
    manifest = _pack_manifest_oracle()
    return f"""
SELECT shard,
       count(*) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS total_toks,
       ((sum(n_tokens) + 63) // 64)::BIGINT AS n_seqs,
       round(CAST(sum(n_tokens) AS DOUBLE)
             / (((sum(n_tokens) + 63) // 64) * 64.0), 6) AS fill_rate,
       CAST(sum(CASE WHEN start_tok + n_tokens > 64 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_straddlers
FROM ({manifest}) m
GROUP BY shard
"""


def q_lm_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring (the smoothing real
    pretraining perplexity filters use) — continuation-count backoff
    over the corpus's own counts, exact-double parity with the oracle
    (operators/corpus_stats.py:doc_kneser_ney_logprob)."""
    return corpus_stats.doc_kneser_ney_logprob(
        load_table(spark, sf_dir, "documents"), "text", "doc_id"
    )


def q_cdc_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking dedup yield: per doc, how many of its
    CDC chunks (FastCDC idea at token granularity — boundaries follow
    content, so edits re-synchronize) also occur in other documents.
    The storage-dedup estimate for snapshot stores
    (operators/chunking.py:cdc_dedup_report)."""
    return chunking.cdc_dedup_report(
        load_table(spark, sf_dir, "documents"), "text", "doc_id"
    )


def q_train_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per training chunk, the count of PII-redaction tokens the loader
    must exclude from the loss — scrub + chunk + pure HOF count, no
    shuffle beyond the chunk explode (events.props is the fixture side
    with real pattern hits, the scrub queries' convention)."""
    return chunking.loss_mask_report(
        load_table(spark, sf_dir, "events"), "props", "event_id"
    )


# The QUERIES literal lives at module tail so every registered fn is
# already bound; compute_reverify explodes it per-entry either way.


# --- Luhn-validated PAN scrubbing ------------------------------------------------
#
# The fixture corpus is digit-free, so PAN-shaped wire noise is injected
# the way text_normalize injects transport corruption: 16 deterministic
# digits per doc (15 from doc_id * 7919, one check digit doc_id % 10),
# ~1 in 10 passing Luhn — the validator must accept exactly those.

_PAN_BASE_MOD = 10**15


def _pan_wire() -> F.Column:
    base = F.lpad(
        ((F.col("doc_id") * 7919) % F.lit(_PAN_BASE_MOD)).cast("string"),
        15,
        "0",
    )
    return F.concat(
        F.col("text"),
        F.lit(" card "),
        base,
        (F.col("doc_id") % 10).cast("string"),
    )


_SQL_PAN_WIRE = (
    "text || ' card ' || lpad(CAST((doc_id * 7919) % "
    f"{_PAN_BASE_MOD} AS VARCHAR), 15, '0') || CAST(doc_id % 10 AS VARCHAR)"
)


def q_scrub_luhn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checksum-validated PII scrubbing: PAN-shaped digit runs are
    redacted ONLY when they pass the Luhn mod-10 check (ISO/IEC 7812)
    — a 10x false-positive cut over shape-only redaction. Pure nested
    higher-order column expressions; map-side, no shuffle."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", _pan_wire().alias("wire")
    )
    n_c, n_v = scrub.pan_counts("wire")
    return docs.select(
        "doc_id",
        n_c.alias("n_candidates"),
        n_v.alias("n_valid"),
        scrub.redact_pan("wire").alias("redacted"),
    )


def _scrub_luhn_oracle() -> str:
    n_c, n_v, red = scrub.sql_pan_exprs("wire")
    return f"""
SELECT doc_id,
       CAST({n_c} AS INT) AS n_candidates,
       CAST({n_v} AS INT) AS n_valid,
       {red} AS redacted
FROM (SELECT doc_id, {_SQL_PAN_WIRE} AS wire FROM documents)
"""


# --- corpus drift monitoring ---------------------------------------------------

PSI_BUCKET_W = 64  # n_chars bucket width (47..558 in the fixture -> ~9 buckets)
_PSI_BUCKET_SQL = f"CAST(least(9, n_chars // {PSI_BUCKET_W}) AS INT)"


def q_corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between two corpus snapshots (stand-in:
    the even/odd doc_id halves — a real run feeds two snapshot dirs)
    over bucketed document length, plus the exact-integer TOTAL row
    (bucket = -1). The even/odd split is the STABILITY BASELINE: psi
    should sit far below the 0.1 drift rule of thumb, and the driver
    fact pins the exact value. Map-side reduction to <= 10 bucket rows
    before the only (tiny) shuffle."""
    from hash_db_spark.operators import corpus_stats as CS

    docs = load_table(spark, sf_dir, "documents")
    bucket = F.least(
        F.lit(9), (F.col("n_chars") / PSI_BUCKET_W).cast("long")
    ).cast("int")
    return CS.drift_psi(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        bucket,
    )


def _corpus_drift_psi_oracle() -> str:
    from hash_db_spark.operators import corpus_stats as CS

    return CS.sql_drift_psi(
        "SELECT * FROM documents WHERE doc_id % 2 = 0",
        "SELECT * FROM documents WHERE doc_id % 2 = 1",
        _PSI_BUCKET_SQL,
    )


def q_context_fit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length planning table: per candidate sequence length L,
    the tokens truncation loses, the padding share of a naive
    doc-per-row batch, and the padding floor after ideal packing —
    the table that decides L (and whether packing is worth wiring)
    before a training run (operators/chunking.py:context_fit_report)."""
    return chunking.context_fit_report(
        load_table(spark, sf_dir, "documents"), "text"
    )


def _context_fit_oracle() -> str:
    return chunking.sql_context_fit_report("documents", "text")


# r12 QUEUE CANDIDATE (the r11 queue closed at 34 — session 7):
#   "context_fit_report": Query(
#       q_context_fit_report, _context_fit_oracle()),


def q_vocab_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary-growth fit V = K*N^beta from nested
    content-addressed half-samples (one corpus pass, KMV-style min-hash
    per token) — the companion planning signal to vocab_zipf_fit:
    Zipf describes the frequency head, Heaps' beta says whether more
    data keeps buying new vocabulary
    (operators/corpus_stats.py:vocab_heaps_fit)."""
    return corpus_stats.vocab_heaps_fit(
        load_table(spark, sf_dir, "documents"), "text", "doc_id"
    )


def _vocab_heaps_oracle() -> str:
    return corpus_stats.sql_vocab_heaps_fit("documents", "text", "doc_id")


# r12 QUEUE CANDIDATE (the r11 queue closed at 34 — session 7):
#   "vocab_heaps_fit": Query(q_vocab_heaps_fit, _vocab_heaps_oracle()),


def q_vocab_oov_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-vocabulary OOV planning table: token- and type-level OOV
    rates each language slice pays under a 20-entry vocab built from
    the 'en' slice's frequency head — the before-tokenizer-training
    companion to tokenizer_fertility
    (operators/corpus_stats.py:vocab_oov_report)."""
    return corpus_stats.vocab_oov_report(
        load_table(spark, sf_dir, "documents"), "text"
    )


def _vocab_oov_oracle() -> str:
    return corpus_stats.sql_vocab_oov_report("documents", "text")


# r12 QUEUE CANDIDATE (the r11 queue closed at 34 — session 7):
#   "vocab_oov_report": Query(q_vocab_oov_report, _vocab_oov_oracle()),


def q_scrub_secrets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy-gated credential scrubbing (the detect-secrets heuristic):
    alnum runs of 20+ chars are candidates; only those whose per-char
    Shannon entropy clears 3.0 bits are redacted — a planted hex API
    key goes, the equally-long repeated-filler decoy stays. The blob is
    closed-form (text + md5 key + 'ab' filler), so the oracle re-derives
    the same corpus and the checked surface is the entropy fold itself
    (functions/scrub.py:secret_exprs; map-side HOFs, no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    blob = F.concat_ws(
        " ",
        F.col("text"),
        F.lit("api_key"),
        F.md5(F.col("doc_id").cast("string")),
        F.lit("pad"),
        F.repeat(F.lit("ab"), 12),
    )
    n_c, n_v, max_e, red = scrub.secret_exprs(blob)
    return docs.select(
        "doc_id",
        n_c.alias("n_candidates"),
        n_v.alias("n_secrets"),
        max_e.alias("max_entropy"),
        F.md5(red).alias("redacted_fp"),
    )


def _scrub_secrets_oracle() -> str:
    blob = (
        "concat_ws(' ', text, 'api_key', md5(CAST(doc_id AS VARCHAR)),"
        " 'pad', repeat('ab', 12))"
    )
    n_c, n_v, max_e, red = scrub.sql_secret_exprs(blob)
    return f"""
SELECT doc_id,
       {n_c} AS n_candidates,
       {n_v} AS n_secrets,
       {max_e} AS max_entropy,
       md5({red}) AS redacted_fp
FROM documents
"""


# r12 QUEUE CANDIDATE (session 9):
#   "scrub_secrets": Query(q_scrub_secrets, _scrub_secrets_oracle()),


def q_ppl_tertile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail: per-language LM-score tertiles assign
    every doc a fluency bucket — the upsample/hold/filter handles a
    mixture planner consumes. Cutoffs are broadcast scalars per
    language, never a per-language ntile window
    (operators/corpus_stats.py:ppl_tertile_buckets)."""
    return corpus_stats.ppl_tertile_buckets(
        load_table(spark, sf_dir, "documents"), "text", "doc_id"
    )


# r12 QUEUE CANDIDATE (session 9):
#   "ppl_tertile_buckets": Query(
#       q_ppl_tertile_buckets,
#       corpus_stats.sql_ppl_tertile_buckets("documents", "text", "doc_id")),


def q_curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline-observability twin of train_prep: per-STAGE survivor
    counts for the gate cascade (raw -> quality gate -> near-dup keep),
    with each stage's drop — the funnel chart every curation run ships
    alongside its output so a silently over-aggressive gate is caught
    by eyeball, not by a degraded model three weeks later. Same
    predicates and dedup parameters as train_prep, so the funnel
    EXPLAINS that entry's output size.

    Scale shape: three scalar aggregates over successive refinements of
    one lazy plan (the gated frame feeds both its own count and the
    dedup stage), unioned into a 3-row result — counts only, nothing
    wide ever aggregates."""
    from hash_db_spark.functions.text import quality_score, token_count

    docs = load_table(spark, sf_dir, "documents")
    gated = docs.filter(
        (quality_score("text") >= 0.5)
        & F.col("lang").isin("en", "de", "fr")
        & token_count("text").between(10, 200)
    )
    pairs = D.minhash_lsh_pairs(
        gated, "text", "doc_id", threshold=0.5, num_hashes=32
    )
    kept = D.apply_dedup_keep(gated, pairs, "doc_id")

    def stage(idx: int, name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.lit(idx).alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).alias("n_docs"),
        )

    funnel = (
        stage(0, "raw", docs)
        .unionAll(stage(1, "quality_gate", gated))
        .unionAll(stage(2, "near_dup_keep", kept))
    )
    from pyspark.sql import Window

    # global window over EXACTLY 3 rows (the unioned scalar aggregates):
    # the WindowExec single-partition warning is intrinsic and harmless
    # here — the input is stage-count-sized, never corpus-sized
    w = Window.orderBy("stage_idx")
    return funnel.select(
        "stage_idx",
        "stage",
        "n_docs",
        (F.coalesce(F.lag("n_docs").over(w), F.col("n_docs"))
         - F.col("n_docs")).alias("n_dropped"),
    )


def _curation_funnel_oracle() -> str:
    from hash_db_spark.functions.text import sql_quality_score, sql_token_count

    gate = (
        "SELECT * FROM documents "
        f"WHERE {sql_quality_score('text')} >= 0.5 "
        "AND lang IN ('en', 'de', 'fr') "
        f"AND {sql_token_count('text')} BETWEEN 10 AND 200"
    )
    pairs_sql = D.sql_minhash_lsh_pairs(
        f"({gate}) gdocs", "text", "doc_id", threshold=0.5, num_hashes=32
    )
    kept_sql = D.sql_apply_dedup_keep(
        f"({gate}) gdocs", "doc_id", pairs_sql, "SELECT *"
    )
    return f"""
WITH gated AS MATERIALIZED ({gate}),
kept AS ({kept_sql.replace(f'({gate}) gdocs', 'gated')}),
funnel AS (
  SELECT 0 AS stage_idx, 'raw' AS stage, count(*) AS n_docs
  FROM documents
  UNION ALL
  SELECT 1, 'quality_gate', count(*) FROM gated
  UNION ALL
  SELECT 2, 'near_dup_keep', count(*) FROM kept
)
SELECT stage_idx, stage, n_docs,
       COALESCE(lag(n_docs) OVER (ORDER BY stage_idx), n_docs) - n_docs
         AS n_dropped
FROM funnel
"""


# r12 QUEUE CANDIDATE (session 9):
#   "curation_funnel_report": Query(
#       q_curation_funnel_report, _curation_funnel_oracle()),


def q_stream_secret_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming governance gate: documents stream through the entropy-
    gated credential scrub — per-batch map-side HOFs, no state store at
    all (stateless projection), so the same plan runs unchanged on a
    real continuous source; availableNow single batch makes the batch
    scrub the exact oracle (functions/scrub.py:secret_exprs)."""
    from hash_db_spark.streaming import windows as SW

    docs = SW.read_documents_stream(spark, sf_dir)
    blob = F.concat_ws(
        " ",
        F.col("text"),
        F.lit("api_key"),
        F.md5(F.col("doc_id").cast("string")),
        F.lit("pad"),
        F.repeat(F.lit("ab"), 12),
    )
    n_c, n_v, max_e, red = scrub.secret_exprs(blob)
    flagged = docs.select(
        "doc_id",
        n_v.alias("n_secrets"),
        F.md5(red).alias("redacted_fp"),
    ).filter(F.col("n_secrets") > 0)
    return SW.run_stream_to_memory(flagged, output_mode="append")


def _stream_secret_scrub_oracle() -> str:
    blob = (
        "concat_ws(' ', text, 'api_key', md5(CAST(doc_id AS VARCHAR)),"
        " 'pad', repeat('ab', 12))"
    )
    _n_c, n_v, _max_e, red = scrub.sql_secret_exprs(blob)
    return f"""
SELECT doc_id, {n_v} AS n_secrets, md5({red}) AS redacted_fp
FROM documents
WHERE {n_v} > 0
"""


# r12 QUEUE CANDIDATE (session 9):
#   "stream_secret_scrub": Query(
#       q_stream_secret_scrub, _stream_secret_scrub_oracle()),


# The QUERIES literal lives at module tail so every registered fn is
# already bound; compute_reverify explodes it per-entry either way.
QUERIES = {
    "scrub_redact": Query(q_scrub_redact, SCRUB_REDACT_ORACLE),
    "fuzzy_name_match": Query(q_fuzzy_name_match, FUZZY_ORACLE),
    "dedup_apply_keep": Query(q_dedup_apply_keep, _apply_keep_oracle()),
    "vocab_top_share": Query(
        q_vocab_top_share,
        corpus_stats.sql_vocab_top_share("documents", "text", topn=10),
    ),
    "pack_sequences": Query(q_pack_sequences, _pack_oracle()),
    "pack_manifest": Query(q_pack_manifest, _pack_manifest_oracle()),
    "vocab_zipf_fit": Query(
        q_vocab_zipf_fit,
        corpus_stats.sql_vocab_zipf_fit("documents", "text"),
    ),
    "quality_gate": Query(q_quality_gate, _quality_gate_oracle()),
    "train_prep": Query(q_train_prep, _train_prep_oracle()),
    "scrub_pattern_counts": Query(q_scrub_pattern_counts, SCRUB_COUNTS_ORACLE),
    "chunk_tokens": Query(
        q_chunk_tokens,
        chunking.sql_token_chunks(
            "documents", "text", "doc_id", CHUNK_SIZE, CHUNK_OVERLAP
        ),
    ),
    "doc_logfreq": Query(
        q_doc_logfreq,
        corpus_stats.sql_doc_logfreq_score("documents", "text", "doc_id"),
    ),
    "doc_bigram_logprob": Query(
        q_doc_bigram_logprob,
        corpus_stats.sql_doc_bigram_logprob("documents", "text", "doc_id"),
    ),
    "lm_perplexity_gate": Query(
        q_lm_perplexity_gate,
        corpus_stats.sql_lm_gate("documents", "text", "doc_id"),
    ),
    "select_token_budget": Query(
        q_select_token_budget, _token_budget_oracle()
    ),
    "mixture_token_budget": Query(
        q_mixture_token_budget, _mixture_budget_oracle()
    ),
    "text_token_entropy": Query(
        lambda spark, sf_dir: corpus_stats.token_entropy(
            load_table(spark, sf_dir, "documents"), "text", "doc_id"
        ),
        corpus_stats.sql_token_entropy("documents", "text", "doc_id"),
    ),
    "dedup_span_grams": Query(
        q_dedup_span_grams,
        D.sql_repeated_ngram_spans("documents", "text", "doc_id", n=SPAN_N),
    ),
    "dedup_strip_spans": Query(
        q_dedup_strip_spans,
        D.sql_strip_hot_spans("documents", "text", "doc_id", n=SPAN_N),
    ),
    "stream_stateful_counter": Query(q_stream_stateful_counter, STATEFUL_ORACLE),
    "stream_sessions": Query(q_stream_sessions, STREAM_SESSIONS_ORACLE),
    "line_dedup_docs": Query(
        q_line_dedup_docs, lines.sql_line_dedup_docs(_lines_cte())
    ),
    "line_boilerplate_strip": Query(
        q_line_boilerplate_strip,
        lines.sql_strip_boilerplate_docs(_lines_cte(), BOILERPLATE_DF),
    ),
    "line_containment": Query(
        q_line_containment,
        lines.sql_line_containment_pairs(
            _lines_cte(), CONTAIN_THRESHOLD, CONTAIN_MAX_DF
        ),
    ),
    "line_clean_prep": Query(
        q_line_clean_prep,
        lines.sql_line_clean_prep(_lines_cte(), BOILERPLATE_DF, min_lines=2),
    ),
    "stream_line_dedup": Query(
        q_stream_line_dedup, _stream_line_dedup_oracle()
    ),
    # registered r10 (queued r09 under the VERDICT r08 #1 throttle):
    "stream_line_dedup_wm": Query(
        q_stream_line_dedup_wm, _stream_line_dedup_oracle()
    ),
    "dedup_keep_best": Query(q_dedup_keep_best, _keep_best_oracle()),
    # registered r11 (queued r10 under the VERDICT r08 #1 throttle):
    "pack_efficiency": Query(q_pack_efficiency, _pack_efficiency_oracle()),
    "lm_kneser_ney": Query(
        q_lm_kneser_ney,
        corpus_stats.sql_doc_kneser_ney_logprob(
            "documents", "text", "doc_id"
        ),
    ),
    "cdc_dedup_report": Query(
        q_cdc_dedup_report,
        chunking.sql_cdc_dedup_report("documents", "text", "doc_id"),
    ),
    "train_loss_mask": Query(
        q_train_loss_mask,
        chunking.sql_loss_mask_report("events", "props", "event_id"),
    ),
    "scrub_luhn": Query(q_scrub_luhn, _scrub_luhn_oracle()),
    "corpus_drift_psi": Query(
        q_corpus_drift_psi, _corpus_drift_psi_oracle()
    ),
}
