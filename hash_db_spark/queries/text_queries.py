"""Driver-checkable queries: FTS operator (R5) + text-analysis pipeline
operators (SURVEY §7 Phase 6) over the documents fixture."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.operators.fts import compile_fts_oracle, fts_filter
from hash_db_spark.functions import text as T
from hash_db_spark.operators.dedup import sql_shingles
from hash_db_spark.queries import Query


def _docs(spark, sf_dir) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --- R5: FTS ~ operator ------------------------------------------------------

FTS_AND = "spark & join"
FTS_OR = "merge | stream"
# Reference fold semantics: ((spark AND join) OR window) AND batch — the
# mode switches apply to subsequent terms, left-to-right, no precedence.
FTS_MIXED = "spark & join | window & batch"


def q_fts_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fts_filter(_docs(spark, sf_dir), "text", FTS_AND).select(
        "doc_id", "lang", "source"
    )


def q_fts_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fts_filter(_docs(spark, sf_dir), "text", FTS_OR).select(
        "doc_id", "lang"
    )


def q_fts_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fts_filter(_docs(spark, sf_dir), "text", FTS_MIXED).select("doc_id")


def q_fts_with_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """example.py:296-306 scenario shape: FTS + equality predicate ANDed."""
    docs = _docs(spark, sf_dir)
    return fts_filter(docs, "text", FTS_OR).filter(
        F.col("lang") == "en"
    ).select("doc_id", "lang", "n_chars")


FTS_PHRASE = "fast table"


def q_fts_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted-phrase adjacency match (grammar extension — the reference
    FTS has only &/| term folds, /root/reference/client.py:683-709)."""
    from hash_db_spark.operators.fts import phrase_filter

    return phrase_filter(_docs(spark, sf_dir), "text", FTS_PHRASE).select(
        "doc_id", "lang"
    )


def _fts_phrase_oracle() -> str:
    from hash_db_spark.operators.fts import compile_phrase_oracle

    return (
        "SELECT doc_id, lang FROM documents "
        f"WHERE {compile_phrase_oracle('text', FTS_PHRASE)}"
    )


def _fts_oracle(query: str, cols: str, extra: str = "") -> str:
    return (
        f"SELECT {cols} FROM documents "
        f"WHERE {compile_fts_oracle('text', query)}{extra}"
    )


# --- Text analysis -----------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics (map-side only; no shuffle)."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        T.distinct_token_count("text").alias("n_distinct"),
        T.char_count("text").alias("n_chars_live"),
        T.avg_token_length("text").alias("avg_tok_len"),
        T.lexical_diversity("text").alias("diversity"),
    )


TEXT_STATS_ORACLE = f"""
SELECT doc_id,
       CAST({T.sql_token_count('text')} AS INT) AS n_tokens,
       CAST({T.sql_distinct_token_count('text')} AS INT) AS n_distinct,
       CAST(len(text) AS INT) AS n_chars_live,
       {T.sql_avg_token_length('text')} AS avg_tok_len,
       {T.sql_lexical_diversity('text')} AS diversity
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id",
        T.stopword_ratio("text").alias("stop_ratio"),
        T.quality_score("text").alias("quality"),
    )


TEXT_QUALITY_ORACLE = f"""
SELECT doc_id,
       {T.sql_stopword_ratio('text')} AS stop_ratio,
       {T.sql_quality_score('text')} AS quality
FROM documents
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-argmax language ID + agreement flag against the labeled
    lang column (synthetic text shares one vocab, so the value of this
    query is determinism of the rule, not linguistic accuracy)."""
    docs = _docs(spark, sf_dir)
    # Stage the guess as a named column: inlining lang_id twice (guess +
    # agrees) evaluates the interpreted stopword-count argmax twice per
    # row — Catalyst does not CSE across projection items.
    return docs.select(
        "doc_id", "lang", T.lang_id("text").alias("lang_guess")
    ).withColumn("agrees", F.col("lang_guess") == F.col("lang"))


TEXT_LANGID_ORACLE = f"""
SELECT doc_id, lang,
       {T.sql_lang_id('text')} AS lang_guess,
       ({T.sql_lang_id('text')} = lang) AS agrees
FROM documents
"""


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: the labeled-vs-predicted confusion
    matrix — the quality report that decides whether the classifier is
    good enough to gate on. One map-combined shuffle."""
    docs = _docs(spark, sf_dir)
    return docs.groupBy(
        F.col("lang").alias("labeled"),
        T.lang_id("text").alias("predicted"),
    ).agg(F.count(F.lit(1)).alias("n"))


LANGID_CONFUSION_ORACLE = f"""
SELECT lang AS labeled, {T.sql_lang_id('text')} AS predicted,
       count(*) AS n
FROM documents GROUP BY labeled, predicted
"""


def q_text_subword_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish subword token estimate + distinct char trigrams per doc."""
    return _docs(spark, sf_dir).select(
        "doc_id",
        T.bpe_token_count("text").alias("n_subword"),
        T.char_ngram_count("text", 3).alias("n_char3"),
    )


TEXT_SUBWORD_ORACLE = f"""
SELECT doc_id,
       CAST({T.sql_bpe_token_count('text')} AS INT) AS n_subword,
       CAST({T.sql_char_ngram_count('text', 3)} AS INT) AS n_char3
FROM documents
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id",
        T.fingerprint("text").alias("fp"),
        T.bag_fingerprint("text").alias("bag_fp"),
    )


TEXT_FP_ORACLE = f"""
SELECT doc_id,
       {T.sql_fingerprint('text')} AS fp,
       {T.sql_bag_fingerprint('text')} AS bag_fp
FROM documents
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/repetition score: share of repeated word trigrams
    (1 - distinct/total). High values flag template-generated or looping
    text — a standard pretraining quality filter. One Arrow pass
    (tokenize + gram-count in Python; the Column HOF form re-evaluates
    the token chain per gram — see dedup.shingle_frame); rounding via
    round_half_away for oracle parity."""
    from hash_db_spark.functions.rounding import round_half_away
    from hash_db_spark.operators.dedup import spread_for_cpu

    docs = _docs(spark, sf_dir)

    def block(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for t in pdf["text"]:
                toks = [x for x in (t or "").replace(",", "").split(" ") if x]
                total = len(toks) - 2
                if total > 0:
                    distinct = len({
                        " ".join(toks[j : j + 3]) for j in range(total)
                    })
                    out.append(
                        float(round_half_away((total - distinct) / total, 6))
                    )
                else:
                    out.append(0.0)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "rep_ratio": out})

    return spread_for_cpu(docs).select("doc_id", "text").mapInPandas(
        block, "doc_id long, rep_ratio double"
    )


TEXT_REPETITION_ORACLE = f"""
SELECT doc_id,
       CASE WHEN {T.sql_token_count('text')} - 2 > 0
            THEN round(
              CAST({T.sql_token_count('text')} - 2
                   - len({sql_shingles('text', 3)}) AS DOUBLE)
              / ({T.sql_token_count('text')} - 2), 6)
            ELSE 0.0 END AS rep_ratio
FROM documents
"""


def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: docs sharing any word trigram with a
    held-out 'benchmark' set (doc_id < 10 here), with the overlap count.
    The benchmark gram set broadcasts; the corpus is touched once — the
    decontamination shape for a 100 TB crawl vs a fixed eval suite."""
    from hash_db_spark.operators.dedup import shingle_frame

    docs = _docs(spark, sf_dir)
    # Shingle each side from a PRE-filtered scan: a doc_id filter cannot
    # push through the opaque Arrow pass, so deriving both sides from
    # one shingle_frame re-runs the full-corpus shingle per branch —
    # the bench side would shingle 100 TB to keep 10 docs' grams.
    bench = (
        shingle_frame(docs.filter(F.col("doc_id") < 10), "text", "doc_id")
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    corpus = shingle_frame(
        docs.filter(F.col("doc_id") >= 10), "text", "doc_id"
    ).select("id", F.explode("sh").alias("s"))
    return (
        corpus
        .join(F.broadcast(bench), "s")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .select(F.col("id").alias("doc_id"), "n_overlap")
    )


CONTAMINATION_ORACLE = f"""
WITH sh0 AS (
  SELECT doc_id AS id, {sql_shingles('text', 3)} AS sh
  FROM documents
),
posts AS (SELECT id, unnest(sh) AS s FROM sh0),
bench AS (SELECT DISTINCT s FROM posts WHERE id < 10)
SELECT id AS doc_id, count(*) AS n_overlap
FROM posts WHERE id >= 10 AND s IN (SELECT s FROM bench)
GROUP BY id
"""


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-screened benchmark decontamination: the benchmark trigram
    set compresses to <= 8192 set-bit rows (fixed size however large the
    suite grows — the broadcast the exact-set contamination_check can't
    bound), corpus grams pass the never-false-negative screen, then the
    surviving candidates are verified exactly. Output = per-doc count of
    bloom-candidate grams beside the true-overlap count; candidates >=
    true always."""
    from hash_db_spark.functions import sketches as SK
    from hash_db_spark.operators.dedup import shingle_frame

    docs = _docs(spark, sf_dir)
    # bench shingles a pre-filtered 10-doc scan (see contamination_check:
    # the id filter cannot push through the Arrow pass); the corpus gram
    # list feeds THREE consumers (candidate distinct, candidate join,
    # exact-verify join), so it is checkpointed once instead of
    # re-shingling the corpus per branch — the same bytes a shuffle of
    # it would spill anyway.
    bench = (
        shingle_frame(docs.filter(F.col("doc_id") < 10), "text", "doc_id")
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    corpus = shingle_frame(
        docs.filter(F.col("doc_id") >= 10), "text", "doc_id"
    ).select("id", F.explode("sh").alias("s")).localCheckpoint(eager=True)
    bits = SK.bloom_bits(bench, "s")
    cand_grams = SK.bloom_candidates(bits, corpus.select("s").distinct(), "s")
    cands = corpus.join(F.broadcast(cand_grams), "s")
    true_hits = corpus.join(F.broadcast(bench), "s").groupBy("id").agg(
        F.count(F.lit(1)).alias("n_true")
    )
    return (
        cands.groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_bloom"))
        .join(true_hits, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            "n_bloom",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
        )
    )


def _bloom_decontaminate_oracle() -> str:
    from hash_db_spark.functions import sketches as SK

    return f"""
WITH sh0 AS (
  SELECT doc_id AS id, {sql_shingles('text', 3)} AS sh FROM documents
),
posts AS (SELECT id, unnest(sh) AS s FROM sh0),
bench AS (SELECT DISTINCT s FROM posts WHERE id < 10),
corpus AS (SELECT id, s FROM posts WHERE id >= 10),
bits AS ({SK.sql_bloom_bits("SELECT s FROM bench", "s")}),
cand_grams AS (
  {SK.sql_bloom_candidates("bits", "SELECT DISTINCT s FROM corpus", "s")}
),
bloom_hits AS (
  SELECT id, count(*) AS n_bloom FROM corpus
  WHERE s IN (SELECT s FROM cand_grams) GROUP BY id
),
true_hits AS (
  SELECT id, count(*) AS n_true FROM corpus
  WHERE s IN (SELECT s FROM bench) GROUP BY id
)
SELECT b.id AS doc_id, b.n_bloom, coalesce(t.n_true, 0) AS n_true
FROM bloom_hits b LEFT JOIN true_hits t ON b.id = t.id
"""


def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer training's first step: the 20 most frequent ADJACENT
    token pairs over the corpus (count desc, pair asc tie-break) — the
    merge candidates a BPE trainer would fuse first. Unlike the shingle
    path this keeps positional adjacency (no distinct), so repeated
    pairs inside one document each count.

    Scale shape: pure map-side explode (pairs per doc = tokens - 1)
    into one partial-aggregated groupBy; the top-k is
    TakeOrderedAndProject, not a global sort. The token array is staged
    as a named column (optimization r12): the pair expression references
    its input five times inside a when() branch, which escapes codegen
    CSE, so an inlined clean_tokens re-tokenized per reference."""
    from hash_db_spark.operators.dedup import (
        adjacent_pairs_from_tokens,
        clean_tokens,
    )

    return (
        _docs(spark, sf_dir)
        .select(clean_tokens("text").alias("__t"))
        .select(
            F.explode(adjacent_pairs_from_tokens(F.col("__t"))).alias("pair")
        )
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(20)
    )


def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE training: 4 rounds of pick-top-pair -> greedy merge
    -> recount (operators/bpe.py). Each round's counts depend on the
    previous merge, so this is the real trainer loop, not round-0
    candidates; only the single winning pair crosses to the driver per
    round."""
    from hash_db_spark.operators.bpe import bpe_train_merges

    return bpe_train_merges(_docs(spark, sf_dir), "text", "doc_id", k=4)


def _bpe_train_oracle() -> str:
    from hash_db_spark.operators.bpe import sql_bpe_train_merges

    return sql_bpe_train_merges("documents", "text", k=4)


BPE_ENCODE_SUBSET = "(SELECT * FROM documents WHERE doc_id % 11 = 5)"


def q_bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer application: train 4 merges, then emit every document's
    encoded token sequence — the trainer's final distributed state IS
    the encoding, so no extra pass. Subset keyed on doc_id keeps the
    per-doc string emission gate-sized; training still sees the subset
    corpus on both engines."""
    from hash_db_spark.operators.bpe import bpe_train_encode

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 11 == 5)
    return bpe_train_encode(docs, "text", "doc_id", k=4)


def _bpe_encode_oracle() -> str:
    from hash_db_spark.operators.bpe import sql_bpe_train_encode

    return sql_bpe_train_encode(BPE_ENCODE_SUBSET, "text", "doc_id", k=4)


def _bpe_merge_oracle() -> str:
    from hash_db_spark.operators.dedup import sql_clean_tokens

    return f"""
WITH toks AS (
  SELECT {sql_clean_tokens('text')} AS t FROM documents
),
idx AS (
  SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
  FROM toks WHERE len(t) >= 2
)
SELECT t[i] || ' ' || t[i + 1] AS pair, count(*) AS n
FROM idx GROUP BY pair
ORDER BY n DESC, pair ASC LIMIT 20
"""


def q_top_ngrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus analytics: 5 most frequent word trigrams per language
    (count desc, gram asc tie-break) — vocabulary/boilerplate discovery
    over the whole corpus; partial aggregation then one top-k window."""
    from pyspark.sql import Window

    from hash_db_spark.operators.dedup import shingle_frame

    docs = _docs(spark, sf_dir)
    # keep= threads lang through the Arrow pass — re-attaching it with
    # a join would shuffle the whole exploded gram relation a 2nd time
    posts = shingle_frame(docs, "text", "doc_id", keep=("lang",)).select(
        "lang", F.explode("sh").alias("s")
    )
    counts = posts.groupBy("lang", "s").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("s").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("lang", F.col("s").alias("gram"), "cnt", "rn")
    )


TOP_NGRAMS_ORACLE = f"""
WITH sh0 AS (
  SELECT doc_id AS id, lang, {sql_shingles('text', 3)} AS sh
  FROM documents
),
posts AS (SELECT id, lang, unnest(sh) AS s FROM sh0),
counts AS (SELECT lang, s, count(*) AS cnt FROM posts GROUP BY lang, s)
SELECT lang, s AS gram, cnt, CAST(rn AS INT) AS rn FROM (
  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, s ASC) AS rn
  FROM counts
) WHERE rn <= 5
"""


# --- relevance ranking over the FTS token model ------------------------------

BM25_TERMS = ["hash", "join", "spark"]


def q_fts_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hash_db_spark.operators import ranking as R

    return R.bm25_rank(_docs(spark, sf_dir), "text", "doc_id", BM25_TERMS)


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hash_db_spark.operators import ranking as R

    return R.tfidf_top_terms(_docs(spark, sf_dir), "text", "doc_id")


def _ranking_oracles():
    from hash_db_spark.operators import ranking as R

    return (
        R.sql_bm25_rank("documents", "text", "doc_id", BM25_TERMS),
        R.sql_tfidf_top_terms("documents", "text", "doc_id"),
    )


_BM25_ORACLE, _TFIDF_ORACLE = _ranking_oracles()


def _wire_text() -> "F.Column":
    """Deterministic synthetic transport corruption (the synth-payload
    discipline of the multimodal/web entries): the fixture text is clean
    by construction, so the entry plants one corruption class per
    residue family -- a mojibake e-acute on doc_id%7, a BEL control byte
    on doc_id%11, a U+FFFD on doc_id%13 -- identically on both engines,
    and the gate must flag exactly those rows."""
    t = F.col("text")
    return (
        F.when(F.col("doc_id") % 7 == 0, F.concat(t, F.lit(" caf\u00c3\u00a9")))
        .when(F.col("doc_id") % 11 == 0, F.concat(t, F.lit("\x07")))
        .when(F.col("doc_id") % 13 == 0, F.concat(t, F.lit(" \ufffd")))
        .otherwise(t)
    )


_SQL_WIRE = (
    "(CASE WHEN doc_id % 7 = 0 THEN text || ' caf' || chr(195) || chr(169) "
    "WHEN doc_id % 11 = 0 THEN text || chr(7) "
    "WHEN doc_id % 13 = 0 THEN text || ' ' || chr(65533) "
    "ELSE text END)"
)


def q_text_encoding_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-quality gate (the C4/CCNet-style cleanliness screen that
    runs before any content analysis): per-document replacement-char,
    control-byte, and mojibake-marker counts plus the boolean gate --
    all codegen char-class counting, zero shuffles, a pure map at any
    scale (functions/text.py:replacement_char_count ff)."""
    docs = _docs(spark, sf_dir).select("doc_id", _wire_text().alias("wire"))
    return docs.select(
        "doc_id",
        T.replacement_char_count("wire").alias("n_repl"),
        T.control_char_count("wire").alias("n_ctrl"),
        T.mojibake_marker_count("wire").alias("n_moji"),
        T.encoding_ok("wire").alias("enc_ok"),
    )


TEXT_ENCODING_GATE_ORACLE = f"""
SELECT doc_id,
       {{n_repl}} AS n_repl,
       {{n_ctrl}} AS n_ctrl,
       {{n_moji}} AS n_moji,
       {{enc_ok}} AS enc_ok
FROM (SELECT doc_id, {_SQL_WIRE} AS wire FROM documents)
"""


def _text_encoding_gate_oracle() -> str:
    return TEXT_ENCODING_GATE_ORACLE.format(
        n_repl=T.sql_replacement_char_count("wire"),
        n_ctrl=T.sql_control_char_count("wire"),
        n_moji=T.sql_mojibake_marker_count("wire"),
        enc_ok=T.sql_encoding_ok("wire"),
    )




RETRIEVE_TERMS = ["spark", "query", "join"]
RETRIEVE_K = 10


def q_retrieve_chunks_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG serving shape: top-k corpus chunks by hashed-embedding
    cosine against a bag-of-terms query — chunk, embed (feature
    hashing), score, heap top-k."""
    from hash_db_spark.operators import retrieval as RT

    return RT.retrieve_chunks(
        _docs(spark, sf_dir), "text", "doc_id", RETRIEVE_TERMS, k=RETRIEVE_K
    )


def _retrieve_chunks_oracle() -> str:
    from hash_db_spark.operators import retrieval as RT

    return RT.sql_retrieve_chunks(
        "documents", "text", "doc_id", RETRIEVE_TERMS, k=RETRIEVE_K
    )


def q_doc_topic_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling topic segmentation: cut where consecutive token
    windows' hashed-term-vector cosine dips — content-shift boundaries,
    the complement to doc_lang_segments' language-shift boundaries."""
    from hash_db_spark.operators import retrieval as RT

    return RT.text_tiling_segments(_docs(spark, sf_dir), "text", "doc_id")


def _topic_segments_oracle() -> str:
    from hash_db_spark.operators import retrieval as RT

    return RT.sql_text_tiling_segments("documents", "text", "doc_id")


def q_dedup_tfidf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by TF-IDF-weighted shingle cosine — the
    term-weight-aware member of the dedup family: idf downweights
    boilerplate shingles, so pairs score by shared RARE content."""
    from hash_db_spark.operators import ranking as R

    return R.tfidf_cosine_pairs(_docs(spark, sf_dir), "text", "doc_id")


def _tfidf_cosine_oracle() -> str:
    from hash_db_spark.operators import ranking as R

    return R.sql_tfidf_cosine_pairs("documents", "text", "doc_id")


def q_retrieve_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware retrieval: MMR greedy top-5 over the hashed-chunk
    candidate pool (integer lambda=0.7), so redundant near-identical
    chunks don't crowd the serving window. Everything past the one
    corpus relevance scan runs on the bounded pool, in-plan
    (operators/retrieval.py:mmr_rerank)."""
    from hash_db_spark.operators import retrieval as RT

    return RT.mmr_rerank(
        _docs(spark, sf_dir), "text", "doc_id", RETRIEVE_TERMS, k=5
    )


def _retrieve_mmr_oracle() -> str:
    from hash_db_spark.operators import retrieval as RT

    return RT.sql_mmr_rerank("documents", "text", "doc_id", RETRIEVE_TERMS, k=5)


def q_fts_serve_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's mixed-mode FTS query served from the PERSISTED
    posting-list index instead of a corpus scan — result-identical to
    fts_mixed by construction, so it shares that oracle. The index path
    is keyed by sf_dir AND pid: two concurrent runs (parallel pytest /
    bench alongside a driver check) must not share a path, or one
    overwrites postings while the other probes — per-process isolation
    keeps each run's write-then-read atomic from its own view."""
    import hashlib
    import os
    import tempfile

    from hash_db_spark.operators.fts import fts_index_query
    from hash_db_spark.sources.writers import write_fts_index

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/hash_db_spark_fts_{tag}_{os.getpid()}"
    write_fts_index(_docs(spark, sf_dir), path)
    return fts_index_query(spark, path, FTS_MIXED)


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization over the same synthetic transport corruption the
    encoding gate flags: control bytes stripped, unicode punctuation
    folded, whitespace collapsed — the repair stage proven identical on
    both engines character for character."""
    docs = _docs(spark, sf_dir).select("doc_id", _wire_text().alias("wire"))
    return docs.select("doc_id", T.normalize_text("wire").alias("norm"))


def _text_normalize_oracle() -> str:
    return (
        f"SELECT doc_id, {T.sql_normalize_text('wire')} AS norm "
        f"FROM (SELECT doc_id, {_SQL_WIRE} AS wire FROM documents)"
    )


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword tokens per whitespace
    word (the budgeting number that converts corpus word counts into
    model token counts, and the per-language fairness diagnostic — a
    language with 2x fertility pays 2x context for the same text).
    One map-side projection + one tiny groupBy; exact int sums with a
    single rounded division."""
    docs = _docs(spark, sf_dir)
    per = docs.select(
        "lang",
        T.token_count("text").alias("words"),
        T.bpe_token_count("text").alias("subwords"),
    )
    return per.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("words").alias("words"),
        F.sum("subwords").alias("subwords"),
        F.round(
            F.sum("subwords").cast("double") / F.sum("words").cast("double"),
            6,
        ).alias("fertility"),
    )


def _tokenizer_fertility_oracle() -> str:
    return f"""
SELECT lang, count(*) AS n_docs,
       CAST(sum({T.sql_token_count('text')}) AS BIGINT) AS words,
       CAST(sum({T.sql_bpe_token_count('text')}) AS BIGINT) AS subwords,
       round(CAST(sum({T.sql_bpe_token_count('text')}) AS DOUBLE)
             / CAST(sum({T.sql_token_count('text')}) AS DOUBLE), 6)
         AS fertility
FROM documents GROUP BY lang
"""

def q_mlm_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BERT-style masked-LM training examples with content-addressed
    masking (operators/chunking.py:mlm_examples) — one pure-HOF
    projection, reproducible from the dataset alone."""
    from hash_db_spark.operators.chunking import mlm_examples

    return mlm_examples(_docs(spark, sf_dir), "text", "doc_id")


def _mlm_examples_oracle() -> str:
    from hash_db_spark.operators.chunking import sql_mlm_examples

    return sql_mlm_examples("documents", "text", "doc_id")


def q_t5_span_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span-corruption examples: block-addressed deterministic spans
    replaced by numbered '<extra_id_K>' sentinels, targets carrying the
    dropped spans — the denoising-objective twin of mlm_examples, same
    reproducible-from-the-dataset masking property, same one-scan
    pure-HOF shape (operators/chunking.py:t5_span_examples)."""
    from hash_db_spark.operators.chunking import t5_span_examples

    return t5_span_examples(_docs(spark, sf_dir), "text", "doc_id")


def _t5_span_oracle() -> str:
    from hash_db_spark.operators.chunking import sql_t5_span_examples

    return sql_t5_span_examples("documents", "text", "doc_id")


# r12 QUEUE CANDIDATE (session 9):
#   "t5_span_examples": Query(q_t5_span_examples, _t5_span_oracle()),


def q_retrieve_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+semantic retrieval fused by reciprocal rank
    fusion (Cormack et al., SIGIR 2009): BM25 top-15 and whole-doc
    hashed-cosine top-15 joined on doc, fused key = integer micro sum
    of 1/(60+rank). Each ranker ends in TakeOrderedAndProject, so the
    fusion runs on <= 30 rows regardless of corpus size."""
    from hash_db_spark.operators import retrieval as RT

    return RT.hybrid_rrf(
        _docs(spark, sf_dir), "text", "doc_id", RETRIEVE_TERMS
    )


def _hybrid_rrf_oracle() -> str:
    from hash_db_spark.operators import retrieval as RT

    return RT.sql_hybrid_rrf("documents", "text", "doc_id", RETRIEVE_TERMS)


# The QUERIES literal lives at module tail so every registered fn is
# already bound; compute_reverify explodes it per-entry either way.
QUERIES = {
    "fts_bm25_rank": Query(q_fts_bm25_rank, _BM25_ORACLE),
    "tfidf_top_terms": Query(q_tfidf_top_terms, _TFIDF_ORACLE),
    "fts_and": Query(q_fts_and, _fts_oracle(FTS_AND, "doc_id, lang, source")),
    "fts_or": Query(q_fts_or, _fts_oracle(FTS_OR, "doc_id, lang")),
    "fts_mixed": Query(q_fts_mixed, _fts_oracle(FTS_MIXED, "doc_id")),
    "fts_phrase": Query(q_fts_phrase, _fts_phrase_oracle()),
    "fts_with_where": Query(
        q_fts_with_where,
        _fts_oracle(FTS_OR, "doc_id, lang, n_chars", " AND lang = 'en'"),
    ),
    "text_stats": Query(q_text_stats, TEXT_STATS_ORACLE),
    "text_quality": Query(q_text_quality, TEXT_QUALITY_ORACLE),
    "text_langid": Query(q_text_langid, TEXT_LANGID_ORACLE),
    "langid_confusion": Query(
        q_langid_confusion, LANGID_CONFUSION_ORACLE
    ),
    "text_fingerprint": Query(q_text_fingerprint, TEXT_FP_ORACLE),
    "text_subword_tokens": Query(q_text_subword_tokens, TEXT_SUBWORD_ORACLE),
    "text_repetition": Query(q_text_repetition, TEXT_REPETITION_ORACLE),
    "contamination_check": Query(q_contamination_check, CONTAMINATION_ORACLE),
    "bloom_decontaminate": Query(
        q_bloom_decontaminate, _bloom_decontaminate_oracle()
    ),
    "top_ngrams_per_lang": Query(q_top_ngrams_per_lang, TOP_NGRAMS_ORACLE),
    "bpe_merge_candidates": Query(
        q_bpe_merge_candidates, _bpe_merge_oracle()
    ),
    "bpe_train_merges": Query(q_bpe_train_merges, _bpe_train_oracle()),
    "bpe_encode_corpus": Query(q_bpe_encode_corpus, _bpe_encode_oracle()),
    # registered r10 (queued r09 under the VERDICT r08 #1 throttle):
    "text_encoding_gate": Query(
        q_text_encoding_gate, _text_encoding_gate_oracle()),
    "retrieve_mmr_topk": Query(q_retrieve_mmr_topk, _retrieve_mmr_oracle()),
    "fts_serve_mixed": Query(
        q_fts_serve_mixed, _fts_oracle(FTS_MIXED, "doc_id")),
    "dedup_tfidf_cosine": Query(q_dedup_tfidf_cosine, _tfidf_cosine_oracle()),
    "retrieve_chunks_topk": Query(
        q_retrieve_chunks_topk, _retrieve_chunks_oracle()),
    "doc_topic_segments": Query(
        q_doc_topic_segments, _topic_segments_oracle()),
    # registered r11 (queued r10 under the VERDICT r08 #1 throttle):
    "text_normalize": Query(q_text_normalize, _text_normalize_oracle()),
    "tokenizer_fertility": Query(
        q_tokenizer_fertility, _tokenizer_fertility_oracle()
    ),
    "mlm_examples": Query(q_mlm_examples, _mlm_examples_oracle()),
    "retrieve_hybrid_rrf": Query(
        q_retrieve_hybrid_rrf, _hybrid_rrf_oracle()
    ),
}


def q_term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 burstiest terms by variance-to-mean dispersion of
    per-document counts (Church & Gale, "Poisson Mixtures", 1995):
    content words burst, function words arrive ~Poisson — the
    stopword/keyword discovery signal read straight off corpus counts.
    Exact integer count moments; one micro-quantized VMR per term;
    TakeOrderedAndProject top-n."""
    from hash_db_spark.operators import corpus_stats as CS

    return CS.term_burstiness(_docs(spark, sf_dir), "text", "doc_id")


def _term_burstiness_oracle() -> str:
    from hash_db_spark.operators import corpus_stats as CS

    return CS.sql_term_burstiness()


# r12 QUEUE CANDIDATE (the r11 queue closed at 34 — session 7):
#   "term_burstiness": Query(
#       q_term_burstiness, _term_burstiness_oracle()),


def q_eval_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization-risk spectrum: fraction of the held-out benchmark's
    distinct n-grams (n = 1..4, same doc_id < 10 benchmark as
    contamination_check) present anywhere in the training corpus —
    the curve that picks the overlap length a decontamination filter
    targets (operators/corpus_stats.py:eval_ngram_coverage)."""
    from hash_db_spark.operators import corpus_stats as CS

    return CS.eval_ngram_coverage(
        _docs(spark, sf_dir), "text", "doc_id", F.col("doc_id") < 10
    )


def _eval_ngram_coverage_oracle() -> str:
    from hash_db_spark.operators import corpus_stats as CS

    return CS.sql_eval_ngram_coverage(
        "documents", "text", "doc_id", "doc_id < 10"
    )


# r12 QUEUE CANDIDATE (the r11 queue closed at 34 — session 7):
#   "eval_ngram_coverage": Query(
#       q_eval_ngram_coverage, _eval_ngram_coverage_oracle()),


def q_retrieve_prf_rocchio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-round retrieval with Rocchio pseudo-relevance feedback:
    round 1's top chunks expand the query (alpha=1, beta=0.75,
    integer-scaled so every dot product stays exact), round 2 serves
    the expanded query — vocabulary the query never said but its best
    answers share gets pulled in
    (operators/retrieval.py:prf_rocchio_retrieve)."""
    from hash_db_spark.operators import retrieval as RT

    return RT.prf_rocchio_retrieve(
        _docs(spark, sf_dir), "text", "doc_id", RETRIEVE_TERMS, k=RETRIEVE_K
    )


def _retrieve_prf_oracle() -> str:
    from hash_db_spark.operators import retrieval as RT

    return RT.sql_prf_rocchio_retrieve(
        "documents", "text", "doc_id", RETRIEVE_TERMS, k=RETRIEVE_K
    )


# r12 QUEUE CANDIDATE (session 9):
#   "retrieve_prf_rocchio": Query(
#       q_retrieve_prf_rocchio, _retrieve_prf_oracle()),
