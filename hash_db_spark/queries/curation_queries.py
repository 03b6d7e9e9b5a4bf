"""Driver-checkable queries: model-based curation (operators/curation.py)
— hashed-linear quality classification, weighted Bernoulli sampling,
embedding standardization stats."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.operators import curation as C
from hash_db_spark.queries import Query

SAMPLE_TARGET = 100  # expected kept docs of weighted_doc_sample


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style quality scoring: hashed unigram+bigram features,
    broadcast (bucket, w_milli) model dimension, per-doc integer score
    and keep verdict. Features explode map-side; one shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return C.classifier_scores(docs, C.weight_dim(spark))


def q_weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Bernoulli sample of the corpus, inclusion probability
    proportional to n_chars (longer docs likelier), expected size
    SAMPLE_TARGET. One scan + a broadcast scalar total; integer-exact,
    reproducible, append-stable per doc_id."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return C.weighted_sample(docs, "doc_id", "n_chars", SAMPLE_TARGET)


def q_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/stddev of the corpus embeddings — the
    standardization dimension a whitening/normalization stage
    broadcasts back over the vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    return C.embedding_dim_stats(emb)


def q_embedding_project_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection of the corpus embeddings to 16 dims — the
    compression stage before banded LSH / IVF on wide vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    return C.embedding_project_jl(emb)


def q_embedding_whiten_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The application half of standardization: per-vector L2 norm of
    the whitened embeddings — stats broadcast back over the exploded
    vectors, norms reduce with partial aggregation."""
    emb = load_table(spark, sf_dir, "embeddings")
    return C.embedding_whiten_norms(emb)


def q_classifier_sample_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed curation tail: classifier-kept docs weighted-sampled to
    a token budget proxy — the classifier gate feeds the weighted
    Bernoulli sampler in ONE plan (gate is map-side after its sum;
    sampler adds only the scalar total)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = C.classifier_scores(docs, C.weight_dim(spark))
    kept = (
        docs.select("doc_id", "n_chars")
        .join(scored.filter("keep").select("doc_id"), "doc_id")
        # weighted_sample consumes its input twice (scalar total +
        # main scan); checkpoint the skinny survivor frame so the
        # scoring plan (explode + 64k model join + per-doc sum) runs
        # once, not per consumer.
        .localCheckpoint(eager=True)
    )
    return C.weighted_sample(kept, "doc_id", "n_chars", SAMPLE_TARGET)


def _classifier_sample_oracle() -> str:
    scores = C.sql_classifier_scores()
    kept = f"""(
  SELECT d.doc_id, d.n_chars
  FROM documents d
  JOIN ({scores}) s ON s.doc_id = d.doc_id AND s.keep
)"""
    return C.sql_weighted_sample(
        kept, "doc_id", "n_chars", SAMPLE_TARGET, select="doc_id, n_chars"
    )


WINNOW_K = 3  # gram width (tokens)
WINNOW_W = 4  # winnowing window (grams)


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (the MOSS local-fingerprinting guarantee): per doc,
    the distinct minimum gram-hash of every full window of WINNOW_W
    consecutive token-k-gram hashes — any shared substring of length
    >= k + w - 1 tokens is guaranteed to share a fingerprint, with a
    w-fold smaller set than all-grams. Positional grams via lead()
    windows, the winnow via ONE frame-bounded window min (integer
    md5-derived hashes, so both engines agree exactly). One shuffle
    (the per-doc window); the distinct rides its partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    return C.winnow_fps(docs, "text", "doc_id", WINNOW_K, WINNOW_W).select(
        F.col("id").alias("doc_id"), "fph"
    )


def _winnow_oracle() -> str:
    from hash_db_spark.operators.dedup import sql_clean_tokens, sql_md5_hash64

    h = sql_md5_hash64("t[i] || ' ' || t[i+1] || ' ' || t[i+2]")
    return f"""
WITH toks AS (
  SELECT doc_id, {sql_clean_tokens('text')} AS t FROM documents
),
grams AS (
  SELECT doc_id, i AS pos, {h} AS h
  FROM toks, unnest(generate_series(1, len(t) - {WINNOW_K - 1})) AS u(i)
),
winnowed AS (
  SELECT doc_id,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW
                      AND {WINNOW_W - 1} FOLLOWING) AS fph,
         count(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW
                        AND {WINNOW_W - 1} FOLLOWING) AS n_in_frame
  FROM grams
)
SELECT DISTINCT doc_id, fph FROM winnowed WHERE n_in_frame = {WINNOW_W}
"""


def q_winnow_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnow candidate pairs transitive-closed into (id, cluster) via
    the shared union-find — the keep-one-per-cluster input, giving the
    winnowing path the same cluster machinery as MinHash/SimHash/media
    dedup."""
    from hash_db_spark.operators.dedup import connected_components

    pairs = q_winnow_dup_pairs(spark, sf_dir).select("id_a", "id_b")
    return connected_components(pairs)


def _winnow_components_oracle() -> str:
    from hash_db_spark.operators.dedup import sql_connected_components

    pairs = f"""(
  SELECT id_a, id_b FROM ({_winnow_pairs_oracle()})
)"""
    return sql_connected_components(pairs)


def q_dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram of the winnow near-dup clusters:
    (cluster_size, n_clusters) — the one-glance answer to 'is my dedup
    finding pairs or pathological blobs'. Two tiny aggregations over
    the component assignment."""
    comps = q_winnow_components(spark, sf_dir)
    sizes = comps.groupBy("cluster").agg(F.count(F.lit(1)).alias("sz"))
    return (
        sizes.groupBy("sz")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(F.col("sz").alias("cluster_size"), "n_clusters")
    )


def _dup_cluster_histogram_oracle() -> str:
    return f"""
WITH comps AS ({_winnow_components_oracle()}),
sizes AS (SELECT cluster, count(*) AS sz FROM comps GROUP BY cluster)
SELECT sz AS cluster_size, count(*) AS n_clusters
FROM sizes GROUP BY sz
"""


BOUNDARY_TOKENS = 4  # = the chunking overlap, the split signature width
BOUNDARY_CHUNK = 16
BOUNDARY_MAX_DF = 20  # boilerplate-boundary cap (house hot-key rule)


def q_doc_boundary_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-document detection WITH ground truth: run the
    tail-equals-head detector over the overlap-chunked corpus (16-token
    chunks, 4-token overlap), where adjacent chunks of one document
    REALLY share their boundary by construction. Output pairs carry an
    is_adjacent flag (same doc, consecutive index), so precision is
    auditable: non-adjacent hits are the detector's coincidence rate.
    (Whole docs would be vacuous here — random fixture text has no
    natural split docs; probed before shipping.) Map-side head/tail
    hashing, ONE equijoin on the boundary hash, with the house hot-key
    cap: a boundary hash carried by more than BOUNDARY_MAX_DF chunk
    ends is boilerplate (page footers, license headers) and would make
    its join key quadratic at corpus scale — it is anti-joined out of
    BOTH sides before the equijoin (documented recall trade, exact in
    the oracle too). The skinny hash frame is checkpointed once: it
    feeds the hot set and both join sides, and Spark re-executes
    un-materialized subplans once per consumer."""
    docs = load_table(spark, sf_dir, "documents")
    return boundary_overlap_pairs(docs)


def boundary_overlap_pairs(docs: DataFrame) -> DataFrame:
    """The detector itself over any (doc_id, text) frame — split out of
    the entry so the hot-key cap is unit-testable with constructed
    boilerplate (the fixtures' random text never trips it)."""
    from hash_db_spark.operators import chunking
    from hash_db_spark.operators.dedup import clean_tokens, md5_hash64

    ch = chunking.token_chunks(
        docs, "text", "doc_id", size=BOUNDARY_CHUNK, overlap=BOUNDARY_TOKENS
    )
    t = clean_tokens("chunk_text")
    n = F.size(t)
    eligible = (
        ch.select(
            "id",
            "chunk_idx",
            md5_hash64(
                F.array_join(F.slice(t, 1, BOUNDARY_TOKENS), " ")
            ).alias("head_h"),
            # Total expression: guarded so the slice start can never be
            # <= 0 for short chunks — correctness must not depend on
            # Catalyst pushing the n_toks filter below this projection.
            md5_hash64(
                F.when(
                    n >= BOUNDARY_TOKENS,
                    F.array_join(
                        F.slice(
                            t, n - BOUNDARY_TOKENS + 1, BOUNDARY_TOKENS
                        ),
                        " ",
                    ),
                )
            ).alias("tail_h"),
            n.alias("n_toks"),
        )
        .filter(F.col("n_toks") >= BOUNDARY_TOKENS)
        .localCheckpoint(eager=True)
    )
    # Hot boundary hashes by combined head+tail df — ONE pass via
    # explode (a self-union of two selects would run the plan twice).
    hot = (
        eligible.select(F.explode(F.array("tail_h", "head_h")).alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > BOUNDARY_MAX_DF)
        .select("h")
    )
    a = eligible.select(
        F.col("id").alias("id_a"), F.col("chunk_idx").alias("idx_a"), "tail_h"
    ).join(F.broadcast(hot), F.col("tail_h") == F.col("h"), "left_anti")
    b = eligible.select(
        F.col("id").alias("id_b"), F.col("chunk_idx").alias("idx_b"), "head_h"
    ).join(F.broadcast(hot), F.col("head_h") == F.col("h"), "left_anti")
    return (
        a.join(b, a.tail_h == b.head_h)
        .filter(
            (F.col("id_a") != F.col("id_b"))
            | (F.col("idx_a") != F.col("idx_b"))
        )
        .select(
            "id_a",
            "idx_a",
            "id_b",
            "idx_b",
            (
                (F.col("id_a") == F.col("id_b"))
                & (F.col("idx_b") == F.col("idx_a") + 1)
            ).alias("is_adjacent"),
        )
    )


def _boundary_overlap_oracle() -> str:
    from hash_db_spark.operators.chunking import sql_token_chunks
    from hash_db_spark.operators.dedup import sql_clean_tokens, sql_md5_hash64

    inner = sql_token_chunks(
        "documents", "text", "doc_id",
        size=BOUNDARY_CHUNK, overlap=BOUNDARY_TOKENS,
    )
    toks = sql_clean_tokens("chunk_text")
    head = sql_md5_hash64(
        f"list_aggregate(list_slice({toks}, 1, {BOUNDARY_TOKENS}),"
        f" 'string_agg', ' ')"
    )
    tail = sql_md5_hash64(
        f"list_aggregate(list_slice({toks}, len({toks}) - {BOUNDARY_TOKENS}"
        f" + 1, len({toks})), 'string_agg', ' ')"
    )
    return f"""
WITH e AS (
  SELECT id, chunk_idx, {head} AS head_h, {tail} AS tail_h
  FROM ({inner}) WHERE len({toks}) >= {BOUNDARY_TOKENS}
),
hot AS (
  SELECT h FROM (
    SELECT unnest([tail_h, head_h]) AS h FROM e
  ) GROUP BY h HAVING count(*) > {BOUNDARY_MAX_DF}
)
SELECT a.id AS id_a, a.chunk_idx AS idx_a,
       b.id AS id_b, b.chunk_idx AS idx_b,
       (a.id = b.id AND b.chunk_idx = a.chunk_idx + 1) AS is_adjacent
FROM e a JOIN e b ON a.tail_h = b.head_h
WHERE (a.id <> b.id OR a.chunk_idx <> b.chunk_idx)
  AND a.tail_h NOT IN (SELECT h FROM hot)
  AND b.head_h NOT IN (SELECT h FROM hot)
"""


WINNOW_MAX_DF = 20  # boilerplate-fingerprint cap (house hot-key rule)


def q_winnow_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing's consumer: candidate near-dup pairs sharing >= 2
    winnowed fingerprints. Fingerprints carried by more than
    WINNOW_MAX_DF docs are boilerplate and excluded BEFORE the
    self-join (the house hot-key cap — documented recall trade, exact
    in the oracle too), so the equijoin is bounded per key."""
    from hash_db_spark.queries.curation_queries import q_winnow_fingerprints

    # The fingerprint plan (posexplode + two windows) feeds THREE
    # consumers — the hot set and both self-join sides — and Spark
    # re-executes un-materialized subplans once per consumer:
    # checkpoint the skinny (doc_id, fph) frame once (measured -38%
    # wall at sf0.1 including the checkpoint build).
    fps = q_winnow_fingerprints(spark, sf_dir).localCheckpoint(
        eager=True
    )
    # Broadcast the HOT side, never the cold one: the set of
    # fingerprints with df > WINNOW_MAX_DF is bounded by
    # total_instances / WINNOW_MAX_DF (the house rule — lines.py,
    # dedup.py), while the cold complement is O(distinct
    # fingerprints) ~ corpus-sized and would OOM every executor at
    # 100 TB if force-broadcast.
    hot = (
        fps.groupBy("fph")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > WINNOW_MAX_DF)
        .select("fph")
    )
    cold = fps.join(F.broadcast(hot), "fph", "left_anti")
    a, b = cold.alias("a"), cold.alias("b")
    return (
        a.join(b, "fph")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


def _winnow_pairs_oracle() -> str:
    return f"""
WITH fps AS ({_winnow_oracle()}),
cold AS (
  SELECT doc_id, fph FROM fps
  WHERE fph IN (
    SELECT fph FROM fps GROUP BY fph HAVING count(*) <= {WINNOW_MAX_DF}
  )
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
FROM cold a JOIN cold b ON a.fph = b.fph AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= 2
"""


SHARE_LINE_TOKENS = 2  # the lines-family pseudo-line convention


def q_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source sharing matrix: for every source pair, how many
    distinct LINES both carry — the which-sources-share-boilerplate
    diagnostic that decides dedup order and template stripping scope.
    (Whole-doc fingerprints would be vacuous here: exact doc dups never
    span sources on these fixtures — the degenerate-fixture trap.)
    Distinct (line, source) pairs self-join on the line value; the
    shuffle is that distinct relation, not the corpus."""
    from hash_db_spark.operators import chunking

    docs = load_table(spark, sf_dir, "documents")
    ch = chunking.token_chunks(
        docs, "text", "doc_id", size=SHARE_LINE_TOKENS, overlap=0
    )
    ls = (
        ch.join(docs.select(F.col("doc_id").alias("id"), "source"), "id")
        .select(F.col("chunk_text").alias("line"), "source")
        .distinct()
    )
    a, b = ls.alias("a"), ls.alias("b")
    return (
        a.join(b, "line")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def _source_dup_matrix_oracle() -> str:
    from hash_db_spark.operators.chunking import sql_token_chunks

    inner = sql_token_chunks(
        "documents", "text", "doc_id", size=SHARE_LINE_TOKENS, overlap=0
    )
    return f"""
WITH ls AS (
  SELECT DISTINCT c.chunk_text AS line, d.source
  FROM ({inner}) c JOIN documents d ON d.doc_id = c.id
)
SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
FROM ls a JOIN ls b ON a.line = b.line AND a.source < b.source
GROUP BY 1, 2
"""


# Gopher-style rule thresholds (Rae et al. 2021 repetition/quality
# rules, the subset expressible over these fixtures).
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_WLEN, GOPHER_MAX_WLEN = 3.0, 10.0
GOPHER_MIN_ALPHA = 0.8
GOPHER_MIN_STOPWORDS = 2


def q_gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rule bundle as one map-side projection: word count
    band, mean word length band, alphabetic-word fraction, minimum
    stopword hits — each rule column REALLY computed (pure codegen
    regexp/length arithmetic) plus the combined verdict. The word-count
    floor is the rule that bites on these fixtures."""
    from hash_db_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    n_words = token_count("text")
    nonspace = F.length(F.regexp_replace("text", r"\s", ""))
    mean_wlen = F.round(nonspace / n_words, 4)
    alpha_words = F.size(
        F.regexp_extract_all("text", F.lit(r"\b[a-zA-Z]+\b"), 0)
    )
    alpha_frac = F.round(alpha_words / n_words, 4)
    stopwords = F.size(
        F.regexp_extract_all(
            "text", F.lit(r"\b(?:the|a|of|and|to)\b"), 0
        )
    )
    out = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wlen.alias("mean_wlen"),
        alpha_frac.alias("alpha_frac"),
        stopwords.alias("n_stopwords"),
    )
    passed = (
        F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & F.col("mean_wlen").between(GOPHER_MIN_WLEN, GOPHER_MAX_WLEN)
        & (F.col("alpha_frac") >= GOPHER_MIN_ALPHA)
        & (F.col("n_stopwords") >= GOPHER_MIN_STOPWORDS)
    )
    return out.withColumn("pass", passed)


def _gopher_oracle() -> str:
    from hash_db_spark.functions.text import sql_token_count

    n = sql_token_count("text")
    mean_wlen = f"round(length(regexp_replace(text, '\\s', '', 'g')) / {n}, 4)"
    alpha = f"round(len(regexp_extract_all(text, '\\b[a-zA-Z]+\\b')) / {n}, 4)"
    stop = r"len(regexp_extract_all(text, '\b(?:the|a|of|and|to)\b'))"
    return f"""
SELECT doc_id,
       CAST({n} AS INT) AS n_words,
       {mean_wlen} AS mean_wlen,
       {alpha} AS alpha_frac,
       CAST({stop} AS INT) AS n_stopwords,
       ({n} BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
        AND {mean_wlen} BETWEEN {GOPHER_MIN_WLEN} AND {GOPHER_MAX_WLEN}
        AND {alpha} >= {GOPHER_MIN_ALPHA}
        AND {stop} >= {GOPHER_MIN_STOPWORDS}) AS pass
FROM documents
"""


MIX_TEMPERATURE = 2.0


def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture weights from OBSERVED language token
    shares: w_l = share_l^(1/T) renormalized (T=2 flattens toward
    uniform — the standard multilingual upweighting of low-resource
    languages). One corpus aggregation to the language dimension; the
    normalizations are windows over that dimension-sized frame (a few
    rows), never the corpus."""
    from pyspark.sql import Window

    from hash_db_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.sum(token_count("text")).alias("n_toks")
    )
    wall = Window.partitionBy()
    share = F.col("n_toks") / F.sum("n_toks").over(wall)
    raw = F.pow(share, 1.0 / MIX_TEMPERATURE)
    return per_lang.select(
        "lang",
        "n_toks",
        F.round(share, 4).alias("share"),
        F.round(raw / F.sum(raw).over(wall), 4).alias("temp_weight"),
    )


def _mixture_temperature_oracle() -> str:
    from hash_db_spark.functions.text import sql_token_count

    # window calls cannot nest in DuckDB: one CTE level per window
    return f"""
WITH per_lang AS (
  SELECT lang, CAST(sum({sql_token_count('text')}) AS BIGINT) AS n_toks
  FROM documents GROUP BY lang
),
shared AS (
  SELECT lang, n_toks, n_toks / sum(n_toks) OVER () AS share
  FROM per_lang
),
raw AS (SELECT *, pow(share, {1.0 / MIX_TEMPERATURE}) AS rw FROM shared)
SELECT lang, n_toks,
       round(share, 4) AS share,
       round(rw / sum(rw) OVER (), 4) AS temp_weight
FROM raw
"""


MIX_SELECT_BUDGET = 6000  # total token budget across languages


def q_mixture_temp_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture loop closed: temperature weights (observed shares,
    T=2) become per-language token budgets, and each language fills its
    budget in priority order (longest docs first, id tie-break) — ONE
    partitioned running-sum window; the data-driven budget dimension
    rides a broadcast join (unlike the static-dict stratum selector)."""
    from pyspark.sql import Window

    from hash_db_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", token_count("text").alias("n_toks")
    )
    budgets = q_mixture_temperature(spark, sf_dir).select(
        "lang",
        F.round(F.col("temp_weight") * MIX_SELECT_BUDGET)
        .cast("long")
        .alias("budget"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        docs.withColumn("cum_weight", F.sum("n_toks").over(w))
        .join(F.broadcast(budgets), "lang")
        .filter(F.col("cum_weight") <= F.col("budget"))
        .select("doc_id", "lang", "n_toks", "cum_weight")
    )


def _mixture_temp_select_oracle() -> str:
    from hash_db_spark.functions.text import sql_token_count

    return f"""
WITH weights AS ({_mixture_temperature_oracle()}),
budgets AS (
  SELECT lang,
         CAST(round(temp_weight * {MIX_SELECT_BUDGET}) AS BIGINT) AS budget
  FROM weights
),
d AS (
  SELECT doc_id, lang, n_chars, {sql_token_count('text')} AS n_toks
  FROM documents
),
r AS (
  SELECT doc_id, lang, n_toks,
         sum(n_toks) OVER (PARTITION BY lang
                           ORDER BY n_chars DESC, doc_id ASC
                           ROWS UNBOUNDED PRECEDING) AS cum_weight
  FROM d
)
SELECT r.doc_id, r.lang, CAST(r.n_toks AS INT) AS n_toks,
       CAST(r.cum_weight AS BIGINT) AS cum_weight
FROM r JOIN budgets b ON b.lang = r.lang
WHERE r.cum_weight <= b.budget
"""


SEG_CHUNK_TOKENS = 10


def q_doc_lang_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-language document segmentation: language-ID each 10-token
    chunk, then run-length-compress consecutive same-language chunks
    into (doc, segment, lang, start, end) spans — the stage that splits
    a mixed-language page before language-specific pipelines. One
    shuffle (the per-doc window); the groupBy reuses its partitioning."""
    from pyspark.sql import Window

    from hash_db_spark.functions import text as T
    from hash_db_spark.operators import chunking

    docs = load_table(spark, sf_dir, "documents")
    ch = chunking.token_chunks(
        docs, "text", "doc_id", size=SEG_CHUNK_TOKENS, overlap=0
    )
    w = Window.partitionBy("id").orderBy("chunk_idx")
    # lang_id_fast, not lang_id: chunk labeling is the hot path and the
    # HOF filter() variant evaluates interpreted per chunk
    labeled = ch.select(
        "id", "chunk_idx", T.lang_id_fast("chunk_text").alias("lg")
    ).withColumn(
        "new_seg",
        F.when(
            F.lag("lg").over(w).isNull() | (F.lag("lg").over(w) != F.col("lg")),
            1,
        ).otherwise(0),
    )
    segged = labeled.withColumn(
        "seg",
        F.sum("new_seg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        segged.groupBy("id", "seg", "lg")
        .agg(
            F.min("chunk_idx").alias("start_idx"),
            F.max("chunk_idx").alias("end_idx"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .select(
            F.col("id").alias("doc_id"),
            F.col("seg").cast("long").alias("seg"),
            F.col("lg").alias("lang"),
            "start_idx",
            "end_idx",
            "n_chunks",
        )
    )


def _doc_lang_segments_oracle() -> str:
    from hash_db_spark.functions.text import sql_lang_id_fast
    from hash_db_spark.operators.chunking import sql_token_chunks

    inner = sql_token_chunks(
        "documents", "text", "doc_id", size=SEG_CHUNK_TOKENS, overlap=0
    )
    return f"""
WITH chunks AS (SELECT * FROM ({inner})),
labeled AS (
  SELECT id, chunk_idx, {sql_lang_id_fast('chunk_text')} AS lg,
         CASE WHEN lag({sql_lang_id_fast('chunk_text')})
                     OVER (PARTITION BY id ORDER BY chunk_idx) IS NULL
                OR lag({sql_lang_id_fast('chunk_text')})
                     OVER (PARTITION BY id ORDER BY chunk_idx)
                   <> {sql_lang_id_fast('chunk_text')}
              THEN 1 ELSE 0 END AS new_seg
  FROM chunks
),
segged AS (
  SELECT id, chunk_idx, lg,
         sum(new_seg) OVER (PARTITION BY id ORDER BY chunk_idx) AS seg
  FROM labeled
)
SELECT id AS doc_id,
       CAST(seg AS BIGINT) AS seg,
       lg AS lang,
       min(chunk_idx) AS start_idx,
       max(chunk_idx) AS end_idx,
       CAST(count(*) AS BIGINT) AS n_chunks
FROM segged
GROUP BY id, seg, lg
"""


def q_lm_trigram_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated trigram LM scoring, reference-vs-target: even docs
    train the counts, odd docs are scored (the CCNet split shape —
    a clean reference corpus scores the crawl)."""
    docs = load_table(spark, sf_dir, "documents")
    return C.trigram_interp_logprob(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1),
        "text",
        "doc_id",
    )


def q_decontaminate_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURGICAL decontamination: instead of dropping a contaminated doc
    (contamination_check) it masks exactly the tokens covered by any
    benchmark trigram, keeping the rest of the document trainable.
    Positional grams come from lead() windows over posexploded tokens
    (no interpreted HOFs); the benchmark gram set broadcasts; masked
    position ranges union per doc; reassembly is the lines.py
    collect-sort idiom. Every shuffle is keyed by doc_id."""
    from pyspark.sql import Window

    from hash_db_spark.operators.dedup import clean_tokens, shingles

    docs = load_table(spark, sf_dir, "documents")
    bench = (
        docs.filter(F.col("doc_id") < 10)
        .select(F.explode(shingles("text")).alias("g"))
        .distinct()
    )
    toks = docs.filter(F.col("doc_id") >= 10).select(
        "doc_id", F.posexplode(clean_tokens("text")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    # concat_ws skips the NULL leads at doc end, yielding 1/2-token
    # strings that cannot equal a 3-token benchmark gram — no end guard
    # needed.
    grams = toks.withColumn(
        "g",
        F.concat_ws(
            " ", "tok", F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
        ),
    )
    starts = grams.join(F.broadcast(bench), "g").select("doc_id", "pos")
    masked = (
        starts.select(
            F.col("doc_id").alias("mid"),
            F.explode(
                F.array(F.col("pos"), F.col("pos") + 1, F.col("pos") + 2)
            ).alias("mpos"),
        )
        .distinct()
    )
    rebuilt = toks.join(
        masked,
        (F.col("doc_id") == F.col("mid")) & (F.col("pos") == F.col("mpos")),
        "left",
    ).select(
        "doc_id",
        "pos",
        F.col("mpos").isNotNull().alias("is_masked"),
        F.when(F.col("mpos").isNotNull(), F.lit("<mask>"))
        .otherwise(F.col("tok"))
        .alias("out_tok"),
    )
    parts = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "out_tok"))),
        lambda s: s.out_tok,
    )
    return (
        rebuilt.groupBy("doc_id")
        .agg(
            F.sum(F.col("is_masked").cast("long")).alias("n_masked"),
            F.array_join(parts, " ").alias("text_masked"),
        )
        .filter(F.col("n_masked") > 0)
    )


def _decontaminate_mask_oracle() -> str:
    from hash_db_spark.operators.dedup import sql_clean_tokens, sql_shingles

    return f"""
WITH bench AS (
  SELECT DISTINCT unnest({sql_shingles('text', 3)}) AS g
  FROM documents WHERE doc_id < 10
),
toks AS (
  SELECT doc_id, {sql_clean_tokens('text')} AS t
  FROM documents WHERE doc_id >= 10
),
pt AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS tok
  FROM toks, unnest(generate_series(1, len(t))) AS u(i)
),
starts AS (
  SELECT doc_id, i - 1 AS pos
  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE (t[i] || ' ' || t[i+1] || ' ' || t[i+2]) IN (SELECT g FROM bench)
),
masked AS (
  SELECT DISTINCT doc_id, pos + d AS mpos
  FROM starts, unnest(generate_series(0, 2)) AS v(d)
)
SELECT p.doc_id,
       CAST(sum(CASE WHEN m.mpos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_masked,
       string_agg(CASE WHEN m.mpos IS NOT NULL THEN '<mask>' ELSE p.tok END,
                  ' ' ORDER BY p.pos) AS text_masked
FROM pt p
LEFT JOIN masked m ON m.doc_id = p.doc_id AND m.mpos = p.pos
GROUP BY p.doc_id
HAVING sum(CASE WHEN m.mpos IS NOT NULL THEN 1 ELSE 0 END) > 0
"""


def q_stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming classifier gate: documents stream -> hashed features ->
    stream-static broadcast join with the weight dimension -> per-doc
    score aggregation -> keep filter. availableNow single batch, so
    complete mode equals the batch classifier restricted to keep=true —
    the oracle. At 100 TB the same plan runs on a real source with the
    aggregation keyed per micro-batch (doc rows don't straddle files)."""
    from hash_db_spark.streaming import windows as SW

    docs = SW.read_documents_stream(spark, sf_dir)
    scored = C.classifier_scores(docs, C.weight_dim(spark))
    return SW.run_stream_to_memory(
        scored.filter("keep").select("doc_id", "n_feats", "z_milli"),
        output_mode="complete",
    )


def _stream_quality_gate_oracle() -> str:
    return (
        f"SELECT doc_id, n_feats, z_milli FROM ({C.sql_classifier_scores()})"
        f" WHERE keep"
    )


DEDUP_BUDGET = 6000  # tokens


def q_dedup_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assemble-the-training-set step as ONE plan: exact-dedup
    survivors (keep-first by content fingerprint) filled into a token
    budget in priority order (longest first, id tie-break). Composes
    the dedup keep-set semi-join with the distributed global cumsum —
    no single-task window anywhere."""
    from hash_db_spark.functions.text import token_count
    from hash_db_spark.operators.dedup import exact_dedup_keep_first
    from hash_db_spark.operators.rank import take_to_budget

    docs = load_table(spark, sf_dir, "documents")
    keep = exact_dedup_keep_first(docs, "text", "doc_id").select(
        F.col("keep_id").alias("doc_id")
    )
    survivors = docs.join(keep, "doc_id", "semi").select(
        "doc_id", "n_chars", token_count("text").alias("n_toks")
    )
    return take_to_budget(
        survivors,
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        "n_toks",
        DEDUP_BUDGET,
    ).select("doc_id", "n_toks", "cum_weight")


def _dedup_budget_oracle() -> str:
    from hash_db_spark.functions.text import sql_fingerprint, sql_token_count

    return f"""
WITH keep AS (
  SELECT min(doc_id) AS doc_id FROM documents
  GROUP BY {sql_fingerprint('text')}
),
survivors AS (
  SELECT d.doc_id, d.n_chars, {sql_token_count('d.text')} AS n_toks
  FROM documents d
  WHERE d.doc_id IN (SELECT doc_id FROM keep)
),
ordered AS (
  SELECT doc_id, n_toks,
         sum(n_toks) OVER (ORDER BY n_chars DESC, doc_id ASC
                           ROWS UNBOUNDED PRECEDING) AS cum_weight
  FROM survivors
)
SELECT doc_id, n_toks, CAST(cum_weight AS BIGINT) AS cum_weight
FROM ordered
WHERE cum_weight <= {DEDUP_BUDGET}
"""


def q_corpus_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus health dashboard in ONE plan: doc count,
    heuristic-gate pass rate inputs, exact-duplicate count, language
    agreement, and mean token length. The dup flag is carried by a
    count() window over the md5 fingerprint — ONE corpus-keyed
    shuffle, no join-back at all. (A raw crawl pre-dedup is 30-50%
    duplicates, so the duplicate-fingerprint set is O(n): it must
    never be broadcast.)"""
    from pyspark.sql import Window

    from hash_db_spark.functions.text import (
        lang_id_fast,
        quality_score_fast,
        token_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.md5("text").alias("fp"),
        (quality_score_fast("text") >= 0.5).alias("q_ok"),
        (lang_id_fast("text") == F.col("lang")).alias("lang_ok"),
        token_count("text").alias("n_toks"),
    )
    enriched = per_doc.select(
        "source",
        (F.count(F.lit(1)).over(Window.partitionBy("fp")) > 1).alias(
            "is_dup"
        ),
        "q_ok",
        "lang_ok",
        "n_toks",
    )
    return enriched.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dups"),
        F.sum(F.col("q_ok").cast("long")).alias("n_quality_ok"),
        F.sum(F.col("lang_ok").cast("long")).alias("n_lang_ok"),
        F.round(F.avg("n_toks"), 4).alias("avg_tokens"),
    )


def _corpus_health_oracle() -> str:
    from hash_db_spark.functions.text import (
        sql_lang_id_fast,
        sql_quality_score_fast,
        sql_token_count,
    )

    return f"""
WITH fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
dup_fp AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) > 1),
enriched AS (
  SELECT d.source,
         (f.fp IN (SELECT fp FROM dup_fp)) AS is_dup,
         ({sql_quality_score_fast('d.text')} >= 0.5) AS q_ok,
         ({sql_lang_id_fast('d.text')} = d.lang) AS lang_ok,
         {sql_token_count('d.text')} AS n_toks
  FROM documents d JOIN fp f ON f.doc_id = d.doc_id
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dups,
       CAST(sum(CASE WHEN q_ok THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality_ok,
       CAST(sum(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lang_ok,
       round(avg(n_toks), 4) AS avg_tokens
FROM enriched
GROUP BY source
"""




EPOCH_BUDGET_X = 4.0   # token budget = 4x the corpus (data-constrained)
EPOCH_MAX_REPEATS = 3.5  # cap: diminishing returns past ~4 epochs


def q_epoch_repeat_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained epoch planning (Muennighoff et al. 2023,
    arXiv:2305.16264 — public: repeating data up to ~4 epochs is nearly
    as good as fresh data): temperature-weighted per-language token
    budgets against AVAILABLE tokens -> per-language repeat factors
    (capped), achieved tokens, and the unfillable deficit the mixture
    must redistribute. All arithmetic on the language dimension (a
    few rows after one corpus aggregation); windows never touch the
    corpus."""
    from pyspark.sql import Window

    from hash_db_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.sum(token_count("text")).alias("n_toks")
    )
    wall = Window.partitionBy()
    share = F.col("n_toks") / F.sum("n_toks").over(wall)
    raw = F.pow(share, 1.0 / MIX_TEMPERATURE)
    w = raw / F.sum(raw).over(wall)
    budget = F.lit(EPOCH_BUDGET_X) * F.sum("n_toks").over(wall)
    desired = budget * w
    repeat = F.least(F.lit(EPOCH_MAX_REPEATS), desired / F.col("n_toks"))
    achieved = F.col("n_toks") * repeat
    return per_lang.select(
        "lang",
        "n_toks",
        F.round(desired, 2).alias("desired_toks"),
        F.round(repeat, 4).alias("repeat_factor"),
        F.round(achieved, 2).alias("achieved_toks"),
        F.round(desired - achieved, 2).alias("deficit_toks"),
    )


def _epoch_repeat_plan_oracle() -> str:
    from hash_db_spark.functions.text import sql_token_count

    return f"""
WITH per_lang AS (
  SELECT lang, CAST(sum({sql_token_count('text')}) AS BIGINT) AS n_toks
  FROM documents GROUP BY lang
),
shared AS (
  SELECT lang, n_toks,
         n_toks / sum(n_toks) OVER () AS share,
         {EPOCH_BUDGET_X} * sum(n_toks) OVER () AS budget
  FROM per_lang
),
raw AS (SELECT *, pow(share, {1.0 / MIX_TEMPERATURE}) AS rw FROM shared),
wts AS (SELECT *, rw / sum(rw) OVER () AS w FROM raw),
plan AS (
  SELECT lang, n_toks, budget * w AS desired,
         least({EPOCH_MAX_REPEATS}, (budget * w) / n_toks) AS rep
  FROM wts
)
SELECT lang, n_toks,
       round(desired, 2) AS desired_toks,
       round(rep, 4) AS repeat_factor,
       round(n_toks * rep, 2) AS achieved_toks,
       round(desired - n_toks * rep, 2) AS deficit_toks
FROM plan
"""


# --- DSIR importance resampling (Xie et al. 2023) -----------------------------


DSIR_TARGET_PRED = "lang = 'en'"
DSIR_SAMPLE_N = 64


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (arXiv:2302.03169): hashed-ngram unigram
    models of the target (English) and raw corpus distributions; per-doc
    log importance weight in exact integer micro-nats. The model dim is
    hard-bounded at 65,536 rows (broadcast is scale-invariant); the only
    corpus-sized shuffle is the per-doc sum."""
    docs = load_table(spark, sf_dir, "documents")
    return C.dsir_weights(docs, F.col("lang") == "en")


def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel-top-k DSIR resample: selects DSIR_SAMPLE_N docs with
    probability proportional to their importance weight, via the exact
    integer key w_micro + gumbel_micro (content-addressed noise, so the
    draw is reproducible and append-stable). TakeOrderedAndProject —
    no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    return C.dsir_resample(
        C.dsir_weights(docs, F.col("lang") == "en"), DSIR_SAMPLE_N
    )


def q_stream_dsir_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING DSIR ingest gate, fit-once / probe-per-batch: the
    batch side fits the log-ratio dimension AND its operating point
    (the fit corpus's total w_micro / total n_feats — the model's own
    mean per-feature weight) and publishes both atomically
    (publish_index — crash-safe, version-pinned); the stream side
    probes the PUBLISHED artifact with a stream-static broadcast join
    and keeps docs scoring above the shipped mean. The gate compares
    by exact integer cross-multiplication (w*tot_f > tot_w*n), so
    stream and batch agree bit-for-bit; at a 100 TB fit corpus the
    artifact would ship the floor-divided mean instead (the product
    would exceed int64). availableNow single batch == the batch filter
    — the oracle. Store keyed by (sf, pid): the fts_serve_mixed race
    discipline."""
    import hashlib
    import os
    import tempfile

    from hash_db_spark.sources.writers import publish_index, published_dir
    from hash_db_spark.streaming import windows as SW

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    store = (
        f"{tempfile.gettempdir()}/hash_db_spark_dsir_{tag}_{os.getpid()}"
    )
    docs = load_table(spark, sf_dir, "documents")

    def stage(d: str) -> None:
        lr = C.dsir_log_ratio_dim(docs, F.col("lang") == "en")
        lr.coalesce(1).write.parquet(f"{d}/dim")
        C.dsir_score(docs, lr).agg(
            F.sum("w_micro").alias("tot_w"),
            F.sum("n_feats").alias("tot_f"),
        ).coalesce(1).write.parquet(f"{d}/meta")

    publish_index(spark, store, stage)
    pdir = published_dir(spark, store)
    dim = spark.read.parquet(f"{pdir}/dim")
    meta = spark.read.parquet(f"{pdir}/meta").collect()[0]
    stream = SW.read_documents_stream(spark, sf_dir)
    gated = C.dsir_score(stream, dim).filter(
        F.col("w_micro") * F.lit(int(meta.tot_f))
        > F.lit(int(meta.tot_w)) * F.col("n_feats")
    )
    return SW.run_stream_to_memory(gated, output_mode="complete")


def _stream_dsir_gate_oracle() -> str:
    return f"""
WITH w AS ({C.sql_dsir_weights(DSIR_TARGET_PRED)}),
tot AS (SELECT sum(w_micro) AS tw, sum(n_feats) AS tf FROM w)
SELECT doc_id, n_feats, w_micro
FROM w CROSS JOIN tot
WHERE w_micro * tf > tw * n_feats
"""


def q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table (ECE decomposition, Guo et al. ICML 2017) of
    the trained quality classifier against the Gopher rule gate it was
    distilled from: sigmoid scores micro-quantized once, bucketed by
    the integer, every aggregate an exact integer sum, TOTAL row = the
    calibration-error mass. The ML-ops answer to 'can I trust the
    keep-probability as a probability?'. Two map-side projections + one
    <= 10-row shuffle beyond the classifier's own."""
    docs = load_table(spark, sf_dir, "documents")
    gate = q_gopher_quality_gate(spark, sf_dir).select(
        "doc_id", F.col("pass").alias("label")
    )
    scored = C.classifier_scores(docs, C.weight_dim(spark)).join(
        gate, "doc_id"
    )
    return C.calibration_report(scored, "z_milli", "label")


def _quality_calibration_oracle() -> str:
    scored_sql = f"""SELECT s.doc_id, s.z_milli, g.pass AS label
FROM ({C.sql_classifier_scores()}) s
JOIN ({_gopher_oracle()}) g USING (doc_id)"""
    return C.sql_calibration_report(scored_sql, "z_milli", "label")


# r12 QUEUE CANDIDATE (the r11 queue closed at 34 — session 7):
#   "quality_calibration": Query(
#       q_quality_calibration, _quality_calibration_oracle()),


SOFT_DEDUP_TARGET = 150
SOFT_DEDUP_W = 1_000_000  # weight numerator: w = W / dup_group_size


def q_soft_dedup_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT deduplication: instead of deleting duplicates, downweight
    them — each exact-duplicate group's members get sampling weight
    1/group_size, so a group contributes ONE document's expected mass
    to the sample no matter how many copies the crawl collected (the
    reweight-don't-drop alternative the soft-dedup line of work
    advocates; composition of the exact-dup census with the
    integer-exact weighted Bernoulli sampler). One extra content-keyed
    shuffle (the group census) before the one-scan sample."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.md5("text"))
    weighted = docs.select(
        "doc_id",
        (F.lit(SOFT_DEDUP_W) / F.count(F.lit(1)).over(w))
        .cast("long")
        .alias("w"),
    )
    return C.weighted_sample(weighted, "doc_id", "w", SOFT_DEDUP_TARGET)


def _soft_dedup_oracle() -> str:
    inner = f"""(
  SELECT doc_id,
         CAST({SOFT_DEDUP_W} // (count(*) OVER (PARTITION BY md5(text)))
              AS BIGINT) AS w
  FROM documents
)"""
    return C.sql_weighted_sample(
        inner, "doc_id", "w", SOFT_DEDUP_TARGET, "doc_id, w"
    )


# r12 QUEUE CANDIDATE (the r11 queue closed at 34 — session 7):
#   "soft_dedup_sample": Query(
#       q_soft_dedup_sample, _soft_dedup_oracle()),


def q_sampling_ess_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-sample-size diagnostics for the DSIR importance
    weights, per source slice: Kish ESS, ESS/n, and the heaviest
    document's weight share — the pre-flight check that an importance
    RESAMPLE (dsir_resample) won't collapse onto a few documents
    (operators/curation.py:ess_report)."""
    docs = load_table(spark, sf_dir, "documents")
    return C.ess_report(
        C.dsir_weights(docs, F.col("lang") == "en"), docs
    )


def _sampling_ess_oracle() -> str:
    return C.sql_ess_report(DSIR_TARGET_PRED)


# r12 QUEUE CANDIDATE (the r11 queue closed at 34 — session 7):
#   "sampling_ess_report": Query(
#       q_sampling_ess_report, _sampling_ess_oracle()),


def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-SHAPED noisy release of per-source contribution counts —
    the publication plumbing for per-contributor tallies. Registered
    with the PUBLIC demo seed so the DuckDB oracle can replay it, which
    makes THIS fixture deterministic jitter, not a privacy guarantee:
    the DP contract requires secret per-release seed material supplied
    by the caller (operators/curation.py:dp_noisy_counts documents the
    conditions, including the (eps, delta~2^-20) tail-truncation
    caveat)."""
    return C.dp_noisy_counts(
        load_table(spark, sf_dir, "documents"),
        "source",
        seed=C.DEMO_JITTER_SEED,
    )


def _dp_noisy_counts_oracle() -> str:
    return C.sql_dp_noisy_counts(
        "documents", "source", seed=C.DEMO_JITTER_SEED
    )


# r12 QUEUE CANDIDATE (session 9):
#   "dp_noisy_counts": Query(q_dp_noisy_counts, _dp_noisy_counts_oracle()),


def q_score_quantile_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signal fusion for heterogeneous quality scores: the heuristic
    quality score and the corpus-LM logprob live on incompatible
    scales, so each is rank-normalized to its exact percent-rank
    (distributed — operators/rank.py range partitioning, no
    single-task window) and blended 50/50 — the quantile-normalization
    trick that makes any two per-doc signals combinable without
    calibration. Output: both percent-ranks + the blend per doc."""
    from hash_db_spark.functions.text import quality_score_fast
    from hash_db_spark.operators.corpus_stats import doc_bigram_logprob
    from hash_db_spark.operators.rank import ntile_global

    docs = load_table(spark, sf_dir, "documents")
    q = docs.select("doc_id", quality_score_fast("text").alias("q"))
    lm = doc_bigram_logprob(docs, "text", "doc_id").select(
        F.col("id").alias("doc_id"), "bigram_logprob"
    )
    both = q.join(lm, "doc_id")
    rq = ntile_global(
        both,
        [F.col("q").asc(), F.col("doc_id").asc()],
        n=2,
        out="__b1",
        prank_col="q_prank",
    ).select("doc_id", "q", "bigram_logprob", "q_prank")
    rl = ntile_global(
        rq,
        [F.col("bigram_logprob").asc(), F.col("doc_id").asc()],
        n=2,
        out="__b2",
        prank_col="lm_prank",
    ).select("doc_id", "q_prank", "lm_prank")
    # round_half_away_col, not F.round: blend lands on exact decimal
    # ties ((a+b)/2 of two (rn-1)/(n-1) ratios), where Spark's
    # HALF_UP-on-shortest-repr and DuckDB's scaled-binary round diverge
    # (functions/rounding.py — the dedup_keep_best fix pattern)
    from hash_db_spark.functions.rounding import round_half_away_col

    return rl.select(
        "doc_id",
        round_half_away_col(F.col("q_prank"), 6).alias("q_prank"),
        round_half_away_col(F.col("lm_prank"), 6).alias("lm_prank"),
        round_half_away_col(
            (F.col("q_prank") + F.col("lm_prank")) / 2.0, 6
        ).alias("blend"),
    )


def _score_quantile_blend_oracle() -> str:
    from hash_db_spark.functions.text import sql_quality_score_fast
    from hash_db_spark.operators.corpus_stats import sql_doc_bigram_logprob

    lm = sql_doc_bigram_logprob("documents", "text", "doc_id")
    return f"""
WITH lm AS ({lm}),
qb AS (
  SELECT d.doc_id, {sql_quality_score_fast('d.text')} AS q,
         l.bigram_logprob
  FROM documents d JOIN lm l ON l.id = d.doc_id
),
pr AS (
  SELECT doc_id,
         percent_rank() OVER (ORDER BY q ASC, doc_id ASC) AS q_prank,
         percent_rank() OVER (ORDER BY bigram_logprob ASC, doc_id ASC)
           AS lm_prank
  FROM qb
)
SELECT doc_id, q_prank, lm_prank,
       round((q_prank + lm_prank) / 2.0, 6) AS blend
FROM (
  SELECT doc_id, round(q_prank, 6) AS q_prank,
         round(lm_prank, 6) AS lm_prank
  FROM pr
)
"""


# r12 QUEUE CANDIDATE (session 9):
#   "score_quantile_blend": Query(
#       q_score_quantile_blend, _score_quantile_blend_oracle()),


# The QUERIES literal lives at module tail so every registered fn is
# already bound; compute_reverify explodes it per-entry either way.
QUERIES: dict[str, Query] = {
    "corpus_health_report": Query(
        q_corpus_health_report, _corpus_health_oracle()
    ),
    "dedup_budget_select": Query(
        q_dedup_budget_select, _dedup_budget_oracle()
    ),
    "doc_lang_segments": Query(
        q_doc_lang_segments, _doc_lang_segments_oracle()
    ),
    "decontaminate_mask": Query(
        q_decontaminate_mask, _decontaminate_mask_oracle()
    ),
    "lm_trigram_interp": Query(
        q_lm_trigram_interp,
        C.sql_trigram_interp_logprob("doc_id % 2 = 0", "doc_id % 2 = 1"),
    ),
    "stream_quality_gate": Query(
        q_stream_quality_gate, _stream_quality_gate_oracle()
    ),
    "quality_classifier": Query(
        q_quality_classifier, C.sql_classifier_scores()
    ),
    "weighted_doc_sample": Query(
        q_weighted_doc_sample,
        C.sql_weighted_sample(
            "documents",
            "doc_id",
            "n_chars",
            SAMPLE_TARGET,
            select="doc_id, n_chars",
        ),
    ),
    "embedding_dim_stats": Query(
        q_embedding_dim_stats, C.sql_embedding_dim_stats()
    ),
    "embedding_project_jl": Query(
        q_embedding_project_jl, C.sql_embedding_project_jl()
    ),
    "embedding_whiten_norms": Query(
        q_embedding_whiten_norms, C.sql_embedding_whiten_norms()
    ),
    "mixture_temperature": Query(
        q_mixture_temperature, _mixture_temperature_oracle()
    ),
    "mixture_temp_select": Query(
        q_mixture_temp_select, _mixture_temp_select_oracle()
    ),
    "gopher_quality_gate": Query(q_gopher_quality_gate, _gopher_oracle()),
    "source_dup_matrix": Query(
        q_source_dup_matrix, _source_dup_matrix_oracle()
    ),
    "winnow_fingerprints": Query(q_winnow_fingerprints, _winnow_oracle()),
    "winnow_dup_pairs": Query(q_winnow_dup_pairs, _winnow_pairs_oracle()),
    "doc_boundary_overlap": Query(
        q_doc_boundary_overlap, _boundary_overlap_oracle()
    ),
    "winnow_components": Query(
        q_winnow_components, _winnow_components_oracle()
    ),
    "dup_cluster_histogram": Query(
        q_dup_cluster_histogram, _dup_cluster_histogram_oracle()
    ),
    "classifier_sample_prep": Query(
        q_classifier_sample_prep, _classifier_sample_oracle()
    ),
    # registered r11 (queued r10 under the VERDICT r08 #1 throttle):
    "epoch_repeat_plan": Query(
        q_epoch_repeat_plan, _epoch_repeat_plan_oracle()
    ),
    "dsir_weights": Query(
        q_dsir_weights, C.sql_dsir_weights(DSIR_TARGET_PRED)
    ),
    "dsir_resample": Query(
        q_dsir_resample,
        C.sql_dsir_resample(DSIR_TARGET_PRED, DSIR_SAMPLE_N),
    ),
    "stream_dsir_gate": Query(
        q_stream_dsir_gate, _stream_dsir_gate_oracle()
    ),
}
