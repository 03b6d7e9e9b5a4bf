"""Relevance ranking over the FTS token model: BM25 and TF-IDF.

The reference's FTS (`/root/reference/server.py:729-739`,
`client.py:683-709`) is boolean-only — a document either matches the
token query or it doesn't, and results come back unranked. Any real
search surface layers a relevance score on the same posting-list
statistics, so this module adds the two standard ones (Okapi BM25 and
TF-IDF) as first-class operators over the same whitespace token model
(`dedup.clean_tokens`, identical to the reference's indexer
tokenization).

Scale shape (BM25): the term-frequency pass filters to the query's
terms BEFORE its groupBy, so the only shuffle over corpus-sized data
carries just the matching (doc, term) postings — at 100 TB that is the
posting list of the query, not the corpus. Document length is a
map-side projection; N / avgdl are scalar aggregates broadcast via
crossJoin; per-term document frequencies are a tiny frame the optimizer
broadcasts. Final top-k compiles to TakeOrderedAndProject (per-partition
heap, merged on the driver), not a global sort.

TF-IDF's per-document top-terms uses a row_number window PARTITIONED BY
document id — per-doc partitions, so no single-task funnel at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from hash_db_spark.operators.dedup import clean_tokens, sql_clean_tokens


def bm25_rank(
    df: DataFrame,
    col: str,
    id_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topn: int = 15,
) -> DataFrame:
    """(id, score): top ``topn`` documents for the bag-of-terms query by
    Okapi BM25 (idf = ln((N-df+0.5)/(df+0.5) + 1), the Lucene form).
    Deterministic: 6dp rounding, id tiebreak.

    Scale shape (optimization r12, guide §2.1/§6.2): ONE corpus scan and
    ZERO corpus shuffles. The previous form tokenized the corpus twice
    (posting explode + doc-length projection), shuffled the matching
    postings (groupBy id,tok) and joined doc lengths back by id. For a
    literal bag-of-terms query the per-term tf is computable per ROW —
    size(filter(toks, = term)) per query term over one named tokenize —
    so dl rides in the same projection, N/avgdl/df all come from one
    scalar aggregate over it, and scoring is a map-side expression under
    the broadcast of that single stats row. The only remaining exchanges
    carry the one-row stats frame and the final top-k
    (TakeOrderedAndProject). Scores are bit-compatible: a term with tf=0
    contributes exactly 0.0 (norm's numerator is tf), so the fixed-order
    per-term sum equals the posting-row sum the oracle computes."""
    if not terms:
        # the pre-r12 explode form returned an empty (id, score) frame
        # for an empty query; keep that contract
        return df.select(
            F.col(id_col).alias("id"), F.lit(0.0).alias("score")
        ).filter(F.lit(False))
    toked = df.select(
        F.col(id_col).alias("id"), clean_tokens(col).alias("__t")
    )
    def _count_of(term: str):
        # one-arg lambda: a two-arg lambda would be read by pyspark as
        # the (element, index) form and receive the index column
        return F.size(F.filter(F.col("__t"), lambda x: x == F.lit(term)))

    per = toked.select(
        "id",
        F.size("__t").alias("dl"),
        *[_count_of(t).alias(f"__tf{i}") for i, t in enumerate(terms)],
    )
    # per feeds BOTH the stats aggregate and the scoring scan; without
    # pinning, each consumer re-tokenizes the corpus. One narrow
    # numeric row per doc — the signature-artifact precedent
    # (dedup.simhash materialize=True). Measured 1.26 -> 0.83s at sf0.1.
    per = per.localCheckpoint(eager=True)
    stats = per.agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )

    def term_score(i: int):
        tf = F.col(f"__tf{i}")
        dft = F.col(f"__df{i}")
        idf = F.log(
            (F.col("__n") - dft + F.lit(0.5)) / (dft + F.lit(0.5))
            + F.lit(1.0)
        )
        norm = tf * (k1 + 1) / (
            tf + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
        )
        return idf * norm

    matched = per.filter(
        sum(
            (F.col(f"__tf{i}") > 0).cast("int") for i in range(len(terms))
        )
        > 0
    )
    score = term_score(0)
    for i in range(1, len(terms)):
        score = score + term_score(i)
    return (
        matched.crossJoin(F.broadcast(stats))
        .select("id", F.round(score, 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(topn)
    )


def _score_bm25(
    tf: DataFrame,
    dl: DataFrame,
    scalars: DataFrame,
    k1: float,
    b: float,
    topn: int,
) -> DataFrame:
    """Okapi scoring over posting rows (id, tok, tf): shared by the
    scan-time path (bm25_rank) and the index-probe path
    (bm25_from_index) — both must produce identical scores."""
    dft = tf.groupBy("tok").agg(F.countDistinct("id").alias("df"))
    idf = F.log(
        (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
    )
    return (
        tf.join(F.broadcast(dft), "tok")
        .join(dl, "id")
        .crossJoin(F.broadcast(scalars))
        .groupBy("id")
        .agg(F.round(F.sum(idf * norm), 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(topn)
    )


def bm25_from_index(
    postings: DataFrame,
    doclens: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topn: int = 15,
    token_buckets: int = 64,
) -> DataFrame:
    """BM25 served from the persisted inverted index
    (``sources.writers.write_fts_index``): the scan touches only the
    query terms' hash-bucket partitions (PartitionFilters) instead of
    exploding corpus text — the online-query half of the FTS scale
    story. Scores are identical to ``bm25_rank`` over the same corpus.
    """
    from hash_db_spark.sources.writers import fts_index_probe

    tf = fts_index_probe(postings, terms, token_buckets)
    dl = doclens.select("id", "dl")
    scalars = dl.agg(
        F.count(F.lit(1)).alias("__n"), F.avg("dl").alias("__avgdl")
    )
    return _score_bm25(tf, dl, scalars, k1, b, topn)


def sql_bm25_rank(
    table: str,
    col: str,
    id_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    topn: int = 15,
) -> str:
    if not terms:
        # Spark's bm25_rank returns an empty frame for an empty term
        # list; 'IN ()' is a DuckDB syntax error — fail identically.
        raise ValueError("bm25 oracle needs a non-empty terms list")
    term_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH toks AS (
  SELECT {id_col} AS id, unnest({sql_clean_tokens(col)}) AS tok FROM {table}
),
dl AS (
  SELECT {id_col} AS id, len({sql_clean_tokens(col)}) AS dl FROM {table}
),
scalars AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
tf AS (
  SELECT id, tok, count(*) AS tf FROM toks
  WHERE tok IN ({term_list}) GROUP BY id, tok
),
dft AS (SELECT tok, count(DISTINCT id) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT tf.id,
         round(sum(
           ln((n - df + 0.5) / (df + 0.5) + 1.0)
           * tf * ({k1} + 1) / (tf + {k1} * (1 - {b} + {b} * dl / avgdl))
         ), 6) AS score
  FROM tf JOIN dft USING (tok) JOIN dl ON dl.id = tf.id CROSS JOIN scalars
  GROUP BY tf.id
)
SELECT id, score FROM scored ORDER BY score DESC, id ASC LIMIT {topn}
"""


def tfidf_top_terms(
    df: DataFrame, col: str, id_col: str, topn: int = 3, min_df: int = 1
) -> DataFrame:
    """(id, tok, tfidf): each document's ``topn`` highest tf-idf terms
    (tf = in-doc count, idf = ln(N/df)). The per-doc row_number window
    partitions on the document id, so ranking is embarrassingly
    parallel."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(clean_tokens(col)).alias("tok")
    )
    n_docs = df.select(
        F.count(F.lit(1)).alias("__n")
    )
    tf = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dft = tf.groupBy("tok").agg(F.countDistinct("id").alias("df"))
    w = Window.partitionBy("id").orderBy(
        F.col("tfidf").desc(), F.col("tok").asc()
    )
    return (
        tf.join(dft.filter(F.col("df") >= min_df), "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("__n") / F.col("df")), 6),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topn)
        .select("id", "tok", "tfidf")
    )


TFIDF_QSCALE = 1 << 10  # weight quantization for exact-int dot/norms
TFIDF_MAX_DF = 20  # hot-shingle cap: candidate join blowup <= max_df^2


def _positional_shingles(tok_arr, n: int):
    """n-token shingles at every position (repeats kept — the tf unit),
    unlike dedup.shingles' distinct set, over an ALREADY-PROJECTED
    token-array column. The caller must materialize clean_tokens into
    its own projection first: inlining it here makes every element_at
    in the interpreted HOF re-run the split+filter (measured 7.6s vs
    0.5s for the sf0.1 shingle explode). Guarded total: short docs
    yield an empty array instead of a down-counting sequence."""
    t = tok_arr
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(t, i + F.lit(k)) for k in range(n)]
    )
    return F.when(
        F.size(t) >= n,
        F.transform(F.sequence(F.lit(1), F.size(t) - (n - 1)), gram),
    ).otherwise(F.array().cast("array<string>"))


def sql_positional_shingles(col: str, n: int) -> str:
    toks = sql_clean_tokens(col)
    parts = " || ' ' || ".join(f"t.toks[i+{k}]" for k in range(n))
    return (
        f"(SELECT list_transform("
        f"generate_series(1, len(t.toks)-{n - 1}), i -> {parts})"
        f" FROM (SELECT {toks} AS toks) t)"
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.6,
    max_df: int = TFIDF_MAX_DF,
) -> DataFrame:
    """(id_a, id_b, cos): near-duplicate pairs by TF-IDF-weighted
    shingle cosine — the term-weight-aware complement to the unweighted
    Jaccard/MinHash family (`operators/dedup.py`): boilerplate shingles
    are downweighted by idf instead of counting equally, so two docs
    that share only template text score low while docs sharing RARE
    content score high.

    Weighting is ltc (sublinear tf): w = (1 + ln(tf)) * ln(N/df),
    quantized to ``floor(w * 2^10 + 0.5)`` so dot products and norms
    accumulate as EXACT int64 (engine summation order can't matter —
    the house parity discipline). Bounds: w <= (1+ln(1e5)) * ln(1e12)
    ~= 350 -> qw < 2^19, so per-doc norms and dots stay under 2^56
    even at 10^5 distinct shingles/doc and 10^12 docs.

    Scale shape: vocabulary is df-capped at ``max_df`` BEFORE the
    self-join — the measure is defined over the capped vocabulary
    (hot/boilerplate shingles carry ~zero idf anyway), and every
    shingle's posting list is <= max_df rows, so the candidate join's
    per-key blowup is bounded by max_df^2 (the house hot-key cap; no
    CartesianProduct, nothing corpus-sized broadcast). Norms ride ON
    the posting rows (one id-join before the self-join), so scoring
    adds no post-hoc corpus joins."""
    n_frame = df.select(F.count(F.lit(1)).alias("__n"))
    toked = df.select(
        F.col(id_col).alias("id"), clean_tokens(col).alias("__t")
    )
    sh = toked.select(
        "id",
        F.explode(_positional_shingles(F.col("__t"), n)).alias("tok"),
    )
    tf = sh.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    # df via a count window on the tf frame: one tok-keyed shuffle
    # replaces the dft groupBy + join-back (the corpus_health_report
    # fp-window pattern)
    tfdf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("tok"))
    )
    w = (
        tfdf.filter(F.col("df") <= max_df)
        .crossJoin(F.broadcast(n_frame))
        .select(
            "id",
            "tok",
            F.floor(
                (F.lit(1.0) + F.log("tf"))
                * F.log(F.col("__n").cast("double") / F.col("df"))
                * TFIDF_QSCALE
                + F.lit(0.5)
            )
            .cast("long")
            .alias("qw"),
        )
    )
    # Norms ride on the posting rows via a sum window over id — the
    # same one-exchange trick as the df count window above (optimization
    # r12): the former groupBy(id) + join-back derived w TWICE (its own
    # checkpoint plus the join) and shuffled it by id two more times.
    # n2 is an order-independent integer sum, so the window form is
    # bit-identical. wn feeds both self-join sides — without pinning,
    # Spark re-derives the explode+tf+df pipeline once per side (the
    # house multi-consumer rule, operators/bpe.py:19); ONE checkpoint
    # now covers everything.
    wn = w.withColumn(
        "n2", F.sum(F.col("qw") * F.col("qw")).over(Window.partitionBy("id"))
    ).localCheckpoint(eager=True)
    a = wn.select(
        F.col("id").alias("ida"),
        "tok",
        F.col("qw").alias("qa"),
        F.col("n2").alias("n2a"),
    )
    b = wn.select(
        F.col("id").alias("idb"),
        "tok",
        F.col("qw").alias("qb"),
        F.col("n2").alias("n2b"),
    )
    return (
        a.join(b, "tok")
        .filter(F.col("ida") < F.col("idb"))
        .groupBy("ida", "idb")
        .agg(
            F.sum(F.col("qa") * F.col("qb")).alias("dot"),
            F.min("n2a").alias("n2a"),
            F.min("n2b").alias("n2b"),
        )
        .select(
            F.col("ida").alias("id_a"),
            F.col("idb").alias("id_b"),
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("n2a")) * F.sqrt(F.col("n2b"))),
                6,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def sql_tfidf_cosine_pairs(
    table: str,
    col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.6,
    max_df: int = TFIDF_MAX_DF,
) -> str:
    """DuckDB oracle: identical shingling, ltc quantization, exact-int
    accumulation, and rounding."""
    sh = sql_positional_shingles(col, n)
    return f"""
WITH sh AS (
  SELECT {id_col} AS id, unnest({sh}) AS tok FROM {table}
),
tf AS (SELECT id, tok, count(*) AS tf FROM sh GROUP BY id, tok),
dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
nn AS (SELECT count(*) AS n FROM {table}),
w AS (
  SELECT tf.id, tf.tok,
         CAST(floor(
           (1.0 + ln(tf.tf)) * ln(CAST(nn.n AS DOUBLE) / dft.df)
           * {TFIDF_QSCALE} + 0.5
         ) AS BIGINT) AS qw
  FROM tf JOIN dft USING (tok) CROSS JOIN nn
  WHERE dft.df <= {max_df}
),
nrm AS (SELECT id, CAST(sum(qw * qw) AS BIGINT) AS n2 FROM w GROUP BY id),
wn AS (SELECT w.id, w.tok, w.qw, nrm.n2 FROM w JOIN nrm USING (id)),
pairs AS (
  SELECT a.id AS id_a, b.id AS id_b,
         CAST(sum(a.qw * b.qw) AS BIGINT) AS dot,
         min(a.n2) AS n2a, min(b.n2) AS n2b
  FROM wn a JOIN wn b ON a.tok = b.tok AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b,
       round(CAST(dot AS DOUBLE) / (sqrt(CAST(n2a AS DOUBLE))
             * sqrt(CAST(n2b AS DOUBLE))), 6) AS cos
FROM pairs
WHERE round(CAST(dot AS DOUBLE) / (sqrt(CAST(n2a AS DOUBLE))
            * sqrt(CAST(n2b AS DOUBLE))), 6) >= {threshold}
"""


def sql_tfidf_top_terms(
    table: str, col: str, id_col: str, topn: int = 3, min_df: int = 1
) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col} AS id, unnest({sql_clean_tokens(col)}) AS tok FROM {table}
),
tf AS (SELECT id, tok, count(*) AS tf FROM toks GROUP BY id, tok),
dft AS (SELECT tok, count(DISTINCT id) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT id, tok,
         round(tf * ln(CAST((SELECT count(*) FROM {table}) AS DOUBLE) / df),
               6) AS tfidf
  FROM tf JOIN dft USING (tok)
  WHERE df >= {min_df}
),
ranked AS (
  SELECT id, tok, tfidf,
         row_number() OVER (PARTITION BY id ORDER BY tfidf DESC, tok ASC)
           AS rn
  FROM scored
)
SELECT id, tok, tfidf FROM ranked WHERE rn <= {topn}
"""
