"""Corpus-level statistics for quality scoring.

No reference counterpart (north-star LLM-pipeline capability): a
unigram-frequency quality proxy — documents made of corpus-common tokens
score high, documents of rare/garbled tokens score low. This is the
cheap stand-in for a perplexity filter: two shuffles total, no model.

Scale shape: pass 1 aggregates token frequencies (map-side partial agg,
one shuffle on the token); pass 2 re-joins tokens to frequencies —
vocabulary is sublinear in corpus size (Heaps' law), so AQE picks a
broadcast join for any realistic vocab; a corpus whose vocab outgrows
broadcast degrades to a shuffle join on the token, which salting covers
(operators/skew.py) since token frequency is Zipfian by nature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from hash_db_spark.operators.dedup import clean_tokens, sql_clean_tokens


def token_frequencies(df: DataFrame, col: str) -> DataFrame:
    """(tok, freq) over the whole corpus — one shuffle."""
    return (
        df.select(F.explode(clean_tokens(col)).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def doc_logfreq_score(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """(id, n_tokens, logfreq_score): mean log10 corpus frequency of the
    document's tokens (occurrence-weighted), rounded to 6dp. Higher =
    built from more corpus-common tokens."""
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(clean_tokens(col)).alias("tok")
    )
    freq = token_frequencies(df, col)
    return (
        toks.join(freq, "tok")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log10("freq")), 6).alias("logfreq_score"),
        )
    )


def sql_doc_logfreq_score(table: str, col: str, id_col: str) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col} AS id, unnest({sql_clean_tokens(col)}) AS tok FROM {table}
),
freq AS (SELECT tok, count(*) AS freq FROM toks GROUP BY tok)
SELECT id,
       count(*) AS n_tokens,
       round(avg(log10(freq)), 6) AS logfreq_score
FROM toks JOIN freq USING (tok)
GROUP BY id
"""


def vocab_top_share(df: DataFrame, col: str, topn: int = 10) -> DataFrame:
    """(tok, freq, share): the ``topn`` most frequent tokens and the
    fraction of all token occurrences they cover — the
    head-of-the-Zipf-curve report a corpus card leads with. share =
    freq/total is a ratio of exact integers (bit-identical cross-engine;
    rounded 6dp only for display stability). Deterministic tiebreak on
    the token string."""
    freq = token_frequencies(df, col)
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # top-N, merged on the driver) and the total is a scalar broadcast —
    # a global rank window here would funnel the whole vocabulary
    # through one task.
    total = freq.agg(F.sum("freq").alias("__total"))
    top = freq.orderBy(F.col("freq").desc(), F.col("tok").asc()).limit(topn)
    return top.crossJoin(F.broadcast(total)).select(
        "tok",
        "freq",
        F.round(F.col("freq") / F.col("__total"), 6).alias("share"),
    )


def sql_vocab_top_share(table: str, col: str, topn: int = 10) -> str:
    return f"""
WITH toks AS (
  SELECT unnest({sql_clean_tokens(col)}) AS tok FROM {table}
),
freq AS (SELECT tok, count(*) AS freq FROM toks GROUP BY tok),
ranked AS (
  SELECT tok, freq,
         round(CAST(freq AS DOUBLE) / sum(freq) OVER (), 6) AS share,
         row_number() OVER (ORDER BY freq DESC, tok ASC) AS rn
  FROM freq
)
SELECT tok, freq, share FROM ranked WHERE rn <= {topn}
"""


def doc_bigram_logprob(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """(id, n_bigrams, bigram_logprob): mean log10 MLE bigram probability
    of the document under corpus-wide counts — a step up from the unigram
    logfreq proxy toward a real LM-perplexity filter (still model-free).
    P(w | v) = c(v,w) / c(v,·) over the corpus's adjacent-token pairs;
    documents shorter than 2 tokens contribute no bigrams and drop out.

    Scale shape: one shuffle on the doc id for the adjacency window, one
    shuffle each for the bigram and prefix count aggregations, then two
    joins keyed on (Zipfian) token prefixes — AQE broadcast for normal
    vocabularies, salted shuffle (operators/skew.py) beyond that. All
    arithmetic is exact-integer ratios until the final log10.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(clean_tokens(col)).alias("pos", "tok"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    big = (
        toks.withColumn("prev", F.lag("tok").over(w))
        .filter(F.col("prev").isNotNull())
        .select("id", "prev", "tok")
    )
    bf = big.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("bfreq"))
    pf = big.groupBy("prev").agg(F.count(F.lit(1)).alias("pfreq"))
    return (
        big.join(bf, ["prev", "tok"])
        .join(pf, "prev")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.avg(F.log10(F.col("bfreq") / F.col("pfreq"))), 6
            ).alias("bigram_logprob"),
        )
    )


def sql_doc_bigram_logprob(table: str, col: str, id_col: str) -> str:
    return f"""
WITH lst AS (
  SELECT {id_col} AS id, {sql_clean_tokens(col)} AS l FROM {table}
),
toks AS (
  SELECT id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM lst
),
big AS (
  SELECT id, prev, tok FROM (
    SELECT id, tok, lag(tok) OVER (PARTITION BY id ORDER BY pos) AS prev
    FROM toks
  ) WHERE prev IS NOT NULL
),
bf AS (SELECT prev, tok, count(*) AS bfreq FROM big GROUP BY prev, tok),
pf AS (SELECT prev, count(*) AS pfreq FROM big GROUP BY prev)
SELECT id, count(*) AS n_bigrams,
       round(avg(log10(CAST(bfreq AS DOUBLE) / pfreq)), 6)
         AS bigram_logprob
FROM big JOIN bf USING (prev, tok) JOIN pf USING (prev)
GROUP BY id
"""


KN_DISCOUNT = 0.5  # exactly representable double: cross-engine-safe


def doc_kneser_ney_logprob(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """(id, n_bigrams, kn_logprob): mean log10 probability under an
    interpolated Kneser-Ney bigram model (Kneser & Ney 1995; the
    smoothing KenLM-style pretraining filters use) built from the
    corpus's own counts — the upgrade over raw-MLE doc_bigram_logprob:
    unseen-history mass is redistributed by CONTINUATION counts (how
    many distinct contexts a word follows), so boilerplate tokens that
    appear everywhere in one context stop looking probable.

        p(w|v) = max(c(v,w) - D, 0)/c(v)
               + D * N1+(v,.)/c(v) * N1+(.,w)/N1+(..)

    with fixed discount D = 0.5 (exactly representable, so both engines
    compute bit-identical doubles in the same expression order).

    Scale shape: doc_bigram_logprob's one per-doc window + token-keyed
    aggregations, plus two more count-distinct aggregates (per-prefix
    fanout, per-word continuation) and one 1-row broadcast (the global
    bigram-type count). All joins are on Zipfian token keys — AQE
    broadcast for normal vocabularies, salted shuffle beyond."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(clean_tokens(col)).alias("pos", "tok"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    big = (
        toks.withColumn("prev", F.lag("tok").over(w))
        .filter(F.col("prev").isNotNull())
        .select("id", "prev", "tok")
    )
    bf = big.groupBy("prev", "tok").agg(F.count(F.lit(1)).alias("bfreq"))
    pf = big.groupBy("prev").agg(
        F.count(F.lit(1)).alias("pfreq"),
        F.countDistinct("tok").alias("n1p_prev"),
    )
    cont = bf.groupBy("tok").agg(F.count(F.lit(1)).alias("cfreq"))
    ttypes = bf.agg(F.count(F.lit(1)).alias("ttypes"))
    d = F.lit(KN_DISCOUNT)
    p = (
        F.greatest(F.col("bfreq") - d, F.lit(0.0)) / F.col("pfreq")
        + (d * F.col("n1p_prev") / F.col("pfreq"))
        * (F.col("cfreq") / F.col("ttypes"))
    )
    return (
        big.join(bf, ["prev", "tok"])
        .join(pf, "prev")
        .join(cont, "tok")
        .crossJoin(F.broadcast(ttypes))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log10(p)), 6).alias("kn_logprob"),
        )
    )


def sql_doc_kneser_ney_logprob(table: str, col: str, id_col: str) -> str:
    return f"""
WITH lst AS (
  SELECT {id_col} AS id, {sql_clean_tokens(col)} AS l FROM {table}
),
toks AS (
  SELECT id, unnest(l) AS tok, generate_subscripts(l, 1) AS pos FROM lst
),
big AS (
  SELECT id, prev, tok FROM (
    SELECT id, tok, lag(tok) OVER (PARTITION BY id ORDER BY pos) AS prev
    FROM toks
  ) WHERE prev IS NOT NULL
),
bf AS (SELECT prev, tok, count(*) AS bfreq FROM big GROUP BY prev, tok),
pf AS (
  SELECT prev, count(*) AS pfreq, count(DISTINCT tok) AS n1p_prev
  FROM big GROUP BY prev
),
cont AS (SELECT tok, count(*) AS cfreq FROM bf GROUP BY tok),
tt AS (SELECT count(*) AS ttypes FROM bf)
SELECT id, count(*) AS n_bigrams,
       round(avg(log10(
         greatest(bfreq - {KN_DISCOUNT!r}, 0.0) / pfreq
         + ({KN_DISCOUNT!r} * n1p_prev / pfreq)
           * (CAST(cfreq AS DOUBLE) / ttypes)
       )), 6) AS kn_logprob
FROM big JOIN bf USING (prev, tok) JOIN pf USING (prev)
         JOIN cont USING (tok), tt
GROUP BY id
"""


def lm_gate(
    df: DataFrame, col: str, id_col: str, drop_frac: float = 0.1
) -> DataFrame:
    """(id, n_bigrams, bigram_logprob) for documents SURVIVING the LM
    filter: score every doc with the corpus bigram model and drop the
    worst ``drop_frac`` tail — the CCNet-style perplexity gate, with the
    corpus's own bigram MLE standing in for the external LM.

    The cutoff is the exact ``drop_frac`` quantile of the score
    distribution (one scalar, broadcast back). Exact percentile buffers
    the per-doc scores on one executor — one double per DOCUMENT (not
    per token), so ~8 bytes x n_docs; beyond that, swap the threshold
    for profiling.binned_histogram + histogram_quantiles (mergeable,
    map-side) or percentile_approx — estimates differ cross-engine,
    which is why the oracle-checked form uses the exact one.
    """
    # Materialized once: the score frame feeds BOTH the threshold
    # aggregate and the filter — without this the whole bigram pipeline
    # (tokenize + 3 shuffles) runs twice. One narrow row per doc: the
    # scores artifact a real pipeline would persist anyway.
    scores = doc_bigram_logprob(df, col, id_col).localCheckpoint(eager=True)
    thr = scores.agg(
        F.expr(f"percentile(bigram_logprob, {drop_frac!r})").alias("__thr")
    )
    return (
        scores.crossJoin(F.broadcast(thr))
        .filter(F.col("bigram_logprob") >= F.col("__thr"))
        .select("id", "n_bigrams", "bigram_logprob")
    )


def sql_lm_gate(
    table: str, col: str, id_col: str, drop_frac: float = 0.1
) -> str:
    scores = sql_doc_bigram_logprob(table, col, id_col)
    return f"""
WITH scores AS ({scores}),
thr AS (SELECT quantile_cont(bigram_logprob, {drop_frac!r}) AS t FROM scores)
SELECT id, n_bigrams, bigram_logprob
FROM scores, thr WHERE bigram_logprob >= t
"""


def vocab_zipf_fit(df: DataFrame, col: str) -> DataFrame:
    """(n_types, slope, intercept): OLS fit of log10(freq) against
    log10(rank) over the whole vocabulary — the Zipf-exponent corpus QA
    check (natural text sits near slope -1; heavy boilerplate or
    synthetic/garbled corpora bend the curve). One row out.

    Scale shape: vocabulary is sublinear in corpus size (Heaps' law)
    but still too big for one task at 100 TB, so the global frequency
    rank rides operators/rank.row_number_global (range partition +
    O(partitions) offsets — no single-partition Window); the regression
    itself is one map-side-combinable aggregate."""
    from hash_db_spark.operators.rank import row_number_global

    freq = token_frequencies(df, col)
    ranked = row_number_global(
        freq, [F.col("freq").desc(), F.col("tok").asc()], out="rank"
    )
    pts = ranked.select(
        F.log10(F.col("freq").cast("double")).alias("y"),
        F.log10(F.col("rank").cast("double")).alias("x"),
    )
    return pts.agg(
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.expr("regr_slope(y, x)"), 6).alias("slope"),
        F.round(F.expr("regr_intercept(y, x)"), 6).alias("intercept"),
    )


def sql_vocab_zipf_fit(table: str, col: str) -> str:
    return f"""
WITH toks AS (
  SELECT unnest({sql_clean_tokens(col)}) AS tok FROM {table}
),
freq AS (SELECT tok, count(*) AS freq FROM toks GROUP BY tok),
ranked AS (
  SELECT freq, row_number() OVER (ORDER BY freq DESC, tok ASC) AS rank
  FROM freq
)
SELECT count(*) AS n_types,
       round(regr_slope(log10(CAST(freq AS DOUBLE)),
                        log10(CAST(rank AS DOUBLE))), 6) AS slope,
       round(regr_intercept(log10(CAST(freq AS DOUBLE)),
                            log10(CAST(rank AS DOUBLE))), 6) AS intercept
FROM ranked
"""


def token_entropy(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """(id, n_tokens, token_entropy): Shannon entropy (bits) of each
    document's unigram distribution — the repetition/diversity signal of
    the Gopher-style quality rules (near-0 = one token repeated, high =
    diverse vocabulary). H = log2(n) - Σ c·log2(c) / n keeps every term
    exact-integer until the final logs. Two map-side-combinable shuffles
    (doc×token, then doc); no corpus-wide state."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(clean_tokens(col)).alias("tok"),
    )
    cnt = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("c"))
    n = F.sum("c")
    h = F.log2(n) - F.sum(F.col("c") * F.log2("c")) / n
    return cnt.groupBy("id").agg(
        n.alias("n_tokens"), F.round(h, 6).alias("token_entropy")
    )


def sql_token_entropy(table: str, col: str, id_col: str) -> str:
    return f"""
WITH toks AS (
  SELECT {id_col} AS id, unnest({sql_clean_tokens(col)}) AS tok FROM {table}
),
cnt AS (SELECT id, tok, count(*) AS c FROM toks GROUP BY id, tok)
SELECT id, CAST(sum(c) AS BIGINT) AS n_tokens,
       round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS token_entropy
FROM cnt GROUP BY id
"""


# --- population-stability drift between two corpus snapshots -------------------

PSI_BUCKETS = 10  # fixed-width feature buckets (also the Laplace B)


def drift_psi(
    ref: DataFrame, cur: DataFrame, bucket: Column
) -> DataFrame:
    """(bucket, n_ref, n_cur, psi_micro): Population Stability Index
    between a reference and a current corpus snapshot over a bucketed
    feature — the standard drift monitor (psi = sum over buckets of
    (p - q) * ln(p / q), rule of thumb: > 0.1 drifting, > 0.25 major).
    Laplace-smoothed so empty buckets never hit ln(0); each bucket's
    contribution is micro-quantized from ONE expression (the DSIR
    discipline — no float aggregation anywhere), and the appended
    TOTAL row (bucket = -1) is the exact integer sum.

    Scale shape: both snapshots reduce map-side to <= PSI_BUCKETS
    partial-count rows before the single tiny shuffle; totals are a
    broadcast crossJoin of a 1-row aggregate. Nothing corpus-sized
    moves."""
    from hash_db_spark.operators.curation import micro_col

    tagged = ref.select(
        bucket.alias("bucket"), F.lit(1).alias("is_ref")
    ).unionAll(cur.select(bucket.alias("bucket"), F.lit(0).alias("is_ref")))
    counts = tagged.groupBy("bucket").agg(
        F.sum("is_ref").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).alias("n_cur"),
    )
    tot = counts.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    b = float(PSI_BUCKETS)
    p = (F.col("n_ref") + F.lit(1.0)) / (F.col("t_ref") + F.lit(b))
    q = (F.col("n_cur") + F.lit(1.0)) / (F.col("t_cur") + F.lit(b))
    per = counts.crossJoin(F.broadcast(tot)).select(
        F.col("bucket").cast("int").alias("bucket"),
        "n_ref",
        "n_cur",
        micro_col((p - q) * F.log(p / q)).alias("psi_micro"),
    )
    total = per.agg(
        F.lit(-1).alias("bucket"),
        F.sum("n_ref").alias("n_ref"),
        F.sum("n_cur").alias("n_cur"),
        F.sum("psi_micro").alias("psi_micro"),
    )
    return per.unionAll(total)


def sql_drift_psi(ref_sql: str, cur_sql: str, bucket_expr: str) -> str:
    """Oracle twin: ``ref_sql``/``cur_sql`` are row sources exposing the
    columns ``bucket_expr`` needs."""
    from hash_db_spark.operators.curation import sql_micro

    b = float(PSI_BUCKETS)
    p = "((n_ref + 1.0) / (t_ref + {b}))".format(b=b)
    q = "((n_cur + 1.0) / (t_cur + {b}))".format(b=b)
    contrib = f"({p} - {q}) * ln({p} / {q})"
    return f"""
WITH tagged AS (
  SELECT {bucket_expr} AS bucket, 1 AS is_ref FROM ({ref_sql})
  UNION ALL
  SELECT {bucket_expr} AS bucket, 0 AS is_ref FROM ({cur_sql})
),
counts AS (
  SELECT bucket, sum(is_ref) AS n_ref, sum(1 - is_ref) AS n_cur
  FROM tagged GROUP BY bucket
),
tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur FROM counts),
per AS (
  SELECT CAST(bucket AS INT) AS bucket,
         CAST(n_ref AS BIGINT) AS n_ref,
         CAST(n_cur AS BIGINT) AS n_cur,
         {sql_micro(contrib)} AS psi_micro
  FROM counts CROSS JOIN tot
)
SELECT * FROM per
UNION ALL
SELECT -1, CAST(sum(n_ref) AS BIGINT), CAST(sum(n_cur) AS BIGINT),
       CAST(sum(psi_micro) AS BIGINT)
FROM per
"""


# --- term burstiness (variance-to-mean dispersion) ------------------------------

BURST_MIN_DF = 5  # ignore terms in fewer docs (VMR of rare terms is noise)
BURST_TOPN = 50


def term_burstiness(
    docs: DataFrame,
    col: str,
    id_col: str,
    min_df: int = BURST_MIN_DF,
    topn: int = BURST_TOPN,
) -> DataFrame:
    """(tok, df, total, vmr_micro, rank): the ``topn`` burstiest terms
    by variance-to-mean ratio of per-document counts — Church & Gale's
    dispersion diagnostic ("Poisson Mixtures", 1995): function words
    arrive ~Poisson (VMR ~ 1), content/topical words arrive in bursts
    (VMR >> 1). The signal a stopword-discovery or keyword stage reads
    straight off corpus counts.

    Over ALL N docs (zeros included): mean = total/N and
    E[x^2] = sum_sq/N come from exact integer sums over only the
    nonzero (doc, term) rows; VMR = (E[x^2] - mean^2)/mean is ONE
    float expression micro-quantized per term. Rank by the integer.
    Scale shape: one (doc, term) count shuffle, one term-keyed
    reduction, TakeOrderedAndProject for the top-n."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(clean_tokens(col)).alias("tok")
    )
    n_docs = docs.count()  # scalar: plan literal, same role as pagerank's N
    per = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("c"))
    stats = per.groupBy("tok").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
    )
    mean = F.col("total") / F.lit(float(n_docs))
    ex2 = F.col("sum_sq") / F.lit(float(n_docs))
    vmr = (ex2 - mean * mean) / mean
    from hash_db_spark.operators.curation import micro_col

    scored = stats.filter(F.col("df") >= min_df).select(
        "tok",
        "df",
        F.col("total").cast("long").alias("total"),
        micro_col(vmr).alias("vmr_micro"),
    )
    top = scored.orderBy(
        F.col("vmr_micro").desc(), F.col("tok").asc()
    ).limit(topn)
    w = Window.orderBy(F.col("vmr_micro").desc(), F.col("tok").asc())
    # rank over <= topn rows: the window sees only the TakeOrdered output
    return top.withColumn("rank", F.row_number().over(w))


def sql_term_burstiness(
    table: str = "documents",
    col: str = "text",
    id_col: str = "doc_id",
    min_df: int = BURST_MIN_DF,
    topn: int = BURST_TOPN,
) -> str:
    from hash_db_spark.operators.curation import sql_micro

    toks = sql_clean_tokens(col)
    mean = "(CAST(total AS DOUBLE) / (SELECT n FROM n_cte))"
    ex2 = "(CAST(sum_sq AS DOUBLE) / (SELECT n FROM n_cte))"
    vmr = f"(({ex2} - {mean} * {mean}) / {mean})"
    return f"""
WITH n_cte AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM {table}),
per AS (
  SELECT {id_col} AS id, tok, count(*) AS c
  FROM (SELECT {id_col}, unnest({toks}) AS tok FROM {table})
  GROUP BY id, tok
),
stats AS (
  SELECT tok, count(*) AS df, sum(c) AS total, sum(c * c) AS sum_sq
  FROM per GROUP BY tok
),
scored AS (
  SELECT tok, df, CAST(total AS BIGINT) AS total,
         {sql_micro(vmr)} AS vmr_micro
  FROM stats WHERE df >= {min_df}
)
SELECT tok, df, total, vmr_micro,
       CAST(row_number() OVER (ORDER BY vmr_micro DESC, tok ASC) AS INT)
         AS rank
FROM scored
ORDER BY vmr_micro DESC, tok ASC
LIMIT {topn}
"""


HEAPS_LEVELS = 6  # nested 1/2^j hash-samples, j = 0..5


def _heaps_depth(u, thresholds):
    """Depth = (# nested thresholds passed) - 1; level 0 is the full
    corpus. Same literal comparison chain in the SQL twin."""
    d = F.lit(-1)
    for t in thresholds:
        d = d + (u < F.lit(t)).cast("int")
    return d


def vocab_heaps_fit(
    docs: DataFrame,
    col: str,
    id_col: str,
    levels: int = HEAPS_LEVELS,
) -> DataFrame:
    """(level, n_docs, n_tokens, vocab, beta_micro): Heaps'-law fit
    V = K * N^beta of vocabulary growth against corpus size (Heaps,
    "Information Retrieval", 1978) from ONE corpus pass — the dedup /
    vocabulary-budget planning signal: beta near 1 means vocabulary
    keeps exploding (unseen tokens dominate, dedup gains little);
    beta well under 0.5 means the corpus is saturating.

    The growth curve needs vocab at several corpus sizes WITHOUT
    re-scanning per size: use nested content-addressed samples
    (doc in level j iff sample_u(id) < M/2^j — level j+1 is exactly
    half of level j in expectation, the KMV/bottom-k trick). A token's
    deepest level is determined by the MIN doc-hash over its postings,
    so one token-keyed reduction yields every level's exact distinct
    count at once; docs explode to <= ``levels`` stat rows each.
    The log-log regression runs over <= ``levels`` level rows with
    exact integer micro sums (window over a 6-row frame); beta is one
    float expression from those sums, micro-quantized — identical in
    the oracle.

    Scale: one token-keyed shuffle (min-hash per distinct token), one
    6-group doc reduction, no joins bigger than the 6x6 level merge."""
    from hash_db_spark.operators.curation import SAMPLE_M, micro_col, sample_u

    thresholds = [SAMPLE_M >> j for j in range(levels)]
    base = docs.select(
        sample_u(F.col(id_col)).alias("u"),
        F.size(clean_tokens(col)).alias("n_tok"),
        clean_tokens(col).alias("toks"),
    ).filter(F.col("n_tok") > 0)
    base = base.withColumn("depth", _heaps_depth(F.col("u"), thresholds))
    doc_stats = (
        base.select(
            "n_tok",
            F.explode(F.sequence(F.lit(0), F.col("depth"))).alias("level"),
        )
        .groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )
    tok_depth = (
        base.select("u", F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.min("u").alias("mu"))
        .withColumn("depth", _heaps_depth(F.col("mu"), thresholds))
    )
    vocab = (
        tok_depth.select(
            F.explode(F.sequence(F.lit(0), F.col("depth"))).alias("level")
        )
        .groupBy("level")
        .agg(F.count(F.lit(1)).alias("vocab"))
    )
    pts = doc_stats.join(vocab, "level").select(
        "level",
        "n_docs",
        "n_tokens",
        "vocab",
        micro_col(F.log("n_tokens")).alias("x"),
        micro_col(F.log("vocab")).alias("y"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy()  # <= `levels` rows: a deliberate tiny window
    n = F.count(F.lit(1)).over(w).cast("long")
    sx = F.sum("x").over(w)
    sy = F.sum("y").over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    var = (n * sxx - sx * sx).cast("double")
    beta = (n * sxy - sx * sy).cast("double") / F.when(
        (n * sxx - sx * sx) != 0, var
    )
    return (
        pts.select(
            "level",
            "n_docs",
            "n_tokens",
            "vocab",
            micro_col(beta).alias("beta_micro"),
        )
        .orderBy("level")
    )


def sql_vocab_heaps_fit(
    table: str = "documents",
    col: str = "text",
    id_col: str = "doc_id",
    levels: int = HEAPS_LEVELS,
) -> str:
    from hash_db_spark.operators.curation import (
        SAMPLE_M,
        sql_micro,
        sql_sample_u,
    )

    thresholds = [SAMPLE_M >> j for j in range(levels)]

    def depth(u: str) -> str:
        cmps = " + ".join(
            f"(CASE WHEN {u} < {t} THEN 1 ELSE 0 END)" for t in thresholds
        )
        return f"({cmps} - 1)"

    beta_num = "CAST(n * sxy - sx * sy AS DOUBLE)"
    beta_den = "CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE)"
    return f"""
WITH base AS (
  SELECT {sql_sample_u(id_col)} AS u,
         CAST(len({sql_clean_tokens(col)}) AS BIGINT) AS n_tok,
         {sql_clean_tokens(col)} AS toks
  FROM {table}
),
nz AS (SELECT *, {depth('u')} AS depth FROM base WHERE n_tok > 0),
doc_stats AS (
  SELECT level, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
  FROM (SELECT n_tok, unnest(generate_series(0, depth)) AS level FROM nz)
  GROUP BY level
),
tok_depth AS (
  SELECT {depth('mu')} AS depth
  FROM (
    SELECT tok, min(u) AS mu
    FROM (SELECT u, unnest(toks) AS tok FROM nz)
    GROUP BY tok
  )
),
vocab AS (
  SELECT level, count(*) AS vocab
  FROM (SELECT unnest(generate_series(0, depth)) AS level FROM tok_depth)
  GROUP BY level
),
pts AS (
  SELECT d.level, d.n_docs, d.n_tokens, v.vocab,
         {sql_micro('ln(d.n_tokens)')} AS x,
         {sql_micro('ln(v.vocab)')} AS y
  FROM doc_stats d JOIN vocab v USING (level)
),
sums AS (
  SELECT *,
         CAST(count(*) OVER () AS BIGINT) AS n,
         sum(x) OVER () AS sx, sum(y) OVER () AS sy,
         sum(x * y) OVER () AS sxy, sum(x * x) OVER () AS sxx
  FROM pts
)
SELECT CAST(level AS INT) AS level, n_docs, n_tokens, vocab,
       {sql_micro(f'({beta_num} / {beta_den})')} AS beta_micro
FROM sums
ORDER BY level
"""


OOV_VOCAB_SIZE = 20


def vocab_oov_report(
    docs: DataFrame,
    col: str,
    group_col: str = "lang",
    train_group: str = "en",
    vocab_size: int = OOV_VOCAB_SIZE,
) -> DataFrame:
    """(grp, n_tokens, oov_tokens, oov_pct_micro, n_types, oov_types,
    type_oov_pct_micro): out-of-vocabulary rates every corpus slice
    would see under a closed ``vocab_size``-entry vocabulary built
    from the ``train_group`` slice's most frequent tokens — the
    tokenizer-budget planning table (what a fixed word/subword budget
    costs each language BEFORE training the tokenizer; cf. the
    fertility report for the after picture).

    Vocab selection is deterministic: top-``vocab_size`` by (freq
    DESC, token ASC). The vocab frame is bounded by the literal
    ``vocab_size`` regardless of corpus size, so force-broadcasting it
    into the marking join is scale-invariant by construction — the
    one corpus-sized operation is the per-slice reduction (token and
    type counts, map-side partials)."""
    from hash_db_spark.operators.curation import micro_col

    toks = docs.select(
        F.col(group_col).alias("grp"), F.explode(clean_tokens(col)).alias("tok")
    )
    vocab = (
        toks.filter(F.col("grp") == train_group)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("in_v"))
    )
    marked = toks.join(F.broadcast(vocab), "tok", "left")
    oov = F.col("in_v").isNull()
    agg = marked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(oov.cast("long")).alias("oov_tokens"),
        F.countDistinct("tok").alias("n_types"),
        F.countDistinct(F.when(oov, F.col("tok"))).alias("oov_types"),
    )
    tok_pct = F.col("oov_tokens").cast("double") / F.col("n_tokens").cast(
        "double"
    )
    type_pct = F.col("oov_types").cast("double") / F.col("n_types").cast(
        "double"
    )
    return agg.select(
        "grp",
        "n_tokens",
        "oov_tokens",
        micro_col(tok_pct).alias("oov_pct_micro"),
        "n_types",
        "oov_types",
        micro_col(type_pct).alias("type_oov_pct_micro"),
    ).orderBy("grp")


def sql_vocab_oov_report(
    table: str = "documents",
    col: str = "text",
    group_col: str = "lang",
    train_group: str = "en",
    vocab_size: int = OOV_VOCAB_SIZE,
) -> str:
    from hash_db_spark.operators.curation import sql_micro

    tok_pct = "(CAST(oov_tokens AS DOUBLE) / CAST(n_tokens AS DOUBLE))"
    type_pct = "(CAST(oov_types AS DOUBLE) / CAST(n_types AS DOUBLE))"
    return f"""
WITH toks AS (
  SELECT {group_col} AS grp, unnest({sql_clean_tokens(col)}) AS tok
  FROM {table}
),
vocab AS (
  SELECT tok FROM (
    SELECT tok, count(*) AS freq
    FROM toks WHERE grp = '{train_group}'
    GROUP BY tok
  )
  ORDER BY freq DESC, tok ASC
  LIMIT {vocab_size}
),
marked AS (
  SELECT t.grp, t.tok, (v.tok IS NULL) AS oov
  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
),
agg AS (
  SELECT grp,
         count(*) AS n_tokens,
         CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
         count(DISTINCT tok) AS n_types,
         count(DISTINCT CASE WHEN oov THEN tok END) AS oov_types
  FROM marked GROUP BY grp
)
SELECT grp, n_tokens, oov_tokens,
       {sql_micro(tok_pct)} AS oov_pct_micro,
       n_types, oov_types,
       {sql_micro(type_pct)} AS type_oov_pct_micro
FROM agg
ORDER BY grp
"""


COVERAGE_NS = (1, 2, 3, 4)


def eval_ngram_coverage(
    docs: DataFrame,
    col: str,
    id_col: str,
    bench_pred,
    ns: tuple[int, ...] = COVERAGE_NS,
) -> DataFrame:
    """(n, bench_grams, covered, coverage_pct_micro): what fraction of
    a held-out benchmark's distinct word n-grams the training corpus
    contains, for n = 1..4 — the memorization-risk spectrum behind
    GPT-3-style n-gram decontamination (Brown et al. 2020, appendix C):
    unigram coverage is inevitably ~1, and the n where coverage falls
    off says how long an overlap a contamination filter must target.
    Complements contamination_check (which flags corpus DOCS; this
    scores the EVAL side).

    One Arrow pass per side emits per-doc-distinct (n, gram) rows for
    every n at once (tokenization identical to clean_tokens, the
    shingle_frame discipline); the benchmark gram set is bounded by
    the benchmark suite's size, so it broadcasts into the corpus
    stream and only surviving grams reach the distinct — the corpus
    is scanned once, never materialized per n."""
    from hash_db_spark.operators.curation import micro_col
    from hash_db_spark.operators.dedup import spread_for_cpu

    def emitter(frame: DataFrame) -> DataFrame:
        def block(batches):
            import pandas as pd

            for pdf in batches:
                out_n, out_g = [], []
                for t in pdf[col]:
                    if not isinstance(t, str):
                        t = ""
                    toks = [x for x in t.replace(",", "").split(" ") if x]
                    for n in ns:
                        if len(toks) < n:
                            continue
                        for g in dict.fromkeys(
                            " ".join(toks[j : j + n])
                            for j in range(len(toks) - n + 1)
                        ):
                            out_n.append(n)
                            out_g.append(g)
                yield pd.DataFrame({"n": out_n, "gram": out_g})

        return (
            spread_for_cpu(frame)
            .select(col)
            .mapInPandas(block, "n int, gram string")
        )

    bench_grams = emitter(docs.filter(bench_pred)).distinct()
    corpus_grams = emitter(docs.filter(~bench_pred))
    covered = (
        corpus_grams.join(F.broadcast(bench_grams), ["n", "gram"])
        .distinct()
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("covered"))
    )
    totals = bench_grams.groupBy("n").agg(
        F.count(F.lit(1)).alias("bench_grams")
    )
    pct = F.col("covered").cast("double") / F.col("bench_grams").cast(
        "double"
    )
    return (
        totals.join(covered, "n", "left")
        .select(
            "n",
            "bench_grams",
            F.coalesce("covered", F.lit(0)).alias("covered"),
            micro_col(
                F.coalesce("covered", F.lit(0)).cast("double")
                / F.col("bench_grams").cast("double")
            ).alias("coverage_pct_micro"),
        )
        .orderBy("n")
    )


def sql_eval_ngram_coverage(
    table: str = "documents",
    col: str = "text",
    id_col: str = "doc_id",
    bench_pred: str = "doc_id < 10",
    ns: tuple[int, ...] = COVERAGE_NS,
) -> str:
    from hash_db_spark.operators.curation import sql_micro
    from hash_db_spark.operators.dedup import sql_shingles

    bench_parts = "\n  UNION ALL\n".join(
        f"  SELECT {n} AS n, unnest({sql_shingles(col, n)}) AS gram"
        f" FROM {table} WHERE {bench_pred}"
        for n in ns
    )
    corpus_parts = "\n  UNION ALL\n".join(
        f"  SELECT {n} AS n, unnest({sql_shingles(col, n)}) AS gram"
        f" FROM {table} WHERE NOT ({bench_pred})"
        for n in ns
    )
    pct = (
        "(CAST(COALESCE(c.covered, 0) AS DOUBLE)"
        " / CAST(t.bench_grams AS DOUBLE))"
    )
    return f"""
WITH bench AS (
  SELECT DISTINCT n, gram FROM (
{bench_parts}
  )
),
corpus AS (
  SELECT DISTINCT n, gram FROM (
{corpus_parts}
  )
),
cov AS (
  SELECT n, count(*) AS covered
  FROM bench JOIN corpus USING (n, gram)
  GROUP BY n
),
tot AS (SELECT n, count(*) AS bench_grams FROM bench GROUP BY n)
SELECT t.n, t.bench_grams,
       CAST(COALESCE(c.covered, 0) AS BIGINT) AS covered,
       {sql_micro(pct)} AS coverage_pct_micro
FROM tot t LEFT JOIN cov c ON t.n = c.n
ORDER BY t.n
"""


PPL_Q_LO = 1.0 / 3.0
PPL_Q_HI = 2.0 / 3.0


def ppl_tertile_buckets(
    df: DataFrame, col: str, id_col: str, lang_col: str = "lang"
) -> DataFrame:
    """(id, lang, bigram_logprob, ppl_bucket): CCNet's head/middle/tail
    split (Wenzek et al., LREC 2020 — public): per LANGUAGE, documents
    are bucketed by LM score tertiles — 'head' is the most fluent third,
    'tail' the least; downstream mixtures upsample head and hold tail
    for contrast/filtering. The corpus's own bigram MLE stands in for
    CCNet's external KenLM, as in ``lm_gate``.

    Scale shape: NOT an ntile window over per-language partitions (one
    task per language = a straggler per major language at 100 TB).
    Instead the two tertile cutoffs per language are exact percentiles
    over the (doc, score) frame — one double per document buffered at
    the percentile, same budget as lm_gate — and the tiny (lang, q33,
    q66) frame broadcasts back for a map-side comparison. Scores are
    pre-rounded to 6dp on both engines, so cutoff comparisons replay."""
    scores = doc_bigram_logprob(df, col, id_col).localCheckpoint(eager=True)
    langs = df.select(F.col(id_col).alias("id"), F.col(lang_col).alias("lang"))
    sl = scores.join(langs, "id")
    cuts = sl.groupBy("lang").agg(
        F.expr(f"percentile(bigram_logprob, {PPL_Q_LO!r})").alias("q33"),
        F.expr(f"percentile(bigram_logprob, {PPL_Q_HI!r})").alias("q66"),
    )
    return (
        sl.join(F.broadcast(cuts), "lang")
        .select(
            "id",
            "lang",
            "bigram_logprob",
            F.when(F.col("bigram_logprob") >= F.col("q66"), "head")
            .when(F.col("bigram_logprob") >= F.col("q33"), "middle")
            .otherwise("tail")
            .alias("ppl_bucket"),
        )
    )


def sql_ppl_tertile_buckets(
    table: str, col: str, id_col: str, lang_col: str = "lang"
) -> str:
    scores = sql_doc_bigram_logprob(table, col, id_col)
    return f"""
WITH scores AS ({scores}),
sl AS (
  SELECT s.id, d.{lang_col} AS lang, s.bigram_logprob
  FROM scores s JOIN {table} d ON d.{id_col} = s.id
),
cuts AS (
  SELECT lang,
         quantile_cont(bigram_logprob, {PPL_Q_LO!r}) AS q33,
         quantile_cont(bigram_logprob, {PPL_Q_HI!r}) AS q66
  FROM sl GROUP BY lang
)
SELECT sl.id, sl.lang, sl.bigram_logprob,
       CASE WHEN bigram_logprob >= q66 THEN 'head'
            WHEN bigram_logprob >= q33 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM sl JOIN cuts USING (lang)
"""
