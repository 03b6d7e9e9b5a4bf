"""Model-based corpus curation: hashed-linear quality scoring,
weighted document sampling, embedding standardization.

No reference counterpart (SURVEY north-star: LLM training-data prep).
Three stages every production pipeline runs after the heuristic gates:

* a fastText-style linear quality classifier over hashed word n-gram
  features — the weights are DATA (a broadcast dimension keyed by
  feature bucket), so swapping in a really-trained model is a data
  change, not a code change. Scoring is integer-exact (milli-weights)
  so the driver oracle matches bit for bit.
* weighted Bernoulli (Poisson) sampling — inclusion probability
  proportional to a per-row weight, content-addressed by key hash.
  ONE scan plus a scalar total, no sort: the only sampling shape that
  holds at 100 TB (A-ES top-k needs a global sort of keys). All
  integer arithmetic, so Spark and DuckDB agree exactly.
* per-dimension embedding standardization stats — posexplode +
  groupBy(dim) with map-side partial aggregation: the d-row partials
  are what cross the shuffle, not the vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

# --- hashed-linear quality classifier ----------------------------------------

N_FEATURE_BUCKETS = 1 << 16


def weights_path() -> str:
    """Repo-local parquet of REALLY-trained milli-weights (one row per
    bucket, unseen buckets 0): a logistic model distilling the Gopher
    heuristic gate over hashed unigram+bigram features, baked
    deterministically by scripts/train_quality_weights.py. The scoring
    path only sees the (bucket, w_milli) dimension, so retraining is a
    data refresh, not a code change."""
    from pathlib import Path

    return str(
        Path(__file__).resolve().parents[2] / "data"
        / "quality_weights.parquet"
    )


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def feature_bucket(gram: Column) -> Column:
    """Stable feature bucket in [0, N_FEATURE_BUCKETS): md5-derived,
    engine-portable (the sampling._bucket idiom)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % N_FEATURE_BUCKETS
    )


def sql_feature_bucket(expr: str) -> str:
    return (
        f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT"
        f" % {N_FEATURE_BUCKETS})"
    )


def gram_features(text: Column | str) -> Column:
    """array<string> of unigram + bigram features of a whitespace
    tokenization. zip_with pads the shorter side with NULL, so the
    trailing (last-word, NULL) bigram concats to NULL and is filtered."""
    words = F.split(F.trim(_c(text)), r"\s+")
    bigrams = F.filter(
        F.zip_with(
            words,
            F.slice(words, 2, 1 << 30),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
        lambda g: g.contains(" "),
    )
    return F.concat(words, bigrams)


def sql_gram_features_cte(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """CTE body ``feats(id, g)``: one row per (doc, unigram|bigram)."""
    return f"""base AS (
  SELECT {id_col} AS id, string_split_regex(trim({text_col}), '\\s+') AS l
  FROM {table}
),
feats AS (
  SELECT id, l[i] AS g
  FROM base, unnest(generate_series(1, len(l))) AS u(i)
  UNION ALL
  SELECT id, l[i] || ' ' || l[i + 1] AS g
  FROM base, unnest(generate_series(1, len(l) - 1)) AS u(i)
)"""


def weight_dim(spark) -> DataFrame:
    """The (bucket, w_milli) trained-model dimension — 64k rows,
    genuinely bounded by N_FEATURE_BUCKETS, so always the broadcast
    side."""
    return spark.read.parquet(weights_path()).select("bucket", "w_milli")


def sql_weight_dim() -> str:
    """Oracle twin reads the SAME baked parquet the Spark side
    broadcasts."""
    return (
        f"SELECT bucket, w_milli FROM read_parquet('{weights_path()}')"
    )


def classifier_scores(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_feats, z_milli, keep): the broadcast model's
    milli-weights summed over the doc's hashed features, PLUS the
    model's intercept (the reserved bucket -1 row — inert in the
    feature join since real buckets are non-negative, read once
    driver-side as model metadata at plan-build time). The intercept
    is what lets a linear count model express count-threshold rules
    (z without one grows monotonically with doc length). Integer-exact
    end to end; features explode map-side; ONE shuffle (the per-doc
    sum)."""
    bias_rows = weights.filter(F.col("bucket") == -1).collect()
    bias_milli = int(bias_rows[0]["w_milli"]) if bias_rows else 0
    feats = docs.select(
        F.col(id_col).alias("id"),
        F.explode(gram_features(text_col)).alias("g"),
    ).select("id", feature_bucket(F.col("g")).alias("bucket"))
    return (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            (F.sum("w_milli") + F.lit(bias_milli)).alias("z_milli"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_feats",
            "z_milli",
            (F.col("z_milli") > 0).alias("keep"),
        )
    )


def sql_classifier_scores(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text"
) -> str:
    return f"""
WITH {sql_gram_features_cte(table, id_col, text_col)},
w AS ({sql_weight_dim()}),
b AS (SELECT coalesce(
        (SELECT w_milli FROM w WHERE bucket = -1), 0) AS w0)
SELECT f.id AS {id_col},
       count(*) AS n_feats,
       CAST(sum(w.w_milli) + (SELECT w0 FROM b) AS BIGINT) AS z_milli,
       sum(w.w_milli) + (SELECT w0 FROM b) > 0 AS keep
FROM (SELECT id, {sql_feature_bucket('g')} AS bucket FROM feats) f
JOIN w ON w.bucket = f.bucket
GROUP BY f.id
"""


# --- weighted Bernoulli sampling ----------------------------------------------

SAMPLE_M = 1 << 20  # hash-uniform resolution


def sample_u(key: Column) -> Column:
    """Content-addressed uniform in [0, SAMPLE_M): md5-derived."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % SAMPLE_M
    )


def sql_sample_u(key_expr: str) -> str:
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {SAMPLE_M})"
    )


def weighted_sample(
    df: DataFrame, key: str, weight: str, target: int
) -> DataFrame:
    """Poisson sampling with inclusion probability ~ target * w / W
    (W = total weight): keep iff u < (target * w * M) div W — all
    integer arithmetic, so the kept set is reproducible, append-stable
    per key, and engine-exact. E[sample size] = target (floor division
    biases each row's threshold down by < 1/M). ONE corpus scan plus a
    scalar total broadcast back; no global sort — the shape that holds
    at 100 TB, unlike top-k-by-random-key (A-ES) which needs one."""
    w = F.col(weight).cast("long")
    total = df.select(F.sum(w).alias("__total_w"))
    # SQL `div`, not `/`: float division loses integer exactness past
    # 2^53 and the oracle twin uses DuckDB's integer `//`. The product
    # target * w * M runs in DECIMAL(38,0) (DuckDB twin: HUGEINT), not
    # BIGINT: at the targets/weights a 100 TB corpus implies, an int64
    # product overflows — Spark (non-ANSI) would WRAP silently while
    # DuckDB raises, silently diverging the kept set. 38 digits cover
    # products to ~1e38 (vs 9.2e18 for int64); the quotient is <=
    # target * M and must fit BIGINT, which holds for any target below
    # 2^43 — far beyond a sample size anyone schedules.
    thresh = F.expr(
        f"CAST(CAST({int(target)} AS DECIMAL(38,0))"
        f" * CAST(`{weight}` AS DECIMAL(38,0))"
        f" * {SAMPLE_M} div `__total_w` AS BIGINT)"
    )
    return (
        df.crossJoin(F.broadcast(total))
        .withColumn("thresh", thresh)
        .filter(sample_u(F.col(key)) < F.col("thresh"))
        .drop("__total_w")
    )


def sql_weighted_sample(
    table: str, key: str, weight: str, target: int, select: str
) -> str:
    return f"""
SELECT {select}, CAST((CAST({target} AS HUGEINT) * {weight} * {SAMPLE_M})
       // (SELECT sum(CAST({weight} AS BIGINT)) FROM {table}) AS BIGINT)
       AS thresh
FROM {table}
WHERE {sql_sample_u(key)} <
      (CAST({target} AS HUGEINT) * {weight} * {SAMPLE_M})
      // (SELECT sum(CAST({weight} AS BIGINT)) FROM {table})
"""


# --- winnowing ----------------------------------------------------------------


def winnow_fps(
    df: DataFrame, col: str, id_col: str, k: int = 3, w: int = 4
) -> DataFrame:
    """(id, fph) distinct: winnowed token-k-gram fingerprints — the min
    md5-derived hash of every FULL window of w consecutive gram hashes.
    Guarantee: two docs sharing a substring of >= k + w - 1 tokens
    share at least one fingerprint (the window containing the shared
    region's minimum is full on both sides)."""
    from pyspark.sql import Window

    from hash_db_spark.operators.dedup import clean_tokens, md5_hash64

    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(clean_tokens(col)).alias("pos", "tok"),
    )
    win = Window.partitionBy("id").orderBy("pos")
    gram = F.concat_ws(
        " ", *(["tok"] + [F.lead("tok", j).over(win) for j in range(1, k)])
    )
    grams = (
        toks.withColumn("g", gram)
        # window expressions cannot sit in a WHERE: project the lead
        # first, filter on the column
        .withColumn("last_tok", F.lead("tok", k - 1).over(win))
        .filter(F.col("last_tok").isNotNull())
        .select("id", "pos", md5_hash64(F.col("g")).alias("h"))
    )
    frame = win.rowsBetween(0, w - 1)
    winnowed = grams.select(
        "id",
        F.min("h").over(frame).alias("fph"),
        F.count("h").over(frame).alias("n_in_frame"),
    ).filter(F.col("n_in_frame") == w)
    return winnowed.select("id", "fph").distinct()


# --- interpolated trigram LM ---------------------------------------------------

# Jelinek-Mercer interpolation weights (trigram, bigram, unigram).
LM_L3, LM_L2, LM_L1 = 0.6, 0.3, 0.1


def trigram_interp_logprob(
    train: DataFrame, score: DataFrame, col: str, id_col: str
) -> DataFrame:
    """(id, n_trigrams, interp_logprob): mean log10 of the
    Jelinek-Mercer interpolated trigram probability of each SCORE doc
    under counts from the TRAIN corpus — the CCNet shape (reference LM
    scores the crawl; here both halves are fixture docs).

      P(w3|w1 w2) = L3*c3/c2p + L2*cb/c1 + L1*(cu+1)/(N+V)

    with missing trigram/bigram components contributing 0 and the
    add-one unigram floor keeping P > 0 for unseen words. All counts
    are exact integers until the final division/log. Scale shape: one
    adjacency window per side keyed on the doc id, count aggregations
    with map-side partials, then joins keyed on (Zipfian) token
    prefixes — AQE broadcast for normal vocabularies, salted shuffle
    (operators/skew.py) beyond. Docs under 3 tokens drop out."""
    from pyspark.sql import Window

    from hash_db_spark.operators.dedup import clean_tokens

    def tri_stream(df: DataFrame) -> DataFrame:
        toks = df.select(
            F.col(id_col).alias("id"),
            F.posexplode(clean_tokens(col)).alias("pos", "tok"),
        )
        w = Window.partitionBy("id").orderBy("pos")
        return (
            toks.withColumn("w2", F.lag("tok", 1).over(w))
            .withColumn("w1", F.lag("tok", 2).over(w))
            .filter(F.col("w1").isNotNull())
            .select("id", "w1", "w2", F.col("tok").alias("w3"))
        )

    # tri_train feeds FOUR count aggregations and uni feeds two, and
    # Spark re-executes an un-materialized subplan once per consumer —
    # without the checkpoints the posexplode + two-lag window plan
    # runs 4x (measured -27% wall at sf0.1 with them, checkpoint
    # builds included). The materialization is corpus-token-sized,
    # but so is EACH of the four window-shuffle recomputes it
    # replaces: one write + four reads beats four sort+shuffle plans.
    tri_train = tri_stream(train).localCheckpoint(eager=True)
    uni = train.select(
        F.explode(clean_tokens(col)).alias("w3")
    ).localCheckpoint(eager=True)
    c3 = tri_train.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("c3")
    )
    c2p = tri_train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2p"))
    cb = tri_train.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("cb"))
    c1 = tri_train.groupBy("w2").agg(F.count(F.lit(1)).alias("c1"))
    cu = uni.groupBy("w3").agg(F.count(F.lit(1)).alias("cu"))
    totals = uni.agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.countDistinct("w3").alias("v_size"),
    )

    p = (
        F.lit(LM_L3)
        * F.coalesce(F.col("c3") / F.col("c2p"), F.lit(0.0))
        + F.lit(LM_L2) * F.coalesce(F.col("cb") / F.col("c1"), F.lit(0.0))
        + F.lit(LM_L1)
        * ((F.coalesce(F.col("cu"), F.lit(0)) + 1)
           / (F.col("n_tok") + F.col("v_size")))
    )
    return (
        tri_stream(score)
        .join(c3, ["w1", "w2", "w3"], "left")
        .join(c2p, ["w1", "w2"], "left")
        .join(cb, ["w2", "w3"], "left")
        .join(c1, ["w2"], "left")
        .join(cu, ["w3"], "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.round(F.avg(F.log10(p)), 6).alias("interp_logprob"),
        )
        .select(
            F.col("id").alias(id_col), "n_trigrams", "interp_logprob"
        )
    )


def sql_trigram_interp_logprob(
    train_pred: str,
    score_pred: str,
    table: str = "documents",
    col: str = "text",
    id_col: str = "doc_id",
) -> str:
    from hash_db_spark.operators.dedup import sql_clean_tokens

    toks = sql_clean_tokens(col)
    stream = f"""(
  SELECT id, w1, w2, w3 FROM (
    SELECT id, tok AS w3,
           lag(tok, 1) OVER (PARTITION BY id ORDER BY pos) AS w2,
           lag(tok, 2) OVER (PARTITION BY id ORDER BY pos) AS w1
    FROM (
      SELECT {id_col} AS id, unnest(l) AS tok,
             generate_subscripts(l, 1) AS pos
      FROM (SELECT {id_col}, {toks} AS l FROM {table} WHERE {{pred}})
    )
  ) WHERE w1 IS NOT NULL
)"""
    tri_train = stream.format(pred=train_pred)
    tri_score = stream.format(pred=score_pred)
    return f"""
WITH tri_train AS (SELECT * FROM {tri_train}),
tri_score AS (SELECT * FROM {tri_score}),
uni AS (
  SELECT unnest({toks}) AS w3 FROM {table} WHERE {train_pred}
),
c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM tri_train GROUP BY 1, 2, 3),
c2p AS (SELECT w1, w2, count(*) AS c2p FROM tri_train GROUP BY 1, 2),
cb AS (SELECT w2, w3, count(*) AS cb FROM tri_train GROUP BY 1, 2),
c1 AS (SELECT w2, count(*) AS c1 FROM tri_train GROUP BY 1),
cu AS (SELECT w3, count(*) AS cu FROM uni GROUP BY 1),
totals AS (
  SELECT count(*) AS n_tok, count(DISTINCT w3) AS v_size FROM uni
)
SELECT s.id AS {id_col},
       count(*) AS n_trigrams,
       round(avg(log10(
         {LM_L3} * coalesce(c3.c3 / c2p.c2p, 0.0)
         + {LM_L2} * coalesce(cb.cb / c1.c1, 0.0)
         + {LM_L1} * ((coalesce(cu.cu, 0) + 1)
                      / (totals.n_tok + totals.v_size))
       )), 6) AS interp_logprob
FROM tri_score s
LEFT JOIN c3 ON c3.w1 = s.w1 AND c3.w2 = s.w2 AND c3.w3 = s.w3
LEFT JOIN c2p ON c2p.w1 = s.w1 AND c2p.w2 = s.w2
LEFT JOIN cb ON cb.w2 = s.w2 AND cb.w3 = s.w3
LEFT JOIN c1 ON c1.w2 = s.w2
LEFT JOIN cu ON cu.w3 = s.w3
CROSS JOIN totals
GROUP BY s.id
"""


# --- embedding standardization -------------------------------------------------


JL_OUT_DIMS = 16


def jl_sign(dim: Column, odim: Column) -> Column:
    """Deterministic Rademacher entry of the projection matrix:
    +-1 from a closed-form parity (both engines share it)."""
    return ((dim * 31 + odim * 17) % 2) * 2 - 1


def embedding_project_jl(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(vec_id, odim, val): Johnson-Lindenstrauss projection to
    JL_OUT_DIMS dims with a deterministic +-1/sqrt(k) matrix — the
    standard compression before banded LSH / IVF when vectors are wide.
    Relational form: posexplode the vector, join the broadcast
    (dim, odim, sign) matrix, partial-aggregate the dot products —
    the shuffle moves (n x k) skinny rows, never the matrix math to
    the driver. Rounded to 4dp on both engines."""
    spark = emb.sparkSession
    dims = emb.select(F.posexplode(vec_col).alias("dim", "v"), id_col)
    n_in = F.size(F.col(vec_col))
    proj = (
        spark.range(JL_OUT_DIMS)
        .select(F.col("id").cast("int").alias("odim"))
        .crossJoin(
            emb.select(
                F.explode(F.sequence(F.lit(0), n_in - 1)).alias("dim")
            ).distinct()
        )
        .select(
            "dim",
            "odim",
            jl_sign(F.col("dim"), F.col("odim")).cast("double").alias("sgn"),
        )
    )
    scale = 1.0 / (JL_OUT_DIMS ** 0.5)
    return (
        dims.join(F.broadcast(proj), "dim")
        .groupBy(id_col, "odim")
        .agg(
            F.round(F.sum(F.col("v") * F.col("sgn")) * F.lit(scale), 4).alias(
                "val"
            )
        )
    )


def sql_embedding_project_jl(table: str = "embeddings") -> str:
    scale = 1.0 / (JL_OUT_DIMS ** 0.5)
    return f"""
WITH dims AS (
  SELECT vec_id, i - 1 AS dim, embedding[i] AS v
  FROM {table}, unnest(generate_series(1, len(embedding))) AS u(i)
)
SELECT vec_id, CAST(odim AS INT) AS odim,
       round(sum(v * (((dim * 31 + odim * 17) % 2) * 2 - 1)) * {scale}, 4)
         AS val
FROM dims,
     unnest(generate_series(0, {JL_OUT_DIMS - 1})) AS o(odim)
GROUP BY vec_id, odim
"""


def embedding_dim_stats(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(dim, mu, sigma): per-dimension mean and population stddev of
    the corpus embeddings, rounded to 4dp on both engines (sum-order
    low bits differ). The ``+ 0.0`` folds IEEE negative zero into
    positive zero on BOTH sides: a mean like -3e-6 rounds to -0.0,
    whose repr diverges from 0.0 in the driver's value hash (caught by
    the r10 sf0.1 sweep — sign of an epsilon mean is sum-order noise,
    so canonicalizing it is semantically free). posexplode +
    groupBy(dim): the map-side partial aggregate reduces each partition
    to d rows before the shuffle, so the exchange moves
    O(d * partitions), not O(n * d)."""
    return (
        emb.select(F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("dim")
        .agg(
            (F.round(F.avg("v"), 4) + 0.0).alias("mu"),
            (F.round(F.stddev_pop("v"), 4) + 0.0).alias("sigma"),
        )
    )


def sql_embedding_dim_stats(table: str = "embeddings") -> str:
    return f"""
SELECT i - 1 AS dim,
       round(avg(embedding[i]), 4) + 0.0 AS mu,
       round(stddev_pop(embedding[i]), 4) + 0.0 AS sigma
FROM {table}, unnest(generate_series(1, len(embedding))) AS u(i)
GROUP BY dim
"""


def embedding_whiten_norms(
    emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(vec_id, norm): L2 norm of each vector after per-dimension
    standardization ((v - mu) / sigma) — the application half of
    embedding_dim_stats. The UNROUNDED stats join back as a broadcast
    dimension; the norm reduces per vector with a partial-aggregable
    sum of squares. Rounded to 3dp (two float reductions stack)."""
    dims = emb.select(F.col(id_col), F.posexplode(vec_col).alias("dim", "v"))
    stats = (
        emb.select(F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.avg("v").alias("mu"),
            F.stddev_pop("v").alias("sigma"),
        )
    )
    z = (F.col("v") - F.col("mu")) / F.col("sigma")
    return (
        dims.join(F.broadcast(stats), "dim")
        .groupBy(id_col)
        .agg(F.round(F.sqrt(F.sum(z * z)), 3).alias("norm"))
    )


def sql_embedding_whiten_norms(table: str = "embeddings") -> str:
    return f"""
WITH dims AS (
  SELECT vec_id, i - 1 AS dim, embedding[i] AS v
  FROM {table}, unnest(generate_series(1, len(embedding))) AS u(i)
),
stats AS (
  SELECT dim, avg(v) AS mu, stddev_pop(v) AS sigma
  FROM dims GROUP BY dim
)
SELECT d.vec_id,
       round(sqrt(sum(((d.v - s.mu) / s.sigma) * ((d.v - s.mu) / s.sigma))), 3)
         AS norm
FROM dims d JOIN stats s ON s.dim = d.dim
GROUP BY d.vec_id
"""


# --- DSIR: data selection via importance resampling ----------------------------


DSIR_MICRO = 1_000_000  # micro-nat quantization of per-bucket log-ratios
DSIR_GUMBEL_DENOM = SAMPLE_M + 1  # maps sample_u into the open (0,1)


def micro_col(c: Column) -> Column:
    """round-half-away(x * 1e6) as BIGINT — quantizes a per-row double
    to integer micro-units so every downstream SUM is exact integer
    arithmetic (associative, shuffle-order-independent in both
    engines). The only cross-engine float op left is the single
    expression that produced ``c`` for one row — never a float
    aggregation."""
    return (
        F.signum(c) * F.floor(F.abs(c) * DSIR_MICRO + F.lit(0.5))
    ).cast("long")


def sql_micro(expr: str) -> str:
    return (
        f"CAST(sign({expr}) * floor(abs({expr}) * {DSIR_MICRO} + 0.5)"
        f" AS BIGINT)"
    )


def dsir_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_feats, w_micro): per-document DSIR importance weight
    (Xie et al., NeurIPS 2023, arXiv:2302.03169 — Data Selection via
    Importance Resampling) in integer micro-nats.

    Two hashed bag-of-ngrams unigram models are fit over the SAME
    feature space the quality classifier uses (``gram_features`` →
    ``feature_bucket``): the target distribution from the rows where
    ``is_target`` holds and the raw distribution from every row. Each
    bucket's Laplace-smoothed log-likelihood ratio

        lr(b) = ln((cnt_t(b)+1)/(tot_t+B)) - ln((cnt_r(b)+1)/(tot_r+B))

    is quantized to integer micro-nats ONCE per bucket; a document's
    weight is the exact integer sum of lr over its feature
    occurrences, so the per-doc aggregation is engine-portable by
    construction (no float-sum order hazard).

    Scale shape: the feature stream is exploded map-side twice (two
    cheap columnar scans beat materializing a corpus-token-sized
    checkpoint at 100 TB); the model dimension is groupBy(bucket) with
    map-side partials and is HARD-BOUNDED at N_FEATURE_BUCKETS rows
    regardless of corpus size (the weight_dim/HLL-register argument),
    so broadcasting it is scale-invariant; corpus totals are a
    documented-tiny driver collect (1 row off the bounded dim); the
    only corpus-sized shuffle is the final per-doc sum.
    """
    lr = dsir_log_ratio_dim(docs, is_target, text_col, id_col)
    return dsir_score(docs, lr, text_col, id_col)


def dsir_log_ratio_dim(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(bucket, lr_micro): the fitted DSIR model dimension — the
    publishable artifact (``sources.writers.publish_version``) a
    streaming ingest gate probes without ever re-fitting."""
    feats = docs.select(
        F.col(id_col).alias("id"),
        is_target.alias("is_t"),
        F.explode(gram_features(text_col)).alias("g"),
    ).select("id", "is_t", feature_bucket(F.col("g")).alias("bucket"))
    dim = (
        feats.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cnt_r"),
            F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("cnt_t"),
        )
        .localCheckpoint(eager=True)  # <= 65,536 skinny rows by construction
    )
    tot = dim.agg(
        F.sum("cnt_r").alias("tot_r"), F.sum("cnt_t").alias("tot_t")
    ).collect()[0]
    b = float(N_FEATURE_BUCKETS)
    return dim.select(
        "bucket",
        micro_col(
            F.log((F.col("cnt_t") + F.lit(1.0)) / F.lit(float(tot.tot_t) + b))
            - F.log((F.col("cnt_r") + F.lit(1.0)) / F.lit(float(tot.tot_r) + b))
        ).alias("lr_micro"),
    )


def dsir_score(
    docs: DataFrame,
    lr_dim: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_feats, w_micro): score documents against a fitted
    (bucket, lr_micro) dimension — batch AND structured-streaming safe
    (map-side explode, stream-static broadcast join, one per-doc
    aggregation; no collect, no checkpoint)."""
    feats = docs.select(
        F.col(id_col).alias("id"),
        F.explode(gram_features(text_col)).alias("g"),
    ).select("id", feature_bucket(F.col("g")).alias("bucket"))
    return (
        feats.join(F.broadcast(lr_dim), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lr_micro").alias("w_micro"),
        )
        .select(F.col("id").alias(id_col), "n_feats", "w_micro")
    )


def dsir_resample(
    weights: DataFrame, n: int, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, n_feats, w_micro, key_micro): the Gumbel-top-k
    resample over DSIR weights — sampling WITHOUT replacement with
    inclusion probability proportional to exp(w) is equivalent to
    taking the top-n of w + Gumbel noise (Vieira 2014 gumbel-max
    trick). The Gumbel draw is content-addressed (``sample_u`` md5
    uniform, shifted into the open unit interval), so the selected set
    is reproducible and append-stable; noise and weight are both
    integer micro-nats, so the ranking key is exact. Top-n compiles to
    TakeOrderedAndProject — per-partition heaps, no global sort."""
    u = (sample_u(F.col(id_col)) + F.lit(1.0)) / F.lit(
        float(DSIR_GUMBEL_DENOM)
    )
    key = F.col("w_micro") + micro_col(-F.log(-F.log(u)))
    return (
        weights.withColumn("key_micro", key)
        .orderBy(F.col("key_micro").desc(), F.col(id_col).asc())
        .limit(n)
    )


def sql_dsir_weights(
    target_pred: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle twin of dsir_weights: same grams, same buckets, same
    Laplace literals, same micro-nat quantization point."""
    b = float(N_FEATURE_BUCKETS)
    return f"""
WITH {sql_gram_features_cte(table, id_col, text_col)},
fb AS (SELECT id, {sql_feature_bucket('g')} AS bucket FROM feats),
flags AS (SELECT {id_col} AS id, ({target_pred}) AS is_t FROM {table}),
occ AS (SELECT fb.id, fb.bucket, flags.is_t FROM fb JOIN flags USING (id)),
dim AS (
  SELECT bucket, count(*) AS cnt_r,
         sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS cnt_t
  FROM occ GROUP BY bucket
),
tot AS (SELECT sum(cnt_r) AS tot_r, sum(cnt_t) AS tot_t FROM dim),
lr AS (
  SELECT bucket,
         {sql_micro(
             f"ln((cnt_t + 1.0) / (tot_t + {b}))"
             f" - ln((cnt_r + 1.0) / (tot_r + {b}))"
         )} AS lr_micro
  FROM dim CROSS JOIN tot
)
SELECT occ.id AS {id_col}, count(*) AS n_feats,
       CAST(sum(lr.lr_micro) AS BIGINT) AS w_micro
FROM occ JOIN lr USING (bucket)
GROUP BY occ.id
"""


def sql_dsir_resample(
    target_pred: str,
    n: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    gumbel = (
        f"-ln(-ln(({sql_sample_u(id_col)} + 1.0)"
        f" / {float(DSIR_GUMBEL_DENOM)}))"
    )
    return f"""
WITH w AS ({sql_dsir_weights(target_pred, table, id_col, text_col)})
SELECT {id_col}, n_feats, w_micro,
       w_micro + {sql_micro(gumbel)} AS key_micro
FROM w
ORDER BY key_micro DESC, {id_col} ASC
LIMIT {n}
"""


# --- classifier calibration (reliability table) ---------------------------------

CALIB_BUCKETS = 10


def calibration_report(
    scored: DataFrame,
    z_milli_col: str,
    label_col: str,
    n_buckets: int = CALIB_BUCKETS,
) -> DataFrame:
    """(bucket, n, n_pos, p_sum_micro, gap_mass_micro): the reliability
    table behind Expected Calibration Error (Guo et al., ICML 2017) for
    a logistic score against a binary reference label. Each row's
    predicted probability p = sigmoid(z/1000) is micro-quantized from
    ONE expression; its bucket comes from the integer p_micro (no
    second float op); every aggregate is an exact integer sum. A
    bucket's gap_mass_micro = |sum(p_micro) - n_pos * 1e6| is the
    absolute calibration-error mass (divide by n for the mean gap, sum
    over buckets / N for ECE — both derivable from the table). The
    TOTAL row (bucket = -1) sums the masses. Map-side projection + one
    <= n_buckets-row shuffle."""
    z = F.col(z_milli_col).cast("double") / F.lit(1000.0)
    p_micro = micro_col(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor(p_micro / F.lit(DSIR_MICRO // n_buckets)),
    ).cast("int")
    rows = scored.select(
        bucket.alias("bucket"),
        p_micro.alias("p_micro"),
        F.col(label_col).cast("int").alias("y"),
    )
    per = (
        rows.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("n_pos"),
            F.sum("p_micro").alias("p_sum_micro"),
        )
        .select(
            "bucket",
            "n",
            F.col("n_pos").cast("long").alias("n_pos"),
            F.col("p_sum_micro").cast("long").alias("p_sum_micro"),
            F.abs(
                F.col("p_sum_micro") - F.col("n_pos") * F.lit(DSIR_MICRO)
            ).cast("long").alias("gap_mass_micro"),
        )
    )
    total = per.agg(
        F.lit(-1).alias("bucket"),
        F.sum("n").alias("n"),
        F.sum("n_pos").alias("n_pos"),
        F.sum("p_sum_micro").alias("p_sum_micro"),
        F.sum("gap_mass_micro").alias("gap_mass_micro"),
    )
    return per.unionAll(total)


def sql_calibration_report(
    scored_sql: str,
    z_milli_expr: str = "z_milli",
    label_expr: str = "keep",
    n_buckets: int = CALIB_BUCKETS,
) -> str:
    p = f"(1.0 / (1.0 + exp(-(CAST({z_milli_expr} AS DOUBLE) / 1000.0))))"
    p_micro = sql_micro(p)
    width = DSIR_MICRO // n_buckets
    return f"""
WITH rows_ AS (
  SELECT least({n_buckets - 1}, CAST(floor({p_micro} / {width}) AS BIGINT))
           AS bucket,
         {p_micro} AS p_micro,
         CAST({label_expr} AS INT) AS y
  FROM ({scored_sql})
),
per AS (
  SELECT CAST(bucket AS INT) AS bucket,
         count(*) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(p_micro) AS BIGINT) AS p_sum_micro,
         CAST(abs(sum(p_micro) - sum(y) * {DSIR_MICRO}) AS BIGINT)
           AS gap_mass_micro
  FROM rows_ GROUP BY bucket
)
SELECT * FROM per
UNION ALL
SELECT -1, CAST(sum(n) AS BIGINT), CAST(sum(n_pos) AS BIGINT),
       CAST(sum(p_sum_micro) AS BIGINT), CAST(sum(gap_mass_micro) AS BIGINT)
FROM per
"""


ESS_MILLI = 1_000.0


def ess_report(
    weights: DataFrame,
    docs: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    w_col: str = "w_micro",
) -> DataFrame:
    """(source, n_docs, ess_milli, ess_ratio_micro, max_share_micro):
    effective sample size of importance weights per corpus slice —
    Kish's ESS = (sum w)^2 / sum w^2 (Kish, "Survey Sampling", 1965;
    the standard degeneracy diagnostic for importance resampling, cf.
    the DSIR paper's resampling stage). ess_ratio = ESS/n in [1/n, 1]:
    near 1 means the slice resamples like uniform data; near 1/n means
    a handful of documents dominate and the resample will collapse.
    max_share is the heaviest single document's weight share — the
    one-line "is one doc the whole sample" check.

    ``weights`` carries log-weights in integer micro-nats (w_micro,
    dsir_weights' output contract). Each row's linear weight is
    quantized ONCE to integer milli-units (exp is the single
    cross-engine float op, the micro_col discipline), so the three
    aggregates are exact integer / decimal sums: sum_e (BIGINT),
    sum_e2 (exact DECIMAL(38,0) — products are < 2^63 but their
    corpus-scale SUM is not), max_e (BIGINT). The ESS / ratio / share
    expressions are one float expression each per GROUP row, written
    token-identically in the SQL oracle.

    Scale shape: one id-keyed equijoin to attach the slice key (both
    sides doc-keyed — co-partitioned at scale), then ONE group-keyed
    reduction with map-side partials; group cardinality = number of
    sources."""
    keyed = weights.select(
        F.col(id_col).alias("id"), F.col(w_col).alias("lw")
    ).join(docs.select(F.col(id_col).alias("id"), F.col(group_col)), "id")
    # two consumers (slice max, then the stabilized aggregate) — pin
    # the 3-narrow-column frame instead of re-running the whole DSIR
    # model fit per consumer; lazy: materializes on first use.
    keyed = keyed.localCheckpoint(eager=False)
    # ESS is invariant to scaling all weights by a constant, so shift
    # each slice's log-weights by the slice max before exponentiating
    # (log-sum-exp stabilization): the heaviest doc maps to e == 1000
    # exactly and nothing representable underflows. The max dimension
    # is one integer row per slice — scale-invariant broadcast.
    mx = keyed.groupBy(group_col).agg(F.max("lw").alias("mx"))
    e_milli = (
        F.floor(
            F.exp((F.col("lw") - F.col("mx")).cast("double") / DSIR_MICRO)
            * ESS_MILLI
            + F.lit(0.5)
        )
    ).cast("long")
    joined = keyed.join(F.broadcast(mx), group_col).select(
        group_col, e_milli.alias("e")
    )
    agg = joined.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("e").alias("sum_e"),
        F.sum((F.col("e") * F.col("e")).cast("decimal(38,0)")).alias("sum_e2"),
        F.max("e").alias("max_e"),
    )
    # all-underflowed slices (every e_milli == 0) have no defined ESS:
    # NULL, not a DIVIDE_BY_ZERO abort under Spark 4's ANSI default —
    # the same F.when guard cosine() uses.
    ess = (
        F.col("sum_e").cast("double") * F.col("sum_e").cast("double")
    ) / F.when(F.col("sum_e2") != 0, F.col("sum_e2").cast("double"))
    ratio = ess / F.col("n_docs").cast("double")
    share = F.col("max_e").cast("double") / F.when(
        F.col("sum_e") != 0, F.col("sum_e").cast("double")
    )
    return agg.select(
        group_col,
        "n_docs",
        F.floor(ess * ESS_MILLI + F.lit(0.5)).cast("long").alias("ess_milli"),
        micro_col(ratio).alias("ess_ratio_micro"),
        micro_col(share).alias("max_share_micro"),
    ).orderBy(group_col)


def sql_ess_report(
    target_pred: str,
    table: str = "documents",
    group_col: str = "source",
    id_col: str = "doc_id",
) -> str:
    """Oracle twin of ess_report over sql_dsir_weights' output."""
    ess = (
        "(CAST(sum_e AS DOUBLE) * CAST(sum_e AS DOUBLE)"
        " / CAST(NULLIF(sum_e2, 0) AS DOUBLE))"
    )
    ratio = f"({ess} / CAST(n_docs AS DOUBLE))"
    share = "(CAST(max_e AS DOUBLE) / CAST(NULLIF(sum_e, 0) AS DOUBLE))"
    return f"""
WITH w AS ({sql_dsir_weights(target_pred, table, id_col)}),
keyed AS (
  SELECT w.{id_col} AS id, w.w_micro AS lw, t.{group_col}
  FROM w JOIN {table} t ON w.{id_col} = t.{id_col}
),
mx AS (SELECT {group_col}, max(lw) AS mx FROM keyed GROUP BY {group_col}),
lin AS (
  SELECT k.{group_col},
         CAST(floor(exp(CAST(k.lw - m.mx AS DOUBLE) / {DSIR_MICRO})
              * {ESS_MILLI} + 0.5) AS BIGINT) AS e
  FROM keyed k JOIN mx m USING ({group_col})
),
agg AS (
  SELECT {group_col},
         count(*) AS n_docs,
         CAST(sum(e) AS BIGINT) AS sum_e,
         sum(e * e) AS sum_e2,
         CAST(max(e) AS BIGINT) AS max_e
  FROM lin
  GROUP BY {group_col}
)
SELECT {group_col}, n_docs,
       CAST(floor({ess} * {ESS_MILLI} + 0.5) AS BIGINT) AS ess_milli,
       {sql_micro(ratio)} AS ess_ratio_micro,
       {sql_micro(share)} AS max_share_micro
FROM agg
ORDER BY {group_col}
"""


# --- Laplace-shaped noisy count release ------------------------------------------

DP_EPSILON = 1.0
# PUBLIC demo seed for oracle-replayable fixtures and tests. A release
# keyed by it is DETERMINISTIC JITTER, not a privacy mechanism — anyone
# with the source can recompute and subtract the noise. Real releases
# must supply their own secret seed (see dp_noisy_counts docstring).
DEMO_JITTER_SEED = "dp-r1"


def dp_noisy_counts(
    df: DataFrame,
    group_col: str,
    epsilon: float = DP_EPSILON,
    *,
    seed: str,
) -> DataFrame:
    """(group, noisy_count): Laplace-shaped count release (mechanism
    form from Dwork, McSherry, Nissim, Smith, TCC 2006 — public): each
    group's count is published with inverse-CDF Laplace(1/epsilon)
    noise, the calibrated shape for sensitivity-1 counting queries.

    PRIVACY CONTRACT — the differential-privacy guarantee holds ONLY
    when ``seed`` is SECRET, HIGH-ENTROPY, PER-RELEASE material held by
    the curator (which is why the parameter is keyword-only with no
    default): the noise is a deterministic function of (seed, group),
    so a public or low-entropy seed lets anyone recompute and subtract
    it, making epsilon effectively infinite. ``DEMO_JITTER_SEED`` is
    public by construction — releases keyed by it (the registered
    driver fixture, the tests) demonstrate the mechanism's plumbing and
    replay law, nothing more. Even with a secret seed the 2^20-grid
    uniform truncates the Laplace tail at ln(2^20)/eps ~ 13.86/eps, so
    the guarantee is (eps, delta)-DP with delta ~ 2^-20 rather than
    pure eps-DP — acceptable for count releases, stated here so nobody
    claims the pure form.

    Mechanics: content-addressed uniform (md5 of seed#group) mapped to
    u in (-0.5, 0.5); noise = -(1/eps)*sgn(u)*ln(1-2|u|). Fixing the
    noise per (seed, group) is the standard fixed-noise re-release
    practice: replaying the same release replays the SAME noise instead
    of averaging it away; rotating ``seed`` is what spends fresh
    budget. The +0.5 offset keeps u strictly inside the open interval —
    ln(0) can't occur. One map-combined groupBy; noise math is map-side
    column arithmetic, identical on both engines."""
    cnt = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("c")
    )
    u = (
        (sample_u(F.concat(F.lit(seed), F.lit("#"), F.col("grp"))) + 0.5)
        / float(SAMPLE_M)
        - 0.5
    )
    noise = (
        -(1.0 / epsilon)
        * F.signum(u)
        * F.log(1.0 - 2.0 * F.abs(u))
    )
    return cnt.select(
        F.col("grp").alias(group_col),
        F.round(F.col("c") + noise, 6).alias("noisy_count"),
    )


def sql_dp_noisy_counts(
    table: str,
    group_col: str,
    epsilon: float = DP_EPSILON,
    *,
    seed: str,
) -> str:
    key_expr = f"'{seed}#' || {group_col}"
    u = (
        f"(({sql_sample_u(key_expr)} + 0.5)"
        f" / {float(SAMPLE_M)!r} - 0.5)"
    )
    return f"""
SELECT {group_col},
       round(count(*) + (-(1.0 / {epsilon!r}) * sign({u})
             * ln(1.0 - 2.0 * abs({u}))), 6) AS noisy_count
FROM {table}
GROUP BY {group_col}
"""
