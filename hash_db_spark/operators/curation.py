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

# Closed-form synthetic milli-weights (stand-in for a trained model —
# the scoring path only sees the (bucket, w_milli) dimension, so real
# weights drop in as data). Knuth-multiplicative spread, zero-mean-ish
# integer range [-1001, +1001].
_W_MULT = 2654435761
_W_MOD = 2003


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
    """The (bucket, w_milli) model dimension — 64k rows, always the
    broadcast side."""
    return spark.range(N_FEATURE_BUCKETS).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * _W_MULT) % _W_MOD - F.lit((_W_MOD - 1) // 2))
        .cast("long")
        .alias("w_milli"),
    )


def sql_weight_dim() -> str:
    return (
        f"SELECT i AS bucket, "
        f"CAST((i * {_W_MULT}) % {_W_MOD} - {(_W_MOD - 1) // 2} AS BIGINT)"
        f" AS w_milli "
        f"FROM generate_series(0, {N_FEATURE_BUCKETS - 1}) AS g(i)"
    )


def classifier_scores(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_feats, z_milli, keep): sum of the broadcast model's
    milli-weights over the doc's hashed features. Integer-exact; the
    probability is sigmoid(z_milli / (1000 * n_feats)) if a caller
    wants it — kept out of the checked output so parity stays exact.
    Features explode map-side; ONE shuffle (the per-doc sum)."""
    feats = docs.select(
        F.col(id_col).alias("id"),
        F.explode(gram_features(text_col)).alias("g"),
    ).select("id", feature_bucket(F.col("g")).alias("bucket"))
    return (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("w_milli").alias("z_milli"),
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
w AS ({sql_weight_dim()})
SELECT f.id AS {id_col},
       count(*) AS n_feats,
       CAST(sum(w.w_milli) AS BIGINT) AS z_milli,
       sum(w.w_milli) > 0 AS keep
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
    # 2^53 and the oracle twin uses DuckDB's integer `//`
    thresh = F.expr(
        f"CAST({int(target)} AS BIGINT) * CAST(`{weight}` AS BIGINT)"
        f" * {SAMPLE_M} div `__total_w`"
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
SELECT {select}, CAST(({target} * CAST({weight} AS BIGINT) * {SAMPLE_M})
       // (SELECT sum(CAST({weight} AS BIGINT)) FROM {table}) AS BIGINT)
       AS thresh
FROM {table}
WHERE {sql_sample_u(key)} <
      ({target} * CAST({weight} AS BIGINT) * {SAMPLE_M})
      // (SELECT sum(CAST({weight} AS BIGINT)) FROM {table})
"""


# --- embedding standardization -------------------------------------------------


def embedding_dim_stats(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(dim, mu, sigma): per-dimension mean and population stddev of
    the corpus embeddings, rounded to 4dp on both engines (sum-order
    low bits differ). posexplode + groupBy(dim): the map-side partial
    aggregate reduces each partition to d rows before the shuffle, so
    the exchange moves O(d * partitions), not O(n * d)."""
    return (
        emb.select(F.posexplode(vec_col).alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.round(F.avg("v"), 4).alias("mu"),
            F.round(F.stddev_pop("v"), 4).alias("sigma"),
        )
    )


def sql_embedding_dim_stats(table: str = "embeddings") -> str:
    return f"""
SELECT i - 1 AS dim,
       round(avg(embedding[i]), 4) AS mu,
       round(stddev_pop(embedding[i]), 4) AS sigma
FROM {table}, unnest(generate_series(1, len(embedding))) AS u(i)
GROUP BY dim
"""
