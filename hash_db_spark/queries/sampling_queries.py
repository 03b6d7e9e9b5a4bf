"""Driver-checkable queries: deterministic sampling/splits + reshaping
(pivot, grouping sets, time-series gap filling)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table, register_views
from hash_db_spark.operators import sampling as SM
from hash_db_spark.queries import Query


def q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle: md5(seed#doc_id) ordering key.
    The driver hash is order-insensitive, so the check pins the KEY
    values (bijective with the order), not row sequence."""
    docs = load_table(spark, sf_dir, "documents")
    return SM.training_order(docs, "doc_id").select("doc_id", "ord")


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return SM.hash_sample(docs, "doc_id", 0.25).select("doc_id", "lang")


def q_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    split = SM.train_val_test(docs, "doc_id", val=0.1, test=0.05)
    return split.groupBy("split").agg(F.count(F.lit(1)).alias("n"))


def q_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination audit: near-dup pairs (MinHash) whose
    two documents landed in DIFFERENT splits — each such pair leaks
    training signal into evaluation. Reports pair counts per ordered
    split pair; an empty/near-empty result is the release gate. The join
    attaches one skinny split column per pair side — no extra shuffle
    beyond the pair generation itself."""
    from hash_db_spark.operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    split = SM.train_val_test(docs, "doc_id", val=0.1, test=0.05).select(
        "doc_id", "split"
    )
    pairs = D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.5)
    a = split.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    b = split.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("leaked_pairs"))
    )


def _split_leakage_oracle() -> str:
    from hash_db_spark.operators import dedup as D

    pairs = D.sql_minhash_lsh_pairs(
        "documents", "text", "doc_id", threshold=0.5
    )
    split = SM.sql_train_val_test("doc_id", val=0.1, test=0.05)
    return f"""
WITH pairs AS ({pairs}),
s AS (SELECT doc_id, {split} AS split FROM documents)
SELECT sa.split AS split_a, sb.split AS split_b,
       count(*) AS leaked_pairs
FROM pairs
JOIN s sa ON sa.doc_id = pairs.id_a
JOIN s sb ON sb.doc_id = pairs.id_b
WHERE sa.split != sb.split
GROUP BY split_a, split_b
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = SM.stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5, "fr": 1.0, "de": 1.0, "es": 1.0, "zh": 1.0}
    )
    return out.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))


MIX_WEIGHTS = {f"src{i}": (2.0 if i < 4 else 0.5) / 16.0 for i in range(20)}


def q_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture-targeted downsampling: heavy weight on src0-3, light on
    the rest — output proportions hit the target without upsampling."""
    docs = load_table(spark, sf_dir, "documents")
    out = SM.mix_to_weights(docs, "doc_id", "source", MIX_WEIGHTS)
    return out.select("doc_id", "source")


MIX_ORACLE = SM.sql_mix_to_weights(
    "documents", "doc_id", "source", MIX_WEIGHTS, "t.doc_id, t.source"
)


STRATIFIED_ORACLE = f"""
SELECT lang, count(*) AS n FROM documents
WHERE {SM.sql_bucket('doc_id')} <
  (CASE WHEN lang = 'en' THEN {int(0.5 * SM.BUCKETS)} ELSE {SM.BUCKETS} END)
GROUP BY lang
"""


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts: rows = orderpriority, columns = status."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce("F", F.lit(0)).alias("n_f"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("P", F.lit(0)).alias("n_p"),
        )
    )


PIVOT_ORACLE = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority
"""


def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse reshaping (melt): lineitem measures to long form —
    map-side only, no shuffle (each row fans out to 3)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    )


UNPIVOT_ORACLE = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
FROM lineitem WHERE l_orderkey < 100
"""


def q_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact percentiles (median + p90 price per return flag)
    — partial percentile state merges map-side like any aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias("p90"),
    )


GROUPED_QUANTILES_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 6) AS p90
FROM lineitem GROUP BY l_returnflag
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — totals by segment, by nation, and grand."""
    register_views(spark, sf_dir)
    return spark.sql(GROUPING_SETS_SQL)


GROUPING_SETS_SQL = """
SELECT c_mktsegment, c_nationkey, round(sum(c_acctbal), 2) AS bal, count(*) AS n
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
"""


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: dense daily spine via sequence+explode
    (DuckDB: generate_series), left join daily counts, zero-fill."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    daily = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce("n", F.lit(0)).alias("n")
    )


GAP_FILL_ORACLE = """
WITH bounds AS (
  SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS lo,
         CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS hi
  FROM events
),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds
),
daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n
  FROM events WHERE event_type = 'signup' GROUP BY 1
)
SELECT s.day, COALESCE(d.n, 0) AS n
FROM spine s LEFT JOIN daily d ON d.day = s.day
"""


def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality profile of the documents table in one aggregation."""
    from hash_db_spark.functions.profiling import profile_columns

    docs = load_table(spark, sf_dir, "documents")
    return profile_columns(docs, ["lang", "source", "n_chars"])


def _profile_oracle() -> str:
    from hash_db_spark.functions.profiling import sql_profile_columns

    return sql_profile_columns("documents", ["lang", "source", "n_chars"])


QUANTILE_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def q_profile_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of the lineitem measures, one
    aggregation pass for all column x prob combinations."""
    from hash_db_spark.functions.profiling import profile_quantiles

    return profile_quantiles(
        load_table(spark, sf_dir, "lineitem"), QUANTILE_COLS
    )


def _quantile_oracle() -> str:
    from hash_db_spark.functions.profiling import sql_profile_quantiles

    return sql_profile_quantiles("lineitem", QUANTILE_COLS)


HISTO_PROBS = (0.25, 0.5, 0.9, 0.99)
HISTO_LO, HISTO_HI = 0.0, 600000.0


def q_histo_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable binned-histogram quantile estimates of o_totalprice —
    the bounded-memory scale path beside exact profile_quantiles."""
    from hash_db_spark.functions.profiling import (
        binned_histogram,
        histogram_quantiles,
    )

    orders = load_table(spark, sf_dir, "orders")
    hist = binned_histogram(orders, "o_totalprice", HISTO_LO, HISTO_HI)
    return histogram_quantiles(hist, HISTO_PROBS, HISTO_LO, HISTO_HI)


def _histo_oracle() -> str:
    from hash_db_spark.functions.profiling import sql_histogram_quantiles

    return sql_histogram_quantiles(
        "orders", "o_totalprice", HISTO_PROBS, HISTO_LO, HISTO_HI
    )


DOCLEN_LO, DOCLEN_HI, DOCLEN_BINS = 0.0, 800.0, 32


def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution as the mergeable binned sketch —
    the corpus-card length chart, 32 count rows per shard regardless of
    corpus size."""
    from hash_db_spark.functions.profiling import binned_histogram

    docs = load_table(spark, sf_dir, "documents")
    return binned_histogram(
        docs, "n_chars", DOCLEN_LO, DOCLEN_HI, bins=DOCLEN_BINS
    )


def _doclen_oracle() -> str:
    from hash_db_spark.functions.profiling import sql_binned_histogram

    return sql_binned_histogram(
        "documents", "n_chars", DOCLEN_LO, DOCLEN_HI, bins=DOCLEN_BINS
    )


QUERIES = {
    "doc_length_histogram": Query(
        q_doc_length_histogram, _doclen_oracle()
    ),
    "profile_columns": Query(q_profile_columns, _profile_oracle()),
    "profile_quantiles": Query(q_profile_quantiles, _quantile_oracle()),
    "histo_quantiles": Query(q_histo_quantiles, _histo_oracle()),
    "hash_sample": Query(
        q_hash_sample,
        f"SELECT doc_id, lang FROM documents "
        f"WHERE {SM.sql_bucket('doc_id')} < {int(0.25 * SM.BUCKETS)}",
    ),
    "training_order": Query(
        q_training_order,
        SM.sql_training_order("documents", "doc_id", "doc_id"),
    ),
    "train_val_test": Query(
        q_train_val_test,
        f"SELECT {SM.sql_train_val_test('doc_id', 0.1, 0.05)} AS split, "
        f"count(*) AS n FROM documents GROUP BY 1",
    ),
    "stratified_sample": Query(q_stratified_sample, STRATIFIED_ORACLE),
    "split_leakage_audit": Query(
        q_split_leakage_audit, _split_leakage_oracle()
    ),
    "mix_weights": Query(q_mix_weights, MIX_ORACLE),
    "pivot_counts": Query(q_pivot, PIVOT_ORACLE),
    "unpivot_measures": Query(q_unpivot_measures, UNPIVOT_ORACLE),
    "grouped_quantiles": Query(q_grouped_quantiles, GROUPED_QUANTILES_ORACLE),
    "grouping_sets": Query(q_grouping_sets, GROUPING_SETS_SQL),
    "gap_fill": Query(q_gap_fill, GAP_FILL_ORACLE),
}


def q_kfold_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified k-fold audit: content-addressed fold assignment plus
    the per-(lang, fold) census with each fold's within-stratum share —
    the eval-protocol artifact that catches a pathological key
    distribution before a cross-validation run trusts it
    (operators/sampling.py:kfold_assign)."""
    docs = SM.kfold_assign(
        load_table(spark, sf_dir, "documents"), "doc_id", k=5
    )
    cnt = docs.groupBy("lang", "fold").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_lang"))
    return cnt.join(tot, "lang").select(
        "lang",
        "fold",
        "n_docs",
        F.round(F.col("n_docs") / F.col("n_lang"), 6).alias("share"),
    )


def _kfold_balance_oracle() -> str:
    fold = SM.sql_kfold_assign("doc_id", k=5)
    return f"""
WITH assigned AS (SELECT lang, {fold} AS fold FROM documents),
cnt AS (
  SELECT lang, fold, count(*) AS n_docs FROM assigned GROUP BY lang, fold
),
tot AS (SELECT lang, count(*) AS n_lang FROM assigned GROUP BY lang)
SELECT c.lang, c.fold, c.n_docs,
       round(CAST(c.n_docs AS DOUBLE) / t.n_lang, 6) AS share
FROM cnt c JOIN tot t ON t.lang = c.lang
"""


# r13 QUEUE CANDIDATE (session 9; the r12 queue is closed):
#   "kfold_balance": Query(q_kfold_balance, _kfold_balance_oracle()),
