"""Driver-checkable queries: the UDF/UDAF/grouped-map surface
(SURVEY §2.7 — the reference parses generic func(args) syntax but only
ever interprets count(*); this engine exposes Spark's full Python UDF
stack, Arrow-batched so the boundary cost is per-batch not per-row).

Each flavor is demonstrated with an oracle-expressible function so the
hash gate still applies:

- scalar pandas_udf      : vectorized tanh transform
- grouped-agg pandas_udf : weighted mean per group
- grouped-map applyInPandas: per-group mean-centering (window-expressible)
- SQL-registered UDF     : spark.udf.register + spark.sql
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.functions import pandas_udf

from hash_db_spark.catalog import load_table, register_views
from hash_db_spark.queries import Query


from hash_db_spark.functions.rounding import round_half_away as _round_half_away


def q_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Defined inside the call: pandas_udf resolves its DDL return type
    # against the active session, so module-level decoration would break
    # import before a session exists.
    @pandas_udf("double")
    def sigmoid_scaled(v: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(_round_half_away(1.0 / (1.0 + np.exp(-v / 50.0)), 6))

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select("event_id", sigmoid_scaled(F.col("value")).alias("t"))


def q_udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF: value weighted by (user_id+1)."""

    @pandas_udf("double")
    def weighted_mean(v: pd.Series, w: pd.Series) -> float:
        return float((v * w).sum() / w.sum())

    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("w", (F.col("user_id") + 1).cast("double"))
    return (
        ev.groupBy("event_type")
        .agg(F.round(weighted_mean("value", "w"), 4).alias("wmean"))
    )


def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped map: center each user's values on their own
    mean (the custom-stateful-operator shape; oracle via window AVG)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.copy()
        # Round the mean before subtracting (pandas accumulates pairwise,
        # SQL engines sequentially — ~1e-13 mean deltas land on rounding
        # boundaries), and round half-away like SQL (pandas' banker's
        # rounding flips exact .xxxx5 values the other way).
        mean = _round_half_away(pdf["value"].mean(), 6)
        pdf["centered"] = _round_half_away(pdf["value"] - mean, 4)
        return pdf[["event_id", "user_id", "centered"]]

    return ev.groupBy("user_id").applyInPandas(
        center, "event_id long, user_id long, centered double"
    )


def q_udf_sql_registered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDF registered into the SQL surface (row-at-a-time — the
    slow path, demonstrated deliberately on a tiny projection; every hot
    path in this engine uses built-ins or Arrow batches instead)."""
    register_views(spark, sf_dir)
    spark.udf.register(
        "py_bucket3", lambda x: "abc"[int(x) % 3], "string"
    )
    return spark.sql(
        "SELECT event_id, py_bucket3(event_id) AS b FROM events "
        "WHERE event_id < 500"
    )


def q_udf_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, SURVEY §2.7 completion): one input
    row → many output rows with per-row state, used LATERALly per
    document. Emits (pos, tok, is_stop) per token — the row-generating
    flavor the scalar/agg/map UDFs can't express."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string, is_stop boolean")
    class Tokenize:
        def eval(self, text: str):
            stops = {"a", "the", "and", "or"}
            toks = [
                x for x in (text or "").replace(",", "").split(" ") if x
            ]
            for i, t in enumerate(toks):
                yield i, t, t in stops

    spark.udtf.register("tokenize_udtf", Tokenize)
    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.tok, t.is_stop "
        "FROM documents d, LATERAL tokenize_udtf(d.text) t "
        "WHERE d.doc_id < 50"
    )


UDTF_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(replace(text, ',', ''), ' '),
                            x -> x != '')) AS tok,
         generate_subscripts(list_filter(string_split(replace(text, ',', ''), ' '),
                                         x -> x != ''), 1) AS ord
  FROM documents WHERE doc_id < 50
)
SELECT doc_id, CAST(ord - 1 AS INT) AS pos, tok,
       tok IN ('a', 'the', 'and', 'or') AS is_stop
FROM toks
"""


QUERIES = {
    "udf_python_udtf": Query(q_udf_python_udtf, UDTF_ORACLE),
    "udf_pandas_scalar": Query(
        q_udf_pandas_scalar,
        "SELECT event_id, round(1.0 / (1.0 + exp(-value / 50.0)), 6) AS t "
        "FROM events WHERE event_id < 2000",
    ),
    "udf_grouped_agg": Query(
        q_udf_grouped_agg,
        "SELECT event_type, "
        "round(sum(value * (user_id + 1)) / sum(user_id + 1), 4) AS wmean "
        "FROM events GROUP BY event_type",
    ),
    "udf_grouped_map": Query(
        q_udf_grouped_map,
        "SELECT event_id, user_id, "
        "round(value - round(avg(value) OVER (PARTITION BY user_id), 6), 4) "
        "AS centered FROM events",
    ),
    "udf_sql_registered": Query(
        q_udf_sql_registered,
        "SELECT event_id, substr('abc', CAST(event_id % 3 AS INT) + 1, 1) AS b "
        "FROM events WHERE event_id < 500",
    ),
}
