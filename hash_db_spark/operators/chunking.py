"""Token-window chunking — split documents into fixed-size training
examples with overlap.

No reference counterpart (the reference returns whole stored values);
this is the step between a cleaned corpus and a training run: each
document becomes ceil(len/stride) examples of at most ``size`` tokens,
consecutive chunks sharing ``overlap`` tokens of context.

Plan shape: tokenize + per-row explode — entirely map-side (no shuffle,
no UDF, whole-stage codegen except the array lambdas), so it scales
linearly and composes with any downstream repartition-by-size. Output
cardinality is rows x ceil(tokens/stride), known up front.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from hash_db_spark.operators.dedup import clean_tokens, sql_clean_tokens


def token_chunks(
    df: DataFrame,
    col: str,
    id_col: str,
    size: int = 16,
    overlap: int = 4,
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk_text): ``size``-token windows every
    ``size - overlap`` tokens; the final chunk may be shorter (it is never
    empty — starts never exceed the token count). Documents with no
    tokens produce no chunks."""
    if not 0 <= overlap < size:
        raise ValueError("require 0 <= overlap < size")
    stride = size - overlap
    base = df.select(
        F.col(id_col).alias("id"), clean_tokens(col).alias("toks")
    ).filter(F.size("toks") > 0)
    chunks = F.transform(
        F.sequence(F.lit(1), F.size("toks"), F.lit(stride)),
        lambda s: F.slice("toks", s, size),
    )
    return (
        base.select("id", F.posexplode(chunks).alias("chunk_idx", "ctoks"))
        .select(
            "id",
            "chunk_idx",
            F.size("ctoks").alias("n_tokens"),
            F.array_join("ctoks", " ").alias("chunk_text"),
        )
    )


def sql_token_chunks(
    table: str,
    col: str,
    id_col: str,
    size: int = 16,
    overlap: int = 4,
) -> str:
    stride = size - overlap
    return f"""
WITH toks AS (
  SELECT {id_col} AS id, {sql_clean_tokens(col)} AS t FROM {table}
),
starts AS (
  SELECT id, t,
         unnest(generate_series(1, CAST(len(t) AS BIGINT), {stride})) AS s
  FROM toks WHERE len(t) > 0
)
SELECT id,
       CAST((s - 1) / {stride} AS INT) AS chunk_idx,
       CAST(len(list_slice(t, s, s + {size} - 1)) AS INT) AS n_tokens,
       list_aggregate(list_slice(t, s, s + {size} - 1), 'string_agg', ' ')
         AS chunk_text
FROM starts
"""
