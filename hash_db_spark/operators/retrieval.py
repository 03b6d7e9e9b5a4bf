"""Chunk-level retrieval over hashed embeddings — the RAG serving
shape: chunk the corpus, embed each chunk, score a query against every
chunk vector, return the top-k chunks.

The embedder is the feature-hashing trick (Weinberger et al., "Feature
Hashing for Large Scale Multitask Learning", ICML 2009; public): each
token hashes to one of ``dims`` buckets with a +/-1 sign, a chunk's
vector is the signed bucket-count histogram. Deterministic,
vocabulary-free (no training pass, no dictionary to ship), and exactly
reproducible in SQL — which is the point here: the retrieval pipeline
is driver-checkable end to end, and a trained encoder drops in later
as data (swap the hashed vectors for an embeddings column; the scoring
half — ``similarity.py`` — doesn't care where vectors came from).

Reference parity: the reference has no retrieval surface at all (its
closest is boolean FTS, /root/reference/server.py:729-739); this
composes the chunking + hashing + top-k capabilities into the serving
query an LLM data stack runs millions of times a day.

Determinism: bucket/sign from the house md5-hex idiom
(``curation.sample_u``), so Spark, DuckDB, and the driver-side query
hashing agree byte-for-byte; dots and norms are exact int64 (signed
counts); the one float division is IEEE-identical.

Scale shape: ONE corpus-side shuffle builds the sparse chunk vectors
(groupBy chunk x dim); the query vector is a driver-computed literal
array (bounded by ``dims``), so scoring is a codegen projection — no
join against anything query-sized — and the top-k compiles to
TakeOrderedAndProject (per-partition heaps, driver merge), not a
global sort. At 100 TB the chunk-vector frame is the only big thing,
and it's the thing you'd persist once and probe per query.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

RETR_DIMS = 64  # hashed-embedding buckets


def _tok_dim(t: Column, dims: int) -> Column:
    return (
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % dims
    )


def _tok_sign(t: Column) -> Column:
    return F.when(
        F.conv(F.substring(F.md5(t), 9, 1), 16, 10).cast("long") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))


def _sql_tok_dim(t: str, dims: int) -> str:
    return f"(('0x' || substr(md5({t}), 1, 8))::BIGINT % {dims})"


def _sql_tok_sign(t: str) -> str:
    return (
        f"(CASE WHEN ('0x' || substr(md5({t}), 9, 1))::BIGINT % 2 = 0"
        f" THEN 1 ELSE -1 END)"
    )


def _hash_query(terms: list[str], dims: int) -> dict[int, int]:
    """Driver-side twin of the in-plan hashing (md5 of utf-8, first 8
    nibbles -> bucket, 9th nibble parity -> sign)."""
    qv: dict[int, int] = {}
    for tok in terms:
        h = hashlib.md5(tok.encode("utf-8")).hexdigest()
        dim = int(h[:8], 16) % dims
        sign = 1 if int(h[8], 16) % 2 == 0 else -1
        qv[dim] = qv.get(dim, 0) + sign
    return qv


def hashed_chunk_vectors(
    df: DataFrame,
    col: str,
    id_col: str,
    size: int = 16,
    overlap: int = 0,
    dims: int = RETR_DIMS,
) -> DataFrame:
    """(id, chunk_idx, dim, val): sparse signed-count chunk vectors.
    One groupBy shuffle; chunk_text is already clean space-joined
    tokens, so the re-split is exact."""
    from hash_db_spark.operators.chunking import token_chunks

    ch = token_chunks(df, col, id_col, size=size, overlap=overlap)
    tok = ch.select(
        "id",
        "chunk_idx",
        F.explode(F.split("chunk_text", " ")).alias("tok"),
    )
    return (
        tok.select(
            "id",
            "chunk_idx",
            _tok_dim(F.col("tok"), dims).alias("dim"),
            _tok_sign(F.col("tok")).alias("sign"),
        )
        .groupBy("id", "chunk_idx", "dim")
        .agg(F.sum("sign").alias("val"))
    )


def retrieve_chunks(
    df: DataFrame,
    col: str,
    id_col: str,
    terms: list[str],
    k: int = 10,
    size: int = 16,
    overlap: int = 0,
    dims: int = RETR_DIMS,
) -> DataFrame:
    """(id, chunk_idx, cos, rank): top-k chunks by hashed-embedding
    cosine against the bag-of-terms query. Ties: id ASC, chunk_idx
    ASC. Zero-norm chunks (all buckets cancelled) are unscorable and
    excluded."""
    from pyspark.sql import Window

    qv = _hash_query(terms, dims)
    qn2 = sum(v * v for v in qv.values())
    if qn2 == 0:
        raise ValueError("query hashes to the zero vector")
    qarr = F.array(
        *[F.lit(int(qv.get(d, 0))).cast("long") for d in range(dims)]
    )
    cv = hashed_chunk_vectors(df, col, id_col, size, overlap, dims)
    scored = (
        cv.withColumn(
            "contrib", F.col("val") * F.element_at(qarr, F.col("dim").cast("int") + 1)
        )
        .groupBy("id", "chunk_idx")
        .agg(
            F.sum("contrib").alias("dot"),
            F.sum(F.col("val") * F.col("val")).alias("n2"),
        )
        .filter(F.col("n2") > 0)
        .select(
            "id",
            "chunk_idx",
            F.round(
                F.col("dot")
                / (F.sqrt(F.col("n2")) * F.lit(float(qn2) ** 0.5)),
                6,
            ).alias("cos"),
        )
    )
    top = scored.orderBy(
        F.col("cos").desc(), F.col("id").asc(), F.col("chunk_idx").asc()
    ).limit(k)
    w = Window.orderBy(
        F.col("cos").desc(), F.col("id").asc(), F.col("chunk_idx").asc()
    )
    # rank over <= k rows: the window's single partition holds only the
    # TakeOrderedAndProject output, not the corpus
    return top.withColumn("rank", F.row_number().over(w))


def sql_retrieve_chunks(
    table: str,
    col: str,
    id_col: str,
    terms: list[str],
    k: int = 10,
    size: int = 16,
    overlap: int = 0,
    dims: int = RETR_DIMS,
) -> str:
    """DuckDB oracle: identical chunking, hashing, exact-int dot/norm,
    and tie-break."""
    from hash_db_spark.operators.chunking import sql_token_chunks

    qv = _hash_query(terms, dims)
    qn2 = sum(v * v for v in qv.values())
    qlist = ", ".join(str(int(qv.get(d, 0))) for d in range(dims))
    chunks = sql_token_chunks(table, col, id_col, size, overlap)
    return f"""
WITH ch AS ({chunks}),
tok AS (
  SELECT id, chunk_idx, unnest(string_split(chunk_text, ' ')) AS t
  FROM ch
),
cv AS (
  SELECT id, chunk_idx, {_sql_tok_dim('t', dims)} AS dim,
         CAST(sum({_sql_tok_sign('t')}) AS BIGINT) AS val
  FROM tok GROUP BY id, chunk_idx, {_sql_tok_dim('t', dims)}
),
scored AS (
  SELECT id, chunk_idx,
         CAST(sum(val * list_extract([{qlist}], CAST(dim AS INT) + 1))
              AS BIGINT) AS dot,
         CAST(sum(val * val) AS BIGINT) AS n2
  FROM cv GROUP BY id, chunk_idx
)
SELECT id, chunk_idx,
       round(CAST(dot AS DOUBLE) / (sqrt(CAST(n2 AS DOUBLE))
             * sqrt({float(qn2)!r})), 6) AS cos,
       CAST(row_number() OVER (
         ORDER BY round(CAST(dot AS DOUBLE) / (sqrt(CAST(n2 AS DOUBLE))
                        * sqrt({float(qn2)!r})), 6) DESC,
                  id ASC, chunk_idx ASC
       ) AS INT) AS rank
FROM scored
WHERE n2 > 0
QUALIFY rank <= {k}
"""
