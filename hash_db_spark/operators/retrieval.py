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

from hash_db_spark.localframe import local_frame

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


# --- TextTiling-style topic segmentation -------------------------------------

TILE_WIN = 20  # window tokens
TILE_T = 0.15  # boundary threshold on consecutive-window cosine


def text_tiling_segments(
    df: DataFrame,
    col: str,
    id_col: str,
    win: int = TILE_WIN,
    threshold: float = TILE_T,
    dims: int = RETR_DIMS,
) -> DataFrame:
    """(doc_id, seg, start_idx, end_idx, n_chunks): topic segments by
    the TextTiling principle (Hearst, CL 1997; public) — cut where the
    cosine between CONSECUTIVE token windows' term vectors dips below
    ``threshold`` (vocabulary shift = topic shift). The term vectors
    are the same hashed embeddings retrieval uses, so similarity is
    exact-int dot / IEEE norms and the oracle matches bit-for-bit.

    Complements doc_lang_segments (which cuts on language flips): this
    cuts on CONTENT flips within a language — the pre-chunking pass
    that keeps one training chunk from straddling two topics.

    Scale shape: one groupBy builds window vectors, one (id, dim)
    equi-join scores consecutive pairs (per-key fan-out bounded: a key
    is one document's one hash bucket), one per-doc window for the
    cumulative segment ids. Nothing corpus-sized is collected or
    broadcast."""
    from pyspark.sql import Window

    from hash_db_spark.operators.chunking import token_chunks

    ch = token_chunks(df, col, id_col, size=win, overlap=0)
    tok = ch.select(
        "id",
        "chunk_idx",
        F.explode(F.split("chunk_text", " ")).alias("tok"),
    )
    cv = (
        tok.select(
            "id",
            "chunk_idx",
            _tok_dim(F.col("tok"), dims).alias("dim"),
            _tok_sign(F.col("tok")).alias("sign"),
        )
        .groupBy("id", "chunk_idx", "dim")
        .agg(F.sum("sign").alias("val"))
    ).localCheckpoint(eager=True)  # feeds norms + both join sides
    n2 = cv.groupBy("id", "chunk_idx").agg(
        F.sum(F.col("val") * F.col("val")).alias("n2")
    )
    a = cv.select("id", F.col("chunk_idx").alias("ci"), "dim",
                  F.col("val").alias("va"))
    b = cv.select("id", (F.col("chunk_idx") - 1).alias("ci"), "dim",
                  F.col("val").alias("vb"))
    dots = (
        a.join(b, ["id", "ci", "dim"])
        .groupBy("id", "ci")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    spine = (
        ch.select("id", F.col("chunk_idx").alias("ci"))
        .join(
            ch.select("id", (F.col("chunk_idx") - 1).alias("ci")),
            ["id", "ci"],
            "inner",
        )  # chunks with a successor
        .join(dots, ["id", "ci"], "left")
        .join(
            n2.select("id", F.col("chunk_idx").alias("ci"),
                      F.col("n2").alias("n2a")),
            ["id", "ci"],
        )
        .join(
            n2.select("id", (F.col("chunk_idx") - 1).alias("ci"),
                      F.col("n2").alias("n2b")),
            ["id", "ci"],
        )
        .select(
            "id",
            "ci",
            F.round(
                F.coalesce(F.col("dot"), F.lit(0)).cast("double")
                / (F.sqrt("n2a") * F.sqrt("n2b")),
                6,
            ).alias("cos"),
        )
    )
    # boundary BEFORE chunk ci+1 when cos(ci, ci+1) < threshold
    bnd = spine.select(
        "id",
        (F.col("ci") + 1).alias("chunk_idx"),
        F.when(F.col("cos") < threshold, 1).otherwise(0).alias("is_b"),
    )
    w = Window.partitionBy("id").orderBy("chunk_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    segged = (
        ch.select("id", "chunk_idx")
        .join(bnd, ["id", "chunk_idx"], "left")
        .withColumn(
            "seg", F.sum(F.coalesce(F.col("is_b"), F.lit(0))).over(w)
        )
    )
    return (
        segged.groupBy("id", "seg")
        .agg(
            F.min("chunk_idx").alias("start_idx"),
            F.max("chunk_idx").alias("end_idx"),
            F.count(F.lit(1)).alias("n_chunks"),
        )
        .select(
            F.col("id").alias("doc_id"),
            F.col("seg").cast("long").alias("seg"),
            "start_idx",
            "end_idx",
            "n_chunks",
        )
    )


def sql_text_tiling_segments(
    table: str,
    col: str,
    id_col: str,
    win: int = TILE_WIN,
    threshold: float = TILE_T,
    dims: int = RETR_DIMS,
) -> str:
    """DuckDB oracle: identical chunking, hashing, exact-int dot/norm,
    rounding, and cumulative segmentation."""
    from hash_db_spark.operators.chunking import sql_token_chunks

    chunks = sql_token_chunks(table, col, id_col, win, 0)
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
n2 AS (
  SELECT id, chunk_idx, CAST(sum(val * val) AS BIGINT) AS n2
  FROM cv GROUP BY id, chunk_idx
),
dots AS (
  SELECT a.id, a.chunk_idx AS ci,
         CAST(sum(a.val * b.val) AS BIGINT) AS dot
  FROM cv a JOIN cv b
    ON b.id = a.id AND b.chunk_idx = a.chunk_idx + 1
   AND b.dim = a.dim
  GROUP BY a.id, a.chunk_idx
),
spine AS (
  SELECT c1.id, c1.chunk_idx AS ci,
         round(CAST(coalesce(d.dot, 0) AS DOUBLE)
               / (sqrt(CAST(na.n2 AS DOUBLE))
                  * sqrt(CAST(nb.n2 AS DOUBLE))), 6) AS cos
  FROM ch c1
  JOIN ch c2 ON c2.id = c1.id AND c2.chunk_idx = c1.chunk_idx + 1
  LEFT JOIN dots d ON d.id = c1.id AND d.ci = c1.chunk_idx
  JOIN n2 na ON na.id = c1.id AND na.chunk_idx = c1.chunk_idx
  JOIN n2 nb ON nb.id = c1.id AND nb.chunk_idx = c1.chunk_idx + 1
),
bnd AS (
  SELECT id, ci + 1 AS chunk_idx,
         CASE WHEN cos < {threshold} THEN 1 ELSE 0 END AS is_b
  FROM spine
),
segged AS (
  SELECT c.id, c.chunk_idx,
         sum(coalesce(b.is_b, 0)) OVER (
           PARTITION BY c.id ORDER BY c.chunk_idx
           ROWS UNBOUNDED PRECEDING
         ) AS seg
  FROM ch c LEFT JOIN bnd b
    ON b.id = c.id AND b.chunk_idx = c.chunk_idx
)
SELECT id AS doc_id, CAST(seg AS BIGINT) AS seg,
       min(chunk_idx) AS start_idx, max(chunk_idx) AS end_idx,
       count(*) AS n_chunks
FROM segged GROUP BY id, seg
"""


# --- MMR: diversity-aware top-k ----------------------------------------------

# lambda = 0.7 scaled to exact integers: score = 7*rel - 3*max_sim.
MMR_W_REL = 7
MMR_W_DIV = 3
MMR_POOL = 12


def mmr_rerank(
    df: DataFrame,
    col: str,
    id_col: str,
    terms: list[str],
    k: int = 5,
    pool_n: int = MMR_POOL,
    size: int = 16,
    overlap: int = 0,
    dims: int = RETR_DIMS,
) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR 1998 —
    public) over the hashed-chunk retrieval pool: greedy top-k where
    each pick maximizes ``W_REL*rel(c) - W_DIV*max_{s in S} sim(c, s)``
    — relevance traded against redundancy with what's already picked,
    the reranker RAG stacks run so five near-identical chunks don't
    fill the whole context window.

    Exactness: relevance is the raw query dot (inner-product retrieval)
    and pairwise similarity the raw chunk-chunk dot — both int64 on the
    signed-count hashed vectors, and lambda=0.7 is carried as the
    integer weights 7/3, so every argmax is exact on BOTH engines (no
    float tie can flip a pick). Ties break on (id, chunk_idx).

    Scale shape: the only corpus-sized work is the relevance scan
    (one groupBy builds chunk vectors, scoring is a codegen projection,
    pool selection is TakeOrderedAndProject). Everything after — the
    pool's pairwise dots and the k greedy steps — runs on the BOUNDED
    ``pool_n``-row pool (<= pool_n^2 pair rows), entirely in-plan: no
    collect, k unrolled limit-1 selections exactly mirroring the
    oracle's CTE chain.
    """
    qv = _hash_query(terms, dims)
    if not any(qv.values()):
        raise ValueError("query hashes to the zero vector")
    qarr = F.array(
        *[F.lit(int(qv.get(d, 0))).cast("long") for d in range(dims)]
    )
    cv = hashed_chunk_vectors(df, col, id_col, size, overlap, dims)
    rel = (
        cv.withColumn(
            "contrib",
            F.col("val") * F.element_at(qarr, F.col("dim").cast("int") + 1),
        )
        .groupBy("id", "chunk_idx")
        .agg(F.sum("contrib").cast("long").alias("rel"))
    )
    pool = (
        rel.orderBy(F.col("rel").desc(), "id", "chunk_idx")
        .limit(pool_n)
        .localCheckpoint(eager=True)
    )
    # Pairwise dots need vectors ONLY for the <= pool_n pooled chunks —
    # re-deriving them from the FULL corpus and joining down afterwards
    # re-ran the per-token hashing pass over every document (guide §8:
    # decide on the small relation, recompute the heavy one only for
    # survivors; optimization r12). The semi-join prunes the corpus to
    # pool docs BEFORE the second hashing pass; chunking is per-doc, so
    # the restricted pass produces identical (id, chunk_idx, dim, val).
    pool_ids = pool.select("id").distinct().withColumnRenamed("id", id_col)
    sub = df.join(F.broadcast(pool_ids), id_col, "left_semi")
    pv = hashed_chunk_vectors(sub, col, id_col, size, overlap, dims).join(
        pool.select("id", "chunk_idx"), ["id", "chunk_idx"]
    )
    a = pv.select(
        F.col("id").alias("a_id"),
        F.col("chunk_idx").alias("a_ch"),
        "dim",
        F.col("val").alias("a_val"),
    )
    b = pv.select(
        F.col("id").alias("b_id"),
        F.col("chunk_idx").alias("b_ch"),
        "dim",
        F.col("val").alias("b_val"),
    )
    pairs = (
        a.join(b, "dim")
        .filter(
            (F.col("a_id") != F.col("b_id"))
            | (F.col("a_ch") != F.col("b_ch"))
        )
        .groupBy("a_id", "a_ch", "b_id", "b_ch")
        .agg(F.sum(F.col("a_val") * F.col("b_val")).cast("long").alias("dot"))
    )
    # Greedy selection on the DRIVER (optimization r12): the pool is
    # bounded at pool_n rows and pairs at pool_n^2 BY CONSTRUCTION at
    # any corpus scale, and every quantity is an exact int64 (rel, dot,
    # integer 7/3 weights), so the Python loop is bit-identical to the
    # previous k unrolled limit-1 plans — which cost k eager checkpoint
    # jobs plus two more for pool vectors and pairs.
    pool_rows = pool.collect()
    pair_rows = pairs.collect()
    dots: dict = {}
    for r in pair_rows:
        dots[((r.a_id, r.a_ch), (r.b_id, r.b_ch))] = r.dot
    rem = {(r.id, r.chunk_idx): r.rel for r in pool_rows}
    sel: list = []
    out: list = []
    for i in range(1, k + 1):
        if not rem:
            break
        best_key = None
        best_score = None
        for key in sorted(rem):  # tie-break: (id, chunk_idx) ascending
            rel_v = rem[key]
            if sel:
                pens = [
                    dots[(key, s)] for s in sel if (key, s) in dots
                ]
                pen = max(pens) if pens else 0
                score = MMR_W_REL * rel_v - MMR_W_DIV * pen
            else:
                score = MMR_W_REL * rel_v
            if best_score is None or score > best_score:
                best_score, best_key = score, key
        sel.append(best_key)
        out.append((i, best_key[0], best_key[1], rem.pop(best_key)))
    dt = dict(pool.dtypes)
    return local_frame(
        df.sparkSession,
        out,
        f"sel_rank int, id {dt['id']}, chunk_idx {dt['chunk_idx']}, "
        f"rel {dt['rel']}",
    )


def sql_mmr_rerank(
    table: str,
    col: str,
    id_col: str,
    terms: list[str],
    k: int = 5,
    pool_n: int = MMR_POOL,
    size: int = 16,
    overlap: int = 0,
    dims: int = RETR_DIMS,
) -> str:
    """DuckDB twin: identical hashing/pool/pairs, then the greedy
    selection unrolled as k limit-1 CTEs — same integer arithmetic,
    same tie-break."""
    from hash_db_spark.operators.chunking import sql_token_chunks

    qv = _hash_query(terms, dims)
    qlist = ", ".join(str(int(qv.get(d, 0))) for d in range(dims))
    chunks = sql_token_chunks(table, col, id_col, size, overlap)
    parts = [
        f"ch AS ({chunks})",
        "tok AS (SELECT id, chunk_idx,"
        " unnest(string_split(chunk_text, ' ')) AS t FROM ch)",
        f"""cv AS (
  SELECT id, chunk_idx, {_sql_tok_dim('t', dims)} AS dim,
         CAST(sum({_sql_tok_sign('t')}) AS BIGINT) AS val
  FROM tok GROUP BY id, chunk_idx, {_sql_tok_dim('t', dims)}
)""",
        f"""rel AS (
  SELECT id, chunk_idx,
         CAST(sum(val * list_extract([{qlist}], CAST(dim AS INT) + 1))
              AS BIGINT) AS rel
  FROM cv GROUP BY id, chunk_idx
)""",
        f"pool AS (SELECT * FROM rel"
        f" ORDER BY rel DESC, id, chunk_idx LIMIT {pool_n})",
        "pv AS (SELECT cv.* FROM cv JOIN pool USING (id, chunk_idx))",
        """pairs AS (
  SELECT a.id AS a_id, a.chunk_idx AS a_ch,
         b.id AS b_id, b.chunk_idx AS b_ch,
         CAST(sum(a.val * b.val) AS BIGINT) AS dot
  FROM pv a JOIN pv b
    ON a.dim = b.dim AND (a.id <> b.id OR a.chunk_idx <> b.chunk_idx)
  GROUP BY 1, 2, 3, 4
)""",
        f"""s1 AS (
  SELECT id, chunk_idx, rel, 1::INT AS sel_rank FROM pool
  ORDER BY {MMR_W_REL} * rel DESC, id, chunk_idx LIMIT 1
)""",
        "sel1 AS (SELECT * FROM s1)",
    ]
    for i in range(2, k + 1):
        parts.append(
            f"""s{i} AS (
  SELECT p.id, p.chunk_idx, p.rel, {i}::INT AS sel_rank
  FROM pool p
  LEFT JOIN (
    SELECT pr.a_id, pr.a_ch, max(pr.dot) AS m
    FROM pairs pr
    JOIN sel{i - 1} s ON pr.b_id = s.id AND pr.b_ch = s.chunk_idx
    GROUP BY pr.a_id, pr.a_ch
  ) mx ON mx.a_id = p.id AND mx.a_ch = p.chunk_idx
  WHERE NOT EXISTS (
    SELECT 1 FROM sel{i - 1} s
    WHERE s.id = p.id AND s.chunk_idx = p.chunk_idx
  )
  ORDER BY {MMR_W_REL} * p.rel - {MMR_W_DIV} * COALESCE(mx.m, 0) DESC,
           p.id, p.chunk_idx
  LIMIT 1
)"""
        )
        parts.append(
            f"sel{i} AS (SELECT * FROM sel{i - 1} UNION ALL SELECT * FROM s{i})"
        )
    ctes = ",\n".join(parts)
    return (
        f"WITH {ctes}\n"
        f"SELECT sel_rank, id, chunk_idx, rel FROM sel{k}"
    )


# --- hybrid lexical+semantic retrieval via reciprocal rank fusion -------------

RRF_K = 60  # the standard fusion constant (Cormack et al. 2009)
RRF_DOC_CHUNK = 1 << 20  # chunk size >> any doc => one whole-doc vector


def hybrid_rrf(
    df: DataFrame,
    col: str,
    id_col: str,
    terms: list[str],
    topn: int = 10,
    per_ranker: int = 15,
) -> DataFrame:
    """(doc_id, lex_rank, sem_rank, rrf_micro, rank): reciprocal rank
    fusion (Cormack, Clarke & Buettcher, SIGIR 2009) of the two house
    rankers over the same bag-of-terms query —

        lexical : Okapi BM25 (``ranking.bm25_rank``)
        semantic: hashed-embedding cosine over whole-doc vectors
                  (``retrieve_chunks`` with a doc-sized chunk)

    fused as score(d) = sum_r 1/(RRF_K + rank_r(d)), each reciprocal
    quantized to integer micro-units BEFORE the sum (the DSIR
    discipline: integer sums are associative, so the fused key is
    engine-exact; doubles never aggregate). Docs ranked by only one
    ranker contribute the present term alone.

    Scale shape: each ranker ends in its own TakeOrderedAndProject, so
    the fusion inputs are <= per_ranker rows each — the outer join and
    final rank window run on driver-scale data no matter the corpus
    size. Cost is one BM25 posting shuffle + one chunk-vector shuffle.
    """
    from pyspark.sql import Window

    from hash_db_spark.operators.curation import micro_col
    from hash_db_spark.operators.ranking import bm25_rank

    lex_w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    lex = (
        bm25_rank(df, col, id_col, terms, topn=per_ranker)
        # rank over <= per_ranker rows: the window's single partition
        # holds only the TakeOrderedAndProject output, not the corpus
        .withColumn("lex_rank", F.row_number().over(lex_w))
        .select("id", "lex_rank")
    )
    sem = retrieve_chunks(
        df, col, id_col, terms, k=per_ranker, size=RRF_DOC_CHUNK
    ).select("id", F.col("rank").alias("sem_rank"))

    def recip(rank_col: str) -> Column:
        return F.coalesce(
            micro_col(F.lit(1.0) / (F.lit(RRF_K) + F.col(rank_col))),
            F.lit(0).cast("long"),
        )

    fused = (
        lex.join(sem, "id", "full_outer")
        .select(
            F.col("id").alias("doc_id"),
            "lex_rank",
            "sem_rank",
            (recip("lex_rank") + recip("sem_rank")).alias("rrf_micro"),
        )
    )
    w = Window.orderBy(F.col("rrf_micro").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topn)
        .orderBy("rank")
    )


def sql_hybrid_rrf(
    table: str,
    col: str,
    id_col: str,
    terms: list[str],
    topn: int = 10,
    per_ranker: int = 15,
) -> str:
    """Oracle twin of hybrid_rrf: same rankers, same quantization
    point, same tie-breaks."""
    from hash_db_spark.operators.curation import sql_micro
    from hash_db_spark.operators.ranking import sql_bm25_rank

    bm25 = sql_bm25_rank(table, col, id_col, terms, topn=per_ranker)
    sem = sql_retrieve_chunks(
        table, col, id_col, terms, k=per_ranker, size=RRF_DOC_CHUNK
    )
    lex_r = sql_micro(f"1.0 / ({RRF_K} + lex_rank)")
    sem_r = sql_micro(f"1.0 / ({RRF_K} + sem_rank)")
    return f"""
WITH lex AS (
  SELECT id, CAST(row_number() OVER (ORDER BY score DESC, id ASC) AS INT)
           AS lex_rank
  FROM ({bm25})
),
sem AS (
  SELECT id, CAST(rank AS INT) AS sem_rank FROM ({sem})
),
fused AS (
  SELECT coalesce(lex.id, sem.id) AS doc_id, lex_rank, sem_rank,
         coalesce({lex_r}, 0) + coalesce({sem_r}, 0) AS rrf_micro
  FROM lex FULL OUTER JOIN sem ON lex.id = sem.id
)
SELECT doc_id, lex_rank, sem_rank, rrf_micro,
       CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id ASC) AS INT)
         AS rank
FROM fused
QUALIFY rank <= {topn}
ORDER BY rank
"""


# --- Rocchio pseudo-relevance feedback ----------------------------------------

PRF_K0 = 5  # feedback depth: round-1 chunks assumed relevant


def prf_rocchio_retrieve(
    df: DataFrame,
    col: str,
    id_col: str,
    terms: list[str],
    k: int = 10,
    k0: int = PRF_K0,
    size: int = 16,
    overlap: int = 0,
    dims: int = RETR_DIMS,
) -> DataFrame:
    """(id, chunk_idx, cos, rank): two-round retrieval with Rocchio
    pseudo-relevance feedback (Rocchio, SMART 1971 — public): round 1
    retrieves the top-k0 chunks for the literal query; the expanded
    query q' = alpha*q + beta*centroid(feedback chunks) with the
    classic alpha=1, beta=0.75 then scores the corpus again. Vocabulary
    the query never mentioned but its best answers share gets pulled
    in — the zero-training query-expansion step.

    Parity trick: cosine is scale-invariant, so q' is used in the
    INTEGER form Q = 4*n_fb*q + 3*sum(feedback vals) (multiply through
    by 4*n_fb) — dot products and norms stay exact integers on both
    engines, no float-summation-order divergence; the only float is
    the final rounded division.

    Scale shape: chunk vectors materialize once (eager localCheckpoint
    feeds both rounds); each round is one map-side-combined groupBy on
    (id, chunk_idx) + a TakeOrdered top-k; the feedback aggregate and
    the expanded query are <= dims rows, broadcast. Nothing is
    collected to the driver."""
    from pyspark.sql import Window

    qv = _hash_query(terms, dims)
    if sum(v * v for v in qv.values()) == 0:
        raise ValueError("query hashes to the zero vector")
    spark = df.sparkSession
    qlit = local_frame(
        spark, [(d, int(qv.get(d, 0))) for d in range(dims)], "dim int, qd long"
    )
    cv = hashed_chunk_vectors(df, col, id_col, size, overlap, dims)
    cv = cv.withColumn("dim", F.col("dim").cast("int")).localCheckpoint(
        eager=True
    )

    def topk(scored: DataFrame, n: int) -> DataFrame:
        return scored.orderBy(
            F.col("cos").desc(), F.col("id").asc(), F.col("chunk_idx").asc()
        ).limit(n)

    def score(qframe: DataFrame) -> DataFrame:
        qn2 = qframe.agg(F.sum(F.col("qd") * F.col("qd")).alias("qn2"))
        return (
            cv.join(F.broadcast(qframe), "dim")
            .groupBy("id", "chunk_idx")
            .agg(
                F.sum(F.col("val") * F.col("qd")).alias("dot"),
                F.sum(F.col("val") * F.col("val")).alias("n2"),
            )
            .filter(F.col("n2") > 0)
            .crossJoin(F.broadcast(qn2))
            .select(
                "id",
                "chunk_idx",
                F.round(
                    F.col("dot")
                    / (F.sqrt(F.col("n2")) * F.sqrt(F.col("qn2"))),
                    6,
                ).alias("cos"),
            )
        )

    r1 = topk(score(qlit), k0).select("id", "chunk_idx")
    fb_sum = (
        cv.join(r1, ["id", "chunk_idx"], "left_semi")
        .groupBy("dim")
        .agg(F.sum("val").alias("s"))
    )
    n_fb = r1.agg(F.count(F.lit(1)).alias("n_fb"))
    q2 = (
        qlit.join(F.broadcast(fb_sum), "dim", "left")
        .crossJoin(F.broadcast(n_fb))
        .select(
            "dim",
            (
                4 * F.col("n_fb") * F.col("qd")
                + 3 * F.coalesce(F.col("s"), F.lit(0))
            ).alias("qd"),
        )
    )
    top = topk(score(q2), k)
    w = Window.orderBy(
        F.col("cos").desc(), F.col("id").asc(), F.col("chunk_idx").asc()
    )
    return top.withColumn("rank", F.row_number().over(w))


def sql_prf_rocchio_retrieve(
    table: str,
    col: str,
    id_col: str,
    terms: list[str],
    k: int = 10,
    k0: int = PRF_K0,
    size: int = 16,
    overlap: int = 0,
    dims: int = RETR_DIMS,
) -> str:
    from hash_db_spark.operators.chunking import sql_token_chunks

    qv = _hash_query(terms, dims)
    qvals = ", ".join(f"({d}, {int(qv.get(d, 0))})" for d in range(dims))
    chunks = sql_token_chunks(table, col, id_col, size, overlap)
    order = "ORDER BY cos DESC, id ASC, chunk_idx ASC"
    return f"""
WITH ch AS ({chunks}),
tok AS (
  SELECT id, chunk_idx, unnest(string_split(chunk_text, ' ')) AS t
  FROM ch
),
cv AS (
  SELECT id, chunk_idx, CAST({_sql_tok_dim('t', dims)} AS INT) AS dim,
         CAST(sum({_sql_tok_sign('t')}) AS BIGINT) AS val
  FROM tok GROUP BY id, chunk_idx, {_sql_tok_dim('t', dims)}
),
qlit AS (SELECT * FROM (VALUES {qvals}) v(dim, qd)),
qn2a AS (SELECT sum(qd * qd) AS qn2 FROM qlit),
s1 AS (
  SELECT id, chunk_idx,
         round(CAST(sum(val * qd) AS DOUBLE)
               / (sqrt(CAST(sum(val * val) AS DOUBLE))
                  * sqrt(CAST((SELECT qn2 FROM qn2a) AS DOUBLE))), 6)
           AS cos,
         sum(val * val) AS n2
  FROM cv JOIN qlit USING (dim) GROUP BY id, chunk_idx
),
r1 AS (
  SELECT id, chunk_idx FROM s1 WHERE n2 > 0 {order} LIMIT {k0}
),
fb AS (
  SELECT dim, sum(val) AS s
  FROM cv JOIN r1 USING (id, chunk_idx) GROUP BY dim
),
nfb AS (SELECT count(*) AS n_fb FROM r1),
q2 AS (
  SELECT q.dim,
         4 * (SELECT n_fb FROM nfb) * q.qd + 3 * COALESCE(f.s, 0) AS qd
  FROM qlit q LEFT JOIN fb f USING (dim)
),
qn2b AS (SELECT sum(qd * qd) AS qn2 FROM q2),
s2 AS (
  SELECT id, chunk_idx,
         round(CAST(sum(val * qd) AS DOUBLE)
               / (sqrt(CAST(sum(val * val) AS DOUBLE))
                  * sqrt(CAST((SELECT qn2 FROM qn2b) AS DOUBLE))), 6)
           AS cos,
         sum(val * val) AS n2
  FROM cv JOIN q2 USING (dim) GROUP BY id, chunk_idx
)
SELECT id, chunk_idx, cos,
       CAST(row_number() OVER ({order}) AS INT) AS rank
FROM s2 WHERE n2 > 0
{order} LIMIT {k}
"""
