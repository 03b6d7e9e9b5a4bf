"""Deterministic spherical k-means over embedding columns.

Document clustering is the remaining classic of the LLM-pipeline family
(semantic bucketing for mixing/curation; centroid tables feed the IVF
index in ``similarity.py``). The reference engine has no counterpart
(free win). This is Lloyd's algorithm with a FIXED iteration count and
fully deterministic arithmetic, so the DuckDB oracle reproduces the
exact assignment:

- seeds: the ``k`` vectors with the lowest ``(md5(id), id)`` — the same
  content-addressed seeding the sampling/sketch modules use; seed order
  defines cluster indices 1..k.
- assignment: argmax cosine against the centroid matrix, cosine rounded
  half-away to 6dp, ties to the lowest cluster index (numpy argmax's
  first-max == SQL ``row_number ORDER BY cos DESC, cidx ASC``) — the
  parity discipline proven by ``similarity.py``.
- centroid update: per-dimension mean accumulated as EXACT integers
  (components quantized by floor(x*2^20+0.5), summed as BIGINT — float
  summation order differs between engines; integer summation doesn't),
  then one deterministic double division. Same trick as the HLL
  harmonic sum (``functions/sketches.py``).

Scale shape: each assignment pass is ONE Arrow/BLAS ``mapInPandas``
block over the corpus (rows x k matmul, map-side, no join, no shuffle
— the same shape the IVF rewrite uses). The centroid update shuffles
only (k x dims) partially-aggregated sums; the posexplode feeding it is
map-side. Driver holds k x dims doubles between iterations. At a 1000-
executor scale the corpus is scanned ``iters+1`` times and nothing
corpus-sized ever moves between executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from hash_db_spark.operators.similarity import _dvec

from hash_db_spark.localframe import local_frame

SCALE = 1_048_576  # 2^20 component quantization for exact centroid sums


def _norm_rows(m):
    import numpy as np

    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1.0, n)


def _assign_pass(corpus: DataFrame, cmat, with_vec: bool) -> DataFrame:
    """One corpus pass: nearest-centroid id per vector (Arrow/BLAS).

    cmat rows must be ordered by cluster index 1..k; argmax's first-max
    matches the oracle's (cos DESC, cidx ASC) row_number tie-break.
    """
    import numpy as np

    from hash_db_spark.functions.rounding import round_half_away

    bc = corpus.sparkSession.sparkContext.broadcast(_norm_rows(cmat))
    schema = (
        "vec_id long, cluster int, v array<double>"
        if with_vec
        else "vec_id long, cluster int"
    )

    def block(batches):
        import pandas as pd

        cm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = _norm_rows(np.array(list(pdf["v"]), dtype=np.float64))
            cl = round_half_away(v @ cm.T, 6).argmax(axis=1) + 1
            out = {"vec_id": pdf["vec_id"].to_numpy(), "cluster": cl}
            if with_vec:
                out["v"] = pdf["v"]
            yield pd.DataFrame(out)

    return corpus.mapInPandas(block, schema)


def _centroid_mat(corpus: DataFrame, k: int):
    """The k-means mean-centroid matrix (rows in dense surviving-cluster
    order) — seeds, one assignment pass, one exact-integer update."""
    import numpy as np

    seeds = (
        corpus.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(k)
        .collect()
    )  # tiny: k rows
    smat = np.array([r["v"] for r in seeds], dtype=np.float64)

    a0 = _assign_pass(corpus, smat, with_vec=True)
    sums = (
        a0.select("cluster", F.posexplode("v").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(
            F.sum(F.floor(F.col("val") * SCALE + F.lit(0.5))).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )  # tiny: k x dims rows, partial-aggregated map-side
    dims = max(r["pos"] for r in sums) + 1
    by_cl: dict[int, np.ndarray] = {}
    for r in sums:
        by_cl.setdefault(r["cluster"], np.zeros(dims))[r["pos"]] = float(
            r["s"]
        ) / (float(SCALE) * r["n"])
    # empty clusters vanish; remaining indices stay in seed-rank order,
    # matching the oracle's dense re-rank over surviving clusters
    return np.array([by_cl[c] for c in sorted(by_cl)], dtype=np.float64)


def kmeans_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """(vec_id, cluster): spherical k-means, 2 assignment passes around
    1 exact centroid update (fixed-iteration Lloyd)."""
    corpus = emb.select(
        F.col(id_col).alias("vec_id"), _dvec(vec_col).alias("v")
    )
    return _assign_pass(corpus, _centroid_mat(corpus, k), with_vec=False)


def kmeans_centroids(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """The centroid table as a DataFrame (vec_id = dense cluster index
    1..m, embedding = mean vector) — the offline artifact
    ``similarity.topk_ivf(centroids=...)`` consumes instead of growing
    its own strided subset with the corpus.

    Delegates to kmeans_fit (its assignment half is lazy, so this costs
    nothing extra) — one centroid-assembly implementation, not three
    drifting copies."""
    return kmeans_fit(emb, id_col, vec_col, k)[0]


def sql_kmeans_cents_ctes(k: int = 8) -> str:
    """CTE block computing the k-means centroid table as ``cents(cid,
    cv)`` over an existing ``corpus(vec_id, v)`` CTE — spliced into
    similarity.sql_topk_ivf(cents_ctes=...) so the oracle reproduces the
    kmeans-wired IVF end to end. km_-prefixed names avoid colliding with
    the IVF query's own assign0/queries CTEs."""
    return f"""km_seeds AS (
  SELECT v AS sv,
         row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         ) AS cidx
  FROM corpus
  QUALIFY cidx <= {k}
),
km_assign0 AS (
  SELECT vec_id, v, cidx,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY round(list_cosine_similarity(v, sv), 6) DESC, cidx ASC
         ) AS rn
  FROM corpus, km_seeds
),
km_a0 AS (SELECT vec_id, v, cidx AS cl FROM km_assign0 WHERE rn = 1),
km_comps AS (
  SELECT cl, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM km_a0
),
km_dimsums AS (
  SELECT cl, pos,
         sum(CAST(floor(val * {SCALE}.0 + 0.5) AS BIGINT)) AS s,
         count(*) AS n
  FROM km_comps GROUP BY cl, pos
),
km_cents0 AS (
  SELECT cl, list(CAST(s AS DOUBLE) / ({SCALE}.0 * n) ORDER BY pos) AS cv
  FROM km_dimsums GROUP BY cl
),
cents AS (
  SELECT row_number() OVER (ORDER BY cl) AS cid, cv FROM km_cents0
)"""


def sql_kmeans_assign(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> str:
    """DuckDB oracle: identical seeds, rounding, tie-breaks, and exact
    integer centroid arithmetic."""
    return f"""
WITH corpus AS (
  SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v FROM {table}
),
seeds AS (
  SELECT v AS sv,
         row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         ) AS cidx
  FROM corpus
  QUALIFY cidx <= {k}
),
assign0 AS (
  SELECT vec_id, v, cidx,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY round(list_cosine_similarity(v, sv), 6) DESC, cidx ASC
         ) AS rn
  FROM corpus, seeds
),
a0 AS (SELECT vec_id, v, cidx AS cl FROM assign0 WHERE rn = 1),
comps AS (
  SELECT cl, unnest(v) AS val, generate_subscripts(v, 1) AS pos FROM a0
),
dimsums AS (
  SELECT cl, pos,
         sum(CAST(floor(val * {SCALE}.0 + 0.5) AS BIGINT)) AS s,
         count(*) AS n
  FROM comps GROUP BY cl, pos
),
cents0 AS (
  SELECT cl, list(CAST(s AS DOUBLE) / ({SCALE}.0 * n) ORDER BY pos) AS cv
  FROM dimsums GROUP BY cl
),
cents AS (
  SELECT cv, row_number() OVER (ORDER BY cl) AS cidx FROM cents0
),
assign1 AS (
  SELECT c.vec_id, x.cidx,
         row_number() OVER (
           PARTITION BY c.vec_id
           ORDER BY round(list_cosine_similarity(c.v, x.cv), 6) DESC,
                    x.cidx ASC
         ) AS rn
  FROM corpus c, cents x
)
SELECT vec_id, CAST(cidx AS INT) AS cluster FROM assign1 WHERE rn = 1
"""


def kmeans_fit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignments) from ONE k-means computation — callers
    that need both (e.g. sources.writers.write_ivf_index) would otherwise
    run the full fit twice via kmeans_centroids + kmeans_assign, doubling
    the dominant cost of an offline index build."""
    corpus = emb.select(
        F.col(id_col).alias("vec_id"), _dvec(vec_col).alias("v")
    )
    cmat = _centroid_mat(corpus, k)
    cents = local_frame(
        emb.sparkSession,
        [(i + 1, row.tolist()) for i, row in enumerate(cmat)],
        f"{id_col} long, {vec_col} array<double>",
    )
    return cents, _assign_pass(corpus, cmat, with_vec=False)


# --- greedy k-center coreset selection -----------------------------------------

KC_MICRO = 1_000_000  # micro quantization of squared distances


def kcenter_select(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(sel_idx, vec_id, gap_micro): greedy k-center coreset selection
    (farthest-point traversal — Gonzalez 1985; used for data-selection
    coresets by Sener & Savarese, ICLR 2018). The seed is the
    content-addressed minimum (md5(id), id) — the house seeding idiom;
    each subsequent pick is the point farthest (max min-squared-
    distance) from the chosen set, ties to the lowest id. ``gap_micro``
    is the picked point's min-d2 in integer micro units (NULL for the
    seed) — a monotone non-increasing sequence that doubles as the
    coreset's covering-radius curve.

    Determinism: d2 is folded sequentially (zip_with + aggregate) and
    quantized to integer micro units per (point, center) pair; the
    running min and the argmax compare integers only.

    Scale shape: greedy k-center is inherently k sequential passes —
    each iteration is ONE map-side projection (d2 against the newest
    center, a literal array), a least() update, and a
    TakeOrderedAndProject(1) argmax (per-partition heaps, 1-row driver
    collect). Nothing corpus-sized shuffles, ever; the per-iteration
    localCheckpoint pins the mind2 column so lineage stays O(1) deep
    instead of O(k). Driver holds k vectors."""
    corpus = emb.select(
        F.col(id_col).alias("vec_id"), _dvec(vec_col).alias("v")
    )
    seed = (
        corpus.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(1)
        .collect()[0]
    )  # tiny: 1 row

    def d2_micro(center_vec: list[float]) -> F.Column:
        lit_c = F.array(*[F.lit(float(x)) for x in center_vec])
        sq = F.zip_with("v", lit_c, lambda a, b: (a - b) * (a - b))
        d2 = F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)
        return F.floor(d2 * KC_MICRO + F.lit(0.5)).cast("long")

    picked = [(1, int(seed["vec_id"]), None)]
    cur = (
        corpus.filter(F.col("vec_id") != int(seed["vec_id"]))
        .withColumn("mind2", d2_micro(list(seed["v"])))
        .localCheckpoint(eager=True)
    )
    for i in range(2, k + 1):
        top = (
            cur.orderBy(F.col("mind2").desc(), F.col("vec_id").asc())
            .limit(1)
            .collect()[0]
        )  # tiny: 1 row
        picked.append((i, int(top["vec_id"]), int(top["mind2"])))
        if i == k:
            break
        cur = (
            cur.filter(F.col("vec_id") != int(top["vec_id"]))
            .withColumn(
                "mind2", F.least("mind2", d2_micro(list(top["v"])))
            )
            .localCheckpoint(eager=True)
        )
    spark = emb.sparkSession
    return local_frame(
        spark, picked, "sel_idx int, vec_id long, gap_micro long"
    )


def sql_kcenter_select(
    k: int = 8,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle: the same greedy traversal as k chained CTE
    stages — identical seed, quantization point, and tie-breaks."""

    def d2(p: str, c: str) -> str:
        return (
            f"CAST(floor((SELECT sum(({p}.v[u.i] - {c}.v[u.i])"
            f" * ({p}.v[u.i] - {c}.v[u.i]))"
            f" FROM unnest(generate_series(1, len({p}.v))) AS u(i))"
            f" * {KC_MICRO} + 0.5) AS BIGINT)"
        )

    parts = [
        f"""corpus AS (
  SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v FROM {table}
),
c1 AS (
  SELECT vec_id, v, CAST(NULL AS BIGINT) AS gap
  FROM corpus ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1
),
d1 AS (
  SELECT p.vec_id, p.v, {d2('p', 'c')} AS mind2
  FROM corpus p CROSS JOIN c1 c WHERE p.vec_id <> c.vec_id
)"""
    ]
    for i in range(2, k + 1):
        parts.append(
            f"""c{i} AS (
  SELECT vec_id, v, mind2 AS gap FROM d{i - 1}
  ORDER BY mind2 DESC, vec_id ASC LIMIT 1
)"""
        )
        if i < k:
            parts.append(
                f"""d{i} AS (
  SELECT p.vec_id, p.v, least(p.mind2, {d2('p', 'c')}) AS mind2
  FROM d{i - 1} p CROSS JOIN c{i} c WHERE p.vec_id <> c.vec_id
)"""
            )
    selects = "\nUNION ALL\n".join(
        f"SELECT {i} AS sel_idx, vec_id, gap AS gap_micro FROM c{i}"
        for i in range(1, k + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT CAST(sel_idx AS INT) AS sel_idx, vec_id, gap_micro"
        f" FROM ({selects}) ORDER BY sel_idx"
    )


OUTLIER_TOPN = 50


def embedding_outliers(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    topn: int = OUTLIER_TOPN,
) -> DataFrame:
    """(vec_id, cluster, cos_micro, rank): the ``topn`` vectors FARTHEST
    from their nearest k-means centroid (lowest best-cosine) — the
    embedding-space garbage detector: OCR noise, wrong-modality rows,
    and off-distribution documents sit in no cluster, so their best
    centroid cosine is the corpus tail. The complement of semdedup_drop
    (which prunes the over-dense cluster cores); together they trim
    both ends of the density spectrum before training.

    Same centroids as kmeans_assign (seeds, one assignment, one exact
    integer update — _centroid_mat), so the oracle splices the proven
    sql_kmeans_cents_ctes block. One extra Arrow/BLAS corpus pass
    scoring best-centroid cosine in integer micro-units, then
    TakeOrderedAndProject for the ascending top-n — per-partition
    heaps, no global sort."""
    import numpy as np

    from pyspark.sql import Window

    corpus = emb.select(
        F.col(id_col).alias("vec_id"), _dvec(vec_col).alias("v")
    )
    cmat = _centroid_mat(corpus, k)
    bc = corpus.sparkSession.sparkContext.broadcast(_norm_rows(cmat))

    def block(batches):
        import pandas as pd

        cm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = _norm_rows(np.array(list(pdf["v"]), dtype=np.float64))
            cos = v @ cm.T
            # micro_col semantics, computed as integers directly
            micro = (np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5)).astype(
                np.int64
            )
            # first-max argmax == oracle's (cos_micro DESC, cidx ASC)
            best = micro.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cluster": (best + 1).astype(np.int32),
                    "cos_micro": micro[np.arange(len(best)), best],
                }
            )

    scored = corpus.mapInPandas(
        block, "vec_id long, cluster int, cos_micro long"
    )
    top = scored.orderBy(
        F.col("cos_micro").asc(), F.col("vec_id").asc()
    ).limit(topn)
    w = Window.orderBy(F.col("cos_micro").asc(), F.col("vec_id").asc())
    return top.withColumn("rank", F.row_number().over(w))


def sql_embedding_outliers(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    topn: int = OUTLIER_TOPN,
) -> str:
    from hash_db_spark.operators.curation import sql_micro

    cm = sql_micro("list_cosine_similarity(c.v, x.cv)")
    return f"""
WITH corpus AS (
  SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v FROM {table}
),
{sql_kmeans_cents_ctes(k)},
assign1 AS (
  SELECT c.vec_id, x.cid, {cm} AS cos_micro,
         row_number() OVER (
           PARTITION BY c.vec_id
           ORDER BY {cm} DESC, x.cid ASC
         ) AS rn
  FROM corpus c, cents x
),
best AS (
  SELECT vec_id, CAST(cid AS INT) AS cluster, cos_micro
  FROM assign1 WHERE rn = 1
)
SELECT vec_id, cluster, cos_micro,
       CAST(row_number() OVER (ORDER BY cos_micro ASC, vec_id ASC) AS INT)
         AS rank
FROM best
ORDER BY cos_micro ASC, vec_id ASC
LIMIT {topn}
"""


# --- cluster-balanced (diversity) sampling --------------------------------------

CB_SQRT_SCALE = 1000  # milli-sqrt quantization for integer quota math


def cluster_balanced_sample(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    target: int = 200,
) -> DataFrame:
    """(vec_id, cluster): a diversity-aware subsample — documents are
    k-means-clustered in embedding space, then the ``target`` budget is
    allocated ACROSS clusters proportional to sqrt(cluster size), the
    temperature-style allocation (same math as multilingual sqrt
    sampling, Devlin et al. 2019) that downweights mega-clusters
    (boilerplate, template families) and protects the long tail —
    embedding-space curation one notch softer than semdedup_drop's
    hard pruning.

    Everything after the k-means pass is integer-exact: per-cluster
    milli-sqrt s_c = floor(sqrt(sz)*1000) (one IEEE sqrt per CLUSTER,
    order-free), quotas q_c = target*s_c div sum(s), membership u(id) <
    q_c*M div sz_c — content-addressed Bernoulli, so the kept set is
    reproducible and append-stable, no per-cluster window, no sort.
    The quota frame is k rows, broadcast; one extra scan of the
    assignment."""
    from hash_db_spark.operators.curation import SAMPLE_M, sample_u

    assign = kmeans_assign(emb, id_col, vec_col, k).localCheckpoint(
        eager=True
    )
    sizes = assign.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("sz")
    ).withColumn(
        "s",
        F.floor(F.sqrt(F.col("sz")) * CB_SQRT_SCALE).cast("long"),
    )
    tot = sizes.agg(F.sum("s").alias("stot"))
    quota = (
        sizes.crossJoin(F.broadcast(tot))
        .withColumn("q", F.expr(f"CAST({int(target)} * s div stot AS BIGINT)"))
        .withColumn(
            "thresh", F.expr(f"CAST(q * {SAMPLE_M} div sz AS BIGINT)")
        )
        .select("cluster", "thresh")
    )
    return (
        assign.join(F.broadcast(quota), "cluster")
        .filter(sample_u(F.col("vec_id")) < F.col("thresh"))
        .select("vec_id", "cluster")
    )


def sql_cluster_balanced_sample(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    target: int = 200,
) -> str:
    from hash_db_spark.operators.curation import SAMPLE_M, sql_sample_u

    ka = sql_kmeans_assign(table, id_col, vec_col, k)
    return f"""
WITH ka AS ({ka}),
sizes AS (
  SELECT cluster, count(*) AS sz,
         CAST(floor(sqrt(count(*)) * {CB_SQRT_SCALE}) AS BIGINT) AS s
  FROM ka GROUP BY cluster
),
quota AS (
  SELECT cluster,
         (({int(target)} * s) // (SELECT sum(s) FROM sizes)
          * {SAMPLE_M}) // sz AS thresh
  FROM sizes
)
SELECT ka.vec_id, ka.cluster
FROM ka JOIN quota USING (cluster)
WHERE {sql_sample_u('ka.vec_id')} < thresh
"""
