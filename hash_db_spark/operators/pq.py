"""Product quantization (PQ) top-k similarity search.

The 100 TB ANN memory story the IVF/LSH paths don't tell: a 64-dim
float32 embedding is 256 bytes; its PQ code is ``m`` bytes (here 4).
A 100 TB corpus's embedding column compresses ~64x into codes that fit
executor memory, and every query scans CODES, not vectors — the
asymmetric-distance computation (ADC) of Jegou et al., "Product
Quantization for Nearest Neighbor Search" (TPAMI 2011; public).

Reference parity: the reference engine has no vector search at all
(free win; closest surface is its FTS ``~`` operator,
/root/reference/server.py:520-604) — this extends the similarity
family (`operators/similarity.py`) the same way IVF does.

Determinism/oracle design (the house parity discipline, see
``operators/clustering.py``):

- vectors are L2-normalized (sequential accumulation order both
  engines) then QUANTIZED once: ``qv_i = floor(nv_i * 2^20 + 0.5)`` as
  BIGINT.  Everything downstream — codebook fit, encode, ADC — is
  EXACT int64 arithmetic, so engine summation order cannot matter.
- codebook seeds: per subspace, the ``ks`` corpus rows with the lowest
  ``(md5(id), id)`` — the same content-addressed seeding k-means uses;
  seed rank = codeword index 1..ks.
- one Lloyd iteration: assign (argmin int d2, ties to the lowest
  codeword index), then the exact-integer mean update
  ``cq = floor(sum(qval)/n + 0.5)`` (sum, n are exact ints; the one
  double division is IEEE-identical across engines).  Empty codewords
  vanish; survivors keep their ORIGINAL index (codes are opaque ids —
  no dense re-rank, unlike k-means cluster labels).
- ADC: per query, the (subspace, codeword) -> int d2 table is computed
  driver-side from the SAME quantized arithmetic, embedded as literal
  arrays, and summed per corpus row with ``element_at`` — whole-stage
  codegen, no join, no corpus-sized shuffle.  Ranking: d2 ASC, vec_id
  ASC.

Scale shape: two Arrow passes over the corpus (fit partial-sums +
encode), each map-side; the only shuffles are the tiny
(m x ks x dims) partial-sum aggregation and the final per-query top-k
window (nq partitions).  Driver state: m x ks x dsub ints (the
codebook) and nq x m x ks ints (the distance tables) — both bounded by
parameters, never by the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

SCALE = 1 << 20  # component quantization (shared with clustering.SCALE)
PQ_M = 4  # subspaces
PQ_KS = 16  # codewords per subspace


def _norm_quant(vmat):
    """float64 (n, d) -> int64 (n, d): L2-normalize rows (zero rows pass
    through), quantize by floor(x*SCALE + 0.5).

    The squared norm accumulates SEQUENTIALLY over dimensions (a
    column-at-a-time loop, not numpy's 8-way-unrolled pairwise
    reduction) so the double is bit-identical to DuckDB's in-order
    list_aggregate sum — the `cosine` parity note,
    operators/similarity.py."""
    import numpy as np

    sq = np.zeros(vmat.shape[0], dtype=np.float64)
    for i in range(vmat.shape[1]):
        sq += vmat[:, i] * vmat[:, i]
    nrm = np.sqrt(sq)[:, None]
    nv = vmat / np.where(nrm == 0.0, 1.0, nrm)
    return np.floor(nv * SCALE + 0.5).astype(np.int64)


def _sub_d2(qmat, cmat, m: int):
    """int64 (n, d) x int64 (j, d) -> int64 (n, m, j) per-subspace
    squared distances, via the exact expansion q2 - 2qc + c2 (int64
    matmul keeps every term exact; values fit well under 2^63)."""
    import numpy as np

    n, d = qmat.shape
    j = cmat.shape[0]
    dsub = d // m
    q = qmat.reshape(n, m, dsub)
    c = cmat.reshape(j, m, dsub)
    dot = np.einsum("nsd,jsd->nsj", q, c)
    q2 = (q * q).sum(axis=2)  # (n, m)
    c2 = (c * c).sum(axis=2)  # (j, m)
    return q2[:, :, None] - 2 * dot + c2.T[None, :, :]


def _fit_codebook(corpus: DataFrame, m: int, ks: int):
    """One Lloyd iteration from content-addressed seeds.

    Returns ``{s: [(orig_j, int64 subvector), ...]}`` — surviving
    codewords per subspace in original-index order.  Corpus cost: one
    Arrow pass emitting (m x ks x d) partial sums per batch; the
    groupBy shuffles only those tiny partials.
    """
    import numpy as np

    seeds = (
        corpus.withColumn("h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("h", "vec_id")
        .limit(ks)
        .collect()
    )  # tiny: ks rows
    smat = _norm_quant(np.array([r["v"] for r in seeds], dtype=np.float64))
    bc = corpus.sparkSession.sparkContext.broadcast(smat)
    d = smat.shape[1]
    dsub = d // m

    def fit_block(batches):
        import pandas as pd

        sm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qv = _norm_quant(np.array(list(pdf["v"]), dtype=np.float64))
            d2 = _sub_d2(qv, sm, m)  # (n, m, ks)
            codes = d2.argmin(axis=2)  # first-min tie == lowest index
            rows = {"s": [], "code": [], "pos": [], "psum": [], "pn": []}
            sub = qv.reshape(len(qv), m, dsub)
            for s in range(m):
                for j in range(sm.shape[0]):
                    mask = codes[:, s] == j
                    cnt = int(mask.sum())
                    if cnt == 0:
                        continue
                    sums = sub[mask, s, :].sum(axis=0)
                    for p in range(dsub):
                        rows["s"].append(s)
                        rows["code"].append(j + 1)
                        rows["pos"].append(s * dsub + p)
                        rows["psum"].append(int(sums[p]))
                        rows["pn"].append(cnt)
            yield pd.DataFrame(rows)

    sums = (
        corpus.mapInPandas(
            fit_block, "s int, code int, pos int, psum long, pn long"
        )
        .groupBy("s", "code", "pos")
        .agg(F.sum("psum").alias("ts"), F.sum("pn").alias("tn"))
        .collect()
    )  # tiny: <= m*ks*dsub rows
    cents: dict[tuple[int, int], np.ndarray] = {}
    for r in sums:
        key = (r["s"], r["code"])
        if key not in cents:
            cents[key] = np.zeros(dsub, dtype=np.int64)
        # exact ints in, IEEE-identical double division + floor out
        cents[key][r["pos"] % dsub] = np.int64(
            np.floor(float(r["ts"]) / float(r["tn"]) + 0.5)
        )
    book: dict[int, list[tuple[int, np.ndarray]]] = {}
    for s in range(m):
        book[s] = [
            (j, cents[(s, j)]) for j in range(1, ks + 1) if (s, j) in cents
        ]
    return book


def _encode(corpus: DataFrame, book, m: int) -> DataFrame:
    """(vec_id, codes array<int>) — nearest surviving codeword per
    subspace (original 1-based indices), one Arrow pass."""
    import numpy as np

    dsub = len(book[0][0][1])
    # per subspace: (orig index array, centroid matrix)
    packed = {
        s: (
            np.array([j for j, _ in entries], dtype=np.int64),
            np.array([c for _, c in entries], dtype=np.int64),
        )
        for s, entries in book.items()
    }
    bc = corpus.sparkSession.sparkContext.broadcast(packed)

    def enc_block(batches):
        import pandas as pd

        pk = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qv = _norm_quant(np.array(list(pdf["v"]), dtype=np.float64))
            sub = qv.reshape(len(qv), m, dsub)
            codes = np.zeros((len(qv), m), dtype=np.int64)
            for s in range(m):
                idx, cm = pk[s]
                x = sub[:, s, :]
                d2 = (
                    (x * x).sum(axis=1, keepdims=True)
                    - 2 * (x @ cm.T)
                    + (cm * cm).sum(axis=1)[None, :]
                )
                # surviving codewords are in ascending original order,
                # so argmin's first-min IS the lowest original index
                codes[:, s] = idx[d2.argmin(axis=1)]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "codes": list(codes),
                }
            )

    return corpus.mapInPandas(enc_block, "vec_id long, codes array<int>")


def topk_pq(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = PQ_M,
    ks: int = PQ_KS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ/ADC approximate top-k: (qid, vec_id, d2, rank) — d2 is the
    exact-int asymmetric squared distance (BIGINT), rank by (d2 ASC,
    vec_id ASC), self excluded."""
    import numpy as np

    from hash_db_spark.operators.similarity import _dvec

    corpus = emb.select(
        F.col(id_col).alias("vec_id"), _dvec(vec_col).alias("v")
    )
    book = _fit_codebook(corpus, m, ks)
    codes = _encode(corpus, book, m)

    qrows = corpus.filter(F.col("vec_id").isin(query_ids)).collect()
    # bounded by len(query_ids) — same driver footprint as the k-means
    # seed collect
    qmat = _norm_quant(
        np.array([r["v"] for r in qrows], dtype=np.float64)
    )
    qids = [r["vec_id"] for r in qrows]
    dsub = qmat.shape[1] // m
    qsub = qmat.reshape(len(qids), m, dsub)

    # distance tables as ks-wide literal arrays (dead codewords hold 0 —
    # they never appear in codes)
    dtab: dict[int, list[list[int]]] = {}
    for qi, qid in enumerate(qids):
        per_s = []
        for s in range(m):
            row = [0] * ks
            for j, cvec in book[s]:
                diff = qsub[qi, s, :] - cvec
                row[j - 1] = int((diff * diff).sum())
            per_s.append(row)
        dtab[qid] = per_s

    score_arr = F.array(
        *[
            sum(
                (
                    F.element_at(
                        F.array(
                            *[
                                F.lit(int(x)).cast("long")
                                for x in dtab[qid][s]
                            ]
                        ),
                        F.col("codes")[s].cast("int"),
                    )
                    for s in range(m)
                ),
                start=F.lit(0).cast("long"),
            )
            for qid in qids
        ]
    )
    qid_arr = F.array(*[F.lit(int(q)).cast("long") for q in qids])
    scored = (
        codes.select(
            "vec_id",
            F.posexplode(score_arr).alias("qi", "d2"),
        )
        .select(
            F.element_at(qid_arr, F.col("qi") + 1).alias("qid"),
            "vec_id",
            F.col("d2").cast("long").alias("d2"),
        )
        .filter(F.col("vec_id") != F.col("qid"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def sql_topk_pq(
    query_ids: list[int],
    k: int = 5,
    m: int = PQ_M,
    ks: int = PQ_KS,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle: identical normalization order, quantization,
    seeding, integer Lloyd step, and ADC ranking."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH corpus AS (
  SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v FROM {table}
),
normed AS (
  SELECT vec_id,
         CASE WHEN nrm = 0 THEN v
              ELSE list_transform(v, x -> x / nrm) END AS nv
  FROM (
    SELECT vec_id, v,
           sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
    FROM corpus
  )
),
qcomps AS (
  SELECT vec_id,
         pos - 1 AS pos,
         CAST(floor(val * {SCALE} + 0.5) AS BIGINT) AS qval,
         CAST((pos - 1) // ((SELECT max(len(nv)) FROM normed) // {m}) AS INT) AS s
  FROM (
    SELECT vec_id, unnest(nv) AS val, generate_subscripts(nv, 1) AS pos
    FROM normed
  )
),
seeds AS (
  SELECT vec_id AS sid,
         row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         ) AS cidx
  FROM corpus QUALIFY cidx <= {ks}
),
seedcomps AS (
  SELECT s.cidx, q.pos, q.s, q.qval AS sval
  FROM seeds s JOIN qcomps q ON q.vec_id = s.sid
),
d0 AS (
  SELECT q.vec_id, q.s, sc.cidx,
         sum((q.qval - sc.sval) * (q.qval - sc.sval)) AS d2
  FROM qcomps q JOIN seedcomps sc ON sc.pos = q.pos
  GROUP BY q.vec_id, q.s, sc.cidx
),
code0 AS (
  SELECT vec_id, s, cidx AS code FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, s ORDER BY d2 ASC, cidx ASC
    ) AS rn FROM d0
  ) WHERE rn = 1
),
upd AS (
  SELECT c0.s, c0.code, q.pos,
         CAST(floor(CAST(sum(q.qval) AS DOUBLE) / count(*) + 0.5)
              AS BIGINT) AS cq
  FROM code0 c0 JOIN qcomps q ON q.vec_id = c0.vec_id AND q.s = c0.s
  GROUP BY c0.s, c0.code, q.pos
),
d1 AS (
  SELECT q.vec_id, q.s, u.code AS cidx,
         sum((q.qval - u.cq) * (q.qval - u.cq)) AS d2
  FROM qcomps q JOIN upd u ON u.pos = q.pos
  GROUP BY q.vec_id, q.s, u.code
),
codes AS (
  SELECT vec_id, s, cidx AS code FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, s ORDER BY d2 ASC, cidx ASC
    ) AS rn FROM d1
  ) WHERE rn = 1
),
dtab AS (
  SELECT vec_id AS qid, s, cidx AS code, d2
  FROM d1 WHERE vec_id IN ({ids})
),
adc AS (
  SELECT t.qid, c.vec_id, CAST(sum(t.d2) AS BIGINT) AS d2
  FROM codes c JOIN dtab t ON t.s = c.s AND t.code = c.code
  WHERE c.vec_id <> t.qid
  GROUP BY t.qid, c.vec_id
)
SELECT qid, vec_id, d2, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY d2 ASC, vec_id ASC
  ) AS rank FROM adc
) WHERE rank <= {k}
"""


IVFPQ_CELLS = 8
IVFPQ_NPROBE = 2


def _encode_with_cells(corpus: DataFrame, book, m: int, cmat) -> DataFrame:
    """(vec_id, codes array<int>, cell int) in ONE Arrow pass: PQ codes
    (exact-int arithmetic, `_encode`) plus the nearest k-means cell
    (cosine argmax with the clustering module's rounding discipline, so
    the cell matches `clustering.kmeans_assign`'s oracle exactly)."""
    import numpy as np

    from hash_db_spark.functions.rounding import round_half_away
    from hash_db_spark.operators.clustering import _norm_rows

    dsub = len(book[0][0][1])
    packed = {
        s: (
            np.array([j for j, _ in entries], dtype=np.int64),
            np.array([c for _, c in entries], dtype=np.int64),
        )
        for s, entries in book.items()
    }
    bc = corpus.sparkSession.sparkContext.broadcast(
        (packed, _norm_rows(cmat))
    )

    def block(batches):
        import pandas as pd

        pk, ncm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw = np.array(list(pdf["v"]), dtype=np.float64)
            cell = (
                round_half_away(_norm_rows(raw) @ ncm.T, 6).argmax(axis=1)
                + 1
            )
            qv = _norm_quant(raw)
            sub = qv.reshape(len(qv), m, dsub)
            codes = np.zeros((len(qv), m), dtype=np.int64)
            for s in range(m):
                idx, cm = pk[s]
                x = sub[:, s, :]
                d2 = (
                    (x * x).sum(axis=1, keepdims=True)
                    - 2 * (x @ cm.T)
                    + (cm * cm).sum(axis=1)[None, :]
                )
                codes[:, s] = idx[d2.argmin(axis=1)]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "codes": list(codes),
                    "cell": cell,
                }
            )

    return corpus.mapInPandas(
        block, "vec_id long, codes array<int>, cell int"
    )


def topk_ivf_pq(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    m: int = PQ_M,
    ks: int = PQ_KS,
    cells: int = IVFPQ_CELLS,
    nprobe: int = IVFPQ_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: k-means cell pruning OVER PQ codes — the composition
    that makes 100 TB ANN serveable. IVF alone still reads full vectors
    in the probed cells; PQ alone scans every code. Together a query
    reads ~(nprobe/cells) of the corpus as m-byte codes: at 100 TB and
    these defaults that is 1/4 of 4-byte codes instead of 256-byte
    vectors — ~256x less IO per query. Codes are of the RAW vectors
    (the no-residual IVFPQ variant; residual encoding would couple the
    codebook to the cells and is a data-quality knob, not a plan-shape
    change).

    One fused Arrow pass emits (codes, cell) per vector; the probe set
    (query -> nprobe nearest cells) and ADC tables are driver-computed
    literals, so the scan is a codegen filter+projection over the
    codes frame — no corpus-sized join or shuffle before the final
    per-query top-k window."""
    import numpy as np

    from hash_db_spark.functions.rounding import round_half_away
    from hash_db_spark.operators.clustering import (
        _centroid_mat,
        _norm_rows,
    )
    from hash_db_spark.operators.similarity import _dvec

    corpus = emb.select(
        F.col(id_col).alias("vec_id"), _dvec(vec_col).alias("v")
    )
    cmat = _centroid_mat(corpus, cells)
    book = _fit_codebook(corpus, m, ks)
    coded = _encode_with_cells(corpus, book, m, cmat)
    qrows = corpus.filter(F.col("vec_id").isin(query_ids)).collect()
    return _adc_topk(coded, book, cmat, qrows, k, m, ks, nprobe)


def _adc_topk(
    coded: DataFrame,
    book,
    cmat,
    qrows,
    k: int,
    m: int,
    ks: int,
    nprobe: int,
) -> DataFrame:
    """Serve top-k from a (vec_id, codes, cell) frame: probe-cell
    ranking + literal ADC tables + the per-query top-k window. Shared
    by the inline fit path (topk_ivf_pq) and the persisted-index path
    (sources.writers.pq_index_topk) so they cannot drift."""
    import numpy as np

    from hash_db_spark.functions.rounding import round_half_away
    from hash_db_spark.operators.clustering import _norm_rows

    qraw = np.array([r["v"] for r in qrows], dtype=np.float64)
    qids = [r["vec_id"] for r in qrows]
    # probe cells: same rounding + (cos DESC, cell ASC) rank as the
    # k-means assignment oracle
    sims = round_half_away(_norm_rows(qraw) @ _norm_rows(cmat).T, 6)
    qcells = {
        qid: [
            int(c) + 1
            for c in sorted(
                range(sims.shape[1]), key=lambda c: (-sims[qi, c], c)
            )[:nprobe]
        ]
        for qi, qid in enumerate(qids)
    }

    qmat = _norm_quant(qraw)
    dsub = qmat.shape[1] // m
    qsub = qmat.reshape(len(qids), m, dsub)
    dtab: dict[int, list[list[int]]] = {}
    for qi, qid in enumerate(qids):
        per_s = []
        for s in range(m):
            row = [0] * ks
            for j, cvec in book[s]:
                diff = qsub[qi, s, :] - cvec
                row[j - 1] = int((diff * diff).sum())
            per_s.append(row)
        dtab[qid] = per_s

    # cell-pruning filter FIRST: on a cell-partitioned persisted index
    # this compiles to PartitionFilters (only nprobe directories read)
    all_cells = sorted({c for cs in qcells.values() for c in cs})
    pruned = coded.filter(F.col("cell").isin(all_cells))

    def adc_expr(qid):
        total = sum(
            (
                F.element_at(
                    F.array(
                        *[F.lit(int(x)).cast("long") for x in dtab[qid][s]]
                    ),
                    F.col("codes")[s].cast("int"),
                )
                for s in range(m)
            ),
            start=F.lit(0).cast("long"),
        )
        return F.when(
            F.col("cell").isin(qcells[qid]), total
        ).otherwise(F.lit(None).cast("long"))

    score_arr = F.array(*[adc_expr(qid) for qid in qids])
    qid_arr = F.array(*[F.lit(int(q)).cast("long") for q in qids])
    scored = (
        pruned.select(
            "vec_id", F.posexplode(score_arr).alias("qi", "d2")
        )
        .filter(F.col("d2").isNotNull())
        .select(
            F.element_at(qid_arr, F.col("qi") + 1).alias("qid"),
            "vec_id",
            F.col("d2").cast("long").alias("d2"),
        )
        .filter(F.col("vec_id") != F.col("qid"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def sql_topk_ivf_pq(
    query_ids: list[int],
    k: int = 5,
    m: int = PQ_M,
    ks: int = PQ_KS,
    cells: int = IVFPQ_CELLS,
    nprobe: int = IVFPQ_NPROBE,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB oracle: the PQ pipeline's CTEs plus the k-means cell
    assignment/probe restriction (sql_kmeans_cents_ctes discipline)."""
    from hash_db_spark.operators.clustering import sql_kmeans_cents_ctes

    ids = ", ".join(str(i) for i in query_ids)
    cents = sql_kmeans_cents_ctes(k=cells)
    return f"""
WITH corpus AS (
  SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v FROM {table}
),
{cents},
cellassign AS (
  SELECT c.vec_id, x.cid AS cell,
         row_number() OVER (
           PARTITION BY c.vec_id
           ORDER BY round(list_cosine_similarity(c.v, x.cv), 6) DESC,
                    x.cid ASC
         ) AS rn
  FROM corpus c, cents x
),
vcells AS (SELECT vec_id, cell FROM cellassign WHERE rn = 1),
qcells AS (
  SELECT vec_id AS qid, cell FROM cellassign
  WHERE rn <= {nprobe} AND vec_id IN ({ids})
),
normed AS (
  SELECT vec_id,
         CASE WHEN nrm = 0 THEN v
              ELSE list_transform(v, x -> x / nrm) END AS nv
  FROM (
    SELECT vec_id, v,
           sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm
    FROM corpus
  )
),
qcomps AS (
  SELECT vec_id,
         pos - 1 AS pos,
         CAST(floor(val * {SCALE} + 0.5) AS BIGINT) AS qval,
         CAST((pos - 1) // ((SELECT max(len(nv)) FROM normed) // {m}) AS INT) AS s
  FROM (
    SELECT vec_id, unnest(nv) AS val, generate_subscripts(nv, 1) AS pos
    FROM normed
  )
),
seeds AS (
  SELECT vec_id AS sid,
         row_number() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         ) AS cidx
  FROM corpus QUALIFY cidx <= {ks}
),
seedcomps AS (
  SELECT s.cidx, q.pos, q.s, q.qval AS sval
  FROM seeds s JOIN qcomps q ON q.vec_id = s.sid
),
d0 AS (
  SELECT q.vec_id, q.s, sc.cidx,
         sum((q.qval - sc.sval) * (q.qval - sc.sval)) AS d2
  FROM qcomps q JOIN seedcomps sc ON sc.pos = q.pos
  GROUP BY q.vec_id, q.s, sc.cidx
),
code0 AS (
  SELECT vec_id, s, cidx AS code FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, s ORDER BY d2 ASC, cidx ASC
    ) AS rn FROM d0
  ) WHERE rn = 1
),
upd AS (
  SELECT c0.s, c0.code, q.pos,
         CAST(floor(CAST(sum(q.qval) AS DOUBLE) / count(*) + 0.5)
              AS BIGINT) AS cq
  FROM code0 c0 JOIN qcomps q ON q.vec_id = c0.vec_id AND q.s = c0.s
  GROUP BY c0.s, c0.code, q.pos
),
d1 AS (
  SELECT q.vec_id, q.s, u.code AS cidx,
         sum((q.qval - u.cq) * (q.qval - u.cq)) AS d2
  FROM qcomps q JOIN upd u ON u.pos = q.pos
  GROUP BY q.vec_id, q.s, u.code
),
codes AS (
  SELECT vec_id, s, cidx AS code FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id, s ORDER BY d2 ASC, cidx ASC
    ) AS rn FROM d1
  ) WHERE rn = 1
),
dtab AS (
  SELECT vec_id AS qid, s, cidx AS code, d2
  FROM d1 WHERE vec_id IN ({ids})
),
adc AS (
  SELECT t.qid, c.vec_id, CAST(sum(t.d2) AS BIGINT) AS d2
  FROM codes c
  JOIN vcells ce ON ce.vec_id = c.vec_id
  JOIN qcells qc ON qc.cell = ce.cell
  JOIN dtab t ON t.qid = qc.qid AND t.s = c.s AND t.code = c.code
  WHERE c.vec_id <> t.qid
  GROUP BY t.qid, c.vec_id
)
SELECT qid, vec_id, d2, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (
    PARTITION BY qid ORDER BY d2 ASC, vec_id ASC
  ) AS rank FROM adc
) WHERE rank <= {k}
"""


# --- per-vector affine int8 quantization ---------------------------------------
#
# The serving-store compression PQ does not cover: keep every dimension
# but store each component in one byte (scale/zero-point affine
# quantization — the ONNX/TFLite convention). 8x smaller embedding
# column with a per-vector reconstruction-error bound the report makes
# auditable. Pure map-side column expressions; no shuffle, no collect.


def int8_quant_report(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, n_dims, code_sum, max_err_micro): affine int8
    quantization x ~ min + code * (max-min)/255, code in 0..255.
    code_sum is the exact integer checksum of the code vector (the
    driver-checkable witness that both engines derived identical
    codes); max_err_micro is the micro-quantized worst reconstruction
    error — by construction <= scale/2, i.e. (max-min)/510. Constant
    vectors (max == min) quantize to all-zero codes with zero error."""
    from hash_db_spark.operators.curation import micro_col
    from hash_db_spark.operators.similarity import _dvec

    # Hoist min/max/scale into a projection BEFORE the per-element
    # lambdas: referenced inside transform(), array_min/array_max would
    # be re-evaluated per element — O(dims^2) per vector (measured 7x
    # wall on the fixture).
    base = emb.select(
        F.col(id_col).alias("vec_id"), _dvec(vec_col).alias("v")
    ).select(
        "vec_id",
        "v",
        F.array_min("v").alias("mn"),
        F.array_max("v").alias("mx"),
    )
    mn, mx = F.col("mn"), F.col("mx")
    sc = (mx - mn) / F.lit(255.0)

    def code(x):
        return F.floor((x - mn) / sc + F.lit(0.5))

    code_sum = F.aggregate(
        F.transform("v", lambda x: code(x).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    max_err = F.array_max(
        F.transform(
            "v", lambda x: micro_col(F.abs(x - (mn + code(x) * sc)))
        )
    )
    zero = F.lit(0).cast("long")
    return base.select(
        "vec_id",
        F.size("v").alias("n_dims"),
        F.when(mx == mn, zero).otherwise(code_sum).alias("code_sum"),
        F.when(mx == mn, zero).otherwise(max_err).alias("max_err_micro"),
    )


def sql_int8_quant_report(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    from hash_db_spark.operators.curation import sql_micro

    code = "floor((x - mn) / ((mx - mn) / 255.0) + 0.5)"
    err = f"abs(x - (mn + {code} * ((mx - mn) / 255.0)))"
    return f"""
WITH base AS (
  SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v FROM {table}
),
s AS (
  SELECT vec_id, v,
         list_aggregate(v, 'min') AS mn,
         list_aggregate(v, 'max') AS mx
  FROM base
)
SELECT vec_id,
       CAST(len(v) AS INT) AS n_dims,
       CASE WHEN mx = mn THEN 0 ELSE
         CAST(list_sum(list_transform(v, x -> CAST({code} AS BIGINT)))
              AS BIGINT) END AS code_sum,
       CASE WHEN mx = mn THEN 0 ELSE
         CAST(list_aggregate(list_transform(v, x -> {sql_micro(err)}),
                             'max') AS BIGINT) END AS max_err_micro
FROM s
"""
