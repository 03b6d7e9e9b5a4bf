"""Bitext candidate mining: margin-based cross-lingual nearest neighbors.

No reference counterpart (north-star LLM-pipeline capability): mining
parallel-text candidates across two language slices of a corpus is how
translation training pairs are built at web scale. The scorer is the
ratio margin of Artetxe & Schwenk, "Margin-based Parallel Corpus Mining
with Multilingual Sentence Embeddings" (ACL 2019): a raw cosine is
normalized by the average similarity of each side's k nearest
neighbors, so a "hub" vector that is close to everything stops winning
every pairing.

    margin(x, y) = cos(x, y) / ((avg_kNN_fwd(x) + avg_kNN_bwd(y)) / 2)

Scale shape: the TARGET side (B) is the guarded broadcast (same
MAX_BROADCAST_VECTORS discipline as the brute dedup baseline —
operators/dedup.py); the SOURCE side (A) streams through ONE
Arrow/BLAS pass that emits, per source row, its forward top-k stats
(O(|A|) rows) and, per (partition, target), the partition-local
backward top-k candidates (O(parts x |B| x k) rows — map-side combine
for the global backward top-k, which is a union-of-partition-top-ks
selection). No pair materialization, no cartesian/BNL operator in the
plan. Beyond the broadcast cap, swap the exact scorer for IVF/LSH
candidate generation (operators/similarity.py) — the margin formula is
unchanged.

Float parity: cosines are micro-quantized per pair (sign*floor(
abs*1e6+0.5), exactly operators/curation.micro_col); every aggregate
downstream (top-k sums) is exact integer arithmetic, and the one float
expression left — the margin ratio — is written token-identically in
the Spark plan and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from hash_db_spark.operators.dedup import MAX_BROADCAST_VECTORS

BITEXT_KNN = 4  # k for the margin's neighborhood normalizer
BITEXT_TOPN = 50


def _collect_side(emb: DataFrame, id_col: str, vec_col: str):
    """Guarded collect of the broadcast side: limit(cap+1) bounds the
    collect itself (guarding after an unbounded collect would OOM the
    driver on exactly the input the guard rejects)."""
    import numpy as np

    rows = (
        emb.select(id_col, vec_col).limit(MAX_BROADCAST_VECTORS + 1).collect()
    )
    if len(rows) > MAX_BROADCAST_VECTORS:
        raise ValueError(
            f"bitext target side exceeds the broadcastable exact baseline "
            f"({MAX_BROADCAST_VECTORS}); generate candidates with IVF/LSH "
            f"(operators/similarity.py) and rescore with the same margin"
        )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def margin_mine(
    src: DataFrame,
    dst: DataFrame,
    k: int = BITEXT_KNN,
    topn: int = BITEXT_TOPN,
    id_col: str = "id",
    vec_col: str = "v",
) -> DataFrame:
    """(src_id, dst_id, cos_micro, margin_micro, mutual, rank): for each
    source vector its best target under the ratio margin, the ``topn``
    highest-margin pairs overall. ``mutual`` is forward-backward
    consistency (the chosen target's own best source is this source) —
    the standard bitext precision filter.

    One Arrow pass over ``src`` computes, per source row, the forward
    top-k (best target + exact integer sum of micro-cosines) AND emits
    the partition-local backward top-k candidates per target; a single
    target-keyed reduction (<= partitions x |dst| x k rows) finishes the
    backward stats. The fwd/bwd join is on the target id — the backward
    side is bounded by the broadcast cap, so AQE broadcasts it
    unhinted."""
    import numpy as np

    spark = src.sparkSession
    ids, mat = _collect_side(dst, id_col, vec_col)
    dnorm = np.linalg.norm(mat, axis=1)
    bc = spark.sparkContext.broadcast((ids, mat, dnorm))

    def scan(batches):
        import pandas as pd

        bids, bmat, bnorm = bc.value
        nb = len(bids)
        kk = min(k, nb)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            A = np.array(list(pdf[vec_col]), dtype=np.float64)
            anorm = np.linalg.norm(A, axis=1)
            dots = A @ bmat.T
            denom = np.outer(anorm, bnorm)
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = np.where(denom == 0.0, np.nan, dots / denom)
            # micro_col semantics: sign * floor(abs * 1e6 + 0.5)
            micro = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5)
            rid = pdf[id_col].to_numpy()
            # forward rows: per source, top-k over ALL targets.
            # order: cos_micro DESC, dst_id ASC — realized by sorting a
            # composite key (micro is integer-valued, ids fit in the
            # fractional slack of a float64 key at these magnitudes is
            # NOT safe, so argsort lexicographically instead).
            f_src, f_dst, f_cos, f_sum, f_n = [], [], [], [], []
            b_dst, b_cos, b_src = [], [], []
            for i in range(len(rid)):
                row = micro[i]
                ok = ~np.isnan(row)
                if not ok.any():
                    continue
                cand_ids = bids[ok]
                cand = row[ok].astype(np.int64)
                order = np.lexsort((cand_ids, -cand))[:kk]
                f_src.append(rid[i])
                f_dst.append(cand_ids[order[0]])
                f_cos.append(cand[order[0]])
                f_sum.append(int(cand[order].sum()))
                f_n.append(len(order))
            # backward rows: per target, this partition's top-k sources.
            if len(rid):
                for j in range(nb):
                    col = micro[:, j]
                    ok = ~np.isnan(col)
                    if not ok.any():
                        continue
                    src_ids = rid[ok]
                    cand = col[ok].astype(np.int64)
                    order = np.lexsort((src_ids, -cand))[:kk]
                    b_dst.extend([bids[j]] * len(order))
                    b_cos.extend(cand[order])
                    b_src.extend(src_ids[order])
            yield pd.DataFrame(
                {
                    "kind": ["f"] * len(f_src) + ["b"] * len(b_dst),
                    "src_id": f_src + b_src,
                    "dst_id": f_dst + b_dst,
                    "cos_micro": f_cos + b_cos,
                    "fwd_sum": f_sum + [0] * len(b_dst),
                    "n_fwd": f_n + [0] * len(b_dst),
                }
            )

    # Keep the source's scan parallelism (it may be 100 TB); just never
    # exceed the cluster's slots — fewer, fatter Arrow batches, and the
    # backward-candidate fanout is partitions x |dst| x k, so gratuitous
    # tiny partitions directly inflate the reduction input.
    n_parts = max(
        1,
        min(
            src.rdd.getNumPartitions(), spark.sparkContext.defaultParallelism
        ),
    )
    scanned = (
        src.select(id_col, vec_col)
        .coalesce(n_parts)
        .mapInPandas(
            scan,
            "kind string, src_id long, dst_id long, cos_micro long, "
            "fwd_sum long, n_fwd int",
        )
    )
    scanned = scanned.localCheckpoint(eager=True)  # one Arrow pass, two consumers
    fwd = scanned.filter(F.col("kind") == "f").select(
        "src_id", "dst_id", "cos_micro", "fwd_sum", "n_fwd"
    )
    # global backward top-k = top-k of the union of partition top-ks:
    # exact selection, bounded input (partitions x |dst| x k rows).
    cand = scanned.filter(F.col("kind") == "b").select(
        "dst_id", "cos_micro", "src_id"
    )
    topk = F.slice(
        F.sort_array(
            F.collect_list(F.struct((-F.col("cos_micro")).alias("neg"),
                                    F.col("src_id"))),
        ),
        1,
        k,
    )
    bwd = (
        cand.groupBy("dst_id")
        .agg(topk.alias("tk"))
        .select(
            "dst_id",
            F.aggregate(
                "tk", F.lit(0).cast("long"), lambda acc, s: acc - s["neg"]
            ).alias("bwd_sum"),
            F.size("tk").alias("n_bwd"),
            F.element_at("tk", 1)["src_id"].alias("best_src"),
        )
    )
    margin = F.col("cos_micro").cast("double") / (
        (
            F.col("fwd_sum").cast("double") / F.col("n_fwd").cast("double")
            + F.col("bwd_sum").cast("double") / F.col("n_bwd").cast("double")
        )
        / 2.0
    )
    from hash_db_spark.operators.curation import micro_col
    from pyspark.sql import Window

    scored = (
        fwd.join(bwd, "dst_id")  # bwd bounded by the broadcast cap: AQE
        .select(
            "src_id",
            "dst_id",
            "cos_micro",
            micro_col(margin).alias("margin_micro"),
            (F.col("best_src") == F.col("src_id")).alias("mutual"),
        )
    )
    top = scored.orderBy(
        F.col("margin_micro").desc(), F.col("src_id").asc()
    ).limit(topn)
    w = Window.orderBy(F.col("margin_micro").desc(), F.col("src_id").asc())
    return top.withColumn("rank", F.row_number().over(w))


def sql_margin_mine(
    src_lang: str,
    dst_lang: str,
    k: int = BITEXT_KNN,
    topn: int = BITEXT_TOPN,
) -> str:
    """DuckDB oracle over documents+embeddings (vec_id == doc_id): the
    same margin, from an explicit pair CTE."""
    from hash_db_spark.operators.curation import sql_micro

    margin = (
        "CAST(f.best_cos AS DOUBLE) / ("
        "(CAST(f.fwd_sum AS DOUBLE) / CAST(f.n_fwd AS DOUBLE)"
        " + CAST(b.bwd_sum AS DOUBLE) / CAST(b.n_bwd AS DOUBLE)) / 2.0)"
    )
    return f"""
WITH sides AS (
  SELECT e.vec_id AS id, e.embedding::DOUBLE[] AS v, d.lang
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
),
pairs AS (
  SELECT a.id AS src_id, b.id AS dst_id,
         {sql_micro('list_cosine_similarity(a.v, b.v)')} AS cos_micro
  FROM sides a, sides b
  WHERE a.lang = '{src_lang}' AND b.lang = '{dst_lang}'
    AND list_cosine_similarity(a.v, b.v) IS NOT NULL
),
rkf AS (
  SELECT *, row_number() OVER (
           PARTITION BY src_id ORDER BY cos_micro DESC, dst_id ASC) AS r
  FROM pairs
),
fwd AS (
  SELECT src_id,
         max(CASE WHEN r = 1 THEN dst_id END) AS dst_id,
         max(CASE WHEN r = 1 THEN cos_micro END) AS best_cos,
         sum(cos_micro) AS fwd_sum, count(*) AS n_fwd
  FROM rkf WHERE r <= {k} GROUP BY src_id
),
rkb AS (
  SELECT *, row_number() OVER (
           PARTITION BY dst_id ORDER BY cos_micro DESC, src_id ASC) AS r
  FROM pairs
),
bwd AS (
  SELECT dst_id,
         max(CASE WHEN r = 1 THEN src_id END) AS best_src,
         sum(cos_micro) AS bwd_sum, count(*) AS n_bwd
  FROM rkb WHERE r <= {k} GROUP BY dst_id
),
scored AS (
  SELECT f.src_id, f.dst_id, f.best_cos AS cos_micro,
         {sql_micro(margin)} AS margin_micro,
         (b.best_src = f.src_id) AS mutual
  FROM fwd f JOIN bwd b ON f.dst_id = b.dst_id
)
SELECT src_id, dst_id, cos_micro, margin_micro, mutual,
       CAST(row_number() OVER (
            ORDER BY margin_micro DESC, src_id ASC) AS INT) AS rank
FROM scored
ORDER BY margin_micro DESC, src_id ASC
LIMIT {topn}
"""
