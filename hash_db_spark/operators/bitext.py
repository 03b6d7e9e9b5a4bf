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
    # ascending id order: the scan's composite sort keys use the COLUMN
    # INDEX as the (cos DESC, dst_id ASC) tie-break, which is only the
    # id order because of this sort
    order = np.argsort(ids)
    return ids[order], mat[order]


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
        # bids are collected SORTED ascending, so the column index IS
        # the dst_id tie-break order; (cos DESC, id ASC) then packs
        # into one integer key per cell and every top-k below is a
        # vectorized argpartition — the first (per-row lexsort loop)
        # version cost O(rows * nb log nb) in Python and hung the 100x
        # probe; this one is O(rows * nb) alongside the BLAS pass.
        INVALID = -(1 << 31)  # NaN cosine -> sorts after every real cell
        M0 = 2_000_001  # > max |micro|: keeps (M0 - micro) positive
        shift_b = max(1, (nb - 1).bit_length())

        def topk_rows(keys, kkk):
            """Per-row ascending top-kkk of an int64 key matrix:
            (indices, ordered keys)."""
            part = np.argpartition(keys, kkk - 1, axis=1)[:, :kkk]
            got = np.take_along_axis(keys, part, axis=1)
            order = np.argsort(got, axis=1, kind="stable")
            return np.take_along_axis(part, order, axis=1)

        # running per-target backward top-k, merged across row blocks so
        # the partition emits its backward candidates ONCE (fanout stays
        # partitions x |dst| x k however many blocks stream through).
        # Tie-break is (cos DESC, src_id ASC) via two stable argsorts.
        ID_LAST = np.iinfo(np.int64).max
        run_cos = np.full((nb, k), INVALID, dtype=np.int64)
        run_src = np.full((nb, k), ID_LAST, dtype=np.int64)
        # row-block size bounds the dense score block (~40 B/cell across
        # the dot/cos/micro temporaries): 4M cells ~ 160 MB per worker —
        # the unblocked version allocated batch_rows x |dst| and crashed
        # the Python worker at the 100x probe.
        rows_per_block = max(1, 4_000_000 // max(nb, 1))

        def merge_bwd(sel_cos, sel_src):
            nonlocal run_cos, run_src
            cat_cos = np.hstack([run_cos, sel_cos])
            cat_src = np.hstack([run_src, sel_src])
            o1 = np.argsort(cat_src, axis=1, kind="stable")
            cat_cos = np.take_along_axis(cat_cos, o1, axis=1)
            cat_src = np.take_along_axis(cat_src, o1, axis=1)
            o2 = np.argsort(-cat_cos, axis=1, kind="stable")
            run_cos = np.take_along_axis(cat_cos, o2, axis=1)[:, :k]
            run_src = np.take_along_axis(cat_src, o2, axis=1)[:, :k]

        for pdf in batches:
            rid_all = pdf[id_col].to_numpy()
            for lo in range(0, len(rid_all), rows_per_block):
                sl = slice(lo, lo + rows_per_block)
                rid = rid_all[sl]
                if len(rid) == 0:
                    continue
                A = np.array(list(pdf[vec_col].iloc[sl]), dtype=np.float64)
                anorm = np.linalg.norm(A, axis=1)
                dots = A @ bmat.T
                denom = np.outer(anorm, bnorm)
                with np.errstate(invalid="ignore", divide="ignore"):
                    cos = np.where(denom == 0.0, np.nan, dots / denom)
                # micro_col semantics: sign * floor(abs * 1e6 + 0.5)
                microf = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5)
                valid = ~np.isnan(microf)
                micro = np.where(
                    valid, np.nan_to_num(microf), INVALID
                ).astype(np.int64)
                nr = len(rid)
                # forward: per source row, top-kk over all targets
                key_f = ((M0 - micro) << shift_b) + np.arange(
                    nb, dtype=np.int64
                )
                idx_f = topk_rows(key_f, kk)
                top_cos = np.take_along_axis(micro, idx_f, axis=1)
                top_ok = np.take_along_axis(valid, idx_f, axis=1)
                n_fwd = top_ok.sum(axis=1).astype(np.int64)
                keep = n_fwd > 0  # all-undefined rows drop
                f_src = rid[keep]
                # valid cells sort before INVALID: column 0 is the best
                f_dst = bids[idx_f[keep, 0]]
                f_cos = top_cos[keep, 0]
                f_sum = np.where(top_ok, top_cos, 0).sum(axis=1)[keep]
                f_n = n_fwd[keep]
                if len(f_src):
                    yield pd.DataFrame(
                        {
                            "kind": ["f"] * len(f_src),
                            "src_id": f_src,
                            "dst_id": f_dst,
                            "cos_micro": f_cos,
                            "fwd_sum": f_sum,
                            "n_fwd": f_n.astype(np.int32),
                        }
                    )
                # backward: block-local top-k per target, merged into
                # the running per-partition top-k
                rank = np.empty(nr, dtype=np.int64)
                rank[np.argsort(rid)] = np.arange(nr, dtype=np.int64)
                kk_r = min(k, nr)
                shift_r = max(1, (nr - 1).bit_length())
                key_b = ((M0 - micro.T) << shift_r) + rank[None, :]
                idx_b = topk_rows(key_b, kk_r)  # nb x kk_r row indices
                sel_cos = np.take_along_axis(micro.T, idx_b, axis=1)
                sel_ok = np.take_along_axis(valid.T, idx_b, axis=1)
                sel_src = np.where(sel_ok, rid[idx_b], ID_LAST)
                merge_bwd(np.where(sel_ok, sel_cos, INVALID), sel_src)
        mask = (run_cos != INVALID).ravel()
        if mask.any():
            yield pd.DataFrame(
                {
                    "kind": ["b"] * int(mask.sum()),
                    "src_id": run_src.ravel()[mask],
                    "dst_id": np.repeat(bids, k)[mask],
                    "cos_micro": run_cos.ravel()[mask],
                    "fwd_sum": np.zeros(int(mask.sum()), dtype=np.int64),
                    "n_fwd": np.zeros(int(mask.sum()), dtype=np.int32),
                }
            )

    # The scan is the quadratic part (|src| x |dst| exact cosines), so
    # its parallelism decides the wall clock: spread an
    # under-partitioned source across every slot (the 100x probe's
    # 2-partition parquet ran 2 workers for 400s; the repartition
    # shuffle of id+vector rows is noise next to that), and cap an
    # over-partitioned one at the slot count for fat Arrow batches.
    # Backward-candidate fanout stays partitions x |dst| x k TOTAL —
    # the scan merges its per-target top-k across blocks and emits
    # once per partition — so extra partitions cost only that.
    slots = spark.sparkContext.defaultParallelism
    cur = src.rdd.getNumPartitions()
    sel = src.select(id_col, vec_col)
    sel = sel.repartition(slots) if cur < slots else sel.coalesce(slots)
    scanned = (
        sel
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


# --- IVF-composed margin mining (the 100 TB headline path) --------------------
#
# Beyond the broadcast cap, candidate generation becomes coarse-quantized
# IVF (the FAISS/CCMatrix shape): a small centroid dimension partitions
# both language slices into cells, candidates are the per-cell cross of
# source probes x target inverted list, and the SAME Artetxe-Schwenk
# margin rescoring runs over candidates only. Nothing corpus-sized is
# ever collected or broadcast — the only collect is the centroid
# dimension (strided target subset, capped like topk_ivf's).

BITEXT_IVF_STRIDE = 8  # centroids = dst ids with id % stride == 0
BITEXT_IVF_NPROBE = 2
BITEXT_CELL_CAP = 4096  # inverted-list truncation (FAISS list cap)


def _centroid_dim(
    dst: DataFrame,
    id_col: str,
    vec_col: str,
    stride: int,
    centroids: DataFrame | None = None,
):
    """Centroid dimension — deterministic, oracle-replayable, and
    bounded: limit(cap+1) bounds the collect itself (the topk_ivf
    discipline, operators/similarity.py). The default strided target
    subset keeps the DuckDB twin exact but GROWS with the corpus
    (assignment cost O(N * N/stride) — visible at the 100x probe);
    production passes a fixed-size offline k-means artifact via
    ``centroids`` (e.g. clustering.kmeans_fit's centroid frame), which
    makes assignment O(N * k) and the whole miner linear."""
    import numpy as np

    from hash_db_spark.operators.similarity import MAX_IVF_CENTROIDS

    source = (
        centroids.select(id_col, vec_col)
        if centroids is not None
        else dst.filter(F.col(id_col) % stride == 0).select(id_col, vec_col)
    )
    rows = source.limit(MAX_IVF_CENTROIDS + 1).collect()
    if len(rows) > MAX_IVF_CENTROIDS:
        raise ValueError(
            f"centroid set exceeds the broadcastable bound "
            f"({MAX_IVF_CENTROIDS}); raise `stride` or pass an offline "
            "k-means artifact via `centroids`"
        )
    if not rows:
        raise ValueError(
            "no centroid ids at this stride; lower `stride` so the "
            "target slice hits at least one id % stride == 0"
        )
    rows = sorted(rows, key=lambda r: r[0])
    cids = np.array([r[0] for r in rows], dtype=np.int64)
    cmat = np.array([r[1] for r in rows], dtype=np.float64)
    return cids, cmat, np.linalg.norm(cmat, axis=1)


def _assign_cells(
    side: DataFrame, bc, nprobe: int, id_col: str, vec_col: str
) -> DataFrame:
    """(cell, id, v): each row tagged with its `nprobe` nearest centroid
    cells — one Arrow pass, map-side only. Micro-quantized cosines with
    (cos DESC, cid ASC) ties, exactly the SQL twin's row_number order;
    zero-norm rows (undefined cosine everywhere) drop, matching the
    oracle's IS NOT NULL."""
    import numpy as np

    def block(batches):
        import pandas as pd

        cids, cmat, cnorm = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.array(list(pdf[vec_col]), dtype=np.float64)
            vn = np.linalg.norm(V, axis=1)
            denom = np.outer(vn, cnorm)
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = np.where(denom == 0.0, np.nan, (V @ cmat.T) / denom)
            micro = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5)
            valid = ~np.isnan(micro)
            key = np.where(valid, micro, -np.inf)
            # stable argsort on -key: ties keep ascending column order,
            # and columns are cid-ascending (sorted at collect)
            order = np.argsort(-key, axis=1, kind="stable")[
                :, : min(nprobe, len(cids))
            ]
            ok = np.take_along_axis(valid, order, axis=1)
            ri, pi = np.nonzero(ok)
            if len(ri) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    "cell": cids[order[ri, pi]],
                    "id": ids[ri],
                    "v": pdf[vec_col].to_numpy()[ri],
                }
            )

    return side.select(id_col, vec_col).mapInPandas(
        block, "cell long, id long, v array<double>"
    )


def ivf_candidate_pairs(
    src: DataFrame,
    dst: DataFrame,
    stride: int = BITEXT_IVF_STRIDE,
    nprobe: int = BITEXT_IVF_NPROBE,
    cell_cap: int = BITEXT_CELL_CAP,
    id_col: str = "id",
    vec_col: str = "v",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(src_id, dst_id, cos_micro): the IVF candidate generator —
    coarse cells off the strided target subset, source probes its
    ``nprobe`` nearest cells, target inverted lists truncated at
    ``cell_cap`` (deterministically by id), pairs scored by one
    cogrouped Arrow/BLAS block per cell. Exposed separately so the
    plan test can pin the cogroup stage (margin_mine_ivf's lazy
    checkpoint hides upstream operators from the final plan)."""
    import numpy as np

    from pyspark.sql import Window

    spark = src.sparkSession
    bc = spark.sparkContext.broadcast(
        _centroid_dim(dst, id_col, vec_col, stride, centroids)
    )
    a_cells = _assign_cells(src, bc, nprobe, id_col, vec_col)
    b_cells = _assign_cells(dst, bc, 1, id_col, vec_col)
    wcap = Window.partitionBy("cell").orderBy(F.col("id").asc())
    b_cells = (
        b_cells.withColumn("lr", F.row_number().over(wcap))
        .filter(F.col("lr") <= cell_cap)
        .drop("lr")
    )

    def score(left, right):
        import pandas as pd

        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {"src_id": [], "dst_id": [], "cos_micro": []}
            ).astype({"src_id": "int64", "dst_id": "int64",
                      "cos_micro": "int64"})
        A = np.array(list(left["v"]), dtype=np.float64)
        Bm = np.array(list(right["v"]), dtype=np.float64)
        an, bn = np.linalg.norm(A, axis=1), np.linalg.norm(Bm, axis=1)
        denom = np.outer(an, bn)
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = np.where(denom == 0.0, np.nan, (A @ Bm.T) / denom)
        micro = np.sign(cos) * np.floor(np.abs(cos) * 1e6 + 0.5)
        ri, ci = np.nonzero(~np.isnan(micro))
        return pd.DataFrame(
            {
                "src_id": left["id"].to_numpy()[ri],
                "dst_id": right["id"].to_numpy()[ci],
                "cos_micro": micro[ri, ci].astype(np.int64),
            }
        )

    return (
        a_cells.groupBy("cell")
        .cogroup(b_cells.groupBy("cell"))
        .applyInPandas(
            score, "src_id long, dst_id long, cos_micro long"
        )
    )


def margin_mine_ivf(
    src: DataFrame,
    dst: DataFrame,
    k: int = BITEXT_KNN,
    topn: int = BITEXT_TOPN,
    stride: int = BITEXT_IVF_STRIDE,
    nprobe: int = BITEXT_IVF_NPROBE,
    cell_cap: int = BITEXT_CELL_CAP,
    id_col: str = "id",
    vec_col: str = "v",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """margin_mine's output contract over IVF-generated candidates —
    the shape that scales past the exact baseline's broadcast cap
    (VERDICT r10 #5): candidate pairs are the per-cell cross of source
    probes (nprobe cells each) x the target inverted list (truncated
    at ``cell_cap`` rows per cell, deterministically by id — the FAISS
    list-cap idea, and the house hot-key rule for this pair emitter),
    scored by ONE cogrouped Arrow/BLAS block per cell. The margin's
    kNN normalizers run over the candidate set (the standard IVF
    approximation: CCMatrix mines this way).

    Plan shape at 100 TB: two map-side assignment passes, one
    cell-keyed cogroup shuffle (each side shuffles ONCE on cell), the
    per-src / per-dst top-k windows over candidates, and a join of two
    candidate-bounded stat frames. No corpus-sized broadcast or
    collect anywhere — the centroid dimension is the only driver-held
    object (tests/test_bitext.py pins the plan)."""
    from pyspark.sql import Window

    from hash_db_spark.operators.curation import micro_col

    pairs = ivf_candidate_pairs(
        src, dst, stride, nprobe, cell_cap, id_col, vec_col, centroids
    )
    # two window consumers (fwd + bwd) — pin the cogroup to one run
    pairs = pairs.localCheckpoint(eager=False)
    wf = Window.partitionBy("src_id").orderBy(
        F.col("cos_micro").desc(), F.col("dst_id").asc()
    )
    fwd = (
        pairs.withColumn("r", F.row_number().over(wf))
        .filter(F.col("r") <= k)
        .groupBy("src_id")
        .agg(
            F.max(F.when(F.col("r") == 1, F.col("dst_id"))).alias("dst_id"),
            F.max(F.when(F.col("r") == 1, F.col("cos_micro"))).alias(
                "cos_micro"
            ),
            F.sum("cos_micro").alias("fwd_sum"),
            F.count(F.lit(1)).alias("n_fwd"),
        )
    )
    wb = Window.partitionBy("dst_id").orderBy(
        F.col("cos_micro").desc(), F.col("src_id").asc()
    )
    bwd = (
        pairs.withColumn("r", F.row_number().over(wb))
        .filter(F.col("r") <= k)
        .groupBy("dst_id")
        .agg(
            F.max(F.when(F.col("r") == 1, F.col("src_id"))).alias(
                "best_src"
            ),
            F.sum("cos_micro").alias("bwd_sum"),
            F.count(F.lit(1)).alias("n_bwd"),
        )
    )
    margin = F.col("cos_micro").cast("double") / (
        (
            F.col("fwd_sum").cast("double") / F.col("n_fwd").cast("double")
            + F.col("bwd_sum").cast("double") / F.col("n_bwd").cast("double")
        )
        / 2.0
    )
    scored = fwd.join(bwd, "dst_id").select(
        "src_id",
        "dst_id",
        "cos_micro",
        micro_col(margin).alias("margin_micro"),
        (F.col("best_src") == F.col("src_id")).alias("mutual"),
    )
    top = scored.orderBy(
        F.col("margin_micro").desc(), F.col("src_id").asc()
    ).limit(topn)
    w = Window.orderBy(F.col("margin_micro").desc(), F.col("src_id").asc())
    return top.withColumn("rank", F.row_number().over(w))


def sql_margin_mine_ivf(
    src_lang: str,
    dst_lang: str,
    k: int = BITEXT_KNN,
    topn: int = BITEXT_TOPN,
    stride: int = BITEXT_IVF_STRIDE,
    nprobe: int = BITEXT_IVF_NPROBE,
    cell_cap: int = BITEXT_CELL_CAP,
) -> str:
    """DuckDB twin of margin_mine_ivf: the IVF assignment replayed as
    explicit row_number CTEs, the margin tail identical to
    sql_margin_mine's."""
    from hash_db_spark.operators.curation import sql_micro

    asn_cos = sql_micro("list_cosine_similarity(s.v, c.cv)")
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
a AS (SELECT id, v FROM sides WHERE lang = '{src_lang}'),
b AS (SELECT id, v FROM sides WHERE lang = '{dst_lang}'),
cent AS (SELECT id AS cid, v AS cv FROM b WHERE id % {stride} = 0),
a_asn AS (
  SELECT id, v, cid FROM (
    SELECT s.id, s.v, c.cid,
           row_number() OVER (PARTITION BY s.id
             ORDER BY {asn_cos} DESC, c.cid ASC) AS r
    FROM a s, cent c
    WHERE list_cosine_similarity(s.v, c.cv) IS NOT NULL
  ) WHERE r <= {nprobe}
),
b_asn0 AS (
  SELECT id, v, cid FROM (
    SELECT s.id, s.v, c.cid,
           row_number() OVER (PARTITION BY s.id
             ORDER BY {asn_cos} DESC, c.cid ASC) AS r
    FROM b s, cent c
    WHERE list_cosine_similarity(s.v, c.cv) IS NOT NULL
  ) WHERE r = 1
),
b_asn AS (
  SELECT id, v, cid FROM (
    SELECT *, row_number() OVER (PARTITION BY cid ORDER BY id ASC) AS lr
    FROM b_asn0
  ) WHERE lr <= {cell_cap}
),
pairs AS (
  SELECT x.id AS src_id, y.id AS dst_id,
         {sql_micro('list_cosine_similarity(x.v, y.v)')} AS cos_micro
  FROM a_asn x JOIN b_asn y USING (cid)
  WHERE list_cosine_similarity(x.v, y.v) IS NOT NULL
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
