"""Driver-checkable queries: similarity search (SURVEY §7 Phase 6) over
the embeddings fixture. Query set = vec_ids 0..7, k=5."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.operators import similarity as S
from hash_db_spark.queries import Query

QUERY_IDS = list(range(8))
K = 5


def q_sim_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.topk_bruteforce(
        load_table(spark, sf_dir, "embeddings"), QUERY_IDS, k=K
    )


def q_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negatives: 3 content-addressed draws per
    query (stable across runs/engines/partitionings), scored with the
    query-negative cosine; self-collisions remap deterministically."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.negative_samples(
        emb.filter(emb.vec_id < 20), emb, k=3
    )


def q_sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.topk_lsh(load_table(spark, sf_dir, "embeddings"), QUERY_IDS, k=K)


def q_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.topk_ivf(load_table(spark, sf_dir, "embeddings"), QUERY_IDS, k=K)


def q_sim_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF fed by the offline k-means centroid artifact (the 100 TB
    wiring: the centroid table is computed once by clustering and
    supplied, instead of growing a strided corpus subset)."""
    from hash_db_spark.operators import clustering as C

    emb = load_table(spark, sf_dir, "embeddings")
    cents = C.kmeans_centroids(emb, k=8)
    return S.topk_ivf(emb, QUERY_IDS, k=K, nprobe=2, centroids=cents)


def _ivf_kmeans_oracle() -> str:
    from hash_db_spark.operators import clustering as C

    return S.sql_topk_ivf(
        QUERY_IDS, k=K, nprobe=2, cents_ctes=C.sql_kmeans_cents_ctes(k=8)
    )


def q_sim_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.topk_quantized(
        load_table(spark, sf_dir, "embeddings"), QUERY_IDS, k=K
    )


SEMDEDUP_T = 0.4  # fixture near-dups live at cos >= 0.4 (COSINE_T)


def q_semdedup_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: k-means-bucketed semantic dedup over the embeddings
    table — dropped vec_ids with the kept representative (min id per
    transitively-closed within-cluster duplicate set)."""
    return S.semdedup_drop(
        load_table(spark, sf_dir, "embeddings"), threshold=SEMDEDUP_T
    )


def q_sim_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality audit: per query, how many of the exact brute-force
    top-k the LSH and IVF paths each recovered — the recall@k
    measurement that picks nprobe/band width before an index ships.
    All three runs are deterministic, so the report itself is
    oracle-exact (recall = hits / n_exact downstream).

    Scale shape: brute force here scores ONLY the 8 audit queries — the
    standard sampled-recall protocol; the corpus-wide cost stays the
    ANN paths' own."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = S.topk_bruteforce(emb, QUERY_IDS, k=K).select("qid", "vec_id")
    lsh = S.topk_lsh(emb, QUERY_IDS, k=K).select(
        "qid", "vec_id", F.lit(1).alias("__l")
    )
    ivf = S.topk_ivf(emb, QUERY_IDS, k=K).select(
        "qid", "vec_id", F.lit(1).alias("__i")
    )
    return (
        exact.join(lsh, ["qid", "vec_id"], "left")
        .join(ivf, ["qid", "vec_id"], "left")
        .groupBy("qid")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum(F.coalesce("__l", F.lit(0))).cast("long").alias("lsh_hits"),
            F.sum(F.coalesce("__i", F.lit(0))).cast("long").alias("ivf_hits"),
        )
    )


def _sim_recall_oracle() -> str:
    return f"""
WITH exact AS (SELECT qid, vec_id FROM ({S.sql_topk_bruteforce(QUERY_IDS, k=K)}) x),
l AS (SELECT qid, vec_id FROM ({S.sql_topk_lsh(QUERY_IDS, k=K)}) x),
i AS (SELECT qid, vec_id FROM ({S.sql_topk_ivf(QUERY_IDS, k=K)}) x)
SELECT e.qid, count(*) AS n_exact,
       CAST(count(l.vec_id) AS BIGINT) AS lsh_hits,
       CAST(count(i.vec_id) AS BIGINT) AS ivf_hits
FROM exact e
LEFT JOIN l ON l.qid = e.qid AND l.vec_id = e.vec_id
LEFT JOIN i ON i.qid = e.qid AND i.vec_id = e.vec_id
GROUP BY e.qid
"""


def q_sim_topk_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN served from the PERSISTED IVF artifact (build once, probe
    with partition pruning) — result-identical to the inline
    kmeans-wired IVF, so it shares that oracle. The index lands at a
    DETERMINISTIC per-sf path and is overwritten in place (a fresh
    mkdtemp per call would leak one full index copy per run)."""
    import hashlib
    import tempfile

    from hash_db_spark.sources.writers import write_ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/hash_db_spark_ivf_{tag}"
    write_ivf_index(emb, path, k=8)
    return S.topk_ivf_persisted(spark, path, QUERY_IDS, k=K)


def q_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hash_db_spark.operators import clustering as C

    return C.kmeans_assign(load_table(spark, sf_dir, "embeddings"))


def _kmeans_oracle() -> str:
    from hash_db_spark.operators import clustering as C

    return C.sql_kmeans_assign()


TRUNC_DIMS = (16, 32)  # prefix widths audited against the full 64


def q_sim_recall_truncated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truncated-dimension recall audit (the Matryoshka-representation
    question, Kusupati et al. 2022, arXiv:2205.13147 — public): per
    query, how many of the full-dimension exact top-k survive when
    cosine runs on only the first 16 / 32 of 64 dims. This is the
    measurement that decides whether an index can store prefix vectors
    (2-4x less memory and IO at 100 TB) and rerank with full vectors.

    Scale shape is the sampled-recall protocol of sim_recall_report:
    every path scores ONLY the audit queries (broadcast-queries x
    corpus projection), never corpus x corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = S.topk_bruteforce(emb, QUERY_IDS, k=K).select("qid", "vec_id")
    out = exact
    for d in TRUNC_DIMS:
        t = emb.select(
            "vec_id", F.slice("embedding", 1, d).alias("embedding")
        )
        tk = S.topk_bruteforce(t, QUERY_IDS, k=K).select(
            "qid", "vec_id", F.lit(1).alias(f"__d{d}")
        )
        out = out.join(tk, ["qid", "vec_id"], "left")
    return out.groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_exact"),
        *[
            F.sum(F.coalesce(f"__d{d}", F.lit(0)))
            .cast("long")
            .alias(f"d{d}_hits")
            for d in TRUNC_DIMS
        ],
    )


def _sim_recall_truncated_oracle() -> str:
    trunc = {
        d: S.sql_topk_bruteforce(
            QUERY_IDS,
            k=K,
            table=(
                f"(SELECT vec_id, embedding[1:{d}] AS embedding "
                "FROM embeddings)"
            ),
        )
        for d in TRUNC_DIMS
    }
    ctes = ",\n".join(
        f"t{d} AS (SELECT qid, vec_id FROM ({sql}) x)"
        for d, sql in trunc.items()
    )
    joins = "\n".join(
        f"LEFT JOIN t{d} ON t{d}.qid = e.qid AND t{d}.vec_id = e.vec_id"
        for d in TRUNC_DIMS
    )
    hits = ",\n       ".join(
        f"CAST(count(t{d}.vec_id) AS BIGINT) AS d{d}_hits"
        for d in TRUNC_DIMS
    )
    return f"""
WITH exact AS (
  SELECT qid, vec_id FROM ({S.sql_topk_bruteforce(QUERY_IDS, k=K)}) x
),
{ctes}
SELECT e.qid, count(*) AS n_exact,
       {hits}
FROM exact e
{joins}
GROUP BY e.qid
"""


def q_train_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DPR-style hard-negative mining for contrastive training pairs:
    per audit query, the 3 neighbors ranked just below the top-2
    positives (operators/similarity.py:hard_negatives)."""
    return S.hard_negatives(
        load_table(spark, sf_dir, "embeddings"), QUERY_IDS, n_pos=2, k=3
    )


def q_train_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exported contrastive-training table, end to end: per anchor
    query its top-1 POSITIVE (exact), 2 HARD negatives (ranks 2-3, the
    DPR recipe), and 2 content-addressed RANDOM negatives — one row per
    (anchor, role, candidate) with the anchor-candidate cosine. Pure
    composition of three proven operators; at corpus scale the brute
    scorer swaps for IVF/PQ and the random draw stays O(anchors)."""
    emb = load_table(spark, sf_dir, "embeddings")
    pos = S.topk_bruteforce(emb, QUERY_IDS, k=1).select(
        "qid",
        F.lit("pos").alias("role"),
        F.col("vec_id").alias("cand_id"),
        "cos",
        F.lit(1).cast("int").alias("slot"),
    )
    hard = S.hard_negatives(emb, QUERY_IDS, n_pos=1, k=2).select(
        "qid",
        F.lit("hard_neg").alias("role"),
        F.col("neg_id").alias("cand_id"),
        "cos",
        F.col("neg_rank").alias("slot"),
    )
    rand = S.negative_samples(
        emb.filter(F.col("vec_id").isin(QUERY_IDS)), emb, k=2
    ).select(
        "qid",
        F.lit("rand_neg").alias("role"),
        F.col("neg_id").alias("cand_id"),
        "cos",
        F.col("j").cast("int").alias("slot"),
    )
    return pos.union(hard).union(rand)


def _contrastive_pairs_oracle() -> str:
    pos = S.sql_topk_bruteforce(QUERY_IDS, k=1)
    hard = S.sql_hard_negatives(QUERY_IDS, n_pos=1, k=2)
    rand = S.sql_negative_samples(k=2, max_qid=len(QUERY_IDS))
    return f"""
SELECT qid, 'pos' AS role, vec_id AS cand_id, cos, 1::INT AS slot
FROM ({pos}) p
UNION ALL
SELECT qid, 'hard_neg', neg_id, cos, neg_rank FROM ({hard}) h
UNION ALL
SELECT qid, 'rand_neg', neg_id, cos, j::INT FROM ({rand}) r
"""


def q_sim_topk_ivf_published(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN served through the ATOMIC publication protocol
    (sources/writers.py:publish_index): the IVF artifact stages as a
    whole new version, the 1-row pointer flip is the commit point, and
    the probe reads the pinned version dir — a rebuild can never leave
    a prober combining cells and centroids from different builds.
    Result-identical to sim_topk_ivf_persisted, so it shares that
    oracle."""
    import hashlib
    import tempfile

    from hash_db_spark.sources.writers import (
        publish_index,
        published_dir,
        write_ivf_index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/hash_db_spark_ivfpub_{tag}"
    publish_index(spark, path, lambda d: write_ivf_index(emb, d, k=8))
    return S.topk_ivf_persisted(spark, published_dir(spark, path), QUERY_IDS, k=K)


def q_sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-k: 64-dim embeddings compressed to 4 one-byte codes,
    queries scored against codes via exact-integer distance tables —
    the memory-bounded ANN path for corpora whose vectors don't fit."""
    from hash_db_spark.operators import pq

    return pq.topk_pq(load_table(spark, sf_dir, "embeddings"), QUERY_IDS, k=K)


def _pq_oracle() -> str:
    from hash_db_spark.operators import pq

    return pq.sql_topk_pq(QUERY_IDS, k=K)


def q_sim_topk_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ: k-means cell pruning over PQ codes — a query reads
    ~nprobe/cells of the corpus as m-byte codes (the serveable-at-
    100 TB ANN composition)."""
    from hash_db_spark.operators import pq

    return pq.topk_ivf_pq(
        load_table(spark, sf_dir, "embeddings"), QUERY_IDS, k=K
    )


def _ivf_pq_oracle() -> str:
    from hash_db_spark.operators import pq

    return pq.sql_topk_ivf_pq(QUERY_IDS, k=K)


def q_stream_pq_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANN: the query vectors arrive as a stream; each
    micro-batch probes the persisted IVF-PQ index and appends its
    top-k. availableNow single batch == the inline IVF-PQ result (the
    shared oracle); at 100 TB the same query runs continuously with the
    index as external state."""
    import hashlib
    import tempfile

    import pyspark.sql.functions as F2

    from hash_db_spark.sources.writers import write_pq_index
    from hash_db_spark.streaming import windows as SW

    emb = load_table(spark, sf_dir, "embeddings")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    index_path = f"{tempfile.gettempdir()}/hash_db_spark_pqidx_{tag}"
    write_pq_index(emb, index_path)
    queries = SW.read_embeddings_stream(spark, sf_dir).filter(
        F2.col("vec_id").isin(QUERY_IDS)
    )
    # probe output/checkpoint are per-run scratch (40 rows); the INDEX
    # is the deterministic reused artifact
    scratch = tempfile.mkdtemp(prefix="pq_probe_")
    q = SW.streaming_pq_probe(
        queries, index_path, f"{scratch}/out", f"{scratch}/ckpt", k=K
    )
    q.awaitTermination()
    return spark.read.parquet(f"{scratch}/out")


def q_sim_topk_pq_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN served from the persisted IVF-PQ artifact (codes partitioned
    by cell; a probe reads nprobe directories of 4-byte codes).
    Deterministic per-sf path, overwritten in place — the
    sim_topk_ivf_persisted leak-avoidance pattern."""
    import hashlib
    import tempfile

    from hash_db_spark.sources.writers import pq_index_topk, write_pq_index

    emb = load_table(spark, sf_dir, "embeddings")
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    path = f"{tempfile.gettempdir()}/hash_db_spark_pqidx_{tag}"
    write_pq_index(emb, path)
    return pq_index_topk(
        spark, path, emb.filter(F.col("vec_id").isin(QUERY_IDS)), k=K
    )


# The QUERIES literal lives at module tail so every registered fn is
# already bound; compute_reverify explodes it per-entry either way.


# --- greedy k-center coreset ---------------------------------------------------


KCENTER_K = 8


def q_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embeddings (Gonzalez 1985
    farthest-point traversal; Sener & Savarese ICLR 2018 as a data-
    selection coreset): k sequential map-side passes, each ending in a
    TakeOrderedAndProject(1) — nothing corpus-sized ever shuffles. The
    gap_micro column is the covering-radius curve."""
    from hash_db_spark.operators import clustering as CL

    return CL.kcenter_select(
        load_table(spark, sf_dir, "embeddings"), k=KCENTER_K
    )


def _kcenter_oracle() -> str:
    from hash_db_spark.operators import clustering as CL

    return CL.sql_kcenter_select(KCENTER_K)


def _int8_quant_oracle() -> str:
    from hash_db_spark.operators import pq

    return pq.sql_int8_quant_report()


def q_embedding_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Affine int8 compression report for the embedding column (the
    ONNX/TFLite scale/zero-point convention): exact code checksum +
    micro-quantized worst reconstruction error per vector. Map-side
    only — the 8x storage cut costs no shuffle."""
    from hash_db_spark.operators import pq

    return pq.int8_quant_report(load_table(spark, sf_dir, "embeddings"))


BITEXT_SRC_LANG = "en"
BITEXT_DST_LANG = "fr"


def _bitext_sides(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    sides = emb.join(docs, emb.vec_id == docs.doc_id).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v"),
        "lang",
    )
    return (
        sides.filter(F.col("lang") == BITEXT_SRC_LANG).drop("lang"),
        sides.filter(F.col("lang") == BITEXT_DST_LANG).drop("lang"),
    )


def q_bitext_margin_mine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-kNN bitext candidate mining (Artetxe & Schwenk, ACL 2019)
    between the corpus's 'en' and 'fr' slices: for every English doc
    vector its best French counterpart under the ratio margin, with the
    mutual (forward-backward consistent) flag — the table a translation-
    pair curation stage starts from. Registered as the IVF-COMPOSED
    form (VERDICT r10 #5): coarse-quantized candidate generation +
    margin rescore, no corpus-sized broadcast or collect anywhere
    (operators/bitext.py:margin_mine_ivf; the broadcast-exact
    margin_mine stays as the small-side baseline, still exercised by
    bitext_length_filter and tests/test_bitext.py)."""
    from hash_db_spark.operators import bitext as B

    src, dst = _bitext_sides(spark, sf_dir)
    return B.margin_mine_ivf(src, dst)


def _bitext_oracle() -> str:
    from hash_db_spark.operators import bitext as B

    return B.sql_margin_mine_ivf(BITEXT_SRC_LANG, BITEXT_DST_LANG)


# r12 QUEUE CANDIDATE (the r11 queue closed at 34 — session 7;
# headline switched to the IVF composition per VERDICT r10 #5):
#   "bitext_margin_mine": Query(q_bitext_margin_mine, _bitext_oracle()),


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space garbage detector: the 50 vectors farthest from
    their nearest k-means centroid (lowest best-cosine) — the
    off-distribution tail a curation stage drops before training; the
    density complement of semdedup_drop
    (operators/clustering.py:embedding_outliers)."""
    from hash_db_spark.operators import clustering as CL

    return CL.embedding_outliers(load_table(spark, sf_dir, "embeddings"))


def _embedding_outliers_oracle() -> str:
    from hash_db_spark.operators import clustering as CL

    return CL.sql_embedding_outliers()


# r12 QUEUE CANDIDATE (the r11 queue closed at 34 — session 7):
#   "embedding_outliers": Query(
#       q_embedding_outliers, _embedding_outliers_oracle()),


def q_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-aware subsampling: sqrt-of-cluster-size budget
    allocation over k-means embedding clusters — downweights template
    mega-clusters, protects the tail; integer-exact quotas and
    content-addressed membership after one Lloyd pass
    (operators/clustering.py:cluster_balanced_sample)."""
    from hash_db_spark.operators import clustering as C

    return C.cluster_balanced_sample(
        load_table(spark, sf_dir, "embeddings"), target=200
    )


def _cluster_balanced_oracle() -> str:
    from hash_db_spark.operators import clustering as C

    return C.sql_cluster_balanced_sample(target=200)


# r12 QUEUE CANDIDATE (session 9):
#   "cluster_balanced_sample": Query(
#       q_cluster_balanced_sample, _cluster_balanced_oracle()),


BITEXT_LOG_DEV_MAX = 0.4  # |ln(ratio) - ln(median ratio)| acceptance band


def q_bitext_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-ratio verification of the margin-mined bitext candidates
    (the Gale & Church 1993 signal, used as the standard post-mining
    cleaning rule in WMT/CCMatrix-style pipelines): translations'
    lengths correlate, so a pair whose char-length ratio deviates from
    the corpus's own MEDIAN ratio by more than BITEXT_LOG_DEV_MAX in
    log space is flagged misaligned. Output: every candidate pair with
    its ratio, log deviation, and the aligned verdict.

    Scale shape: the candidate set is already mined (margin_mine's
    audited plan); this adds two equijoins against (id, n_chars) —
    skinny columns — and ONE broadcast scalar (the exact median ratio,
    same percentile budget as lm_gate: one double per candidate
    pair)."""
    from hash_db_spark.operators import bitext as B

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    sides = emb.join(docs, emb.vec_id == docs.doc_id).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("v"),
        "lang",
    )
    cand = B.margin_mine(
        sides.filter(F.col("lang") == BITEXT_SRC_LANG).drop("lang"),
        sides.filter(F.col("lang") == BITEXT_DST_LANG).drop("lang"),
    ).select("src_id", "dst_id")
    lens = docs.select(F.col("doc_id"), F.col("n_chars"))
    scored = (
        cand.join(
            lens.withColumnRenamed("doc_id", "src_id").withColumnRenamed(
                "n_chars", "src_chars"
            ),
            "src_id",
        )
        .join(
            lens.withColumnRenamed("doc_id", "dst_id").withColumnRenamed(
                "n_chars", "dst_chars"
            ),
            "dst_id",
        )
        .withColumn(
            "len_ratio",
            F.round(F.col("src_chars") / F.col("dst_chars"), 6),
        )
    )
    med = scored.agg(
        F.expr("percentile(len_ratio, 0.5)").alias("med_ratio")
    )
    return (
        scored.crossJoin(F.broadcast(med))
        .withColumn(
            "log_dev",
            F.round(F.abs(F.log("len_ratio") - F.log("med_ratio")), 6),
        )
        .select(
            "src_id",
            "dst_id",
            "len_ratio",
            "log_dev",
            (F.col("log_dev") <= BITEXT_LOG_DEV_MAX).alias("aligned"),
        )
    )


def _bitext_length_oracle() -> str:
    from hash_db_spark.operators import bitext as B

    inner = B.sql_margin_mine(BITEXT_SRC_LANG, BITEXT_DST_LANG)
    return f"""
WITH scored AS MATERIALIZED (
  SELECT c.src_id, c.dst_id,
         round(CAST(a.n_chars AS DOUBLE) / b.n_chars, 6) AS len_ratio
  FROM ({inner}) c
  JOIN documents a ON a.doc_id = c.src_id
  JOIN documents b ON b.doc_id = c.dst_id
),
med AS (SELECT quantile_cont(len_ratio, 0.5) AS med_ratio FROM scored)
SELECT src_id, dst_id, len_ratio,
       round(abs(ln(len_ratio) - ln((SELECT med_ratio FROM med))), 6)
         AS log_dev,
       round(abs(ln(len_ratio) - ln((SELECT med_ratio FROM med))), 6)
         <= {BITEXT_LOG_DEV_MAX} AS aligned
FROM scored
"""


# r13 QUEUE CANDIDATE (session 9):
#   "bitext_length_filter": Query(
#       q_bitext_length_filter, _bitext_length_oracle()),


# The QUERIES literal lives at module tail so every registered fn is
# already bound; compute_reverify explodes it per-entry either way.
QUERIES = {
    "kmeans_clusters": Query(q_kmeans_clusters, _kmeans_oracle()),
    "sim_topk_brute": Query(
        q_sim_topk_brute, S.sql_topk_bruteforce(QUERY_IDS, k=K)
    ),
    "sim_topk_lsh": Query(q_sim_topk_lsh, S.sql_topk_lsh(QUERY_IDS, k=K)),
    "negative_samples": Query(
        q_negative_samples, S.sql_negative_samples(k=3, max_qid=20)
    ),
    "sim_topk_ivf": Query(q_sim_topk_ivf, S.sql_topk_ivf(QUERY_IDS, k=K)),
    "sim_recall_report": Query(q_sim_recall_report, _sim_recall_oracle()),
    "sim_topk_ivf_kmeans": Query(q_sim_topk_ivf_kmeans, _ivf_kmeans_oracle()),
    "sim_topk_ivf_persisted": Query(
        q_sim_topk_ivf_persisted, _ivf_kmeans_oracle()
    ),
    "sim_topk_quantized": Query(
        q_sim_topk_quantized, S.sql_topk_quantized(QUERY_IDS, k=K)
    ),
    "semdedup_drop": Query(
        q_semdedup_drop, S.sql_semdedup(threshold=SEMDEDUP_T)
    ),
    # registered r10 (queued r09 under the VERDICT r08 #1 throttle):
    # PQ/ADC top-k, its IVF-PQ composition, the persisted-index serving
    # path and the streaming probe (operators/pq.py, sources/writers.py).
    # sim_topk_pq_persisted shares _ivf_pq_oracle — result-identical to
    # the inline fit via the shared _adc_topk (the sim_topk_ivf_persisted
    # precedent).
    "sim_recall_truncated": Query(
        q_sim_recall_truncated, _sim_recall_truncated_oracle()
    ),
    "sim_topk_pq": Query(q_sim_topk_pq, _pq_oracle()),
    "sim_topk_ivf_pq": Query(q_sim_topk_ivf_pq, _ivf_pq_oracle()),
    "sim_topk_pq_persisted": Query(q_sim_topk_pq_persisted, _ivf_pq_oracle()),
    "stream_pq_probe": Query(q_stream_pq_probe, _ivf_pq_oracle()),
    # registered r11 (queued r10 under the VERDICT r08 #1 throttle):
    "sim_topk_ivf_published": Query(
        q_sim_topk_ivf_published, _ivf_kmeans_oracle()
    ),
    "train_hard_negatives": Query(
        q_train_hard_negatives, S.sql_hard_negatives(QUERY_IDS)
    ),
    "train_contrastive_pairs": Query(
        q_train_contrastive_pairs, _contrastive_pairs_oracle()
    ),
    "coreset_kcenter": Query(q_coreset_kcenter, _kcenter_oracle()),
    "embedding_int8_quant": Query(
        q_embedding_int8_quant, _int8_quant_oracle()
    ),
}
