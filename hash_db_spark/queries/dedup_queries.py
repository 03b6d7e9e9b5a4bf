"""Driver-checkable queries: deduplication operators (SURVEY §7 Phase 6).

documents has no exact duplicates by construction, so the exact-dup *group*
demo runs over events.props (JSON payloads repeat heavily); keep-first
exact dedup and all near-dup strategies run over documents, where the
fixture plants ~25 high-Jaccard pairs (3-gram shingles, jac >= 0.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.operators import dedup as D
from hash_db_spark.operators import similarity as S
from hash_db_spark.functions.text import sql_fingerprint
from hash_db_spark.queries import Query

JACCARD_T = 0.5
COSINE_T = 0.4
# ≤3 on 32 bits with 4 byte-bands: the pigeonhole candidate filter is
# exact (3 flipped bits can disturb at most 3 of the 4 bands).
MAX_HAMMING = 3


def q_dedup_exact_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dup_groups(
        load_table(spark, sf_dir, "events"), "props", "event_id"
    )


EXACT_GROUPS_ORACLE = f"""
SELECT {sql_fingerprint('props')} AS fp,
       count(*) AS cnt,
       min(event_id) AS keep_id
FROM events
GROUP BY 1 HAVING count(*) > 1
"""


def q_dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup_keep_first(
        load_table(spark, sf_dir, "documents"), "text", "doc_id"
    )


EXACT_KEEP_ORACLE = f"""
SELECT min(doc_id) AS keep_id, {sql_fingerprint('text')} AS fp
FROM documents GROUP BY 2
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        n=3,
        threshold=JACCARD_T,
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        threshold=JACCARD_T,
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash(load_table(spark, sf_dir, "documents"), "text", "doc_id")


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_pairs(
        load_table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        max_hamming=MAX_HAMMING,
    )


def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment over the MinHash dup pairs: connected
    components, smallest reachable doc_id as the cluster label — the
    keep-one-per-cluster step after pair generation."""
    pairs = D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        threshold=JACCARD_T,
    )
    return D.connected_components(pairs)


def q_dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same cluster assignment via large-star/small-star rounds —
    the O(log n)-round formulation whose round count is independent of
    component DIAMETER (min-label propagation needs O(diameter) rounds;
    chain rescues in the capped candidate paths produce exactly the
    path-shaped components that make diameter large)."""
    pairs = D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        threshold=JACCARD_T,
    )
    return D.connected_components_star(pairs)


def q_dedup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-card duplication rate per language: how many documents sit
    in a near-dup cluster, and how many of those a keep-one pass would
    drop. Left-joins the (tiny) cluster table onto the corpus — the
    aggregate every dataset release leads with."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=JACCARD_T)
    clusters = D.connected_components(pairs).withColumnRenamed("id", "doc_id")
    joined = docs.select("doc_id", "lang").join(clusters, "doc_id", "left")
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count("cluster").alias("n_in_dup_cluster"),
        F.count(
            F.when(
                F.col("cluster").isNotNull()
                & (F.col("cluster") != F.col("doc_id")),
                1,
            )
        ).alias("n_would_drop"),
    )


def _dedup_rate_oracle() -> str:
    pairs = D.sql_minhash_lsh_pairs(
        "documents", "text", "doc_id", threshold=JACCARD_T
    )
    comps = D.sql_connected_components(pairs)
    return f"""
WITH clusters AS (
  SELECT * FROM ({comps})
)
SELECT d.lang,
       count(*) AS n_docs,
       count(c.cluster) AS n_in_dup_cluster,
       count(CASE WHEN c.cluster IS NOT NULL AND c.cluster != d.doc_id
             THEN 1 END) AS n_would_drop
FROM documents d LEFT JOIN clusters c ON c.id = d.doc_id
GROUP BY d.lang
"""


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: every 10th doc is the 'new batch',
    matched against the indexed remainder — batch bands broadcast, the
    corpus index is scanned once and never shuffled."""
    docs = load_table(spark, sf_dir, "documents")
    import pyspark.sql.functions as F

    return D.minhash_pairs_against(
        docs.filter(F.col("doc_id") % 10 == 0),
        docs.filter(F.col("doc_id") % 10 != 0),
        "text",
        "doc_id",
        threshold=JACCARD_T,
    )


def q_dedup_embedding_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding ingest: every 10th vector is the 'new
    batch', matched against the indexed remainder — batch bands
    broadcast, corpus signatures scanned once. Completes the
    index-once/probe-per-batch trio (MinHash text, IVF, embedding
    LSH)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return S.lsh_pairs_against(
        emb.filter(F.col("vec_id") % 10 == 0),
        emb.filter(F.col("vec_id") % 10 != 0),
        threshold=COSINE_T,
    )


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.embedding_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=COSINE_T
    )


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB path for embedding near-dup: banded hyperplane LSH
    candidates (no corpus broadcast), exact-cosine verify."""
    return S.lsh_near_dup_pairs(
        load_table(spark, sf_dir, "embeddings"), threshold=COSINE_T
    )


_EST_HASHES = 32


def q_minhash_est_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality audit: per adjacent doc pair, the MinHash
    signature-agreement Jaccard ESTIMATE (matching components /
    num_hashes) against the TRUE shingle Jaccard, with the absolute
    error — the measurement that justifies a signature width before
    committing a 100 TB dedup run to it. Adjacent ids give a
    deterministic mixed sample (the fixture's near-dup pairs land at
    consecutive ids; the rest are background dissimilar pairs).

    Scale shape: signatures are the already-cached index artifact; the
    pair join is a self-equijoin on id+1 — linear, no candidate
    explosion."""
    docs = load_table(spark, sf_dir, "documents")
    base, _ = D.minhash_index(docs, "text", "doc_id", num_hashes=_EST_HASHES)
    a = base.select(
        F.col("id").alias("id_a"),
        F.col("sh").alias("sh_a"),
        F.col("sig").alias("sig_a"),
    )
    b = base.select(
        (F.col("id") - 1).alias("id_a"),
        F.col("id").alias("id_b"),
        F.col("sh").alias("sh_b"),
        F.col("sig").alias("sig_b"),
    )
    j = a.join(b, "id_a")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = F.round(inter.cast("double") / union, 6)
    matches = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est = F.round(matches.cast("double") / _EST_HASHES, 6)
    return j.select(
        "id_a",
        "id_b",
        jac.alias("jac"),
        est.alias("est"),
        F.round(F.abs(est - jac), 6).alias("err"),
    )


def _minhash_est_error_oracle() -> str:
    sig_exprs = ", ".join(
        f"list_min(list_transform(hsh, h -> ({a} * h + {b}) % {D.MINHASH_P}))"
        f" AS h{i}"
        for i, (a, b) in enumerate(D._affine_constants(_EST_HASHES))
    )
    match_sum = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END"
        for i in range(_EST_HASHES)
    )
    return f"""
WITH base AS (
  SELECT doc_id AS id, {D.sql_shingles('text')} AS sh FROM documents
),
nonempty AS (SELECT * FROM base WHERE len(sh) > 0),
hashed AS (
  SELECT id, sh, list_transform(sh, s -> {D.sql_md5_hash64('s')}) AS hsh
  FROM nonempty
),
sig AS (SELECT id, sh, {sig_exprs} FROM hashed),
paired AS (
  SELECT a.id AS id_a, b.id AS id_b, a.sh AS sh_a, b.sh AS sh_b,
         ({match_sum}) AS matches
  FROM sig a JOIN sig b ON b.id = a.id + 1
)
SELECT id_a, id_b,
       round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
             / (len(sh_a) + len(sh_b) - len(list_intersect(sh_a, sh_b))), 6)
         AS jac,
       round(CAST(matches AS DOUBLE) / {_EST_HASHES}, 6) AS est,
       round(abs(round(CAST(matches AS DOUBLE) / {_EST_HASHES}, 6)
                 - round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
                         / (len(sh_a) + len(sh_b)
                            - len(list_intersect(sh_a, sh_b))), 6)), 6)
         AS err
FROM paired
"""


def q_lsh_param_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banded-LSH design table (P(collide|s) S-curves + per-config
    thresholds) every big dedup launch reads first — closed-form over
    literal grids, so the entry is data-independent and exhaustively
    compared cell-by-cell (operators/dedup.py:lsh_s_curve)."""
    return D.lsh_s_curve(spark)




# --- leakage-safe train/val split ---------------------------------------------

SPLIT_VAL_NUM = 209715  # sample_u(cluster) < NUM with M=2^20 -> ~20% val


def q_train_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/validation split that cannot leak near-duplicates across
    the boundary: the split key is the doc's DUP CLUSTER (MinHash pairs
    -> connected components; unpaired docs are their own singleton
    cluster), hashed content-addressed — so A~B never lands A in train
    and B in val, the failure mode per-doc hash splits silently have.
    Deterministic across runs/engines/partitionings.

    Scale shape: the pair+component machinery is the proven dedup path;
    the split itself adds one left join + a map-side hash threshold."""
    from hash_db_spark.operators.curation import sample_u

    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=JACCARD_T)
    comp = D.connected_components(pairs).withColumnRenamed("id", "doc_id")
    assigned = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster", F.col("doc_id")).alias("cluster"),
        )
    )
    return assigned.select(
        "doc_id",
        "cluster",
        F.when(sample_u(F.col("cluster")) < SPLIT_VAL_NUM, "val")
        .otherwise("train")
        .alias("split"),
    )


def _train_split_oracle() -> str:
    from hash_db_spark.operators.curation import sql_sample_u

    comps = D.sql_connected_components(
        D.sql_minhash_lsh_pairs(
            "documents", "text", "doc_id", threshold=JACCARD_T
        )
    )
    return f"""
WITH comps AS ({comps}),
assigned AS (
  SELECT d.doc_id, coalesce(c.cluster, d.doc_id) AS cluster
  FROM documents d LEFT JOIN comps c ON c.id = d.doc_id
)
SELECT doc_id, cluster,
       CASE WHEN {sql_sample_u('cluster')} < {SPLIT_VAL_NUM}
            THEN 'val' ELSE 'train' END AS split
FROM assigned
"""


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quote/subset detection: pairs whose shingle CONTAINMENT
    |A∩B|/min(|A|,|B|) clears 0.8 — including the high-containment
    low-Jaccard inclusions symmetric dedup misses (Broder 1997's
    resemblance-vs-containment split); feeds span-strip curation
    rather than whole-doc dropping
    (operators/dedup.py:ngram_containment_pairs)."""
    return D.ngram_containment_pairs(
        load_table(spark, sf_dir, "documents"), "text", "doc_id", n=3
    )


def _dedup_containment_oracle() -> str:
    return D.sql_ngram_containment_pairs("documents", "text", "doc_id", n=3)


# r12 QUEUE CANDIDATE (the r11 queue closed at 34 — session 7):
#   "dedup_containment": Query(
#       q_dedup_containment, _dedup_containment_oracle()),


def q_dedup_method_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair-retrieval precision/recall/F1 of the sub-quadratic dedup
    candidate stages (banded MinHash, SimHash hamming<=3) against
    exact n-gram Jaccard ground truth — the method-selection table
    (operators/dedup.py:dedup_method_eval)."""
    return D.dedup_method_eval(
        load_table(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        threshold=JACCARD_T,
    )


def _dedup_method_eval_oracle() -> str:
    return D.sql_dedup_method_eval(
        "documents", "text", "doc_id", threshold=JACCARD_T
    )


# r12 QUEUE CANDIDATE (the r11 queue closed at 34 — session 7):
#   "dedup_method_eval": Query(
#       q_dedup_method_eval, _dedup_method_eval_oracle()),


def q_dedup_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive second opinion on the banded-LSH candidates:
    normalized Levenshtein similarity over a fixed prefix confirms
    which shingle-Jaccard pairs are true edit lineages (JVM-codegen
    levenshtein on the capped candidate set only — the verification
    stage that gates destructive dedup at corpus scale;
    operators/dedup.py:edit_verify_pairs)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, "text", "doc_id", threshold=JACCARD_T)
    return D.edit_verify_pairs(
        docs, pairs, "text", "doc_id", threshold=0.5
    )


def _dedup_edit_verify_oracle() -> str:
    return D.sql_edit_verify_pairs(
        "documents",
        "text",
        "doc_id",
        D.sql_minhash_lsh_pairs(
            "documents", "text", "doc_id", threshold=JACCARD_T
        ),
        threshold=0.5,
    )


# r12 QUEUE CANDIDATE (session 9):
#   "dedup_edit_verify": Query(
#       q_dedup_edit_verify, _dedup_edit_verify_oracle()),


# The QUERIES literal lives at module tail so every registered fn is
# already bound; compute_reverify explodes it per-entry either way.
QUERIES = {
    "dedup_exact_groups": Query(q_dedup_exact_groups, EXACT_GROUPS_ORACLE),
    "dedup_exact_keep": Query(q_dedup_exact_keep, EXACT_KEEP_ORACLE),
    "dedup_ngram_jaccard": Query(
        q_dedup_ngram_jaccard,
        D.sql_ngram_jaccard_pairs(
            "documents", "text", "doc_id", n=3, threshold=JACCARD_T
        ),
    ),
    "dedup_minhash_lsh": Query(
        q_dedup_minhash_lsh,
        D.sql_minhash_lsh_pairs(
            "documents", "text", "doc_id", threshold=JACCARD_T
        ),
    ),
    "dedup_incremental": Query(
        q_dedup_incremental,
        D.sql_minhash_pairs_against(
            "documents", "text", "doc_id",
            new_pred="doc_id % 10 = 0",
            corpus_pred="doc_id % 10 <> 0",
            threshold=JACCARD_T,
        ),
    ),
    "dedup_embedding_lsh": Query(
        q_dedup_embedding_lsh,
        S.sql_lsh_near_dup_pairs(threshold=COSINE_T),
    ),
    "dedup_components": Query(
        q_dedup_components,
        D.sql_connected_components(
            D.sql_minhash_lsh_pairs(
                "documents", "text", "doc_id", threshold=JACCARD_T
            )
        ),
    ),
    "dedup_rate_report": Query(q_dedup_rate_report, _dedup_rate_oracle()),
    "minhash_est_error": Query(
        q_minhash_est_error, _minhash_est_error_oracle()
    ),
    "dedup_embedding_incremental": Query(
        q_dedup_embedding_incremental,
        S.sql_lsh_pairs_against(
            "vec_id % 10 = 0", "vec_id % 10 != 0", threshold=COSINE_T
        ),
    ),
    "dedup_components_star": Query(
        q_dedup_components_star,
        D.sql_connected_components(
            D.sql_minhash_lsh_pairs(
                "documents", "text", "doc_id", threshold=JACCARD_T
            )
        ),
    ),
    "dedup_simhash": Query(
        q_dedup_simhash, D.sql_simhash("documents", "text", "doc_id")
    ),
    "dedup_simhash_pairs": Query(
        q_dedup_simhash_pairs,
        D.sql_simhash_near_pairs(
            "documents", "text", "doc_id", max_hamming=MAX_HAMMING
        ),
    ),
    "dedup_embedding": Query(
        q_dedup_embedding,
        D.sql_embedding_near_dup_pairs(threshold=COSINE_T),
    ),
    # registered r10 (queued r09 under the VERDICT r08 #1 throttle):
    "lsh_param_plan": Query(q_lsh_param_plan, D.sql_lsh_s_curve()),
    # registered r11 (queued r10 under the VERDICT r08 #1 throttle):
    "train_split_leakage_safe": Query(
        q_train_split_leakage_safe, _train_split_oracle()
    ),
}
