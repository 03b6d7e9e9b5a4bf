"""Storage-layout writers: the physical design layer.

The reference's placement story is consistent-hash key routing to
in-memory nodes (/root/reference/consistent_hashing.py,
/root/reference/server.py:54-78 rebalancing). The Spark-native
equivalents, each giving a query-time payoff the reference cannot:

- partitioned writes → partition *pruning* (scan skips directories);
- bucketed writes    → co-located, shuffle-free joins/aggs on the
  bucket key (the durable version of the reference's materialized-join
  locality goal, README.md:31);
- sorted-within-partitions parquet → min/max page skipping for range
  predicates (the kv(pk, sk) layout: partition by pk-hash bucket, sort
  by sk — every K3-K8 operator becomes pruned scan + page skip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.localframe import local_frame


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Scheme-aware existence probe via the Hadoop FileSystem API —
    works for driver-local paths in tests AND for HDFS/S3 URIs in
    production, where an os.path probe would always be False."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(p))


def _append_guard(
    spark: SparkSession,
    path: str,
    field: str,
    expected: int,
    label: str,
    data_dir: str = "bands",
) -> None:
    """Refuse appends that would corrupt probe pruning — BEFORE any
    data lands (the caller must invoke this ahead of its writes).

    Three refusal shapes, all demanding a rebuild (mode='overwrite'):
    (a) meta present but EMPTY — a torn prior write; the existing
        bands were bucketed with an unknown modulus;
    (b) meta MISSING while bands/ exist — the same torn write seen
        from the other side (bands land before meta, so a crash
        between the two leaves exactly this). Treating it as a first
        write would stamp the caller's modulus over bands bucketed
        with an unknown one, silently mis-partitioning probe pruning;
    (c) modulus mismatch with a healthy meta.
    Only a truly absent index (no meta AND no bands) is a first write.
    """
    from pyspark.errors import AnalysisException

    try:
        meta_rows = spark.read.parquet(f"{path}/meta").collect()
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e):
            raise
        if _fs_exists(spark, f"{path}/{data_dir}"):
            raise ValueError(
                f"{label} index at {path} has {data_dir}/ but no meta/ (torn "
                "prior write): the existing bands were bucketed with an "
                "unknown modulus. Rebuild the index (mode='overwrite') "
                "or restore meta/ before appending."
            ) from e
        return  # genuinely a first write
    if not meta_rows:
        raise ValueError(
            f"{label} index at {path} has a torn meta (present but "
            "empty): the existing bands were bucketed with an unknown "
            f"{field} modulus. Rebuild the index (mode='overwrite') or "
            "restore meta/ before appending."
        )
    existing = meta_rows[0][field]
    if existing != int(expected):
        raise ValueError(
            f"{label} index at {path} was bucketed with "
            f"{field}={existing}; appending with {field}={expected} "
            "would corrupt probe pruning"
        )


def write_partitioned(df: DataFrame, path: str, *partition_cols: str) -> None:
    """Directory-partitioned parquet; predicates on partition_cols prune
    at planning time (PartitionFilters in explain)."""
    df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 32, sort: str | None = None
) -> None:
    """Hash-bucketed (and optionally sorted) managed table. Two tables
    bucketed by the same key join with zero shuffle exchange
    (tests/test_scale_plumbing.py proves it on the physical plan)."""
    w = df.write.bucketBy(buckets, key)
    if sort:
        w = w.sortBy(sort)
    w.mode("overwrite").saveAsTable(table)


def write_kv_store(kv: DataFrame, path: str, pk_buckets: int = 64) -> None:
    """Production layout for the KV facade: partition by a pk hash bucket
    (bounded directory count even with high-cardinality pks), sort rows
    by (pk, sk) within files so sk range scans page-skip."""
    out = kv.withColumn(
        "pk_bucket",
        (
            F.conv(F.substring(F.md5("pk"), 1, 8), 16, 10).cast("long")
            % pk_buckets
        ).cast("int"),
    )
    (
        out.repartition("pk_bucket")
        .sortWithinPartitions("pk", "sk")
        .write.partitionBy("pk_bucket")
        .mode("overwrite")
        .parquet(path)
    )


def read_kv_store(spark: SparkSession, path: str) -> DataFrame:
    """Read back the production KV layout; pk equality predicates reach
    the scan as pushed filters + bucket pruning via the derivable
    pk_bucket predicate."""
    return spark.read.parquet(path).drop("pk_bucket")


def write_minhash_index(
    base: DataFrame,
    bands: DataFrame,
    path: str,
    key_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist a MinHash LSH index (dedup.minhash_index output) so
    incremental dedup never touches corpus text again:

    - bands/(id, band, key) partitioned by a key hash bucket — a probing
      batch's (band, key) lookups prune to matching buckets;
    - shingles/(id, sh) sorted by id within files — the verification
      join's id lookups page-skip.
    """
    # Bucket modulus is index metadata (see write_fts_index): probes
    # must derive buckets with the SAME modulus or pruning misses.
    # Validate BEFORE any data lands — the guard refuses modulus
    # mismatches AND both torn-write shapes (empty meta, or bands
    # present with meta missing); a truly absent index is a fine first
    # append (streaming ingest).
    spark = base.sparkSession
    if mode == "append":
        _append_guard(spark, path, "key_buckets", key_buckets, "minhash")
    out = bands.withColumn(
        "key_bucket", (F.abs(F.col("key")) % key_buckets).cast("int")
    )
    (
        out.repartition("key_bucket")
        .write.partitionBy("key_bucket")
        .mode(mode)
        .parquet(f"{path}/bands")
    )
    (
        base.select("id", "sh")
        .repartition(F.col("id"))
        .sortWithinPartitions("id")
        .write.mode(mode)
        .parquet(f"{path}/shingles")
    )
    local_frame(
        spark, [(int(key_buckets),)], "key_buckets int"
    ).write.mode("overwrite").parquet(f"{path}/meta")


def read_minhash_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(shingles, bands) frames of a persisted MinHash index. Use
    minhash_index_probe to prune the bands scan to a probe batch's
    buckets before joining."""
    return (
        spark.read.parquet(f"{path}/shingles"),
        spark.read.parquet(f"{path}/bands").drop("key_bucket"),
    )


def minhash_index_probe(
    spark: SparkSession, path: str, new_bands: DataFrame
) -> DataFrame:
    """The persisted bands relation pruned to the PROBE batch's key
    buckets: the batch is small by definition, so its distinct bucket
    set collects driver-side and becomes a partition predicate
    (PartitionFilters) — the (band, key) join then scans only matching
    bucket directories instead of the whole index, which is the payoff
    the write-side partitionBy exists for. The modulus comes from the
    index's own metadata, never a caller default."""
    kb = spark.read.parquet(f"{path}/meta").collect()[0]["key_buckets"]
    buckets = sorted(
        r["b"]
        for r in new_bands.select(
            (F.abs(F.col("key")) % kb).cast("int").alias("b")
        )
        .distinct()
        .collect()
    )
    return (
        spark.read.parquet(f"{path}/bands")
        .filter(F.col("key_bucket").isin(buckets))
        .drop("key_bucket")
    )


def write_fts_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist an inverted FTS index so term queries never rescan corpus
    text (reference: in-memory index_string_for_fts + intersection,
    /root/reference/server.py:729-739 — rebuilt per process; here it is a
    durable layout):

    - postings/(tok, id, tf) partitioned by a token hash bucket and
      sorted by tok within files — a query's terms prune to their
      buckets (PartitionFilters) and page-skip to their tok runs;
    - doclens/(id, dl) — per-document token counts, the BM25 length
      normalization side (tiny relative to text).

    Build cost is one explode + one (tok, id) aggregate — the same work
    any single FTS query would do, paid once.

    mode='append' adds a NEW batch's postings/doclens without touching
    existing ones (the streaming-ingest shape; callers own batch-level
    dedup — re-indexing the same doc id would double its postings). The
    bucket modulus is guarded by ``_append_guard``: a torn or
    mismatched index refuses the append and demands a rebuild, exactly
    like the minhash/dhash indexes.
    """
    from hash_db_spark.operators.dedup import clean_tokens

    if mode == "append":
        _append_guard(
            docs.sparkSession,
            path,
            "token_buckets",
            token_buckets,
            "FTS",
            data_dir="postings",
        )

    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(clean_tokens(text_col)).alias("tok")
    )
    postings = (
        toks.groupBy("tok", "id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("tok_bucket", _tok_bucket("tok", token_buckets))
    )
    (
        postings.repartition("tok_bucket")
        .sortWithinPartitions("tok")
        .write.partitionBy("tok_bucket")
        .mode(mode)
        .parquet(f"{path}/postings")
    )
    (
        docs.select(
            F.col(id_col).alias("id"),
            F.size(clean_tokens(text_col)).alias("dl"),
        )
        .write.mode(mode)
        .parquet(f"{path}/doclens")
    )
    if mode == "append":
        return  # meta already guarded-matching; never rewrite it mid-append
    # The bucket modulus is INDEX METADATA: a probe computed with a
    # different token_buckets maps terms to the wrong partitions and
    # silently returns empty/partial postings — persist it with the
    # index so readers can't diverge.
    spark = docs.sparkSession
    local_frame(
        spark, [(int(token_buckets),)], "token_buckets int"
    ).write.mode("overwrite").parquet(f"{path}/meta")


def _tok_bucket(col: str, token_buckets: int):
    return (
        F.conv(F.substring(F.md5(F.col(col)), 1, 8), 16, 10).cast("long")
        % token_buckets
    ).cast("int")


def read_fts_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, int]:
    """(postings, doclens, token_buckets) of a persisted FTS index.
    Keep postings' tok_bucket column: probe filters use it for
    partition pruning. token_buckets comes from the index's own
    metadata — pass IT to fts_index_probe/bm25_from_index, never an
    independent default."""
    buckets = spark.read.parquet(f"{path}/meta").collect()[0]["token_buckets"]
    return (
        spark.read.parquet(f"{path}/postings"),
        spark.read.parquet(f"{path}/doclens"),
        int(buckets),
    )


def fts_index_probe(
    postings: DataFrame, terms: list[str], token_buckets: int = 64
) -> DataFrame:
    """Posting rows for ``terms``: the bucket predicate is computed
    driver-side (same md5 both engines) so the scan prunes to the terms'
    partitions before the pushed tok filter."""
    import hashlib

    buckets = sorted(
        {
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % token_buckets
            for t in terms
        }
    )
    return postings.filter(
        F.col("tok_bucket").isin(buckets) & F.col("tok").isin(terms)
    ).drop("tok_bucket")


def write_ivf_index(
    emb: DataFrame,
    path: str,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the offline ANN artifact the IVF serving path consumes:
    the k-means centroid table plus every vector tagged with its cell,
    partitioned BY cell — a query's candidate scan reads only its nprobe
    cell directories (PartitionFilters), never the whole corpus. The
    corpus-wide assignment matmul is paid once here, not per query."""
    from hash_db_spark.operators.clustering import kmeans_fit

    # One k-means fit yields both artifacts — kmeans_centroids +
    # kmeans_assign would each run the full fit (2x the corpus passes).
    cents, assign = kmeans_fit(emb, id_col=id_col, vec_col=vec_col, k=k)
    cells = emb.select(id_col, vec_col).join(
        assign.withColumnRenamed("vec_id", id_col), id_col
    )
    (
        cells.repartition("cluster")
        .write.partitionBy("cluster")
        .mode("overwrite")
        .parquet(f"{path}/cells")
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")


def read_ivf_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(centroids, cells) of a persisted IVF index. cells keeps its
    ``cluster`` partition column — probe filters prune on it."""
    return (
        spark.read.parquet(f"{path}/centroids"),
        spark.read.parquet(f"{path}/cells"),
    )


def compact_files(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    shuffle: bool = False,
) -> int:
    """Small-files compaction — the table-maintenance job every
    long-running ingest needs: streaming appends and per-batch commits
    leave thousands of KB-sized parquet files whose open/footer cost
    dominates scans at 100 TB. Rewrites ``path`` toward
    ceil(total_bytes / target_file_bytes) files at ``out_path`` and
    returns the ACTUAL output file count.

    Sizing uses the Hadoop FileSystem content summary, so any scheme the
    cluster can read (hdfs://, s3a://, local) sizes correctly — an
    os.walk would silently return 0 off the local filesystem and
    coalesce the whole table into one task. No data pass for sizing.

    ``shuffle=False`` (default) merges via ``coalesce`` — narrow, each
    output task reads several input files sequentially; it can only
    REDUCE the file count, which is the compaction direction. Pass
    ``shuffle=True`` to redistribute via ``repartition`` when files must
    also be SPLIT (oversized files from a bulk load) — that pays one
    full shuffle for exact output sizing."""
    import math

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(hpath).getLength()
    n_files = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    df = df.repartition(n_files) if shuffle else df.coalesce(n_files)
    df.write.mode("overwrite").parquet(out_path)
    opath = jvm.org.apache.hadoop.fs.Path(out_path)
    written = [
        f
        for f in fs.listStatus(opath)
        if f.getPath().getName().endswith(".parquet")
    ]
    return len(written)


# ---------------------------------------------------------------------------
# perceptual (60-bit dHash) band index — the multimodal analog of the
# MinHash band index above: same meta/modulus discipline, same probe
# pruning, hash-value rows instead of shingle bands.
# ---------------------------------------------------------------------------


def write_dhash_index(
    hashes: DataFrame,
    path: str,
    byte_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Persist perceptual hashes as a pre-banded index so incremental
    media dedup never re-decodes payloads: bands/(id, dhash, band,
    byte) — 4 rows per hash, SIMHASH banding — partitioned by a byte
    hash bucket for probe pruning. The bucket modulus is index metadata
    (write_minhash_index's discipline verbatim): appends with a
    different modulus are refused, a present-but-empty meta (torn prior
    write) demands a rebuild."""
    from hash_db_spark.operators.dedup import (
        SIMHASH_BAND_BITS,
        SIMHASH_BAND_MASK,
        SIMHASH_BANDS,
    )

    bands = hashes.select(
        "id",
        "dhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        F.shiftright(F.col("dhash"), k * SIMHASH_BAND_BITS)
                        .bitwiseAND(SIMHASH_BAND_MASK)
                        .alias("byte"),
                    )
                    for k in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(
        "id", "dhash",
        F.col("bk.band").alias("band"), F.col("bk.byte").alias("byte"),
        (F.col("bk.byte") % byte_buckets).cast("int").alias("byte_bucket"),
    )
    spark = hashes.sparkSession
    if mode == "append":
        _append_guard(spark, path, "byte_buckets", byte_buckets, "dhash")
    (
        bands.repartition("byte_bucket")
        .write.partitionBy("byte_bucket")
        .mode(mode)
        .parquet(f"{path}/bands")
    )
    local_frame(
        spark, [(int(byte_buckets),)], "byte_buckets int"
    ).write.mode("overwrite").parquet(f"{path}/meta")


def dhash_index_probe(
    spark: SparkSession, path: str, batch_hashes: DataFrame
) -> DataFrame:
    """The persisted corpus hashes pruned to the probe batch's byte
    buckets, as a distinct (id, dhash) relation ready for
    dedup.hamming_pairs_against. Pruning keeps every corpus hash
    sharing ANY band byte with the batch — a superset of band-join
    candidates — and an exact-equal hash shares all four bytes, so the
    hot-bucket rescue survives pruning too. The batch's distinct bucket
    set collects driver-side (a batch is small by contract) and becomes
    a partition predicate."""
    from hash_db_spark.operators.dedup import (
        SIMHASH_BAND_BITS,
        SIMHASH_BAND_MASK,
        SIMHASH_BANDS,
    )

    bb = spark.read.parquet(f"{path}/meta").collect()[0]["byte_buckets"]
    # ONE job for all four bands (explode), not one collect per band —
    # probe overhead is per-micro-batch, so driver round-trips count.
    buckets = sorted(
        {
            r["b"]
            for r in batch_hashes.select(
                F.explode(
                    F.array(
                        *[
                            (
                                F.shiftright(
                                    F.col("dhash"), k * SIMHASH_BAND_BITS
                                ).bitwiseAND(SIMHASH_BAND_MASK)
                                % bb
                            ).cast("int")
                            for k in range(SIMHASH_BANDS)
                        ]
                    )
                ).alias("b")
            )
            .distinct()
            .collect()
        }
    )
    return (
        spark.read.parquet(f"{path}/bands")
        .filter(F.col("byte_bucket").isin(buckets))
        .select("id", "dhash")
        .distinct()
    )


def write_pq_index(
    emb: DataFrame,
    path: str,
    m: int = 4,
    ks: int = 16,
    cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist the IVF-PQ serving artifact: codes/(vec_id, codes, cell)
    PARTITIONED BY cell, book/(s, code, pos, cq), centroids/(cid, cv),
    meta/(m, ks, cells). The corpus's raw vectors do NOT ship — the
    index is ~m bytes/vector plus parameter-bounded sidecars, and a
    query's scan reads only its nprobe cell directories
    (PartitionFilters over 4-byte codes: the 100 TB serving shape).
    Overwrite-only: PQ codebooks are corpus-fitted, so appending rows
    coded against a DIFFERENT codebook would silently corrupt distances
    (the modulus-mismatch lesson of write_dhash_index, hardened there);
    rebuild instead."""
    import pyspark.sql.functions as F

    from hash_db_spark.operators.clustering import _centroid_mat
    from hash_db_spark.operators.pq import (
        _encode_with_cells,
        _fit_codebook,
    )
    from hash_db_spark.operators.similarity import _dvec

    spark = emb.sparkSession
    corpus = emb.select(
        F.col(id_col).alias("vec_id"), _dvec(vec_col).alias("v")
    )
    cmat = _centroid_mat(corpus, cells)
    book = _fit_codebook(corpus, m, ks)
    coded = _encode_with_cells(corpus, book, m, cmat)
    (
        coded.repartition("cell")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(f"{path}/codes")
    )
    book_rows = [
        (s, j, pos, int(cvec[pos]))
        for s, entries in book.items()
        for j, cvec in entries
        for pos in range(len(cvec))
    ]
    local_frame(
        spark, book_rows, "s int, code int, pos int, cq long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/book")
    local_frame(
        spark,
        [(i + 1, row.tolist()) for i, row in enumerate(cmat)],
        "cid int, cv array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    local_frame(
        spark, [(m, ks, cells)], "m int, ks int, cells int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")


def pq_index_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN served from the persisted IVF-PQ artifact: result-identical
    to the inline `pq.topk_ivf_pq` over the same corpus (shared
    `_adc_topk` scoring), but the corpus-side cost is the nprobe cell
    directories of 4-byte codes. ``queries`` supplies raw query
    vectors (the index doesn't store any); it must be
    parameter-bounded — each row becomes literal ADC tables."""
    import numpy as np

    import pyspark.sql.functions as F

    from hash_db_spark.operators.pq import _adc_topk
    from hash_db_spark.operators.similarity import _dvec

    meta = spark.read.parquet(f"{path}/meta").collect()[0]
    book_rows = spark.read.parquet(f"{path}/book").collect()
    book: dict[int, dict[int, dict[int, int]]] = {}
    for r in book_rows:
        book.setdefault(r["s"], {}).setdefault(r["code"], {})[
            r["pos"]
        ] = r["cq"]
    packed = {
        s: [
            (j, np.array(
                [jm[p] for p in sorted(jm)], dtype=np.int64
            ))
            for j, jm in sorted(codes.items())
        ]
        for s, codes in book.items()
    }
    cents = sorted(
        spark.read.parquet(f"{path}/centroids").collect(),
        key=lambda r: r["cid"],
    )
    cmat = np.array([r["cv"] for r in cents], dtype=np.float64)
    coded = spark.read.parquet(f"{path}/codes")
    qrows = queries.select(
        F.col(id_col).alias("vec_id"), _dvec(vec_col).alias("v")
    ).collect()
    return _adc_topk(
        coded, packed, cmat, qrows, k, meta["m"], meta["ks"], nprobe
    )


# --- atomic index publication -------------------------------------------------
#
# The write-side complement of _append_guard's torn-write REFUSAL: a
# commit protocol under which readers can never observe a torn
# multi-file artifact at all. Parquet has no transactions; the classic
# fix (Hive/Iceberg-style) is write-new-version-then-flip-pointer:
#
#   <path>/v=<n>/...artifact files...     (immutable once published)
#   <path>/_latest/                       (1-row parquet: the live n)
#
# Writers stage the ENTIRE new version under v=<n+1>/ while readers
# keep resolving v=<n>; the pointer write is the single commit point.
# A crash mid-stage leaves an orphan v-dir and a consistent store. The
# pointer itself is a directory OVERWRITE of a tiny parquet — its
# non-atomicity window is one 1-row file create; a reader racing it
# retries on read error rather than ever combining files from two
# versions (the failure _append_guard can only detect after the fact).


def publish_version(df: DataFrame, path: str) -> int:
    """Stage df as the next version under ``path`` and flip the
    pointer. Returns the published version number."""
    spark = df.sparkSession
    try:
        cur = read_published_version(spark, path)
    except Exception:
        cur = 0
    nxt = cur + 1
    df.write.mode("overwrite").parquet(f"{path}/v={nxt}")
    local_frame(spark, [(nxt,)], "v int").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/_latest")
    return nxt


def read_published_version(spark: SparkSession, path: str) -> int:
    rows = spark.read.parquet(f"{path}/_latest").collect()
    if not rows:
        raise ValueError(f"torn pointer at {path}/_latest (empty)")
    return int(rows[0]["v"])


def read_published(spark: SparkSession, path: str) -> DataFrame:
    """The live version's frame. Never mixes files across versions: the
    read is pinned to one v-dir resolved from the pointer."""
    return spark.read.parquet(f"{path}/v={read_published_version(spark, path)}")


def publish_index(spark: SparkSession, path: str, stage_fn) -> int:
    """publish_version for MULTI-ARTIFACT indexes (IVF cells+centroids,
    FTS postings+doclens+meta, minhash bands+shingles): ``stage_fn``
    writes the complete artifact into the staged version dir it is
    handed; only after it returns does the pointer flip. Same crash
    story: a failed stage leaves an orphan v-dir, readers never see it."""
    try:
        cur = read_published_version(spark, path)
    except Exception:
        cur = 0
    nxt = cur + 1
    stage_fn(f"{path}/v={nxt}")
    local_frame(spark, [(nxt,)], "v int").coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/_latest")
    return nxt


def published_dir(spark: SparkSession, path: str) -> str:
    """The live version directory — hand this to the index readers
    (read_ivf_index, read_fts_index, ...)."""
    return f"{path}/v={read_published_version(spark, path)}"


def vacuum_plan(
    spark: SparkSession, path: str, keep: int = 2
) -> DataFrame:
    """(version, n_files, status, action): the retention audit for a
    ``publish_version``/``publish_index`` store — the Delta/Iceberg
    VACUUM capability for the house publication protocol. Classifies
    every staged version directory against the live pointer:

        live      the pointer's version                     -> keep
        retained  within the newest ``keep`` versions       -> keep
        expired   older than the retention window           -> delete
        orphan    staged ABOVE the pointer (a crashed
                  publisher's leftovers, never visible
                  to readers)                               -> delete

    A production vacuum would age-gate orphan deletion (a concurrent
    publisher mid-stage looks identical to a crash); the plan is the
    decision table, not the deletion.

    Scale shape: pure metadata — one Hadoop FileSystem listing bounded
    by the version count (O(10)), never by data size; works for local
    paths in tests and HDFS/S3 URIs in production (the _fs_exists
    discipline). Returns a driver-built frame of one row per version.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    live = read_published_version(spark, path)
    rows = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if not name.startswith("v="):
            continue
        version = int(name[2:])
        n_files = 0
        it = fs.listFiles(st.getPath(), True)
        while it.hasNext():
            if it.next().getPath().getName().endswith(".parquet"):
                n_files += 1
        if version == live:
            status = "live"
        elif version > live:
            status = "orphan"
        elif version >= live - (keep - 1):
            status = "retained"
        else:
            status = "expired"
        action = "keep" if status in ("live", "retained") else "delete"
        rows.append((version, n_files, status, action))
    return local_frame(
        spark,
        sorted(rows),
        "version int, n_files int, status string, action string",
    )


def sql_vacuum_plan(path: str, keep: int = 2) -> str:
    """Oracle twin of vacuum_plan: DuckDB's glob() lists the same
    version dirs; the pointer comes from the same _latest parquet."""
    return f"""
WITH files AS (
  SELECT file FROM glob('{path}/v=*/*.parquet')
  UNION
  SELECT file FROM glob('{path}/v=*/**/*.parquet')
),
counted AS (
  SELECT CAST(regexp_extract(file, 'v=(\\d+)', 1) AS INT) AS version,
         count(*) AS n_files
  FROM files GROUP BY 1
),
ptr AS (
  SELECT CAST(v AS INT) AS live FROM read_parquet('{path}/_latest/*.parquet')
)
SELECT version,
       CAST(n_files AS INT) AS n_files,
       CASE WHEN version = live THEN 'live'
            WHEN version > live THEN 'orphan'
            WHEN version >= live - {keep - 1} THEN 'retained'
            ELSE 'expired' END AS status,
       CASE WHEN version <= live AND version >= live - {keep - 1}
            THEN 'keep' ELSE 'delete' END AS action
FROM counted CROSS JOIN ptr
ORDER BY version
"""
