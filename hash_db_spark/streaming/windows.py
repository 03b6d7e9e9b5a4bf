"""Structured Streaming operators over the events stream (SURVEY §2.6).

The reference has no streaming at all (closest: lexicographic timestamp
range scans, /root/reference/hash-db.py:100-101); this module is the
capability extension SURVEY §7 Phase 5 plans: event-time windows with
watermarks, streaming dedup, session windows, and incremental materialized
views (the scalable version of the reference's insert-time materialized
join, /root/reference/server.py:806-894).

Every transformation takes/returns DataFrames, so the SAME definition runs
batch or streaming — queries()-registry entries execute these streaming
pipelines with trigger(availableNow=True) into a memory sink and the
driver hash-compares them against a *batch* DuckDB oracle: stream/batch
parity is the correctness statement.

Scale notes: watermarks bound state; windowed counts keep one row of state
per (window, key); dropDuplicates state is bounded by the watermark delay.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """events.parquet as a file-source stream (the fixture's TIMESTAMP
    NANOS arrives as long under nanosAsLong — converted exactly like
    catalog.load_table)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _stash_state_partitions(spark, f"{sf_dir}/events.parquet")
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    # The file stream source monitors a *directory*; narrow it to the one
    # fixture file with pathGlobFilter.
    reader = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(sf_dir)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Plain timestamp[us] parquet arrives as TIMESTAMP_NTZ under Spark 4's
    # inferTimestampNTZ; event-time watermarks demand LTZ. The session
    # timezone is pinned to UTC, so this cast is wall-clock-preserving.
    if dict(df.dtypes).get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def with_watermark(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    return events.withWatermark("ts", delay)


def tumbling_counts(events: DataFrame, duration: str = "1 day") -> DataFrame:
    """Per-window, per-type counts + value sum (works batch or stream)."""
    return (
        events.groupBy(F.window("ts", duration).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, duration: str = "2 days", slide: str = "1 day"
) -> DataFrame:
    """Sliding windows: each event lands in duration/slide windows."""
    return (
        events.groupBy(F.window("ts", duration, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
        )
    )


def stream_dedup(events: DataFrame, keys: list[str]) -> DataFrame:
    """Streaming exact dedup on key columns. State-bound caveat: Spark
    only evicts dropDuplicates state under a watermark when the
    EVENT-TIME column is among the dedup keys — with value-only keys
    (the usual call shape here) state grows with all-time key
    cardinality regardless of any upstream watermark. For a long-running
    stream use stream_dedup_within_watermark, whose eviction is
    guaranteed by construction."""
    return events.dropDuplicates(keys)


def stream_dedup_within_watermark(
    events: DataFrame, keys: list[str], delay: str = "1 day"
) -> DataFrame:
    """Exact dedup with GUARANTEED-bounded state:
    dropDuplicatesWithinWatermark evicts a key's entry once the watermark
    passes its event time plus ``delay``, so state is O(keys within the
    horizon) forever — the 100 TB shape for unbounded streams, where
    plain dropDuplicates state grows with all-time key cardinality. The
    trade: a duplicate arriving later than ``delay`` after the original
    is re-emitted (at-least-once dedup, the standard streaming contract).

    Batch parity: under availableNow every event is inside the horizon,
    so the result equals DISTINCT over the keys."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        keys
    )


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Dynamic-gap session windows per user (session_window is
    streaming-native; batch equivalent is operators/temporal.sessionize)."""
    return (
        events.groupBy(
            F.session_window(F.col("ts"), gap).alias("win"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "user_id",
            "n_events",
        )
    )


def stream_interval_join(
    events: DataFrame, lookback: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Stream-stream interval join: each purchase event joins the same
    user's click events from the preceding ``lookback`` window. Both
    sides are watermarked — that is what lets Spark BOUND the join state:
    a buffered click can be dropped once the purchase-side watermark
    passes its ts + lookback, so state is O(events within the horizon),
    not O(stream). Without the time bound + watermarks Spark rejects the
    append-mode stream-stream join outright.

    Batch parity: under availableNow the single micro-batch sees all
    rows, so the result equals the batch range join (the oracle).

    State retention vs lateness: these are independent knobs, and
    ``lookback > watermark`` is a VALID configuration. Spark derives the
    buffered-state horizon from the join condition itself — click state
    is evicted only once the query watermark passes ``cts + lookback``,
    so the full lookback window is always retained no matter how small
    the ``watermark`` delay is. The delay only bounds how LATE an input
    row may arrive (event time older than watermark -> dropped at
    ingestion), which is the standard lateness trade, not a join-window
    truncation.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("pts"),
        )
        .withWatermark("pts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("cts"),
        )
        .withWatermark("cts", watermark)
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"p_user = c_user AND cts >= pts - INTERVAL {lookback} "
            "AND cts <= pts"
        ),
    )
    return joined.select(
        "purchase_id", "click_id", F.col("p_user").alias("user_id")
    )


# State-store partition sizing for the one-shot streams (optimization
# r12, guide §2 scale-adaptive partitioning): a NEW streaming query
# bakes spark.sql.shuffle.partitions into its checkpoint as the state
# partition count, and every micro-batch then opens/commits that many
# state stores. At the session default (CPU count) over a KB-scale
# fixture that is pure overhead — interleaved A/B at sf0.1: the line
# dedup stream ran 10.4/17.7s at 32 state partitions vs 5.1/4.7s at 2.
# The readers stash a SOURCE-SIZE-derived count under a custom conf key
# (~64 MiB of source per state partition, clamped to the configured
# shuffle partitions so TB-scale sources keep full state parallelism);
# run_stream_to_memory applies it only for the duration of the run.
STREAM_STATE_TARGET_BYTES = 64 * 1024 * 1024
_STATE_PARTITIONS_KEY = "hash_db_spark.stream.statePartitions"


def _stash_state_partitions(spark: SparkSession, *paths: str) -> None:
    """Derive and stash the state-partition count for the next
    run_stream_to_memory on this session. Local-path sizes only (the
    fixtures); any failure leaves the session default in force."""
    import os

    total = 0
    for p in paths:
        try:
            total += os.path.getsize(p)
        except OSError:
            return
    try:
        want = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return
    n = max(1, min(want, -(-total // STREAM_STATE_TARGET_BYTES)))
    spark.conf.set(_STATE_PARTITIONS_KEY, str(n))


def run_stream_to_memory(
    stream_df: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame with trigger(availableNow) into a
    memory sink; block until done; return the sink as a DataFrame. This
    is how the driver's batch-oracle checks validate streaming results.

    ``update`` mode contract: the memory sink ACCUMULATES one row per
    key per micro-batch, so the returned table equals the final state
    only when the run is a single micro-batch (availableNow with no
    maxFilesPerTrigger on the source — the shape every registry entry
    uses). A multi-batch update-mode caller must reduce to the last row
    per key itself."""
    spark = stream_df.sparkSession
    name = f"sink_{uuid.uuid4().hex[:12]}"
    stash = spark.conf.get(_STATE_PARTITIONS_KEY, None)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if stash is not None:
        # one-shot: consume the stash so a later stream without a
        # reader-derived size falls back to the session default
        spark.conf.unset(_STATE_PARTITIONS_KEY)
        if int(stash) < int(prev):
            spark.conf.set("spark.sql.shuffle.partitions", stash)
    try:
        with tempfile.TemporaryDirectory() as ckpt:
            q = (
                stream_df.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return stream_df.sparkSession.table(name)


def stateful_user_counter(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    a per-user cumulative event counter + running value sum whose state
    persists across micro-batches (the escape hatch for operators the
    built-in windows can't express — SURVEY §7's custom-operator tier).

    State is one (count, total) pair per user — bounded by user
    cardinality; at scale add a timeout to expire idle keys."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        cnt, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            total += float(pdf["value"].sum())
        state.update((cnt, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [cnt],
                "sum_value": [round(total, 2)],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="cnt long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def materialized_view_stream(
    events: DataFrame, dim: DataFrame, on, agg_cols: list
) -> DataFrame:
    """Incremental materialized join+agg view — the scalable version of the
    reference's eager insert-time materialized join ('create join',
    /root/reference/server.py:806-894, README.md:29-60): instead of
    re-running the join per insert, the stream joins each micro-batch
    against the dimension and maintains the aggregate incrementally."""
    return events.join(F.broadcast(dim), on).groupBy(*agg_cols).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


def streaming_ingest_dedup(
    docs_stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
):
    """Production ingest-dedup loop: per micro-batch, (1) collapse the
    batch's internal near-dups (MinHash pairs -> keep one per cluster),
    (2) probe the PERSISTED band index for near-dups against everything
    already ingested, (3) append only novel documents to ``out_path``
    and their index rows to ``index_path``.

    The dedup state lives in the parquet index — not in stream state —
    so the query is shareable with batch jobs
    (sources.writers.read_minhash_index) and unbounded in corpus size
    without executor-memory growth. Probe shape: batch bands broadcast,
    the corpus index is scanned, never shuffled
    (dedup.minhash_pairs_against_index).

    Delivery semantics: the two appends (docs, then index rows) are not
    atomic, so a crash between them can re-append the same docs when the
    checkpoint replays the batch — ``out_path`` is AT-LEAST-ONCE at the
    row level. Consumers read through ``read_ingested`` (exact keyed
    dedup on ``id_col``), which makes the pipeline end-to-end
    exactly-once for near-dup-distinct documents. Writing the index
    FIRST would invert the failure into data LOSS (replayed docs flag as
    dups of their own index rows and are never emitted) — duplicates a
    cheap keyed dedup can remove are the strictly better failure mode.

    Returns the StreamingQuery (trigger availableNow for tests/backfill;
    swap the trigger for continuous ingest).
    """
    from hash_db_spark.operators import dedup as D
    from hash_db_spark.sources.writers import (
        read_minhash_index,
        write_minhash_index,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # (1) within-batch collapse
        pairs = D.minhash_lsh_pairs(batch_df, col, id_col, threshold)
        batch_kept = D.apply_dedup_keep(batch_df, pairs, id_col)
        nb, nbands = D.minhash_index(batch_kept, col, id_col)
        # (2) probe the persisted index (absent on the very first batch).
        # try/except on the read, NOT os.path.exists — the index may live
        # on any Hadoop-visible filesystem (HDFS/S3), where a driver-local
        # path probe is always False and would silently skip the probe.
        # ONLY path-not-found means "first batch": a transient storage
        # error swallowed here would silently skip the dedup probe and
        # append every near-dup as novel — permanent corpus corruption,
        # strictly worse than failing the batch (checkpoint replays it).
        from pyspark.errors import AnalysisException

        from hash_db_spark.sources.writers import minhash_index_probe

        try:
            sh, all_bands = read_minhash_index(spark, index_path)
            have_index = True
        except AnalysisException as e:
            if "PATH_NOT_FOUND" not in str(e):
                raise
            have_index = False
        if have_index:
            # bands pruned to the batch's key buckets: the probe join
            # scans only matching bucket directories (PartitionFilters),
            # not the whole persisted index.
            try:
                bands = minhash_index_probe(spark, index_path, nbands)
            except AnalysisException as e:
                if "PATH_NOT_FOUND" not in str(e):
                    raise
                # bands/ exists but meta/ is absent (index written by a
                # pre-meta build, or a torn write). This is NOT a first
                # batch — skipping the probe would append every near-dup
                # as novel — and it is NOT appendable either: the
                # writer's append guard refuses a bands-without-meta
                # index because the existing rows were bucketed with an
                # unknown modulus. HEAL it: materialize the full index
                # (eager checkpoints — the frames must not lazily read
                # the path being overwritten), rewrite it re-bucketed
                # under our modulus, then probe pruned as usual. A heal
                # is a rare crash-recovery event; the full-index rewrite
                # cost is the price of restoring pruning for every
                # later batch.
                sh = sh.localCheckpoint(eager=True)
                bands_m = all_bands.localCheckpoint(eager=True)
                write_minhash_index(sh, bands_m, index_path)
                bands = minhash_index_probe(spark, index_path, nbands)
        if have_index:
            dup_ids = (
                D.minhash_pairs_against_index(nb, nbands, sh, bands, threshold)
                .select(F.col("new_id").alias("id"))
                .distinct()
            )
        else:
            dup_ids = spark.createDataFrame([], nb.select("id").schema)
        # (3) append the novel remainder + its index rows. novel_ids
        # derives from batch_kept, NOT from the index frame nb: the
        # index excludes empty-shingle docs (fewer tokens than one
        # 3-gram), and deriving novelty from nb would silently drop
        # every short document from the corpus forever. Short docs are
        # emitted but carry no index rows (the semi-joins below no-op
        # for them) — they dedup downstream via read_ingested's keyed
        # pass. Cached: feeds three writes, probe join runs once.
        novel_ids = (
            batch_kept.select(F.col(id_col).alias("id"))
            .join(dup_ids, "id", "left_anti")
            .cache()
        )
        try:
            novel_docs = batch_kept.join(
                novel_ids.withColumnRenamed("id", id_col), id_col, "left_semi"
            )
            novel_docs.write.mode("append").parquet(out_path)
            write_minhash_index(
                nb.join(novel_ids, "id", "left_semi"),
                nbands.join(novel_ids, "id", "left_semi"),
                index_path,
                mode="append",
            )
        finally:
            novel_ids.unpersist()

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_ingested(spark, out_path: str, id_col: str = "doc_id") -> DataFrame:
    """The exactly-once view of streaming_ingest_dedup's output: the
    docs appends are at-least-once under crash-replay, so consumers
    finish with an exact keyed dedup (cheap: one shuffle on the id, and
    re-appended rows are byte-identical so ANY winner is correct)."""
    return spark.read.parquet(out_path).dropDuplicates([id_col])


def streaming_media_ingest_dedup(
    media_stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    id_col: str = "media_id",
    max_hamming: int = 3,
):
    """Perceptual ingest-dedup for media streams — the multimodal twin
    of streaming_ingest_dedup: per micro-batch, (1) dHash every payload
    once, (2) collapse the batch's internal near-dups (band pairs ->
    keep one per cluster), (3) probe the PERSISTED dhash band index for
    near-dups against everything already ingested, (4) append only
    novel media to ``out_path`` and their hashes to ``index_path``.

    Payload bytes are decoded exactly once per ingest (the index stores
    60-bit hashes, 4 skinny band rows each); re-ingesting a corpus
    later probes hashes, never pixels. Probe shape: the batch's byte
    buckets prune the index scan (sources.writers.dhash_index_probe),
    then dedup.hamming_pairs_against verifies — corpus side banded and
    hot-capped, exact-equal boilerplate rescued.

    Delivery semantics are streaming_ingest_dedup's verbatim: media
    append first, index append second, so a crash between them replays
    as at-least-once rows in ``out_path`` (cleaned by a keyed read)
    rather than data loss. Returns the StreamingQuery (availableNow
    trigger)."""
    from pyspark.errors import AnalysisException

    from hash_db_spark.operators import dedup as D
    from hash_db_spark.operators import multimodal as M
    from hash_db_spark.sources.writers import (
        dhash_index_probe,
        write_dhash_index,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # (1) decode + hash ONCE: feeds the pair join (2 sides), the
        # probe, and the index append — without materialization the
        # mapInPandas decode would re-run per consumer.
        hashed = (
            M.image_dhash(
                batch_df.select(F.col(id_col).alias("media_id"), "payload")
            )
            .localCheckpoint(eager=True)
        )
        # (2) within-batch collapse
        pairs = D.hamming_band_pairs(hashed, "dhash", max_hamming=max_hamming)
        batch_kept = D.apply_dedup_keep(hashed, pairs, "id")
        # (3) probe the persisted index; only PATH_NOT_FOUND means
        # "first batch" (streaming_ingest_dedup's error discipline: a
        # swallowed transient storage error would re-ingest every dup).
        # A missing META with bands/ PRESENT (torn prior write — bands
        # land before meta) is NOT a first batch: skipping the probe
        # would append every near-dup as novel — and the writer's
        # append guard refuses such an index (its rows were bucketed
        # with an unknown modulus). HEAL it (the text loop's exact
        # discipline): materialize the distinct hashes, rewrite the
        # index re-bucketed under our modulus, then probe pruned.
        try:
            corpus = dhash_index_probe(spark, index_path, batch_kept)
        except AnalysisException as e:
            if "PATH_NOT_FOUND" not in str(e):
                raise
            try:
                prior = (
                    spark.read.parquet(f"{index_path}/bands")
                    .select("id", "dhash")
                    .distinct()
                    .localCheckpoint(eager=True)
                )
            except AnalysisException as e2:
                if "PATH_NOT_FOUND" not in str(e2):
                    raise
                prior = None
            if prior is not None:
                write_dhash_index(prior, index_path)
                corpus = dhash_index_probe(spark, index_path, batch_kept)
            else:
                corpus = None
        if corpus is not None:
            dup_ids = (
                D.hamming_pairs_against(
                    batch_kept, corpus, "dhash", max_hamming=max_hamming
                )
                .select(F.col("batch_id").alias("id"))
                .distinct()
            )
        else:
            dup_ids = spark.createDataFrame([], batch_kept.select("id").schema)
        novel_ids = batch_kept.select("id").join(dup_ids, "id", "left_anti").cache()
        try:
            (
                batch_df.join(
                    novel_ids.withColumnRenamed("id", id_col), id_col, "left_semi"
                )
                .write.mode("append")
                .parquet(out_path)
            )
            write_dhash_index(
                batch_kept.join(novel_ids, "id", "left_semi"),
                index_path,
                mode="append",
            )
        finally:
            novel_ids.unpersist()

    return (
        media_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as a file-source stream (schema from a static
    read; pathGlobFilter narrows the monitored dir to the one file)."""
    _stash_state_partitions(spark, f"{sf_dir}/documents.parquet")
    static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def read_embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings.parquet as a file-source stream (schema from a static
    read; pathGlobFilter narrows the monitored dir to the one file)."""
    _stash_state_partitions(spark, f"{sf_dir}/embeddings.parquet")
    static = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )


def streaming_pq_probe(
    queries_stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint: str,
    k: int = 5,
    nprobe: int = 2,
):
    """Streaming ANN serving: per micro-batch of query vectors, probe
    the PERSISTED IVF-PQ index (sources.writers.write_pq_index) and
    append (qid, vec_id, d2, rank) to ``out_path``. The batch's ADC
    tables are driver-computed per batch — bounded by the micro-batch,
    never the index — and the codes scan reads only the probed cell
    directories (PartitionFilters), so a 100 TB index serves each batch
    from ~nprobe/cells of its 4-byte codes. Index state lives in
    parquet, not stream state (shareable with batch probes, zero
    executor-memory growth) — the same externalized-state design as
    streaming_ingest_dedup.

    Delivery: appends replay on checkpoint recovery (at-least-once at
    the row level); readers dedup on (qid, vec_id) for exactly-once.

    Returns the StreamingQuery (availableNow for tests/backfill)."""
    from hash_db_spark.sources.writers import pq_index_topk

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        res = pq_index_topk(
            batch_df.sparkSession, index_path, batch_df, k=k, nprobe=nprobe
        )
        res.write.mode("append").parquet(out_path)

    return (
        queries_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def streaming_fts_ingest(
    docs_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    col: str = "text",
    id_col: str = "doc_id",
    token_buckets: int = 64,
):
    """Streaming full-text indexing: each micro-batch's postings append
    to the PERSISTED inverted index (sources.writers.write_fts_index),
    so FTS serving (operators.fts.fts_index_query / writers.bm25_from_index)
    sees new documents
    within one trigger without ever re-scanning the corpus. Index state
    is parquet, not stream state — shareable with batch probes, zero
    executor-memory growth (the streaming_ingest_dedup design); the
    bucket-modulus append guard refuses a torn or mismatched index.

    The first batch against an empty path bootstraps meta via a
    one-time overwrite; later batches append postings only.

    Delivery: appends replay on checkpoint recovery (at-least-once);
    fts_index_query is insensitive to duplicate postings for AND terms
    and dedups OR unions, so boolean probe RESULTS are exactly-once
    anyway (BM25 tf/df shift on replays — rebuild for scoring exactness).

    Returns the StreamingQuery (availableNow for tests/backfill)."""
    from hash_db_spark.sources.writers import write_fts_index

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # Bootstrap detection mirrors writers._append_guard: ONLY a
        # truly-missing meta selects first-write overwrite. A transient
        # FS/permission error must surface (a bare except here would
        # silently replace the whole index with one micro-batch), and
        # postings-without-meta is a torn prior write whose bands were
        # bucketed with an unknown modulus — refuse, demand a rebuild.
        from pyspark.errors import AnalysisException

        from hash_db_spark.sources.writers import _fs_exists

        try:
            spark.read.parquet(f"{index_path}/meta")
            mode = "append"
        except AnalysisException as e:
            if "PATH_NOT_FOUND" not in str(e):
                raise
            if _fs_exists(spark, f"{index_path}/postings"):
                raise ValueError(
                    f"FTS index at {index_path} has postings/ but no "
                    "meta/ (torn prior write): existing postings were "
                    "bucketed with an unknown modulus. Rebuild the index "
                    "(batch write_fts_index mode='overwrite') before "
                    "streaming appends."
                ) from e
            mode = "overwrite"
        write_fts_index(
            batch_df,
            index_path,
            text_col=col,
            id_col=id_col,
            token_buckets=token_buckets,
            mode=mode,
        )

    return (
        docs_stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
