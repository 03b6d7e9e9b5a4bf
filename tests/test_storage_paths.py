"""Storage-path tests: (a) a *stored* kv table gets scan-level pushdown
(the production shape for operators/kv.py — catalog.kv_view's derived
columns can't push, stored columns do); (b) the streaming pipeline
processes multiple micro-batches incrementally and still matches batch."""

from __future__ import annotations

import contextlib
import io

import pyspark.sql.functions as F

from hash_db_spark.catalog import kv_view, load_table
from hash_db_spark.operators import kv as K
from hash_db_spark.streaming import windows as W


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_stored_kv_gets_pushdown(spark, sf_dir, tmp_path):
    path = str(tmp_path / "kv_store")
    kv_view(load_table(spark, sf_dir, "events")).write.parquet(path)
    stored = spark.read.parquet(path)
    q = K.query_begins(stored, "user#42", "click#")
    plan = _plan(q)
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "EqualTo(pk,user#42)" in pushed
    assert "StringStartsWith(sk,click#)" in pushed
    # and the stored path returns the same rows as the derived view
    derived = K.query_begins(
        kv_view(load_table(spark, sf_dir, "events")), "user#42", "click#"
    )
    assert sorted(map(tuple, q.collect())) == sorted(map(tuple, derived.collect()))


def test_stateful_operator_accumulates_across_microbatches(spark, sf_dir, tmp_path):
    """applyInPandasWithState: per-user state must carry across 4
    micro-batches; the latest emitted row per user equals the batch
    groupBy aggregate."""
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev_state")
    ev.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = W.run_stream_to_memory(
        W.stateful_user_counter(stream), output_mode="update"
    )
    # update-mode memory sink appends one row per (user, batch) — the
    # final state per user is the row with the max count.
    latest = (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("sum_value").alias("sum_value"),
        )
    )
    batch = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    got = {(r.user_id, r.n_events) for r in latest.collect()}
    want = {(r.user_id, r.n_events) for r in batch.collect()}
    assert got == want
    # sums agree within rounding noise of per-batch accumulation order
    sums_got = {r.user_id: r.sum_value for r in latest.collect()}
    for r in batch.collect():
        assert abs(sums_got[r.user_id] - r.sum_value) < 0.05, r


def test_streaming_multiple_microbatches_matches_batch(spark, sf_dir, tmp_path):
    """Split events into 4 files, stream with maxFilesPerTrigger=1 →
    4 micro-batches of incremental state updates; the final windowed
    counts must equal the batch result (true incrementality, not one
    catch-all batch)."""
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_parts")
    ev.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    result = W.run_stream_to_memory(W.tumbling_counts(stream, "1 day"))
    batch = W.tumbling_counts(ev, "1 day")
    got = {tuple(r) for r in result.collect()}
    want = {tuple(r) for r in batch.collect()}
    assert got == want


def test_minhash_index_persist_and_probe(spark, sf_dir, tmp_path):
    """Incremental dedup against a PERSISTED index must equal the direct
    two-sided computation — the index-once, probe-per-batch ingest path."""
    import pyspark.sql.functions as F

    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators import dedup as D
    from hash_db_spark.sources import writers

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)

    base, bands = D.minhash_index(corpus, "text", "doc_id")
    writers.write_minhash_index(base, bands, str(tmp_path / "mhidx"))
    stored_sh, stored_bands = writers.read_minhash_index(
        spark, str(tmp_path / "mhidx")
    )

    nb, nbands = D.minhash_index(batch, "text", "doc_id")
    from_store = {
        tuple(r)
        for r in D.minhash_pairs_against_index(
            nb, nbands, stored_sh, stored_bands, threshold=0.5
        ).collect()
    }
    direct = {
        tuple(r)
        for r in D.minhash_pairs_against(
            batch, corpus, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert from_store == direct and from_store


def test_fts_index_bm25_matches_scan_path(spark, sf_dir, tmp_path):
    """BM25 served from the persisted inverted index must score exactly
    like the scan-time path, and the probe scan must prune to the query
    terms' hash-bucket partitions."""
    from hash_db_spark.operators import ranking as R
    from hash_db_spark.sources import writers

    docs = load_table(spark, sf_dir, "documents")
    terms = ["hash", "join", "spark"]
    path = str(tmp_path / "ftsidx")
    writers.write_fts_index(docs, path, token_buckets=16)
    postings, doclens, buckets = writers.read_fts_index(spark, path)
    # the bucket modulus round-trips as index metadata — a probe with a
    # mismatched count would silently return partial postings
    assert buckets == 16

    got = R.bm25_from_index(postings, doclens, terms, token_buckets=buckets)
    want = R.bm25_rank(docs, "text", "doc_id", terms)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]

    probe = writers.fts_index_probe(postings, terms, token_buckets=buckets)
    plan = _plan(probe)
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "tok_bucket" in pf_line  # bucket predicate prunes directories
    pushed = next(l for l in plan.splitlines() if "PushedFilters" in l)
    assert "In(tok" in pushed  # term filter reaches the parquet reader


def test_streaming_ingest_dedup_keeps_one_per_cluster(spark, sf_dir, tmp_path):
    """Stream the documents fixture in micro-batches through the
    foreachBatch ingest-dedup loop: the persisted-index state must make
    later batches drop near-dups of earlier batches' docs, and the final
    ingested set must contain no near-dup pair at all."""
    import pyspark.sql.functions as F

    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators import dedup as D
    from hash_db_spark.streaming import windows as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_parts")
    # 3 files -> 3 micro-batches; fixture plants near-dup pairs that the
    # round-robin repartition spreads across batches
    docs.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = W.streaming_ingest_dedup(
        stream,
        index_path=str(tmp_path / "idx"),
        out_path=str(tmp_path / "kept"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    kept = spark.read.parquet(str(tmp_path / "kept"))
    n_kept, n_docs = kept.count(), docs.count()
    # dedup actually dropped something (fixture has >= 25 planted pairs)
    assert 0 < n_kept < n_docs
    # survivors are near-dup-free (keep-first may retain a chain member
    # whose jaccard to the kept representative is below threshold, so
    # assert no pair REMAINS rather than exact set equality)
    leftover = D.minhash_lsh_pairs(kept, "text", "doc_id", threshold=0.5)
    assert leftover.count() == 0
    # every dropped doc has a kept near-dup witness under the index probe
    dropped = docs.join(kept, "doc_id", "left_anti")
    nb, nbands = D.minhash_index(dropped, "text", "doc_id")
    kb, kbands = D.minhash_index(kept, "text", "doc_id")
    witnesses = D.minhash_pairs_against_index(
        nb, nbands, kb, kbands, threshold=0.5
    )
    assert witnesses.select("new_id").distinct().count() == dropped.count()


def test_ivf_index_persist_probe_matches_inline(spark, sf_dir, tmp_path):
    """Serving from the persisted IVF artifact must equal the inline
    kmeans-wired IVF, and the candidate scan must partition-prune to the
    probed cells."""
    from hash_db_spark.catalog import load_table
    from hash_db_spark.operators import similarity as S
    from hash_db_spark.operators.clustering import kmeans_centroids
    from hash_db_spark.sources import writers

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    writers.write_ivf_index(emb, path, k=8)

    qids = [1, 2, 3, 4, 5]
    got = S.topk_ivf_persisted(spark, path, qids, k=5)
    want = S.topk_ivf(
        emb, qids, k=5, centroids=kmeans_centroids(emb, k=8)
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    } and got.count() > 0

    # partition pruning: the cells scan carries a partition filter on
    # cluster (cells are directory-partitioned by it)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cluster" in plan.split(
        "PartitionFilters: ["
    )[1].split("]")[0]


def test_compact_files(spark, tmp_path):
    """Fragmented table (64 tiny files) compacts to the computed file
    count with identical data."""
    import glob

    from hash_db_spark.sources.writers import compact_files

    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    spark.range(10_000).repartition(64).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 64

    # target far above total size -> exactly one output file
    n = compact_files(spark, src, out, target_file_bytes=1 << 30)
    assert n == 1
    assert len(glob.glob(f"{out}/*.parquet")) == 1
    a = spark.read.parquet(src)
    b = spark.read.parquet(out)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # tiny target -> multiple files, data still identical
    out2 = str(tmp_path / "compacted2")
    n2 = compact_files(spark, src, out2, target_file_bytes=8 * 1024)
    assert n2 > 1
    assert len(glob.glob(f"{out2}/*.parquet")) == n2
    c = spark.read.parquet(out2)
    assert a.exceptAll(c).count() == 0 and c.exceptAll(a).count() == 0


def test_compact_files_split_with_shuffle(spark, tmp_path):
    """coalesce cannot split; shuffle=True must, and the returned count
    must equal what was actually written either way."""
    import glob

    from hash_db_spark.sources.writers import compact_files

    src = str(tmp_path / "one_big")
    spark.range(50_000).coalesce(1).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 1

    # no shuffle: cannot split one file; returns the true count (1)
    out1 = str(tmp_path / "nosplit")
    n1 = compact_files(spark, src, out1, target_file_bytes=16 * 1024)
    assert n1 == len(glob.glob(f"{out1}/*.parquet")) == 1

    # shuffle: splits to the computed count
    out2 = str(tmp_path / "split")
    n2 = compact_files(
        spark, src, out2, target_file_bytes=16 * 1024, shuffle=True
    )
    assert n2 == len(glob.glob(f"{out2}/*.parquet")) > 1
    a = spark.read.parquet(src)
    b = spark.read.parquet(out2)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_streaming_ingest_keeps_short_documents(spark, tmp_path):
    """Documents too short to shingle (fewer than 3 tokens) must still
    be ingested: novelty derives from the batch's kept set, not from
    the shingle index (which excludes them). Regression for silent
    short-doc loss."""
    from hash_db_spark.streaming import windows as W

    docs = spark.createDataFrame(
        [
            (1, "hi"),
            (2, "two tokens"),
            (3, "a full length document with plenty of tokens inside"),
        ],
        ["doc_id", "text"],
    )
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
    )
    q = W.streaming_ingest_dedup(
        stream,
        index_path=str(tmp_path / "idx"),
        out_path=str(tmp_path / "kept"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    kept = {r.doc_id for r in spark.read.parquet(str(tmp_path / "kept")).collect()}
    assert kept == {1, 2, 3}


def test_minhash_index_append_modulus_mismatch_raises(spark, tmp_path):
    """Appending bands bucketed with a DIFFERENT key_buckets than the
    existing index silently re-points probes at wrong bucket dirs (old
    duplicates re-ingested as novel) — the writer must refuse."""
    import pytest

    from hash_db_spark.operators import dedup as D
    from hash_db_spark.sources import writers

    docs = spark.createDataFrame(
        [(i, f"document number {i} with several shared tokens inside") for i in range(6)],
        ["doc_id", "text"],
    )
    base, bands = D.minhash_index(docs, "text", "doc_id")
    path = str(tmp_path / "mhidx")
    writers.write_minhash_index(base, bands, path, key_buckets=64)
    # re-asserting the same modulus on append is fine
    writers.write_minhash_index(base, bands, path, key_buckets=64, mode="append")
    with pytest.raises(ValueError, match="key_buckets=64"):
        writers.write_minhash_index(base, bands, path, key_buckets=32, mode="append")


def test_minhash_index_append_torn_empty_meta_raises(spark, tmp_path):
    """meta/ is written LAST, so a present-but-EMPTY meta means a torn
    prior write whose bands/ were already bucketed with an unknown
    modulus. Appending as if this were a first write would re-point
    probes at wrong bucket dirs — the writer must refuse and demand a
    rebuild (ADVICE r07 medium)."""
    import pytest

    from hash_db_spark.operators import dedup as D
    from hash_db_spark.sources import writers

    docs = spark.createDataFrame(
        [(i, f"document number {i} with several shared tokens inside") for i in range(6)],
        ["doc_id", "text"],
    )
    base, bands = D.minhash_index(docs, "text", "doc_id")
    path = str(tmp_path / "mhidx")
    writers.write_minhash_index(base, bands, path, key_buckets=64)
    # Simulate the torn write: meta/ exists but holds zero rows.
    spark.createDataFrame([], "key_buckets int").write.mode(
        "overwrite"
    ).parquet(f"{path}/meta")
    with pytest.raises(ValueError, match="torn meta"):
        writers.write_minhash_index(base, bands, path, key_buckets=64, mode="append")
    # Rebuild (overwrite) is the prescribed recovery and must succeed.
    writers.write_minhash_index(base, bands, path, key_buckets=64)
    writers.write_minhash_index(base, bands, path, key_buckets=64, mode="append")


def test_streaming_ingest_probes_despite_missing_meta(spark, tmp_path):
    """bands/ present but meta/ absent (pre-meta index or torn write) is
    NOT a first batch: the ingest loop must still probe — via the
    unpruned bands frame — so a near-dup of an indexed doc is dropped,
    not appended as novel (ADVICE r05)."""
    import shutil

    from hash_db_spark.streaming import windows as W

    long_text = "the quick brown fox jumps over the lazy dog again and again"
    seed = spark.createDataFrame([(1, long_text)], ["doc_id", "text"])
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "kept")

    # Seed batch 1 through the loop to build index + corpus.
    src1 = str(tmp_path / "src1")
    seed.coalesce(1).write.parquet(src1)
    stream1 = spark.readStream.schema(seed.schema).parquet(src1)
    W.streaming_ingest_dedup(
        stream1, index_path=idx, out_path=out,
        checkpoint=str(tmp_path / "ckpt1"),
    ).awaitTermination(120)

    # Simulate the pre-meta/torn-write index.
    shutil.rmtree(f"{idx}/meta")

    # Batch 2 carries an exact dup of doc 1 plus one novel doc.
    batch2 = spark.createDataFrame(
        [(2, long_text), (3, "completely different words appear in this novel document")],
        ["doc_id", "text"],
    )
    src2 = str(tmp_path / "src2")
    batch2.coalesce(1).write.parquet(src2)
    stream2 = spark.readStream.schema(batch2.schema).parquet(src2)
    W.streaming_ingest_dedup(
        stream2, index_path=idx, out_path=out,
        checkpoint=str(tmp_path / "ckpt2"),
    ).awaitTermination(120)

    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {1, 3}  # the dup of 1 was dropped, the novel doc kept


def test_streaming_media_ingest_dedup_end_to_end(spark, tmp_path):
    """Perceptual streaming ingest: batch 1 seeds the dhash index;
    batch 2 carries an exact pixel dup of a seeded image plus a novel
    raster — the dup is dropped via the persisted index probe, the
    novel image lands, and its hashes append to the index."""
    from hash_db_spark.operators.multimodal import ppm_encode
    from hash_db_spark.streaming import windows as W

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "kept")

    def media_df(rows):
        return spark.createDataFrame(
            [(mid, bytearray(payload)) for mid, payload in rows],
            "media_id long, payload binary",
        )

    # Batch 1: two distinct rasters.
    b1 = media_df([(1, ppm_encode(1, 8, 6)), (2, ppm_encode(2, 9, 5))])
    src1 = str(tmp_path / "src1")
    b1.coalesce(1).write.parquet(src1)
    W.streaming_media_ingest_dedup(
        spark.readStream.schema(b1.schema).parquet(src1),
        index_path=idx, out_path=out,
        checkpoint=str(tmp_path / "ckpt1"),
    ).awaitTermination(120)

    # Batch 2: media 3 has media 1's exact pixels (same generative id),
    # media 4 is novel.
    b2 = media_df([(3, ppm_encode(1, 8, 6)), (4, ppm_encode(7, 10, 4))])
    src2 = str(tmp_path / "src2")
    b2.coalesce(1).write.parquet(src2)
    W.streaming_media_ingest_dedup(
        spark.readStream.schema(b2.schema).parquet(src2),
        index_path=idx, out_path=out,
        checkpoint=str(tmp_path / "ckpt2"),
    ).awaitTermination(120)

    kept = {r.media_id for r in spark.read.parquet(out).collect()}
    assert kept == {1, 2, 4}
    # index holds 4 band rows per surviving hash, for exactly ids 1,2,4
    bands = spark.read.parquet(f"{idx}/bands")
    idx_ids = {r.id for r in bands.select("id").distinct().collect()}
    assert idx_ids == {1, 2, 4}
    assert bands.count() == 12


def test_streaming_media_ingest_probes_despite_missing_meta(spark, tmp_path):
    """bands/ present but meta/ absent (torn dhash-index write) is NOT a
    first batch: the media ingest loop must still probe — via the
    unpruned bands relation — so an exact dup of an indexed image is
    dropped, not re-ingested as novel."""
    import shutil

    from hash_db_spark.operators.multimodal import ppm_encode
    from hash_db_spark.streaming import windows as W

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "kept")

    def media_df(rows):
        return spark.createDataFrame(
            [(mid, bytearray(p)) for mid, p in rows],
            "media_id long, payload binary",
        )

    b1 = media_df([(1, ppm_encode(1, 8, 6))])
    src1 = str(tmp_path / "src1")
    b1.coalesce(1).write.parquet(src1)
    W.streaming_media_ingest_dedup(
        spark.readStream.schema(b1.schema).parquet(src1),
        index_path=idx, out_path=out,
        checkpoint=str(tmp_path / "ckpt1"),
    ).awaitTermination(120)

    shutil.rmtree(f"{idx}/meta")

    b2 = media_df([(2, ppm_encode(1, 8, 6)), (3, ppm_encode(5, 7, 5))])
    src2 = str(tmp_path / "src2")
    b2.coalesce(1).write.parquet(src2)
    W.streaming_media_ingest_dedup(
        spark.readStream.schema(b2.schema).parquet(src2),
        index_path=idx, out_path=out,
        checkpoint=str(tmp_path / "ckpt2"),
    ).awaitTermination(120)

    kept = {r.media_id for r in spark.read.parquet(out).collect()}
    assert kept == {1, 3}  # dup of 1 dropped despite the torn meta


def test_minhash_index_append_meta_missing_bands_present_raises(spark, tmp_path):
    """bands/ land before meta/, so 'meta missing, bands present' is a
    torn prior write, NOT a first write: appending would stamp the
    caller's modulus over bands bucketed with an unknown one (ADVICE
    r08). The guard must refuse BEFORE any data lands — the bands
    row count must be unchanged after the refused append."""
    import shutil

    import pytest

    from hash_db_spark.operators import dedup as D
    from hash_db_spark.sources import writers

    docs = spark.createDataFrame(
        [(i, f"document number {i} with several shared tokens inside") for i in range(6)],
        ["doc_id", "text"],
    )
    base, bands = D.minhash_index(docs, "text", "doc_id")
    path = str(tmp_path / "mhidx")
    writers.write_minhash_index(base, bands, path, key_buckets=64)
    n_before = spark.read.parquet(f"{path}/bands").count()
    shutil.rmtree(f"{path}/meta")
    with pytest.raises(ValueError, match="bands/ but no meta/"):
        writers.write_minhash_index(
            base, bands, path, key_buckets=64, mode="append"
        )
    assert spark.read.parquet(f"{path}/bands").count() == n_before
    # prescribed recovery: rebuild, then append works again
    writers.write_minhash_index(base, bands, path, key_buckets=64)
    writers.write_minhash_index(base, bands, path, key_buckets=64, mode="append")


def test_dhash_index_append_meta_missing_bands_present_raises(spark, tmp_path):
    import shutil

    import pytest

    from hash_db_spark.sources import writers

    hashes = spark.createDataFrame(
        [(1, 12345), (2, 999999)], "id long, dhash long"
    )
    path = str(tmp_path / "dhidx")
    writers.write_dhash_index(hashes, path, byte_buckets=64)
    shutil.rmtree(f"{path}/meta")
    with pytest.raises(ValueError, match="bands/ but no meta/"):
        writers.write_dhash_index(hashes, path, byte_buckets=64, mode="append")
