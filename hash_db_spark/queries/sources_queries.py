"""Driver-checkable queries: interchange-format round-trips.

Each query writes a fixture table through a format sink (under a
deterministic temp path), reads it back with the original schema, and
returns the full table — the oracle is simply ``SELECT * FROM table``,
so a hash match proves the round-trip is lossless for every value
(including timestamps and shortest-repr doubles)."""

from __future__ import annotations

import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.queries import Query
from hash_db_spark.sources import formats


def _tmp(name: str) -> str:
    # pid-keyed like the FTS index path (text_queries.py): a concurrent
    # pytest + driver check must never interleave write/read on the same
    # fixture directory.
    return str(
        Path(tempfile.gettempdir())
        / f"hash_db_spark_fmt_{os.getpid()}"
        / name
    )


def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier → CSV (header, ISO timestamps) → back with the original
    schema. Exercises int/long/double/string through the text format."""
    sup = load_table(spark, sf_dir, "supplier")
    path = _tmp("supplier_csv")
    formats.write_csv(sup, path)
    return formats.read_csv(spark, path, sup.schema)


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → JSON-lines → back; covers timestamps (micros precision)
    through the schema-on-read path documents also use."""
    orders = load_table(spark, sf_dir, "orders")
    path = _tmp("orders_jsonl")
    formats.write_jsonl(orders, path)
    return formats.read_jsonl(spark, path, orders.schema)


def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → ORC → back; the columnar alternative keeps types natively."""
    orders = load_table(spark, sf_dir, "orders")
    path = _tmp("orders_orc")
    formats.write_orc(orders, path)
    return formats.read_orc(spark, path)


def q_hive_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory-partitioned layout + pruned read: documents written
    partitionBy(lang), then a lang-filtered aggregate. The filter binds
    at PLANNING time (PartitionFilters) — at 100 TB the scan opens only
    the lang=en directory, never listing the rest; the plan gate
    (tests/test_plan_quality.py) asserts the pruning is really there."""
    import pyspark.sql.functions as F

    from hash_db_spark.sources import writers

    docs = load_table(spark, sf_dir, "documents")
    path = _tmp("documents_by_lang")
    writers.write_partitioned(docs, path, "lang")
    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    return back.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
    )


HIVE_PRUNE_ORACLE = """
SELECT source, lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE lang = 'en' GROUP BY source, lang
"""


def q_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values over (p_size, p_partkey): the clustering key
    write_zordered lays files out by. Bit-exact in both engines (pure
    integer mask-spread interleave)."""
    import pyspark.sql.functions as F

    from hash_db_spark.operators import layout

    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 400)
    return part.select(
        "p_partkey",
        "p_size",
        layout.z_value("p_size", "p_partkey").alias("zval"),
    )


def _zorder_oracle() -> str:
    from hash_db_spark.operators import layout

    return f"""
SELECT p_partkey, p_size,
       {layout.sql_z_value('p_size', 'p_partkey')} AS zval
FROM part WHERE p_partkey <= 400
"""


WARC_SUBSET = "(SELECT * FROM documents WHERE doc_id % 7 = 2)"


def q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl landing-format ingest: REAL WARC/1.0 payloads (request +
    response records per capture) parsed with length-based framing in
    one Arrow pass; response records only, bodies reduced to
    (length, md5). The stage every web-curation operator sits behind —
    oracle regenerates url/status/mime/body stats from the generative
    closed forms without touching a byte."""
    from hash_db_spark.sources import warc

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 7 == 2
    )
    return warc.warc_records(warc.synth_warc_media(docs, "doc_id"))


def _warc_oracle() -> str:
    from hash_db_spark.sources import warc

    return warc.sql_warc_records(WARC_SUBSET, "doc_id")


def q_warc_extract_gz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzip-membered WARC ingest (the production landing format: each
    record its own gzip member, members concatenated). The parser
    magic-sniffs and decompresses inside the SAME Arrow batch loop —
    identical plan shape to warc_extract, and the identical closed-form
    oracle: compression must be invisible to extraction."""
    from hash_db_spark.sources import warc

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 7 == 2
    )
    return warc.warc_records(warc.synth_warc_media_gz(docs, "doc_id"))


def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → XML (Spark 4 built-in source, SPARK-44265) → back with
    the original schema — timestamps included; the hash compare proves
    the text format is lossless for every value."""
    orders = load_table(spark, sf_dir, "orders")
    path = _tmp("orders_xml")
    formats.write_xml(orders, path)
    return formats.read_xml(spark, path, orders.schema)


COMPACT_TARGET = 40_000  # stand-in bytes per output group


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction plan (operators/layout.py:compaction_plan)
    over a manifest derived from documents (path = source/zero-padded
    id, bytes = n_chars — the fixture's stand-in for a file listing;
    a real run feeds the table's file-level metadata). Zero-padding
    keeps the path order identical lexicographically on both engines."""
    from hash_db_spark.operators.layout import compaction_plan

    docs = load_table(spark, sf_dir, "documents")
    manifest = docs.select(
        F.concat(
            F.col("source"),
            F.lit("/"),
            F.lpad(F.col("doc_id").cast("string"), 8, "0"),
            F.lit(".parquet"),
        ).alias("path"),
        F.col("n_chars").alias("bytes"),
    )
    return compaction_plan(manifest, COMPACT_TARGET)


def _compaction_plan_oracle() -> str:
    from hash_db_spark.operators.layout import sql_compaction_plan

    manifest = (
        "SELECT source || '/' || lpad(doc_id::VARCHAR, 8, '0') "
        "|| '.parquet' AS path, n_chars AS bytes FROM documents"
    )
    return sql_compaction_plan(manifest, COMPACT_TARGET)


VACUUM_KEEP = 2


def _vacuum_store() -> str:
    """Per-process store path — the fts_serve_mixed race discipline
    (parallel pytest/bench runs never share a store). NOT keyed by
    sf_dir: the version/pointer layout the audit classifies is
    identical at every SF, and the oracle string is built once at
    registry time, so query and oracle must agree on the path at any
    sweep SF."""
    import os

    return str(
        Path(tempfile.gettempdir())
        / f"hash_db_spark_vacuum_{os.getpid()}"
    )


def q_vacuum_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention audit of the atomic publication protocol
    (sources/writers.py:publish_version): four published versions plus
    one crash-orphan staged ABOVE the pointer; vacuum classifies
    live/retained/expired/orphan and emits the keep/delete decision
    table. Pure metadata — one FS listing bounded by version count."""
    import shutil

    from hash_db_spark.sources import writers as W

    store = _vacuum_store()
    shutil.rmtree(store, ignore_errors=True)
    docs = load_table(spark, sf_dir, "documents")
    for i in range(1, 5):
        W.publish_version(
            docs.filter(F.col("doc_id") < 10 * i)
            .select("doc_id", "lang")
            .coalesce(1),
            store,
        )
    # a crashed publisher: staged v=5, pointer never flipped
    docs.filter(F.col("doc_id") < 5).select("doc_id", "lang").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{store}/v=5")
    return W.vacuum_plan(spark, store, keep=VACUUM_KEEP)


def _vacuum_plan_oracle() -> str:
    from hash_db_spark.sources import writers as W

    return W.sql_vacuum_plan(_vacuum_store(), keep=VACUUM_KEEP)


QUERIES = {
    "csv_roundtrip": Query(q_csv_roundtrip, "SELECT * FROM supplier"),
    "jsonl_roundtrip": Query(q_jsonl_roundtrip, "SELECT * FROM orders"),
    "orc_roundtrip": Query(q_orc_roundtrip, "SELECT * FROM orders"),
    "hive_partition_prune": Query(q_hive_partition_prune, HIVE_PRUNE_ORACLE),
    "zorder_values": Query(q_zorder_values, _zorder_oracle()),
    "warc_extract": Query(q_warc_extract, _warc_oracle()),
    "warc_extract_gz": Query(q_warc_extract_gz, _warc_oracle()),
    # registered r10 (queued r09 under the VERDICT r08 #1 throttle):
    "compaction_plan": Query(q_compaction_plan, _compaction_plan_oracle()),
    "xml_roundtrip": Query(q_xml_roundtrip, "SELECT * FROM orders"),
    # registered r11 (queued r10 under the VERDICT r08 #1 throttle):
    "vacuum_plan": Query(q_vacuum_plan, _vacuum_plan_oracle()),
}


BUCKETS = 16

# Per-session token for managed-table names: pid alone collides when the
# OS reuses pids across runs (ADVICE r10). Computed once per process.
_SESSION_TOKEN: str | None = None


def _session_token() -> str:
    global _SESSION_TOKEN
    if _SESSION_TOKEN is None:
        import uuid

        _SESSION_TOKEN = uuid.uuid4().hex[:8]
    return _SESSION_TOKEN


def q_bucketed_join_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join end-to-end: orders and lineitem are written as
    hash-BUCKETED tables on the join key, then joined straight from
    storage — Spark's outputPartitioning contract means NO shuffle
    exchange on either side (tests/test_plan_quality.py pins the plan:
    sort-merge join, zero Exchange). At 100 TB this is the difference
    between re-shuffling both fact tables on every join and paying the
    layout cost ONCE at ingest — the Spark answer to the reference's
    insert-join-partners-next-to-rows materialized join
    (reference server.py:806-894). Result: revenue by order priority —
    the oracle recomputes it with a plain join, identity of results
    being the correctness statement (the bucketing is pure layout).

    Table names carry pid + a per-session token + a dir tag so
    concurrent runs (and pid reuse across reboots) never collide; the
    sweep of leftover tables only drops ones whose owning process is
    provably dead."""
    import hashlib
    import os

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    pid = os.getpid()
    tok = _session_token()
    t_o = f"hdbs_bkt_o_{tag}_{pid}_{tok}"
    t_l = f"hdbs_bkt_l_{tag}_{pid}_{tok}"
    # best-effort sweep of DEAD processes' tables: each driver run would
    # otherwise leave two managed tables in the warehouse forever.
    # A table is swept only when its embedded pid no longer exists —
    # never a live concurrent run's (os.kill(pid, 0) raises
    # ProcessLookupError only for dead pids). Same-session tables are
    # reused via mode=overwrite, so the steady state is exactly two.
    for t in spark.catalog.listTables():
        name = t.name
        if not name.startswith("hdbs_bkt_") or name.endswith(f"_{tok}"):
            continue
        parts = name.split("_")
        try:
            owner = int(parts[4])
        except (IndexError, ValueError):
            owner = None  # legacy name without a token — sweep it
        if owner is not None:
            try:
                os.kill(owner, 0)
                continue  # owner alive: its run may be mid-join
            except ProcessLookupError:
                pass  # owner dead: safe to sweep
            except PermissionError:
                continue  # alive but other user: leave it
        try:
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        except Exception:
            pass  # raced with another sweeper; leave it
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    (
        orders.write.bucketBy(BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(t_o)
    )
    (
        li.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable(t_l)
    )
    joined = spark.table(t_o).join(spark.table(t_l), "o_orderkey")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


BUCKETED_JOIN_ORACLE = """
SELECT o_orderpriority, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# r12 QUEUE CANDIDATE (session 9):
#   "bucketed_join_serve": Query(
#       q_bucketed_join_serve, BUCKETED_JOIN_ORACLE),
