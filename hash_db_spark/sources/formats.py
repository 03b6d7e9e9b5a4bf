"""Interchange-format sources/sinks: CSV, JSON-lines, ORC.

The reference ingests via HTTP POST of string values
(/root/reference/client.py set/insert paths) — its only "format" is the
wire body. A Spark-native engine instead speaks the lake formats
directly; these helpers pin the semantics the tests rely on:

- CSV: header + explicit schema on read (never inferSchema in
  production — one extra full scan and type drift), ISO-8601 timestamps.
- JSON-lines: schema-on-read with an explicit schema; used both as an
  interchange sink and as the landing format for document shredding
  (operators/documents.py).
- ORC: columnar alternative to parquet, same vectorized reader path.

Each writer round-trips losslessly for the type set the fixtures use
(long/int/double/string/timestamp) — proven per-format by
tests/test_sources_formats.py and by registry round-trip queries whose
oracle is simply the source table (write → read back → must equal).

Scale note: these are thin wrappers over Spark's distributed readers —
splits, pushdown (ORC), and partition discovery come from the source
implementation. CSV/JSON are row formats: no column pruning or predicate
pushdown, so they are landing/interchange formats only; convert to
parquet/ORC before analytics (the round-trip queries are the conversion
path, not the query path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def _spread_for_write(df: DataFrame) -> DataFrame:
    """Round-robin repartition before a row-format write when the source
    has fewer splits than text serialization wants (optimization r12,
    guide §6): the roundtrip queries read a single-split parquet fixture,
    so the whole CSV/JSONL/XML serialization would otherwise run on ONE
    task. Content is partition-invariant (the roundtrip oracle compares
    full read-back, row order canonicalized); a TB-scale input already
    has thousands of splits and this is a no-op there. Reuses the
    stats-derived CPU spread (64 KiB/task, clamp [1, parallelism])."""
    from hash_db_spark.operators.dedup import spread_for_cpu

    return spread_for_cpu(df)


def write_csv(df: DataFrame, path: str) -> None:
    (
        _spread_for_write(df).write.option("header", True)
        .option("timestampFormat", TS_FMT)
        .mode("overwrite")
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    # multiLine: quoted fields may embed newlines (the writer quotes
    # them); without it each physical line parses as a row and the file
    # silently misaligns. Cost: multiLine files split per-file instead of
    # per-block — acceptable for a landing format.
    return (
        spark.read.option("header", True)
        .option("timestampFormat", TS_FMT)
        .option("multiLine", True)
        .schema(schema)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    _spread_for_write(df).write.option("timestampFormat", TS_FMT).mode(
        "overwrite"
    ).json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    return (
        spark.read.option("timestampFormat", TS_FMT).schema(schema).json(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    _spread_for_write(df).write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row") -> None:
    """XML sink (built into Spark 4 — the spark-xml package merged
    upstream, SPARK-44265). ISO timestamps so the round-trip schema
    read is exact."""
    (
        _spread_for_write(df).write.format("xml")
        .option("rowTag", row_tag)
        .option("timestampFormat", TS_FMT)
        .mode("overwrite")
        .save(path)
    )


def read_xml(
    spark: SparkSession, path: str, schema, row_tag: str = "row"
) -> DataFrame:
    """XML source with an explicit schema (never inference — same
    discipline as CSV/JSONL: inference re-scans and can narrow types);
    column order is restored from the schema, since XML readers sort
    discovered fields."""
    df = (
        spark.read.format("xml")
        .option("rowTag", row_tag)
        .option("timestampFormat", TS_FMT)
        .schema(schema)
        .load(path)
    )
    return df.select(*[f.name for f in schema.fields])
