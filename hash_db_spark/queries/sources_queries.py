"""Driver-checkable queries: interchange-format round-trips.

Each query writes a fixture table through a format sink (under a
deterministic temp path), reads it back with the original schema, and
returns the full table — the oracle is simply ``SELECT * FROM table``,
so a hash match proves the round-trip is lossless for every value
(including timestamps and shortest-repr doubles)."""

from __future__ import annotations

import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from hash_db_spark.catalog import load_table
from hash_db_spark.queries import Query
from hash_db_spark.sources import formats


def _tmp(name: str) -> str:
    return str(Path(tempfile.gettempdir()) / "hash_db_spark_fmt" / name)


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


QUERIES = {
    "csv_roundtrip": Query(q_csv_roundtrip, "SELECT * FROM supplier"),
    "jsonl_roundtrip": Query(q_jsonl_roundtrip, "SELECT * FROM orders"),
    "orc_roundtrip": Query(q_orc_roundtrip, "SELECT * FROM orders"),
}
