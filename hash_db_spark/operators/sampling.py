"""Deterministic sampling & dataset splitting (training-data pipeline
operators, SURVEY §7 Phase 6 family).

Random sampling (``df.sample``) is not reproducible across engines, scales
or partitionings — a training pipeline needs *content-addressed* sampling:
hash the stable key, bucket the hash. Same row → same bucket, forever, on
any engine (md5-derived buckets, oracle-exact in DuckDB), robust to
repartitioning and incremental appends.

- hash_sample:       keep rows whose key-hash bucket < rate·buckets
- train_val_test:    97/2/1-style split assignment column
- stratified_sample: per-class rate via the same bucketing

At 100 TB these are map-side-only (no shuffle): each row's fate is a pure
function of its key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

BUCKETS = 10_000


def _bucket(key: Column) -> Column:
    """Stable bucket in [0, BUCKETS): md5-derived, engine-portable."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % BUCKETS
    )


def sql_bucket(key_expr: str) -> str:
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8))::BIGINT"
        f" % {BUCKETS})"
    )


def hash_sample(df: DataFrame, key: str, rate: float) -> DataFrame:
    """Keep ~rate of rows, deterministically by key hash."""
    return df.filter(_bucket(F.col(key)) < int(rate * BUCKETS))


def train_val_test(
    df: DataFrame, key: str, val: float = 0.02, test: float = 0.01
) -> DataFrame:
    """Assign a split column: test gets the lowest hash buckets, then
    val, then train — so growing val/test keeps prior membership stable
    (a row can move train→val but never val→test)."""
    b = _bucket(F.col(key))
    n_test = int(test * BUCKETS)
    n_val = int(val * BUCKETS)
    return df.withColumn(
        "split",
        F.when(b < n_test, "test")
        .when(b < n_test + n_val, "val")
        .otherwise("train"),
    )


def sql_train_val_test(key_expr: str, val: float = 0.02, test: float = 0.01) -> str:
    n_test = int(test * BUCKETS)
    n_val = int(val * BUCKETS)
    b = sql_bucket(key_expr)
    return (
        f"(CASE WHEN {b} < {n_test} THEN 'test' "
        f"WHEN {b} < {n_test + n_val} THEN 'val' ELSE 'train' END)"
    )


def stratified_sample(
    df: DataFrame, key: str, strata: str, rates: dict[str, float]
) -> DataFrame:
    """Per-class sampling rate (e.g. downsample the majority language)."""
    b = _bucket(F.col(key))
    thresh = None
    for cls, rate in rates.items():
        t = F.when(F.col(strata) == cls, int(rate * BUCKETS))
        thresh = t if thresh is None else thresh.when(
            F.col(strata) == cls, int(rate * BUCKETS)
        )
    thresh = thresh.otherwise(0)
    return df.filter(b < thresh)
