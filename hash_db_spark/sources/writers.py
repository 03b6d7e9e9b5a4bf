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
    base: DataFrame, bands: DataFrame, path: str, key_buckets: int = 64
) -> None:
    """Persist a MinHash LSH index (dedup.minhash_index output) so
    incremental dedup never touches corpus text again:

    - bands/(id, band, key) partitioned by a key hash bucket — a probing
      batch's (band, key) lookups prune to matching buckets;
    - shingles/(id, sh) sorted by id within files — the verification
      join's id lookups page-skip.
    """
    out = bands.withColumn(
        "key_bucket", (F.abs(F.col("key")) % key_buckets).cast("int")
    )
    (
        out.repartition("key_bucket")
        .write.partitionBy("key_bucket")
        .mode("overwrite")
        .parquet(f"{path}/bands")
    )
    (
        base.select("id", "sh")
        .repartition(F.col("id"))
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        .parquet(f"{path}/shingles")
    )


def read_minhash_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """(shingles, bands) frames of a persisted MinHash index."""
    return (
        spark.read.parquet(f"{path}/shingles"),
        spark.read.parquet(f"{path}/bands").drop("key_bucket"),
    )
