"""Driver-checkable queries: multimodal binary-column plumbing. The
payload bytes are the utf-8 text of documents (codec stubbed — see
operators/multimodal.py), so the Arrow-batched mapInPandas feature
pipeline is oracle-checkable via DuckDB md5/octet_length."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.operators import multimodal as M
from hash_db_spark.queries import Query


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = M.media_table(docs, "doc_id", "text")
    return M.extract_features(media)


def q_multimodal_meta_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata predicate without touching payloads — the column-pruning
    payoff of the payload/meta split."""
    docs = load_table(spark, sf_dir, "documents")
    media = M.media_table(docs, "doc_id", "text")
    return media.filter(F.col("meta.n_chars") > 400).select(
        "media_id", "kind", F.col("meta.n_chars").alias("n_chars")
    )


QUERIES = {
    "multimodal_features": Query(
        q_multimodal_features,
        M.sql_extract_features("documents", "doc_id", "text"),
    ),
    "multimodal_meta_filter": Query(
        q_multimodal_meta_filter,
        "SELECT doc_id AS media_id, 'image/fake' AS kind, "
        "CAST(len(text) AS INT) AS n_chars FROM documents WHERE len(text) > 400",
    ),
}
