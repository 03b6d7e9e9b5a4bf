"""hash_db_spark — a PySpark-native analytics engine with the capability
surface of samsquire/hash-db (reference at /root/reference, read-only).

Not a port: the reference's mechanisms (tries, consistent hashing, converged
R/C/S/FTS keyspaces, networkjoin, dense adjacency matrices) dissolve into
Spark primitives. What this package keeps is the *capability surface*:

- DynamoDB-style pk/sk point/range/prefix queries  (operators.kv)
- SQL: select/where/join/group-by/insert/update    (operators.relational)
- full-text `~ 'a & b | c'` search                 (operators.fts)
- multi-model JSON documents + path queries        (operators.documents)
- property graph + Cypher MATCH/MERGE              (cypher/)
- plus the large-scale training-data-pipeline operators the reference
  lacks: dedup (exact/minhash/simhash/jaccard/embedding), similarity
  search, text analysis, multimodal columns, streaming windows.

Everything is expressed declaratively with the DataFrame API so Catalyst
handles pushdown, pruning, join selection, and AQE handles skew at scale.
"""

from hash_db_spark.session import get_spark
from hash_db_spark.catalog import load_tables, register_views


def connect(spark=None, tables=None):
    """Open a HashDb — the single-object facade with the reference
    server's API surface (api.HashDb). Late import keeps bare package
    import light."""
    from hash_db_spark.api import HashDb

    return HashDb(spark or get_spark(), tables)


__all__ = ["get_spark", "load_tables", "register_views", "connect"]
__version__ = "0.1.0"
