from hash_db_spark.sql.dialect import SqlEngine

__all__ = ["SqlEngine"]
