from hash_db_spark.cypher.parser import CypherParser
from hash_db_spark.cypher.compiler import CypherCompiler

__all__ = ["CypherParser", "CypherCompiler"]
