"""Driver-checkable queries: graph/Cypher operators (SURVEY §2.4) over the
fixture-derived property graph (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.cypher import CypherCompiler
from hash_db_spark.operators.graph import (
    GRAPH_ORACLE_CTES,
    graph_edges,
    graph_nodes,
)
from hash_db_spark.queries import Query


def _compiler(spark: SparkSession, sf_dir: str) -> CypherCompiler:
    return CypherCompiler(graph_nodes(spark, sf_dir), graph_edges(spark, sf_dir))


def q_graph_node_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G4: node scan by label + attribute."""
    return _compiler(spark, sf_dir).run(
        "match (n:Nation {name: 'NATION_7'}) return n"
    )


def q_cypher_1hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: 1-hop traversal — customers of one nation."""
    return _compiler(spark, sf_dir).run(
        "match (c:Customer)-[:FROM]->(n:Nation {name: 'NATION_7'}) return c, n"
    )


def q_cypher_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6: 2-hop chain with intermediate variable."""
    return _compiler(spark, sf_dir).run(
        "match (s:Supplier)-[:FROM]->(n:Nation)-[:IN]->(r:Region {name: 'ASIA'}) "
        "return s, n, r"
    )


def q_cypher_shared_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6: variable re-binding across comma patterns — supplier and
    customer from the *same* nation (example.py:273's 4-triple shape)."""
    return _compiler(spark, sf_dir).run(
        "match (s:Supplier)-[:FROM]->(n:Nation), "
        "(c:Customer {name: 'Customer#000000042'})-[:FROM]->(n) "
        "return s, c, n"
    )


def q_cypher_left_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 with reversed arrow: (n)<-[:FROM]-(s) ≡ (s)-[:FROM]->(n)."""
    return _compiler(spark, sf_dir).run(
        "match (n:Nation {name: 'NATION_3'})<-[:FROM]-(s:Supplier) return s, n"
    )


def q_cypher_merge_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2/G3: MERGE new nodes + edge, then MATCH them back (merge is an
    immutable upsert returning new node/edge frames)."""
    comp = _compiler(spark, sf_dir)
    nodes2, edges2 = comp.run(
        "merge (p:Person {name: 'Samuel'})-[:FRIEND]->(q:Person {name: 'Tasya'})"
    )
    comp2 = CypherCompiler(nodes2, edges2)
    return comp2.run("match (a:Person)-[:FRIEND]->(b:Person) return a, b")


def q_cypher_return_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G7 with node-object projection: returned vars carry their name
    attribute (the reference emits whole node dicts)."""
    from hash_db_spark.cypher import CypherParser

    comp = _compiler(spark, sf_dir)
    p = CypherParser().parse(
        "match (n:Nation)-[:IN]->(r:Region {name: 'EUROPE'}) return n, r"
    )
    return comp.match(p, with_names=True)


def _g(sql: str) -> str:
    return f"WITH {GRAPH_ORACLE_CTES} {sql}"


QUERIES = {
    "graph_node_scan": Query(
        q_graph_node_scan,
        _g("SELECT id AS n FROM gnodes WHERE label='Nation' AND name='NATION_7'"),
    ),
    "cypher_1hop": Query(
        q_cypher_1hop,
        _g(
            "SELECT DISTINCT e.src AS c, e.dst AS n FROM gedges e "
            "JOIN gnodes a ON a.id = e.src AND a.label = 'Customer' "
            "JOIN gnodes b ON b.id = e.dst AND b.label = 'Nation' AND b.name = 'NATION_7' "
            "WHERE e.rel = 'FROM'"
        ),
    ),
    "cypher_chain": Query(
        q_cypher_chain,
        _g(
            "SELECT DISTINCT e1.src AS s, e1.dst AS n, e2.dst AS r "
            "FROM gedges e1 "
            "JOIN gedges e2 ON e2.src = e1.dst AND e2.rel = 'IN' "
            "JOIN gnodes a ON a.id = e1.src AND a.label = 'Supplier' "
            "JOIN gnodes b ON b.id = e1.dst AND b.label = 'Nation' "
            "JOIN gnodes c ON c.id = e2.dst AND c.label = 'Region' AND c.name = 'ASIA' "
            "WHERE e1.rel = 'FROM'"
        ),
    ),
    "cypher_shared_var": Query(
        q_cypher_shared_var,
        _g(
            "SELECT DISTINCT e1.src AS s, e2.src AS c, e1.dst AS n "
            "FROM gedges e1 "
            "JOIN gedges e2 ON e2.dst = e1.dst AND e2.rel = 'FROM' "
            "JOIN gnodes a ON a.id = e1.src AND a.label = 'Supplier' "
            "JOIN gnodes b ON b.id = e2.src AND b.label = 'Customer' "
            "  AND b.name = 'Customer#000000042' "
            "JOIN gnodes nn ON nn.id = e1.dst AND nn.label = 'Nation' "
            "WHERE e1.rel = 'FROM'"
        ),
    ),
    "cypher_left_arrow": Query(
        q_cypher_left_arrow,
        _g(
            "SELECT DISTINCT e.src AS s, e.dst AS n FROM gedges e "
            "JOIN gnodes a ON a.id = e.src AND a.label = 'Supplier' "
            "JOIN gnodes b ON b.id = e.dst AND b.label = 'Nation' AND b.name = 'NATION_3' "
            "WHERE e.rel = 'FROM'"
        ),
    ),
    "cypher_merge_match": Query(
        q_cypher_merge_match,
        "SELECT 'person:Samuel' AS a, 'person:Tasya' AS b",
    ),
    "cypher_return_names": Query(
        q_cypher_return_names,
        _g(
            "SELECT DISTINCT e.src AS n, a.name AS n_name, "
            "e.dst AS r, b.name AS r_name "
            "FROM gedges e "
            "JOIN gnodes a ON a.id = e.src AND a.label = 'Nation' "
            "JOIN gnodes b ON b.id = e.dst AND b.label = 'Region' "
            "  AND b.name = 'EUROPE' "
            "WHERE e.rel = 'IN'"
        ),
    ),
}
