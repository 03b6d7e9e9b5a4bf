"""Degree-oriented triangle counting: known graphs + orientation bound."""

from __future__ import annotations

from hash_db_spark.operators.graph import triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_k4_has_four_triangles(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    assert triangle_count(_edges(spark, k4)).collect()[0]["triangles"] == 4


def test_path_and_star_have_none(spark):
    path = [(0, 1), (1, 2), (2, 3)]
    star = [(0, i) for i in range(1, 6)]
    assert triangle_count(_edges(spark, path)).collect()[0]["triangles"] == 0
    assert triangle_count(_edges(spark, star)).collect()[0]["triangles"] == 0


def test_hub_plus_triangle(spark):
    """A high-degree hub with one attached triangle: the degree
    orientation enumerates wedges at the LOW-degree vertices, so the
    hub's degree never quadratically amplifies candidates."""
    hub = [(100, i) for i in range(50)]
    tri = [(0, 1), (1, 2), (0, 2)]
    got = triangle_count(_edges(spark, hub + tri)).collect()[0]["triangles"]
    # triangles: (0,1,2) plus (i,j,100) only where (i,j) is an edge:
    # (0,1,100),(1,2,100),(0,2,100)
    assert got == 4


# --- personalized PageRank ------------------------------------------------------


def test_ppr_locality_and_seed_dominance(spark):
    """Topic sensitivity: mass stays in the seed's component — a node
    disconnected from the seeds has rank EXACTLY 0 (uniform PageRank
    would give it (1-d)/N > 0), and the seed outranks its neighbors."""
    import pyspark.sql.functions as F

    from hash_db_spark.operators.graph import pagerank, personalized_pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
         ("x", "y"), ("y", "x")],
        ["src", "dst"],
    )
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("x",), ("y",)], ["id"]
    )
    seeds = spark.createDataFrame([("a",)], ["id"])
    ppr = {r.id: r.rank for r in
           personalized_pagerank(nodes, edges, seeds, iterations=4).collect()}
    assert ppr["x"] == 0.0 and ppr["y"] == 0.0
    # mass stays in the seed component and decays with distance from
    # the seed (b holds a's whole outflow, so b > a is correct)
    assert ppr["a"] > ppr["c"] > 0.0
    upr = {r.id: r.rank for r in pagerank(nodes, edges, iterations=4).collect()}
    assert upr["x"] > 0.0  # the contrast that makes PPR personalized


def test_ppr_hosts_oracle_parity(spark, sf_dir):
    import duckdb

    from hash_db_spark.queries.web_queries import (
        _ppr_hosts_oracle,
        q_ppr_hosts,
    )

    got = sorted(tuple(r) for r in q_ppr_hosts(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(_ppr_hosts_oracle()).fetchall()
    )
    con.close()
    assert got == want
    top = max(got, key=lambda r: r[1])
    assert top[0] in ("site0.com", "www.site5.org")  # a seed leads


def test_ppr_rejects_empty_seed_set(spark):
    import pytest

    from hash_db_spark.operators.graph import personalized_pagerank

    nodes = spark.createDataFrame([("a",)], ["id"])
    edges = spark.createDataFrame([("a", "a")], ["src", "dst"])
    seeds = nodes.filter("id = 'nope'")
    with pytest.raises(ValueError):
        personalized_pagerank(nodes, edges, seeds)
