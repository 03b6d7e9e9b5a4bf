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
