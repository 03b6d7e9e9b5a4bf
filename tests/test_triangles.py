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


# --- k-core decomposition --------------------------------------------------------


def test_kcore_peels_pendant_chain(spark):
    """A triangle with a dangling two-edge tail: the 2-core is exactly
    the triangle; the tail peels outside-in (node 5 only becomes
    peelable AFTER node 6 goes — peeling must cascade, not
    single-pass). A path anchored in cores at BOTH ends, by contrast,
    has min degree 2 throughout and survives."""
    from hash_db_spark.operators.graph import kcore

    tri1 = [(0, 1), (1, 2), (0, 2)]
    tail = [(2, 5), (5, 6)]
    got = {r.id: r.deg for r in kcore(_edges(spark, tri1 + tail), k=2, iterations=4).collect()}
    assert got == {0: 2, 1: 2, 2: 2}

    tri2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(2, 5), (5, 6), (6, 10)]
    got = {
        r.id: r.deg
        for r in kcore(
            _edges(spark, tri1 + tri2 + bridge), k=2, iterations=4
        ).collect()
    }
    assert got == {0: 2, 1: 2, 2: 3, 5: 2, 6: 2, 10: 3, 11: 2, 12: 2}


def test_kcore_k3_empties_triangles(spark):
    """k=3 on a graph whose densest piece is a triangle -> empty core;
    on K4 -> all four nodes with degree 3."""
    from hash_db_spark.operators.graph import kcore

    tri = [(0, 1), (1, 2), (0, 2)]
    assert kcore(_edges(spark, tri), k=3, iterations=3).count() == 0
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    got = {r.id: r.deg for r in kcore(_edges(spark, k4), k=3, iterations=3).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_dedups_and_ignores_direction_and_loops(spark):
    """Doubled/reversed edges and self-loops must not inflate degree:
    a single triangle listed both directions plus loops is still just
    a triangle."""
    from hash_db_spark.operators.graph import kcore

    messy = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0), (0, 0), (1, 1)]
    got = {r.id: r.deg for r in kcore(_edges(spark, messy), k=2, iterations=3).collect()}
    assert got == {0: 2, 1: 2, 2: 2}


def test_host_kcore_oracle_parity_and_fixpoint(spark, sf_dir):
    import duckdb

    from hash_db_spark.operators.graph import kcore
    from hash_db_spark.queries.web_queries import (
        _host_edges,
        _host_kcore_oracle,
        q_host_kcore,
    )

    got = sorted(tuple(r) for r in q_host_kcore(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(_host_kcore_oracle()).fetchall()
    )
    con.close()
    assert got == want
    # the registered iteration count has converged on the fixture:
    # one more round changes nothing
    more = sorted(
        tuple(r)
        for r in kcore(_host_edges(spark, sf_dir), k=2, iterations=5).collect()
    )
    assert more == got


# --- local clustering coefficient -------------------------------------------------


def test_clustering_coef_known_graphs(spark):
    """Triangle -> coef 1.0 everywhere; star -> 0.0 at the hub (leaves
    have degree 1 and are excluded); square + one diagonal -> the
    diagonal endpoints see 2 wedges 1 closed = 1/3... verified by hand:
    nodes 0-1-2-3 cycle, diagonal (0,2): deg(0)=3, T(0)=2? edges
    (0,1),(1,2),(2,3),(0,3),(0,2): triangles {0,1,2},{0,2,3} ->
    T(0)=2, coef(0)=2*2/(3*2)=0.666667; T(1)=1, coef(1)=1.0."""
    from hash_db_spark.operators.graph import clustering_coefficient

    tri = [(0, 1), (1, 2), (0, 2)]
    got = {r.id: r.coef for r in clustering_coefficient(_edges(spark, tri)).collect()}
    assert got == {0: 1.0, 1: 1.0, 2: 1.0}

    star = [(0, i) for i in range(1, 5)]
    got = {r.id: r.coef for r in clustering_coefficient(_edges(spark, star)).collect()}
    assert got == {0: 0.0}  # leaves (deg 1) excluded

    diam = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2)]
    got = {
        r.id: (r.deg, r.triangles, r.coef)
        for r in clustering_coefficient(_edges(spark, diam)).collect()
    }
    assert got[0] == (3, 2, 0.666667)
    assert got[2] == (3, 2, 0.666667)
    assert got[1] == (2, 1, 1.0)
    assert got[3] == (2, 1, 1.0)


def test_host_clustering_oracle_parity(spark, sf_dir):
    import duckdb

    from hash_db_spark.queries.web_queries import (
        _host_clustering_oracle,
        q_host_clustering_coef,
    )

    got = sorted(tuple(r) for r in q_host_clustering_coef(spark, sf_dir).collect())
    assert len(got) > 0
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(_host_clustering_oracle()).fetchall()
    )
    con.close()
    assert got == want


# --- Adamic-Adar link prediction ----------------------------------------------------


def test_adamic_adar_known_values(spark):
    """Square 0-1-2-3 (no diagonals): opposite corners share exactly
    two degree-2 neighbors -> aa = 2/ln(2); adjacent corners share
    none. Plus the hub cap: a 100-degree center contributes nothing."""
    import math

    from hash_db_spark.operators.graph import adamic_adar_pairs

    sq = [(0, 1), (1, 2), (2, 3), (3, 0)]
    got = {
        (r.id_a, r.id_b): (r.common, r.aa)
        for r in adamic_adar_pairs(_edges(spark, sq)).collect()
    }
    assert got == {
        (0, 2): (2, round(2 / math.log(2), 6)),
        (1, 3): (2, round(2 / math.log(2), 6)),
    }

    hub = [(100, i) for i in range(50)] + sq
    capped = {
        (r.id_a, r.id_b)
        for r in adamic_adar_pairs(_edges(spark, hub), max_deg=10).collect()
    }
    # pairs through the hub (e.g. (5, 6)) are absent; the square's
    # wedges survive (corner degrees grew to 3, still <= 10)
    assert (5, 6) not in capped
    assert (0, 2) in capped


def test_host_adamic_adar_oracle_parity(spark, sf_dir):
    import duckdb

    from hash_db_spark.queries.web_queries import (
        _host_adamic_adar_oracle,
        q_host_adamic_adar,
    )

    got = sorted(tuple(r) for r in q_host_adamic_adar(spark, sf_dir).collect())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(_host_adamic_adar_oracle()).fetchall()
    )
    con.close()
    assert got == want
    # Non-emptiness is data-dependent: the fixture's host universe is
    # FIXED (~92 hosts), so at sf0.1 every wedge center's distinct-edge
    # degree saturates past AA_MAX_DEG and BOTH engines agree on the
    # empty result (verified r11). Only the gate fixtures, whose host
    # graph is sparse, are required to produce pairs.
    if sf_dir.rstrip("/").endswith(("sf0.001", "sf0.01")):
        assert len(got) > 0
