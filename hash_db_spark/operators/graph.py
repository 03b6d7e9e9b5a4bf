"""Property-graph facade over the fixture tables (SURVEY §1.5, §2.4).

The reference stores a whole graph on one node as dense numpy adjacency
matrices (/root/reference/client.py:757-819) — O(n²) memory, resized per
node add. Here the property graph is two plain DataFrames:

    nodes(id, label, name)   edges(src, dst, rel)

derived deterministically from the TPC-H-ish fixtures so Cypher queries
are oracle-checkable:

    Region   region:<r_name>        Nation -[:IN]->   Region
    Nation   nation:<n_name>        Customer -[:FROM]-> Nation
    Customer customer:<c_custkey>   Supplier -[:FROM]-> Nation
    Supplier supplier:<s_suppkey>

Nodes carry a free-form ``attrs map<string,string>`` mirroring the
reference's per-node attribute dict + inverted attribute index
(client.py:772-778, find_nodes_from_attributes client.py:876-891):

    Nation    {region: <r_name>}
    Customer  {nation: <n_name>, segment: <c_mktsegment>}
    Supplier  {nation: <n_name>}
    Region    {}  (empty map)

At scale the map column filters with ``element_at`` — a per-row map probe,
no join — and a dedicated attribute index is just a bucketed projection of
``explode(attrs)`` if ever needed.

Both tables partition/broadcast like any DataFrame — no single-node
placement (reference routes each graph to one node by key,
server.py:1146-1156).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.functions.rounding import round_half_away_col

from hash_db_spark.localframe import local_frame


def graph_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation_region = load_table(spark, sf_dir, "nation").join(
        F.broadcast(load_table(spark, sf_dir, "region")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    region = load_table(spark, sf_dir, "region").select(
        F.concat(F.lit("region:"), F.col("r_name")).alias("id"),
        F.lit("Region").alias("label"),
        F.col("r_name").alias("name"),
        F.create_map().cast("map<string,string>").alias("attrs"),
    )
    nation = nation_region.select(
        F.concat(F.lit("nation:"), F.col("n_name")).alias("id"),
        F.lit("Nation").alias("label"),
        F.col("n_name").alias("name"),
        F.create_map(F.lit("region"), F.col("r_name")).alias("attrs"),
    )
    customer = load_table(spark, sf_dir, "customer").join(
        F.broadcast(load_table(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select(
        F.concat(F.lit("customer:"), F.col("c_custkey").cast("string")).alias("id"),
        F.lit("Customer").alias("label"),
        F.col("c_name").alias("name"),
        F.create_map(
            F.lit("nation"), F.col("n_name"),
            F.lit("segment"), F.col("c_mktsegment"),
        ).alias("attrs"),
    )
    supplier = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(load_table(spark, sf_dir, "nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select(
        F.concat(F.lit("supplier:"), F.col("s_suppkey").cast("string")).alias("id"),
        F.lit("Supplier").alias("label"),
        F.col("s_name").alias("name"),
        F.create_map(F.lit("nation"), F.col("n_name")).alias("attrs"),
    )
    return region.unionByName(nation).unionByName(customer).unionByName(supplier)


def graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    n_in_r = nation.join(
        region, nation.n_regionkey == region.r_regionkey
    ).select(
        F.concat(F.lit("nation:"), F.col("n_name")).alias("src"),
        F.concat(F.lit("region:"), F.col("r_name")).alias("dst"),
        F.lit("IN").alias("rel"),
    )
    cust = load_table(spark, sf_dir, "customer").join(
        F.broadcast(nation),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select(
        F.concat(F.lit("customer:"), F.col("c_custkey").cast("string")).alias("src"),
        F.concat(F.lit("nation:"), F.col("n_name")).alias("dst"),
        F.lit("FROM").alias("rel"),
    )
    sup = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nation),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select(
        F.concat(F.lit("supplier:"), F.col("s_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("nation:"), F.col("n_name")).alias("dst"),
        F.lit("FROM").alias("rel"),
    )
    return n_in_r.unionByName(cust).unionByName(sup)


# DuckDB CTEs mirroring the two views, prefixed into graph oracle SQL.
# Attribute parity: per-label attr columns for filtering, plus attrs_str —
# the canonical 'k=v;k=v' (keys sorted) rendering the compiler projects
# for whole-node RETURN (compiler.match with_attrs).
GRAPH_ORACLE_CTES = """
gnodes AS (
  SELECT 'region:' || r_name AS id, 'Region' AS label, r_name AS name,
         CAST(NULL AS VARCHAR) AS a_nation, CAST(NULL AS VARCHAR) AS a_segment,
         CAST(NULL AS VARCHAR) AS a_region, '' AS attrs_str
  FROM region
  UNION ALL
  SELECT 'nation:' || n_name, 'Nation', n_name,
         NULL, NULL, r_name, 'region=' || r_name
  FROM nation JOIN region ON n_regionkey = r_regionkey
  UNION ALL
  SELECT 'customer:' || CAST(c_custkey AS VARCHAR), 'Customer', c_name,
         n_name, c_mktsegment, NULL,
         'nation=' || n_name || ';segment=' || c_mktsegment
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  UNION ALL
  SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR), 'Supplier', s_name,
         n_name, NULL, NULL, 'nation=' || n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
),
gedges AS (
  SELECT 'nation:' || n_name AS src, 'region:' || r_name AS dst, 'IN' AS rel
  FROM nation JOIN region ON n_regionkey = r_regionkey
  UNION ALL
  SELECT 'customer:' || CAST(c_custkey AS VARCHAR), 'nation:' || n_name, 'FROM'
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  UNION ALL
  SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR), 'nation:' || n_name, 'FROM'
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
)
""".strip()


def n_hop_reach(
    edges: DataFrame,
    start_id: str,
    max_hops: int = 3,
    reverse: bool = False,
    rels: list[str] | None = None,
) -> DataFrame:
    """BFS shortest-hop distance from one node: (id, hops) for every node
    reachable in 1..max_hops edge steps (``reverse`` follows edges
    dst→src). A capability the reference's Cypher lacks (its `*` token is
    the SQL wildcard, /root/reference/cypher.py:41-43 vs server.py:435-438
    — no variable-length paths).

    Frontier BFS: each hop is ONE equijoin of the current frontier
    against the edge list plus an anti-join against the visited set, so
    a hop's cost is proportional to the frontier's out-degree sum, never
    the graph size. Early-exits when the frontier empties. Each round is
    localCheckpoint()ed — the loop would otherwise double the lineage per
    hop. At cluster scale, bucket the edge frame by the join side
    (sources.writers.write_bucketed) and every hop joins shuffle-free.
    """
    spark = edges.sparkSession
    a, b = ("dst", "src") if reverse else ("src", "dst")
    e = edges.select(F.col(a).alias("a"), F.col(b).alias("b"), "rel")
    if rels is not None:
        e = e.filter(F.col("rel").isin(rels))
    e = e.select("a", "b").distinct().localCheckpoint(eager=True)

    frontier = local_frame(spark, [(start_id, 0)], "id string, hops int")
    visited = frontier.localCheckpoint(eager=True)
    for h in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier.id == e.a)
            .select(F.col("b").alias("id"), F.lit(h).alias("hops"))
            .distinct()
            .join(visited, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited.filter(F.col("hops") > 0)


def sql_n_hop_reach(
    start_id: str, max_hops: int = 3, reverse: bool = False
) -> str:
    """Recursive-CTE oracle over gedges (min path length = BFS depth).
    Append after GRAPH_ORACLE_CTES under WITH RECURSIVE.

    min(hops) equals the BFS first-reach distance for every node EXCEPT
    the start itself: on a cyclic graph the CTE re-derives the start at
    hops = cycle length, while the visited-set BFS never re-emits it —
    the start is excluded explicitly so the pair agrees on cycles too
    (test_pipeline_ops codifies the never-revisit BFS contract)."""
    frm, to = ("dst", "src") if reverse else ("src", "dst")
    return f"""
reach AS (
  SELECT '{start_id}' AS id, 0 AS hops
  UNION ALL
  SELECT e.{to} AS id, reach.hops + 1
  FROM reach JOIN gedges e ON e.{frm} = reach.id
  WHERE reach.hops < {max_hops}
)
SELECT id, CAST(min(hops) AS INT) AS hops
FROM reach WHERE hops > 0 AND id != '{start_id}' GROUP BY id
"""


# Driver fast-path bound for the fixed-iteration graph loops (pagerank,
# personalized_pagerank, hits, lpa_communities): below this many nodes
# AND edges the graph is collected and iterated in plain Python — the
# connected_components driver_threshold precedent. Each distributed
# round costs 1-3 whole jobs of scheduler/codegen overhead, which
# dominates end-to-end latency for host graphs (hundreds to thousands
# of nodes) while the Python loop runs in microseconds. 100k rows of
# (string, string) is a few MB on the driver — far under any collect
# budget; bigger graphs take the distributed loop unchanged.
GRAPH_DRIVER_MAX_ROWS = 100_000


def _small_graph(
    nodes: DataFrame | None, edges_df: DataFrame, cap: int
) -> tuple[list, list] | None:
    """(ids, edge_pairs) collected when the relations fit under ``cap``
    rows, else None (limit(cap+1) guard — the house bounded-collect
    discipline; never an unbounded collect). ``nodes=None`` means the
    node set IS the union of edge endpoints (the host-graph consumers'
    shape): ids derive from the one collected edge list, so the
    corpus-side link extraction runs exactly once."""
    if cap <= 0:
        return None
    e_rows = edges_df.limit(cap + 1).collect()
    if len(e_rows) > cap:
        return None
    epairs = [(r[0], r[1]) for r in e_rows]
    if nodes is None:
        ids = list(
            dict.fromkeys(
                [s for s, _ in epairs] + [d for _, d in epairs]
            )
        )
        return ids, epairs
    id_rows = nodes.select("id").limit(cap + 1).collect()
    if len(id_rows) > cap:
        return None
    return [r[0] for r in id_rows], epairs


def _derived_nodes(edges_ck: DataFrame) -> DataFrame:
    """nodes = distinct union of edge endpoints, from an already-
    materialized edge relation (the distributed twin of nodes=None)."""
    return (
        edges_ck.select(F.col("src").alias("id"))
        .union(edges_ck.select(F.col("dst").alias("id")))
        .distinct()
    )


def pagerank(
    nodes: DataFrame | None,
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    driver_cap: int = GRAPH_DRIVER_MAX_ROWS,
) -> DataFrame:
    """PageRank (simplified power iteration, no dangling redistribution —
    the form both engines can replay exactly): pr_{t+1}(v) = (1-d)/N +
    d * Σ_{u→v} pr_t(u)/outdeg(u). Pattern follows the dataflow
    formulation popularized by GraphX (OSDI 2014): ranks live in a
    DataFrame, one equijoin + one aggregation per iteration,
    localCheckpoint per round to keep lineage flat.

    Returns (id, rank) rounded to 6dp — rank is rounded ONCE at the end,
    so cross-engine float noise (~1e-14 after a few iterations) stays far
    under the rounding grid. Fixed iteration count (not convergence
    detection) keeps the oracle an unrolled CTE chain.

    Hybrid execution (optimization r12, connected_components
    precedent): under ``driver_cap`` nodes+edges the graph collects and
    the power iteration runs in Python — identical arithmetic per term
    (same double divisions/multiplications; only the summation order of
    inflow differs, which is nondeterministic in the distributed
    aggregation too and sits ~1e-14 under the 6dp grid) — and the
    result re-enters Spark UNROUNDED so the final F.round is the same
    engine rounding as the distributed path. Set driver_cap=0 to force
    the distributed loop (tests pin both paths).
    """
    small = _small_graph(nodes, edges.select("src", "dst"), driver_cap)
    if small is not None:
        ids, e = small
        n = len(ids)
        rank = {i: 1.0 / n for i in ids}
        outdeg: dict = {}
        for s, _d in e:
            outdeg[s] = outdeg.get(s, 0) + 1
        base = (1.0 - damping) / n
        for _ in range(iterations):
            inflow: dict = {}
            for s, d in e:
                r = rank.get(s)
                if r is not None:
                    inflow[d] = inflow.get(d, 0.0) + r / outdeg[s]
            rank = {
                i: base + damping * inflow.get(i, 0.0) for i in ids
            }
        id_type = dict(edges.dtypes)["src"]
        out = local_frame(
            edges.sparkSession,
            [(i, rank[i]) for i in ids],
            f"id {id_type}, rank double",
        )
        return out.select("id", F.round("rank", 6).alias("rank"))
    if nodes is None:
        edges = edges.select("src", "dst").localCheckpoint(eager=True)
        nodes = _derived_nodes(edges)
    n = nodes.count()
    outdeg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # Degree-annotated edge list, materialized ONCE outside the loop —
    # each iteration then costs one equijoin + one aggregation.
    edeg = (
        edges.select(F.col("src").alias("id"), "dst")
        .join(outdeg, "id")
        .localCheckpoint(eager=True)
    )
    base = F.lit((1.0 - damping) / n)
    # The node-id frame is referenced every iteration (left join for
    # no-inflow nodes) — materialize it once, not per round.
    ids = nodes.select("id").localCheckpoint(eager=True)
    ranks = ids.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint(
        eager=True
    )
    for _ in range(iterations):
        contrib = (
            ranks.join(edeg, "id")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            ids
            .join(contrib, "id", "left")
            .select(
                "id",
                (
                    base
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("id", F.round("rank", 6).alias("rank"))


def sql_pagerank(iterations: int = 5, damping: float = 0.85) -> str:
    """Unrolled iteration chain over gnodes/gedges (append after
    GRAPH_ORACLE_CTES): recursive CTEs cannot aggregate per step, so each
    power iteration is its own CTE — exact same arithmetic as the Spark
    loop."""
    d = damping
    parts = [
        "outdeg AS (SELECT src AS id, count(*) AS deg FROM gedges GROUP BY src)",
        "n_cte AS (SELECT count(*) AS n FROM gnodes)",
        "r0 AS (SELECT id, 1.0 / (SELECT n FROM n_cte) AS rank FROM gnodes)",
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""r{i} AS (
  SELECT g.id,
         (1.0 - {d}) / (SELECT n FROM n_cte)
         + {d} * COALESCE(s.inflow, 0.0) AS rank
  FROM gnodes g LEFT JOIN (
    SELECT e.dst AS id, sum(r.rank / o.deg) AS inflow
    FROM {prev} r
    JOIN outdeg o ON o.id = r.id
    JOIN gedges e ON e.src = r.id
    GROUP BY e.dst
  ) s ON s.id = g.id
)"""
        )
        prev = f"r{i}"
    ctes = ",\n".join(parts)
    return f"{ctes}\nSELECT id, round(rank, 6) AS rank FROM {prev}"


# --- triangle counting (degree-oriented compact-forward) --------------------


def triangle_count(edges: DataFrame) -> DataFrame:
    """(triangles): exact global triangle count.

    Degree-oriented compact-forward: each undirected edge is oriented
    from its lower-(degree, id) endpoint to the higher one, so every
    wedge is enumerated at its LOWEST-degree vertex — candidate wedges
    are bounded by sum(min_deg^2) = O(m^1.5) instead of sum(deg^2),
    which is the difference between a hub node exploding the join and
    not, at 100 TB (the classic MapReduce triangle-counting fix).
    Counts are integers, so any enumeration order gives the oracle's
    exact answer (the oracle counts src<dst<z directly).

    The edge list feeds the degree census plus three join branches, and
    Spark re-executes an un-materialized subplan per consumer — fatal
    when edges are an expensive derivation (the embedding near-dup
    pairs ran 4x before this). One eager localCheckpoint pins the edge
    list on the executors; every branch reads the materialized copy.
    Edge lists are small next to the corpora they derive from, so the
    executor storage cost is the right trade at any scale.
    """
    edges = edges.localCheckpoint(eager=True)
    deg = (
        edges.select(F.explode(F.array("src", "dst")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        edges.join(deg.withColumnRenamed("n", "src"), "src")
        .withColumnRenamed("deg", "sdeg")
        .join(deg.withColumnRenamed("n", "dst"), "dst")
        .withColumnRenamed("deg", "ddeg")
        .select(
            F.when(
                F.struct(F.col("sdeg"), F.col("src"))
                < F.struct(F.col("ddeg"), F.col("dst")),
                F.struct(
                    F.col("src").alias("u"),
                    F.col("dst").alias("v"),
                    F.struct(
                        F.col("ddeg").alias("d"), F.col("dst").alias("n")
                    ).alias("vkey"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("dst").alias("u"),
                    F.col("src").alias("v"),
                    F.struct(
                        F.col("sdeg").alias("d"), F.col("src").alias("n")
                    ).alias("vkey"),
                )
            )
            .alias("o")
        )
        .select("o.u", "o.v", "o.vkey")
    )
    wa, wb = e.alias("wa"), e.alias("wb")
    wedges = wa.join(
        wb,
        (F.col("wa.u") == F.col("wb.u"))
        & (F.col("wa.vkey") < F.col("wb.vkey")),
    ).select(F.col("wa.v").alias("x"), F.col("wb.v").alias("y"))
    # the closing edge is always oriented x -> y: both wedge endpoints
    # follow u in the total order and vkey_x < vkey_y by construction
    closing = e.select(F.col("u").alias("cx"), F.col("v").alias("cy"))
    return (
        wedges.join(
            closing,
            (F.col("x") == F.col("cx")) & (F.col("y") == F.col("cy")),
        )
        .agg(F.count(F.lit(1)).alias("triangles"))
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """(deg, n_nodes): undirected degree distribution — the first chart
    of any graph report (and the skew census that decides whether the
    triangle/wedge joins above need hub mitigation). Two map-side-
    combined shuffles on integer keys; no row ever carries more than
    (node, count). Isolated nodes (degree 0) are not represented in an
    edge list and so don't appear — matching the oracle.

    Endpoints come from ONE explode pass, not a self-unionAll: union's
    two branches are separate subplans with no exchange between them,
    so Spark executes the upstream edge plan TWICE — ruinous when edges
    are an expensive derivation (the embedding near-dup pairs), and a
    doubled scan even when they're a raw table."""
    return (
        edges.select(F.explode(F.array("src", "dst")).alias("n"))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
        .groupBy("deg")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


SQL_TRIANGLE_COUNT = """
WITH e AS (
  SELECT a.vec_id AS x, b.vec_id AS y
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(
          a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.4
)
SELECT count(*) AS triangles
FROM e e1
JOIN e e2 ON e2.x = e1.y
JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
"""


# --- HITS hubs & authorities -------------------------------------------------


def hits(
    nodes: DataFrame | None,
    edges: DataFrame,
    iterations: int = 2,
    driver_cap: int = GRAPH_DRIVER_MAX_ROWS,
) -> DataFrame:
    """HITS (Kleinberg, "Authoritative Sources in a Hyperlinked
    Environment", JACM 1999) in its UNNORMALIZED integer form:

        auth_{t+1}(v) = sum_{u->v} hub_t(u)
        hub_{t+1}(u)  = sum_{u->v} auth_{t+1}(v)        with hub_0 = 1.

    Per-iteration normalization only rescales each vector by a scalar,
    so the RANKING is identical to classic HITS — and dropping it keeps
    every value an exact int64 (sums of directed-path counts), which
    both engines replay bit-for-bit; no float noise, no rounding grid.
    Overflow bound: values grow like E * maxdeg^(2t); at the default
    t=2 that stays far inside int64 for any host graph with maxdeg up
    to ~10^4 even at 10^9 edges. For extreme graphs raise to floats
    with per-round L1 normalization and a tolerance compare instead.

    Scale shape mirrors ``pagerank``: the edge list is materialized
    once, each half-iteration is one equijoin + one map-side-combined
    aggregation on the edge key, lineage localCheckpointed per round so
    the plan never deepens. Nodes with no in-links (out-links) carry
    auth (hub) = 0 via the left join, matching the oracle's COALESCE.

    Reference parity: the reference's graph module stops at traversal
    (/root/reference/cypher.py); link-analysis scoring is an extension
    the crawl-curation pipeline needs (authority-weighted caps already
    consume pagerank; HITS adds the hub side, which pagerank conflates).

    Hybrid execution (optimization r12): under ``driver_cap`` the loop
    runs in Python over the collected graph — EXACT, order-free int64
    sums, so the driver path is bit-identical to the distributed one by
    construction. driver_cap=0 forces the distributed loop.
    """
    small = _small_graph(nodes, edges.select("src", "dst"), driver_cap)
    if small is not None:
        ids_l, epairs = small
        hub = {i: 1 for i in ids_l}
        auth = {i: 0 for i in ids_l}
        for _ in range(iterations):
            a: dict = {}
            for s, d in epairs:
                h = hub.get(s)
                if h is not None:
                    a[d] = a.get(d, 0) + h
            auth = {i: a.get(i, 0) for i in ids_l}
            hh: dict = {}
            for s, d in epairs:
                av = auth.get(d)
                if av is not None:
                    hh[s] = hh.get(s, 0) + av
            hub = {i: hh.get(i, 0) for i in ids_l}
        id_type = dict(edges.dtypes)["src"]
        return local_frame(
            edges.sparkSession,
            [(i, hub[i], auth[i]) for i in ids_l],
            f"id {id_type}, hub long, auth long",
        )
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    if nodes is None:
        nodes = _derived_nodes(e)
    ids = nodes.select("id").localCheckpoint(eager=True)
    hubs = ids.select("id", F.lit(1).cast("long").alias("hub"))
    auths = ids.select("id", F.lit(0).cast("long").alias("auth"))
    for _ in range(iterations):
        inflow = (
            e.join(hubs.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("hub").alias("a"))
        )
        auths = (
            ids.join(inflow, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("a"), F.lit(0)).cast("long").alias("auth"),
            )
            .localCheckpoint(eager=True)
        )
        outflow = (
            e.join(auths.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("auth").alias("h"))
        )
        hubs = (
            ids.join(outflow, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hub"),
            )
            .localCheckpoint(eager=True)
        )
    return hubs.join(auths, "id").select("id", "hub", "auth")


def sql_hits(iterations: int = 2) -> str:
    """Unrolled CTE chain over gnodes/gedges (append after the caller's
    gnodes/gedges CTEs) — the exact integer arithmetic of ``hits``."""
    parts = ["h0 AS (SELECT id, 1::BIGINT AS hub FROM gnodes)"]
    prev_h = "h0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""a{i} AS (
  SELECT g.id, COALESCE(s.a, 0)::BIGINT AS auth
  FROM gnodes g LEFT JOIN (
    SELECT e.dst AS id, sum(h.hub) AS a
    FROM {prev_h} h JOIN gedges e ON e.src = h.id
    GROUP BY e.dst
  ) s ON s.id = g.id
)"""
        )
        parts.append(
            f"""h{i} AS (
  SELECT g.id, COALESCE(s.h, 0)::BIGINT AS hub
  FROM gnodes g LEFT JOIN (
    SELECT e.src AS id, sum(a.auth) AS h
    FROM a{i} a JOIN gedges e ON e.dst = a.id
    GROUP BY e.src
  ) s ON s.id = g.id
)"""
        )
        prev_h = f"h{i}"
    ctes = ",\n".join(parts)
    return (
        f"{ctes}\n"
        f"SELECT h.id, h.hub, a.auth FROM {prev_h} h "
        f"JOIN a{iterations} a ON a.id = h.id"
    )


# --- label-propagation communities -------------------------------------------


def lpa_communities(
    nodes: DataFrame | None,
    edges: DataFrame,
    iterations: int = 3,
    driver_cap: int = GRAPH_DRIVER_MAX_ROWS,
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al., Phys. Rev. E
    2007 — public) in a fully deterministic form: every node
    simultaneously adopts the most frequent label among its neighbors
    (ties -> smallest label; isolated nodes keep their own). Unlike
    ``connected_components`` (reachability), LPA finds DENSE regions —
    two cliques joined by one bridge edge stay two communities.

    Classic LPA breaks ties randomly and updates asynchronously; this
    variant is synchronous with min-label ties, so both engines replay
    it exactly (integer labels, integer counts — no floats at all).
    Fixed iteration count keeps the oracle an unrolled CTE chain.

    Scale shape mirrors pagerank/hits: the doubled edge list is
    materialized once; each iteration is one equijoin + one
    map-side-combined (node, label) count + one per-node window whose
    partitions are bounded by degree, localCheckpointed so the plan
    never deepens.

    Hybrid execution (optimization r12): under ``driver_cap`` the loop
    runs in Python — integer labels, integer counts, min-label ties:
    fully deterministic, so the driver path is exact by construction.
    driver_cap=0 forces the distributed loop."""
    from pyspark.sql import Window

    small = _small_graph(nodes, edges.select("src", "dst"), driver_cap)
    if small is not None:
        ids_l, epairs = small
        # the distributed form doubles the edge list (union ALL — edge
        # multiplicity counts) before joining neighbor labels
        e2 = epairs + [(d, s) for s, d in epairs]
        labels = {i: i for i in ids_l}
        for _ in range(iterations):
            cnt: dict = {}
            for s, d in e2:
                lbl = labels.get(d)
                if lbl is not None:
                    c = cnt.setdefault(s, {})
                    c[lbl] = c.get(lbl, 0) + 1
            labels = {
                i: (
                    min(
                        cnt[i].items(), key=lambda kv: (-kv[1], kv[0])
                    )[0]
                    if i in cnt
                    else labels[i]
                )
                for i in ids_l
            }
        id_type = dict(edges.dtypes)["src"]
        return local_frame(
            edges.sparkSession,
            [(i, labels[i]) for i in ids_l],
            f"id {id_type}, community {id_type}",
        )

    if nodes is None:
        edges = edges.select("src", "dst").localCheckpoint(eager=True)
        nodes = _derived_nodes(edges)
    e2 = (
        edges.select("src", "dst")
        .union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )
    ids = nodes.select("id").localCheckpoint(eager=True)
    labels = ids.select("id", F.col("id").alias("label"))
    w = Window.partitionBy("id").orderBy(
        F.col("c").desc(), F.col("label").asc()
    )
    for _ in range(iterations):
        nb = (
            e2.join(
                labels.select(
                    F.col("id").alias("dst"), F.col("label").alias("nlabel")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), F.col("nlabel").alias("label"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        pick = (
            nb.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", F.col("label").alias("nlabel"))
        )
        labels = (
            labels.join(pick, "id", "left")
            .select(
                "id",
                F.coalesce(F.col("nlabel"), F.col("label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
    return labels.select("id", F.col("label").alias("community"))


def sql_lpa_communities(iterations: int = 3) -> str:
    """Unrolled CTE chain over gnodes/gedges — identical synchronous
    min-label-tie propagation."""
    parts = [
        "e2 AS (SELECT src, dst FROM gedges"
        " UNION ALL SELECT dst, src FROM gedges)",
        "l0 AS (SELECT id, id AS label FROM gnodes)",
    ]
    prev = "l0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""n{i} AS (
  SELECT e.src AS id, l.label, count(*) AS c
  FROM e2 e JOIN {prev} l ON l.id = e.dst
  GROUP BY e.src, l.label
)"""
        )
        parts.append(
            f"""p{i} AS (
  SELECT id, label FROM (
    SELECT *, row_number() OVER (
      PARTITION BY id ORDER BY c DESC, label ASC
    ) AS rn FROM n{i}
  ) WHERE rn = 1
)"""
        )
        parts.append(
            f"""l{i} AS (
  SELECT l.id, COALESCE(p.label, l.label) AS label
  FROM {prev} l LEFT JOIN p{i} p ON p.id = l.id
)"""
        )
        prev = f"l{i}"
    ctes = ",\n".join(parts)
    return f"{ctes}\nSELECT id, label AS community FROM {prev}"


def personalized_pagerank(
    nodes: DataFrame | None,
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    driver_cap: int = GRAPH_DRIVER_MAX_ROWS,
) -> DataFrame:
    """Topic-sensitive / personalized PageRank (Haveliwala, WWW 2002):
    the uniform teleport of ``pagerank`` is replaced by the seed
    distribution e(v) = 1/|S| on the seed nodes, 0 elsewhere —
    pr_{t+1}(v) = (1-d)·e(v) + d·Σ_{u→v} pr_t(u)/outdeg(u), started
    from e. Ranks concentrate in the seeds' neighborhoods, which is
    the crawl/curation question PageRank can't answer: authority
    RELATIVE TO a trusted set (seed-biased sampling, TrustRank-style
    spam damping). Same per-iteration shape as ``pagerank`` (one
    equijoin + one aggregation, localCheckpoint per round); the seed
    set is a documented-tiny collect (it IS the personalization
    vector, driver-held by definition). Rounded once at the end."""
    seed_ids = [
        r.id for r in seeds.select("id").distinct().collect()
    ]  # tiny: the personalization support
    if not seed_ids:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    # Hybrid execution (optimization r12): same driver fast-path and
    # float-noise argument as pagerank; the personalization vector is
    # already driver-held. driver_cap=0 forces the distributed loop.
    small = _small_graph(nodes, edges.select("src", "dst"), driver_cap)
    if small is not None:
        ids_l, epairs = small
        sset = set(seed_ids)
        ev = {i: (1.0 / len(seed_ids) if i in sset else 0.0) for i in ids_l}
        rank = dict(ev)
        outdeg: dict = {}
        for s, _d in epairs:
            outdeg[s] = outdeg.get(s, 0) + 1
        for _ in range(iterations):
            inflow: dict = {}
            for s, d in epairs:
                r = rank.get(s)
                if r is not None:
                    inflow[d] = inflow.get(d, 0.0) + r / outdeg[s]
            rank = {
                i: (1.0 - damping) * ev[i]
                + damping * inflow.get(i, 0.0)
                for i in ids_l
            }
        id_type = dict(edges.dtypes)["src"]
        out = local_frame(
            edges.sparkSession,
            [(i, rank[i]) for i in ids_l],
            f"id {id_type}, rank double",
        )
        return out.select("id", F.round("rank", 6).alias("rank"))
    if nodes is None:
        edges = edges.select("src", "dst").localCheckpoint(eager=True)
        nodes = _derived_nodes(edges)
    e = F.when(
        F.col("id").isin(seed_ids), F.lit(1.0 / len(seed_ids))
    ).otherwise(F.lit(0.0))
    outdeg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    edeg = (
        edges.select(F.col("src").alias("id"), "dst")
        .join(outdeg, "id")
        .localCheckpoint(eager=True)
    )
    ids = nodes.select("id").localCheckpoint(eager=True)
    ranks = ids.select("id", e.alias("rank")).localCheckpoint(eager=True)
    for _ in range(iterations):
        contrib = (
            ranks.join(edeg, "id")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            ids.join(contrib, "id", "left")
            .select(
                "id",
                (
                    F.lit(1.0 - damping) * e
                    + F.lit(damping)
                    * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("id", F.round("rank", 6).alias("rank"))


def sql_personalized_pagerank(
    iterations: int = 5, damping: float = 0.85
) -> str:
    """Unrolled chain over gnodes/gedges/gseeds CTEs — the personalized
    twin of sql_pagerank, identical arithmetic to the Spark loop."""
    d = damping
    parts = [
        "outdeg AS (SELECT src AS id, count(*) AS deg FROM gedges GROUP BY src)",
        "sdist AS (SELECT DISTINCT id FROM gseeds)",
        "ns_cte AS (SELECT count(*) AS ns FROM sdist)",
        """pers AS (
  SELECT g.id,
         CASE WHEN s.id IS NOT NULL
              THEN 1.0 / (SELECT ns FROM ns_cte) ELSE 0.0 END AS e
  FROM gnodes g LEFT JOIN sdist s ON s.id = g.id
)""",
        "r0 AS (SELECT id, e AS rank FROM pers)",
    ]
    prev = "r0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""r{i} AS (
  SELECT p.id,
         (1.0 - {d}) * p.e + {d} * COALESCE(s.inflow, 0.0) AS rank
  FROM pers p LEFT JOIN (
    SELECT e.dst AS id, sum(r.rank / o.deg) AS inflow
    FROM {prev} r
    JOIN outdeg o ON o.id = r.id
    JOIN gedges e ON e.src = r.id
    GROUP BY e.dst
  ) s ON s.id = p.id
)"""
        )
        prev = f"r{i}"
    ctes = ",\n".join(parts)
    return f"{ctes}\nSELECT id, round(rank, 6) AS rank FROM {prev}"


# --- k-core decomposition ------------------------------------------------------


def kcore(edges: DataFrame, k: int = 2, iterations: int = 6) -> DataFrame:
    """(id, deg): nodes of the k-core — the maximal subgraph where every
    node keeps degree >= k after iteratively peeling weaker nodes
    (Seidman, Social Networks 1983 — public). On a host link graph the
    2-/3-core separates densely interlinked site clusters (link farms,
    mirror rings, genuine hub communities) from the long tail of
    pendant hosts that PageRank alone ranks noisily; it's the classic
    crawl-frontier prefilter.

    Peeling runs a FIXED iteration count so the DuckDB oracle is an
    unrolled CTE chain replaying the exact same rounds — both engines
    agree even on a graph that hasn't converged yet (integer degrees,
    no floats). Callers pick ``iterations`` >= the peel depth of their
    graph; tests assert the fixpoint is reached on the fixture.

    Scale shape: state is one canonical (a < b) edge list, halved vs a
    doubled list; each round is one explode-degree census (map-side
    combined) + two semi-joins, and the surviving edges are eagerly
    localCheckpointed so the plan never deepens with rounds. Per-row
    state never exceeds (edge) or (node, degree) — no neighbor lists
    are ever materialized, so hub nodes cost nothing extra."""
    e = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        deg = (
            e.select(F.explode(F.array("a", "b")).alias("id"))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        keep = deg.filter(F.col("deg") >= k).select("id")
        e = (
            e.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.explode(F.array("a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= k)
    )


def sql_kcore(k: int = 2, iterations: int = 6) -> str:
    """Unrolled peel over a ``gedges(src, dst)`` CTE — identical rounds."""
    # MATERIALIZED throughout: e_{i-1} is referenced twice per round
    # (degree census + survivor filter); inlined CTEs would re-expand
    # the whole upstream chain 2^iterations times (measured: 89s -> <1s
    # on the sf0.01 host graph).
    parts = [
        """e0 AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM gedges WHERE src <> dst
)"""
    ]
    prev = "e0"
    for i in range(1, iterations + 1):
        parts.append(
            f"""k{i} AS MATERIALIZED (
  SELECT id FROM (
    SELECT id, count(*) AS deg FROM (
      SELECT a AS id FROM {prev} UNION ALL SELECT b FROM {prev}
    ) GROUP BY id
  ) WHERE deg >= {k}
)"""
        )
        parts.append(
            f"""e{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM {prev} e
  WHERE e.a IN (SELECT id FROM k{i}) AND e.b IN (SELECT id FROM k{i})
)"""
        )
        prev = f"e{i}"
    ctes = ",\n".join(parts)
    return f"""{ctes}
SELECT id, deg FROM (
  SELECT id, count(*) AS deg FROM (
    SELECT a AS id FROM {prev} UNION ALL SELECT b FROM {prev}
  ) GROUP BY id
) WHERE deg >= {k}"""


# --- local clustering coefficient ----------------------------------------------


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, deg, triangles, coef): per-node local clustering coefficient
    c(v) = 2*T(v) / (deg(v) * (deg(v)-1)) over nodes with degree >= 2
    (Watts & Strogatz, Nature 1998 — public). On a host graph, high-
    degree low-coefficient hosts are navigational hubs; high-coefficient
    clusters are tightly interlinked site families — a density signal
    LPA/k-core complement rather than replace.

    Triangles are enumerated once with the same degree-oriented
    compact-forward trick as ``triangle_count`` (wedges materialize at
    their lowest-degree vertex, O(m^1.5) candidate wedges), then each
    closed triangle credits its three vertices via one explode —
    integer counts, so the oracle's naive a<b<c enumeration agrees
    exactly regardless of enumeration order. One eager localCheckpoint
    pins the canonical edge list for the degree census + three join
    branches."""
    ce = (
        edges.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        ce.select(F.explode(F.array("u", "v")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient each edge from its lower-(degree, id) endpoint
    e = (
        ce.join(deg.withColumnRenamed("id", "u"), "u")
        .withColumnRenamed("deg", "udeg")
        .join(deg.withColumnRenamed("id", "v"), "v")
        .withColumnRenamed("deg", "vdeg")
        .select(
            F.when(
                F.struct(F.col("udeg"), F.col("u"))
                < F.struct(F.col("vdeg"), F.col("v")),
                F.struct(
                    F.col("u").alias("lo"),
                    F.col("v").alias("hi"),
                    F.struct(
                        F.col("vdeg").alias("d"), F.col("v").alias("n")
                    ).alias("hikey"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("v").alias("lo"),
                    F.col("u").alias("hi"),
                    F.struct(
                        F.col("udeg").alias("d"), F.col("u").alias("n")
                    ).alias("hikey"),
                )
            )
            .alias("o")
        )
        .select("o.lo", "o.hi", "o.hikey")
    )
    wa, wb = e.alias("wa"), e.alias("wb")
    wedges = wa.join(
        wb,
        (F.col("wa.lo") == F.col("wb.lo"))
        & (F.col("wa.hikey") < F.col("wb.hikey")),
    ).select(
        F.col("wa.lo").alias("c0"),
        F.col("wa.hi").alias("x"),
        F.col("wb.hi").alias("y"),
    )
    closing = e.select(F.col("lo").alias("cx"), F.col("hi").alias("cy"))
    tri_nodes = (
        wedges.join(
            closing,
            (F.col("x") == F.col("cx")) & (F.col("y") == F.col("cy")),
        )
        .select(F.explode(F.array("c0", "x", "y")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .join(tri_nodes, "id", "left")
        .select(
            "id",
            "deg",
            F.coalesce("triangles", F.lit(0)).alias("triangles"),
            F.round(
                2.0
                * F.coalesce("triangles", F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1.0)),
                6,
            ).alias("coef"),
        )
    )


def sql_clustering_coefficient() -> str:
    """Naive a<b<c triangle enumeration over a ``gedges(src, dst)``
    CTE — integer-exact, so any Spark enumeration strategy matches."""
    return """ce AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM gedges WHERE src <> dst
),
cdeg AS (
  SELECT id, count(*) AS deg FROM (
    SELECT a AS id FROM ce UNION ALL SELECT b FROM ce
  ) GROUP BY id
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ce e1
  JOIN ce e2 ON e2.a = e1.b
  JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b
),
tcnt AS (
  SELECT id, count(*) AS t FROM (
    SELECT x AS id FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY id
)
SELECT d.id, d.deg, COALESCE(t.t, 0) AS triangles,
       round(2.0 * COALESCE(t.t, 0) / (d.deg * (d.deg - 1.0)), 6) AS coef
FROM cdeg d LEFT JOIN tcnt t ON t.id = d.id
WHERE d.deg >= 2"""


# --- Adamic-Adar link prediction -------------------------------------------------

AA_MAX_DEG = 64  # wedge centers above this degree are excluded


def adamic_adar_pairs(edges: DataFrame, max_deg: int = AA_MAX_DEG) -> DataFrame:
    """(id_a, id_b, aa): Adamic-Adar link-prediction score for node
    pairs sharing >= 1 neighbor, aa = sum over common neighbors z of
    1/ln(deg z) (Adamic & Adar, Social Networks 2003 — public). On a
    host graph, high-AA NON-edges are mirror/farm candidates that k-core
    and clustering coefficient (node-local views) can't see: two hosts
    that never link each other but share many low-degree neighbors.

    The wedge join is the quadratic hazard: a hub neighbor of degree d
    emits d^2 pairs while contributing the LEAST signal (1/ln d -> 0 —
    the whole point of the weighting). Wedge centers above ``max_deg``
    are therefore excluded outright — same hot-cap discipline as the
    shingle pair generators, and here the cap is PRINCIPLED: AA's own
    weight says hubs are noise. Remaining work is one degree census +
    one self-join on the capped center set, both map-combined shuffles.
    Centers need deg >= 2 (a degree-1 node forms no wedge). Each term
    1/ln(deg) is the identical IEEE double on both engines; per-pair
    sums are few-term (common-neighbor counts), so the 6dp rounding
    absorbs any summation-order ulp — the same float discipline as the
    pagerank/hits iterations."""
    e2 = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    und = e2.select(F.col("a").alias("z"), F.col("b").alias("n")).unionAll(
        e2.select(F.col("b").alias("z"), F.col("a").alias("n"))
    )
    deg = und.groupBy("z").agg(F.count(F.lit(1)).alias("deg"))
    centers = und.join(
        deg.filter(
            (F.col("deg") >= 2) & (F.col("deg") <= max_deg)
        ),
        "z",
    )
    wa, wb = centers.alias("wa"), centers.alias("wb")
    return (
        wa.join(
            wb,
            (F.col("wa.z") == F.col("wb.z"))
            & (F.col("wa.n") < F.col("wb.n")),
        )
        .select(
            F.col("wa.n").alias("id_a"),
            F.col("wb.n").alias("id_b"),
            (1.0 / F.log(F.col("wa.deg"))).alias("w"),
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            # round_half_away_col, not F.round: aa is a hash-compared
            # computed double (functions/rounding.py prescribes this
            # for the decimal-tie case)
            round_half_away_col(F.sum("w"), 6).alias("aa"),
        )
    )


def sql_adamic_adar_pairs(max_deg: int = AA_MAX_DEG) -> str:
    """Over a ``gedges(src, dst)`` CTE — identical cap and weighting."""
    return f"""ce AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM gedges WHERE src <> dst
),
und AS (
  SELECT a AS z, b AS n FROM ce UNION ALL SELECT b AS z, a AS n FROM ce
),
adeg AS (SELECT z, count(*) AS deg FROM und GROUP BY z),
centers AS (
  SELECT u.z, u.n, d.deg FROM und u JOIN adeg d ON d.z = u.z
  WHERE d.deg >= 2 AND d.deg <= {max_deg}
)
SELECT wa.n AS id_a, wb.n AS id_b, count(*) AS common,
       round(sum(1.0 / ln(wa.deg)), 6) AS aa
FROM centers wa JOIN centers wb ON wa.z = wb.z AND wa.n < wb.n
GROUP BY wa.n, wb.n"""
