"""Driver-checkable queries for the relational operators (SURVEY §2.2).

Each query demonstrates one R-operator (or a "free win" Spark adds over the
reference — SURVEY §2.2 notes ORDER BY/LIMIT/DISTINCT/windows/set-ops/
subqueries are absent there) on the TPC-H-ish fixtures, with a DuckDB oracle.

Float discipline: computed float aggregates are ROUND()ed identically on
both sides; pass-through doubles (read straight from parquet) are bit-exact
and left unrounded. Ordering never carries semantics for the hash compare
(driver sorts rows), but LIMIT/top-k queries use total tie-breaks so the
selected row *set* is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from hash_db_spark.catalog import load_table
from hash_db_spark.operators import relational as R
from hash_db_spark.queries import Query


def _t(spark, sf_dir, name) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --- R1/R2/R3: scan + projection + typed equality filter ---------------------

def q_select_where_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    return R.project(
        R.filter_eq(cust, "c_mktsegment", "BUILDING"),
        ["c_custkey", "c_name", "c_acctbal"],
    )


# --- R4: conjunctive WHERE ---------------------------------------------------

def q_filter_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return R.filter_all(
        orders,
        F.col("o_orderstatus") == "F",
        F.col("o_orderpriority") == "1-URGENT",
        F.col("o_totalprice") > 100000.0,
    ).select("o_orderkey", "o_custkey", "o_totalprice")


# --- R6: single equi hash join ----------------------------------------------

def q_inner_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return R.hash_join(
        orders, cust, on=orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "c_name", "o_totalprice", "c_mktsegment")


# --- R7: left-deep multi-join chain (example.py's items⋈people⋈products) ----

def q_multi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    out = R.multi_join(
        li.filter(F.col("l_quantity") >= 45),
        (orders, F.col("l_orderkey") == F.col("o_orderkey")),
        (cust, F.col("o_custkey") == F.col("c_custkey")),
    )
    return out.select("l_orderkey", "l_linenumber", "c_name", "o_orderstatus")


# --- R10: group-by + count ---------------------------------------------------

def q_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.group_count(_t(spark, sf_dir, "customer"), "c_mktsegment")


# --- R11: dynamic-schema INSERT with auto-id --------------------------------

def q_insert_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Insert two suppliers, one carrying a novel column (s_phone) — the
    reference's emergent-schema semantics (README.md:175): old rows read
    NULL for the new field. Verify by scanning the widened table."""
    sup = _t(spark, sf_dir, "supplier").withColumnRenamed("s_suppkey", "id")
    new_rows = spark.createDataFrame(
        [
            ("NewCo A", 5, 100.0, "555-0100"),
            ("NewCo B", 7, 200.0, "555-0200"),
        ],
        ["s_name", "s_nationkey", "s_acctbal", "s_phone"],
    ).select(
        F.col("s_name"),
        F.col("s_nationkey").cast("int"),
        F.col("s_acctbal"),
        F.col("s_phone"),
    )
    return R.insert_rows(sup, new_rows, id_col="id")


INSERT_ORACLE = """
SELECT s_suppkey AS id, s_name, s_nationkey, s_acctbal, NULL AS s_phone
FROM supplier
UNION ALL
SELECT (SELECT max(s_suppkey) FROM supplier) + 1, 'NewCo A', 5, 100.0, '555-0100'
UNION ALL
SELECT (SELECT max(s_suppkey) FROM supplier) + 2, 'NewCo B', 7, 200.0, '555-0200'
"""


# --- R12: UPDATE … WHERE as recompute ---------------------------------------

def q_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """example.py:126-149's update-then-reselect scenario: flip negative
    account balances' segment to 'COLLECTIONS', then re-select."""
    cust = _t(spark, sf_dir, "customer")
    updated = R.update_where(
        cust,
        F.col("c_acctbal") < 0,
        {"c_mktsegment": F.lit("COLLECTIONS")},
    )
    return updated.select("c_custkey", "c_mktsegment", "c_acctbal")


# --- TPC-H-style analytics (scan+filter+agg pipelines) ----------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the headline scan+agg. One shuffle (by the two
    low-cardinality flags), partial aggregation map-side."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: filter both sides, join, agg, deterministic top-10
    (revenue desc, orderkey asc tie-break). Ends in
    TakeOrderedAndProject — no global sort. The customer side carries
    NO broadcast hint: it is corpus-proportional (1/10 of lineitem's
    rows at any SF), so a forced broadcast becomes a multi-GB ship at
    100x — AQE picks broadcast at small SF on its own and demotes to
    shuffle join when the segment filter's output outgrows the
    threshold."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
    )
    rev = (
        joined.groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return R.top_k(rev, [F.col("revenue").desc(), F.col("o_orderkey").asc()], 10)


Q3_ORACLE = """
SELECT o_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q5_local_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join. TRUE scale-invariant
    dimensions (region/nation) broadcast; customer AND supplier are
    corpus-proportional (1/10 and 1/100 of lineitem's rows at any SF)
    so they carry no hint — AQE broadcasts them while they fit and
    demotes to a shuffle join at scale instead of OOMing on a forced
    multi-GB ship (supplier unhinted r10, finishing what the r09
    customer unhint started)."""
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    sup = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(sup, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            cust,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


Q5_ORACLE = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


# --- Free wins over the reference SQL (SURVEY §2.2 list) --------------------

def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).distinct()


def q_order_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return R.top_k(
        _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        15,
    )


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer by price (window row_number, total order)."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return R.rank_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        2,
    )


WINDOW_RANK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, rn FROM (
  SELECT o_orderkey, o_custkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC
         ) AS rn
  FROM orders
) WHERE rn <= 2
"""


def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 5)
    )


def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops (absent in the reference): nations that have customers or
    suppliers, deduplicated."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").cast("int").alias("nationkey")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").cast("int").alias("nationkey")
    )
    return c.union(s).distinct()


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery as left-semi join (subqueries absent in the
    reference). The filtered customer side is corpus-proportional, so
    the join carries no broadcast hint — the same rule as q3/q5: AQE
    broadcasts it while it fits, shuffle-joins at scale."""
    orders = _t(spark, sf_dir, "orders")
    building = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    return orders.join(
        building,
        orders.o_custkey == building.c_custkey,
        "left_semi",
    ).select("o_orderkey", "o_custkey", "o_totalprice")


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti join: customers with no recorded events."""
    cust = _t(spark, sf_dir, "customer")
    ev = _t(spark, sf_dir, "events").select(F.col("user_id").alias("uid"))
    return cust.join(
        ev, cust.c_custkey == ev.uid, "left_anti"
    ).select("c_custkey", "c_name")


def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function library sampler (string/date/math — absent in the
    reference, SURVEY §2.2): all deterministic & exact."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    return orders.select(
        "o_orderkey",
        F.upper(F.col("o_orderpriority")).alias("prio_upper"),
        F.substring(F.col("o_orderstatus"), 1, 1).alias("status_c"),
        F.year(F.col("o_orderdate")).alias("o_year"),
        F.month(F.col("o_orderdate")).alias("o_month"),
        F.length(F.col("o_orderpriority")).alias("prio_len"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
        F.abs(F.col("o_orderkey") - 100).alias("key_dist"),
        F.concat_ws("-", F.col("o_orderstatus"), F.col("o_orderpriority")).alias(
            "status_prio"
        ),
    )


SCALAR_FN_ORACLE = """
SELECT o_orderkey,
       upper(o_orderpriority) AS prio_upper,
       substring(o_orderstatus, 1, 1) AS status_c,
       CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(month(o_orderdate) AS INT) AS o_month,
       CAST(length(o_orderpriority) AS INT) AS prio_len,
       o_orderkey % 7 AS key_mod7,
       abs(o_orderkey - 100) AS key_dist,
       concat_ws('-', o_orderstatus, o_orderpriority) AS status_prio
FROM orders WHERE o_orderkey <= 500
"""


def q_agg_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate library sampler per order status: min/max/sum/avg/count
    distinct (only count(*) exists in the reference, server.py:916-917)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )


AGG_FN_ORACLE = """
SELECT o_orderstatus,
       min(o_totalprice) AS min_price,
       max(o_totalprice) AS max_price,
       round(sum(o_totalprice), 2) AS sum_price,
       round(avg(o_totalprice), 4) AS avg_price,
       count(DISTINCT o_custkey) AS n_custs,
       count(*) AS n_orders
FROM orders GROUP BY o_orderstatus
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation — Spark percentile() and
    DuckDB quantile_cont share the definition). Spark also offers
    percentile_approx for sketch-based scale; exact is used here because
    approx algorithms differ cross-engine and cannot hash-match."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
    )


PERCENTILES_ORACLE = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90
FROM orders GROUP BY o_orderstatus
"""


def q_cdc_latest_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog merge: update one supplier's balance twice (later version
    wins), delete another, insert a new one — read the current state."""
    from hash_db_spark.operators import cdc

    sup = _t(spark, sf_dir, "supplier")
    changes = spark.createDataFrame(
        [
            (1, 1, "upsert", "Supplier#1-v1", 0, 111.0),
            (1, 2, "upsert", "Supplier#1-v2", 0, 222.0),  # later wins
            (2, 1, "delete", None, None, None),
            (9001, 1, "upsert", "NewSupplier", 3, 50.0),
        ],
        "s_suppkey long, version long, op string, "
        "s_name string, s_nationkey int, s_acctbal double",
    )
    return cdc.latest_view(sup, changes, "s_suppkey")


CDC_ORACLE = """
SELECT s_suppkey, 'Supplier#1-v2' AS s_name, 0 AS s_nationkey, 222.0 AS s_acctbal
FROM supplier WHERE s_suppkey = 1
UNION ALL
SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
WHERE s_suppkey NOT IN (1, 2)
UNION ALL
SELECT 9001, 'NewSupplier', 3, 50.0
"""


def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between-crawl dataset diff: derive a 'next snapshot' of the
    documents table (drop doc_id%17, re-case doc_id%13, add shifted ids
    for doc_id%23) and report added/removed/changed — one full-outer
    shuffle (cdc.snapshot_diff)."""
    from hash_db_spark.operators import cdc

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    changed = F.when(
        F.col("doc_id") % 13 == 0, F.upper(F.col("text"))
    ).otherwise(F.col("text"))
    new = (
        docs.filter(F.col("doc_id") % 17 != 0)
        .withColumn("text", changed)
        .unionByName(
            docs.filter(F.col("doc_id") % 23 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    return cdc.snapshot_diff(docs, new, "doc_id", ["text"])


SNAPSHOT_DIFF_ORACLE = """
WITH oldt AS (SELECT doc_id AS id, text FROM documents),
newt AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id % 13 = 0 THEN upper(text) ELSE text END AS text
  FROM documents WHERE doc_id % 17 != 0
  UNION ALL
  SELECT doc_id + 1000000 AS id, text FROM documents WHERE doc_id % 23 = 0
)
SELECT id, status FROM (
  SELECT COALESCE(o.id, n.id) AS id,
         CASE WHEN o.id IS NULL THEN 'added'
              WHEN n.id IS NULL THEN 'removed'
              WHEN o.text IS DISTINCT FROM n.text THEN 'changed' END AS status
  FROM oldt o FULL JOIN newt n ON o.id = n.id
) WHERE status IS NOT NULL
"""


def q_cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity intervals for the same changelog as cdc_latest_view:
    supplier 1 has three states (base → v1 → v2-current), supplier 2's
    base interval is closed by the delete with no successor, 9001 is a
    fresh insert. History restricted to the touched keys."""
    from hash_db_spark.operators import cdc

    sup = _t(spark, sf_dir, "supplier")
    changes = spark.createDataFrame(
        [
            (1, 1, "upsert", "Supplier#1-v1", 0, 111.0),
            (1, 2, "upsert", "Supplier#1-v2", 0, 222.0),
            (2, 1, "delete", None, None, None),
            (9001, 1, "upsert", "NewSupplier", 3, 50.0),
        ],
        "s_suppkey long, version long, op string, "
        "s_name string, s_nationkey int, s_acctbal double",
    )
    hist = cdc.scd2_history(sup, changes, "s_suppkey")
    return hist.filter(F.col("s_suppkey").isin(1, 2, 9001)).select(
        "s_suppkey", "valid_from", "valid_to", "is_current",
        "s_name", "s_acctbal",
    )


SCD2_ORACLE = """
SELECT s_suppkey, CAST(0 AS BIGINT) AS valid_from,
       CAST(1 AS BIGINT) AS valid_to, FALSE AS is_current,
       s_name, s_acctbal
FROM supplier WHERE s_suppkey IN (1, 2)
UNION ALL
SELECT 1, 1, 2, FALSE, 'Supplier#1-v1', 111.0
UNION ALL
SELECT 1, 2, NULL, TRUE, 'Supplier#1-v2', 222.0
UNION ALL
SELECT 9001, 1, NULL, TRUE, 'NewSupplier', 50.0
"""


def q_pivot_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reshaping: doc counts per language pivoted over a FIXED source
    list (`DataFrame.pivot` with explicit values — the scale-safe form:
    without the value list Spark first runs a distinct scan to discover
    columns, and an unbounded category set would explode the schema).
    Missing combinations surface as 0, not NULL."""
    srcs = [f"src{i}" for i in range(5)]
    docs = _t(spark, sf_dir, "documents")
    p = (
        docs.filter(F.col("source").isin(srcs))
        .groupBy("lang")
        .pivot("source", srcs)
        .count()
    )
    return p.select(
        "lang",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"n_{s}")
            for s in srcs
        ],
    )


PIVOT_ORACLE = """
SELECT lang,
       count(*) FILTER (WHERE source = 'src0') AS n_src0,
       count(*) FILTER (WHERE source = 'src1') AS n_src1,
       count(*) FILTER (WHERE source = 'src2') AS n_src2,
       count(*) FILTER (WHERE source = 'src3') AS n_src3,
       count(*) FILTER (WHERE source = 'src4') AS n_src4
FROM documents
WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
GROUP BY lang
"""


def q_scd2_asof_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension state AS OF a version: SCD2 history built from a
    data-driven changelog (every 10th supplier re-named at v1, every
    20th deleted at v2), then the point-in-time filter
    ``valid_from <= v AND (valid_to IS NULL OR valid_to > v)`` at v=1 —
    the lookup a fact-table join would broadcast. Deletes at v2 don't
    affect the v1 snapshot, so every supplier is present."""
    from hash_db_spark.operators import cdc

    sup = _t(spark, sf_dir, "supplier")
    base = sup.select("s_suppkey", "s_name", "s_acctbal")
    upserts = sup.filter(F.col("s_suppkey") % 10 == 0).select(
        "s_suppkey",
        F.lit(1).cast("long").alias("version"),
        F.lit("upsert").alias("op"),
        F.concat(F.col("s_name"), F.lit("-v1")).alias("s_name"),
        (F.col("s_acctbal") + 100.0).alias("s_acctbal"),
    )
    deletes = sup.filter(F.col("s_suppkey") % 20 == 0).select(
        "s_suppkey",
        F.lit(2).cast("long").alias("version"),
        F.lit("delete").alias("op"),
        F.lit(None).cast("string").alias("s_name"),
        F.lit(None).cast("double").alias("s_acctbal"),
    )
    hist = cdc.scd2_history(base, upserts.unionByName(deletes), "s_suppkey")
    at_v = hist.filter(
        (F.col("valid_from") <= 1)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > 1))
    )
    return at_v.select(
        "s_suppkey",
        "valid_from",
        "s_name",
        F.round("s_acctbal", 2).alias("s_acctbal"),
    )


SCD2_ASOF_ORACLE = """
SELECT s_suppkey,
       CAST(CASE WHEN s_suppkey % 10 = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS valid_from,
       CASE WHEN s_suppkey % 10 = 0 THEN s_name || '-v1' ELSE s_name END
         AS s_name,
       round(CASE WHEN s_suppkey % 10 = 0 THEN s_acctbal + 100.0
                  ELSE s_acctbal END, 2) AS s_acctbal
FROM supplier
"""


# (child_table, fk_col, parent_table, pk_col) — the fixture's FK graph.
FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def q_fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge of the schema:
    (edge, n_child, n_orphans) — the data-quality report a warehouse
    runs after every load (parquet enforces nothing; orphans creep in
    through partial loads and late-arriving dims). Healthy fixtures
    score all zeros — that IS the assertion.

    Scale shape: one left-anti join per edge, unhinted — AQE broadcasts
    the parent key set while it fits (nation/region always; orders at
    100 TB falls back to a shuffle join, which is the correct plan).
    Output is |edges| rows built from map-side-combinable counts."""
    out = None
    for child, fk, parent, pk in FK_EDGES:
        c = _t(spark, sf_dir, child).select(F.col(fk).alias("k"))
        p = _t(spark, sf_dir, parent).select(F.col(pk).alias("k"))
        row = (
            c.agg(F.count(F.lit(1)).alias("n_child"))
            .crossJoin(
                c.join(p, "k", "left_anti").agg(
                    F.count(F.lit(1)).alias("n_orphans")
                )
            )
            .select(
                F.lit(f"{child}.{fk}->{parent}.{pk}").alias("edge"),
                "n_child",
                "n_orphans",
            )
        )
        out = row if out is None else out.union(row)
    return out


def _fk_integrity_oracle() -> str:
    selects = [
        f"""SELECT '{child}.{fk}->{parent}.{pk}' AS edge,
       (SELECT count(*) FROM {child}) AS n_child,
       (SELECT count(*) FROM {child} c
        WHERE NOT EXISTS (
          SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk}
        )) AS n_orphans"""
        for child, fk, parent, pk in FK_EDGES
    ]
    return "\nUNION ALL\n".join(selects)


def q_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact audit: for a subject set (here the
    deterministic fixture subset c_custkey % 97 = 0), the rows each
    table must erase — DIRECT hits (customer, orders, events) and the
    FK-CASCADED hits (lineitem rows of the subjects' orders). This is
    the report a governance pipeline produces before rewriting
    partitions; parquet has no DELETE, so erasure is an anti-join
    rewrite and this audit prices it.

    Scale shape: the subject set stays a FRAME (millions of subjects at
    scale — never a collected literal); every count is a semi-join +
    map-side-combined count, unhinted so AQE broadcasts the subject set
    while it fits."""
    subjects = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 97 == 0)
        .select(F.col("c_custkey").alias("sid"))
    )
    cust = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("sid")
    )
    orders = _t(spark, sf_dir, "orders")
    ordk = orders.select(
        F.col("o_custkey").alias("sid"), "o_orderkey"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("sid")
    )

    def count_of(df, label):
        return df.join(subjects, "sid", "left_semi").agg(
            F.count(F.lit(1)).alias("n_rows")
        ).select(F.lit(label).alias("tbl"), "n_rows")

    li_hit = (
        li.join(
            ordk.join(subjects, "sid", "left_semi").select("o_orderkey"),
            "o_orderkey",
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.lit("lineitem").alias("tbl"), "n_rows")
    )
    return (
        count_of(cust, "customer")
        .union(count_of(ordk, "orders"))
        .union(li_hit)
        .union(count_of(ev, "events"))
    )


ERASURE_AUDIT_ORACLE = """
SELECT 'customer' AS tbl, count(*) AS n_rows
FROM customer WHERE c_custkey % 97 = 0
UNION ALL
SELECT 'orders', count(*) FROM orders WHERE o_custkey % 97 = 0
  AND o_custkey IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'lineitem', count(*) FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE o_custkey % 97 = 0
    AND o_custkey IN (SELECT c_custkey FROM customer)
)
UNION ALL
SELECT 'events', count(*) FROM events
WHERE user_id IN (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0)
"""




JSE_RATE_NUM = 209715  # sample_u < NUM with M=2^20 -> ~20% key sample


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimizer-statistics capability: estimate |orders JOIN customer
    ON custkey| from a ~20% CONTENT-ADDRESSED key sample (the classic
    key-sampling estimator: join size = sum_k n_orders(k)*n_cust(k);
    sampling keys by hash keeps both sides' counts for a kept key
    intact, so the scaled sample sum is unbiased). Emits the estimate
    next to the exact value with the relative error — the number a
    planner consults before choosing a join strategy, here made a
    driver-checkable query (everything is deterministic: md5 sampling,
    exact int sums, one float division).

    Scale shape: two map-side-combined per-key counts, one equijoin on
    the key dimension, no row-level join of the fact tables at all —
    the whole point: estimating the join costs a fraction of running
    it."""
    from hash_db_spark.operators.curation import SAMPLE_M, sample_u

    o = _t(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("k")
    ).agg(F.count(F.lit(1)).alias("n_o"))
    c = _t(spark, sf_dir, "customer").groupBy(
        F.col("c_custkey").alias("k")
    ).agg(F.count(F.lit(1)).alias("n_c"))
    per_key = o.join(c, "k").select(
        "k", (F.col("n_o") * F.col("n_c")).alias("m"),
        sample_u(F.col("k")).alias("u"),
    )
    rate = JSE_RATE_NUM / SAMPLE_M
    return per_key.agg(
        F.round(
            F.sum(F.when(F.col("u") < JSE_RATE_NUM, F.col("m"))).cast(
                "double"
            )
            / F.lit(rate),
            2,
        ).alias("est_rows"),
        F.sum("m").alias("exact_rows"),
    ).select(
        "est_rows",
        "exact_rows",
        F.round(
            F.abs(F.col("est_rows") - F.col("exact_rows"))
            / F.col("exact_rows"),
            6,
        ).alias("rel_err"),
    )


def _join_size_estimate_oracle() -> str:
    from hash_db_spark.operators.curation import SAMPLE_M, sql_sample_u

    rate = JSE_RATE_NUM / SAMPLE_M
    return f"""
WITH o AS (SELECT o_custkey AS k, count(*) AS n_o FROM orders GROUP BY 1),
c AS (SELECT c_custkey AS k, count(*) AS n_c FROM customer GROUP BY 1),
per_key AS (
  SELECT o.k, o.n_o * c.n_c AS m, {sql_sample_u('o.k')} AS u
  FROM o JOIN c USING (k)
),
agg AS (
  SELECT round(CAST(sum(CASE WHEN u < {JSE_RATE_NUM} THEN m END) AS DOUBLE)
               / {rate!r}, 2) AS est_rows,
         CAST(sum(m) AS BIGINT) AS exact_rows
  FROM per_key
)
SELECT est_rows, exact_rows,
       round(abs(est_rows - exact_rows) / exact_rows, 6) AS rel_err
FROM agg
"""


# --- k-anonymity audit ----------------------------------------------------------

K_ANON_K = 5  # groups below this size are re-identification risks
K_ANON_CHAR_BUCKET = 100  # n_chars coarsened to 100-char buckets


def q_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the release quasi-identifiers (Sweeney
    2002, the governance gate before a corpus ships): documents grouped
    by (lang, source, coarsened length bucket); every equivalence class
    smaller than k is a re-identification risk the release must
    generalize or suppress. Output is the risk report — the risky
    classes with their sizes and member count share.

    Completes the governance trio: scrub (PII redaction),
    erasure_audit (right-to-be-forgotten pricing), k-anonymity
    (release-shape risk). One map-side bucket projection + one
    map-combined aggregation; at 100 TB this is a single shuffle on
    the (low-cardinality) quasi-identifier key."""
    docs = _t(spark, sf_dir, "documents")
    classes = (
        docs.select(
            "lang",
            "source",
            (F.floor(F.col("n_chars") / K_ANON_CHAR_BUCKET)
             * K_ANON_CHAR_BUCKET).cast("long").alias("len_bucket"),
        )
        .groupBy("lang", "source", "len_bucket")
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    return classes.filter(F.col("class_size") < K_ANON_K)


K_ANONYMITY_ORACLE = f"""
SELECT lang, source,
       CAST(floor(n_chars / {K_ANON_CHAR_BUCKET}) * {K_ANON_CHAR_BUCKET}
            AS BIGINT) AS len_bucket,
       count(*) AS class_size
FROM documents
GROUP BY lang, source, len_bucket
HAVING count(*) < {K_ANON_K}
"""

# --- l-diversity audit (session 9) --------------------------------------------

L_DIVERSITY_L = 3  # distinct sensitive values every class must carry


def q_l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., TKDD 2007 — the
    homogeneity-attack fix k-anonymity misses): a class can be
    k-anonymous yet leak its members' SENSITIVE value when everyone in
    it shares one. Quasi-identifiers here are (lang, length bucket);
    `source` plays the sensitive attribute. Reports EVERY
    k-anonymous class with its distinct-sensitive count, top sensitive
    share (1.0 = total homogeneity, the worst case), and the
    below-l violation flag — the audit table a release review reads,
    whether or not anything is currently violating.

    Two stacked map-combined aggregations on low-cardinality keys —
    (qi, sensitive) counts, then per-qi rollup — a single logical
    shuffle chain at any corpus size; no windows, no joins."""
    docs = _t(spark, sf_dir, "documents")
    cell = (
        docs.select(
            "lang",
            (F.floor(F.col("n_chars") / K_ANON_CHAR_BUCKET)
             * K_ANON_CHAR_BUCKET).cast("long").alias("len_bucket"),
            "source",
        )
        .groupBy("lang", "len_bucket", "source")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from hash_db_spark.functions.rounding import round_half_away_col

    classes = cell.groupBy("lang", "len_bucket").agg(
        F.sum("c").alias("class_size"),
        F.count(F.lit(1)).alias("n_sensitive"),
        # round_half_away_col, not F.round: hash-compared computed
        # double (functions/rounding.py decimal-tie prescription)
        round_half_away_col(F.max("c") / F.sum("c"), 6).alias(
            "top_sensitive_share"
        ),
    )
    return classes.filter(F.col("class_size") >= K_ANON_K).withColumn(
        "low_diversity", F.col("n_sensitive") < L_DIVERSITY_L
    )


L_DIVERSITY_ORACLE = f"""
WITH cell AS (
  SELECT lang,
         CAST(floor(n_chars / {K_ANON_CHAR_BUCKET}) * {K_ANON_CHAR_BUCKET}
              AS BIGINT) AS len_bucket,
         source, count(*) AS c
  FROM documents
  GROUP BY lang, len_bucket, source
)
SELECT lang, len_bucket, sum(c) AS class_size,
       count(*) AS n_sensitive,
       round(CAST(max(c) AS DOUBLE) / sum(c), 6) AS top_sensitive_share,
       count(*) < {L_DIVERSITY_L} AS low_diversity
FROM cell
GROUP BY lang, len_bucket
HAVING sum(c) >= {K_ANON_K}
"""

# r12 QUEUE CANDIDATE (session 9):
#   "l_diversity_audit": Query(q_l_diversity_audit, L_DIVERSITY_ORACLE),


# The QUERIES literal lives at module tail so every registered fn is
# already bound; compute_reverify explodes it per-entry either way.
QUERIES = {
    "percentiles": Query(q_percentiles, PERCENTILES_ORACLE),
    "cdc_latest_view": Query(q_cdc_latest_view, CDC_ORACLE),
    "corpus_snapshot_diff": Query(
        q_corpus_snapshot_diff, SNAPSHOT_DIFF_ORACLE
    ),
    "cdc_scd2_history": Query(q_cdc_scd2_history, SCD2_ORACLE),
    "pivot_lang_source": Query(q_pivot_lang_source, PIVOT_ORACLE),
    "scd2_asof_lookup": Query(q_scd2_asof_lookup, SCD2_ASOF_ORACLE),
    "select_where_eq": Query(
        q_select_where_eq,
        "SELECT c_custkey, c_name, c_acctbal FROM customer "
        "WHERE c_mktsegment = 'BUILDING'",
    ),
    "filter_and": Query(
        q_filter_and,
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT' "
        "AND o_totalprice > 100000.0",
    ),
    "inner_join": Query(
        q_inner_join,
        "SELECT o_orderkey, c_name, o_totalprice, c_mktsegment "
        "FROM orders JOIN customer ON o_custkey = c_custkey",
    ),
    "multi_join": Query(
        q_multi_join,
        "SELECT l_orderkey, l_linenumber, c_name, o_orderstatus "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey WHERE l_quantity >= 45",
    ),
    "group_count": Query(
        q_group_count,
        "SELECT c_mktsegment, count(*) AS cnt FROM customer GROUP BY c_mktsegment",
    ),
    "insert_rows": Query(q_insert_rows, INSERT_ORACLE),
    "update_where": Query(
        q_update_where,
        "SELECT c_custkey, "
        "CASE WHEN c_acctbal < 0 THEN 'COLLECTIONS' ELSE c_mktsegment END "
        "AS c_mktsegment, c_acctbal FROM customer",
    ),
    "q1_pricing_summary": Query(q1_pricing_summary, Q1_ORACLE),
    "q3_top_orders": Query(q3_top_orders, Q3_ORACLE),
    "q5_local_revenue": Query(q5_local_revenue, Q5_ORACLE),
    "distinct": Query(
        q_distinct,
        "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    ),
    "order_limit": Query(
        q_order_limit,
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15",
    ),
    "window_rank": Query(q_window_rank, WINDOW_RANK_ORACLE),
    "having": Query(
        q_having,
        "SELECT c_nationkey, count(*) AS cnt FROM customer "
        "GROUP BY c_nationkey HAVING count(*) > 5",
    ),
    "union_distinct": Query(
        q_union,
        "SELECT nationkey FROM ("
        "SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer "
        "UNION SELECT CAST(s_nationkey AS INT) FROM supplier)",
    ),
    "semi_join": Query(
        q_semi_join,
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
        "WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')",
    ),
    "anti_join": Query(
        q_anti_join,
        "SELECT c_custkey, c_name FROM customer "
        "WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)",
    ),
    "scalar_functions": Query(q_scalar_functions, SCALAR_FN_ORACLE),
    "agg_functions": Query(q_agg_functions, AGG_FN_ORACLE),
    # registered r10 (queued r09 under the VERDICT r08 #1 throttle):
    "fk_integrity_audit": Query(
        q_fk_integrity_audit, _fk_integrity_oracle()),
    "erasure_audit": Query(q_erasure_audit, ERASURE_AUDIT_ORACLE),
    # registered r11 (queued r10 under the VERDICT r08 #1 throttle):
    "join_size_estimate": Query(
        q_join_size_estimate, _join_size_estimate_oracle()
    ),
    "k_anonymity_audit": Query(q_k_anonymity_audit, K_ANONYMITY_ORACLE),
}
