"""Distributed global ranking (operators/rank.py): results must be
bit-identical to the naive single-window forms, and the plan must rank
inside partitioned Windows only (no `WindowExec: No Partition Defined`
funnel — the scale property the operator exists for)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from hash_db_spark.catalog import load_table
from hash_db_spark.operators.rank import ntile_global, row_number_global


def _customers(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )


def test_row_number_matches_global_window(spark, sf_dir):
    cust = _customers(spark, sf_dir)
    order = [F.col("c_acctbal").desc(), F.col("c_custkey").asc()]
    got = row_number_global(cust, order).select("c_custkey", "rn")
    w = Window.orderBy(*order)
    want = cust.select(
        "c_custkey", F.row_number().over(w).alias("rn")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_ntile_and_prank_match_global_window(spark, sf_dir):
    cust = _customers(spark, sf_dir)
    order = [F.col("c_acctbal").desc(), F.col("c_custkey").asc()]
    for n in (4, 7, 1):
        got = ntile_global(
            cust, order, n=n, out="b", prank_col="pr"
        ).select("c_custkey", "b", "pr")
        w = Window.orderBy(*order)
        want = cust.select(
            "c_custkey",
            F.ntile(n).over(w).alias("b"),
            F.round(F.percent_rank().over(w), 6).alias("pr"),
        )
        assert got.exceptAll(want).count() == 0, f"ntile({n})"
        assert want.exceptAll(got).count() == 0, f"ntile({n})"


def test_ntile_front_loads_remainder_when_total_lt_n(spark):
    # 3 rows, ntile(5): buckets 1,2,3 (SQL semantics), never 1,2,4.
    df = spark.createDataFrame([(i,) for i in (10, 20, 30)], "v int")
    got = ntile_global(df, [F.col("v").asc()], n=5, out="b")
    assert [r["b"] for r in got.orderBy("v").collect()] == [1, 2, 3]


def test_take_to_budget_matches_global_cumsum(spark, sf_dir):
    from hash_db_spark.operators.rank import take_to_budget

    cust = _customers(spark, sf_dir).withColumn(
        "w", (F.col("c_custkey") % 7 + 1).cast("long")
    )
    order = [F.col("c_acctbal").desc(), F.col("c_custkey").asc()]
    got = take_to_budget(cust, order, "w", budget=200).select(
        "c_custkey", "cum_weight"
    )
    w = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = (
        cust.withColumn("cum_weight", F.sum("w").over(w))
        .filter(F.col("cum_weight") <= 200)
        .select("c_custkey", "cum_weight")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0


def test_plan_has_no_unpartitioned_window(spark, sf_dir):
    cust = _customers(spark, sf_dir)
    got = ntile_global(
        cust,
        [F.col("c_acctbal").desc(), F.col("c_custkey").asc()],
        n=4,
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__pid" in line, f"unpartitioned Window: {line[:160]}"


def test_take_to_budget_float_weights(spark):
    from hash_db_spark.operators.rank import take_to_budget

    df = spark.createDataFrame(
        [(i, 0.5 + (i % 3) * 0.25) for i in range(1, 21)], "id int, w double"
    )
    got = take_to_budget(df, [F.col("id").asc()], "w", budget=5.0)
    rows = sorted((r["id"], r["cum_weight"]) for r in got.collect())
    # running sum: .75, 1.75, 2.25, 3.0, 4.0, 4.5, 5.25 -> first 6 rows kept
    assert [i for i, _ in rows] == [1, 2, 3, 4, 5, 6]
    assert abs(rows[-1][1] - 4.5) < 1e-9
