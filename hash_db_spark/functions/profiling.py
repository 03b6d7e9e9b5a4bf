"""Dataset profiling / data-quality operators (pipeline hygiene — a
training-data pipeline gates ingest on these).

One pass over the table computes per-column null counts and distinct
counts plus row totals, unpivoted to (column, n_nulls, n_distinct, n_rows)
— a single aggregation, no per-column scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def profile_columns(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) per profiled column.
    count_distinct is exact; at 100 TB swap approx_count_distinct and
    accept the sketch (the oracle gate needs exact)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"__dist_{c}"))
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__nulls_{c}").alias("n_nulls"),
                        F.col(f"__dist_{c}").alias("n_distinct"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.column", "p.n_rows", "p.n_nulls", "p.n_distinct")


def sql_profile_columns(table: str, cols: list[str]) -> str:
    selects = " UNION ALL ".join(
        f"SELECT '{c}' AS column, count(*) AS n_rows, "
        f"sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS n_nulls, "
        f"count(DISTINCT {c}) AS n_distinct FROM {table}"
        for c in cols
    )
    return selects
