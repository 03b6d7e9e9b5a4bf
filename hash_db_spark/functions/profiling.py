"""Dataset profiling / data-quality operators (pipeline hygiene — a
training-data pipeline gates ingest on these).

One pass over the table computes per-column null counts and distinct
counts plus row totals, unpivoted to (column, n_nulls, n_distinct, n_rows)
— a single aggregation, no per-column scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from hash_db_spark.localframe import local_frame


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


def profile_quantiles(
    df: DataFrame,
    cols: list[str],
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """(column, p, q): exact interpolated percentiles for numeric columns,
    ONE aggregation pass for all columns x probs (no per-column scans).

    ``percentile`` here is the exact interpolated definition (what DuckDB
    calls quantile_cont), which buffers each column's values — fine for
    gate-scale checks; at 100 TB swap ``approx_percentile`` (t-digest
    sketch, bounded memory, mergeable map-side) and accept the sketch —
    the oracle gate is what needs exactness. Rounded to 6dp: the two
    engines interpolate with differently-ordered arithmetic."""
    aggs = []
    for c in cols:
        for p in probs:
            aggs.append(
                F.round(F.expr(f"percentile({c}, {p!r})"), 6).alias(
                    f"__q_{c}_{int(p * 100)}"
                )
            )
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.lit(float(p)).alias("p"),
                        F.col(f"__q_{c}_{int(p * 100)}").alias("q"),
                    )
                    for c in cols
                    for p in probs
                ]
            )
        ).alias("r")
    )
    return stacked.select("r.column", "r.p", "r.q")


def sql_profile_quantiles(
    table: str,
    cols: list[str],
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> str:
    return " UNION ALL ".join(
        f"SELECT '{c}' AS column, CAST({p!r} AS DOUBLE) AS p, "
        f"round(quantile_cont({c}, {p!r}), 6) AS q FROM {table}"
        for c in cols
        for p in probs
    )


def sql_profile_columns(table: str, cols: list[str]) -> str:
    selects = " UNION ALL ".join(
        f"SELECT '{c}' AS column, count(*) AS n_rows, "
        # CAST: DuckDB integer sum() is HUGEINT, which pandas renders as
        # float64 — the cross-engine hash then sees 1.0 vs 1.
        f"CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS n_nulls, "
        f"count(DISTINCT {c}) AS n_distinct FROM {table}"
        for c in cols
    )
    return selects


# ----------------------------------------------------- histogram sketch


def binned_histogram(
    df: DataFrame, col: str, lo: float, hi: float, bins: int = 256
) -> DataFrame:
    """(bin, cnt): fixed-grid histogram of ``col`` over [lo, hi) — the
    MERGEABLE quantile sketch next to the exact ``profile_quantiles``:
    at 100 TB the exact percentile buffers every value, while this is a
    map-side count per bin (``bins`` rows cross the wire per shard) and
    shards merge by adding counts. Out-of-range values clamp to the edge
    bins; NULLs are EXCLUDED (greatest/least skip NULL in both engines,
    so an unfiltered NULL would silently land in bin 0, inflating the
    low tail and dragging every histogram quantile down — profiling
    counts nulls separately in profile_columns). The bin rule is one
    shared arithmetic expression, so DuckDB computes the identical
    grid."""
    width = (hi - lo) / bins
    b = F.floor((F.col(col) - F.lit(lo)) / F.lit(width)).cast("long")
    b = F.least(F.lit(bins - 1), F.greatest(F.lit(0), b))
    return (
        df.filter(F.col(col).isNotNull())
        .select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    probs: tuple[float, ...],
    lo: float,
    hi: float,
    bins: int = 256,
) -> DataFrame:
    """(p, q_est): quantile estimates from the histogram — the upper
    edge of the first bin whose cumulative count reaches p * total.
    Error is bounded by one bin width; integer cumulative counts make
    the pick deterministic cross-engine.

    The cumulative count is a broadcast inequality self-join + groupBy
    (O(bins^2) pairs over <= 256 bins), not a global Window — the input
    is bounded, but an unpartitioned WindowExec would still funnel it
    through one task and warn on every run."""
    width = (hi - lo) / bins
    h2 = hist.select(F.col("bin").alias("bin2"), F.col("cnt").alias("cnt2"))
    cum = (
        hist.join(F.broadcast(h2), F.col("bin2") <= F.col("bin"))
        .groupBy("bin", "cnt")
        .agg(F.sum("cnt2").alias("cum"))
    )
    total = hist.agg(F.sum("cnt").alias("total"))
    probe = local_frame(
        hist.sparkSession, [(float(p),) for p in probs], "p double"
    )
    hit = (
        cum.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(probe))
        .filter(F.col("cum") >= F.col("p") * F.col("total"))
        .groupBy("p")
        .agg(F.min("bin").alias("qbin"))
    )
    q = F.round(F.lit(lo) + (F.col("qbin") + 1) * F.lit(width), 6)
    return hit.select("p", q.alias("q_est"))


def sql_binned_histogram(
    table: str, col: str, lo: float, hi: float, bins: int = 256
) -> str:
    """Standalone oracle for binned_histogram: identical bin rule, so
    the sketch itself (not just its quantile estimates) hash-matches."""
    width = (hi - lo) / bins
    return f"""
SELECT least({bins - 1}, greatest(0,
         CAST(floor(({col} - {lo!r}) / {width!r}) AS BIGINT))) AS bin,
       count(*) AS cnt
FROM {table} WHERE {col} IS NOT NULL GROUP BY 1
"""


def sql_histogram_quantiles(
    table: str,
    col: str,
    probs: tuple[float, ...],
    lo: float,
    hi: float,
    bins: int = 256,
) -> str:
    width = (hi - lo) / bins
    probes = " UNION ALL ".join(
        f"SELECT CAST({p!r} AS DOUBLE) AS p" for p in probs
    )
    return f"""
WITH hist AS (
  SELECT least({bins - 1}, greatest(0,
           CAST(floor(({col} - {lo!r}) / {width!r}) AS BIGINT))) AS bin,
         count(*) AS cnt
  FROM {table} WHERE {col} IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT bin, sum(cnt) OVER (ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM hist),
probes AS ({probes})
SELECT p, round(CAST({lo!r} AS DOUBLE)
              + (min(bin) + 1) * CAST({width!r} AS DOUBLE), 6) AS q_est
FROM cum CROSS JOIN tot CROSS JOIN probes
WHERE cum >= p * total
GROUP BY p
"""
