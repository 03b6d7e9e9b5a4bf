"""Multi-dimensional data layout: Z-order (Morton) clustering.

The reference's only layout lever is its per-key consistent-hash
placement (/root/reference/consistent_hashing.py) — one dimension, no
range locality. Parquet + Spark get range locality per file from sorting,
but a single sort key only clusters ONE column's min/max stats. Z-order
interleaves the bits of two keys so that files in a z-sorted layout are
tight rectangles in BOTH dimensions — min/max row-group stats then prune
range predicates on either column (the Delta/Iceberg OPTIMIZE ZORDER
capability, engine-level).

Why it matters at 100 TB: a time+tenant z-layout serves both "one tenant,
all time" and "all tenants, one day" scans from a fraction of files; a
plain sort serves only one of them. The z-value is pure integer bit math
(the classic mask-spread construction) — computed identically in DuckDB
SQL, so the registry entry is hash-comparable like everything else.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

# Mask-spread steps for 16-bit inputs: after the pipeline, bit i of the
# input sits at bit 2i of the output.
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _spread16(c: Column) -> Column:
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for sh, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, sh)).bitwiseAND(F.lit(mask))
    return x


def z_value(a: Column | str, b: Column | str) -> Column:
    """Morton interleave of the low 16 bits of two non-negative ints:
    ``a``'s bits land at even positions, ``b``'s at odd."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _spread16(ca).bitwiseOR(F.shiftleft(_spread16(cb), 1))


def sql_spread16(expr: str) -> str:
    # CAST to BIGINT first so every shift happens in 64-bit — on a DuckDB
    # INTEGER column, `x << 8` overflows for x >= 32768, breaking the
    # bit-identical contract with Spark's `.cast("long")` above.
    #
    # Textual-duplication caveat: each masking round substitutes {x}
    # twice, so the rendered SQL holds 2^len(_SPREAD) = 16 copies of the
    # input expression (32 per z-value). Fine for the bare column refs
    # the oracles pass; for a COMPUTED input, bind it to a named column
    # in a subquery/CTE first and pass the name, or the oracle text (and
    # DuckDB's evaluation of the duplicated subtree) grows exponentially.
    x = f"((CAST(({expr}) AS BIGINT)) & 65535)"
    for sh, mask in _SPREAD:
        x = f"(({x} | ({x} << {sh})) & {mask})"
    return x


def sql_z_value(a: str, b: str) -> str:
    return f"({sql_spread16(a)} | ({sql_spread16(b)} << 1))"


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str
) -> None:
    """Write parquet clustered by z(col_a, col_b): range-partition on the
    z-value so each output file owns a contiguous z-range (a small
    rectangle in (a, b) space), then sort within partitions so row
    groups subdivide it. Predicates on EITHER column now prune via
    min/max stats. The helper column is dropped before writing."""
    z = z_value(col_a, col_b).alias("__z")
    (
        df.select("*", z)
        .repartitionByRange("__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bloom_parquet(
    df: DataFrame,
    path: str,
    bloom_cols: tuple[str, ...],
    expected_ndv: int = 100_000,
    fpp: float = 0.01,
) -> None:
    """Write parquet with per-column bloom filters — the point-lookup
    complement to z-order: min/max row-group stats prune RANGE
    predicates on clustered columns, but an equality probe on a
    high-cardinality UNSORTED column (fingerprint, url hash, doc id in
    arrival order) matches every row group's [min, max]. A bloom
    filter per row group answers "definitely absent" for ~10 bits/key,
    so a needle query on 100 TB skips the row groups (and their IO)
    that stats can't exclude. Pure parquet-mr write options — the scan
    side needs nothing from us (Spark's vectorized reader consults
    footers on filter pushdown).

    expected_ndv sizes the filter PER ROW GROUP; oversizing wastes
    footer bytes, undersizing inflates the false-positive rate toward
    reading everything (fail-safe: never wrong results, just no skip).
    """
    w = df.write.mode("overwrite")
    for c in bloom_cols:
        w = w.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(expected_ndv)
        ).option(f"parquet.bloom.filter.fpp#{c}", str(fpp))
    w.parquet(path)


# ---------------------------------------------------------------------------
# Small-file compaction planning
# ---------------------------------------------------------------------------


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    path_col: str = "path",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Assign every file in a manifest to a compaction output group of
    ~``target_bytes`` — the maintenance pass every long-lived 100 TB
    table needs (streaming sinks and per-partition writers leave
    thousands of KB-scale files; scan cost is then dominated by footer
    reads and task scheduling, not bytes). The Delta/Iceberg OPTIMIZE
    bin-packing capability, engine-level.

    Deterministic binning: files are totally ordered by path, each file
    joins the bin its EXCLUSIVE byte-prefix falls in (``grp =
    prefix_sum DIV target``) — the prefix axis is cut at target-width
    marks, so every non-final bin's size is target ± one file (the
    bin-crossing file overflows into the next bin's range), and an
    oversized file occupies bins alone. The accumulate-until-full
    variant is a sequential recurrence (not parallelizable); this
    fixed-range formulation is the one a distributed compactor can
    actually compute, with the same ~target output sizes. Not
    first-fit-decreasing — an O(n log n) global optimization no
    streaming compactor runs either.

    Scale shape: the global prefix sum reuses rank._ranged_with_offsets
    (range-partition on path + per-partition offsets) — NO single-task
    window anywhere; the group-stats pass is one map-side-combined
    groupBy on the bin id. Exact int64 arithmetic end to end.
    """
    from hash_db_spark.operators.rank import _ranged_with_offsets

    ranged, _ = _ranged_with_offsets(
        files, [F.col(path_col)], F.sum(bytes_col)
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("__pid")
        .orderBy(path_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = ranged.select(
        path_col,
        bytes_col,
        (
            (
                F.col("__off")
                + F.coalesce(F.sum(bytes_col).over(w), F.lit(0))
            )
            .cast("long")
        ).alias("__prefix"),
    ).withColumn(
        "grp", F.expr(f"__prefix DIV {int(target_bytes)}").cast("long")
    )
    stats = assigned.groupBy("grp").agg(
        F.count(F.lit(1)).alias("grp_files"),
        F.sum(bytes_col).alias("grp_bytes"),
    )
    return assigned.join(stats, "grp").select(
        path_col, bytes_col, "grp", "grp_files", "grp_bytes"
    )


def sql_compaction_plan(
    manifest_sql: str,
    target_bytes: int,
    path_col: str = "path",
    bytes_col: str = "bytes",
) -> str:
    """DuckDB twin of compaction_plan over ``manifest_sql`` (a query
    producing (path, bytes)) — plain window cumsum (the oracle needn't
    be scalable), identical exclusive-prefix DIV binning."""
    return f"""
WITH m AS ({manifest_sql}),
c AS (
  SELECT {path_col}, {bytes_col},
         COALESCE(sum({bytes_col}) OVER (
           ORDER BY {path_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS prefix
  FROM m
),
a AS (
  SELECT {path_col}, {bytes_col},
         (prefix // {int(target_bytes)})::BIGINT AS grp
  FROM c
)
SELECT a.{path_col}, a.{bytes_col}, a.grp, s.grp_files, s.grp_bytes
FROM a JOIN (
  SELECT grp, count(*) AS grp_files, sum({bytes_col})::BIGINT AS grp_bytes
  FROM a GROUP BY grp
) s USING (grp)
"""
