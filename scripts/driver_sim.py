"""Simulate the round driver's correctness gate locally.

Runs registry entries IN ORDER (the driver caps the run at ~50 entries, so
order is load-bearing), each at sf0.01 through a *vanilla* SparkSession,
compares against the DuckDB oracle with sorted-column canonicalization, and
prints per-entry wall time so slow entries surface before the real run.

Usage:
    python scripts/driver_sim.py [--sf /root/testdata/sf0.01] [--limit 50]
                                 [--only name1,name2] [--start-at name]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import duckdb


def canon_pdf(pdf):
    """Mimic the REAL driver compare: pandas frame, columns sorted by
    name, rows sorted with DataFrame.sort_values (which RAISES on
    list/dict cells — a query whose output has an array column fails at
    the gate even when values agree), floats rounded to 6dp, then a cell
    grid. Dtype matters: DuckDB HUGEINT arrives as float64, so an
    integer answer summed in DuckDB hashes as 1.0 vs Spark's 1."""
    import pandas as pd  # noqa: F401 - dtype fidelity is the point

    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    cells = []
    for row in pdf.itertuples(index=False):
        out = []
        for v in row:
            if isinstance(v, float):
                out.append("NaN" if math.isnan(v) else f"{round(v, 6)!r}")
            elif hasattr(v, "isoformat"):
                out.append(v.isoformat())
            elif isinstance(v, (bytes, bytearray)):
                out.append(bytes(v).hex())
            else:
                out.append(repr(v))
        cells.append(tuple(out))
    return cells


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--only", default=None)
    ap.add_argument("--start-at", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hash_db_spark.catalog import TABLES
    from hash_db_spark.queries import all_queries

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    registry = all_queries()
    names = list(registry)
    if args.start_at:
        names = names[names.index(args.start_at):]
    if args.only:
        keep = set(args.only.split(","))
        names = [n for n in names if n in keep]
    if args.limit:
        names = names[: args.limit]

    failures, t_total = [], time.time()
    for i, name in enumerate(names):
        q = registry[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, args.sf)
            spdf = sdf.toPandas()
            if q.oracle is None:
                status = f"rows-only rows={len(spdf)}"
            else:
                dpdf = con.execute(q.oracle).df()
                if sorted(spdf.columns) != sorted(dpdf.columns):
                    raise AssertionError(
                        f"cols spark={list(spdf.columns)} "
                        f"duck={list(dpdf.columns)}"
                    )
                if len(spdf) != len(dpdf):
                    raise AssertionError(
                        f"rows spark={len(spdf)} duck={len(dpdf)}"
                    )
                cs, cd = canon_pdf(spdf), canon_pdf(dpdf)
                bad = [j for j, (a, b) in enumerate(zip(cs, cd)) if a != b]
                if bad:
                    raise AssertionError(
                        f"{len(bad)} mismatched rows; first spark="
                        f"{cs[bad[0]]} duck={cd[bad[0]]}"
                    )
                status = f"match rows={len(spdf)}"
        except Exception as exc:  # noqa: BLE001 - report and continue
            status = f"FAIL {type(exc).__name__}: {exc}"
            failures.append(name)
        dt = time.time() - t0
        flag = " <-- SLOW" if dt > 5 else ""
        print(f"[{i + 1:3d}/{len(names)}] {name:28s} {dt:6.2f}s {status}{flag}",
              flush=True)

    print(f"\ntotal {time.time() - t_total:.1f}s  failures={failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
