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


def canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_cell(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


def canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(canon_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


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
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if q.oracle is None:
                status = f"rows-only rows={len(srows)}"
            else:
                res = con.execute(q.oracle)
                dcols = [d[0] for d in res.description]
                drows = res.fetchall()
                if sorted(scols) != sorted(dcols):
                    raise AssertionError(f"cols spark={scols} duck={dcols}")
                if len(srows) != len(drows):
                    raise AssertionError(
                        f"rows spark={len(srows)} duck={len(drows)}"
                    )
                cs, cd = canon(srows, scols), canon(drows, dcols)
                bad = [j for j, (a, b) in enumerate(zip(cs, cd)) if a != b]
                if bad:
                    raise AssertionError(
                        f"{len(bad)} mismatched rows; first spark="
                        f"{cs[bad[0]]} duck={cd[bad[0]]}"
                    )
                status = f"match rows={len(srows)}"
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
