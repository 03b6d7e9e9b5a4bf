#!/usr/bin/env python3
"""Per-query profiler for the optimization rounds (guide §1).

Times each named registry query ALONE on a warm session via the noop sink
(median of --passes), and optionally dumps `.explain("formatted")` to
--explain-dir/<name>_<tag>.txt so plan claims are reviewable offline.

Usage:
  PYTHONPATH=/root/repo python scripts/profile_queries.py \
      --names doc_lang_segments,ewma_alerts --passes 3 \
      --explain-dir plans/r11 --tag before

Methodology matches bench.py (same env knobs, same sink, same warmup) so
numbers are comparable; the difference is isolation — each query timed on
an otherwise idle session, which the verify protocol prefers before
believing any in-suite regression.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hash_db_spark.queries import all_queries
from hash_db_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True, help="comma-separated query names")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    names = [n.strip() for n in args.names.split(",") if n.strip()]
    registry = all_queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="hash_db_spark-profile")
    # Same warmup as bench.py: pay scheduler/codegen/Arrow-pool init once.
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(1 << 10).repartition(8).mapInPandas(
        lambda batches: batches, "id long"
    ).write.format("noop").mode("overwrite").save()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = registry[name].fn
        build_ts, exec_ts = [], []
        for p in range(max(1, args.passes)):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            spark.sparkContext.setJobDescription(f"profile:{name}#{p}")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(None)
            build_ts.append(t1 - t0)
            exec_ts.append(t2 - t1)
        out[name] = {
            "build": round(statistics.median(build_ts), 4),
            "exec": round(statistics.median(exec_ts), 4),
        }
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = registry[name].fn(spark, SF_DIR)
            path = os.path.join(args.explain_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
