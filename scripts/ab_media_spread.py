#!/usr/bin/env python3
"""Interleaved same-session A/B for the media-dedup cluster (VERDICT r11 #1).

The six hamming-band media queries regressed ~2x in round 11 in both the
driver's and the builder's suites; the round-11 adjudication ("ambient")
was rejected because the queries' input path DID change that round
(`spread_ids`, codecs.py). This script isolates the spread_ids effect
exactly: variant A is HEAD, variant B monkeypatches spread_ids to the
pre-r11 identity projection (`df.select(id_col)`, no repartition), and
both variants run interleaved in ONE session so JVM/GC/ambient state is
shared. Medians per variant decide: if A ~= B the regression is ambient;
if A >> B the spread (or the partition layout it leaves behind) is the
cause.

Usage: PYTHONPATH=/root/repo python scripts/ab_media_spread.py [--rounds 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "dedup_image_phash",
    "dedup_audio_pairs",
    "dedup_video_frames",
    "dedup_image_incremental",
    "dedup_audio_incremental",
    "dedup_image_in_video",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--variants", default="spread,nospread",
                    help="comma list of: spread (HEAD), nospread "
                    "(identity, pre-r11), coalesce (spread then coalesce "
                    "the checkpointed frame is NOT reachable here; this "
                    "variant instead caps the spread fan-out at 4)")
    args = ap.parse_args()

    from hash_db_spark.operators import codecs, multimodal
    from hash_db_spark.queries import all_queries
    from hash_db_spark.session import get_spark

    real_spread = codecs.spread_ids

    def identity_spread(df, id_col):
        return df.select(id_col)

    def capped_spread(df, id_col):
        out = real_spread(df, id_col)
        # same exchange, fan-out capped at 4 — tests whether the cost is
        # the decode parallelism or the partition count left behind
        sc = df.sparkSession.sparkContext
        n = max(1, min(4, sc.defaultParallelism))
        import pyspark.sql.functions as F
        return df.select(id_col).repartition(n, F.col(id_col))

    impls = {
        "spread": real_spread,
        "nospread": identity_spread,
        "coalesce": capped_spread,
    }

    def set_spread(fn):
        codecs.spread_ids = fn
        multimodal.spread_ids = fn

    spark = get_spark(app_name="ab-media-spread")
    registry = all_queries()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    spark.range(1 << 10).repartition(8).mapInPandas(
        lambda b: b, "id long"
    ).write.format("noop").mode("overwrite").save()

    variants = [v.strip() for v in args.variants.split(",") if v.strip()]
    samples: dict[tuple[str, str], list[float]] = {
        (q, v): [] for q in QUERIES for v in variants
    }
    for rnd in range(args.rounds):
        for q in QUERIES:
            for v in variants:
                set_spread(impls[v])
                spark.catalog.clearCache()  # split_hot_buckets caches per run
                fn = registry[q].fn
                spark.sparkContext.setJobDescription(f"{q}:{v}#{rnd}")
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                samples[(q, v)].append(time.perf_counter() - t0)
                spark.sparkContext.setJobDescription(None)
    set_spread(real_spread)

    out = {}
    for q in QUERIES:
        out[q] = {
            v: {
                "median": round(statistics.median(samples[(q, v)]), 4),
                "all": [round(x, 4) for x in samples[(q, v)]],
            }
            for v in variants
        }
        print(json.dumps({q: {v: out[q][v]["median"] for v in variants}}),
              flush=True)
    print(json.dumps({"sf_dir": SF_DIR, "rounds": args.rounds,
                      "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
