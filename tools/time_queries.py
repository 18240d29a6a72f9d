#!/usr/bin/env python3
"""Isolated per-query timing for optimization work (guide §1.1/§1.4).

Times each named query with the noop sink (full-plan execution, no row
transfer), one unmeasured warm-up rep plus N timed reps (default 3), and
prints min/median per query.  Isolation from the battery means the number
measures the query's own plan, not storage-memory pressure inherited from
200 earlier queries.

Usage: python tools/time_queries.py [--reps N] [--sf SF_DIR] query [query...]
"""
from __future__ import annotations

import argparse
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from kiara_spark.queries import QUERIES
    from kiara_spark.session import build_spark

    spark = build_spark(app_name="kiara-spark-time")
    spark.sparkContext.setLogLevel("ERROR")
    # session warm-up (parquet reader, shuffle machinery) as in bench.py
    QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001").write.format(
        "noop").mode("overwrite").save()

    for name in args.queries:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, args.sf).write.format("noop").mode("overwrite").save()
        samples = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.monotonic()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            samples.append(time.monotonic() - t0)
        print(f"{name}: median={statistics.median(samples):.3f}s "
              f"min={min(samples):.3f}s samples={[round(s,3) for s in samples]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
