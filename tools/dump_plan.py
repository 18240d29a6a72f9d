#!/usr/bin/env python3
"""Dump .explain('formatted') for named queries to plans/r12/<q>_<tag>.txt.

Usage: python tools/dump_plan.py <tag> query [query...]
(tag is e.g. 'before' or 'after'; sf dir from $SPARK_GRAFT_SF_DIR or sf0.1)
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from kiara_spark.queries import QUERIES
    from kiara_spark.session import build_spark

    spark = build_spark(app_name="kiara-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = REPO / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote plans/r12/{name}_{tag}.txt ({len(plan)} chars)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
