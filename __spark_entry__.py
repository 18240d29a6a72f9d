"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query through the full engine (KiaraContext ->
operation -> job registry) to exercise the orchestration path; ``queries`` /
``oracle_sql`` expose the whole battery from kiara_spark.queries.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary over sf0.001, executed as an
    engine operation (create context -> register tables -> run_job)."""
    from kiara_spark import KiaraContext
    from kiara_spark.queries import QUERIES

    ctx = KiaraContext(spark=spark)
    ctx.load_tables("/root/testdata/sf0.001")
    return QUERIES["q1_pricing_summary"](ctx.spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kiara_spark.queries import QUERIES
    from kiara_spark.session import configure_existing

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_existing(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from kiara_spark.queries import ORACLE

    return dict(ORACLE)
