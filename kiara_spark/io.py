"""Table loading helpers for the driver testdata layout.

Handles the one format wrinkle in the fixtures: ``events.parquet`` stores
``ts`` as parquet TIMESTAMP(NANOS), which Spark's vectorized reader rejects.
We flip ``spark.sql.legacy.parquet.nanosAsLong`` (runtime-settable) and
rebuild a microsecond timestamp with integer division — the same ns->us
truncation DuckDB applies, so both engines see identical instants.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division: ns ~1.7e18 exceeds double's 53-bit mantissa, so
        # float division would corrupt microseconds; `div` stays integral and
        # truncates exactly like DuckDB's ns->us conversion.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    out = {}
    for name in names or ALL_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = load_table(spark, sf_dir, name)
    return out
