"""SparkSession factory with scale-appropriate defaults.

The reference executes everything in a single-threaded Python process
(``/root/reference/src/kiara/processing/synchronous.py:24-43``); here the
execution substrate is Spark.  These defaults are chosen for correctness on
``local[N]`` while remaining the right knobs for a large cluster:

- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
- UTC session timezone (deterministic timestamp semantics vs external oracles)
- Arrow enabled for any pandas interchange (vectorized Python boundary)
- shuffle partitions sized via env for the local harness; on a real cluster
  AQE coalescing makes the initial number far less sensitive.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def build_spark(
    app_name: str = "kiara-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with the engine's defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # tz-less parquet timestamps -> TIMESTAMP (LTZ): event-time ops
        # (watermark, unix_micros) require it; UTC session makes it lossless
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # runtime bloom-filter join pruning: a selective dim-side filter
        # becomes a bloom filter applied to the fact scan — at 100 TB this
        # skips whole row groups before the shuffle
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # WITH RECURSIVE working-set cap: the 1M default trips a BOM-depth
        # rollup at ~100k base rows; depth stays O(log N), rows O(N·depth)
        .config("spark.sql.cteRecursionRowLimit", str(2_000_000_000))
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE",
                               "/tmp/kiara_spark_sql_warehouse"))
    )
    # transformWithState requires the RocksDB state store; opt in via env on
    # clusters that use the arbitrary-state operators (the HDFS-backed
    # default store stays for everything else)
    if os.environ.get("KIARA_SPARK_ROCKSDB_STATE") == "1":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def configure_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to a session we didn't build
    (e.g. the driver harness hands us one)."""
    for k, v in {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.cteRecursionRowLimit": str(2_000_000_000),
    }.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # statically-configured entries can't be changed; fine
    return spark
