"""Scale patterns: cross-restart job cache, bucketed shuffle-free joins,
salted skew joins."""

import pytest
from pyspark.sql import functions as F

from kiara_spark import KiaraContext
from kiara_spark.operators.joins import salted_join
from kiara_spark.operators.tables import store_bucketed


def test_job_cache_across_restart(spark, tmp_path):
    """Cross-restart memoization needs the data_hash strategy: a fresh
    DataFrame registration gets a fresh value id, but its CONTENT hash is
    stable, so hash(manifest, input content hashes) matches the persisted
    job record and the stored outputs load without executing."""
    base = str(tmp_path / "ctx")
    ctx1 = KiaraContext(spark=spark, base_path=base, cache_strategy="data_hash")
    out1 = ctx1.run_job("table.query.sql", {
        "table": spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
        "query": "select o_orderpriority, count(*) n from data group by 1",
    }, save="prio_counts")

    ctx2 = KiaraContext(spark=spark, base_path=base, cache_strategy="data_hash")
    out2 = ctx2.run_job("table.query.sql", {
        "table": spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
        "query": "select o_orderpriority, count(*) n from data group by 1",
    })
    rec = ctx2.job_registry.history[-1]
    assert rec.cache_hit, "expected cross-restart cache hit from the job store"
    assert sorted(map(tuple, out2["table"].data.collect())) == \
           sorted(map(tuple, out1["table"].data.collect()))


def test_job_cache_miss_on_different_inputs(spark, tmp_path):
    base = str(tmp_path / "ctx")
    ctx1 = KiaraContext(spark=spark, base_path=base, cache_strategy="data_hash")
    ctx1.run_job("table.query.sql", {
        "table": spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
        "query": "select count(*) n from data",
    }, save="x")
    ctx2 = KiaraContext(spark=spark, base_path=base, cache_strategy="data_hash")
    ctx2.run_job("table.query.sql", {
        "table": spark.read.parquet("/root/testdata/sf0.001/orders.parquet"),
        "query": "select count(*) + 1 n from data",  # different manifest
    })
    assert not ctx2.job_registry.history[-1].cache_hit


def test_bucketed_join_no_shuffle(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    bl = store_bucketed(li.select("l_orderkey", "l_quantity"),
                        "bkt_lineitem", ["l_orderkey"], 8)
    bo = store_bucketed(orders.select("o_orderkey", "o_totalprice"),
                        "bkt_orders", ["o_orderkey"], 8)
    # fixtures are broadcast-sized, which would bypass bucketing entirely —
    # force the shuffle-join path a 100 TB large-x-large join would take
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        joined.count()  # finalize AQE plan
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        # co-located buckets: no shuffle exchange in the executed plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == li.join(
            orders, li.l_orderkey == orders.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_matches_plain_join(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
        .select("l_orderkey", "l_quantity")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet") \
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    plain = li.join(orders, on="l_orderkey").groupBy().agg(
        F.count(F.lit(1)), F.sum("l_quantity"), F.sum("o_totalprice")).collect()
    salted = salted_join(li, orders, on="l_orderkey", salt=8).groupBy().agg(
        F.count(F.lit(1)), F.sum("l_quantity"), F.sum("o_totalprice")).collect()
    assert plain == salted


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], "k int, v string")
    right = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, w double")
    out = salted_join(left, right, on="k", how="left", salt=4).collect()
    assert len(out) == 3
    assert {r["k"]: r["w"] for r in out}[99] is None


def test_salted_join_rejects_right_outer(spark):
    df = spark.createDataFrame([(1,)], "k int")
    with pytest.raises(ValueError, match="inner\\|left"):
        salted_join(df, df, on="k", how="right")


def test_partition_pruned_read(spark, tmp_path):
    """Hive-partitioned write -> filtered read scans ONLY matching partitions
    (the primary selective-scan lever at warehouse scale)."""
    from kiara_spark.operators import tables as T

    df = spark.createDataFrame(
        [(i, "F" if i % 3 == 0 else ("O" if i % 3 == 1 else "P"), float(i))
         for i in range(300)],
        "k bigint, status string, v double")
    path = str(tmp_path / "orders_part")
    T.export_table(df, path, partition_by=["status"])

    back = spark.read.parquet(path).filter("status = 'F'")
    assert back.count() == 100
    optimized = back._jdf.queryExecution().optimizedPlan().toString()
    executed = back._jdf.queryExecution().executedPlan().toString()
    # pruning happened at planning: the status predicate is a partition
    # filter on the scan, not a post-scan Filter over all partitions
    assert "PartitionFilters" in executed or "status" not in optimized.split("Filter")[0]
    scan_line = [l for l in executed.splitlines() if "FileScan" in l or "Scan parquet" in l]
    assert scan_line, executed


def test_approx_sketches_within_bounds(spark, tables, ctx):
    """approx_count_distinct (HLL++) and approx_percentile stay within their
    documented error vs exact — the constant-memory path for 100 TB cardinality
    and quantile estimation (exact variants shuffle full key sets)."""
    from pyspark.sql import functions as F

    orders = ctx.get_value("orders").data
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact_cd"),
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_cd"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("approx_p50"),
    ).collect()[0]
    assert abs(row["approx_cd"] - row["exact_cd"]) <= 0.05 * row["exact_cd"]
    assert abs(row["approx_p50"] - row["exact_p50"]) <= 0.02 * abs(row["exact_p50"])


def test_repartition_modes_and_plan(spark):
    from kiara_spark.operators import tables as T

    df = spark.createDataFrame([(i, i % 7) for i in range(1000)], "k bigint, g bigint")
    assert T.repartition_table(df, 8).rdd.getNumPartitions() == 8
    by = T.repartition_table(df, 8, by=["g"])
    assert by.rdd.getNumPartitions() == 8
    # same key lands in same partition under hash partitioning
    parts = by.selectExpr("g", "spark_partition_id() p").distinct() \
        .groupBy("g").count().filter("count > 1").count()
    assert parts == 0
    rng = T.repartition_table(df, 4, range_by=["k"])
    plan = rng._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    assert T.coalesce_table(T.repartition_table(df, 8), 2).rdd.getNumPartitions() == 2


def test_compact_parquet_dir(spark, tmp_path):
    from kiara_spark.operators import tables as T

    path = str(tmp_path / "frag")
    df = spark.createDataFrame([(i,) for i in range(5000)], "k bigint")
    # simulate a streaming sink's fragmentation: many small appends
    for s in range(5):
        df.filter((F.col("k") % 5) == s).repartition(8).write.mode("append").parquet(path)
    details = T.compact_parquet_dir(spark, path, target_files=4)
    assert details["files_before"] >= 40 and details["files_after"] == 4
    assert spark.read.parquet(path).count() == 5000
    assert spark.read.parquet(path).agg(F.sum("k")).collect()[0][0] == 5000 * 4999 // 2


def test_dynamic_partition_pruning(spark, tmp_path):
    """Join-driven pruning: a partitioned fact joined to a FILTERED dim
    scans only the fact partitions the dim filter selects — the runtime
    twin of static partition pruning, and the key scan lever for star
    joins over a partitioned 100 TB fact table."""
    from pyspark.sql import functions as F
    from kiara_spark.operators import tables as T

    fact = spark.range(3000).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("pt"),
        (F.col("id") * 2.0).alias("v"))
    path = str(tmp_path / "fact_part")
    T.export_table(fact, path, partition_by=["pt"])
    dim = spark.createDataFrame(
        [(i, "keep" if i < 2 else "drop") for i in range(10)], "pt long, tag string")

    joined = (spark.read.parquet(path)
              .join(dim.filter("tag = 'keep'"), "pt"))
    assert joined.count() == 600
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "DynamicPruning" in plan, plan[:2000]


def test_observe_metrics_no_second_scan(spark):
    """df.observe: metrics computed DURING the action, no extra job."""
    from pyspark.sql import functions as F
    from kiara_spark.operators.tables import observe_metrics

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "k int, v double")
    observed, obs = observe_metrics(df, {
        "n_rows": F.count(F.lit(1)),
        "n_null_v": F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)),
        "sum_v": F.sum("v"),
    })
    assert observed.count() == 3  # the one and only action
    got = obs.get
    assert got["n_rows"] == 3 and got["n_null_v"] == 1 and got["sum_v"] == 40.0


def test_runtime_bloom_filter_join_pruning(spark):
    """The session enables runtime bloom-filter join pruning: a selective
    dim-side filter becomes a might_contain() predicate on the fact scan.
    The default application-side threshold (10 GB scanned) is deliberately
    above local fixture sizes — lower it here to prove the machinery fires;
    at 100 TB it engages untouched."""
    import pyspark.sql.functions as F

    assert spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    old = {
        "spark.sql.autoBroadcastJoinThreshold":
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold":
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter."
                           "applicationSideScanSizeThreshold"),
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter."
                       "applicationSideScanSizeThreshold", "1KB")
        li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet") \
            .filter("o_orderpriority = '1-URGENT'")
        plan = (li.join(o, li.l_orderkey == o.o_orderkey)
                .agg(F.count(F.lit(1)))
                ._jdf.queryExecution().optimizedPlan().toString())
        assert "might_contain" in plan or "bloom_filter_agg" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_zorder_key_interleave_and_locality(spark, tmp_path):
    from pyspark.sql import functions as F

    from kiara_spark.operators.tables import zorder_key, zorder_write

    # exact interleave on known bit patterns: with x=5 (101), y=3 (011) at
    # 3 bits over ranges [0,7] the Morton code is y2x2 y1x1 y0x0 = 011011
    df = spark.createDataFrame(
        [(0, 0.0, 0.0), (1, 5.0, 3.0), (2, 7.0, 7.0)], "id long, x double, y double")
    keyed = {r["id"]: r["z_key"]
             for r in zorder_key(df, ["x", "y"], bits=3).collect()}
    assert keyed[0] == 0
    assert keyed[2] == 63          # all 6 bits set
    assert keyed[1] == 0b011011    # x=101 at even bits, y=011 at odd bits

    # clustered write: each output file's bounding box covers a small slice
    # of BOTH dimensions, vs. nearly the full span under the natural layout
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    path = str(tmp_path / "zorders")
    zorder_write(orders, path, ["o_custkey", "o_totalprice"], num_partitions=8)
    per_file = (spark.read.parquet(path)
                .withColumn("f", F.input_file_name())
                .groupBy("f")
                .agg((F.max("o_custkey") - F.min("o_custkey")).alias("ck_span"),
                     (F.max("o_totalprice") - F.min("o_totalprice")).alias("tp_span"),
                     F.count(F.lit(1)).alias("n"))
                .collect())
    assert len(per_file) >= 4
    full_ck = orders.agg(F.max("o_custkey") - F.min("o_custkey")).first()[0]
    # avg per-file custkey span must be well under the full span (the
    # single-column-sort layout would give ~full span on the second column)
    avg_ck = sum(r["ck_span"] for r in per_file) / len(per_file)
    assert avg_ck < 0.7 * full_ck, (avg_ck, full_ck)
    # content preserved
    assert spark.read.parquet(path).count() == orders.count()


def test_aqe_coalesces_shuffle_partitions(spark):
    """AQE is on and actually re-plans at runtime: a small aggregate
    declared with 4 shuffle partitions executes with AQEShuffleRead
    (coalesced reads), the runtime lever that right-sizes partitions at
    100 TB without manual tuning."""
    from pyspark.sql import functions as F

    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    df = (spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
          .groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n")))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in plan or "AdaptiveSparkPlan" in plan


def test_dynamic_partition_pruning_in_plan(spark, tmp_path):
    """A selective dim filter must prune fact PARTITIONS at runtime (DPP):
    the fact side's scan carries a dynamicpruning subquery on the partition
    column instead of reading every partition."""
    fact_path = str(tmp_path / "fact")
    (spark.range(0, 2000)
     .withColumn("part_key", F.col("id") % 20)
     .withColumn("v", F.col("id") * 3)
     .write.partitionBy("part_key").parquet(fact_path))
    fact = spark.read.parquet(fact_path)
    dim = spark.range(0, 20).select(
        F.col("id").alias("dim_key"),
        (F.col("id") % 4).alias("dim_cat"))
    joined = fact.join(dim, fact.part_key == dim.dim_key).filter(
        F.col("dim_cat") == 1)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # and the result is correct: 5 of 20 partitions survive
    assert joined.count() == 500


def test_join_strategy_hints_honored(spark):
    """Join-strategy hints are the manual override when stats mislead the
    planner at scale: each hint must surface as the corresponding physical
    join, and an explicit broadcast of a 'large' side must beat the
    sort-merge default."""
    a = spark.range(0, 10000).select(F.col("id").alias("k"), F.col("id").alias("va"))
    b = spark.range(0, 10000).select(F.col("id").alias("k"), F.col("id").alias("vb"))

    merge_plan = a.join(b.hint("merge"), "k") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in merge_plan

    shuffle_hash_plan = a.join(b.hint("shuffle_hash"), "k") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in shuffle_hash_plan

    bcast_plan = a.join(F.broadcast(b), "k") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in bcast_plan


def test_aqe_splits_skewed_join_partition(spark):
    """The hot-key insurance policy at 100 TB: AQE must detect a skewed
    shuffle partition at runtime and split it (OptimizeSkewedJoin), without
    any manual salting.  Thresholds are lowered so the fixture-sized hot
    key trips the optimizer; production uses the defaults."""
    old = {k: spark.conf.get(k, None) for k in (
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.autoBroadcastJoinThreshold",
    )}
    try:
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # one hot key (90% of rows) + a long tail
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 97)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"))
        right = spark.range(0, 97).select(F.col("id").alias("k"),
                                          F.col("id").alias("rv"))
        joined = left.join(right, "k")
        # execute THIS DataFrame's own QueryExecution (count() would build a
        # separate plan and leave joined's adaptive plan unfinalized)
        assert len(joined.collect()) == 200_000
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
