"""Relational operator family units (SURVEY §2.3)."""

from pyspark.sql import functions as F

from kiara_spark.operators import tables as T


def test_filter_and_select(ctx, tables):
    out = ctx.run_job("table_filter.rows",
                      {"table": ctx.get_value("customer"), "where": "c_acctbal > 0"})
    df = out["table"].data
    assert df.filter("c_acctbal <= 0").count() == 0
    out2 = ctx.run_job("table_filter.select_columns",
                       {"table": out["table"], "columns": ["c_custkey", "c_name"]})
    assert out2["table"].data.columns == ["c_custkey", "c_name"]


def test_join_types(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    right = spark.createDataFrame([(2, "x"), (3, "y"), (4, "z")], "k int, w string")
    assert T.join_tables(left, right, on="k").count() == 2
    assert T.join_tables(left, right, on="k", how="left").count() == 3
    assert T.join_tables(left, right, on="k", how="full").count() == 4
    assert T.join_tables(left, right, on="k", how="left_semi").count() == 2
    anti = T.join_tables(left, right, on="k", how="left_anti")
    assert [r["k"] for r in anti.collect()] == [1]


def test_broadcast_join_plan(spark, tables, ctx):
    li = ctx.get_value("lineitem").data
    supp = ctx.get_value("supplier").data
    plan = T.join_tables(li, supp, on=F.col("l_suppkey") == F.col("s_suppkey"),
                         broadcast_right=True)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_group_by_aggregate_spec(spark):
    df = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 3.0)], "g string, x double")
    out = T.group_by_aggregate(df, ["g"], [
        {"fn": "sum", "column": "x", "alias": "sx"},
        {"fn": "count", "column": "*", "alias": "n"},
        {"fn": "max", "column": "x", "alias": "mx"},
    ])
    rows = {r["g"]: r for r in out.collect()}
    assert rows["a"]["sx"] == 3.0 and rows["a"]["n"] == 2 and rows["b"]["mx"] == 3.0


def test_rollup_and_cube_row_counts(spark):
    df = spark.createDataFrame([("a", "x", 1), ("a", "y", 1), ("b", "x", 1)],
                               "g1 string, g2 string, x int")
    rollup = T.group_by_aggregate(df, ["g1", "g2"],
                                  [{"fn": "count", "column": "*", "alias": "n"}],
                                  grouping="rollup")
    cube = T.group_by_aggregate(df, ["g1", "g2"],
                                [{"fn": "count", "column": "*", "alias": "n"}],
                                grouping="cube")
    assert rollup.count() == 3 + 2 + 1  # leaves + per-g1 + grand total
    assert cube.count() == 3 + 2 + 2 + 1


def test_window_functions_spec(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 5.0)], "g string, seq int, x double")
    out = T.window_function(df, ["g"], ["seq"], [
        {"fn": "row_number", "alias": "rn"},
        {"fn": "lag", "column": "x", "alias": "prev_x"},
        {"fn": "sum", "column": "x", "frame": "unbounded_preceding", "alias": "run"},
    ])
    rows = {(r["g"], r["seq"]): r for r in out.collect()}
    assert rows[("a", 2)]["rn"] == 2
    assert rows[("a", 2)]["prev_x"] == 10.0
    assert rows[("a", 2)]["run"] == 30.0


def test_set_ops(spark):
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], "k int")
    b = spark.createDataFrame([(2,), (3,), (4,)], "k int")
    assert T.union_tables(a, b).count() == 7
    assert T.union_tables(a, b, distinct=True).count() == 4
    assert sorted(r["k"] for r in T.intersect_tables(a, b).collect()) == [2, 3]
    assert sorted(r["k"] for r in T.except_tables(a, b).collect()) == [1]


def test_sql_operator_with_input_view(ctx, tables):
    out = ctx.run_job("query.table", {
        "table": ctx.get_value("nation"),
        "query": "select count(*) as n from data",
    })
    assert out["table"].data.collect()[0]["n"] == 25


def test_top_k_uses_take_ordered(spark, ctx, tables):
    orders = ctx.get_value("orders").data
    plan = T.top_k(orders, ["o_totalprice"], 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_deterministic_sample(spark):
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    out = T.deterministic_sample(df, "k", 10, 3)
    assert sorted(r["k"] for r in out.collect()) == list(range(3, 100, 10))


def test_export_and_reimport(ctx, tables, tmp_path):
    path = str(tmp_path / "nation_out")
    ctx.run_job("export.table.as.parquet",
                {"table": ctx.get_value("nation"), "path": path})
    back = ctx.run_job("create.table.from.file", {"path": path, "file_format": "parquet"})
    assert back["table"].data.count() == 25


def test_export_json_and_orc_round_trip(ctx, tables, tmp_path):
    for fmt in ("json", "orc"):
        path = str(tmp_path / f"nation_{fmt}")
        ctx.run_job(f"export.table.as.{fmt}",
                    {"table": ctx.get_value("nation"), "path": path})
        back = ctx.run_job("create.table.from.file",
                           {"path": path, "file_format": fmt})
        assert back["table"].data.count() == 25, fmt


def test_pivot_unpivot_roundtrip(spark):
    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0), ("b", "x", 4.0)],
        "g string, p string, v double")
    wide = T.pivot_table(df, ["g"], "p", ["x", "y"],
                         [{"fn": "dsum", "column": "v", "alias": "sv"}],
                         column_names=["px", "py"])
    rows = {r["g"]: r for r in wide.collect()}
    assert rows["a"]["px"] == 1.0 and rows["a"]["py"] == 2.0
    assert rows["b"]["px"] == 7.0 and rows["b"]["py"] is None
    long = T.unpivot_table(wide, ["g"], ["px", "py"], "p", "sv")
    assert long.count() == 4
    back = {(r["g"], r["p"]): r["sv"] for r in long.collect()}
    assert back[("a", "px")] == 1.0 and back[("b", "py")] is None


def test_pivot_module_op(ctx, tables):
    out = ctx.run_job("table.pivot", {
        "table": ctx.get_value("orders"), "keys": ["o_orderstatus"],
        "pivot_col": "o_orderpriority", "pivot_values": ["1-URGENT", "5-LOW"],
        "aggregations": [{"fn": "count", "column": "*", "alias": "n"}]})
    df = out["table"].data
    assert set(df.columns) == {"o_orderstatus", "1-URGENT", "5-LOW"}
    assert df.count() == df.select("o_orderstatus").distinct().count()


def test_explode_column_positions(spark):
    df = spark.createDataFrame([(1, ["a", "b"]), (2, ["c"])], "k int, xs array<string>")
    flat = T.explode_column(df, "xs", "x", with_position=True)
    assert {(r["k"], r["pos"], r["x"]) for r in flat.collect()} == {
        (1, 0, "a"), (1, 1, "b"), (2, 0, "c")}
    # generator stays map-only: no exchange in the plan
    plan = flat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_fractions(spark):
    df = spark.createDataFrame([(i, "F" if i % 2 else "O") for i in range(1000)],
                               "k bigint, s string")
    out = T.stratified_sample(df, "s", "k", {"F": 0.2, "O": 0.6}, modulus=10)
    counts = {r["s"]: r["n"] for r in
              out.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["F"] == 100 and counts["O"] == 300  # exact: k%10 stratified
    # deterministic: identical result on re-run
    again = T.stratified_sample(df, "s", "k", {"F": 0.2, "O": 0.6}, modulus=10)
    assert sorted(r["k"] for r in out.collect()) == sorted(r["k"] for r in again.collect())


def test_table_load_module_config(ctx, tables):
    """The reference's module_configs/table_load.json surface: a configured
    table.load module resolves a stored table by alias."""
    v = ctx.get_value("orders")
    ctx.store_value(v, alias="stored_orders")
    out = ctx.run_job("table.load", {"alias": "stored_orders"})
    assert out["table"].data.count() == v.data.count()
    # config-form too (module_type + operation_config, like the reference
    # module_configs/table_load.json surface)
    out2 = ctx.run_job("table.load", {}, operation_config={"alias": "stored_orders"})
    assert out2["table"].data.columns == out["table"].data.columns


def test_sample_per_group_deterministic(spark):
    from kiara_spark.operators.tables import sample_per_group

    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(60)], "id long, g string")
    s1 = {(r["g"], r["id"]) for r in sample_per_group(df, ["g"], 4, "id").collect()}
    s2 = {(r["g"], r["id"]) for r in
          sample_per_group(df.repartition(7), ["g"], 4, "id").collect()}
    assert s1 == s2  # partition-invariant
    from collections import Counter
    per_group = Counter(g for g, _ in s1)
    assert per_group == {"g0": 4, "g1": 4, "g2": 4}
    # n larger than the group keeps everything
    tiny = spark.createDataFrame([(1, "x"), (2, "x")], "id long, g string")
    assert sample_per_group(tiny, ["g"], 10, "id").count() == 2


def test_approx_percentile_tracks_exact(spark):
    """approx_percentile stays within ~2% relative error of the exact
    percentile on the fixture distribution (default accuracy 10000)."""
    import pyspark.sql.functions as F

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    row = o.agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(o_totalprice, 0.5)").alias("approx")).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.02 * abs(row["exact"])


def test_sql_udf_library_inlines_no_python(spark):
    """SQL UDFs resolve to inline expressions: the executed plan contains
    no Python evaluation nodes (BatchEvalPython/ArrowEvalPython) — the
    library is a zero-cost abstraction."""
    from kiara_spark.functions import register_sql_functions

    register_sql_functions(spark)
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df.createOrReplaceTempView("sqludf_plan_v")
    out = spark.sql(
        "SELECT doc_id, kiara_ntokens(text) n, kiara_hash32(lang) h "
        "FROM sqludf_plan_v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert out.count() == df.count()
    # registration is idempotent (CREATE OR REPLACE)
    register_sql_functions(spark)


def test_vacuum_snapshots_retention(spark, ctx, tmp_path):
    import os
    import time

    from kiara_spark.operators.tables import vacuum_snapshots

    base = tmp_path / "snaps"
    base.mkdir()
    for i in range(5):
        d = base / f"v{i}"
        d.mkdir()
        (d / "part.txt").write_text(str(i))
        os.utime(d, (time.time() + i, time.time() + i))
    report = vacuum_snapshots(str(base), keep_latest=2)
    assert sorted(report["kept"]) == ["v3", "v4"]
    assert sorted(report["removed"]) == ["v0", "v1", "v2"]
    assert sorted(p.name for p in base.iterdir()) == ["v3", "v4"]
    assert "table.vacuum.snapshots" in ctx.operation_registry.operation_ids


def test_file_stats_per_file_minmax(spark, tmp_path):
    from kiara_spark.operators.tables import file_stats

    # two files with disjoint key ranges (clustered layout)
    p = str(tmp_path / "t")
    df = spark.range(0, 100).withColumn("v", F.col("id") * 2)
    df.where("id < 50").coalesce(1).write.parquet(p)
    df.where("id >= 50").coalesce(1).write.mode("append").parquet(p)
    out = file_stats(spark, p, ["id", "v"]).collect()
    assert len(out) == 2
    ranges = sorted((r.min_id, r.max_id, r.n_rows) for r in out)
    assert ranges == [(0, 49, 50), (50, 99, 50)]
    for r in out:
        assert r.file_bytes > 0 and r.file_name.endswith(".parquet")
        assert r.min_v == 2 * r.min_id and r.max_v == 2 * r.max_id


def test_file_stats_op_registered(ctx):
    assert ctx.operation_registry.resolve("table.file_stats") is not None


def test_export_sharded_deterministic_and_complete(spark, tmp_path):
    import json
    import os

    from kiara_spark.operators.tables import export_sharded

    df = spark.range(0, 500).withColumn("v", F.col("id") * 7)
    p1 = str(tmp_path / "shards1")
    m1 = export_sharded(df, p1, n_shards=4, id_col="id")
    # every row lands in exactly one shard; totals add up
    assert sum(s["n_rows"] for s in m1["shards"].values()) == 500
    dirs = sorted(d for d in os.listdir(p1) if d.startswith("_shard="))
    assert dirs == [f"_shard={i}" for i in sorted(m1["shards"])]
    # shard membership is a pure function of the id: a differently
    # partitioned re-export produces the identical manifest
    m2 = export_sharded(df.repartition(13), str(tmp_path / "shards2"),
                        n_shards=4, id_col="id")
    assert m1["shards"] == m2["shards"]
    # manifest on disk matches the returned one
    disk = json.load(open(os.path.join(p1, "_shard_manifest.json")))
    assert {int(k): v for k, v in disk["shards"].items()} == m1["shards"]
    # read-back preserves every row
    back = spark.read.parquet(p1)
    assert back.count() == 500
    assert back.select(F.sum("v")).collect()[0][0] == df.select(F.sum("v")).collect()[0][0]


def test_export_sharded_op_registered(ctx):
    assert ctx.operation_registry.resolve("export.table.sharded") is not None


def test_time_travel_snapshot_selection(spark, tmp_path):
    from kiara_spark.operators.tables import time_travel_snapshot

    root = str(tmp_path / "snaps")
    for name, hi in [("2024-01-01T00", 10), ("2024-02-01T00", 20),
                     ("2024-03-01T00", 30)]:
        spark.range(0, hi).write.parquet(f"{root}/{name}")
    # as_of between snapshots picks the newest one at-or-before
    assert time_travel_snapshot(spark, root, as_of="2024-02-15").count() == 20
    # exact boundary is inclusive
    assert time_travel_snapshot(spark, root, as_of="2024-01-01T00").count() == 10
    # no argument = newest; explicit name = that snapshot
    assert time_travel_snapshot(spark, root).count() == 30
    assert time_travel_snapshot(
        spark, root, snapshot="2024-02-01T00").count() == 20
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        time_travel_snapshot(spark, root, as_of="2023-12-31")


def test_time_travel_op_registered(ctx):
    assert ctx.operation_registry.resolve("table.time_travel") is not None


def test_backfill_by_partition_idempotent(spark, tmp_path):
    import os

    from kiara_spark.operators.tables import backfill_by_partition

    out = str(tmp_path / "bf")
    df = spark.range(0, 90).withColumn("day", (F.col("id") % 3).cast("string"))
    r1 = backfill_by_partition(df, out, "day")
    assert sorted(r1["written"]) == ["0", "1", "2"] and r1["skipped"] == []
    # re-run: everything skipped, nothing rewritten
    mtimes = {d: os.path.getmtime(os.path.join(out, d)) for d in os.listdir(out)}
    r2 = backfill_by_partition(df, out, "day")
    assert r2["written"] == [] and sorted(r2["skipped"]) == ["0", "1", "2"]
    assert mtimes == {d: os.path.getmtime(os.path.join(out, d))
                      for d in os.listdir(out)}
    # drop one partition: only it is restored
    import shutil
    shutil.rmtree(os.path.join(out, "day=1"))
    r3 = backfill_by_partition(df, out, "day")
    assert r3["written"] == ["1"]
    # forced restatement rewrites exactly the named partition
    r4 = backfill_by_partition(df, out, "day", overwrite_partitions=["2"])
    assert r4["written"] == ["2"]
    # content complete after all that
    assert spark.read.parquet(out).count() == 90


def test_backfill_null_partition_excluded_and_reported(spark, tmp_path):
    """r2 ADVICE: NULL partition values used to stringify to 'None', match
    nothing, and be falsely reported as written (with an empty dir)."""
    import os

    from kiara_spark.operators.tables import backfill_by_partition

    out = str(tmp_path / "bfnull")
    df = spark.range(0, 30).withColumn(
        "day", F.when(F.col("id") % 3 == 0, None)
                .otherwise((F.col("id") % 3).cast("string")))
    r = backfill_by_partition(df, out, "day")
    assert sorted(r["written"]) == ["1", "2"]
    assert r["has_null_partition"] is True
    assert not os.path.isdir(os.path.join(out, "day=None"))
    assert spark.read.parquet(out).count() == 20  # null rows excluded
    r2 = backfill_by_partition(df, out, "day")
    assert r2["written"] == [] and sorted(r2["skipped"]) == ["1", "2"]


def test_backfill_op_registered(ctx):
    assert ctx.operation_registry.resolve("table.backfill.by_partition") is not None


def test_add_contiguous_row_ids_matches_global_window(spark):
    from pyspark.sql.window import Window as W

    from kiara_spark.operators.tables import add_contiguous_row_ids

    df = spark.range(0, 1000).select(
        (F.xxhash64("id") % 100000).alias("key"), F.col("id").alias("payload"))
    df = df.dropDuplicates(["key"])  # order column must be unique
    got = {r.key: r.row_id
           for r in add_contiguous_row_ids(df, "key", n_buckets=8).collect()}
    want = {r.key: r.rid - 1 for r in df.withColumn(
        "rid", F.row_number().over(W.orderBy("key"))).collect()}
    assert got == want
    # ids are a contiguous 0..n-1 range
    assert sorted(got.values()) == list(range(len(got)))


def test_add_row_ids_partition_invariant(spark):
    from kiara_spark.operators.tables import add_contiguous_row_ids

    df = spark.range(0, 500).select(F.col("id").alias("k"))
    a = {r.k: r.row_id
         for r in add_contiguous_row_ids(df, "k", n_buckets=4).collect()}
    b = {r.k: r.row_id for r in add_contiguous_row_ids(
        df.repartition(11), "k", n_buckets=4).collect()}
    assert a == b


def test_add_row_ids_op_registered(ctx):
    assert ctx.operation_registry.resolve("table.add_row_ids") is not None


def test_anonymize_join_consistency_and_drop(spark):
    from kiara_spark.operators.tables import anonymize_columns

    a = spark.createDataFrame([(1, "alice", 10.0), (2, "bob", 20.0)],
                              "uid long, name string, v double")
    b = spark.createDataFrame([(1, "x"), (2, "y")], "uid long, tag string")
    aa = anonymize_columns(a, ["uid"], drop_cols=["name"], salt="k")
    bb = anonymize_columns(b, ["uid"], salt="k")
    assert "name" not in aa.columns
    # same salt -> keys still join across tables
    assert aa.join(bb, "uid").count() == 2
    # different salt -> unlinkable
    cc = anonymize_columns(b, ["uid"], salt="other")
    assert aa.join(cc, "uid").count() == 0


def test_plan_stats_no_execution(spark):
    from kiara_spark.operators.tables import plan_stats

    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet") \
        .select("o_orderkey", "o_totalprice")
    s = plan_stats(df)
    assert s["size_in_bytes"] > 0
    assert s["num_output_columns"] == 2


def test_stats_anonymize_ops_registered(ctx):
    for op in ("table.explain.stats", "table.anonymize"):
        assert ctx.operation_registry.resolve(op) is not None


def test_backfill_single_job_for_missing_set(spark, tmp_path):
    """r3 VERDICT item 4: N missing partitions must be ONE write job
    (dynamic partition overwrite), not N serial jobs — job count must not
    scale with the number of missing partitions."""
    from kiara_spark.operators.tables import backfill_by_partition

    def jobs_for(n_parts, name):
        out = str(tmp_path / name)
        df = (spark.range(0, 10 * n_parts)
              .withColumn("day", (F.col("id") % n_parts).cast("string")))
        sc = spark.sparkContext
        sc.setJobGroup(name, name)
        try:
            r = backfill_by_partition(df, out, "day")
        finally:
            sc.setJobGroup(None, None)
        assert len(r["written"]) == n_parts
        assert spark.read.parquet(out).count() == 10 * n_parts
        return len(sc.statusTracker().getJobIdsForGroup(name))

    j2, j12 = jobs_for(2, "bf2"), jobs_for(12, "bf12")
    assert j12 == j2, (j2, j12)  # constant jobs, independent of N


def test_backfill_reports_forced_partition_missing_from_source(spark, tmp_path):
    """r4 review: a forced partition with zero source rows cannot be
    restated by the dynamic write — it must be reported, not silently
    ignored."""
    from kiara_spark.operators.tables import backfill_by_partition

    out = str(tmp_path / "bfm")
    df = spark.range(0, 20).withColumn("day", (F.col("id") % 2).cast("string"))
    r1 = backfill_by_partition(df, out, "day")
    assert r1["missing_in_source"] == []
    r2 = backfill_by_partition(df, out, "day", overwrite_partitions=["9"])
    assert r2["missing_in_source"] == ["9"] and r2["written"] == []


def test_training_shuffle_deterministic_total_order(spark):
    """Global training shuffle: every shard's positions are contiguous
    1..n, the full assignment is a permutation (unique (shard, pos)),
    reruns are byte-identical, and a different salt yields a different
    permutation of the SAME rows."""
    df = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    out = T.training_shuffle(df, n_shards=4).collect()
    assert len(out) == 300
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard_id, []).append(r.shard_pos)
    assert set(by_shard) <= set(range(4))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    again = T.training_shuffle(df, n_shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = T.training_shuffle(df, n_shards=4, salt="epoch1").collect()
    assert {r.doc_id for r in other} == {r.doc_id for r in out}
    assert sorted(map(tuple, other)) != sorted(map(tuple, out))


def test_create_table_from_text_xml_binary(ctx, tmp_path):
    """Round 9: the remaining native Spark sources — text (one row per
    line), Spark 4 native XML (rowTag records), and binaryFile (opaque
    content + file metadata, the media-ingest front door)."""
    p_txt = tmp_path / "lines.txt"
    p_txt.write_text("alpha\nbeta\ngamma\n")
    t = ctx.run_job("create.table.from.file",
                    {"path": str(p_txt)})["table"].data
    assert t.columns == ["value"] and t.count() == 3

    p_xml = tmp_path / "recs.xml"
    p_xml.write_text("<rows><row><id>1</id><name>a</name></row>"
                     "<row><id>2</id><name>b</name></row></rows>")
    x = ctx.run_job("create.table.from.file",
                    {"path": str(p_xml)})["table"].data
    assert {r.id for r in x.collect()} == {1, 2}

    b = ctx.run_job("create.table.from.file",
                    {"path": str(p_txt), "file_format": "binary"}
                    )["table"].data
    row = b.collect()[0]
    assert row.length == 17 and bytes(row.content).startswith(b"alpha")
    assert "modificationTime" in b.columns
