"""Mergeable-sketch operators: exact bitmap rollups, HLL/theta bounds.

The load-bearing property is re-aggregatability: partials built at a fine
grain must merge to coarser grains with no rescan — exactly (bitmap) or
within sketch error (HLL/theta)."""

import pytest
from pyspark.sql import functions as F

from kiara_spark.operators import sketches as SK

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "day", F.to_date("ts"))


def test_bitmap_rollup_exact(spark, events):
    _p, fine, coarse = SK.bitmap_distinct_rollup(
        events, ["event_type", "day"], ["event_type"], "user_id")
    exact_fine = {
        (r["event_type"], r["day"]): r["n"]
        for r in events.groupBy("event_type", "day")
        .agg(F.countDistinct("user_id").alias("n")).collect()
    }
    got_fine = {(r["event_type"], r["day"]): r["n_distinct"] for r in fine.collect()}
    assert got_fine == exact_fine

    exact_coarse = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n")).collect()
    }
    got_coarse = {r["event_type"]: r["n_distinct"] for r in coarse.collect()}
    assert got_coarse == exact_coarse


def test_bitmap_partials_merge_across_builds(spark, events):
    """Partials built over disjoint slices OR-merge to the full answer —
    the incremental nightly-build contract."""
    left = events.filter(F.col("event_id") % 2 == 0)
    right = events.filter(F.col("event_id") % 2 == 1)
    p = SK.bitmap_distinct_partials(left, ["event_type"], "user_id").unionByName(
        SK.bitmap_distinct_partials(right, ["event_type"], "user_id"))
    merged = {r["event_type"]: r["n_distinct"]
              for r in SK.bitmap_distinct_counts(p, ["event_type"]).collect()}
    exact = {r["event_type"]: r["n"]
             for r in events.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert merged == exact


def test_hll_rollup_within_tolerance(spark, events):
    partials = SK.hll_distinct_partials(events, ["event_type", "day"], "user_id")
    est = {r["event_type"]: r["n_distinct_est"]
           for r in SK.hll_distinct_rollup(partials, ["event_type"]).collect()}
    exact = {r["event_type"]: r["n"]
             for r in events.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(2, 0.05 * n), (k, est[k], n)


def test_theta_overlap_within_tolerance(spark, events):
    got = SK.theta_overlap_pairs(events, "event_type", "user_id").collect()
    assert len(got) > 0
    users = events.select("event_type", "user_id").distinct()
    a = users.toDF("t_a", "u")
    b = users.toDF("t_b", "u")
    inter = {(r["t_a"], r["t_b"]): r["n"]
             for r in a.join(b, "u").filter(F.col("t_a") < F.col("t_b"))
             .groupBy("t_a", "t_b").agg(F.countDistinct("u").alias("n")).collect()}
    for r in got:
        exact = inter.get((r["group_a"], r["group_b"]), 0)
        assert abs(r["est_intersection"] - exact) <= max(3, 0.1 * exact), (
            r["group_a"], r["group_b"], r["est_intersection"], exact)
        assert r["est_union"] + 1e-9 >= max(r["est_a"], r["est_b"]) * 0.95


def test_sketch_modules_registered(ctx):
    for op in ("table.distinct_rollup.bitmap", "table.distinct_rollup.hll",
               "table.overlap.theta"):
        assert ctx.operation_registry.resolve(op) is not None


def test_cms_never_underestimates_and_bounds_error(spark):
    from pyspark.sql import functions as F

    from kiara_spark.operators.sketches import cms_build, cms_estimate

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .withColumn("key", F.concat_ws("|", F.col("user_id"),
                                       F.col("event_type")))
    sketch = cms_build(ev, "key", width=2048, depth=4)
    true = {r.key: r.n for r in ev.groupBy("key").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    qs = ev.select("key").distinct()
    est = {r.key: r.est for r in cms_estimate(
        sketch, qs, "key", width=2048, depth=4).collect()}
    n_total = sum(true.values())
    for k, t in true.items():
        assert est[k] >= t  # count-min never underestimates
        assert est[k] - t <= max(5, 0.01 * n_total)


def test_cms_partials_merge_by_sum(spark):
    from pyspark.sql import functions as F

    from kiara_spark.operators.sketches import cms_build

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .withColumn("key", F.col("event_type"))
    full = {(r.depth, r.bucket): r.cnt
            for r in cms_build(ev, "key", 256, 3).collect()}
    h1 = cms_build(ev.filter("user_id % 2 = 0"), "key", 256, 3)
    h2 = cms_build(ev.filter("user_id % 2 = 1"), "key", 256, 3)
    merged = {(r.depth, r.bucket): r.cnt for r in
              h1.unionByName(h2).groupBy("depth", "bucket")
              .agg(F.sum("cnt").cast("bigint").alias("cnt")).collect()}
    assert merged == full


def test_cms_op_registered(ctx):
    assert ctx.operation_registry.resolve("table.frequency.cms") is not None
