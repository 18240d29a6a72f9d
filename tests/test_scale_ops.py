"""Scale operators: bloom-prefilter join, PSI drift report, range checksums."""

import pytest
from pyspark.sql import functions as F

from kiara_spark.operators.joins import bloom_prefilter_join
from kiara_spark.operators.quality import checksum_ranges, drift_psi


@pytest.fixture(scope="module")
def orders_lineitem(spark):
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    return o, li


def test_bloom_exact_equals_semi_join(orders_lineitem):
    o, li = orders_lineitem
    build = o.filter(F.col("o_totalprice") > 200000)
    got = bloom_prefilter_join(li, build, "l_orderkey", "o_orderkey")
    want = li.join(
        build.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
        "l_orderkey", "left_semi")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_bloom_candidates_superset_with_low_fpr(orders_lineitem):
    o, li = orders_lineitem
    build = o.filter(F.col("o_totalprice") > 200000)
    n_true = li.join(
        build.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
        "l_orderkey", "left_semi").count()
    candidates = bloom_prefilter_join(
        li, build, "l_orderkey", "o_orderkey", exact=False)
    n_cand = candidates.count()
    n_all = li.count()
    assert n_cand >= n_true
    # default sizing (16 bits/key, 5 hashes) keeps FPR well under 5%
    assert n_cand - n_true <= max(10, 0.05 * (n_all - n_true))


def test_drift_psi_identical_is_zero(orders_lineitem):
    o, _ = orders_lineitem
    out = drift_psi(o, o, numeric_cols=["o_totalprice"],
                    categorical_cols=["o_orderstatus"])
    assert all(abs(r.psi_term) < 1e-9 for r in out.collect())
    # numeric deciles + categorical values all present
    feats = {r.feature for r in out.collect()}
    assert feats == {"o_totalprice", "o_orderstatus"}


def test_drift_psi_detects_shift(spark):
    ref = spark.range(1000).select((F.col("id") % 10).alias("v"))
    cur = spark.range(1000).select((F.col("id") % 10 + 5).alias("v"))
    out = drift_psi(ref, cur, numeric_cols=["v"], n_bins=5)
    total = sum(r.psi_term for r in out.collect())
    assert total > 0.2  # conventional "significant drift" threshold


def test_drift_psi_handles_new_categories(spark):
    ref = spark.createDataFrame([("a",), ("a",), ("b",)], "c string")
    cur = spark.createDataFrame([("a",), ("z",)], "c string")
    out = {r.bin: r for r in drift_psi(
        ref, cur, categorical_cols=["c"]).collect()}
    assert set(out) == {"a", "b", "z"}
    assert out["z"].ref_share == pytest.approx(1e-6)
    assert out["b"].cur_share == pytest.approx(1e-6)


def test_checksum_partition_invariant(orders_lineitem):
    o, _ = orders_lineitem
    enc = o.select("o_orderkey", "o_custkey", "o_orderstatus")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus"]
    a = {r.bucket: (r.n_rows, r.checksum)
         for r in checksum_ranges(enc, "o_orderkey", cols, 16).collect()}
    b = {r.bucket: (r.n_rows, r.checksum)
         for r in checksum_ranges(
             enc.repartition(7), "o_orderkey", cols, 16).collect()}
    assert a == b and len(a) == 16


def test_checksum_detects_single_row_change(orders_lineitem):
    o, _ = orders_lineitem
    cols = ["o_orderkey", "o_orderstatus"]
    base = o.select("o_orderkey", "o_orderstatus")
    tweaked = base.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == base.agg(
            F.min("o_orderkey")).collect()[0][0], F.lit("X"))
        .otherwise(F.col("o_orderstatus")))
    a = {r.bucket: r.checksum
         for r in checksum_ranges(base, "o_orderkey", cols, 16).collect()}
    b = {r.bucket: r.checksum
         for r in checksum_ranges(tweaked, "o_orderkey", cols, 16).collect()}
    assert sum(1 for k in a if a[k] != b[k]) == 1


def test_scale_ops_registered(ctx):
    for op in ("table.join.bloom_prefilter", "table.drift.psi",
               "table.checksum.ranges"):
        assert ctx.operation_registry.resolve(op) is not None
