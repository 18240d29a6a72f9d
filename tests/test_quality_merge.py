"""Merge/upsert, data-quality audit, session paths, fuzzy levenshtein.

The reference has no maintenance/validation modules (its module surface ends
at import/export/filter families); these are the additive lakehouse ops.
"""

import pyspark.sql.functions as F
import pytest

from kiara_spark.operators.dedup import fuzzy_levenshtein_pairs
from kiara_spark.operators.quality import (merge_upsert, quality_audit,
                                           referential_orphans)
from kiara_spark.streaming.windows import session_paths


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, v string, x double")
    source = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], "k int, v string, x double")
    got = {r["k"]: (r["v"], r["x"]) for r in merge_upsert(target, source, ["k"]).collect()}
    # matched row replaced, unmatched target kept, new source row inserted
    assert got == {1: ("a", 10.0), 2: ("B", 99.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_multi_key_and_dup_source_keys(spark):
    target = spark.createDataFrame([(1, 1, "t")], "a int, b int, v string")
    # two source rows on the same key: both land (MERGE insert semantics are
    # caller's responsibility to pre-dedup); the target twin is still replaced
    source = spark.createDataFrame([(1, 1, "s1"), (1, 1, "s2")], "a int, b int, v string")
    rows = merge_upsert(target, source, ["a", "b"]).collect()
    assert sorted(r["v"] for r in rows) == ["s1", "s2"]


def test_quality_audit_single_pass_counts(spark):
    df = spark.createDataFrame(
        [(None, -5.0), (1, 2.0), (2, 0.0), (3, 7.0)], "k int, x double")
    out = {r["check_name"]: r["n_violations"] for r in quality_audit(df, {
        "null_k": F.col("k").isNull(),
        "nonpositive_x": F.col("x") <= 0,
    }).collect()}
    assert out == {"null_k": 1, "nonpositive_x": 2}
    # single conditional-agg pass: exactly one aggregate over the source scan
    plan = quality_audit(df, {"null_k": F.col("k").isNull()})._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Scan") <= 2  # one scan (AQE may print it twice)


def test_referential_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    assert referential_orphans(child, parent, "fk", "pk").collect()[0]["n_violations"] == 1


def test_session_paths_ordering_and_cap(spark):
    rows = [
        # user 1: b at t1, a at t2 -> path "b->a" (event-time order, not input order)
        (1, 2.0, 11, "a"), (1, 1.0, 10, "b"),
        # user 2: 3 events, capped at max_steps=2 -> "x->y"
        (2, 1.0, 20, "x"), (2, 2.0, 21, "y"), (2, 3.0, 22, "z"),
        # user 3: tie on ts broken by event_id
        (3, 5.0, 31, "late"), (3, 5.0, 30, "early"),
    ]
    df = spark.createDataFrame(rows, "user_id int, tsd double, event_id int, event_type string") \
        .withColumn("ts", F.timestamp_seconds("tsd"))
    out = {r["path"]: r["n_users"] for r in session_paths(
        df, ts_col="ts", user_col="user_id", type_col="event_type",
        tiebreak_col="event_id", max_steps=2).collect()}
    assert out == {"b->a": 1, "x->y": 1, "early->late": 1}


def test_fuzzy_levenshtein_blocked_pairs(spark):
    df = spark.createDataFrame(
        [(1, "red bolt"), (2, "rad bolt"), (3, "red belt"), (4, "blue gear")],
        "doc_id int, text string")
    # block on the noun: 1 and 2 share "bolt"; 3 ("belt") and 4 ("gear")
    # are in other blocks and never compared — even though
    # levenshtein("red bolt", "red belt") = 1 would match unblocked
    prepared = df.withColumn("blk", F.split("text", " ")[1])
    pairs = {(r["id_a"], r["id_b"]): r["distance"] for r in fuzzy_levenshtein_pairs(
        df=prepared, id_col="doc_id", text_col="text", block_col="blk",
        max_distance=2).collect()}
    assert pairs == {(1, 2): 1}
    # default block (first token): now 1 and 3 share "red" instead
    pairs_default = {(r["id_a"], r["id_b"]): r["distance"]
                     for r in fuzzy_levenshtein_pairs(
                         df=df, id_col="doc_id", text_col="text",
                         max_distance=2).collect()}
    assert pairs_default == {(1, 3): 1}


def test_fuzzy_levenshtein_ops_registered(ctx):
    for op in ("table.merge.upsert", "table.quality.audit",
               "table.dedup.fuzzy_levenshtein", "events.session_paths"):
        assert op in ctx.operation_registry.operation_ids


def test_scd2_intervals_collapse_and_current(spark):
    import pyspark.sql.functions as F
    from kiara_spark.operators.quality import scd2_intervals

    rows = [
        # user 1: a,a,b,a -> intervals a[0,20) b[20,30) a[30,NULL)
        (1, 0, 100, "a"), (1, 10, 101, "a"), (1, 20, 102, "b"), (1, 30, 103, "a"),
        # user 2: single value stays current forever
        (2, 5, 200, "x"),
    ]
    df = spark.createDataFrame(rows, "user_id int, sec long, event_id long, event_type string") \
        .select("user_id", F.timestamp_seconds("sec").alias("ts"), "event_id", "event_type")
    out = scd2_intervals(df, key_col="user_id", ts_col="ts",
                         value_col="event_type", tiebreak_col="event_id")
    got = {(r["user_id"], r["attr_value"], r["valid_from"]):
           (r["valid_to"], r["is_current"]) for r in out.collect()}
    assert got == {
        (1, "a", 0): (20, 0),
        (1, "b", 20): (30, 0),
        (1, "a", 30): (None, 1),
        (2, "x", 5): (None, 1),
    }


def test_validate_schema_report(spark, ctx):
    df = spark.createDataFrame([(1, "x", 2.0)], "k int, name string, v double")
    from kiara_spark.operators.quality import validate_schema

    report = {r["column"]: r["status"] for r in validate_schema(df, {
        "k": "int", "name": "bigint", "missing_col": "string"}).collect()}
    assert report == {"k": "ok", "name": "type_mismatch",
                      "missing_col": "missing", "v": "unexpected"}
    assert "table.validate.schema" in ctx.operation_registry.operation_ids


def test_table_diff_classification(spark):
    from kiara_spark.operators.quality import table_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)], "k int, v string")
    new = spark.createDataFrame(
        [(2, "B"), (3, "c"), (4, None), (5, "e")], "k int, v string")
    got = {r["k"]: r["change_type"] for r in table_diff(old, new, ["k"]).collect()}
    # 1 removed, 2 changed, 3 unchanged (dropped), 4 null==null unchanged, 5 added
    assert got == {1: "removed", 2: "changed", 5: "added"}


def test_table_diff_key_only(spark):
    """Keys covering every column (or an explicit empty compare list) must
    still classify added/removed instead of raising (ADVICE round 1)."""
    from kiara_spark.operators.quality import table_diff

    old = spark.createDataFrame([(1,), (2,)], "k int")
    new = spark.createDataFrame([(2,), (3,)], "k int")
    got = {r["k"]: r["change_type"] for r in table_diff(old, new, ["k"]).collect()}
    assert got == {1: "removed", 3: "added"}
    got2 = {r["k"]: r["change_type"] for r in table_diff(
        old.withColumn("v", F.lit("x")), new.withColumn("v", F.lit("y")),
        ["k"], compare_cols=[]).collect()}
    assert got2 == {1: "removed", 3: "added"}


def test_scd2_null_attribute_values(spark):
    """NULL<->value transitions are real changes and consecutive NULLs
    collapse (ADVICE round 1: null-safe change detection)."""
    from kiara_spark.operators.quality import scd2_intervals

    rows = [
        # user 1: a, NULL, NULL, b -> a[0,10) NULL[10,30) b[30,NULL)
        (1, 0, 100, "a"), (1, 10, 101, None), (1, 20, 102, None), (1, 30, 103, "b"),
        # user 2: starts NULL -> NULL[5,15) y[15,NULL)
        (2, 5, 200, None), (2, 15, 201, "y"),
    ]
    df = spark.createDataFrame(rows, "user_id int, sec long, event_id long, event_type string") \
        .select("user_id", F.timestamp_seconds("sec").alias("ts"), "event_id", "event_type")
    out = scd2_intervals(df, key_col="user_id", ts_col="ts",
                         value_col="event_type", tiebreak_col="event_id")
    got = {(r["user_id"], r["attr_value"], r["valid_from"]):
           (r["valid_to"], r["is_current"]) for r in out.collect()}
    assert got == {
        (1, "a", 0): (10, 0),
        (1, None, 10): (30, 0),
        (1, "b", 30): (None, 1),
        (2, None, 5): (15, 0),
        (2, "y", 15): (None, 1),
    }


def test_quality_audit_quoted_check_names(spark):
    """Check names with quotes/backticks come from user pipeline config and
    must not inject into the plan (ADVICE round 1)."""
    df = spark.createDataFrame([(None,), (1,)], "k int")
    name = "bad'name`with quotes"
    out = {r["check_name"]: r["n_violations"]
           for r in quality_audit(df, {name: F.col("k").isNull()}).collect()}
    assert out == {name: 1}


def test_winsorize_clips_to_percentiles(spark):
    from kiara_spark.operators.quality import winsorize

    df = spark.createDataFrame([(i, float(i)) for i in range(1, 101)],
                               "k int, x double")
    out = {r["k"]: r["x_winsorized"] for r in winsorize(
        df, ["x"], lower=0.10, upper=0.90).collect()}
    # exact interpolated percentiles of 1..100 at 0.1/0.9 are 10.9 / 90.1
    assert out[1] == pytest.approx(10.9)
    assert out[100] == pytest.approx(90.1)
    assert out[50] == 50.0  # interior values untouched


def test_apply_changes_cdc_semantics(spark):
    from kiara_spark.operators.quality import apply_changes

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    changes = spark.createDataFrame(
        [(2, "B1", "U", 1), (2, "B2", "U", 2),   # latest update wins
         (3, None, "D", 1),                       # delete
         (4, "d", "I", 1),                        # insert of a new key
         (5, "e", "U", 1), (5, None, "D", 2)],    # update then delete -> gone
        "k int, v string, op string, seq int")
    got = {r["k"]: r["v"] for r in apply_changes(
        base, changes, keys=["k"], ts_col="seq").collect()}
    assert got == {1: "a", 2: "B2", 4: "d"}


def test_quantile_bins_equal_frequency(spark):
    from collections import Counter

    from kiara_spark.operators.quality import quantile_bins

    df = spark.createDataFrame([(i, float(i)) for i in range(100)],
                               "k int, x double")
    out = quantile_bins(df, "x", n_bins=4).collect()
    counts = Counter(r["x_bin"] for r in out)
    # exact quartiles of 0..99 split 25/25/25/25
    assert counts == {0: 25, 1: 25, 2: 25, 3: 25}
    by_k = {r["k"]: r["x_bin"] for r in out}
    assert by_k[0] == 0 and by_k[99] == 3


def test_corr_matrix_one_pass(spark):
    import math

    from kiara_spark.operators.quality import corr_matrix

    rows = [(float(i), 2.0 * i + 1, float(-i)) for i in range(50)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    got = {(r["col_a"], r["col_b"]): r["corr"] for r in corr_matrix(
        df, ["a", "b", "c"]).collect()}
    # perfectly linear relations
    assert got[("a", "b")] == 1.0
    assert got[("a", "c")] == -1.0
    assert got[("b", "c")] == -1.0
    # one pass: a single aggregate job over one scan
    plan = corr_matrix(df, ["a", "b"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 2


def test_impute_nulls_mean_and_median(spark):
    from kiara_spark.operators.quality import impute_nulls

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 20.0), (4, None), (5, 60.0)],
        "k int, x double")
    mean_fill = {r["k"]: r["x"] for r in impute_nulls(df, ["x"], "mean").collect()}
    assert mean_fill[2] == pytest.approx(30.0)  # (10+20+60)/3
    med_fill = {r["k"]: r["x"] for r in impute_nulls(df, ["x"], "median").collect()}
    assert med_fill[2] == pytest.approx(20.0)
    assert med_fill[1] == 10.0  # non-null untouched
    with pytest.raises(ValueError):
        impute_nulls(df, ["x"], "mode")


def test_skew_report_single_shuffle_all_columns(spark):
    from kiara_spark.operators.quality import skew_report

    df = spark.createDataFrame(
        [("hot", i % 2) for i in range(80)] + [("cold%d" % i, 99) for i in range(20)],
        "k string, g int")
    rows = skew_report(df, ["k", "g"], top_n=2).collect()
    got = {(r["column"], r["rnk"]): (r["value"], r["n_rows"], r["share"])
           for r in rows}
    assert got[("k", 1)] == ("hot", 80, 0.8)
    assert got[("g", 1)][1] in (40, 20)  # g: 0 and 1 have 40 each
    # both columns profiled, top_n respected
    assert len(rows) == 4


def test_quantile_bins_null_stays_null(spark):
    from kiara_spark.operators.quality import quantile_bins

    df = spark.createDataFrame([(1, 1.0), (2, None), (3, 100.0)],
                               "k int, x double")
    out = {r["k"]: r["x_bin"] for r in quantile_bins(df, "x", n_bins=2).collect()}
    assert out[2] is None
    assert out[1] == 0 and out[3] == 1


def test_incremental_agg_maintain_algebra(spark):
    from pyspark.sql import functions as F

    from kiara_spark.operators.quality import incremental_agg_maintain

    base = spark.createDataFrame(
        [("a", 2, 30.0), ("b", 1, 5.0)],
        "k string, cnt long, total double")
    changes = spark.createDataFrame(
        [("a", "I", None, 10.0),   # a: +1, +10
         ("a", "U", 20.0, 25.0),   # a: +5
         ("b", "D", 5.0, None),    # b emptied -> dropped
         ("c", "I", None, 7.0)],   # new group
        "k string, op string, old_val double, new_val double")
    got = {r["k"]: (r["cnt"], float(r["total"]))
           for r in incremental_agg_maintain(base, changes, ["k"]).collect()}
    assert got == {"a": (3, 45.0), "c": (1, 7.0)}


def test_regression_by_group_exact_line(spark):
    from kiara_spark.operators.quality import regression_by_group

    # group A: exact line y = 2x + 1; group B: zero x-variance
    rows = [("A", 1.0, 3.0), ("A", 2.0, 5.0), ("A", 3.0, 7.0),
            ("B", 4.0, 1.0), ("B", 4.0, 9.0)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r.g: r for r in regression_by_group(df, ["g"], "x", "y").collect()}
    assert out["A"].slope == 2.0 and out["A"].intercept == 1.0
    assert out["A"].r2 == 1.0 and out["A"].n_rows == 3
    # degenerate x -> NULL fit, not a crash or fake zero
    assert out["B"].slope is None and out["B"].r2 is None


def test_regression_partition_invariant(spark):
    from kiara_spark.operators.quality import regression_by_group

    rows = [("A", float(i % 17), float((i * 7) % 23)) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    a = regression_by_group(df, ["g"], "x", "y").collect()[0]
    b = regression_by_group(df.repartition(13), ["g"], "x", "y").collect()[0]
    assert (a.slope, a.intercept, a.r2) == (b.slope, b.intercept, b.r2)


def test_regression_op_registered(ctx):
    assert ctx.operation_registry.resolve("table.regression.by_group") is not None


def test_kth_smallest_matches_sort(spark):
    import random

    from kiara_spark.operators.quality import kth_smallest_scalable

    rng = random.Random(7)
    vals = [round(rng.uniform(-100, 100), 3) for _ in range(5000)]
    vals += [42.0] * 500  # heavy duplicate run
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    s = sorted(vals)
    for k in (1, 17, 2750, len(vals)):
        got = kth_smallest_scalable(df, "x", k, n_bins=16, final_limit=50)
        assert got == s[k - 1], (k, got, s[k - 1])


def test_kth_smallest_constant_column(spark):
    from kiara_spark.operators.quality import kth_smallest_scalable

    df = spark.createDataFrame([(5.0,)] * 1000, "x double")
    assert kth_smallest_scalable(df, "x", 500, final_limit=10) == 5.0


def test_kth_smallest_duplicate_dominated_bucket_stays_bounded(spark):
    """r2 ADVICE: when the rank-k bucket is dominated by ties the range
    narrows but cnt never drops below final_limit — the fallback must walk
    per-value counts (bounded), never collect up-to-n raw rows.  Two tie
    runs with the rank crossing between them exercises the cumulative walk."""
    from kiara_spark.operators.quality import kth_smallest_scalable

    vals = [1.0] * 600 + [2.0] * 600
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    assert kth_smallest_scalable(df, "x", 600, n_bins=4, final_limit=20,
                                 max_rounds=3) == 1.0
    assert kth_smallest_scalable(df, "x", 601, n_bins=4, final_limit=20,
                                 max_rounds=3) == 2.0


def test_kth_smallest_bounds(spark):
    import pytest as _pytest

    from kiara_spark.operators.quality import kth_smallest_scalable

    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    with _pytest.raises(ValueError):
        kth_smallest_scalable(df, "x", 3)


def test_kth_smallest_op_registered(ctx):
    assert ctx.operation_registry.resolve("table.kth_smallest") is not None


def test_association_pairs_metrics(spark):
    from kiara_spark.operators.quality import association_pairs

    # baskets: {A,B,C}, {A,B}, {A}, {B,C} -> AB support 2, BC support 2,
    # AC support 1 (pruned at min_support=2)
    rows = [(1, "A"), (1, "B"), (1, "C"), (2, "A"), (2, "B"),
            (3, "A"), (4, "B"), (4, "C")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {(r.item_a, r.item_b): r
           for r in association_pairs(df, "basket", "item").collect()}
    assert set(out) == {("A", "B"), ("B", "C")}
    ab = out[("A", "B")]
    assert ab.support == 2
    assert ab.confidence_a_to_b == round(2 / 3, 6)  # A in 3 baskets
    assert ab.lift == round(2 * 4 / (3 * 3), 6)     # 4 baskets, B in 3
    # duplicate items within a basket don't inflate support
    dup = spark.createDataFrame(rows + [(1, "A"), (1, "B")],
                                "basket long, item string")
    out2 = {(r.item_a, r.item_b): r.support
            for r in association_pairs(dup, "basket", "item").collect()}
    assert out2[("A", "B")] == 2


def test_association_op_registered(ctx):
    assert ctx.operation_registry.resolve("table.association.pairs") is not None


def test_profile_columns_one_scan(spark):
    from kiara_spark.operators.quality import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b")], "k long, s string")
    out = {r.column: r for r in profile_columns(df, ["k", "s"]).collect()}
    assert out["k"].n_rows == 3 and out["k"].n_nulls == 0
    assert out["k"].n_distinct == 2
    assert (out["k"].min_value, out["k"].max_value) == ("1", "2")
    assert out["s"].n_nulls == 1 and out["s"].n_distinct == 2
    # single job: the profile plan contains exactly one aggregate pass
    plan = profile_columns(df, ["k", "s"])._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("HashAggregate") <= 4  # partial+final, one agg chain


def test_profile_op_registered(ctx):
    assert ctx.operation_registry.resolve("table.profile") is not None


def test_kth_smallest_nonconverged_many_distinct_pages(spark):
    """r3 ADVICE: a non-converged slice with MORE distinct values than
    final_limit must page the ordered per-value walk (keyed by last value
    seen), not raise.  max_rounds=0 forces the fallback on the full column:
    300 distinct values, final_limit=40 → 8 pages, exact answer."""
    from kiara_spark.operators.quality import kth_smallest_scalable

    vals = [float(i) for i in range(300)] * 2  # 600 rows, 300 distinct
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    s = sorted(vals)
    for k in (1, 95, 301, 600):
        got = kth_smallest_scalable(df, "x", k, n_bins=8, final_limit=40,
                                    max_rounds=0)
        assert got == s[k - 1], (k, got, s[k - 1])


def test_scale_features_minmax_and_zscore(spark):
    from kiara_spark.operators.quality import scale_features

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)], "id long, x double")
    got = {r.id: r for r in scale_features(df, ["x"]).collect()}
    assert got[1].x_minmax == 0.0 and got[4].x_minmax == 1.0
    assert abs(got[2].x_minmax - 1 / 3) < 1e-6
    # population sd of [10,20,30,40] = sqrt(125); z(40) = 15/sqrt(125)
    assert abs(got[4].x_z - 15 / 125 ** 0.5) < 1e-6
    assert abs(sum(got[i].x_z for i in got)) < 1e-5  # zero-mean
    # constant column degrades to 0, not NaN/div-by-zero
    cdf = spark.createDataFrame([(1, 7.0), (2, 7.0)], "id long, x double")
    for r in scale_features(cdf, ["x"]).collect():
        assert r.x_minmax == 0.0 and r.x_z == 0.0


def test_k_anonymity_report(spark):
    from kiara_spark.operators.quality import k_anonymity_report

    rows = [(i, "A", "x") for i in range(6)] + [(10, "B", "y"), (11, "B", "z")]
    df = spark.createDataFrame(rows, "id long, region string, seg string")
    got = {(r.region, r.seg): r for r in
           k_anonymity_report(df, ["region", "seg"], k=5).collect()}
    assert got[("A", "x")].group_size == 6
    assert not got[("A", "x")].violates_k
    assert got[("B", "y")].violates_k and got[("B", "z")].violates_k


def test_privacy_op_registered(ctx):
    assert ctx.operation_registry.resolve(
        "table.privacy.k_anonymity") is not None


def test_quality_expectations_verdicts(spark):
    from kiara_spark.operators.quality import quality_expectations

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 7.0), (3, None, -1.0), (3, "b", 2.0)],
        "id long, cat string, x double")
    out = {(r.expectation, r.column): r for r in quality_expectations(df, [
        {"kind": "completeness", "column": "cat", "min_ratio": 0.9},
        {"kind": "uniqueness", "column": "id", "min_ratio": 1.0},
        {"kind": "min", "column": "x", "at_least": 0.0},
        {"kind": "max", "column": "x", "at_most": 10.0},
        {"kind": "accepted_values", "column": "cat", "values": ["a", "b"],
         "min_ratio": 1.0},
        {"kind": "row_count", "at_least": 3},
    ]).collect()}
    assert out[("completeness", "cat")].observed == 0.75
    assert not out[("completeness", "cat")].passed
    assert out[("uniqueness", "id")].observed == 0.75
    assert not out[("uniqueness", "id")].passed
    assert out[("min", "x")].observed == -1.0
    assert not out[("min", "x")].passed
    assert out[("max", "x")].passed
    # NULL counts as a miss for accepted_values (fraction over all rows)
    assert out[("accepted_values", "cat")].observed == 0.75
    assert out[("row_count", "")].observed == 4.0
    assert out[("row_count", "")].passed


def test_quality_expectations_unknown_kind_raises(spark):
    import pytest as _pytest

    from kiara_spark.operators.quality import quality_expectations

    df = spark.range(3)
    with _pytest.raises(ValueError):
        quality_expectations(df, [{"kind": "nope", "column": "id"}])


def test_quality_expectations_registered(ctx):
    assert ctx.operation_registry.resolve(
        "table.quality.expectations") is not None


def test_l_diversity_flags(spark, ctx):
    from kiara_spark.operators.quality import l_diversity_report

    df = spark.createDataFrame(
        [("a", "flu"), ("a", "flu"), ("a", "cold"),
         ("b", "flu"), ("b", "flu")],
        "zip string, disease string")
    out = {r.zip: r for r in
           l_diversity_report(df, ["zip"], "disease", l=2).collect()}
    assert out["a"].n_sensitive_values == 2 and not out["a"].violates_l
    # class "b" is 2-anonymous but NOT 2-diverse: everyone has flu
    assert out["b"].n_sensitive_values == 1 and out["b"].violates_l
    assert ctx.operation_registry.resolve(
        "table.privacy.l_diversity") is not None


def test_target_encode_shrinks_rare_categories(spark, ctx):
    from kiara_spark.operators.quality import target_encode

    rows = [("big", 10.0)] * 50 + [("rare", 100.0)]
    df = spark.createDataFrame(rows, "cat string, y double")
    out = {r.cat: r.cat_enc for r in
           target_encode(df, "cat", "y", smoothing=10.0)
           .select("cat", "cat_enc").distinct().collect()}
    prior = (50 * 10.0 + 100.0) / 51
    # big category barely moves; rare category shrinks hard toward prior
    assert abs(out["big"] - 10.0) < 0.5
    expected_rare = (100.0 + prior * 10.0) / 11
    assert abs(out["rare"] - expected_rare) < 1e-6
    assert ctx.operation_registry.resolve(
        "table.ml.target_encode") is not None


def test_benford_exact_fractions(spark, ctx):
    import math

    from kiara_spark.operators.quality import benford_report

    # values whose integer-cents leading digits are 1,1,2,9 (+ one zero
    # and one NULL row that must be ignored)
    df = spark.createDataFrame(
        [(1.23,), (150.0,), (0.25,), (9.99,), (0.0,), (None,)],
        "x double")
    out = {r.digit: r for r in benford_report(df, "x").collect()}
    assert len(out) == 9  # full digit grid, zero-count digits included
    assert out[1].n == 2 and out[2].n == 1 and out[9].n == 1
    assert out[3].n == 0 and out[3].observed_freq == 0.0
    assert out[1].observed_freq == 0.5
    assert out[1].expected_freq == round(math.log10(2), 6)
    assert ctx.operation_registry.resolve(
        "table.quality.benford") is not None


def test_lift_table_perfect_model(spark, ctx):
    from kiara_spark.operators.quality import lift_table

    # perfect separation: top-half scores are all positive
    rows = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, y int")
    out = {r.bucket: r for r in lift_table(df, "score", "y", n_bins=4)
           .collect()}
    assert [out[b].n for b in (1, 2, 3, 4)] == [25, 25, 25, 25]
    assert out[1].pos_rate == 1.0 and out[2].pos_rate == 1.0
    assert out[3].pos_rate == 0.0 and out[4].pos_rate == 0.0
    # base rate .5 -> top-bucket lift 2.0; full-population cum_lift 1.0
    assert out[1].lift == 2.0
    assert out[4].cum_lift == 1.0
    assert out[2].cum_gain == 1.0  # top half captures every positive
    assert ctx.operation_registry.resolve("table.ml.lift_table") is not None


def test_auc_roc_known_values(spark, ctx):
    from kiara_spark.operators.quality import auc_roc

    # perfect separation -> AUC 1.0
    perfect = spark.createDataFrame(
        [(float(i), 1 if i >= 5 else 0) for i in range(10)],
        "score double, y int")
    assert auc_roc(perfect, "score", "y").collect()[0].auc == 1.0
    # all scores tied -> midranks make AUC exactly 0.5
    tied = spark.createDataFrame(
        [(1.0, i % 2) for i in range(10)], "score double, y int")
    assert auc_roc(tied, "score", "y").collect()[0].auc == 0.5
    # hand-checked small case: scores 1,2,3,4; labels 0,1,0,1
    # pos ranks 2+4=6; auc=(6-3)/(2*2)=0.75
    small = spark.createDataFrame(
        [(1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1)], "score double, y int")
    r = auc_roc(small, "score", "y").collect()[0]
    assert r.auc == 0.75 and r.n == 4 and r.n_pos == 2 and r.n_neg == 2
    # degenerate single-class input -> NULL auc, not a crash
    one_class = spark.createDataFrame([(1.0, 1), (2.0, 1)],
                                      "score double, y int")
    assert auc_roc(one_class, "score", "y").collect()[0].auc is None
    assert ctx.operation_registry.resolve("table.ml.auc_roc") is not None


def test_association_triples_counts_and_prune(spark, ctx):
    from kiara_spark.operators.quality import association_triples

    # baskets: {1,2,3} x3, {1,2} x1, {4,5,6} x1 (infrequent triple)
    rows = []
    for b in range(3):
        rows += [(b, 1), (b, 2), (b, 3)]
    rows += [(10, 1), (10, 2)]
    rows += [(20, 4), (20, 5), (20, 6)]
    df = spark.createDataFrame(rows, "basket long, item long")
    out = association_triples(df, "basket", "item", min_support=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.item_a, r.item_b, r.item_c) == (1, 2, 3)
    assert r.support == 3
    # pair {1,2} appears 4x -> confidence 3/4
    assert r.confidence_ab_to_c == 0.75
    # lift = s * N^2 / (na*nb*nc) = 3*25/(4*4*3)
    assert abs(r.lift - round(3 * 25 / 48, 6)) < 1e-9
    assert ctx.operation_registry.resolve(
        "table.association.triples") is not None


def test_weighted_percentile_exact(spark, ctx):
    from kiara_spark.operators.quality import weighted_percentile

    # values 1..4 with weights 1,1,1,7 -> total 10:
    # p50 -> first value with cum >= 5 is 4; p30 -> cum >= 3 is 3
    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 1.0), (3.0, 1.0), (4.0, 7.0)],
        "v double, w double")
    out = {r.p: r.value for r in
           weighted_percentile(df, "v", "w", [0.3, 0.5, 1.0]).collect()}
    assert out[0.3] == 3.0
    assert out[0.5] == 4.0
    assert out[1.0] == 4.0
    # boundary: cum weight EXACTLY equals p*W -> that value qualifies
    df2 = spark.createDataFrame([(1.0, 1.0), (2.0, 1.0)], "v double, w double")
    out2 = {r.p: r.value for r in
            weighted_percentile(df2, "v", "w", [0.5]).collect()}
    assert out2[0.5] == 1.0
    assert ctx.operation_registry.resolve(
        "table.weighted_percentile") is not None


def test_one_hot_pinned_vocab_and_unknowns(spark, ctx):
    from kiara_spark.operators.quality import one_hot_encode

    df = spark.createDataFrame([("a",), ("b",), ("zz",)], "cat string")
    out = one_hot_encode(df, "cat", values=["a", "b", "c"]).collect()
    rows = {r.cat: (r.cat_a, r.cat_b, r.cat_c) for r in out}
    assert rows["a"] == (1, 0, 0) and rows["b"] == (0, 1, 0)
    assert rows["zz"] == (0, 0, 0)  # unknown -> all zeros, schema stable
    # derived vocabulary path
    out2 = one_hot_encode(df, "cat")
    assert {"cat_a", "cat_b", "cat_zz"} <= set(out2.columns)
    assert ctx.operation_registry.resolve("table.ml.one_hot") is not None


def test_robust_scaling_outlier_resistance(spark):
    from kiara_spark.operators.quality import scale_features

    # median 3, IQR = Q3-Q1 = 4-2 = 2; the 1000.0 outlier barely moves it
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (4.0,), (1000.0,)], "x double")
    out = {r.x: r.x_robust for r in
           scale_features(df, ["x"], methods=("robust",)).collect()}
    assert out[3.0] == 0.0
    assert out[1.0] == -1.0 and out[4.0] == 0.5
    # constant column -> 0, not NaN
    dfc = spark.createDataFrame([(5.0,)] * 4, "x double")
    outc = scale_features(dfc, ["x"], methods=("robust",)).collect()
    assert all(r.x_robust == 0.0 for r in outc)


def test_price_volume_mix_bridge_balances(spark, ctx):
    from kiara_spark.operators.quality import price_volume_mix

    # group g: A = 10 units @ 2.0 (rev 20); B = 15 units @ 3.0 (rev 45)
    rows = [("g", "A", 20.0, 10.0), ("g", "B", 45.0, 15.0),
            # group h only in A -> NULL effects
            ("h", "A", 5.0, 1.0)]
    df = spark.createDataFrame(rows,
                               "grp string, period string, rev double, vol double")
    out = {r.grp: r for r in price_volume_mix(
        df, ["grp"], "rev", "vol").collect()}
    g = out["g"]
    # price effect (3-2)*10=10; volume (15-10)*2=10; mix (3-2)*(15-10)=5
    assert g.price_effect == 10.0 and g.volume_effect == 10.0
    assert g.mix_effect == 5.0
    assert g.delta_revenue == g.price_effect + g.volume_effect + g.mix_effect
    h = out["h"]
    assert h.price_effect is None and h.delta_revenue == -5.0
    assert ctx.operation_registry.resolve(
        "table.variance.price_volume_mix") is not None


def test_classification_report_values(spark, ctx):
    from kiara_spark.operators.quality import classification_report

    # tp=2 fp=1 fn=1 tn=2 -> P=2/3, R=2/3, F1=2/3, acc=4/6
    rows = [(1, 1), (1, 1), (0, 1), (1, 0), (0, 0), (0, 0)]
    df = spark.createDataFrame(rows, "y int, pred int")
    r = classification_report(df, "y", "pred").collect()[0]
    assert (r.tp, r.fp, r.fn, r.tn) == (2, 1, 1, 2)
    assert r.precision == round(2 / 3, 6) == r.recall == r.f1
    assert r.accuracy == round(4 / 6, 6)
    # degenerate: no predicted positives -> NULL precision/f1, not crash
    r2 = classification_report(
        spark.createDataFrame([(1, 0), (0, 0)], "y int, pred int"),
        "y", "pred").collect()[0]
    assert r2.precision is None and r2.f1 is None and r2.recall == 0.0
    assert ctx.operation_registry.resolve(
        "table.ml.classification_report") is not None


def test_one_hot_collision_raises(spark):
    import pytest as _pytest

    from kiara_spark.operators.quality import one_hot_encode

    df = spark.createDataFrame([("a b",), ("a_b",)], "cat string")
    with _pytest.raises(ValueError, match="collide"):
        one_hot_encode(df, "cat", values=["a b", "a_b"])


def test_auc_roc_null_scores_excluded(spark):
    from kiara_spark.operators.quality import auc_roc

    df = spark.createDataFrame(
        [(None, 0), (1.0, 0), (2.0, 1)], "score double, y int")
    r = auc_roc(df, "score", "y").collect()[0]
    assert r.n == 2 and r.auc == 1.0


def test_weighted_percentile_fractional_weights_boundary(spark):
    from kiara_spark.operators.quality import weighted_percentile

    # exact threshold needs scale-12 precision: total 5.000002, p=0.2 ->
    # threshold 1.0000004; cum(v=1)=1.000000 must NOT qualify
    df = spark.createDataFrame(
        [(1.0, 1.000000), (2.0, 4.000002)], "v double, w double")
    out = {r.p: r.value for r in
           weighted_percentile(df, "v", "w", [0.2]).collect()}
    assert out[0.2] == 2.0


def test_gini_known_distributions(spark, ctx):
    from kiara_spark.operators.quality import gini_coefficient

    # perfectly equal -> 0
    eq = spark.createDataFrame([(10.0,)] * 8, "x double")
    assert gini_coefficient(eq, "x").collect()[0].gini == 0.0
    # one entity holds everything among n=4 -> G = (n-1)/n = 0.75
    solo = spark.createDataFrame([(0.0,), (0.0,), (0.0,), (100.0,)],
                                 "x double")
    assert gini_coefficient(solo, "x").collect()[0].gini == 0.75
    # hand case: [1, 3]: sum|diffs|=2*2=4, G = 4/(2*2*4) = 0.25
    two = spark.createDataFrame([(1.0,), (3.0,)], "x double")
    r = gini_coefficient(two, "x").collect()[0]
    assert r.gini == 0.25 and r.n == 2 and r.total == 4.0
    assert ctx.operation_registry.resolve(
        "table.concentration.gini") is not None


def test_hhi_and_entropy(spark, ctx):
    import math

    from kiara_spark.operators.quality import (hhi_concentration,
                                               shannon_entropy)

    # market g: shares 0.5/0.5 -> HHI 0.5, effective 2
    rows = [("g", 1, 50.0), ("g", 2, 50.0), ("h", 1, 100.0)]
    df = spark.createDataFrame(rows, "mkt string, ent long, rev double")
    out = {r.mkt: r for r in
           hhi_concentration(df, ["mkt"], "ent", "rev").collect()}
    assert out["g"].hhi == 0.5 and out["g"].effective_n == 2.0
    assert out["h"].hhi == 1.0 and out["h"].n_entities == 1
    # entropy: uniform over 4 categories -> ln 4; single category -> 0
    ev = spark.createDataFrame(
        [(1, c) for c in "abcd"] + [(2, "a"), (2, "a")],
        "user_id long, cat string")
    ent = {r.user_id: r for r in
           shannon_entropy(ev, "cat", group_cols=["user_id"]).collect()}
    assert abs(ent[1].entropy - round(math.log(4), 6)) < 2e-6
    assert ent[2].entropy == 0.0 and ent[2].n_categories == 1
    assert ctx.operation_registry.resolve(
        "table.concentration.hhi") is not None
    assert ctx.operation_registry.resolve(
        "table.concentration.entropy") is not None


def test_calibration_bins_perfect_and_miscalibrated(ctx, spark):
    """Perfectly calibrated synthetic scores -> gap 0 in every bin and
    ECE ~0; a constant-overconfident model shows the exact gap.  Bins are
    equal-width over the min-max-normalized score, positions 0..9."""
    from pyspark.sql import functions as F

    from kiara_spark.operators.quality import calibration_bins

    # 10 score levels 0.05..0.95 normalized to p in [0,1]; within each
    # level, exactly round(p*n) positives -> observed rate == mean score
    rows = []
    for lvl in range(10):
        p = (lvl + 0.5) / 10
        for i in range(40):
            rows.append((lvl * 40 + i, lvl / 9.0, 1 if i < round(p * 40) else 0))
    # normalized score (x - mn)/(mx - mn) = lvl/9 -> bin = floor(lvl/9*10)
    df = spark.createDataFrame(rows, "id int, score double, y int")
    out = calibration_bins(df, "score", "y", n_bins=10).collect()
    assert len(out) == 10
    assert [r.bin for r in out] == sorted(r.bin for r in out)
    assert sum(r.n for r in out) == 400
    # every bin holds one 40-row level except bin 9's two (lvl 8 ->
    # 8/9*10=8.88 -> bin 8; lvl 9 -> bin 9): check totals + ECE bound
    ece = sum(r.ece_contrib for r in out)
    assert ece < 0.12  # near-calibrated by construction
    # fully miscalibrated: every prediction identical, outcomes half/half
    flat = spark.createDataFrame(
        [(i, 0.0 if i < 200 else 1.0, i % 2) for i in range(400)],
        "id int, score double, y int")
    out2 = calibration_bins(flat, "score", "y", n_bins=10).collect()
    gaps = {r.bin: r.gap for r in out2}
    assert gaps == {0: 0.5, 9: 0.5}
    assert abs(sum(r.ece_contrib for r in out2) - 0.5) < 1e-9
    assert ctx.operation_registry.resolve(
        "table.ml.calibration_bins") is not None
