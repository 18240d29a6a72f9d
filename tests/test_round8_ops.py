"""Round-8 regression tests for the round-7 ADVICE items: singular OLS
designs, gapped-series DFT mean removal, active-users phantom-day cap,
bootstrap NULL exclusion."""

import datetime
import math

import pytest
from pyspark.sql import functions as F


def _day_events(spec, ty="click"):
    """[(day_offset, count)] -> rows (event_id, ts, user_id, event_type)."""
    base = datetime.datetime(2024, 1, 1)
    rows = []
    i = 0
    for d, c in spec:
        for k in range(c):
            rows.append((i, base + datetime.timedelta(days=d, minutes=k),
                         k, ty))
            i += 1
    return rows


def test_linreg_singular_design_returns_nulls(spark):
    """A constant feature makes the Gram matrix singular: the guard must
    return NULL coefficients and NULL r2 by contract, not NULL/Inf noise
    or a wrong fit (round-7 ADVICE)."""
    from kiara_spark.operators.quality import linear_regression_normal

    rows = [(float(i), 1.0, float(2 * i + 3)) for i in range(20)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    r = linear_regression_normal(df, "y", ["x1", "x2"]).collect()[0]
    assert r.n == 20
    assert r.intercept is None and r.r2 is None
    assert r.coef_x1 is None and r.coef_x2 is None
    # collinear (x2 = 2*x1) is singular too
    rows2 = [(float(i), 2.0 * i, float(i + 1)) for i in range(20)]
    df2 = spark.createDataFrame(rows2, "x1 double, x2 double, y double")
    r2 = linear_regression_normal(df2, "y", ["x1", "x2"]).collect()[0]
    assert r2.intercept is None and r2.r2 is None


def test_dft_periodogram_gapped_series_matches_dense_python(spark):
    """Days 0..13 with days 5 and 9 MISSING: the operator must treat them
    as c=0 on the dense 0..n-1 grid, matching a pure-Python DFT over the
    densified series (round-7 ADVICE: the exact-mean-removal identity
    a_num = n·Σc·cos − S·Σcos requires Σcos over ALL t)."""
    from kiara_spark.operators.events import dft_periodogram

    spec = [(t, 8 + 4 * (t % 3 == 0)) for t in range(14)
            if t not in (5, 9)]
    df = spark.createDataFrame(
        _day_events(spec), "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string")
    out = {r.period: r for r in dft_periodogram(df, "ts", 2, 7).collect()}

    dense = {t: 0 for t in range(14)}
    for t, c in spec:
        dense[t] = c
    n = 14
    s = sum(dense.values())
    for p in range(2, 8):
        ac = sum(round(math.cos(2 * math.pi * t / p), 9) * c
                 for t, c in dense.items())
        asum = sum(round(math.sin(2 * math.pi * t / p), 9) * c
                   for t, c in dense.items())
        cc = sum(round(math.cos(2 * math.pi * t / p), 9)
                 for t in dense)
        cs = sum(round(math.sin(2 * math.pi * t / p), 9)
                 for t in dense)
        a = round((n * ac - s * cc) / n, 6)
        b = round((n * asum - s * cs) / n, 6)
        assert out[p].a == pytest.approx(a, abs=2e-6), f"period {p}"
        assert out[p].b == pytest.approx(b, abs=2e-6), f"period {p}"


def test_active_users_capped_at_max_observed_day(spark):
    """Activity on days 0..2 only: the output must stop at day 2 — no
    phantom rows out to day 31 showing decaying 7d/30d actives with
    0 DAU (round-7 ADVICE)."""
    from kiara_spark.operators.events import active_users

    spec = [(0, 3), (1, 2), (2, 1)]
    df = spark.createDataFrame(
        _day_events(spec), "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string")
    rows = active_users(df, "ts", "user_id").collect()
    days = [r.day for r in rows]
    assert len(rows) == 3
    assert max(days) == datetime.date(2024, 1, 3)
    by_day = {r.day: r for r in rows}
    d2 = by_day[datetime.date(2024, 1, 3)]
    # day 2: user 0 active today; users {0,1,2} active in the last 7/30 d
    assert d2.active_1d == 1 and d2.active_7d == 3 and d2.active_30d == 3


def test_ridge_shrinks_toward_zero_and_matches_ols_at_tiny_lambda(spark):
    """y = 2 + 3·x1 − 0.5·x2 exactly: λ≈0 recovers the OLS plane; a huge λ
    shrinks both slopes toward 0 while the intercept absorbs the mean."""
    from kiara_spark.operators.quality import (linear_regression_normal,
                                               ridge_regression_normal)

    rows = [(float(i % 7), float((i * 3) % 5),
             2.0 + 3.0 * (i % 7) - 0.5 * ((i * 3) % 5))
            for i in range(60)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    ols = linear_regression_normal(df, "y", ["x1", "x2"]).collect()[0]
    tiny = ridge_regression_normal(df, "y", ["x1", "x2"],
                                   lam=1e-9).collect()[0]
    assert tiny.coef_x1 == pytest.approx(ols.coef_x1, abs=1e-5)
    assert tiny.coef_x2 == pytest.approx(ols.coef_x2, abs=1e-5)
    assert tiny.r2 == pytest.approx(1.0, abs=1e-5)
    huge = ridge_regression_normal(df, "y", ["x1", "x2"],
                                   lam=1e9).collect()[0]
    assert abs(huge.coef_x1) < 1e-3 and abs(huge.coef_x2) < 1e-3
    # ridge is defined on collinear designs where OLS is NULL by contract
    col_rows = [(float(i), 2.0 * i, float(i + 1)) for i in range(20)]
    cdf = spark.createDataFrame(col_rows, "x1 double, x2 double, y double")
    r = ridge_regression_normal(cdf, "y", ["x1", "x2"], lam=1.0).collect()[0]
    assert r.intercept is not None and r.r2 is not None


def test_kfold_cv_ols_recovers_exact_plane_per_fold(spark):
    """Noise-free plane: every fold's train solve recovers (2, 3, −0.5)
    and scores its test fold perfectly (rmse 0, r2 1); fold sizes
    partition the data."""
    from kiara_spark.operators.quality import kfold_cv_ols

    rows = [(i, float(i % 7), float((i * 3) % 5),
             2.0 + 3.0 * (i % 7) - 0.5 * ((i * 3) % 5))
            for i in range(100)]
    df = spark.createDataFrame(rows, "id bigint, x1 double, x2 double,"
                               " y double")
    out = kfold_cv_ols(df, "y", ["x1", "x2"], "id", k=5).collect()
    assert len(out) == 5 and sorted(r.fold for r in out) == [0, 1, 2, 3, 4]
    assert sum(r.n_test for r in out) == 100
    for r in out:
        assert r.n_train == 100 - r.n_test
        assert r.intercept == pytest.approx(2.0, abs=1e-4)
        assert r.coef_x1 == pytest.approx(3.0, abs=1e-4)
        assert r.coef_x2 == pytest.approx(-0.5, abs=1e-4)
        assert r.rmse == pytest.approx(0.0, abs=1e-4)
        assert r.r2 == pytest.approx(1.0, abs=1e-4)


def test_regressions_exclude_null_rows(spark):
    """OLS / ridge / k-fold CV: rows with a NULL target or feature are
    excluded rows — results must equal the NULL-free frame exactly
    (r8 review: previously the count denominators included them while
    the decimal sums skipped them)."""
    from kiara_spark.operators.quality import (kfold_cv_ols,
                                               linear_regression_normal,
                                               ridge_regression_normal)

    clean = [(i, float(i % 7), float((i * 3) % 5),
              2.0 + 3.0 * (i % 7) - 0.5 * ((i * 3) % 5))
             for i in range(60)]
    dirty = clean + [(100, None, 1.0, 5.0), (101, 2.0, None, 5.0),
                     (102, 2.0, 1.0, None)]
    dfc = spark.createDataFrame(clean, "id bigint, x1 double, x2 double,"
                                " y double")
    dfd = spark.createDataFrame(dirty, "id bigint, x1 double, x2 double,"
                                " y double")
    oc = linear_regression_normal(dfc, "y", ["x1", "x2"]).collect()[0]
    od = linear_regression_normal(dfd, "y", ["x1", "x2"]).collect()[0]
    assert od == oc and od.n == 60
    rc = ridge_regression_normal(dfc, "y", ["x1", "x2"], 1.0).collect()[0]
    rd = ridge_regression_normal(dfd, "y", ["x1", "x2"], 1.0).collect()[0]
    assert rd == rc
    kc = sorted(map(tuple, kfold_cv_ols(dfc, "y", ["x1", "x2"], "id",
                                        k=3).collect()))
    kd = sorted(map(tuple, kfold_cv_ols(dfd, "y", ["x1", "x2"], "id",
                                        k=3).collect()))
    assert kd == kc


def test_ridge_lam_zero_collinear_returns_nulls(spark):
    """lam=0 on a collinear design degenerates to the singular OLS case:
    the guard must return NULL coefficients, not NULL/Inf arithmetic."""
    from kiara_spark.operators.quality import ridge_regression_normal

    rows = [(float(i), 2.0 * i, float(i + 1)) for i in range(20)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    r = ridge_regression_normal(df, "y", ["x1", "x2"], lam=0.0).collect()[0]
    assert r.intercept is None and r.r2 is None


def test_bootstrap_ab_diff_empty_group_yields_null_side(spark):
    """A group label matching zero rows must yield ONE row with NULLs on
    the missing side (matching the SQL twin's scalar subqueries), never a
    silent empty frame (r8 review)."""
    from kiara_spark.operators.quality import bootstrap_ab_diff

    rows = [(i, "B", 50.0 + i % 7) for i in range(40)]
    df = spark.createDataFrame(rows, "id bigint, grp string, v double")
    out = bootstrap_ab_diff(df, "v", "id", "grp", "A", "B",
                            b_resamples=20).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_a is None and r.mean_a is None and r.diff is None
    assert r.n_b == 40 and r.mean_b is not None


def test_truncated_dim_recall_custom_id_column(spark):
    """The default query filter derives from id_col — a custom id column
    must not leave the filter pointing at a nonexistent vec_id."""
    from kiara_spark.operators.similarity import truncated_dim_recall

    rows = [(i, [1.0 + i % 5, float(i % 3)] + [0.0] * 4)
            for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id bigint, embedding array<double>")
    out = truncated_dim_recall(df, dims=2, k=2, id_col="doc_id",
                               query_filter="doc_id % 3 = 0").collect()
    assert out  # runs against the custom column
    out2 = truncated_dim_recall(df.filter("doc_id % 1 = 0"), dims=2, k=2,
                                id_col="doc_id").collect()
    assert out2  # derived default filter uses doc_id


def test_cuped_perfect_covariate_removes_all_variance(spark):
    """y = 2x exactly: corr = 1, adjusted variance 0, reduction 100%;
    an independent covariate reduces (almost) nothing."""
    from kiara_spark.operators.quality import cuped_adjustment

    rows = [(float(i % 10), 2.0 * (i % 10)) for i in range(50)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = cuped_adjustment(df, "y", "x").collect()[0]
    assert r.corr == pytest.approx(1.0, abs=1e-6)
    assert r.theta == pytest.approx(2.0, abs=1e-6)
    assert r.var_adjusted == pytest.approx(0.0, abs=1e-6)
    assert r.variance_reduction_pct == pytest.approx(100.0, abs=1e-4)
    ind = [(float(i % 2), float((i // 2) % 5)) for i in range(40)]
    df2 = spark.createDataFrame(ind, "x double, y double")
    r2 = cuped_adjustment(df2, "y", "x").collect()[0]
    assert abs(r2.variance_reduction_pct) < 5.0


def test_truncated_dim_recall_prefix_informative_vs_not(spark):
    """Vectors whose identity lives in the FIRST dims keep recall 1 under
    truncation; vectors identical in the prefix and distinct only in the
    tail lose ranking power (recall < 1 for some query)."""
    from kiara_spark.operators.similarity import truncated_dim_recall

    # info in first 2 dims, tail ZERO -> truncation to 2 dims is exactly
    # lossless (dot products and norms unchanged, so identical ranking)
    rows = [(i, [1.0 + float(i % 5), float((i * 7) % 11)] + [0.0] * 6)
            for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    good = truncated_dim_recall(df, dims=2, k=3,
                                query_filter="vec_id % 4 = 0").collect()
    assert good and all(r.recall == 1.0 for r in good)
    # constant prefix, info only in the tail -> truncated ranking is a tie
    # broken by id, which cannot track the true neighbors for all queries
    rows2 = [(i, [1.0, 1.0] + [float((i * 13) % 17), float(i % 7),
                               float((i * 5) % 9), 1.0, 0.5, 2.0])
             for i in range(20)]
    df2 = spark.createDataFrame(rows2,
                                "vec_id bigint, embedding array<double>")
    bad = truncated_dim_recall(df2, dims=2, k=3,
                               query_filter="vec_id % 4 = 0").collect()
    assert min(r.recall for r in bad) < 1.0


def test_bootstrap_ab_diff_brackets_true_uplift(spark):
    """Group A = B-values shifted by exactly +10: the point diff is 10 and
    the bootstrap CI brackets it; identical groups give a CI around 0."""
    from kiara_spark.operators.quality import bootstrap_ab_diff

    rows = ([(i, "A", 10.0 + 50.0 + (i * 17) % 40) for i in range(250)]
            + [(1000 + i, "B", 50.0 + (i * 17) % 40) for i in range(250)])
    df = spark.createDataFrame(rows, "id bigint, grp string, v double")
    r = bootstrap_ab_diff(df, "v", "id", "grp", "A", "B",
                          b_resamples=60).collect()[0]
    assert r.n_a == 250 and r.n_b == 250
    assert r.diff == pytest.approx(10.0, abs=1e-9)
    assert r.ci_lo < 10.0 < r.ci_hi
    assert r.ci_hi - r.ci_lo < 10     # sane interval width
    null_rows = rows + [(5000, "A", None), (5001, "C", 1e9)]
    df2 = spark.createDataFrame(null_rows, "id bigint, grp string, v double")
    r2 = bootstrap_ab_diff(df2, "v", "id", "grp", "A", "B",
                           b_resamples=60).collect()[0]
    # NULL metric and out-of-test groups are excluded rows
    assert (r2.n_a, r2.n_b, r2.diff) == (r.n_a, r.n_b, r.diff)


def test_experiment_readout_example_pipeline(ctx):
    """examples/experiment_readout.json: event log -> per-user covariate/
    metric aggregate -> CUPED variance reduction + A/B bootstrap uplift CI
    — the round-8 experimentation family composed through the pipeline
    surface, per-user frame computed once."""
    import os

    os.chdir("/root/repo")
    out = ctx.run_pipeline("examples/experiment_readout.json", {
        "path": "/root/testdata/sf0.001/events.parquet",
    })
    cuped = out["cuped_readout"].data.collect()[0]
    uplift = out["uplift_ci"].data.collect()[0]
    assert cuped.n > 0 and cuped.var_metric is not None
    assert -100.0 <= (cuped.variance_reduction_pct or 0.0) <= 100.0
    assert uplift.n_a > 0 and uplift.n_b > 0
    assert uplift.ci_lo <= uplift.ci_hi
    assert uplift.b_resamples == 100


def test_bootstrap_ci_excludes_null_values(spark):
    """NULL values are excluded rows: results must equal the NULL-free
    frame exactly (round-7 ADVICE — previously NULLs inflated the count
    and Σw denominators while the sums skipped them)."""
    from kiara_spark.operators.quality import bootstrap_ci_mean

    rows = [(i, float(50 + (i * 13) % 40)) for i in range(300)]
    with_nulls = rows + [(1000 + i, None) for i in range(50)]
    df_clean = spark.createDataFrame(rows, "id bigint, v double")
    df_nulls = spark.createDataFrame(with_nulls, "id bigint, v double")
    rc = bootstrap_ci_mean(df_clean, "v", "id", b_resamples=50).collect()[0]
    rn = bootstrap_ci_mean(df_nulls, "v", "id", b_resamples=50).collect()[0]
    assert rn.n_rows == 300 == rc.n_rows
    assert rn.point_mean == rc.point_mean
    assert (rn.ci_lo, rn.ci_hi) == (rc.ci_lo, rc.ci_hi)
