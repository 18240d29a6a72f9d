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
