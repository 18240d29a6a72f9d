"""Classical-statistics battery (round 8b): Mann-Whitney U, Welch's
t-test, Spearman rank correlation, crosstab association (chi2 / Cramér's
V / mutual information), per-group chi2 GOF with Benjamini-Hochberg FDR,
and Good-Turing smoothing — hand-computed oracles on tiny frames."""

import math

import pytest


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


# ---------------------------------------------------------------------------
# Mann-Whitney U
# ---------------------------------------------------------------------------

def test_mann_whitney_separated_samples(spark):
    """ref strictly below cur: U_ref = 0, U_cur = n1*n2, z < 0."""
    from kiara_spark.operators.quality import mann_whitney_u

    ref = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    cur = spark.createDataFrame([(4.0,), (5.0,), (6.0,)], "v double")
    r = _one(mann_whitney_u(ref, cur, "v"))
    assert (r.n_ref, r.n_cur) == (3, 3)
    assert r.u_ref == 0.0 and r.u_cur == 9.0
    assert r.z < 0
    assert r.cliffs_delta == -1.0  # every ref below every cur


def test_mann_whitney_midranks_and_tie_correction(spark):
    """ref=[1,2,2], cur=[2,3]: the three 2s share midrank (2+3+4)/3 = 3.
    R1 = 1 + 3 + 3 = 7, U1 = 7 - 6 = 1; T = 3^3 - 3 = 24.
    sigma^2 = (6/12)*((5+1) - 24/(5*4)) = 2.4; z = (1-3)/sqrt(2.4)."""
    from kiara_spark.operators.quality import mann_whitney_u

    ref = spark.createDataFrame([(1.0,), (2.0,), (2.0,)], "v double")
    cur = spark.createDataFrame([(2.0,), (3.0,)], "v double")
    r = _one(mann_whitney_u(ref, cur, "v"))
    assert r.u_ref == 1.0 and r.u_cur == 5.0
    assert r.z == pytest.approx(-2.0 / math.sqrt(2.4), abs=1e-6)
    # two-sided p = erfc(|z|/sqrt(2)), A&S approx good to ~1.5e-7
    z = 2.0 / math.sqrt(2.4)
    assert r.p_value == pytest.approx(math.erfc(z / math.sqrt(2)), abs=1e-6)


def test_mann_whitney_identical_samples_centered(spark):
    from kiara_spark.operators.quality import mann_whitney_u

    a = spark.createDataFrame([(float(i),) for i in range(10)], "v double")
    r = _one(mann_whitney_u(a, a, "v"))
    assert r.u_ref == r.u_cur == 50.0
    assert r.z == 0.0 and r.p_value == 1.0
    assert r.cliffs_delta == 0.0


# ---------------------------------------------------------------------------
# Welch's t-test
# ---------------------------------------------------------------------------

def test_welch_matches_hand_computation(spark):
    from kiara_spark.operators.quality import welch_ttest

    xs = [1.25, 2.50, 3.75, 8.00]
    ys = [2.00, 4.00, 9.00]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    r = _one(welch_ttest(df, "g", "v", "a", "b"))

    def mv(s):
        m = sum(s) / len(s)
        return m, sum((x - m) ** 2 for x in s) / (len(s) - 1)

    ma, va = mv(xs)
    mb, vb = mv(ys)
    sea, seb = va / len(xs), vb / len(ys)
    t = (ma - mb) / math.sqrt(sea + seb)
    dfw = (sea + seb) ** 2 / (sea ** 2 / (len(xs) - 1)
                              + seb ** 2 / (len(ys) - 1))
    assert (r.n_a, r.n_b) == (4, 3)
    assert r.mean_a == pytest.approx(ma, abs=1e-6)
    assert r.var_a == pytest.approx(va, abs=1e-6)
    assert r.var_b == pytest.approx(vb, abs=1e-6)
    assert r.t_stat == pytest.approx(t, abs=1e-6)
    assert r.df == pytest.approx(dfw, abs=1e-6)


def test_welch_ignores_nulls_and_foreign_groups(spark):
    from kiara_spark.operators.quality import welch_ttest

    rows = [("a", 1.0), ("a", 3.0), ("a", None), ("b", 2.0), ("b", 6.0),
            ("c", 99.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = _one(welch_ttest(df, "g", "v", "a", "b"))
    assert (r.n_a, r.n_b) == (2, 2)
    assert r.mean_a == 2.0 and r.mean_b == 4.0


# ---------------------------------------------------------------------------
# Spearman
# ---------------------------------------------------------------------------

def test_spearman_perfect_monotone(spark):
    from kiara_spark.operators.quality import spearman_correlation

    rows = [(float(i), float(i * i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "x double, y double")
    assert _one(spearman_correlation(df, "x", "y")).rho == 1.0
    rows = [(float(i), float(-i * i * i)) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "x double, y double")
    assert _one(spearman_correlation(df, "x", "y")).rho == -1.0


def test_spearman_ties_match_pearson_on_midranks(spark):
    from kiara_spark.operators.quality import spearman_correlation

    xs = [1.0, 2.0, 2.0, 3.0, 3.0, 3.0, 5.0]
    ys = [2.0, 1.0, 4.0, 4.0, 6.0, 5.0, 9.0]

    def midranks(vals):
        out = []
        for v in vals:
            below = sum(1 for u in vals if u < v)
            ties = sum(1 for u in vals if u == v)
            out.append(below + (ties + 1) / 2.0)
        return out

    rx, ry = midranks(xs), midranks(ys)
    n = len(xs)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(r * r for r in rx)
    syy = sum(r * r for r in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    rho = ((n * sxy - sx * sy)
           / math.sqrt(n * sxx - sx * sx) / math.sqrt(n * syy - sy * sy))
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    r = _one(spearman_correlation(df, "x", "y"))
    assert r.n == 7
    assert r.rho == pytest.approx(rho, abs=1e-6)


def test_spearman_constant_column_is_null(spark):
    from kiara_spark.operators.quality import spearman_correlation

    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)],
                               "x double, y double")
    assert _one(spearman_correlation(df, "x", "y")).rho is None


# ---------------------------------------------------------------------------
# Crosstab association
# ---------------------------------------------------------------------------

def test_crosstab_independent_is_zero(spark):
    """A 2x2 product distribution: chi2 = 0, V = 0, MI = 0 exactly."""
    from kiara_spark.operators.quality import crosstab_association

    rows = ([("x", "p")] * 6 + [("x", "q")] * 2
            + [("y", "p")] * 3 + [("y", "q")] * 1)
    df = spark.createDataFrame(rows, "a string, b string")
    r = _one(crosstab_association(df, "a", "b"))
    assert (r.n, r.card_a, r.card_b, r.dof) == (12, 2, 2, 1)
    assert r.chi2 == pytest.approx(0.0, abs=1e-6)
    assert r.cramers_v == pytest.approx(0.0, abs=1e-6)
    assert r.mutual_info == pytest.approx(0.0, abs=1e-6)


def test_crosstab_perfect_dependence(spark):
    """b == a over k=3 uniform classes: V = 1, MI = ln 3, chi2 = n*(k-1)."""
    from kiara_spark.operators.quality import crosstab_association

    rows = [(c, c) for c in ("x", "y", "z") for _ in range(4)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = _one(crosstab_association(df, "a", "b"))
    assert r.chi2 == pytest.approx(12 * 2, abs=1e-6)
    assert r.cramers_v == pytest.approx(1.0, abs=1e-6)
    assert r.mutual_info == pytest.approx(math.log(3), abs=1e-6)


# ---------------------------------------------------------------------------
# chi2 GOF + BH
# ---------------------------------------------------------------------------

def test_chi2_bh_uniform_groups_not_significant(spark):
    """Every group shares the pooled mix exactly: chi2 = 0, p = 1."""
    from kiara_spark.operators.quality import chi2_gof_bh

    rows = [(g, c) for g in ("g1", "g2", "g3")
            for c in ("a", "b", "c") for _ in range(5)]
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r.g: r for r in chi2_gof_bh(df, "g", "c").collect()}
    assert len(out) == 3
    for r in out.values():
        assert r.chi2 == pytest.approx(0.0, abs=1e-6)
        assert r.dof == 2
        assert r.p_value == pytest.approx(1.0, abs=1e-6)
        assert r.p_adjusted == pytest.approx(1.0, abs=1e-6)
        assert not r.significant


def test_chi2_bh_skewed_group_detected_and_df2_closed_form(spark):
    """One group heavily skewed: its p = exp(-chi2/2) (df=2), BH keeps
    adjusted p monotone in raw p and the skewed group significant."""
    from kiara_spark.operators.quality import chi2_gof_bh

    rows = ([("even", c) for c in ("a", "b", "c") for _ in range(20)]
            + [("skew", "a")] * 55 + [("skew", "b")] * 4
            + [("skew", "c")] * 1)
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r.g: r for r in chi2_gof_bh(df, "g", "c").collect()}
    skew = out["skew"]
    assert skew.p_value == pytest.approx(
        min(math.exp(-skew.chi2 / 2), 1.0), abs=1e-5)
    assert skew.significant
    assert out["even"].p_value >= skew.p_value
    assert out["even"].p_adjusted >= skew.p_adjusted


def test_chi2_bh_even_df4_uses_two_term_tail(spark):
    """5 categories -> df = 4: p = e^{-x/2}(1 + x/2) (the fold path)."""
    from kiara_spark.operators.quality import chi2_gof_bh

    cats = ["a", "b", "c", "d", "e"]
    rows = ([("u", c) for c in cats for _ in range(10)]
            + [("v", "a")] * 30 + [("v", c) for c in cats[1:]
                                   for _ in range(5)])
    df = spark.createDataFrame(rows, "g string, c string")
    out = {r.g: r for r in chi2_gof_bh(df, "g", "c").collect()}
    v = out["v"]
    assert v.dof == 4
    expect = math.exp(-v.chi2 / 2) * (1 + v.chi2 / 2)
    assert v.p_value == pytest.approx(min(expect, 1.0), abs=1e-5)


def test_chi2_bh_odd_df_p_is_null(spark):
    """Even-df closed form only: 2 categories -> df = 1 -> NULL p."""
    from kiara_spark.operators.quality import chi2_gof_bh

    rows = [("g1", "a")] * 5 + [("g1", "b")] * 5 + [("g2", "a")] * 9 \
        + [("g2", "b")] * 1
    df = spark.createDataFrame(rows, "g string, c string")
    for r in chi2_gof_bh(df, "g", "c").collect():
        assert r.dof == 1
        assert r.p_value is None


# ---------------------------------------------------------------------------
# Good-Turing
# ---------------------------------------------------------------------------

def test_good_turing_textbook_counts(spark):
    """Counts {a,b,c:1, d,e:2, f:3} -> N1=3, N2=2, N3=1, N=10:
    r*(1) = 2*2/3, r*(2) = 3*1/2, r*(3) = NULL (no N4 bucket)."""
    from kiara_spark.operators.text import good_turing

    df = spark.createDataFrame([("a b c d d e e f f f",)], "text string")
    out = {r.r: r for r in good_turing(df, "text").collect()}
    assert out[1].n_r == 3 and out[2].n_r == 2 and out[3].n_r == 1
    assert out[1].r_star == pytest.approx(4.0 / 3.0, abs=1e-6)
    assert out[2].r_star == pytest.approx(1.5, abs=1e-6)
    assert out[3].r_star is None and out[3].p_gt is None
    assert out[1].p_gt == pytest.approx(4.0 / 3.0 / 10.0, abs=1e-9)


def test_good_turing_bigrams_and_max_r(spark):
    """ngram_n=2 counts consecutive bigrams; max_r filters the table but
    the r+1 bucket still feeds r_star at the boundary."""
    from kiara_spark.operators.text import good_turing

    # bigrams: "a b" x2 ("a b a b" has ["a b","b a","a b"]... use 2 docs)
    df = spark.createDataFrame([("a b c",), ("a b d",)], "text string")
    # bigrams: (a,b) x2, (b,c) x1, (b,d) x1 -> N1=2, N2=1
    out = {r.r: r for r in good_turing(df, "text", ngram_n=2).collect()}
    assert out[1].n_r == 2 and out[2].n_r == 1
    assert out[1].r_star == pytest.approx(2 * 1 / 2.0, abs=1e-6)
    out1 = {r.r: r for r in
            good_turing(df, "text", max_r=1, ngram_n=2).collect()}
    assert list(out1) == [1]
    assert out1[1].r_star == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------------------------
# one-way ANOVA
# ---------------------------------------------------------------------------

def test_anova_matches_hand_computation(spark):
    from kiara_spark.operators.quality import anova_oneway

    groups = {"a": [1.0, 2.0, 3.0], "b": [2.0, 4.0, 6.0, 8.0],
              "c": [10.0, 12.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = df.transform(lambda d: anova_oneway(d, "g", "v")).collect()[0]
    allv = [v for vs in groups.values() for v in vs]
    gm = sum(allv) / len(allv)
    ssb = sum(len(vs) * (sum(vs) / len(vs) - gm) ** 2
              for vs in groups.values())
    ssw = sum((v - sum(vs) / len(vs)) ** 2
              for vs in groups.values() for v in vs)
    k, n = 3, len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert (r.k, r.n) == (k, n)
    assert r.ss_between == pytest.approx(ssb, abs=1e-3)
    assert r.ss_within == pytest.approx(ssw, abs=1e-3)
    assert r.f_stat == pytest.approx(f, abs=1e-5)
    assert r.eta_sq == pytest.approx(ssb / (ssb + ssw), abs=1e-5)


def test_anova_identical_groups_zero_f(spark):
    from kiara_spark.operators.quality import anova_oneway

    rows = [(g, v) for g in ("a", "b") for v in (1.0, 2.0, 3.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = anova_oneway(df, "g", "v").collect()[0]
    assert r.ss_between == pytest.approx(0.0, abs=1e-6)
    assert r.f_stat == pytest.approx(0.0, abs=1e-6)


# ---------------------------------------------------------------------------
# Cohen's kappa
# ---------------------------------------------------------------------------

def test_cohens_kappa_perfect_and_chance(spark):
    from kiara_spark.operators.quality import cohens_kappa

    rows = [(c, c) for c in ("x", "y") for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r.po == 1.0 and r.kappa == 1.0

    # independent raters at 50/50: po = pe = 0.5 -> kappa = 0
    rows = [("x", "x"), ("x", "y"), ("y", "x"), ("y", "y")] * 3
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r.po == pytest.approx(0.5, abs=1e-6)
    assert r.pe == pytest.approx(0.5, abs=1e-6)
    assert r.kappa == pytest.approx(0.0, abs=1e-6)


def test_cohens_kappa_textbook_2x2(spark):
    """Classic 2x2: diag 20+15, off-diag 5+10, n=50:
    po = 0.7, pe = (25*30 + 25*20)/2500 = 0.5, kappa = 0.4."""
    from kiara_spark.operators.quality import cohens_kappa

    rows = ([("yes", "yes")] * 20 + [("yes", "no")] * 5
            + [("no", "yes")] * 10 + [("no", "no")] * 15)
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r.n == 50
    assert r.po == pytest.approx(0.7, abs=1e-6)
    assert r.pe == pytest.approx(0.5, abs=1e-6)
    assert r.kappa == pytest.approx(0.4, abs=1e-6)


# ---------------------------------------------------------------------------
# Brown-Forsythe
# ---------------------------------------------------------------------------

def test_levene_bf_equal_spreads_small_f(spark):
    """Same distribution shifted: |x - median| identical -> F = 0."""
    from kiara_spark.operators.quality import levene_bf

    base = [1.0, 2.0, 3.0, 4.0, 5.0]
    rows = [("a", v) for v in base] + [("b", v + 100) for v in base]
    df = spark.createDataFrame(rows, "g string, v double")
    r = levene_bf(df, "g", "v").collect()[0]
    assert (r.k, r.n) == (2, 10)
    assert r.f_stat == pytest.approx(0.0, abs=1e-6)


def test_levene_bf_detects_spread_difference(spark):
    from kiara_spark.operators.quality import levene_bf

    rows = ([("tight", 10.0 + d) for d in (-0.1, -0.05, 0.0, 0.05, 0.1)]
            + [("wide", 10.0 + d) for d in (-30.0, -15.0, 0.0, 15.0, 30.0)])
    df = spark.createDataFrame(rows, "g string, v double")
    r = levene_bf(df, "g", "v").collect()[0]
    assert r.f_stat > 10


def test_levene_bf_uses_lower_median(spark):
    """Even n: the LOWER median by contract (exact order statistic).
    Group [1,2,3,4]: median 2, z = [1,0,1,2]."""
    from kiara_spark.operators.quality import levene_bf

    rows = [("a", float(v)) for v in (1, 2, 3, 4)] \
        + [("b", float(v)) for v in (1, 2, 3, 4)]
    r = levene_bf(spark.createDataFrame(rows, "g string, v double"),
                  "g", "v").collect()[0]
    assert r.f_stat == pytest.approx(0.0, abs=1e-6)  # identical groups


# ---------------------------------------------------------------------------
# Kendall tau-b
# ---------------------------------------------------------------------------

def test_kendall_perfect_and_reversed(spark):
    from kiara_spark.operators.quality import kendall_tau_b

    rows = [(float(i), float(i * i)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = kendall_tau_b(df, "x", "y").collect()[0]
    assert r.n == 8 and r.n_pairs == 28
    assert r.concordant == 28 and r.discordant == 0
    assert r.tau_b == 1.0
    rows = [(float(i), float(-i)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "x double, y double")
    assert kendall_tau_b(df, "x", "y").collect()[0].tau_b == -1.0


def test_kendall_ties_match_hand_formula(spark):
    from kiara_spark.operators.quality import kendall_tau_b

    xs = [1.0, 1.0, 2.0, 2.0, 3.0, 4.0]
    ys = [2.0, 3.0, 3.0, 5.0, 1.0, 5.0]
    c = d = 0
    for i in range(len(xs)):
        for j in range(i + 1, len(xs)):
            sx = (xs[i] > xs[j]) - (xs[i] < xs[j])
            sy = (ys[i] > ys[j]) - (ys[i] < ys[j])
            if sx * sy > 0:
                c += 1
            elif sx * sy < 0:
                d += 1
    n = len(xs)
    n0 = n * (n - 1) / 2

    def ties(vals):
        from collections import Counter
        return sum(t * (t - 1) / 2 for t in Counter(vals).values())

    tau = (c - d) / math.sqrt((n0 - ties(xs)) * (n0 - ties(ys)))
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    r = kendall_tau_b(df, "x", "y").collect()[0]
    assert (r.concordant, r.discordant) == (c, d)
    assert r.tau_b == pytest.approx(tau, abs=1e-6)


def test_kendall_constant_column_null(spark):
    from kiara_spark.operators.quality import kendall_tau_b

    df = spark.createDataFrame([(1.0, 7.0), (2.0, 7.0), (3.0, 7.0)],
                               "x double, y double")
    assert kendall_tau_b(df, "x", "y").collect()[0].tau_b is None


# ---------------------------------------------------------------------------
# SPRT / Page-Hinkley / SRM (sequential experiment monitoring)
# ---------------------------------------------------------------------------

def _mk_events(spark, day_users):
    """[(day, [(user, type), ...])] -> events frame."""
    import datetime
    base = datetime.datetime(2024, 3, 1)
    rows = []
    i = 0
    for day, evs in day_users:
        for u, ty in evs:
            rows.append((i, base + datetime.timedelta(days=day, minutes=u),
                         u, ty, 1.0))
            i += 1
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double")


def test_sprt_llr_accumulates_and_decides(spark):
    """3 days, 10 users/day, all converting: LLR_t = t*10*ln(p1/p0);
    with p0=.4, p1=.5 that's +2.23/day -> crosses ln(.8/.05)=2.77 on
    day 2."""
    from kiara_spark.operators.events import sprt_monitor

    days = [(d, [(u, "purchase") for u in range(10)]) for d in range(3)]
    df = _mk_events(spark, days)
    out = sorted(sprt_monitor(df, 0.4, 0.5).collect(), key=lambda r: r.day)
    la = math.log(0.5 / 0.4)
    for t, r in enumerate(out, start=1):
        assert (r.trials, r.conversions) == (10, 10)
        assert r.llr == pytest.approx(t * 10 * la, abs=1e-5)
    assert out[0].decision == "continue"
    assert out[1].decision == "accept_h1"


def test_sprt_no_conversions_accepts_h0(spark):
    from kiara_spark.operators.events import sprt_monitor

    days = [(d, [(u, "click") for u in range(10)]) for d in range(3)]
    out = sorted(sprt_monitor(_mk_events(spark, days), 0.4, 0.5).collect(),
                 key=lambda r: r.day)
    lb = math.log(0.5 / 0.6)
    assert out[0].llr == pytest.approx(10 * lb, abs=1e-5)
    assert out[-1].decision == "accept_h0"


def test_page_hinkley_flat_series_no_alarm(spark):
    from kiara_spark.operators.events import page_hinkley

    days = [(d, [(u, "click") for u in range(5)]) for d in range(10)]
    out = page_hinkley(_mk_events(spark, days), "value", "ts",
                       delta=0.1, threshold=1.0).collect()
    assert len(out) == 10
    assert not any(r.alarm for r in out)
    # constant mean: m_t = -t*delta, running min is m_t itself -> ph = 0
    for r in out:
        assert r.ph == pytest.approx(0.0, abs=1e-6)


def test_page_hinkley_level_shift_alarms(spark):
    """Mean jumps 1.0 -> 100.0 at day 5: PH must alarm after the jump."""
    import datetime
    from kiara_spark.operators.events import page_hinkley

    base = datetime.datetime(2024, 3, 1)
    rows = []
    i = 0
    for d in range(10):
        v = 1.0 if d < 5 else 100.0
        for u in range(5):
            rows.append((i, base + datetime.timedelta(days=d, minutes=u),
                         u, "click", v))
            i += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double")
    out = sorted(page_hinkley(df, "value", "ts", delta=0.1,
                              threshold=5.0).collect(),
                 key=lambda r: r.day)
    assert not any(r.alarm for r in out[:5])
    assert any(r.alarm for r in out[5:])


def test_srm_balanced_and_biased(spark):
    from kiara_spark.operators.quality import srm_check

    rows = [("a",)] * 500 + [("b",)] * 500
    df = spark.createDataFrame(rows, "v string")
    r = srm_check(df, "v", {"a": 0.5, "b": 0.5}).collect()[0]
    assert (r.n, r.k, r.dof) == (1000, 2, 1)
    assert r.chi2 == 0.0 and r.p_value == 1.0 and not r.srm_detected

    rows = [("a",)] * 600 + [("b",)] * 400
    df = spark.createDataFrame(rows, "v string")
    r = srm_check(df, "v", {"a": 0.5, "b": 0.5}).collect()[0]
    # chi2 = (100^2/500)*2 = 40 -> p ~ 2.5e-10
    assert r.chi2 == pytest.approx(40.0, abs=1e-6)
    assert r.p_value == pytest.approx(math.erfc(math.sqrt(20)), abs=1e-6)
    assert r.srm_detected


def test_srm_even_df_closed_form(spark):
    """Three variants (df=2): p = exp(-chi2/2)."""
    from kiara_spark.operators.quality import srm_check

    rows = [("a",)] * 40 + [("b",)] * 30 + [("c",)] * 30
    df = spark.createDataFrame(rows, "v string")
    r = srm_check(df, "v", {"a": 1 / 3, "b": 1 / 3, "c": 1 / 3}).collect()[0]
    assert r.dof == 2
    assert r.p_value == pytest.approx(
        min(math.exp(-r.chi2 / 2), 1.0), abs=1e-5)


def test_srm_ignores_foreign_groups(spark):
    from kiara_spark.operators.quality import srm_check

    rows = [("a",)] * 10 + [("b",)] * 10 + [("zzz",)] * 99
    df = spark.createDataFrame(rows, "v string")
    r = srm_check(df, "v", {"a": 0.5, "b": 0.5}).collect()[0]
    assert r.n == 20 and r.chi2 == 0.0


# ---------------------------------------------------------------------------
# Mood's median / two-proportion z / Heaps / burstiness
# ---------------------------------------------------------------------------

def test_mood_median_identical_groups(spark):
    from kiara_spark.operators.quality import mood_median_test

    rows = [(g, float(v)) for g in ("a", "b", "c")
            for v in (1, 2, 3, 4, 5, 6)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mood_median_test(df, "g", "v").collect()[0]
    assert (r.k, r.n) == (3, 18)
    assert r.pooled_median == 3.0  # lower median of 1..6
    assert r.chi2 == pytest.approx(0.0, abs=1e-6)
    assert r.dof == 2
    assert r.p_value == pytest.approx(1.0, abs=1e-6)


def test_mood_median_shifted_group_detected(spark):
    from kiara_spark.operators.quality import mood_median_test

    rows = ([("lo", float(v)) for v in range(1, 21)]
            + [("hi", float(v)) for v in range(100, 120)]
            + [("mid", float(v)) for v in range(10, 110, 5)])
    df = spark.createDataFrame(rows, "g string, v double")
    r = mood_median_test(df, "g", "v").collect()[0]
    assert r.chi2 > 20
    assert r.p_value == pytest.approx(
        min(math.exp(-r.chi2 / 2), 1.0), abs=1e-5)


def test_two_prop_z_hand_computed(spark):
    """a: 30/100, b: 20/100 -> pooled p=0.25,
    z = 0.1/sqrt(0.25*0.75*0.02)."""
    from kiara_spark.operators.quality import two_proportion_z
    from pyspark.sql import functions as F

    rows = ([("a", 1)] * 30 + [("a", 0)] * 70
            + [("b", 1)] * 20 + [("b", 0)] * 80)
    df = spark.createDataFrame(rows, "g string, f int")
    r = two_proportion_z(df, "g", F.col("f") == 1, "a", "b").collect()[0]
    z = 0.1 / math.sqrt(0.25 * 0.75 * 0.02)
    assert (r.n_a, r.n_b, r.conv_a, r.conv_b) == (100, 100, 30, 20)
    assert r.rate_a == 0.3 and r.rate_b == 0.2
    assert r.z == pytest.approx(z, abs=1e-6)
    assert r.p_value == pytest.approx(math.erfc(z / math.sqrt(2)),
                                      abs=1e-6)


def test_two_prop_z_equal_rates_p_one(spark):
    from kiara_spark.operators.quality import two_proportion_z
    from pyspark.sql import functions as F

    rows = [("a", 1)] * 10 + [("a", 0)] * 10 \
        + [("b", 1)] * 10 + [("b", 0)] * 10
    df = spark.createDataFrame(rows, "g string, f int")
    r = two_proportion_z(df, "g", F.col("f") == 1, "a", "b").collect()[0]
    assert r.z == 0.0 and r.p_value == 1.0


def test_heaps_law_recovers_exact_power_law(spark):
    """Docs engineered so V = 2 * N^0.5 exactly at N in {4,16,64}:
    log-log OLS must recover beta=0.5, K=2, r2=1."""
    from kiara_spark.operators.text import heaps_law_fit

    docs = []
    for n, v in ((4, 4), (16, 8), (64, 16)):
        # v distinct words, each repeated n/v times -> N=n, V=v
        words = [f"w{i}" for i in range(v)] * (n // v)
        docs.append((" ".join(words),))
    df = spark.createDataFrame(docs, "text string")
    r = heaps_law_fit(df, "text").collect()[0]
    assert r.n_docs == 3
    assert r.beta == pytest.approx(0.5, abs=1e-4)
    assert r.k_coef == pytest.approx(2.0, abs=1e-3)
    assert r.r2 == pytest.approx(1.0, abs=1e-6)


def test_heaps_law_grouped_and_filters_short_docs(spark):
    from kiara_spark.operators.text import heaps_law_fit

    docs = [("en", "a b c d"), ("en", "a a b b c c d d"),
            ("en", "a b a b a b a b a b a b a b a b"),
            ("de", "x"),  # 1 token: filtered
            ("de", "x y x y"), ("de", "x y z w x y z w")]
    df = spark.createDataFrame(docs, "lang string, text string")
    out = {r.lang: r for r in
           heaps_law_fit(df, "text", group_col="lang").collect()}
    assert out["en"].n_docs == 3
    assert out["de"].n_docs == 2


def test_term_burstiness_bursty_vs_uniform(spark):
    """'uni' appears once in every doc (VMR -> 0 over identical counts);
    'burst' clumps all its mass in one doc (VMR >> 1)."""
    from kiara_spark.operators.text import term_burstiness

    docs = [(0, "uni " + "burst " * 9), (1, "uni"), (2, "uni"), (3, "uni")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r.word: r for r in term_burstiness(df, "text", top_k=5).collect()}
    assert out["uni"].docs_present == 4
    assert out["uni"].vmr == pytest.approx(0.0, abs=1e-6)
    assert out["burst"].docs_present == 1
    # mean 9/4, var = (81 - 81/4)/3 = 20.25 -> vmr = 9
    assert out["burst"].vmr == pytest.approx(9.0, abs=1e-6)
    assert out["burst"].total_count == 9


def test_term_burstiness_topk_by_total(spark):
    from kiara_spark.operators.text import term_burstiness

    docs = [(0, "a a a b b c"), (1, "c")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = term_burstiness(df, "text", top_k=2).collect()
    assert [r.word for r in out] == ["a", "b"]


def test_term_burstiness_single_doc_null_vmr(spark):
    from kiara_spark.operators.text import term_burstiness

    docs = [(0, "a a a b b c")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = term_burstiness(df, "text", top_k=2).collect()
    assert [r.word for r in out] == ["a", "b"]
    assert all(r.vmr is None for r in out)


# ---------------------------------------------------------------------------
# McNemar / Lin's CCC
# ---------------------------------------------------------------------------

def test_mcnemar_textbook(spark):
    """n01=15, n10=5: chi2 = 100/20 = 5, p = erfc(sqrt(2.5))."""
    from kiara_spark.operators.quality import mcnemar_test
    from pyspark.sql import functions as F

    rows = ([(1, 1)] * 30 + [(1, 0)] * 15 + [(0, 1)] * 5 + [(0, 0)] * 50)
    df = spark.createDataFrame(rows, "a int, b int")
    r = mcnemar_test(df, F.col("a") == 1, F.col("b") == 1).collect()[0]
    assert (r.n, r.n_both, r.n_only_a, r.n_only_b, r.n_neither) == \
        (100, 30, 15, 5, 50)
    assert r.chi2 == pytest.approx(5.0, abs=1e-6)
    assert r.p_value == pytest.approx(math.erfc(math.sqrt(2.5)), abs=1e-6)


def test_mcnemar_symmetric_flips_p_one(spark):
    from kiara_spark.operators.quality import mcnemar_test
    from pyspark.sql import functions as F

    rows = [(1, 0)] * 7 + [(0, 1)] * 7
    df = spark.createDataFrame(rows, "a int, b int")
    r = mcnemar_test(df, F.col("a") == 1, F.col("b") == 1).collect()[0]
    assert r.chi2 == 0.0 and r.p_value == 1.0


def test_mcnemar_no_discordant_null(spark):
    from kiara_spark.operators.quality import mcnemar_test
    from pyspark.sql import functions as F

    rows = [(1, 1)] * 5 + [(0, 0)] * 5
    df = spark.createDataFrame(rows, "a int, b int")
    r = mcnemar_test(df, F.col("a") == 1, F.col("b") == 1).collect()[0]
    assert r.chi2 is None and r.p_value is None


def test_ccc_perfect_agreement(spark):
    from kiara_spark.operators.quality import concordance_ccc

    rows = [(float(v), float(v)) for v in range(1, 11)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = concordance_ccc(df, "x", "y").collect()[0]
    assert r.pearson_r == 1.0 and r.ccc == 1.0 and r.bias_factor == 1.0


def test_ccc_punishes_scale_bias_r_does_not(spark):
    """y = 2x: r = 1 but CCC = 2*cov/(vx+vy) = 2*2v/(v+4v) = 0.8 for
    centered... compute exactly from population moments."""
    from kiara_spark.operators.quality import concordance_ccc

    xs = [float(v) for v in range(1, 11)]
    ys = [2.0 * v for v in xs]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    vx = sum(x * x for x in xs) / n - mx * mx
    vy = sum(y * y for y in ys) / n - my * my
    cov = sum(x * y for x, y in zip(xs, ys)) / n - mx * my
    ccc = 2 * cov / (vx + vy + (mx - my) ** 2)
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    r = concordance_ccc(df, "x", "y").collect()[0]
    assert r.pearson_r == 1.0
    assert r.ccc == pytest.approx(ccc, abs=1e-6)
    assert r.ccc < 0.6  # heavy scale bias on this range
    assert r.bias_factor == pytest.approx(ccc, abs=1e-6)  # r = 1


# ---------------------------------------------------------------------------
# Yuen's trimmed t-test
# ---------------------------------------------------------------------------

def _yuen_hand(xs, ys, trim=0.2):
    def side(s):
        s = sorted(s)
        n = len(s)
        k = int(math.floor(n * trim))
        mid = s[k:n - k]
        h = n - 2 * k
        wins = [s[k]] * k + mid + [s[n - k - 1]] * k
        mw = sum(wins) / n
        s2w = sum((w - mw) ** 2 for w in wins) / (n - 1)
        xt = sum(mid) / h
        d = s2w * (n - 1) / (h * (h - 1))
        return xt, d, h
    xta, da, ha = side(xs)
    xtb, db, hb = side(ys)
    t = (xta - xtb) / math.sqrt(da + db)
    dfw = (da + db) ** 2 / (da ** 2 / (ha - 1) + db ** 2 / (hb - 1))
    return xta, xtb, t, dfw


def test_yuen_matches_hand_computation(spark):
    from kiara_spark.operators.quality import yuen_trimmed_ttest

    xs = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0]
    ys = [3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 11.0, 500.0]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    r = yuen_trimmed_ttest(df, "g", "v", "a", "b", trim=0.2).collect()[0]
    xta, xtb, t, dfw = _yuen_hand(xs, ys)
    assert (r.n_a, r.n_b, r.h_a, r.h_b) == (10, 10, 6, 6)
    assert r.trimmed_mean_a == pytest.approx(xta, abs=1e-6)
    assert r.trimmed_mean_b == pytest.approx(xtb, abs=1e-6)
    assert r.t_stat == pytest.approx(t, abs=1e-5)
    assert r.df == pytest.approx(dfw, abs=1e-4)


def test_yuen_outlier_immune_where_welch_is_not(spark):
    """A single huge outlier shifts Welch's mean but not the trimmed
    mean: Yuen's |t| stays large, flagging the genuine shift."""
    from kiara_spark.operators.quality import (welch_ttest,
                                               yuen_trimmed_ttest)

    xs = [float(v) for v in range(1, 21)]            # mean 10.5
    ys = [v + 10.0 for v in xs[:-1]] + [-5000.0]     # shifted +10, 1 outlier
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    w = welch_ttest(df, "g", "v", "a", "b").collect()[0]
    y = yuen_trimmed_ttest(df, "g", "v", "a", "b").collect()[0]
    # Welch can't see the shift through the outlier's variance
    assert abs(w.t_stat) < 2
    assert abs(y.t_stat) > 3
    assert y.trimmed_mean_b > y.trimmed_mean_a + 8


def test_yuen_ties_and_duplicate_boundaries(spark):
    """Heavy ties across the trim boundary exercise the rank-overlap
    algebra (values spanning k and n-k ranks split exactly)."""
    from kiara_spark.operators.quality import yuen_trimmed_ttest

    xs = [1.0] * 4 + [2.0] * 4 + [3.0] * 2
    ys = [1.0] * 2 + [2.0] * 6 + [3.0] * 2
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, "g string, v double")
    r = yuen_trimmed_ttest(df, "g", "v", "a", "b", trim=0.2).collect()[0]
    xta, xtb, t, dfw = _yuen_hand(xs, ys)
    assert r.trimmed_mean_a == pytest.approx(xta, abs=1e-6)
    assert r.trimmed_mean_b == pytest.approx(xtb, abs=1e-6)
    assert r.t_stat == pytest.approx(t, abs=1e-5)


# ---------------------------------------------------------------------------
# experiment_guardrails example pipeline
# ---------------------------------------------------------------------------

def test_experiment_guardrails_example_pipeline(ctx):
    """examples/experiment_guardrails.json: event log -> per-user frame
    (computed once) -> SRM chi2 gate + two-proportion conversion z +
    Yuen robust uplift — the pre-readout health battery composed through
    the pipeline surface."""
    import os

    os.chdir("/root/repo")
    out = ctx.run_pipeline("examples/experiment_guardrails.json", {
        "path": "/root/testdata/sf0.001/events.parquet",
    })
    srm = out["srm_gate"].data.collect()[0]
    conv = out["conversion_z"].data.collect()[0]
    robust = out["robust_uplift"].data.collect()[0]
    assert srm.n > 0 and srm.dof == 1
    assert 0.0 <= srm.p_value <= 1.0
    assert conv.n_a + conv.n_b == srm.n
    assert 0.0 <= conv.rate_a <= 1.0 and 0.0 <= conv.rate_b <= 1.0
    assert robust.h_a <= robust.n_a and robust.h_b <= robust.n_b
    assert robust.df is not None
    # round 10: the CUPED variance-reduced readout rides the same
    # per-user frame (pre-period purchase count as the covariate)
    cuped = out["cuped_readout"].data.collect()[0]
    assert cuped.n_a + cuped.n_b == srm.n
    if cuped.theta is not None:
        assert cuped.var_reduction_pct >= 0.0
        assert cuped.adj_mean_a is not None
    if cuped.p_value is not None:
        assert 0.0 <= cuped.p_value <= 1.0


def test_two_prop_z_degenerate_pooled_rate_null(spark):
    """All (or no) conversions leave zero pooled variance: z and p are
    NULL by contract rather than an ANSI divide-by-zero."""
    from kiara_spark.operators.quality import two_proportion_z
    from pyspark.sql import functions as F

    rows = [("a", 1)] * 5 + [("b", 1)] * 5
    df = spark.createDataFrame(rows, "g string, f int")
    r = two_proportion_z(df, "g", F.col("f") == 1, "a", "b").collect()[0]
    assert r.rate_a == 1.0 and r.rate_b == 1.0
    assert r.z is None and r.p_value is None


def test_corpus_health_example_pipeline(ctx):
    """examples/corpus_health.json: documents -> Heaps fit + Good-Turing
    table + burstiness ranking — the statistical-law corpus report
    through the pipeline surface."""
    import os

    os.chdir("/root/repo")
    out = ctx.run_pipeline("examples/corpus_health.json", {
        "path": "/root/testdata/sf0.001/documents.parquet",
    })
    heaps = out["heaps_fit"].data.collect()
    gt = out["good_turing_table"].data.collect()
    bursty = out["bursty_terms"].data.collect()
    assert len(heaps) == 1  # ungrouped fit (module default)
    assert heaps[0].n_docs > 0 and heaps[0].beta is not None
    assert all(r.n_r > 0 for r in gt)
    assert 0 < len(bursty) <= 20
    assert all(r.total_count >= 1 for r in bursty)


# ---------------------------------------------------------------------------
# _prefix_sums helper (the range-partitioned prefix recipe)
# ---------------------------------------------------------------------------

def test_prefix_sums_matches_single_window_reference(spark):
    """Exclusive + inclusive + descending prefix sums over a grid wide
    enough to span many range partitions must equal the plain
    single-window computation exactly (the boundary fold is the part a
    tiny one-partition frame never exercises)."""
    from kiara_spark.operators.quality import _prefix_sums
    from pyspark.sql import functions as F

    rows = [(float(v), (v * 7) % 5 + 1) for v in range(1, 2001)]
    grid = (spark.createDataFrame(rows, "v double, c int")
            .select(F.col("v").cast("decimal(38,6)").alias("v"),
                    F.col("c").cast("decimal(38,0)").alias("c")))

    def reference(desc, inclusive):
        out = {}
        acc = 0
        for v, c in sorted(rows, key=lambda r: -r[0] if desc else r[0]):
            if inclusive:
                acc += c
                out[v] = acc
            else:
                out[v] = acc
                acc += c
        return out

    for desc in (False, True):
        for inc in (False, True):
            got = {float(r["v"]): int(r["p"]) for r in
                   _prefix_sums(grid, "v", [("c", "p")],
                                inclusive=inc, descending=desc).collect()}
            assert got == reference(desc, inc), (desc, inc)


def test_prefix_sums_multiple_typed_columns(spark):
    from kiara_spark.operators.quality import _prefix_sums
    from pyspark.sql import functions as F

    rows = [(float(v), 1, round(v * 0.5, 2)) for v in range(1, 501)]
    grid = (spark.createDataFrame(rows, "v double, c int, w double")
            .select(F.col("v").cast("decimal(38,6)").alias("v"),
                    F.col("c").cast("decimal(38,0)").alias("c"),
                    F.col("w").cast("decimal(38,2)").alias("w")))
    out = _prefix_sums(grid, "v",
                       [("c", "pc"), ("w", "pw", "decimal(38,2)")],
                       inclusive=True).collect()
    by_v = {float(r["v"]): r for r in out}
    accc, accw = 0, 0.0
    for v, c, w in sorted(rows):
        accc += c
        accw = round(accw + w, 2)
        assert int(by_v[v]["pc"]) == accc
        assert float(by_v[v]["pw"]) == pytest.approx(accw, abs=1e-9)


# ---------------------------------------------------------------------------
# quantile normalization
# ---------------------------------------------------------------------------

def test_quantile_normalize_identical_groups_identity(spark):
    """Target distribution == reference distribution: every value maps
    to itself."""
    from kiara_spark.operators.quality import quantile_normalize_map

    vals = [1.0, 2.0, 3.0, 4.0, 5.0]
    rows = [("ref", v) for v in vals] + [("t", v) for v in vals]
    df = spark.createDataFrame(rows, "g string, v double")
    out = quantile_normalize_map(df, "g", "v", "ref", "t").collect()
    assert len(out) == 5
    for r in out:
        assert r.mapped_value == r.value


def test_quantile_normalize_shift_and_scale(spark):
    """Target = 2*ref + 100 rank-for-rank: the mapping must recover the
    reference values exactly (same shapes, different scale/location)."""
    from kiara_spark.operators.quality import quantile_normalize_map

    ref = [float(v) for v in range(1, 11)]
    tgt = [2.0 * v + 100.0 for v in ref]
    rows = [("ref", v) for v in ref] + [("t", v) for v in tgt]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.value: r.mapped_value for r in
           quantile_normalize_map(df, "g", "v", "ref", "t").collect()}
    for rv, tv in zip(ref, tgt):
        assert out[tv] == rv


def test_quantile_normalize_midrank_quantiles_and_ties(spark):
    """Duplicated target values share one mapping row with the midrank
    quantile; quantile = (2*prev + c)/(2*n)."""
    from kiara_spark.operators.quality import quantile_normalize_map

    rows = ([("ref", float(v)) for v in range(1, 101)]
            + [("t", 5.0)] * 4 + [("t", 9.0)] * 6)
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.value: r for r in
           quantile_normalize_map(df, "g", "v", "ref", "t").collect()}
    assert len(out) == 2
    assert out[5.0].n_rows == 4
    assert out[5.0].quantile == pytest.approx(4 / 20, abs=1e-9)
    # q=0.2 over ref 1..100 -> smallest cum/100 >= 0.2 -> value 20
    assert out[5.0].mapped_value == 20.0
    assert out[9.0].quantile == pytest.approx((8 + 6) / 20, abs=1e-9)
    assert out[9.0].mapped_value == 70.0


# ---------------------------------------------------------------------------
# Kruskal-Wallis
# ---------------------------------------------------------------------------

def _kw_hand(groups):
    """scipy-free Kruskal-Wallis with midranks and tie correction."""
    allv = [(v, g) for g, vs in groups.items() for v in vs]
    n = len(allv)
    vals = [v for v, _ in allv]

    def midrank(v):
        below = sum(1 for u in vals if u < v)
        ties = sum(1 for u in vals if u == v)
        return below + (ties + 1) / 2.0

    rsum = {g: sum(midrank(v) for v in vs) for g, vs in groups.items()}
    h = (12.0 / (n * (n + 1))
         * sum(r * r / len(groups[g]) for g, r in rsum.items())
         - 3 * (n + 1))
    from collections import Counter
    t = sum(c ** 3 - c for c in Counter(vals).values())
    return h / (1 - t / (n ** 3 - n))


def test_kruskal_wallis_matches_hand_formula(spark):
    from kiara_spark.operators.quality import kruskal_wallis

    groups = {"a": [1.0, 3.0, 5.0, 7.0], "b": [2.0, 4.0, 6.0, 8.0],
              "c": [20.0, 21.0, 22.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert (r.k, r.n, r.dof) == (3, 11, 2)
    assert r.h_stat == pytest.approx(_kw_hand(groups), abs=1e-5)
    assert r.p_value == pytest.approx(
        min(math.exp(-r.h_stat / 2), 1.0), abs=1e-5)


def test_kruskal_wallis_ties_and_identical_groups(spark):
    from kiara_spark.operators.quality import kruskal_wallis

    groups = {"a": [1.0, 2.0, 2.0, 3.0], "b": [1.0, 2.0, 2.0, 3.0],
              "c": [1.0, 2.0, 2.0, 3.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert r.h_stat == pytest.approx(0.0, abs=1e-6)
    assert r.p_value == pytest.approx(1.0, abs=1e-6)
    # tie-corrected hand value on a tied, shifted configuration
    groups2 = {"a": [1.0, 1.0, 2.0], "b": [2.0, 3.0, 3.0],
               "c": [4.0, 4.0, 5.0]}
    rows2 = [(g, v) for g, vs in groups2.items() for v in vs]
    r2 = kruskal_wallis(
        spark.createDataFrame(rows2, "g string, v double"),
        "g", "v").collect()[0]
    assert r2.h_stat == pytest.approx(_kw_hand(groups2), abs=1e-5)


# ---------------------------------------------------------------------------
# Nelson-Aalen / log-rank survival
# ---------------------------------------------------------------------------

def test_nelson_aalen_textbook(spark):
    """5 subjects, deaths at 1,2,3 and censorings at 2.5, 4:
    H(1)=1/5, H(2)=1/5+1/4, H(3)=1/5+1/4+1/2."""
    from kiara_spark.operators.events import nelson_aalen

    rows = [(1.0, 1), (2.0, 1), (2.5, 0), (3.0, 1), (4.0, 0)]
    df = spark.createDataFrame(rows, "dur double, ev int")
    out = {r.t: r for r in nelson_aalen(df, "dur", "ev").collect()}
    assert list(sorted(out)) == [1.0, 2.0, 3.0]
    assert out[1.0].n_risk == 5
    assert out[1.0].cum_hazard == pytest.approx(0.2, abs=1e-6)
    assert out[2.0].cum_hazard == pytest.approx(0.45, abs=1e-6)
    assert out[3.0].cum_hazard == pytest.approx(0.95, abs=1e-6)
    assert out[1.0].var_hazard == pytest.approx(4 / 125, abs=1e-6)
    assert out[3.0].survival_fh == pytest.approx(math.exp(-0.95), abs=1e-5)


def test_logrank_identical_curves_p_near_one(spark):
    from kiara_spark.operators.events import logrank_test

    rows = [(g, float(t), 1) for g in ("a", "b") for t in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, dur double, ev int")
    r = logrank_test(df, "dur", "ev", "g", "a", "b").collect()[0]
    assert (r.n_a, r.n_b, r.events_a, r.events_b) == (10, 10, 10, 10)
    assert abs(r.o_minus_e) < 1e-6
    assert r.chi2 == pytest.approx(0.0, abs=1e-6)
    assert r.p_value == pytest.approx(1.0, abs=1e-5)


def test_logrank_separated_curves_significant(spark):
    """Group a all dies early, group b all dies late: strongly
    significant."""
    from kiara_spark.operators.events import logrank_test

    rows = ([("a", float(t), 1) for t in range(1, 11)]
            + [("b", float(t), 1) for t in range(100, 110)])
    df = spark.createDataFrame(rows, "g string, dur double, ev int")
    r = logrank_test(df, "dur", "ev", "g", "a", "b").collect()[0]
    assert r.chi2 > 10
    assert r.p_value < 0.01


def test_logrank_censoring_respected(spark):
    """Censored subjects leave the risk set without counting as events."""
    from kiara_spark.operators.events import logrank_test

    rows = ([("a", 1.0, 1), ("a", 2.0, 0), ("a", 3.0, 1)]
            + [("b", 1.5, 0), ("b", 2.5, 1), ("b", 4.0, 1)])
    df = spark.createDataFrame(rows, "g string, dur double, ev int")
    r = logrank_test(df, "dur", "ev", "g", "a", "b").collect()[0]
    assert (r.events_a, r.events_b) == (2, 2)
    assert r.variance > 0


# ---------------------------------------------------------------------------
# Mann-Kendall trend + Sen's slope
# ---------------------------------------------------------------------------

def test_mann_kendall_monotone_series(spark):
    """Strictly rising daily means: S = n(n-1)/2, Sen's slope = the
    common difference, p small."""
    import datetime
    from kiara_spark.operators.events import mann_kendall_trend

    base = datetime.datetime(2024, 5, 1)
    rows = []
    i = 0
    for d in range(12):
        for u in range(3):
            rows.append((i, base + datetime.timedelta(days=d, minutes=u),
                         u, "click", 10.0 + 2.0 * d))
            i += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double")
    r = mann_kendall_trend(df, "ts", "value").collect()[0]
    assert r.n_buckets == 12
    assert r.s_stat == 12 * 11 // 2
    assert r.sen_slope == pytest.approx(2.0, abs=1e-6)
    assert r.p_value < 0.01


def test_mann_kendall_flat_series_no_trend(spark):
    import datetime
    from kiara_spark.operators.events import mann_kendall_trend

    base = datetime.datetime(2024, 5, 1)
    rows = [(d, base + datetime.timedelta(days=d), 1, "click", 7.0)
            for d in range(10)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double")
    r = mann_kendall_trend(df, "ts", "value").collect()[0]
    assert r.s_stat == 0 and r.z == 0.0
    assert r.var_s == 0.0 and r.p_value is None  # all tied: no variance
    assert r.sen_slope == 0.0


def test_mann_kendall_count_mode_and_outlier_robust_slope(spark):
    """value_col=None trends the daily COUNT; one spike day cannot bend
    Sen's slope away from the underlying +1/day."""
    import datetime
    from kiara_spark.operators.events import mann_kendall_trend

    base = datetime.datetime(2024, 5, 1)
    rows = []
    i = 0
    for d in range(11):
        cnt = 1000 if d == 5 else 5 + d
        for k in range(cnt):
            rows.append((i, base + datetime.timedelta(days=d, seconds=k),
                         k, "click", 1.0))
            i += 1
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double")
    r = mann_kendall_trend(df, "ts").collect()[0]
    assert r.n_buckets == 11
    assert r.sen_slope == pytest.approx(1.0, abs=0.3)


def test_split_cast_bit_exact_vs_python_reference(spark):
    """_split_cast(decimal) must equal Python's correctly-rounded
    float(Decimal) BIT-EXACTLY while the integer part is < 2^53 —
    including scale-12 values whose naive c - floor(c) extraction loses
    digits 7-12 to Spark's precision-loss rule, and negatives."""
    import decimal as pydec
    import random

    from kiara_spark.operators.quality import _split_cast
    from pyspark.sql import functions as F

    rng = random.Random(20260815)
    vals = []
    for _ in range(200):
        intpart = rng.randint(0, 9_000_000_000_000_000)  # < 2^53
        frac = rng.randint(0, 999_999_999_999)
        sign = rng.choice(("", "-"))
        vals.append(pydec.Decimal(f"{sign}{intpart}.{frac:012d}"))
    vals += [pydec.Decimal("0"), pydec.Decimal("-0.000000000001"),
             pydec.Decimal("0.004737609"), pydec.Decimal("-2.5")]
    df = spark.createDataFrame([(str(v),) for v in vals], "s string")
    out = df.select(
        "s", _split_cast(F.col("s").cast("decimal(38,12)")).alias("d")
    ).collect()
    for r in out:
        assert r.d == float(pydec.Decimal(r.s)), r.s


# ---------------------------------------------------------------------------
# Wilcoxon signed-rank
# ---------------------------------------------------------------------------

def test_wilcoxon_textbook_and_zero_drop(spark):
    """Pairs with diffs [+1,+2,+3,-1,0]: zero dropped, |d| grid
    {1:2, 2:1, 3:1}; midranks: |1| -> 1.5, |2| -> 3, |3| -> 4.
    W+ = 1.5+3+4 = 8.5, W- = 1.5, n=4, W+ + W- = 10."""
    from kiara_spark.operators.quality import wilcoxon_signed_rank

    pairs = [(10.0, 9.0), (10.0, 8.0), (10.0, 7.0), (9.0, 10.0),
             (5.0, 5.0)]
    df = spark.createDataFrame(pairs, "x double, y double")
    r = wilcoxon_signed_rank(df, "x", "y").collect()[0]
    assert r.n_nonzero == 4
    assert r.w_plus == pytest.approx(8.5, abs=1e-9)
    assert r.w_minus == pytest.approx(1.5, abs=1e-9)
    assert r.w_plus + r.w_minus == pytest.approx(10.0, abs=1e-9)


def test_wilcoxon_symmetric_diffs_z_zero(spark):
    from kiara_spark.operators.quality import wilcoxon_signed_rank

    pairs = [(1.0, 0.0), (0.0, 1.0), (2.0, 0.0), (0.0, 2.0)]
    df = spark.createDataFrame(pairs, "x double, y double")
    r = wilcoxon_signed_rank(df, "x", "y").collect()[0]
    assert r.w_plus == r.w_minus
    assert r.z == 0.0 and r.p_value == 1.0


def test_wilcoxon_one_sided_dominance(spark):
    from kiara_spark.operators.quality import wilcoxon_signed_rank

    pairs = [(float(10 + i), float(i)) for i in range(15)]
    df = spark.createDataFrame(pairs, "x double, y double")
    r = wilcoxon_signed_rank(df, "x", "y").collect()[0]
    assert r.w_minus == 0.0
    assert r.z > 3 and r.p_value < 0.01


# ---------------------------------------------------------------------------
# Friedman test
# ---------------------------------------------------------------------------

def test_friedman_textbook_hand_formula(spark):
    """3 treatments over 4 blocks, no ties: chi2_F from the hand
    formula (scipy-free)."""
    from kiara_spark.operators.quality import friedman_test

    data = {  # block -> {treatment: value}
        1: {"a": 1.0, "b": 2.0, "c": 3.0},
        2: {"a": 1.0, "b": 3.0, "c": 2.0},
        3: {"a": 1.0, "b": 2.0, "c": 3.0},
        4: {"a": 2.0, "b": 1.0, "c": 3.0},
    }
    rows = [(b, t, v) for b, tv in data.items() for t, v in tv.items()]
    df = spark.createDataFrame(rows, "b int, t string, v double")
    r = friedman_test(df, "b", "t", "v").collect()[0]
    # within-block ranks -> R_a=5, R_b=8, R_c=11; n=4, k=3
    n, k = 4, 3
    chi = (12.0 / (n * k * (k + 1))) * (25 + 64 + 121) - 3 * n * (k + 1)
    assert (r.n_blocks, r.k, r.dof) == (4, 3, 2)
    assert r.chi2_f == pytest.approx(chi, abs=1e-6)
    assert r.p_value == pytest.approx(min(math.exp(-chi / 2), 1.0),
                                      abs=1e-5)


def test_friedman_identical_rankings_max_chi(spark):
    """Every block ranks a<b<c identically: chi2 = n(k-1) max... and
    incomplete blocks are dropped."""
    from kiara_spark.operators.quality import friedman_test

    rows = [(b, t, v) for b in range(1, 7)
            for t, v in (("a", 1.0), ("b", 2.0), ("c", 3.0))]
    rows += [(99, "a", 1.0)]  # incomplete block: dropped
    df = spark.createDataFrame(rows, "b int, t string, v double")
    r = friedman_test(df, "b", "t", "v").collect()[0]
    assert r.n_blocks == 6
    n, k = 6, 3
    chi = (12.0 / (n * k * (k + 1))) * (n * n * (1 + 4 + 9)) \
        - 3 * n * (k + 1)
    assert r.chi2_f == pytest.approx(chi, abs=1e-6)


def test_friedman_within_block_ties_midranked(spark):
    """A block with two tied values gives both the midrank and feeds
    the tie correction."""
    from kiara_spark.operators.quality import friedman_test

    rows = [(1, "a", 1.0), (1, "b", 2.0), (1, "c", 2.0),
            (2, "a", 1.0), (2, "b", 2.0), (2, "c", 3.0)]
    df = spark.createDataFrame(rows, "b int, t string, v double")
    r = friedman_test(df, "b", "t", "v").collect()[0]
    # block1 ranks: a=1, b=c=2.5; block2: 1,2,3
    # R_a=2, R_b=4.5, R_c=5.5; chi_u = (12/(2*3*4))*(4+20.25+30.25) - 24
    chi_u = (12.0 / 24.0) * (4 + 20.25 + 30.25) - 24
    corr = 1 - (2 ** 3 - 2) / (2 * 3 * 8)
    assert r.chi2_f == pytest.approx(chi_u / corr, abs=1e-5)


# ---------------------------------------------------------------------------
# Jarque-Bera / Cochran's Q / Bartlett / Durbin-Watson
# ---------------------------------------------------------------------------

def test_jarque_bera_symmetric_flat_distribution(spark):
    """A symmetric distribution has skew ~ 0; a uniform one has excess
    kurtosis ~ -1.2 — JB flags it as non-normal."""
    from kiara_spark.operators.quality import jarque_bera

    rows = [(float(v),) for v in range(1, 1001)]
    df = spark.createDataFrame(rows, "v double")
    r = jarque_bera(df, "v").collect()[0]
    assert r.n == 1000
    assert r.skewness == pytest.approx(0.0, abs=1e-6)
    assert r.ex_kurtosis == pytest.approx(-1.2, abs=0.01)
    assert r.jb_stat > 10 and r.p_value < 0.01


def test_jarque_bera_matches_hand_moments(spark):
    from kiara_spark.operators.quality import jarque_bera

    vals = [1.25, 2.5, 2.5, 3.0, 7.75, 9.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    r = jarque_bera(df, "v").collect()[0]
    n = len(vals)
    mu = sum(vals) / n
    m2 = sum((v - mu) ** 2 for v in vals) / n
    m3 = sum((v - mu) ** 3 for v in vals) / n
    m4 = sum((v - mu) ** 4 for v in vals) / n
    skew, exk = m3 / m2 ** 1.5, m4 / m2 ** 2 - 3
    jb = n / 6.0 * (skew ** 2 + exk ** 2 / 4)
    assert r.skewness == pytest.approx(skew, abs=1e-5)
    assert r.ex_kurtosis == pytest.approx(exk, abs=1e-5)
    assert r.jb_stat == pytest.approx(jb, abs=1e-4)


def test_cochrans_q_textbook(spark):
    """3 treatments x 4 blocks of binary outcomes, hand Q."""
    from kiara_spark.operators.quality import cochrans_q
    from pyspark.sql import functions as F

    data = [  # (block, [t1, t2, t3])
        (1, [1, 1, 0]), (2, [1, 0, 0]), (3, [1, 1, 1]), (4, [1, 0, 0]),
    ]
    rows = [(b, f"t{j}", f) for b, fs in data for j, f in enumerate(fs)]
    df = spark.createDataFrame(rows, "b int, t string, f int")
    r = cochrans_q(df, "b", "t", F.col("f") == 1).collect()[0]
    cj = [4, 2, 1]
    ri = [2, 1, 3, 1]
    k, tt = 3, sum(cj)
    q = (k - 1) * (k * sum(c * c for c in cj) - tt * tt) \
        / (k * tt - sum(x * x for x in ri))
    assert (r.n_blocks, r.k, r.dof) == (4, 3, 2)
    assert r.q_stat == pytest.approx(q, abs=1e-6)
    assert r.p_value == pytest.approx(min(math.exp(-q / 2), 1.0),
                                      abs=1e-5)


def test_cochrans_q_identical_treatments_null_or_zero(spark):
    """All treatments identical per block: denominator k*T - sum(R^2)
    is 0 -> Q NULL by contract."""
    from kiara_spark.operators.quality import cochrans_q
    from pyspark.sql import functions as F

    rows = [(b, t, 1) for b in (1, 2) for t in ("x", "y", "z")]
    df = spark.createDataFrame(rows, "b int, t string, f int")
    r = cochrans_q(df, "b", "t", F.col("f") == 1).collect()[0]
    assert r.q_stat is None and r.p_value is None


def test_bartlett_equal_variances_small_chi(spark):
    from kiara_spark.operators.quality import bartlett_test

    base = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    rows = [("a", v) for v in base] + [("b", v + 50) for v in base] \
        + [("c", v + 100) for v in base]
    df = spark.createDataFrame(rows, "g string, v double")
    r = bartlett_test(df, "g", "v").collect()[0]
    assert (r.k, r.n, r.dof) == (3, 18, 2)
    assert r.chi2 == pytest.approx(0.0, abs=1e-6)
    assert r.p_value == pytest.approx(1.0, abs=1e-5)


def test_bartlett_matches_hand_formula(spark):
    from kiara_spark.operators.quality import bartlett_test

    groups = {"a": [1.0, 2.0, 3.0, 4.0], "b": [10.0, 20.0, 30.0, 40.0],
              "c": [1.0, 1.5, 2.0, 2.5, 3.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    r = bartlett_test(df, "g", "v").collect()[0]
    k = len(groups)
    n = sum(len(v) for v in groups.values())

    def var(s):
        m = sum(s) / len(s)
        return sum((x - m) ** 2 for x in s) / (len(s) - 1)

    sp2 = sum((len(v) - 1) * var(v) for v in groups.values()) / (n - k)
    chi_u = (n - k) * math.log(sp2) \
        - sum((len(v) - 1) * math.log(var(v)) for v in groups.values())
    c = 1 + (sum(1 / (len(v) - 1) for v in groups.values())
             - 1 / (n - k)) / (3 * (k - 1))
    assert r.chi2 == pytest.approx(chi_u / c, abs=1e-4)


def test_durbin_watson_alternating_vs_trending(spark):
    """Alternating residuals give DW ~ 4 (negative autocorrelation);
    a pure linear trend has ~0 residuals."""
    import datetime
    from kiara_spark.operators.events import durbin_watson

    base = datetime.datetime(2024, 6, 1)
    rows = [(d, base + datetime.timedelta(days=d), 1, "click",
             10.0 + (1.0 if d % 2 == 0 else -1.0))
            for d in range(20)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double")
    r = durbin_watson(df, "ts", "value").collect()[0]
    assert r.n_buckets == 20
    assert r.dw > 3.4  # alternating -> near 4
    assert r.rho_approx < -0.7

    rows2 = [(d, base + datetime.timedelta(days=d), 1, "click",
              5.0 + 2.0 * d) for d in range(20)]
    df2 = spark.createDataFrame(
        rows2, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double")
    r2 = durbin_watson(df2, "ts", "value").collect()[0]
    assert r2.slope == pytest.approx(2.0, abs=1e-6)
    assert r2.dw is None  # zero residuals -> se2 = 0 -> NULL contract


def test_distribution_diagnostics_example_pipeline(ctx):
    """examples/distribution_diagnostics.json: one table fanned into the
    test-selection battery (JB gate, Bartlett + Brown-Forsythe variance
    checks, ANOVA + Kruskal-Wallis readouts) through the pipeline
    surface."""
    import os

    os.chdir("/root/repo")
    out = ctx.run_pipeline("examples/distribution_diagnostics.json", {
        "path": "/root/testdata/sf0.001/orders.parquet",
    })
    jb = out["normality_gate"].data.collect()[0]
    ba = out["bartlett"].data.collect()[0]
    bf = out["brown_forsythe"].data.collect()[0]
    an = out["anova"].data.collect()[0]
    kw = out["kruskal_wallis"].data.collect()[0]
    assert jb.n == an.n == kw.n > 0
    assert ba.k == bf.k == an.k == kw.k == 3
    assert jb.jb_stat is not None
    for r in (ba, kw):
        assert r.p_value is None or 0.0 <= r.p_value <= 1.0
    assert bf.f_stat is not None and an.f_stat is not None
    assert an.eta_sq is not None

# ---------------------------------------------------------------------------
# Degenerate-input contracts (r8 ADVICE): NULL by contract, never NaN/Inf
# (and under ANSI Spark, never a DIVIDE_BY_ZERO throw)
# ---------------------------------------------------------------------------

def test_cohens_kappa_degenerate_single_label_null(spark):
    """Both raters always emit the same single label: pe = 1, kappa's
    denominator n^2 - pe*n^2 = 0 -> kappa NULL by contract (po/pe fine)."""
    from kiara_spark.operators.quality import cohens_kappa

    df = spark.createDataFrame([("x", "x")] * 7, "a string, b string")
    r = _one(cohens_kappa(df, "a", "b"))
    assert r.po == 1.0 and r.pe == 1.0
    assert r.kappa is None


def test_welch_degenerate_n1_and_constant_groups(spark):
    """n=1 group -> var/t/df NULL; two identical constant groups (zero
    pooled SE) -> t/df NULL; neither throws under ANSI."""
    from kiara_spark.operators.quality import welch_ttest

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("b", 3.0)], "g string, v double")
    r = _one(welch_ttest(df, "g", "v", "a", "b"))
    assert r.n_a == 1 and r.mean_a == 1.0
    assert r.var_a is None and r.t_stat is None and r.df is None

    df = spark.createDataFrame(
        [("a", 5.0)] * 3 + [("b", 5.0)] * 3, "g string, v double")
    r = _one(welch_ttest(df, "g", "v", "a", "b"))
    assert r.var_a == 0.0 and r.var_b == 0.0
    assert r.t_stat is None and r.df is None


def test_ccc_degenerate_constant_equal_columns_null(spark):
    """Two constant, equal columns: CCC's denominator 0 -> NULL, not NaN."""
    from kiara_spark.operators.quality import concordance_ccc

    df = spark.createDataFrame([(2.0, 2.0)] * 5, "x double, y double")
    r = _one(concordance_ccc(df, "x", "y"))
    assert r.ccc is None and r.pearson_r is None


def test_wilcoxon_value_scale_preserves_fine_differences(spark):
    """Default 2-dp quantization drops sub-0.005 paired differences as
    ties (documented contract); value_scale=4 keeps them."""
    from kiara_spark.operators.quality import wilcoxon_signed_rank

    rows = [(1.0001, 1.0), (2.0002, 2.0), (3.0003, 3.0), (4.0004, 4.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = _one(wilcoxon_signed_rank(df, "x", "y"))
    assert r.n_nonzero == 0                      # all collapse at 2 dp
    r4 = _one(wilcoxon_signed_rank(df, "x", "y", value_scale=4))
    assert r4.n_nonzero == 4 and r4.w_plus == 10.0 and r4.w_minus == 0.0

def test_mann_kendall_max_buckets_guard_trips(spark):
    """The O(buckets²) envelope guard (r8 VERDICT item 5): a minute-bucket
    call over a long horizon counts the grid FIRST and raises before the
    quadratic pair join is ever built; a coarser bucket on the same data
    passes, and an explicit max_buckets raise opts in."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from kiara_spark.operators.events import mann_kendall_trend

    # 6 days of minute-level points -> 8640 minute buckets (> 5000)
    df = (spark.range(8640)
          .select((F.lit("2024-01-01 00:00:00").cast("timestamp")
                   + F.make_interval(mins=F.col("id").cast("int")))
                  .alias("ts"),
                  (F.col("id") % 7).cast("double").alias("value")))
    with _pytest.raises(ValueError, match=r"8640 'minute' buckets exceed"):
        mann_kendall_trend(df, "ts", "value", bucket="minute")
    # same data, day buckets: 6 buckets, runs fine
    r = mann_kendall_trend(df, "ts", "value", bucket="day").collect()[0]
    assert r.n_buckets == 6
    # explicit opt-in raises the envelope
    r2 = mann_kendall_trend(df, "ts", "value", bucket="minute",
                            max_buckets=10000).collect()[0]
    assert r2.n_buckets == 8640


def test_cramer_von_mises_matches_bruteforce(spark):
    """Round 9: CvM two-sample — engine statistic equals the O(N) ECDF
    brute force; flags follow the limiting omega-squared critical
    values via exact integer comparisons."""
    import bisect
    import random

    from kiara_spark.operators.quality import cramer_von_mises

    random.seed(11)
    a = [round(random.gauss(10, 2), 2) for _ in range(250)]
    b = [round(random.gauss(10.8, 2.6), 2) for _ in range(180)]
    ref = spark.createDataFrame([(x,) for x in a], "v double")
    cur = spark.createDataFrame([(x,) for x in b], "v double")
    r = cramer_von_mises(ref, cur, "v").collect()[0]

    m, n = len(a), len(b)
    sa, sb = sorted(a), sorted(b)
    t = sum((bisect.bisect_right(sa, x) / m
             - bisect.bisect_right(sb, x) / n) ** 2
            for x in sorted(a + b)) * m * n / (m + n) ** 2
    assert abs(r.t_stat - t) < 1e-6
    assert r.n_ref == m and r.n_cur == n
    assert r.reject_01 == (t > 0.743)
    assert r.reject_05 == (t > 0.461)
    assert r.reject_10 == (t > 0.347)
    # identical samples: statistic ~ expected magnitude, no rejection
    same = cramer_von_mises(ref, ref, "v").collect()[0]
    assert same.reject_10 is False and same.t_stat < same.t_expected


def test_cvm_operation_minted(ctx, spark):
    df_a = spark.createDataFrame([(float(i),) for i in range(50)],
                                 "x double")
    df_b = spark.createDataFrame([(float(i) + 30,) for i in range(50)],
                                 "x double")
    out = ctx.run_job("table.drift.cramer_von_mises",
                      {"reference": df_a, "current": df_b},
                      operation_config={"value_column": "x"})
    row = out["table"].data.collect()[0]
    assert row.reject_01  # disjoint-ish distributions reject hard


# -- CUPED (round 10) -------------------------------------------------------

def _cuped_frame(spark, rows):
    return spark.createDataFrame(rows, "variant string, x double, y double")


def test_cuped_textbook_theta_and_reduction(spark):
    """y = 2x + arm effect: the covariate explains ALL within-arm
    variance, so theta = 2, rho^2 ~ 1, the adjusted variance collapses,
    and the adjusted diff equals the designed effect exactly."""
    from kiara_spark.operators.quality import cuped_adjust

    rows = ([("control", float(v), 2.0 * v) for v in range(1, 11)]
            + [("treat", float(v), 2.0 * v + 5.0) for v in range(1, 11)])
    r = cuped_adjust(_cuped_frame(spark, rows), "variant", "x", "y",
                     "control", "treat").collect()[0]
    assert r.n_a == 10 and r.n_b == 10
    assert r.theta == pytest.approx(2.0, abs=1e-6)
    assert r.diff_raw == pytest.approx(-5.0, abs=1e-6)
    assert r.diff_adj == pytest.approx(-5.0, abs=1e-6)
    # identical X distributions across arms: adjustment preserves diff,
    # and the covariate soaks up most of the pooled variance
    assert r.var_reduction_pct > 75.0
    # the adjusted per-arm variance is exactly 0 -> z undefined by the
    # se > 0 guard
    assert r.z is None and r.p_value is None


def test_cuped_no_covariate_signal_null_theta(spark):
    """Constant X: var(X) = 0, theta/adjustment NULL by contract, raw
    diff still reported."""
    from kiara_spark.operators.quality import cuped_adjust

    rows = ([("control", 1.0, float(v)) for v in range(1, 6)]
            + [("treat", 1.0, float(v) + 3) for v in range(1, 6)])
    r = cuped_adjust(_cuped_frame(spark, rows), "variant", "x", "y",
                     "control", "treat").collect()[0]
    assert r.theta is None and r.adj_mean_a is None and r.z is None
    assert r.diff_raw == pytest.approx(-3.0, abs=1e-6)


def test_cuped_reduces_variance_vs_plain_diff(spark):
    """Noisy metric with a strong pre-period covariate: CUPED's z must
    detect the effect more sharply than the raw diff suggests, and the
    reduction equals 100*rho^2 from hand-computed pooled moments."""
    from kiara_spark.operators.quality import cuped_adjust

    import random
    rng = random.Random(7)
    rows = []
    for i in range(200):
        x = rng.uniform(10, 100)
        noise = rng.gauss(0, 2)
        arm = "control" if i % 2 == 0 else "treat"
        eff = 0.0 if arm == "control" else 4.0
        rows.append((arm, x, 3.0 * x + noise + eff))
    r = cuped_adjust(_cuped_frame(spark, rows), "variant", "x", "y",
                     "control", "treat").collect()[0]
    # hand pooled moments on the 2-dp-rounded values the operator uses
    xs = [round(x, 2) for _, x, _ in rows]
    ys = [round(y, 2) for _, _, y in rows]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    vx = sum(v * v for v in xs) / n - mx * mx
    vy = sum(v * v for v in ys) / n - my * my
    cov = sum(a * b for a, b in zip(xs, ys)) / n - mx * my
    assert r.theta == pytest.approx(cov / vx, abs=1e-4)
    assert r.var_reduction_pct == pytest.approx(
        100.0 * cov * cov / (vx * vy), abs=1e-2)
    assert r.var_reduction_pct > 95.0
    assert r.z is not None and abs(r.z) > 3.0  # effect detected
    assert r.p_value < 0.01


def test_cuped_operation_minted(ctx, spark):
    rows = ([("a", float(v), float(v) + 1) for v in range(1, 8)]
            + [("b", float(v), float(v) + 3) for v in range(1, 8)])
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = ctx.run_job("table.stats.cuped_readout", {"table": df},
                      operation_config={"group_column": "g",
                                        "x_column": "x", "y_column": "y",
                                        "group_a": "a", "group_b": "b"})
    row = out["table"].data.collect()[0]
    assert row.n_a == 7 and row.n_b == 7
    assert row.theta == pytest.approx(1.0, abs=1e-6)
    assert row.diff_adj == pytest.approx(-2.0, abs=1e-6)


# -- Benjamini-Hochberg FDR (round 10) --------------------------------------

def test_bh_fdr_textbook(spark):
    from kiara_spark.operators.quality import bh_fdr

    rows = [("a", 0.01), ("b", 0.04), ("c", 0.03), ("d", 0.005)]
    df = spark.createDataFrame(rows, "hyp string, p_value double")
    got = {r.hyp: r for r in bh_fdr(df, alpha=0.05).collect()}
    # raw = p*m/rank: [.02, .04, .04, .02]; suffix-min keeps them
    assert got["d"].p_adj == pytest.approx(0.02, abs=1e-9)
    assert got["a"].p_adj == pytest.approx(0.02, abs=1e-9)
    assert got["c"].p_adj == pytest.approx(0.04, abs=1e-9)
    assert got["b"].p_adj == pytest.approx(0.04, abs=1e-9)
    assert all(r.reject for r in got.values())


def test_bh_fdr_ties_and_cap(spark):
    """Tied p-values share the block's LARGEST rank; adjusted p caps
    at 1."""
    from kiara_spark.operators.quality import bh_fdr

    rows = [("a", 0.02), ("b", 0.02), ("c", 0.9)]
    df = spark.createDataFrame(rows, "hyp string, p_value double")
    got = {r.hyp: r for r in bh_fdr(df, alpha=0.05).collect()}
    assert got["a"].p_adj == pytest.approx(0.03, abs=1e-9)  # 0.02*3/2
    assert got["b"].p_adj == pytest.approx(0.03, abs=1e-9)
    assert got["c"].p_adj == pytest.approx(0.9, abs=1e-9)
    assert got["a"].reject and got["b"].reject and not got["c"].reject
    # cap: a p of 0.8 at rank 1 of 3 would give 2.4 -> capped at 1
    solo = bh_fdr(spark.createDataFrame([("x", 0.8)],
                                        "hyp string, p_value double"))
    assert solo.collect()[0].p_adj == pytest.approx(0.8, abs=1e-9)


def test_bh_fdr_null_passthrough_and_reference(spark):
    """NULL p rows keep NULL p_adj / reject=false; a 60-hypothesis
    family matches a straight reference implementation."""
    import random

    from kiara_spark.operators.quality import bh_fdr

    rng = random.Random(3)
    ps = sorted(round(rng.random(), 6) for _ in range(60))
    rows = [(f"h{i}", p) for i, p in enumerate(ps)] + [("hnull", None)]
    df = spark.createDataFrame(rows, "hyp string, p_value double")
    got = {r.hyp: r for r in bh_fdr(df, alpha=0.1).collect()}
    assert got["hnull"].p_adj is None and got["hnull"].reject is False
    m = len(ps)
    raw = [p * m / (i + 1) for i, p in enumerate(ps)]
    ref, cur = [], float("inf")
    for v in reversed(raw):
        cur = min(cur, v)
        ref.append(min(cur, 1.0))
    ref.reverse()
    for i, p in enumerate(ps):
        assert got[f"h{i}"].p_adj == pytest.approx(ref[i], abs=1e-9), i
        assert got[f"h{i}"].reject == (ref[i] <= 0.1)


def test_bh_fdr_operation_minted(ctx, spark):
    df = spark.createDataFrame([("a", 0.001), ("b", 0.5)],
                               "hyp string, p_value double")
    out = ctx.run_job("table.stats.bh_fdr", {"table": df},
                      operation_config={"alpha": 0.01})
    got = {r.hyp: r for r in out["table"].data.collect()}
    assert got["a"].reject and not got["b"].reject


# ---------------------------------------------------------------------------
# Difference-in-differences (r11)
# ---------------------------------------------------------------------------

def test_did_textbook_estimate(spark):
    """Treat: pre mean 10, post mean 14 (diff +4); control: pre mean 10,
    post mean 11 (diff +1) => DiD = +3.  Cell variances are all 2/1 = 2
    (values mean±1 around each cell mean, n=2 per cell): SE =
    sqrt(4 * 2/2) = 2, z = 1.5."""
    from kiara_spark.operators.quality import diff_in_diff

    rows = [
        ("t", "pre", 9.0), ("t", "pre", 11.0),
        ("t", "post", 13.0), ("t", "post", 15.0),
        ("c", "pre", 9.0), ("c", "pre", 11.0),
        ("c", "post", 10.0), ("c", "post", 12.0),
    ]
    df = spark.createDataFrame(rows, "g string, p string, y double")
    r = _one(diff_in_diff(df, "g", "p", "y", "t", "c", "pre", "post"))
    assert (r.n_treat_pre, r.n_treat_post,
            r.n_control_pre, r.n_control_post) == (2, 2, 2, 2)
    assert r.mean_treat_pre == 10.0 and r.mean_treat_post == 14.0
    assert r.mean_control_pre == 10.0 and r.mean_control_post == 11.0
    assert r.diff_treat == 4.0 and r.diff_control == 1.0
    assert r.did == 3.0
    assert r.z == pytest.approx(1.5, abs=1e-6)
    # two-sided normal p for z=1.5 ~ 0.1336 (A&S erfc, |err| < 1.5e-7)
    assert r.p_value == pytest.approx(0.133614, abs=1e-4)


def test_did_single_unit_cell_null_inference(spark):
    """A cell with one unit has no sample variance: estimate still
    reported, z/p NULL."""
    from kiara_spark.operators.quality import diff_in_diff

    rows = [
        ("t", "pre", 10.0),
        ("t", "post", 13.0), ("t", "post", 15.0),
        ("c", "pre", 9.0), ("c", "pre", 11.0),
        ("c", "post", 10.0), ("c", "post", 12.0),
    ]
    df = spark.createDataFrame(rows, "g string, p string, y double")
    r = _one(diff_in_diff(df, "g", "p", "y", "t", "c", "pre", "post"))
    assert r.n_treat_pre == 1
    assert r.did == 4.0 - 1.0
    assert r.z is None and r.p_value is None


def test_did_ignores_other_groups_and_periods(spark):
    """Rows outside the named groups/periods (a third arm, a washout
    period) must not contaminate the cells."""
    from kiara_spark.operators.quality import diff_in_diff

    rows = [
        ("t", "pre", 9.0), ("t", "pre", 11.0),
        ("t", "post", 13.0), ("t", "post", 15.0),
        ("c", "pre", 9.0), ("c", "pre", 11.0),
        ("c", "post", 10.0), ("c", "post", 12.0),
        ("holdout", "pre", 999.0), ("t", "washout", 999.0),
    ]
    df = spark.createDataFrame(rows, "g string, p string, y double")
    r = _one(diff_in_diff(df, "g", "p", "y", "t", "c", "pre", "post"))
    assert r.did == 3.0
    assert (r.n_treat_pre + r.n_treat_post
            + r.n_control_pre + r.n_control_post) == 8


def test_did_empty_cell_reports_null_estimate(spark):
    """An entirely missing cell (no control-post units) yields NULL means
    for that cell and a NULL DiD — never a crash or a silently-wrong 0."""
    from kiara_spark.operators.quality import diff_in_diff

    rows = [
        ("t", "pre", 9.0), ("t", "pre", 11.0),
        ("t", "post", 13.0), ("t", "post", 15.0),
        ("c", "pre", 9.0), ("c", "pre", 11.0),
    ]
    df = spark.createDataFrame(rows, "g string, p string, y double")
    r = _one(diff_in_diff(df, "g", "p", "y", "t", "c", "pre", "post"))
    assert r.n_control_post == 0
    assert r.mean_control_post is None
    assert r.did is None and r.z is None and r.p_value is None


def test_did_partition_invariance(spark):
    """The conditional decimal aggregate is partition-order invariant:
    1-partition and 7-partition runs must agree bit-for-bit."""
    from kiara_spark.operators.quality import diff_in_diff

    rows = [("t" if i % 2 else "c",
             "post" if i % 3 == 0 else "pre",
             float(i % 17) + 0.37 * (i % 5)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, p string, y double")
    a = _one(diff_in_diff(df.coalesce(1), "g", "p", "y",
                          "t", "c", "pre", "post"))
    b = _one(diff_in_diff(df.repartition(7), "g", "p", "y",
                          "t", "c", "pre", "post"))
    assert a == b


def test_did_segments_independent_per_segment(spark):
    """segment_col: each segment's row must equal the global readout run
    on that segment's rows alone — segments are fully independent."""
    from kiara_spark.operators.quality import diff_in_diff

    rows = [
        ("t", "pre", "a", 9.0), ("t", "pre", "a", 11.0),
        ("t", "post", "a", 13.0), ("t", "post", "a", 15.0),
        ("c", "pre", "a", 9.0), ("c", "pre", "a", 11.0),
        ("c", "post", "a", 10.0), ("c", "post", "a", 12.0),
        ("t", "pre", "b", 1.0), ("t", "pre", "b", 3.0),
        ("t", "post", "b", 9.0), ("t", "post", "b", 11.0),
        ("c", "pre", "b", 2.0), ("c", "pre", "b", 4.0),
        ("c", "post", "b", 2.5), ("c", "post", "b", 4.5),
    ]
    df = spark.createDataFrame(rows, "g string, p string, seg string, y double")
    seg_rows = {r.segment: r for r in diff_in_diff(
        df, "g", "p", "y", "t", "c", "pre", "post",
        segment_col="seg").collect()}
    assert list(seg_rows) == ["a", "b"]  # sorted output
    for seg in ("a", "b"):
        solo = diff_in_diff(df.filter(df.seg == seg), "g", "p", "y",
                            "t", "c", "pre", "post").collect()[0]
        combined = seg_rows[seg]
        assert combined.did == solo.did
        assert combined.z == solo.z and combined.p_value == solo.p_value
    assert seg_rows["a"].did == 3.0 and seg_rows["b"].did == 7.5


# ---------------------------------------------------------------------------
# power / MDE planning (table.stats.power_mde, r12)
# ---------------------------------------------------------------------------

def _power_frame(spark, rows):
    return spark.createDataFrame(rows, "variant string, y double")


def test_power_mde_textbook(spark):
    """Known means/variances: every output matches the hand formula
    (z literals from the operator's own table; only +,*,/,sqrt so the
    comparison is exact to double rounding)."""
    import math

    from kiara_spark.operators.quality import (
        _Z_POWER, _Z_TWO_SIDED, power_mde)

    a = [10.0, 12.0, 14.0, 16.0, 18.0]
    b = [20.0, 22.0, 24.0, 26.0, 28.0]
    rows = [("treat", v) for v in a] + [("control", v) for v in b]
    r = power_mde(_power_frame(spark, rows), "variant", "y",
                  "treat", "control").collect()[0]
    va = vb = 10.0  # sample variance of both arithmetic sequences
    zsum = _Z_TWO_SIDED[0.05] + _Z_POWER[0.80]
    se = math.sqrt(va / 5 + vb / 5)
    assert r.n_a == 5 and r.n_b == 5
    assert r.mean_a == pytest.approx(14.0, abs=1e-9)
    assert r.mean_b == pytest.approx(24.0, abs=1e-9)
    assert r.var_a == pytest.approx(va, abs=1e-6)
    assert r.var_b == pytest.approx(vb, abs=1e-6)
    assert r.se == pytest.approx(se, abs=1e-6)
    assert r.mde_abs == pytest.approx(zsum * se, abs=1e-6)
    assert r.mde_rel_pct == pytest.approx(100 * zsum * se / 24.0, abs=1e-4)
    delta = 0.10 * 24.0
    assert r.n_per_arm_required == math.ceil(
        zsum * zsum * (va + vb) / (delta * delta))


def test_power_mde_null_contracts(spark):
    """n=1 arms -> variance terms NULL; zero control mean -> relative
    outputs NULL; unsupported alpha/power raise at call time."""
    from kiara_spark.operators.quality import power_mde

    r = power_mde(_power_frame(spark, [("a", 3.0), ("b", 5.0)]),
                  "variant", "y", "a", "b").collect()[0]
    assert r.var_a is None and r.se is None and r.mde_abs is None
    assert r.n_per_arm_required is None

    rows = [("a", 1.0), ("a", 2.0), ("b", -1.0), ("b", 1.0)]
    r2 = power_mde(_power_frame(spark, rows), "variant", "y",
                   "a", "b").collect()[0]
    assert r2.mean_b == pytest.approx(0.0)
    assert r2.mde_rel_pct is None and r2.n_per_arm_required is None
    assert r2.mde_abs is not None  # absolute MDE needs no control mean

    with pytest.raises(ValueError):
        power_mde(_power_frame(spark, rows), "variant", "y", "a", "b",
                  alpha=0.042)
    with pytest.raises(ValueError):
        power_mde(_power_frame(spark, rows), "variant", "y", "a", "b",
                  power=0.85)


def test_power_mde_shrinks_with_sample_size(spark):
    """4x the sample -> MDE halves, up to the sample-variance denominator
    ((n-1) -> (4n-1) under duplication: exact factor sqrt(4(n-1)/(4n-1))),
    while the required n for a fixed target only moves by that same
    variance shrink (never up)."""
    import math

    from kiara_spark.operators.quality import power_mde

    base = [float(v) for v in range(1, 9)]
    rows1 = ([("a", v) for v in base] + [("b", v + 1) for v in base])
    rows4 = rows1 * 4  # same units, 4x n
    r1 = power_mde(_power_frame(spark, rows1), "variant", "y",
                   "a", "b").collect()[0]
    r4 = power_mde(_power_frame(spark, rows4), "variant", "y",
                   "a", "b").collect()[0]
    n = len(base)
    shrink = math.sqrt(4 * (n - 1) / (4 * n - 1))
    assert r4.mde_abs == pytest.approx(r1.mde_abs / 2.0 * shrink, rel=1e-3)
    assert r1.n_per_arm_required >= r4.n_per_arm_required
    assert r4.n_per_arm_required >= int(r1.n_per_arm_required
                                        * shrink * shrink) - 1


def test_power_mde_operation_minted(ctx, spark):
    rows = ([("a", float(v)) for v in range(1, 8)]
            + [("b", float(v) + 3) for v in range(1, 8)])
    df = spark.createDataFrame(rows, "g string, y double")
    out = ctx.run_job("table.stats.power_mde", {"table": df},
                      operation_config={"group_column": "g",
                                        "y_column": "y",
                                        "group_a": "a", "group_b": "b"})
    row = out["table"].data.collect()[0]
    assert row.n_a == 7 and row.n_b == 7
    assert row.mde_abs is not None and row.n_per_arm_required > 0


# ---------------------------------------------------------------------------
# mSPRT always-valid sequential monitoring (table.stats.msprt, r12)
# ---------------------------------------------------------------------------

def _msprt_frame(spark, rows):
    return spark.createDataFrame(rows, "variant string, t int, y double")


def test_msprt_null_effect_p_stays_one(spark):
    """Identical arms: theta = 0 every bucket, log-lambda is the pure
    mixture penalty (negative), so max(runmax, 0) = 0 and p = 1 at every
    look — a null experiment is never rejected no matter how often you
    peek."""
    from kiara_spark.operators.quality import msprt_always_valid

    rows = []
    for t in range(1, 6):
        for v in (1.0, 3.0, 5.0):
            rows += [("a", t, v), ("b", t, v)]
    out = msprt_always_valid(_msprt_frame(spark, rows), "variant", "t",
                             "y", "a", "b", tau=2.0)
    got = sorted(out.collect(), key=lambda r: r.bucket)
    assert len(got) == 5
    for r in got:
        assert r.theta == pytest.approx(0.0, abs=1e-9)
        assert r.log_lambda is not None and r.log_lambda < 0
        assert r.p_always_valid == pytest.approx(1.0)
        assert r.reject_at_05 is False


def test_msprt_strong_effect_hand_computed(spark):
    """One bucket with hand-computable moments: log Λ matches the closed
    form and the huge effect rejects immediately."""
    import math

    from kiara_spark.operators.quality import msprt_always_valid

    rows = ([("a", 1, v) for v in (1.0, 2.0, 3.0)]
            + [("b", 1, v) for v in (10.0, 11.0, 12.0)])
    r = msprt_always_valid(_msprt_frame(spark, rows), "variant", "t",
                           "y", "a", "b", tau=2.0).collect()[0]
    theta = 2.0 - 11.0
    pvar = (2.0 + 2.0) / 4.0        # pooled: ss=2 each arm, n-2=4
    v = pvar * (1 / 3 + 1 / 3)
    t2 = 4.0
    ll = 0.5 * math.log(v / (v + t2)) + theta**2 * t2 / (2 * v * (v + t2))
    assert r.n_a == 3 and r.n_b == 3
    assert r.theta == pytest.approx(theta, abs=1e-6)
    assert r.log_lambda == pytest.approx(ll, abs=1e-4)
    assert r.p_always_valid == pytest.approx(math.exp(-ll), abs=1e-9)
    assert r.reject_at_05 is True


def test_msprt_p_non_increasing_and_insufficient_data(spark):
    """The always-valid guarantee is structural: p is non-increasing in t.
    Buckets before both arms have n >= 2 report NULL log-lambda and p=1."""
    from kiara_spark.operators.quality import msprt_always_valid

    rows = [("a", 1, 5.0)]  # bucket 1: one arm only -> insufficient
    for t in range(2, 8):
        for i in range(4):
            rows += [("a", t, 10.0 + i), ("b", t, 13.0 + i)]
    out = msprt_always_valid(_msprt_frame(spark, rows), "variant", "t",
                             "y", "a", "b", tau=1.0)
    got = sorted(out.collect(), key=lambda r: r.bucket)
    assert got[0].log_lambda is None
    assert got[0].p_always_valid == pytest.approx(1.0)
    ps = [r.p_always_valid for r in got]
    assert all(ps[i + 1] <= ps[i] + 1e-12 for i in range(len(ps) - 1))
    # a constant 3-unit shift accumulates evidence: the last look rejects
    assert got[-1].reject_at_05 is True


def test_msprt_operation_minted(ctx, spark):
    rows = ([("a", t, 1.0 + t) for t in range(1, 5) for _ in range(3)]
            + [("b", t, 6.0 + t) for t in range(1, 5) for _ in range(3)])
    df = spark.createDataFrame(rows, "g string, t int, y double")
    out = ctx.run_job("table.stats.msprt", {"table": df},
                      operation_config={"group_column": "g",
                                        "time_column": "t",
                                        "y_column": "y",
                                        "group_a": "a", "group_b": "b",
                                        "tau": 2.0})
    got = out["table"].data.collect()
    assert len(got) == 4
    assert all(r.p_always_valid is not None for r in got)


# ---------------------------------------------------------------------------
# delta-method ratio-metric test (table.stats.ratio_metric_delta, r12)
# ---------------------------------------------------------------------------

def _ratio_frame(spark, rows):
    return spark.createDataFrame(rows, "variant string, x double, y double")


def test_ratio_metric_textbook_hand_computed(spark):
    """Hand-computable moments: ratio, delta-method variance, z and the
    direction all match the closed form."""
    import math

    a = [(2.0, 1.0), (4.0, 2.0), (6.0, 3.0)]      # perfect ratio 2
    b = [(1.0, 1.0), (3.0, 2.0), (2.0, 3.0)]      # ratio 6/6 = 1
    rows = ([("t", x, y) for x, y in a] + [("c", x, y) for x, y in b])
    from kiara_spark.operators.quality import ratio_metric_delta

    r = ratio_metric_delta(_ratio_frame(spark, rows), "variant",
                           "x", "y", "t", "c").collect()[0]
    assert r.n_a == 3 and r.n_b == 3
    assert r.ratio_a == pytest.approx(2.0, abs=1e-9)
    assert r.ratio_b == pytest.approx(1.0, abs=1e-9)
    assert r.diff == pytest.approx(1.0, abs=1e-9)
    # arm a is an exact ratio: vx - 2R cov + R^2 vy = 4 - 2*2*2 + 4*1 = 0,
    # so ALL the SE comes from arm b's delta variance
    vxb, vyb, cvb = 1.0, 1.0, 0.5   # sample moments of b
    rb, myb, nb = 1.0, 2.0, 3.0
    vb = (vxb - 2 * rb * cvb + rb * rb * vyb) / (nb * myb * myb)
    assert r.se == pytest.approx(math.sqrt(vb), abs=1e-6)
    assert r.z == pytest.approx(1.0 / math.sqrt(vb), abs=1e-4)
    assert r.p_value is not None and 0.0 <= r.p_value <= 1.0


def test_ratio_metric_null_contracts(spark):
    """n=1 arms -> variance terms NULL -> se/z/p NULL; zero denominator
    mean -> that arm's ratio NULL and everything downstream NULL."""
    from kiara_spark.operators.quality import ratio_metric_delta

    r = ratio_metric_delta(
        _ratio_frame(spark, [("t", 2.0, 1.0), ("c", 3.0, 1.0)]),
        "variant", "x", "y", "t", "c").collect()[0]
    assert r.ratio_a == pytest.approx(2.0)
    assert r.se is None and r.z is None and r.p_value is None

    rows = [("t", 1.0, 1.0), ("t", 2.0, -1.0),   # mean y = 0
            ("c", 1.0, 1.0), ("c", 2.0, 3.0)]
    r2 = ratio_metric_delta(_ratio_frame(spark, rows), "variant",
                            "x", "y", "t", "c").collect()[0]
    assert r2.ratio_a is None and r2.diff is None and r2.z is None
    assert r2.ratio_b is not None


def test_ratio_metric_vs_naive_per_unit_mean(spark):
    """The ratio-of-sums estimator weights units by denominator volume —
    it must equal sum(x)/sum(y), NOT the mean of per-unit ratios (the
    thing a naive t-test would estimate)."""
    from kiara_spark.operators.quality import ratio_metric_delta

    rows = [("t", 10.0, 10.0), ("t", 1.0, 1.0), ("t", 0.5, 1.0),
            ("c", 1.0, 1.0), ("c", 1.0, 1.0), ("c", 1.0, 1.0)]
    r = ratio_metric_delta(_ratio_frame(spark, rows), "variant",
                           "x", "y", "t", "c").collect()[0]
    assert r.ratio_a == pytest.approx(11.5 / 12.0, abs=1e-6)
    naive = (1.0 + 1.0 + 0.5) / 3.0
    assert abs(r.ratio_a - naive) > 0.05


def test_ratio_metric_operation_minted(ctx, spark):
    rows = ([("a", float(v) * 2, float(v)) for v in range(1, 8)]
            + [("b", float(v) * 3, float(v)) for v in range(1, 8)])
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = ctx.run_job("table.stats.ratio_metric_delta", {"table": df},
                      operation_config={"group_column": "g",
                                        "num_column": "x",
                                        "den_column": "y",
                                        "group_a": "a", "group_b": "b"})
    row = out["table"].data.collect()[0]
    assert row.ratio_a == pytest.approx(2.0, abs=1e-6)
    assert row.ratio_b == pytest.approx(3.0, abs=1e-6)
    assert row.diff == pytest.approx(-1.0, abs=1e-6)


def test_msprt_null_bucket_rows_dropped(spark):
    """Rows with a NULL time bucket are dropped by contract — an
    un-bucketed observation has no position in the look sequence, and
    NULLS FIRST (Spark) vs NULLS LAST (SQL engines) ordering would make
    the cumulative statistics engine-dependent otherwise."""
    from kiara_spark.operators.quality import msprt_always_valid

    clean = [("a", 1, v) for v in (1.0, 2.0, 3.0)] \
        + [("b", 1, v) for v in (2.0, 3.0, 4.0)]
    noisy = clean + [("a", None, 99.0), ("b", None, -99.0)]
    df_c = spark.createDataFrame(clean, "variant string, t int, y double")
    df_n = spark.createDataFrame(noisy, "variant string, t int, y double")
    a = msprt_always_valid(df_c, "variant", "t", "y", "a", "b",
                           tau=1.0).collect()
    b = msprt_always_valid(df_n, "variant", "t", "y", "a", "b",
                           tau=1.0).collect()
    assert a == b and len(a) == 1


def _conf_frame(spark, n=400, noise=None):
    """id/x/y frame; optional per-row deterministic 'noise' callable."""
    rows = []
    for i in range(n):
        x = float(i % 50)
        y = 3.0 * x + 5.0 + (noise(i) if noise else 0.0)
        rows.append((i, x, y))
    return spark.createDataFrame(rows, "k bigint, x double, y double")


def test_conformal_perfect_fit_zero_width(spark):
    """Noise-free linear data: OLS recovers the line exactly, every
    residual is 0, so q-hat = 0 and test coverage is exactly 1.0."""
    from kiara_spark.operators.quality import conformal_interval

    r = conformal_interval(_conf_frame(spark), "x", "y", ["k"],
                           alpha=0.1).collect()[0]
    assert r.slope == pytest.approx(3.0, abs=1e-6)
    assert r.intercept == pytest.approx(5.0, abs=1e-6)
    assert r.qhat == 0.0
    assert r.n_covered == r.n_test and r.coverage == 1.0
    assert r.n_train + r.n_cal + r.n_test == 400


def test_conformal_coverage_near_level_and_alpha_monotone(spark):
    """Bounded deterministic noise: the 90% band covers ~>=85% of test
    rows (finite-sample marginal guarantee is >=1-alpha in expectation),
    q-hat never exceeds the noise bound, and a larger alpha gives a
    narrower (<=) band — interval width is monotone in confidence."""
    from kiara_spark.operators.quality import conformal_interval

    noise = lambda i: ((i * 2654435761) % 2001 - 1000) / 500.0  # [-2, 2]
    df = _conf_frame(spark, n=600, noise=noise)
    r90 = conformal_interval(df, "x", "y", ["k"], alpha=0.1).collect()[0]
    r50 = conformal_interval(df, "x", "y", ["k"], alpha=0.5).collect()[0]
    assert 0.0 < r90.qhat <= 2.5
    assert r90.coverage >= 0.85
    assert r50.qhat <= r90.qhat
    assert r90.n_cal > 0 and r90.n_test > 0


def test_conformal_split_is_key_deterministic(spark):
    """The 3-way split hangs off md5(key), not row order: a repartitioned
    / reordered frame produces the identical single-row readout."""
    from kiara_spark.operators.quality import conformal_interval

    noise = lambda i: ((i * 40503) % 101 - 50) / 100.0
    df = _conf_frame(spark, n=300, noise=noise)
    a = conformal_interval(df, "x", "y", ["k"]).collect()
    b = conformal_interval(df.repartition(7).sortWithinPartitions("y"),
                           "x", "y", ["k"]).collect()
    assert a == b


def test_conformal_operation_minted(ctx, spark):
    from kiara_spark.operators.quality import conformal_interval  # noqa: F401

    df = _conf_frame(spark, n=200)
    out = ctx.run_job(
        "table.stats.conformal_interval", {"table": df},
        operation_config={"x_column": "x", "y_column": "y",
                          "key_columns": ["k"]})
    row = out["table"].data.collect()[0]
    assert row.qhat == 0.0 and row.coverage == 1.0


def _ate_frame(spark, rows):
    return spark.createDataFrame(rows, "t int, y double, c double")


def test_stratified_ate_hand_computed_weights(spark):
    """Two strata with known cell means: ATE is the size-weighted and ATT
    the treated-weighted average of the within-stratum differences."""
    from kiara_spark.operators.quality import stratified_ate

    rows = ([(1, 10.0, 0.0)] * 2 + [(0, 8.0, 0.0)] * 2       # s0: diff 2
            + [(1, 20.0, 10.0)] * 3 + [(0, 15.0, 10.0)] * 3)  # s1: diff 5
    r = stratified_ate(_ate_frame(spark, rows), "t", "y", "c",
                       n_strata=2).collect()[0]
    assert r.n == 10 and r.n_treat == 5 and r.n_control == 5
    assert r.n_strata_used == 2 and r.n_strata_dropped == 0
    assert r.ate == pytest.approx((4 * 2.0 + 6 * 5.0) / 10, abs=1e-9)
    assert r.att == pytest.approx((2 * 2.0 + 3 * 5.0) / 5, abs=1e-9)


def test_stratified_ate_removes_simpsons_confounding(spark):
    """Simpson's-paradox layout: treatment concentrates in the
    high-baseline stratum, so the NAIVE treated-control difference is
    large while the within-stratum effect is exactly zero — the
    stratified estimate recovers 0."""
    from kiara_spark.operators.quality import stratified_ate

    rows = ([(1, 100.0, 9.0)] * 9 + [(0, 100.0, 9.0)] * 1
            + [(1, 1.0, 0.0)] * 1 + [(0, 1.0, 0.0)] * 9)
    df = _ate_frame(spark, rows)
    tr = [y for t, y, _ in rows if t == 1]
    co = [y for t, y, _ in rows if t == 0]
    naive = sum(tr) / len(tr) - sum(co) / len(co)
    assert abs(naive) > 50          # hopelessly confounded
    r = stratified_ate(df, "t", "y", "c", n_strata=2).collect()[0]
    assert r.ate == pytest.approx(0.0, abs=1e-9)
    assert r.att == pytest.approx(0.0, abs=1e-9)


def test_stratified_ate_common_support_drop(spark):
    """A stratum with only one arm is excluded and the weights
    renormalize over the remaining strata."""
    from kiara_spark.operators.quality import stratified_ate

    rows = ([(1, 5.0, 0.0), (0, 3.0, 0.0)]        # s0: diff 2, n=2
            + [(1, 99.0, 10.0)] * 4)              # s1: treated only
    r = stratified_ate(_ate_frame(spark, rows), "t", "y", "c",
                       n_strata=2).collect()[0]
    assert r.n == 6 and r.n_strata_used == 1 and r.n_strata_dropped == 1
    assert r.ate == pytest.approx(2.0, abs=1e-9)
    assert r.att == pytest.approx(2.0, abs=1e-9)


def test_stratified_ate_operation_minted(ctx, spark):
    rows = [(1, 4.0, 0.0), (0, 1.0, 0.0), (1, 4.0, 5.0), (0, 1.0, 5.0)]
    df = _ate_frame(spark, rows)
    out = ctx.run_job(
        "table.stats.stratified_ate", {"table": df},
        operation_config={"treat_column": "t", "y_column": "y",
                          "covariate_column": "c", "n_strata": 2})
    row = out["table"].data.collect()[0]
    assert row.ate == pytest.approx(3.0, abs=1e-9)


def _iso_frame(spark, bin_specs):
    """bin_specs: list of (score, n, n_pos) — n rows at that score with
    n_pos positives."""
    rows = []
    for score, n, n_pos in bin_specs:
        for i in range(n):
            rows.append((float(score), 1 if i < n_pos else 0))
    return spark.createDataFrame(rows, "s double, y int")


def test_isotonic_pav_pools_violating_pair(spark):
    """Textbook PAV: rates .2/.6/.4/.8 — the middle violation pools to
    .5 and the ends are untouched."""
    from kiara_spark.operators.quality import isotonic_calibration

    df = _iso_frame(spark, [(0, 5, 1), (1, 5, 3), (2, 5, 2), (3, 5, 4)])
    out = isotonic_calibration(df, "s", "y", n_bins=4).collect()
    assert [r.fitted for r in out] == [0.2, 0.5, 0.5, 0.8]
    assert [r.pos_rate for r in out] == [0.2, 0.6, 0.4, 0.8]


def test_isotonic_pooling_is_weighted(spark):
    """Unequal bin sizes: pooling averages with bin weights — rate 1.0
    (n=1) then 0.0 (n=3) pools to 1/4, not 1/2."""
    from kiara_spark.operators.quality import isotonic_calibration

    df = _iso_frame(spark, [(0, 1, 1), (1, 3, 0)])
    out = isotonic_calibration(df, "s", "y", n_bins=2).collect()
    assert [r.fitted for r in out] == [0.25, 0.25]


def test_isotonic_identity_on_monotone_input(spark):
    """Already-isotonic rates come back unchanged and non-decreasing."""
    from kiara_spark.operators.quality import isotonic_calibration

    df = _iso_frame(spark, [(0, 4, 0), (1, 4, 1), (2, 4, 2), (3, 4, 4)])
    out = isotonic_calibration(df, "s", "y", n_bins=4).collect()
    fitted = [r.fitted for r in out]
    assert fitted == [0.0, 0.25, 0.5, 1.0]
    assert fitted == sorted(fitted)


def test_isotonic_operation_minted(ctx, spark):
    df = _iso_frame(spark, [(0, 2, 2), (1, 2, 0)])
    out = ctx.run_job(
        "table.ml.isotonic_calibration", {"table": df},
        operation_config={"score_column": "s", "outcome_column": "y",
                          "n_bins": 2})
    fitted = [r.fitted for r in out["table"].data.collect()]
    assert fitted == [0.5, 0.5]


def _qini_frame(spark, rows):
    return spark.createDataFrame(rows, "score double, tr int, y int")


def test_uplift_qini_hand_computed(spark):
    """2 bins: high bin has all the treatment effect, full-depth Qini is
    0 (effect cancels), so bucket 1 carries qini=1 and gain=1."""
    from kiara_spark.operators.quality import uplift_qini

    rows = ([(10.0, 1, 1), (10.0, 1, 0), (10.0, 0, 0), (10.0, 0, 0),
             (1.0, 1, 0), (1.0, 1, 0), (1.0, 0, 1), (1.0, 0, 0)])
    out = {r.bucket: r for r in uplift_qini(
        _qini_frame(spark, rows), "score", "tr", "y",
        n_bins=2).collect()}
    b1, b2 = out[1], out[2]
    assert b1.n_treat == 2 and b1.n_control == 2
    assert b1.uplift == pytest.approx(0.5, abs=1e-9)
    assert b1.cum_qini == pytest.approx(1.0, abs=1e-9)
    assert b2.cum_qini == pytest.approx(0.0, abs=1e-9)
    assert b1.qini_gain == pytest.approx(1.0, abs=1e-9)
    assert b2.qini_gain == pytest.approx(0.0, abs=1e-9)


def test_uplift_qini_null_treatment_flat_curve(spark):
    """Identical arms: every cumulative Qini value is 0 and every bin
    uplift is 0 — no incremental conversions to claim."""
    from kiara_spark.operators.quality import uplift_qini

    rows = []
    for i in range(40):
        rows.append((float(i % 4), 1, 1 if i % 5 == 0 else 0))
        rows.append((float(i % 4), 0, 1 if i % 5 == 0 else 0))
    out = uplift_qini(_qini_frame(spark, rows), "score", "tr", "y",
                      n_bins=4).collect()
    for r in out:
        assert r.cum_qini == pytest.approx(0.0, abs=1e-9)
        assert r.uplift == pytest.approx(0.0, abs=1e-9)


def test_uplift_qini_operation_minted(ctx, spark):
    rows = [(10.0, 1, 1), (10.0, 0, 0), (1.0, 1, 0), (1.0, 0, 0)]
    out = ctx.run_job(
        "table.ml.uplift_qini", {"table": _qini_frame(spark, rows)},
        operation_config={"score_column": "score", "treat_column": "tr",
                          "outcome_column": "y", "n_bins": 2})
    rows_out = {r.bucket: r for r in out["table"].data.collect()}
    assert rows_out[1].cum_qini == pytest.approx(1.0, abs=1e-9)


def test_rake_weights_hits_uniform_margins(spark):
    """After 8 IPF iterations on a skewed 2x2 grid, fitted row/column
    margins land within 1e-2 of the uniform targets and weights are
    positive."""
    from kiara_spark.operators.quality import rake_weights

    rows = ([("a", "x")] * 30 + [("a", "y")] * 10
            + [("b", "x")] * 10 + [("b", "y")] * 50)
    df = spark.createDataFrame(rows, "r string, c string")
    out = rake_weights(df, "r", "c", n_iter=8).collect()
    # total 100, 2 rows, 2 cols -> every margin targets 50
    from collections import defaultdict
    rm, cm = defaultdict(float), defaultdict(float)
    for o in out:
        rm[o.r] += o.fitted
        cm[o.c] += o.fitted
        assert o.weight > 0
    for v in list(rm.values()) + list(cm.values()):
        assert v == pytest.approx(50.0, abs=1e-2)


def test_rake_weights_explicit_targets(spark):
    """Explicit row targets (75/25 split) are honored; column margins
    still rake to their uniform default."""
    from kiara_spark.operators.quality import rake_weights

    rows = ([("a", "x")] * 25 + [("a", "y")] * 25
            + [("b", "x")] * 25 + [("b", "y")] * 25)
    df = spark.createDataFrame(rows, "r string, c string")
    out = rake_weights(df, "r", "c", n_iter=3,
                       row_targets={"a": 75.0, "b": 25.0}).collect()
    ra = sum(o.fitted for o in out if o.r == "a")
    rb = sum(o.fitted for o in out if o.r == "b")
    assert ra == pytest.approx(75.0, abs=1e-2)
    assert rb == pytest.approx(25.0, abs=1e-2)


def test_rake_weights_uniform_grid_is_identity(spark):
    """A perfectly balanced grid already meets uniform targets: every
    weight stays exactly 1."""
    from kiara_spark.operators.quality import rake_weights

    rows = [(r, c) for r in "ab" for c in "xy" for _ in range(10)]
    df = spark.createDataFrame(rows, "r string, c string")
    out = rake_weights(df, "r", "c", n_iter=3).collect()
    assert all(o.weight == 1.0 for o in out)
    assert all(o.fitted == 10.0 for o in out)


def test_rake_weights_operation_minted(ctx, spark):
    rows = [("a", "x"), ("a", "x"), ("b", "y")]
    df = spark.createDataFrame(rows, "r string, c string")
    out = ctx.run_job(
        "table.weights.rake", {"table": df},
        operation_config={"row_column": "r", "col_column": "c"})
    got = {(o.r, o.c): o for o in out["table"].data.collect()}
    assert got[("a", "x")].n == 2 and got[("b", "y")].n == 1
    # disconnected diagonal grid: each row/col pair rakes independently
    # to total/2 = 1.5
    assert got[("a", "x")].fitted == pytest.approx(1.5, abs=1e-6)
    assert got[("b", "y")].fitted == pytest.approx(1.5, abs=1e-6)


def _grp_frame(spark, rows):
    return spark.createDataFrame(rows, "g string, x double")


def test_tost_identical_arms_equivalent(spark):
    """Same distribution in both arms with a margin well above the SE:
    both one-sided tests reject, equivalence declared."""
    from kiara_spark.operators.quality import tost_equivalence

    rows = [("a", float(v)) for v in (10, 11, 12) * 10] \
        + [("b", float(v)) for v in (10, 11, 12) * 10]
    r = tost_equivalence(_grp_frame(spark, rows), "g", "x", "a", "b",
                         margin=5.0).collect()[0]
    assert r.diff == pytest.approx(0.0, abs=1e-9)
    assert r.p_tost < 0.001 and r.equivalent_at_05 is True


def test_tost_distinct_arms_not_equivalent(spark):
    """Arms 10 apart with a ±1 margin: the upper one-sided test cannot
    reject, p_tost ~ 1, no equivalence claim."""
    from kiara_spark.operators.quality import tost_equivalence

    rows = [("a", 10.0 + (i % 3)) for i in range(12)] \
        + [("b", 20.0 + (i % 3)) for i in range(12)]
    r = tost_equivalence(_grp_frame(spark, rows), "g", "x", "a", "b",
                         margin=1.0).collect()[0]
    assert r.diff == pytest.approx(-10.0, abs=1e-9)
    assert r.p_tost > 0.99 and r.equivalent_at_05 is False


def test_tost_degenerate_null_contract(spark):
    """Single-row arm: no variance evidence -> NULL p and verdict."""
    from kiara_spark.operators.quality import tost_equivalence

    rows = [("a", 1.0), ("b", 1.0), ("b", 2.0)]
    r = tost_equivalence(_grp_frame(spark, rows), "g", "x", "a", "b",
                         margin=1.0).collect()[0]
    assert r.p_tost is None and r.equivalent_at_05 is None


def test_tost_operation_minted(ctx, spark):
    rows = [("a", float(v)) for v in (1, 2, 3) * 5] \
        + [("b", float(v)) for v in (1, 2, 3) * 5]
    out = ctx.run_job(
        "table.stats.tost_equivalence",
        {"table": _grp_frame(spark, rows)},
        operation_config={"group_column": "g", "value_column": "x",
                          "group_a": "a", "group_b": "b", "margin": 2.0})
    r = out["table"].data.collect()[0]
    assert r.equivalent_at_05 is True


def _iv_frame(spark, rows):
    return spark.createDataFrame(rows, "z int, t int, y double")


def test_iv_wald_perfect_compliance_is_difference(spark):
    """t == z: first stage is exactly 1 and beta reduces to the plain
    difference in means."""
    from kiara_spark.operators.quality import iv_wald

    rows = [(1, 1, 3.0 + (i % 2)) for i in range(10)] \
        + [(0, 0, 1.0 + (i % 2)) for i in range(10)]
    r = iv_wald(_iv_frame(spark, rows), "z", "t", "y").collect()[0]
    assert r.first_stage == pytest.approx(1.0, abs=1e-9)
    assert r.beta_iv == pytest.approx(2.0, abs=1e-9)
    assert r.se is not None and r.p_value is not None


def test_iv_wald_half_compliance_scales_up(spark):
    """First stage 0.5 doubles the reduced form: the LATE rescaling."""
    from kiara_spark.operators.quality import iv_wald

    rows = ([(1, 1, 2.0), (1, 0, 0.0)] * 6
            + [(0, 0, 0.0), (0, 0, 0.0)] * 6)
    r = iv_wald(_iv_frame(spark, rows), "z", "t", "y").collect()[0]
    assert r.first_stage == pytest.approx(0.5, abs=1e-9)
    assert r.reduced_form == pytest.approx(1.0, abs=1e-9)
    assert r.beta_iv == pytest.approx(2.0, abs=1e-9)


def test_iv_wald_zero_first_stage_null(spark):
    """No instrument effect on take-up: beta undefined -> NULL chain."""
    from kiara_spark.operators.quality import iv_wald

    rows = [(1, 0, 2.0), (1, 0, 3.0), (0, 0, 1.0), (0, 0, 2.0)]
    r = iv_wald(_iv_frame(spark, rows), "z", "t", "y").collect()[0]
    assert r.first_stage == pytest.approx(0.0, abs=1e-12)
    assert r.beta_iv is None and r.se is None and r.p_value is None


def test_iv_wald_operation_minted(ctx, spark):
    rows = [(1, 1, 3.0), (1, 1, 4.0), (0, 0, 1.0), (0, 0, 2.0)]
    out = ctx.run_job(
        "table.stats.iv_wald", {"table": _iv_frame(spark, rows)},
        operation_config={"instrument_column": "z", "treat_column": "t",
                          "y_column": "y"})
    r = out["table"].data.collect()[0]
    assert r.beta_iv == pytest.approx(2.0, abs=1e-9)
