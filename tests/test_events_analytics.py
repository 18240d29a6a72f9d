"""Event-log analytics family (operators/events.py): debounce, cumulative
distinct, OHLC resample, last-touch attribution, gaps-and-islands."""

from datetime import datetime

import pytest

from kiara_spark.operators import events as E


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def small_events(spark):
    rows = [
        # user 1: events at 0s, 100s, 400s, 450s (same type)
        (1, 1, "click", _ts("2024-01-01 00:00:00"), 1.0),
        (2, 1, "click", _ts("2024-01-01 00:01:40"), 2.0),
        (3, 1, "click", _ts("2024-01-01 00:06:40"), 3.0),
        (4, 1, "click", _ts("2024-01-01 00:07:30"), 4.0),
        # user 1 purchase after clicks
        (5, 1, "purchase", _ts("2024-01-01 00:08:00"), 9.0),
        # user 2: single view, then purchase at the SAME instant as a click
        (6, 2, "view", _ts("2024-01-01 01:00:00"), 1.5),
        (7, 2, "click", _ts("2024-01-01 02:00:00"), 2.5),
        (8, 2, "purchase", _ts("2024-01-01 02:00:00"), 8.0),
        # user 3: purchase with no touches
        (9, 3, "purchase", _ts("2024-01-01 03:00:00"), 7.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, "
              "value double")


def test_debounce_lag_semantics(small_events):
    out = E.debounce_events(small_events, ["user_id", "event_type"],
                            min_gap_seconds=300)
    kept = sorted(r.event_id for r in out.collect())
    # user 1 clicks: e1 kept (first), e2 dropped (100s), e3 kept (300s from
    # e2 — lag semantics compares to PREVIOUS event, not last survivor),
    # e4 dropped (50s).  All singletons kept.
    assert kept == [1, 3, 5, 6, 7, 8, 9]


def test_cumulative_distinct_first_seen(spark):
    rows = [
        (1, _ts("2024-01-01 10:00:00")), (1, _ts("2024-01-02 10:00:00")),
        (2, _ts("2024-01-02 10:00:00")), (3, _ts("2024-01-02 11:00:00")),
        (2, _ts("2024-01-04 10:00:00")), (4, _ts("2024-01-04 10:00:00")),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {r.day: (r.new_entities, r.cumulative_distinct)
           for r in E.cumulative_distinct_daily(df).collect()}
    assert out == {"2024-01-01": (1, 1), "2024-01-02": (2, 3),
                   "2024-01-04": (1, 4)}


def test_ohlc_tiebreak_and_bounds(spark):
    rows = [  # all in one hour bucket; first/last tie-broken on event_id
        (1, "s", _ts("2024-01-01 00:10:00"), 5.0),
        (2, "s", _ts("2024-01-01 00:10:00"), 3.0),  # same ts as e1
        (3, "s", _ts("2024-01-01 00:50:00"), 9.0),
        (4, "s", _ts("2024-01-01 00:50:00"), 1.0),  # same ts as e3
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double")
    r = E.resample_ohlc(df).collect()[0]
    assert (r.open, r.high, r.low, r.close, r.volume) == (5.0, 9.0, 1.0, 1.0, 4)


def test_attribution_strict_before(small_events):
    out = {r.channel: r.n_conversions
           for r in E.last_touch_attribution(small_events).collect()}
    # user 1: last touch before purchase = click; user 2: purchase at the
    # same instant as a click — strict as-of excludes it, so the earlier
    # view wins; user 3: no touches -> (none).
    assert out == {"click": 1, "view": 1, "(none)": 1}


def test_gaps_islands_runs(spark):
    rows = [(1, d) for d in (10, 11, 12, 15, 17, 18)] + [(2, 5)]
    df = spark.createDataFrame(rows, "k long, s long")
    out = {(r.k, r.island_start): (r.island_end, r.island_len)
           for r in E.gaps_islands(df, "k", "s").collect()}
    assert out == {(1, 10): (12, 3), (1, 15): (15, 1), (1, 17): (18, 2),
                   (2, 5): (5, 1)}


def test_gaps_islands_dedups_input(spark):
    df = spark.createDataFrame([(1, 7), (1, 7), (1, 8)], "k long, s long")
    out = E.gaps_islands(df, "k", "s").collect()
    assert len(out) == 1 and out[0].island_len == 2


def test_ops_registered(ctx):
    for op in ("events.dedup.debounce", "events.cumulative_distinct",
               "events.resample.ohlc", "events.attribution.last_touch",
               "table.gaps_islands"):
        assert ctx.operation_registry.resolve(op) is not None


def test_ewma_truncated_weights(spark):
    # key A: days 1,2 with values 10, 20 -> ewma(day2) =
    # (0.3*20 + 0.21*10) / (0.3 + 0.21)
    rows = [
        (1, "A", _ts("2024-01-01 05:00:00"), 10.0),
        (2, "A", _ts("2024-01-02 05:00:00"), 20.0),
        (3, "B", _ts("2024-01-01 09:00:00"), 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double")
    out = {(r.key, r.day): r.ewma for r in E.ewma_truncated(
        df, key_col="event_type", alpha=0.3, horizon=8).collect()}
    assert out[("A", "2024-01-01")] == 10.0  # single term, renormalized
    expected = round((0.3 * 20 + 0.3 * 0.7 * 10) / (0.3 + 0.3 * 0.7), 6)
    assert out[("A", "2024-01-02")] == expected
    assert out[("B", "2024-01-01")] == 5.0


def test_ewma_daily_resample_mean(spark):
    # two same-day events average before the EWMA sees them
    rows = [(1, "A", _ts("2024-01-01 05:00:00"), 10.0),
            (2, "A", _ts("2024-01-01 06:00:00"), 30.0)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double")
    out = E.ewma_truncated(df, key_col="event_type").collect()
    assert len(out) == 1 and out[0].day_avg == 20.0 and out[0].ewma == 20.0


def test_event_path_ngrams_counts(small_events):
    out = {r.path: r.n_paths for r in E.event_path_ngrams(
        small_events, n=2, top_k=10).collect()}
    # user 1: click>click x3, click>purchase; user 2: view>click,
    # click>purchase (same-instant tie broken by event_id)
    assert out["click > click"] == 3
    assert out["click > purchase"] == 2
    assert out["view > click"] == 1
    # incomplete tails (last event per user) never produce short paths
    assert all(" > " in p for p in out)


def test_new_event_ops_registered(ctx):
    for op in ("events.ewma", "events.path_ngrams"):
        assert ctx.operation_registry.resolve(op) is not None


def test_capped_running_balance_clamps(spark):
    from kiara_spark.operators.events import capped_running_balance

    rows = [
        (1, "A", _ts("2024-01-01 05:00:00"), 10.0),
        (2, "A", _ts("2024-01-02 05:00:00"), -25.0),  # would go to -15
        (3, "A", _ts("2024-01-03 05:00:00"), 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, delta double")
    out = {r.day: r.balance for r in capped_running_balance(
        df, key_col="event_type", delta_col="delta").collect()}
    # clamp at 0 resets the base: day 3 starts from 0, NOT from -15
    assert out == {"2024-01-01": 10.0, "2024-01-02": 0.0, "2024-01-03": 7.0}


def test_capped_balance_partition_invariant(spark):
    from kiara_spark.operators.events import capped_running_balance

    rows = [(i, "K", _ts(f"2024-01-{(i % 27) + 1:02d} 01:00:00"),
             float((i * 13) % 40 - 18)) for i in range(300)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, delta double")
    a = sorted(map(tuple, capped_running_balance(
        df, delta_col="delta").collect()))
    b = sorted(map(tuple, capped_running_balance(
        df.repartition(7), delta_col="delta").collect()))
    assert a == b


def test_capped_balance_op_registered(ctx):
    assert ctx.operation_registry.resolve("events.balance.capped") is not None


def test_seasonal_decompose_recovers_daily_pattern(spark):
    import datetime

    from kiara_spark.operators.events import seasonal_decompose

    # 4 days, hourly: base 10 events + 5 extra every noon
    rows = []
    eid = 0
    t0 = datetime.datetime(2024, 1, 1)
    for hr in range(96):
        ts = t0 + datetime.timedelta(hours=hr)
        n = 10 + (5 if ts.hour == 12 else 0)
        for _ in range(n):
            rows.append((eid, ts))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {(r.bucket_ts.hour, r.bucket_ts.day): r
           for r in seasonal_decompose(df).collect()}
    assert len(out) == 96
    # interior noon buckets: seasonal component carries the spike,
    # residual stays small
    mid = out[(12, 2)]
    off = out[(3, 2)]
    assert mid.seasonal > off.seasonal + 3
    assert abs(mid.residual) < 2 and abs(off.residual) < 2
    # decomposition identity: c == trend + seasonal + residual (to 5dp)
    for r in out.values():
        assert abs(r.c - (r.trend + r.seasonal + r.residual)) < 1e-4


def test_seasonal_ops_registered(ctx):
    assert ctx.operation_registry.resolve(
        "events.seasonal_decompose") is not None


def test_autocorrelation_periodic_series(spark):
    import datetime

    from kiara_spark.operators.events import autocorrelation

    # strict period-3 pattern: 5, 10, 20, 5, 10, 20, ...
    rows, eid = [], 0
    t0 = datetime.datetime(2024, 1, 1)
    for hr in range(30):
        for _ in range([5, 10, 20][hr % 3]):
            rows.append((eid, t0 + datetime.timedelta(hours=hr)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    acf = {r.lag: r.acf for r in autocorrelation(df, max_lag=6).collect()}
    # period-3 signal: strong positive at lags 3 and 6, negative at 1, 2
    assert acf[3] > 0.85 and acf[6] > 0.7
    assert acf[1] < 0 and acf[2] < 0
    assert all(-1.001 <= v <= 1.001 for v in acf.values())


def test_acf_op_registered(ctx):
    assert ctx.operation_registry.resolve("events.autocorrelation") is not None


def test_funnel_strict_progression(spark):
    import datetime

    from kiara_spark.operators.events import funnel

    t0 = datetime.datetime(2024, 1, 1)

    def ev(uid, minute, ty):
        return (uid, t0 + datetime.timedelta(minutes=minute), ty)

    rows = [
        # user 1: full ordered funnel
        ev(1, 0, "a"), ev(1, 1, "b"), ev(1, 2, "c"),
        # user 2: b before a -> stops after a (b never strictly after a)
        ev(2, 0, "b"), ev(2, 1, "a"),
        # user 3: a and b at the SAME instant -> strict ordering rejects b
        ev(3, 0, "a"), ev(3, 0, "b"),
        # user 4: a only
        ev(4, 0, "a"),
        # user 5: no step events at all
        ev(5, 0, "zzz"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string")
    out = {r.step: r for r in
           funnel(df, ["a", "b", "c"]).collect()}
    assert [out[s].users for s in (1, 2, 3)] == [4, 1, 1]
    assert out[1].pct_of_first == 1.0
    assert out[2].pct_of_prev == 0.25
    assert out[3].pct_of_prev == 1.0


def test_funnel_zero_tail_and_registration(spark, ctx):
    import datetime

    from kiara_spark.operators.events import funnel

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), "a")],
        "user_id long, ts timestamp, event_type string")
    out = funnel(df, ["a", "b"]).collect()
    assert [r.users for r in out] == [1, 0]
    assert out[1].pct_of_first == 0.0 and out[1].pct_of_prev == 0.0
    assert ctx.operation_registry.resolve("events.funnel") is not None


def test_cohort_retention_offsets(spark, ctx):
    import datetime

    from kiara_spark.operators.events import cohort_retention

    # Mondays: 2024-01-01 and 2024-01-08 and 2024-01-15
    rows = [
        (1, datetime.datetime(2024, 1, 2)),   # cohort w0
        (1, datetime.datetime(2024, 1, 9)),   # active w1
        (2, datetime.datetime(2024, 1, 3)),   # cohort w0, never again
        (3, datetime.datetime(2024, 1, 10)),  # cohort w1
        (3, datetime.datetime(2024, 1, 16)),  # active w2 (offset 1)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    cells = {(r.cohort_week, r.week_offset): r
             for r in cohort_retention(df).collect()}
    assert cells[("2024-01-01", 0)].active_users == 2
    assert cells[("2024-01-01", 1)].active_users == 1
    assert cells[("2024-01-01", 1)].retention == 0.5
    assert cells[("2024-01-08", 0)].active_users == 1
    assert cells[("2024-01-08", 1)].retention == 1.0
    assert ("2024-01-01", 2) not in cells
    assert ctx.operation_registry.resolve(
        "events.cohort_retention") is not None


def test_interval_coverage_merges_overlaps(spark, ctx):
    from kiara_spark.operators.events import interval_coverage

    rows = [
        # user 1: [0,10) + [5,15) merge; [20,30) separate; [30,40) touches
        (1, 0, 10), (1, 5, 15), (1, 20, 30), (1, 30, 40),
        # user 2: nested interval fully inside another
        (2, 0, 100), (2, 10, 20),
    ]
    df = spark.createDataFrame(rows, "u long, s long, e long")
    out = {r.u: r for r in interval_coverage(df, "u", "s", "e").collect()}
    assert out[1].n_islands == 2           # [0,15) and [20,40)
    assert out[1].covered == 15 + 20
    assert out[2].n_islands == 1 and out[2].covered == 100
    assert ctx.operation_registry.resolve(
        "events.interval_coverage") is not None


def test_rfm_segments_scores(spark, ctx):
    import datetime

    from kiara_spark.operators.events import rfm_segments

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: recent + frequent + big spender -> champion
    for i in range(20):
        rows.append((1, t0 + datetime.timedelta(days=29, minutes=i), 100.0))
    # user 2: long-gone, single tiny purchase -> hibernating
    rows.append((2, t0, 1.0))
    # middling users to populate the quantile grid
    for u in range(3, 8):
        for i in range(u):
            rows.append((u, t0 + datetime.timedelta(days=u * 3), 10.0 * u))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r.user_id: r for r in rfm_segments(df).collect()}
    assert out[1].segment == "champion"
    assert out[1].r_score == 5 and out[1].f_score == 5 and out[1].m_score == 5
    assert out[2].segment == "hibernating"
    assert out[2].recency_us == 29 * 86400 * 10**6 + 19 * 60 * 10**6
    assert out[1].monetary == 2000.0
    assert ctx.operation_registry.resolve("events.rfm_segments") is not None


def test_kaplan_meier_textbook_case(spark, ctx):
    from kiara_spark.operators.events import kaplan_meier

    # classic toy: deaths at t=1 (n=5), t=3 (n=3); censored at t=2, t=4;
    # last subject dies at t=5 -> survival hits exactly 0
    rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 1)]
    df = spark.createDataFrame(rows, "dur long, ev int")
    out = {r.t: r for r in kaplan_meier(df, "dur", "ev").collect()}
    assert set(out) == {1, 3, 5}  # censor-only times not in the curve
    assert out[1].n_risk == 5 and out[1].n_events == 1
    assert abs(out[1].survival - 0.8) < 1e-6
    assert out[3].n_risk == 3
    assert abs(out[3].survival - 0.8 * (2 / 3)) < 1e-5
    assert out[5].n_risk == 1 and out[5].survival == 0.0
    assert ctx.operation_registry.resolve(
        "events.survival.kaplan_meier") is not None


def test_markov_stationary_absorbing_pull(spark, ctx):
    import datetime

    from kiara_spark.operators.events import markov_stationary

    # chain a -> b -> b -> b ... : b absorbs mass round after round
    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(5):
        seq = ["a", "b", "b", "b", "b"]
        for i, ty in enumerate(seq):
            rows.append((eid, u, t0 + datetime.timedelta(minutes=i), ty))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    out = {r.state: r.prob for r in
           markov_stationary(df, iterations=3).collect()}
    # P(a->b)=1, P(b->b)=1: after >=1 round all of a's mass sits on b
    assert out["b"] == 1.0 and out["a"] == 0.0
    # probabilities stay a distribution when the chain has no dangling state
    assert abs(sum(out.values()) - 1.0) < 1e-9
    assert ctx.operation_registry.resolve(
        "events.markov_stationary") is not None


def test_position_based_attribution_credits(spark, ctx):
    import datetime

    from kiara_spark.operators.events import position_based_attribution

    t0 = datetime.datetime(2024, 1, 1)

    def ev(eid, uid, minute, ty):
        return (eid, uid, t0 + datetime.timedelta(minutes=minute), ty)

    rows = [
        # user 1: click, view, view, click -> purchase (4 touches):
        # first click 0.4, last click 0.4, two middle views 0.1 each
        ev(1, 1, 0, "click"), ev(2, 1, 1, "view"), ev(3, 1, 2, "view"),
        ev(4, 1, 3, "click"), ev(5, 1, 4, "purchase"),
        # user 2: single view -> purchase: view gets 1.0
        ev(6, 2, 0, "view"), ev(7, 2, 1, "purchase"),
        # user 3: touches AFTER purchase get nothing
        ev(8, 3, 5, "purchase"), ev(9, 3, 6, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    out = {r.touch_type: r for r in position_based_attribution(
        df, touch_types=["click", "view"]).collect()}
    assert out["click"].credit == 0.8 and out["click"].n_touches == 2
    assert out["view"].credit == 1.2 and out["view"].n_touches == 3
    assert ctx.operation_registry.resolve(
        "events.attribution.position_based") is not None


def test_changepoint_binseg_finds_level_shift(spark, ctx):
    import datetime

    from kiara_spark.operators.events import changepoint_binseg

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    # 10 days at ~5/day, then 10 days at ~20/day: split after day 10
    for d in range(20):
        for _ in range(5 if d < 10 else 20):
            rows.append((eid, t0 + datetime.timedelta(days=d, hours=1)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    r = changepoint_binseg(df).collect()[0]
    assert r.split_bucket == "2024-01-10 00:00:00"
    assert r.n_left == 10 and r.n_right == 10
    assert r.mean_left == 5.0 and r.mean_right == 20.0
    assert ctx.operation_registry.resolve(
        "events.changepoint.binseg") is not None


def test_rfm_thresholds_scale_with_bins(spark):
    import datetime

    from kiara_spark.operators.events import rfm_segments

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for u in range(1, 7):
        for i in range(u):
            rows.append((u, t0 + datetime.timedelta(days=u), float(u)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = rfm_segments(df, n_bins=2).collect()
    # with 2 bins not everyone can be champion (the hardcoded-threshold bug)
    segs = {r.segment for r in out}
    assert segs != {"champion"}


# ---------------------------------------------------------------------------
# Shapley channel attribution
# ---------------------------------------------------------------------------


def _shap_frame(spark, user_events):
    """user_events: list of (user, [channel_touches...], converted)."""
    rows = []
    for u, touches, conv in user_events:
        for t in touches:
            rows.append((u, t))
        if conv:
            rows.append((u, "purchase"))
    return spark.createDataFrame(rows, "user_id bigint, event_type string")


def test_shapley_hand_computed_two_channels(spark):
    """v(A)=1, v(B)=0, v(AB)=0.5 -> phi(A)=0.75, phi(B)=-0.25; the
    credits sum to v(AB) (efficiency)."""
    out = {r.channel: r for r in E.shapley_attribution(
        _shap_frame(spark, [
            (1, ["click"], True),
            (2, ["view"], False),
            (3, ["click", "view"], True),
            (4, ["click", "view"], False),
        ]), ["click", "view"]).collect()}
    assert out["click"].shapley == pytest.approx(0.75, abs=1e-9)
    assert out["view"].shapley == pytest.approx(-0.25, abs=1e-9)
    assert out["click"].n_users == 3 and out["view"].n_users == 3
    assert out["click"].n_conversions == 2


def test_shapley_efficiency_with_unobserved_subsets(spark):
    """Every user touches all 3 channels: only v(K) is observed, so each
    channel gets v(K)/3 and the credits sum exactly to v(K)."""
    evs = [(u, ["click", "view", "signup"], u % 2 == 0)
           for u in range(1, 9)]
    out = E.shapley_attribution(
        _shap_frame(spark, evs),
        ["click", "view", "signup"]).collect()
    for r in out:
        assert r.shapley == pytest.approx(0.5 / 3, abs=1e-6)
    assert sum(r.shapley for r in out) == pytest.approx(0.5, abs=1e-5)


def test_shapley_untouched_users_excluded(spark):
    """A purchase-only user contributes to no coalition (v(empty)=0
    baseline) and channels the user never touched stay untouched."""
    base = [(1, ["click"], True), (2, ["click"], False)]
    with_ghost = base + [(99, [], True)]
    a = sorted(map(tuple, E.shapley_attribution(
        _shap_frame(spark, base), ["click", "view"]).collect()))
    b = sorted(map(tuple, E.shapley_attribution(
        _shap_frame(spark, with_ghost), ["click", "view"]).collect()))
    assert a == b


def test_shapley_operation_minted(ctx, spark):
    df = _shap_frame(spark, [(1, ["click"], True), (2, ["view"], False)])
    out = ctx.run_job(
        "events.attribution.shapley", {"table": df},
        operation_config={"channels": ["click", "view"]})
    rows = {r.channel: r.shapley for r in out["table"].data.collect()}
    # v(click)=1, v(view)=0, v(click,view) unobserved -> 0:
    # phi(click) = .5*1 + .5*(0-0) = 0.5; phi(view) = .5*0 + .5*(0-1) = -0.5
    assert rows["click"] == pytest.approx(0.5, abs=1e-9)
    assert rows["view"] == pytest.approx(-0.5, abs=1e-9)
