"""As-of and range join semantics (kiara_spark.operators.joins) on tiny
hand-built frames where the expected matches are enumerable by hand."""

import pytest
from pyspark.sql import functions as F

from kiara_spark.operators.joins import asof_join, range_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [("A", 10.0, 100), ("A", 20.0, 101), ("B", 15.0, 102), ("C", 5.0, 103)],
        "sym string, t double, trade_id int",
    ).withColumn("t", F.timestamp_seconds("t"))
    quotes = spark.createDataFrame(
        [("A", 9.0, 1.0), ("A", 15.0, 1.5), ("A", 20.0, 2.0), ("B", 16.0, 3.0)],
        "sym string, t double, px double",
    ).withColumn("t", F.timestamp_seconds("t"))
    return trades, quotes


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_asof_backward(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, by="sym", left_ts="t", value_cols=["px"])
    got = {(r["trade_id"], r["px_matched"]) for r in out.collect()}
    # A@10 -> quote@9 (px 1.0); A@20 -> quote@20 inclusive tie (px 2.0);
    # B@15 -> no quote <= 15 -> NULL; C -> no quotes at all -> NULL
    assert got == {(100, 1.0), (101, 2.0), (102, None), (103, None)}


def test_asof_forward(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, by="sym", left_ts="t", value_cols=["px"],
                    direction="forward")
    got = {(r["trade_id"], r["px_matched"]) for r in out.collect()}
    # A@10 -> next quote@15 (1.5); A@20 -> @20 tie (2.0); B@15 -> @16 (3.0)
    assert got == {(100, 1.5), (101, 2.0), (102, 3.0), (103, None)}


def test_asof_preserves_left_rowcount(trades_quotes):
    trades, quotes = trades_quotes
    assert asof_join(trades, quotes, by="sym", left_ts="t").count() == trades.count()


def test_range_join_window(trades_quotes):
    trades, quotes = trades_quotes
    out = range_join(trades, quotes, by="sym", left_ts="t", right_ts="t",
                     lower=-5.0, upper=0.0)
    got = {(r["trade_id"], r["px_right"]) for r in out.collect()}
    # window [t-5, t]: A@10 -> {9}:1.0 ; A@20 -> {15? no (20-5=15, inclusive -> yes), 20}
    assert got == {(100, 1.0), (101, 1.5), (101, 2.0)}


def test_range_join_bucket_boundaries(spark):
    # right ts exactly at lower and upper bounds must both match (inclusive),
    # and bucket math must not drop matches that straddle a bucket edge.
    left = spark.createDataFrame([(1, 1000.0)], "k int, t double").withColumn(
        "t", F.timestamp_seconds("t"))
    right = spark.createDataFrame(
        [(1, 990.0, "lo"), (1, 1000.0, "hi"), (1, 989.9, "out_lo"), (1, 1000.1, "out_hi")],
        "k int, t double, tag string").withColumn("t", F.timestamp_seconds("t"))
    out = range_join(left, right, by="k", left_ts="t", lower=-10.0, upper=0.0)
    assert {r["tag_right"] for r in out.collect()} == {"lo", "hi"}


def test_range_join_validates_bounds(trades_quotes):
    trades, quotes = trades_quotes
    with pytest.raises(ValueError, match="upper"):
        range_join(trades, quotes, by="sym", lower=5.0, upper=-5.0)


def test_asof_module_via_context(ctx, spark):
    trades = spark.createDataFrame([("A", 10.0)], "sym string, t double")
    quotes = spark.createDataFrame([("A", 8.0, 42.0)], "sym string, t double, px double")
    out = ctx.run_job("table.join.asof", {"left": trades, "right": quotes},
                      operation_config={"by": "sym", "left_ts": "t"})
    rows = out["table"].data.collect()
    assert rows[0]["px_matched"] == 42.0


def test_interval_overlap_join_semantics(spark):
    from kiara_spark.operators.joins import interval_overlap_join

    a = spark.createDataFrame(
        [(1, 100, 0, 10), (1, 101, 50, 60), (2, 102, 0, 10)],
        "k int, id int, s long, e long")
    b = spark.createDataFrame(
        [(1, 200, 10, 20),    # touches a.100 at endpoint 10 (closed: overlap)
         (1, 201, 11, 20),    # just after a.100 -> no overlap
         (1, 202, 55, 58),    # inside a.101
         (2, 203, 100, 110)], # same key, no overlap
        "k int, id int, s long, e long")
    pairs = {(r["id"], r["id_right"]) for r in interval_overlap_join(
        a, b, on="k", left_start="s", left_end="e", bucket_width=5.0).collect()}
    assert pairs == {(100, 200), (101, 202)}


def test_interval_overlap_long_intervals_no_duplicates(spark):
    """An interval spanning many grid cells still emits each pair ONCE
    (first-shared-cell dedup)."""
    from kiara_spark.operators.joins import interval_overlap_join

    a = spark.createDataFrame([(1, 0, 1000)], "id int, s long, e long")
    b = spark.createDataFrame([(2, 500, 900)], "id int, s long, e long")
    rows = interval_overlap_join(a, b, left_start="s", left_end="e",
                                 bucket_width=10.0).collect()
    assert len(rows) == 1


def test_interval_overlap_op_registered(ctx):
    assert "table.join.interval_overlap" in ctx.operation_registry.operation_ids


def test_asof_strict_excludes_equal_timestamp(spark):
    from kiara_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 100), (1, 200)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 100, "at100"), (1, 150, "at150"), (1, 200, "at200")],
        "k long, ts long, v string")
    incl = {r["ts"]: r["v_matched"] for r in asof_join(
        left, right, by="k", left_ts="ts", value_cols=["v"]).collect()}
    assert incl == {100: "at100", 200: "at200"}  # inclusive ties
    strict = {r["ts"]: r["v_matched"] for r in asof_join(
        left, right, by="k", left_ts="ts", value_cols=["v"],
        strict=True).collect()}
    assert strict == {100: None, 200: "at150"}   # strictly before


def test_asof_tiebreak_picks_latest(spark):
    from kiara_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 300)], "k long, ts long")
    right = spark.createDataFrame(
        [(1, 200, 7, "tb7"), (1, 200, 9, "tb9"), (1, 200, 8, "tb8")],
        "k long, ts long, eid long, v string")
    got = asof_join(left, right, by="k", left_ts="ts", value_cols=["v"],
                    strict=True, tiebreak="eid").collect()
    assert got[0]["v_matched"] == "tb9"  # largest tiebreak at the shared ts


def test_asof_cogroup_matches_relational(spark):
    from datetime import datetime

    from kiara_spark.operators.joins import asof_join_cogroup

    def _ts(s):
        return datetime.fromisoformat(s)

    clicks = spark.createDataFrame(
        [(1, 7, _ts("2024-01-01 10:00:00")),
         (2, 7, _ts("2024-01-01 12:00:00")),
         (3, 8, _ts("2024-01-01 09:00:00"))],  # user 8: no purchase at all
        "event_id long, user_id long, ts timestamp")
    purchases = spark.createDataFrame(
        [(10, 7, _ts("2024-01-01 09:30:00"), 5.0),
         (11, 7, _ts("2024-01-01 11:00:00"), 7.0),
         # same-instant tie: the max event_id must win deterministically
         (12, 7, _ts("2024-01-01 11:00:00"), 9.0)],
        "event_id long, user_id long, ts timestamp, value double")
    out = {r.event_id: r for r in asof_join_cogroup(
        clicks, purchases).collect()}
    assert out[1].purchase_event_id == 10 and out[1].purchase_value == 5.0
    assert out[2].purchase_event_id == 12 and out[2].purchase_value == 9.0
    assert out[3].purchase_event_id is None
    assert out[3].purchase_ts_us is None


def test_asof_cogroup_generic_string_key_and_ids(spark):
    """The output schema derives from the inputs: string join keys, string
    ids, and a custom out_prefix must work (r2 ADVICE: the merge had the
    benchmark's int64 event/user shape hardcoded)."""
    from datetime import datetime

    from kiara_spark.operators.joins import asof_join_cogroup

    def _ts(s):
        return datetime.fromisoformat(s)

    quotes = spark.createDataFrame(
        [("q1", "AAPL", _ts("2024-01-01 10:00:00")),
         ("q2", "AAPL", _ts("2024-01-01 12:00:00")),
         ("q3", "MSFT", _ts("2024-01-01 09:00:00"))],
        "quote_id string, symbol string, ts timestamp")
    trades = spark.createDataFrame(
        [("t1", "AAPL", _ts("2024-01-01 09:30:00"), 5.0),
         ("t2", "AAPL", _ts("2024-01-01 11:00:00"), 7.0)],
        "trade_id string, symbol string, ts timestamp, price double")
    got = asof_join_cogroup(
        quotes, trades, by="symbol", ts_col="ts", left_id="quote_id",
        right_id="trade_id", right_value="price", out_prefix="trade_")
    assert got.columns == ["quote_id", "symbol", "ts_us", "trade_ts_us",
                           "trade_trade_id", "trade_price"]
    out = {r.quote_id: r for r in got.collect()}
    assert out["q1"].trade_trade_id == "t1" and out["q1"].trade_price == 5.0
    assert out["q2"].trade_trade_id == "t2" and out["q2"].trade_price == 7.0
    assert out["q3"].trade_trade_id is None  # MSFT has no trades


def test_asof_cogroup_preserves_big_int64_ids(spark):
    """Review regression: an unmatched left row must not force the right
    id column through float64 (which rounds bigints above 2^53)."""
    from datetime import datetime

    from kiara_spark.operators.joins import asof_join_cogroup

    big = 9_007_199_254_740_993  # 2^53 + 1: not float64-representable
    clicks = spark.createDataFrame(
        [(1, 7, datetime.fromisoformat("2024-01-01 10:00:00")),
         (2, 8, datetime.fromisoformat("2024-01-01 10:00:00"))],  # no match
        "event_id long, user_id long, ts timestamp")
    purchases = spark.createDataFrame(
        [(big, 7, datetime.fromisoformat("2024-01-01 09:00:00"), 5.0)],
        "event_id long, user_id long, ts timestamp, value double")
    out = {r.event_id: r for r in asof_join_cogroup(
        clicks, purchases).collect()}
    assert out[1].purchase_event_id == big  # exact, not 2^53
    assert out[2].purchase_event_id is None


def test_asof_cogroup_rejects_missing_and_nontimestamp_cols(spark):
    import pytest as _pytest

    from kiara_spark.operators.joins import asof_join_cogroup

    left = spark.createDataFrame([(1, 1, 100)], "event_id long, user_id long, ts long")
    right = spark.createDataFrame([(1, 1, 100, 1.0)],
                                  "event_id long, user_id long, ts long, value double")
    with _pytest.raises(ValueError, match="timestamp"):
        asof_join_cogroup(left, right)
    with _pytest.raises(ValueError, match="not in left"):
        asof_join_cogroup(left, right, by="nope")


def test_asof_cogroup_op_registered(ctx):
    assert ctx.operation_registry.resolve("table.join.asof_cogroup") is not None


def test_geo_radius_join_matches_bruteforce(spark):
    import math
    import random

    from kiara_spark.operators.joins import geo_radius_join

    rng = random.Random(11)
    pts = [(i, rng.uniform(-60, 60), rng.uniform(-170, 170))
           for i in range(120)]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {(r.id_a, r.id_b)
           for r in geo_radius_join(df, df, radius_km=500.0,
                                    max_abs_lat=60.0).collect()}

    def hav(a, b):
        r = 6371.0088
        dphi = math.radians(b[1] - a[1]) / 2
        dl = math.radians(b[2] - a[2]) / 2
        h = (math.sin(dphi) ** 2
             + math.cos(math.radians(a[1])) * math.cos(math.radians(b[1]))
             * math.sin(dl) ** 2)
        return 2 * r * math.asin(math.sqrt(h))

    want = {(a[0], b[0]) for a in pts for b in pts
            if a[0] < b[0] and round(hav(a, b), 4) <= 500.0}
    assert got == want


def test_geo_radius_op_registered(ctx):
    assert ctx.operation_registry.resolve("table.join.geo_radius") is not None
