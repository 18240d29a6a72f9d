"""Window operators: batch semantics + batch/streaming equivalence."""

import datetime as dt

from kiara_spark.streaming import windows as W


def _events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, "u1", 1.0),
        (2, base + dt.timedelta(minutes=10), "u1", 2.0),
        (3, base + dt.timedelta(minutes=70), "u1", 3.0),   # new hour, same session? gap 60m > 30m -> new session
        (4, base + dt.timedelta(minutes=80), "u2", 4.0),
    ]
    return spark.createDataFrame(rows, "event_id int, ts timestamp, user string, value double")


def test_tumbling_window(spark):
    out = W.tumbling_window_agg(_events(spark), "ts", "1 hour", keys=["user"],
                                aggregations=[{"fn": "count", "column": "*", "alias": "n"}])
    rows = {(r["window_start"], r["user"]): r["n"] for r in out.collect()}
    epoch = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    assert rows[(epoch, "u1")] == 2
    assert rows[(epoch + 3600, "u1")] == 1
    assert rows[(epoch + 3600, "u2")] == 1


def test_sliding_window_multiplicity(spark):
    out = W.sliding_window_agg(_events(spark), "ts", "1 hour", "15 minutes")
    # each event appears in exactly 4 sliding windows
    total = sum(r["n"] for r in out.collect())
    assert total == 4 * 4


def test_session_window_gap(spark):
    out = W.session_window_agg(_events(spark), "ts", "30 minutes", keys=["user"])
    u1 = sorted([r for r in out.collect() if r["user"] == "u1"],
                key=lambda r: r["window_start"])
    assert len(u1) == 2           # 60-min gap splits u1 into two sessions
    assert u1[0]["n"] == 2
    # session end = last event + gap
    assert u1[0]["window_end"] - (u1[0]["window_start"] + 600) == 1800


def test_streaming_matches_batch(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "events_stream")
    ev.write.mode("overwrite").parquet(path)
    stream = W.read_parquet_stream(spark, path)
    result = W.streaming_tumbling_agg(stream, "ts", "1 hour", watermark="2 hours",
                                      keys=["user"])
    # complete mode: append would hold back windows the watermark hasn't
    # closed, and a finite file stream ends before that happens
    q = W.run_stream_to_memory(result, "t_stream_eq", mode="complete")
    q.awaitTermination(60)
    got = {(r["window_start"], r["user"]): r["n"]
           for r in spark.table("t_stream_eq").collect()}
    batch = W.tumbling_window_agg(ev, "ts", "1 hour", keys=["user"])
    want = {(r["window_start"], r["user"]): r["n"] for r in batch.collect()}
    assert got == want


def test_retention_cohorts_module(ctx, tables):
    out = ctx.run_job("events.retention.cohorts", {"table": ctx.get_value("events")})
    df = out["table"].data
    assert set(df.columns) == {"cohort_day", "day_offset", "n_users"}
    # offsets are non-negative and every cohort has a day-0 cell
    assert df.filter("day_offset < 0").count() == 0
    cohorts = df.select("cohort_day").distinct().count()
    assert df.filter("day_offset = 0").count() == cohorts


def test_gap_fill_hourly_dense_and_locf(spark):
    from kiara_spark.streaming.windows import gap_fill_hourly

    rows = [("a", "2024-01-01 00:10:00", 1.0),
            ("a", "2024-01-01 03:20:00", 5.0),
            ("b", "2024-01-01 01:00:00", 2.0)]
    df = spark.createDataFrame(rows, "event_type string, ts string, value double") \
        .selectExpr("event_type", "CAST(ts AS TIMESTAMP) ts", "value")
    out = gap_fill_hourly(df).orderBy("event_type", "hour_ts").collect()
    a = [r for r in out if r["event_type"] == "a"]
    # dense hourly grid across a's [00:00, 03:00] span: 4 rows, gaps filled
    assert len(a) == 4
    assert [r["was_gap"] for r in a] == [0, 1, 1, 0]
    assert [r["filled_value"] for r in a] == [1.0, 1.0, 1.0, 5.0]
    assert len([r for r in out if r["event_type"] == "b"]) == 1


def test_funnel_strict_ordering(spark):
    from kiara_spark.streaming.windows import funnel_stages

    rows = [
        # u1 completes the funnel in order
        (1, "signup", "2024-01-01 00:00:00"), (1, "click", "2024-01-01 01:00:00"),
        (1, "purchase", "2024-01-01 02:00:00"),
        # u2 clicked BEFORE signing up: click doesn't count, purchase unreachable
        (2, "click", "2024-01-01 00:00:00"), (2, "signup", "2024-01-01 01:00:00"),
        (2, "purchase", "2024-01-01 02:00:00"),
        # u3 never signed up
        (3, "click", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, event_type string, ts string") \
        .selectExpr("user_id", "event_type", "CAST(ts AS TIMESTAMP) ts")
    out = {r["stage"]: r["n_users"]
           for r in funnel_stages(df, ["signup", "click", "purchase"]).collect()}
    assert out == {"signup": 2, "click": 1, "purchase": 1}


def test_anomaly_hourly_zscore_flags_spike(spark):
    """A key with a flat hourly baseline plus one big spike flags exactly
    the spike hour; a constant-volume key flags nothing."""
    import pyspark.sql.functions as F
    from kiara_spark.streaming.windows import anomaly_hourly_counts

    rows = []
    # 'steady': 5 events every hour for 10 hours -> zero variance, no flags
    for h in range(10):
        rows += [("steady", h * 3600 + i) for i in range(5)]
    # 'spiky': 2/hour for 29 hours, then 60 in hour 29.  (The long baseline
    # matters: a single outlier among n points caps at z=(n-1)/sqrt(n)
    # against the population std, so 10 points could never clear 3 sigma.)
    for h in range(29):
        rows += [("spiky", h * 3600 + i) for i in range(2)]
    rows += [("spiky", 29 * 3600 + i) for i in range(60)]
    df = spark.createDataFrame(rows, "event_type string, sec long") \
        .select("event_type", F.timestamp_seconds("sec").alias("ts"))

    out = anomaly_hourly_counts(df, ts_col="ts", key_col="event_type", k_sigma=3.0)
    flagged = {(r["event_type"], r["hour_ts"]) for r in out.filter("is_anomaly = 1").collect()}
    assert flagged == {("spiky", 29 * 3600)}
    assert out.filter("event_type = 'steady' and is_anomaly = 1").count() == 0


def test_user_lifetime_stats_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState/transformWithState lifetime aggregate: the
    single-batch availableNow emission equals the batch SQL aggregate, with
    an exact int64-micros sum."""
    from pyspark.sql import functions as F

    from kiara_spark.streaming import stateful as ST
    from kiara_spark.streaming import windows as W

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    path = str(tmp_path / "ev")
    ev.write.parquet(path)
    stream = W.read_parquet_stream(spark, path)
    q = W.run_stream_to_memory(
        ST.user_lifetime_stats_stream(stream), "lifetime_t")
    q.awaitTermination(120)
    got = {r["user_id"]: (r["n_events"], r["sum_value_micros"],
                          r["first_us"], r["last_us"])
           for r in spark.table("lifetime_t").collect()}
    want = {r["user_id"]: (r["n"], r["s"], r["mn"], r["mx"])
            for r in ev.groupBy("user_id").agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("value") * 1_000_000).cast("long")).alias("s"),
                F.min(F.unix_micros("ts")).alias("mn"),
                F.max(F.unix_micros("ts")).alias("mx")).collect()}
    assert got == want


def test_user_lifetime_stats_tws_plan_builds(spark, tmp_path):
    """The transformWithStateInPandas variant builds a valid streaming plan
    with the declared output schema (execution needs protobuf, gated)."""
    from kiara_spark.streaming import stateful as ST
    from kiara_spark.streaming import windows as W

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    path = str(tmp_path / "ev2")
    ev.write.parquet(path)
    stream = W.read_parquet_stream(spark, path)
    df = ST.user_lifetime_stats_stream(stream, api="tws")
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "user_id", "n_events", "sum_value_micros", "first_us", "last_us"]


def test_streaming_checkpoint_restart_recovers_state(spark, tmp_path):
    """Failure recovery contract: a stopped streaming aggregation restarted
    from its checkpoint must (a) NOT reprocess batch-1 files and (b) resume
    its running counts, so the final totals equal a single uninterrupted
    run.  This is what makes a 100-executor streaming job survive a driver
    restart."""
    import os

    from kiara_spark.streaming.windows import read_parquet_stream

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    b1 = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(10)], "id long, k string")
    b1.coalesce(1).write.mode("append").parquet(src)

    def start():
        stream = read_parquet_stream(spark, src)
        counts = stream.groupBy("k").count()
        return (counts.writeStream.format("memory")
                .queryName("ckpt_restart_demo")
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start())

    q1 = start()
    q1.awaitTermination(120)
    first = {r.k: r["count"] for r in
             spark.sql("select * from ckpt_restart_demo").collect()}
    assert first == {"a": 5, "b": 5}

    # second batch arrives while the query is DOWN
    b2 = spark.createDataFrame([(100 + i, "a") for i in range(3)],
                               "id long, k string")
    b2.coalesce(1).write.mode("append").parquet(src)

    q2 = start()
    q2.awaitTermination(120)
    final = {r.k: r["count"] for r in
             spark.sql("select * from ckpt_restart_demo").collect()}
    # state resumed: totals include both batches exactly once
    assert final == {"a": 8, "b": 5}
    # and the restart consumed only the new file (offset log advanced, not reset)
    offsets = sorted(os.listdir(os.path.join(ckpt, "offsets")))
    assert len([o for o in offsets if not o.startswith(".")]) == 2


def test_gap_fill_interpolate_linear_values(spark):
    from datetime import datetime

    from kiara_spark.streaming.windows import gap_fill_interpolate

    def _ts(s):
        return datetime.fromisoformat(s)

    # key A: anchors at hour 0 (value 10) and hour 3 (value 40);
    # hours 1 and 2 must interpolate to 20 and 30
    rows = [(1, "A", _ts("2024-01-01 00:10:00"), 10.0),
            (2, "A", _ts("2024-01-01 03:20:00"), 40.0)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double")
    out = {r.hour_ts: (r.interpolated_value, r.was_gap)
           for r in gap_fill_interpolate(df).collect()}
    base = min(out)
    vals = [out[base + 3600 * i] for i in range(4)]
    assert vals == [(10.0, 0), (20.0, 1), (30.0, 1), (40.0, 0)]


def test_gap_interpolate_op_registered(ctx):
    assert ctx.operation_registry.resolve(
        "events.gap_fill.interpolate") is not None


def test_streaming_progress_listener_metrics(spark, tmp_path):
    """Observability contract: the progress listener must see every
    micro-batch with exact input-row counts and stateful-operator sizes —
    what a production dashboard charts."""
    import os
    import time

    from kiara_spark.streaming.monitor import attach_progress_listener
    from kiara_spark.streaming.windows import read_parquet_stream

    src = str(tmp_path / "mon_src")
    os.makedirs(src)
    spark.createDataFrame([(i, "a") for i in range(20)],
                          "id long, k string") \
        .coalesce(1).write.mode("append").parquet(src)

    mon = attach_progress_listener(spark)
    try:
        stream = read_parquet_stream(spark, src)
        q = (stream.groupBy("k").count()
             .writeStream.format("memory").queryName("mon_demo")
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination(120)
        # listener events are delivered asynchronously
        deadline = time.monotonic() + 30
        while time.monotonic() < deadline and not mon.batches_for("mon_demo"):
            time.sleep(0.2)
        s = mon.summary("mon_demo")
        assert s["n_batches"] >= 1
        assert s["total_input_rows"] == 20
        assert s["max_state_rows"] >= 1  # the aggregation kept state
        assert mon.started  # lifecycle seen
    finally:
        spark.streams.removeListener(mon)
