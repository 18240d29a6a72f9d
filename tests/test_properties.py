"""Property-based tests (hypothesis) — beyond the reference's test strategy
(SURVEY §5 notes it has no randomized testing).

Spark sessions are expensive, so strategies generate small plain-Python
inputs and each property creates DataFrames from them; deadlines disabled
(JVM warmup noise).
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(max_examples=15, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


rows_strategy = st.lists(
    st.tuples(st.integers(0, 5),              # key
              st.integers(0, 10_000),         # ts seconds
              st.floats(-1e6, 1e6, allow_nan=False)),
    min_size=1, max_size=60,
)


@given(rows=rows_strategy)
@SET
def test_content_hash_invariant_under_partitioning_and_order(spark, rows):
    """content hash is a function of CONTENT only: any repartitioning or
    row order produces the same digest."""
    from kiara_spark.hashing import dataframe_content_hash

    df = spark.createDataFrame(rows, "k int, t long, v double")
    h1 = dataframe_content_hash(df.coalesce(1))
    h2 = dataframe_content_hash(df.repartition(7, "k"))
    h3 = dataframe_content_hash(df.orderBy(F.col("v").desc()))
    assert h1 == h2 == h3


@given(rows=rows_strategy, extra=st.floats(-1e6, 1e6, allow_nan=False))
@SET
def test_content_hash_detects_any_extra_row(spark, rows, extra):
    from kiara_spark.hashing import dataframe_content_hash

    df = spark.createDataFrame(rows, "k int, t long, v double")
    df2 = df.unionAll(spark.createDataFrame([(99, 99999, extra)],
                                            "k int, t long, v double"))
    assert dataframe_content_hash(df) != dataframe_content_hash(df2)


@given(rows=rows_strategy, gap=st.integers(1, 5000))
@SET
def test_sessionize_partition_of_events(spark, rows, gap):
    """Sessions partition the events: per-key n_events sums to the key's
    event count, sessions don't overlap, and inter-session gaps exceed the
    threshold."""
    from kiara_spark.streaming.stateful import sessionize_pandas

    df = spark.createDataFrame(rows, "user_id long, t long, v double") \
        .withColumn("ts", F.timestamp_seconds("t"))
    out = sessionize_pandas(df, key="user_id", ts_col="ts",
                            gap_seconds=float(gap)).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["user_id"], []).append(r)
    from collections import Counter

    counts = Counter(k for k, _, _ in rows)
    for key, sess in by_key.items():
        sess.sort(key=lambda r: r["session_start_us"])
        assert sum(s["n_events"] for s in sess) == counts[key]
        for s in sess:
            assert s["session_start_us"] <= s["session_end_us"]
        for a, b in zip(sess, sess[1:]):
            assert b["session_start_us"] - a["session_end_us"] > gap * 1_000_000
    assert set(by_key) == set(counts)


@given(rows=rows_strategy)
@SET
def test_asof_join_row_preservation_and_bound(spark, rows):
    """As-of join never drops/duplicates left rows, and every matched ts is
    <= the left ts (backward semantics)."""
    from kiara_spark.operators.joins import asof_join

    left = spark.createDataFrame(rows, "k long, t long, v double") \
        .withColumn("ts", F.timestamp_seconds("t")).drop("t")
    right = left.select("k", "ts", (F.col("v") * 2).alias("w"))
    out = asof_join(left, right, by="k", left_ts="ts", value_cols=["w"]).collect()
    assert len(out) == len(rows)
    for r in out:
        if r["ts_matched"] is not None:
            assert r["ts_matched"] <= r["ts"]


@given(rows=rows_strategy, salt=st.integers(2, 8))
@SET
def test_salted_join_multiplicity(spark, rows, salt):
    """Salted inner join = plain inner join, row-for-row (multiplicities)."""
    from kiara_spark.operators.joins import salted_join

    left = spark.createDataFrame(rows, "k long, t long, v double")
    right = spark.createDataFrame(
        [(k, float(k) * 10) for k in {k for k, _, _ in rows} if k % 2 == 0],
        "k long, w double")
    plain = sorted(map(tuple, left.join(right, on="k").collect()))
    salted = sorted(map(tuple, salted_join(left, right, on="k",
                                           salt=salt).collect()))
    assert plain == salted


@given(texts=st.lists(st.text(min_size=0, max_size=40), min_size=1, max_size=20))
@SET
def test_minhash_signature_stability_and_shape(spark, texts):
    """Signatures: deterministic across partitionings; docs with identical
    text get identical signatures."""
    from kiara_spark.operators.dedup import minhash_signatures_df

    rows = [(i, t) for i, t in enumerate(texts)] + \
           [(1000 + i, t) for i, t in enumerate(texts)]  # duplicate corpus
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = minhash_signatures_df(df).collect()
    by_id = {r["_id"]: tuple(r)[1:] for r in sig}
    for i, t in enumerate(texts):
        if len(t.lower()) >= 5 and i in by_id:  # docs w/ shingles only
            assert by_id[i] == by_id[1000 + i]


@given(rows=st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.sampled_from(["x", "y"]),
              st.floats(min_value=-100, max_value=100, allow_nan=False)),
    min_size=1, max_size=25))
@SET
def test_pivot_unpivot_roundtrip_property(spark, rows):
    """unpivot(pivot(df)) recovers every (group, pivot-value) cell that
    exists in the input; absent combinations surface as NULL cells."""
    from kiara_spark.operators.tables import pivot_table, unpivot_table

    df = spark.createDataFrame(rows, "g string, p string, v double")
    wide = pivot_table(df, ["g"], "p", ["x", "y"],
                       [{"fn": "count", "column": "*", "alias": "n"}])
    long = unpivot_table(wide, ["g"], ["x", "y"], "p", "n")
    got = {(r["g"], r["p"]): r["n"] for r in long.collect()}
    from collections import Counter
    expect = Counter((g, p) for g, p, _ in rows)
    for (g, p), n in expect.items():
        assert got[(g, p)] == n
    # cells for absent combinations are NULL, and nothing else appears
    assert all(v is None for k, v in got.items() if k not in expect)
    assert set(got) == {(g, p) for g, _, _ in rows for p in ("x", "y")}


@given(rows=rows_strategy, src_frac=st.integers(1, 4))
@SET
def test_merge_upsert_key_partition_property(spark, rows, src_frac):
    """MERGE invariants for any split: output keys = target keys ∪ source
    keys; every source key's payload comes from the source; target-only
    keys pass through untouched."""
    from kiara_spark.operators.quality import merge_upsert

    df = spark.createDataFrame(
        [(k, t, v) for k, t, v in rows], "k int, t int, v double"
    ).dropDuplicates(["k"])
    target = df.filter(F.col("t") % 2 == 0)
    source = df.filter(F.col("t") % src_frac == 0).withColumn("v", F.col("v") + 1.0)
    out = merge_upsert(target, source, ["k"]).collect()
    t_keys = {r["k"] for r in target.collect()}
    s_rows = {r["k"]: r["v"] for r in source.collect()}
    t_rows = {r["k"]: r["v"] for r in target.collect()}
    assert {r["k"] for r in out} == t_keys | set(s_rows)
    for r in out:
        expected = s_rows.get(r["k"], t_rows.get(r["k"]))
        assert r["v"] == expected


@given(rows=rows_strategy)
@SET
def test_scd2_intervals_tile_the_timeline(spark, rows):
    """SCD2 output per key: intervals are chronological, non-overlapping,
    contiguous (each valid_to = next valid_from), exactly one open current
    interval, and consecutive intervals never repeat a value."""
    from kiara_spark.operators.quality import scd2_intervals

    df = spark.createDataFrame(
        [(k, t, i, str(int(v) % 3)) for i, (k, t, v) in enumerate(rows)],
        "k int, sec long, eid int, val string",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "eid", "val")
    out = scd2_intervals(df, key_col="k", ts_col="ts", value_col="val",
                         tiebreak_col="eid").collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for k, ivs in by_key.items():
        ivs.sort(key=lambda r: r["valid_from"])
        assert sum(1 for r in ivs if r["is_current"] == 1) == 1
        assert ivs[-1]["valid_to"] is None and ivs[-1]["is_current"] == 1
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["attr_value"] != b["attr_value"]


text_strategy = st.lists(
    st.text(alphabet="abc def@x.com 0123.-\n", min_size=0, max_size=80),
    min_size=1, max_size=12,
)


@given(texts=text_strategy)
@SET
def test_redact_pii_idempotent(spark, texts):
    """Redaction is a fixpoint: a second pass over already-redacted text
    changes nothing (masks contain no maskable shapes)."""
    from kiara_spark.operators.curation import redact_pii

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    once = redact_pii(df).select(
        "doc_id", F.col("redacted_text").alias("text"))
    twice = redact_pii(once).select("doc_id", "redacted_text")
    joined = once.join(twice, "doc_id")
    assert joined.filter(F.col("text") != F.col("redacted_text")).count() == 0


@given(texts=st.lists(st.text(alphabet="abcd efgh ", min_size=0, max_size=60),
                      min_size=1, max_size=10))
@SET
def test_decontaminate_self_is_total(spark, texts):
    """Decontaminating a corpus against ITSELF flags exactly the docs that
    have at least one n-gram (>= n tokens)."""
    from kiara_spark.operators.curation import decontaminate, word_ngram_hashes

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
    out = {r["doc_id"]: r["contaminated"]
           for r in decontaminate(df, df, n=3).collect()}
    has_gram = {r["doc_id"]: r["ng"] > 0 for r in df.select(
        "doc_id", F.size(word_ngram_hashes(F.col("text"), 3)).alias("ng")).collect()}
    assert out == {i: int(has_gram[i]) for i in out}


@given(rows=st.lists(
    st.tuples(st.integers(0, 1000), st.integers(0, 1000)),
    min_size=2, max_size=40))
@SET
def test_zorder_key_monotone_on_axes(spark, rows):
    """Morton key property: if a dominates b on BOTH binned axes, a's key
    is >= b's (interleaving never inverts simultaneous dominance)."""
    from kiara_spark.operators.tables import zorder_key

    data = [(i, float(x), float(y)) for i, (x, y) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, x double, y double")
    keyed = zorder_key(df, ["x", "y"], bits=8).collect()
    pts = [(r["x"], r["y"], r["z_key"]) for r in keyed]
    for ax, ay, az in pts:
        for bx, by, bz in pts:
            if ax >= bx and ay >= by:
                assert az >= bz, ((ax, ay, az), (bx, by, bz))


@given(
    base=st.lists(st.tuples(st.sampled_from("abc"), st.integers(1, 50),
                            st.integers(-1000, 1000)),
                  min_size=0, max_size=10),
    ops=st.lists(st.tuples(st.sampled_from("IUD"), st.sampled_from("abcd"),
                           st.integers(-1000, 1000), st.integers(-1000, 1000)),
                 min_size=0, max_size=15))
@SET
def test_incremental_agg_equals_replay(spark, base, ops):
    """Folding a change feed into a stored aggregate == recomputing the
    aggregate over the replayed row set, for any feed whose D/U old values
    are consistent with the current state (constructed here by replay)."""
    from collections import defaultdict

    from kiara_spark.operators.quality import incremental_agg_maintain

    # replay driver-side to build a CONSISTENT feed: deletes remove a live
    # row's value, updates rewrite one; inconsistent ops are skipped
    live = defaultdict(list)
    for k, _n, v in base:
        live[k].append(v)
    feed = []
    for op, k, v1, v2 in ops:
        if op == "I":
            live[k].append(v2)
            feed.append((k, "I", None, float(v2)))
        elif op == "D" and live[k]:
            old = live[k].pop()
            feed.append((k, "D", float(old), None))
        elif op == "U" and live[k]:
            old = live[k][-1]
            live[k][-1] = v2
            feed.append((k, "U", float(old), float(v2)))
    agg = defaultdict(lambda: [0, 0.0])
    for k, _n, v in base:
        agg[k][0] += 1
        agg[k][1] += v
    base_df = spark.createDataFrame(
        [(k, c, float(s)) for k, (c, s) in agg.items()] or [("_", 0, 0.0)],
        "k string, cnt long, total double")
    if not agg:
        base_df = base_df.filter("cnt > 0")
    feed_df = spark.createDataFrame(
        feed or [("_", "X", None, None)],
        "k string, op string, old_val double, new_val double")
    if not feed:
        feed_df = feed_df.filter("op = 'nope'")
    got = {r["k"]: (r["cnt"], float(r["total"]))
           for r in incremental_agg_maintain(base_df, feed_df, ["k"]).collect()}
    want = {k: (len(vs), float(sum(vs))) for k, vs in live.items() if vs}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6, (k, got[k], want[k])


@given(rows=st.lists(
    st.tuples(st.integers(0, 3),          # key
              st.integers(0, 30),         # left ts
              ),
    min_size=1, max_size=25),
    rrows=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 30), st.integers(0, 99)),
    min_size=1, max_size=25))
@SET
def test_asof_strict_matches_bruteforce(spark, rows, rrows):
    """strict backward as-of == per-row argmax over right rows with
    ts strictly less, latest (ts, tiebreak) wins."""
    from kiara_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(rows)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(k, t, e, f"v{e}") for (k, t, e) in rrows],
        "k long, ts long, eid long, v string")
    got = {r["lid"]: r["v_matched"] for r in asof_join(
        left, right, by="k", left_ts="ts", value_cols=["v"],
        strict=True, tiebreak="eid").collect()}
    rl = [(k, t, e, f"v{e}") for (k, t, e) in rrows]
    for i, (k, t) in enumerate(rows):
        cand = [(rt, e, v) for (rk, rt, e, v) in rl if rk == k and rt < t]
        want = max(cand)[2] if cand else None
        assert got[i] == want, (i, k, t, got[i], want)


@given(vals=st.lists(st.floats(min_value=-1e6, max_value=1e6,
                               allow_nan=False, allow_infinity=False,
                               width=32),
                     min_size=1, max_size=120),
       kfrac=st.floats(min_value=0.0, max_value=1.0))
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_kth_smallest_selection_property(spark, vals, kfrac):
    """Histogram-refinement selection == position k of the sorted multiset
    for ANY distribution (duplicates, negatives, single value)."""
    from kiara_spark.operators.quality import kth_smallest_scalable

    vals = [float(v) for v in vals]
    k = max(1, min(len(vals), int(kfrac * len(vals)) + 1))
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = kth_smallest_scalable(df, "x", k, n_bins=8, final_limit=4)
    assert got == sorted(vals)[k - 1]


@given(keys=st.lists(st.integers(min_value=-10**9, max_value=10**9),
                     min_size=1, max_size=150, unique=True))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_row_ids_bijection_property(spark, keys):
    """Contiguous row ids are exactly the sort permutation: a bijection
    onto 0..n-1 that preserves key order, for any key distribution."""
    from kiara_spark.operators.tables import add_contiguous_row_ids

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = {r.k: r.row_id
           for r in add_contiguous_row_ids(df, "k", n_buckets=4).collect()}
    assert sorted(out.values()) == list(range(len(keys)))
    ordered = [k for k, _ in sorted(out.items(), key=lambda kv: kv[1])]
    assert ordered == sorted(keys)


_doc_strategy = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=18)
    .map(lambda ws: " ".join(ws)),
    min_size=1, max_size=25,
)


@given(texts=_doc_strategy)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_duplicate_spans_partition_invariant_and_clip_conserves(spark, texts):
    """Span detection is a pure function of the corpus (any partitioning),
    spans never overlap after merging, and clipping conserves tokens:
    kept + removed == total for every doc."""
    from kiara_spark.operators.dedup import (clip_duplicate_spans,
                                             duplicate_ngram_spans)

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, duplicate_ngram_spans(
        df.coalesce(1), n=3).collect()))
    b = sorted(map(tuple, duplicate_ngram_spans(
        df.repartition(5, "doc_id"), n=3).collect()))
    assert a == b
    by_doc: dict = {}
    for doc_id, s, e, _ in a:
        assert s < e
        for ps, pe in by_doc.get(doc_id, []):
            assert e <= ps or s >= pe  # merged spans never overlap
        by_doc.setdefault(doc_id, []).append((s, e))
    clipped = {r.doc_id: r for r in clip_duplicate_spans(df, n=3).collect()}
    for i, t in rows:
        kept = len([w for w in clipped[i].clipped_text.split() if w])
        assert kept + clipped[i].n_tokens_removed == clipped[i].n_tokens
        assert clipped[i].n_tokens == len(t.split())


@given(seed=st.integers(0, 10**6))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pq_codes_partition_invariant(spark, seed):
    """PQ code assignment is map-only and deterministic: any repartitioning
    yields identical codes and errors, and every doc's reconstruction error
    is the sum of per-subspace minima (>= 0, == 0 iff codeword hit)."""
    import hashlib

    from kiara_spark.operators.similarity import pq_encode, pq_seed_codebook

    def val(i, d):
        h = int(hashlib.md5(f"{seed}_{i}_{d}".encode()).hexdigest()[:8], 16)
        return (h % 2001 - 1000) / 1000.0

    rows = [(i, [val(i, d) for d in range(8)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = pq_seed_codebook(df, m=2, k=4)
    a = sorted(map(tuple, pq_encode(df.coalesce(1), cb).collect()))
    b = sorted(map(tuple, pq_encode(df.repartition(6), cb).collect()))
    assert a == b
    for _, codes, err in a:
        assert err >= 0 and len(codes) == 2


did_units = st.lists(
    st.tuples(st.sampled_from(["t", "c"]),
              st.sampled_from(["pre", "post"]),
              st.floats(-1e4, 1e4, allow_nan=False)),
    min_size=8, max_size=40,
)


@given(rows=did_units, shift=st.floats(-100, 100, allow_nan=False))
@SET
def test_did_cancels_common_period_shifts(spark, rows, shift):
    """The defining DiD property: a secular shift applied to EVERY unit's
    post-period outcome (both groups alike) must leave the estimate
    unchanged — that is exactly the trend the control group nets out.
    Compared at the op's own 6dp output rounding (the shift perturbs the
    2dp unit quantization by at most an ulp-scale residual)."""
    from kiara_spark.operators.quality import diff_in_diff

    shift = round(shift, 2)  # survive the op's 2dp unit quantization
    base = spark.createDataFrame(rows, "g string, p string, y double")
    shifted = spark.createDataFrame(
        [(g, p, y + shift if p == "post" else y) for g, p, y in rows],
        "g string, p string, y double")
    a = diff_in_diff(base, "g", "p", "y", "t", "c", "pre", "post").collect()[0]
    b = diff_in_diff(shifted, "g", "p", "y",
                     "t", "c", "pre", "post").collect()[0]
    if a.did is None:
        assert b.did is None
    else:
        assert b.did == pytest.approx(a.did, abs=2e-6)
        # variances are shift-invariant too, so the z must match
        if a.z is not None:
            assert b.z == pytest.approx(a.z, abs=2e-4)


@given(rows=did_units)
@SET
def test_did_partition_invariance_property(spark, rows):
    from kiara_spark.operators.quality import diff_in_diff

    df = spark.createDataFrame(rows, "g string, p string, y double")
    a = diff_in_diff(df.coalesce(1), "g", "p", "y",
                     "t", "c", "pre", "post").collect()
    b = diff_in_diff(df.repartition(5), "g", "p", "y",
                     "t", "c", "pre", "post").collect()
    assert a == b


# ---------------------------------------------------------------------------
# r12 experimentation ops: mSPRT / ratio-metric delta invariances
# ---------------------------------------------------------------------------

msprt_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]),
              st.integers(1, 5),
              st.floats(-1e3, 1e3, allow_nan=False)),
    min_size=10, max_size=60,
)


@given(rows=msprt_rows, shift=st.floats(-50, 50, allow_nan=False))
@SET
def test_msprt_location_shift_invariance(spark, rows, shift):
    """Shifting EVERY observation (both arms alike) by a constant leaves
    theta (a difference of means), the pooled variance, and therefore the
    whole log-lambda / p sequence unchanged — the mSPRT statistic is
    location-free.  Compared at the op's own output rounding (the shift
    perturbs the 2dp quantization by at most an ulp-scale residual)."""
    from kiara_spark.operators.quality import msprt_always_valid

    shift = round(shift, 2)  # survive the op's 2dp value quantization
    base = spark.createDataFrame(rows, "g string, t int, y double")
    shifted = spark.createDataFrame(
        [(g, t, y + shift) for g, t, y in rows],
        "g string, t int, y double")
    a = sorted(msprt_always_valid(base, "g", "t", "y", "a", "b",
                                  tau=2.0).collect(),
               key=lambda r: r.bucket)
    b = sorted(msprt_always_valid(shifted, "g", "t", "y", "a", "b",
                                  tau=2.0).collect(),
               key=lambda r: r.bucket)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra.n_a == rb.n_a and ra.n_b == rb.n_b
        if ra.theta is None:
            assert rb.theta is None
            continue
        assert rb.theta == pytest.approx(ra.theta, abs=2e-4)
        if ra.log_lambda is not None and abs(ra.log_lambda) < 1e5:
            assert rb.log_lambda == pytest.approx(ra.log_lambda,
                                                  abs=2e-2, rel=1e-3)


@given(rows=msprt_rows)
@SET
def test_msprt_partition_invariance(spark, rows):
    """Exact-decimal sufficient statistics make the whole sequence a pure
    function of the data — any partitioning yields identical rows."""
    from kiara_spark.operators.quality import msprt_always_valid

    df = spark.createDataFrame(rows, "g string, t int, y double")
    a = sorted(msprt_always_valid(df.coalesce(1), "g", "t", "y",
                                  "a", "b", tau=1.5).collect())
    b = sorted(msprt_always_valid(df.repartition(7), "g", "t", "y",
                                  "a", "b", tau=1.5).collect())
    assert a == b


ratio_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b"]),
              st.floats(-1e3, 1e3, allow_nan=False),
              st.floats(0.5, 1e3, allow_nan=False)),
    min_size=6, max_size=40,
)


@given(rows=ratio_rows, k=st.floats(0.5, 4.0, allow_nan=False))
@SET
def test_ratio_metric_denominator_scale_equivariance(spark, rows, k):
    """Scaling every unit's denominator by k divides both ratios by k and
    the SE by k (delta variance scales by 1/k²), leaving z and p EXACTLY
    invariant — the scale-free property that makes ratio metrics
    comparable across traffic volumes.  Tolerances sit above the op's 2dp
    quantization of the scaled denominators."""
    from kiara_spark.operators.quality import ratio_metric_delta

    base = spark.createDataFrame(rows, "g string, x double, y double")
    scaled = spark.createDataFrame(
        [(g, x, y * k) for g, x, y in rows],
        "g string, x double, y double")
    a = ratio_metric_delta(base, "g", "x", "y", "a", "b").collect()[0]
    b = ratio_metric_delta(scaled, "g", "x", "y", "a", "b").collect()[0]
    if a.ratio_a is None or b.ratio_a is None:
        return  # a 2dp-quantized denominator mean can hit exact zero
    assert b.ratio_a == pytest.approx(a.ratio_a / k, rel=5e-2, abs=1e-3)
    if a.z is not None and b.z is not None and abs(a.z) < 1e3:
        assert b.z == pytest.approx(a.z, rel=5e-2, abs=1e-2)


@given(rows=ratio_rows)
@SET
def test_ratio_metric_partition_invariance(spark, rows):
    from kiara_spark.operators.quality import ratio_metric_delta

    df = spark.createDataFrame(rows, "g string, x double, y double")
    a = ratio_metric_delta(df.coalesce(1), "g", "x", "y",
                           "a", "b").collect()
    b = ratio_metric_delta(df.repartition(5), "g", "x", "y",
                           "a", "b").collect()
    assert a == b
