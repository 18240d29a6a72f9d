"""Round-7 operator unit tests: distributed ML fits, drift, CEP,
centrality, tokenizer encode, clustering QA, LM smoothing, video curation,
ANN eval — each against a hand-computable fixture."""

import math

import pytest
from pyspark.sql import functions as F


def test_linear_regression_recovers_exact_plane(spark):
    """y = 2 + 3·x1 − 0.5·x2 exactly -> coefficients recovered, R² = 1."""
    from kiara_spark.operators.quality import linear_regression_normal

    rows = [(float(i % 7), float((i * 3) % 5),
             2.0 + 3.0 * (i % 7) - 0.5 * ((i * 3) % 5))
            for i in range(60)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, y double")
    r = linear_regression_normal(df, "y", ["x1", "x2"]).collect()[0]
    assert r.n == 60
    assert r.intercept == pytest.approx(2.0, abs=1e-5)
    assert r.coef_x1 == pytest.approx(3.0, abs=1e-5)
    assert r.coef_x2 == pytest.approx(-0.5, abs=1e-5)
    assert r.r2 == pytest.approx(1.0, abs=1e-6)


def test_linear_regression_requires_two_features(spark):
    from kiara_spark.operators.quality import linear_regression_normal

    df = spark.createDataFrame([(1.0, 2.0)], "x double, y double")
    with pytest.raises(ValueError):
        linear_regression_normal(df, "y", ["x"])


def test_logistic_gd_learns_separable_sign(spark):
    """Positively separable feature -> positive weight, loss below ln 2
    (the all-zero-weights loss)."""
    from kiara_spark.operators.quality import logistic_regression_gd

    rows = [(1.0, 1.0, 0.0) for _ in range(30)] + \
           [(0.0, -1.0, 0.0) for _ in range(30)]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    r = logistic_regression_gd(df, "y", ["x1", "x2"],
                               iterations=3, lr=1.0).collect()[0]
    assert r.n == 60
    assert r.w_x1 > 0.5
    assert abs(r.w_x2) < 1e-9  # constant feature gets no gradient
    assert r.log_loss < math.log(2.0)


def test_ks_statistic_identical_and_disjoint(spark):
    from kiara_spark.operators.quality import ks_statistic

    a = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    b = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    same = ks_statistic(a, b, "v").collect()[0]
    assert same.ks == 0.0 and same.p_value == pytest.approx(1.0, abs=1e-6)
    lo = spark.createDataFrame([(float(i),) for i in range(50)], "v double")
    hi = spark.createDataFrame([(float(i + 1000),) for i in range(50)],
                               "v double")
    far = ks_statistic(lo, hi, "v").collect()[0]
    assert far.ks == 1.0 and far.ks_at == 49.0  # sup at the ref max
    assert far.p_value < 1e-6


def test_sequence_pattern_counts_and_coverage(spark):
    from kiara_spark.operators.events import sequence_pattern

    rows = [
        # user 1: signup click view purchase  -> one match 'scvp'
        (1, 1, "signup"), (1, 2, "click"), (1, 3, "view"), (1, 4, "purchase"),
        # user 2: signup error purchase -> NO match (error breaks [cv]*)
        (2, 1, "signup"), (2, 2, "error"), (2, 3, "purchase"),
        # user 3: two disjoint matches 'sp' 'scp'
        (3, 1, "signup"), (3, 2, "purchase"),
        (3, 3, "signup"), (3, 4, "click"), (3, 5, "purchase"),
    ]
    df = spark.createDataFrame(
        [(u, float(t), ty) for u, t, ty in rows],
        "user_id long, tsf double, event_type string").select(
        "user_id", F.timestamp_seconds("tsf").alias("ts"), "event_type",
        F.monotonically_increasing_id().alias("event_id"))
    out = {r.user_id: r for r in
           sequence_pattern(df, "s[cv]*p").collect()}
    assert out[1].n_matches == 1 and out[1].first_match == "scvp"
    assert out[2].n_matches == 0 and out[2].first_match is None
    assert out[3].n_matches == 2 and out[3].first_match == "sp"
    assert out[2].seq_len == 3  # zero-match keys kept for coverage audit
    # r8 regression (ADVICE): quote-bearing and backslash-class patterns
    # must reach the regex engine verbatim — the literal-column call path
    # (not f-string splicing into F.expr) makes both safe.
    quoted = {r.user_id: r for r in
              sequence_pattern(df, "s'|s[cv]*p").collect()}
    assert quoted[1].n_matches == 1  # no SQL-parse blowup, same match
    bs = {r.user_id: r for r in
          sequence_pattern(df, r"s\w*?p").collect()}
    assert bs[1].first_match == "scvp" and bs[3].n_matches == 2


def test_landmark_centrality_on_path_graph(spark):
    """Path 1-2-3-4-5, landmark {1}: closeness/harmonic hand-check."""
    from kiara_spark.operators.graph import landmark_centrality

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long")
    lms = spark.createDataFrame([(1,)], "id long")
    got = {r.id: r for r in
           landmark_centrality(edges, lms, max_hops=4).collect()}
    assert set(got) == {2, 3, 4, 5}  # landmark itself excluded (d=0 only)
    assert got[2].sum_dist == 1 and got[2].closeness == 1.0
    assert got[5].sum_dist == 4 and got[5].closeness == 0.25
    assert got[3].harmonic == pytest.approx(0.5, abs=1e-9)


def test_topk_recall_hand_case(spark):
    from kiara_spark.operators.similarity import topk_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)],
        "query_id long, neighbor_id long")
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (1, 12), (2, 33), (2, 44)],
        "query_id long, neighbor_id long")
    got = {r.query_id: r for r in topk_recall(exact, approx).collect()}
    assert got[1].n_hit == 2 and got[1].recall == pytest.approx(2 / 3, abs=1e-6)
    assert got[2].n_hit == 0 and got[2].recall == 0.0


def test_knn_classify_separable_clusters(spark):
    from kiara_spark.operators.similarity import knn_classify

    def vec(base, eps):
        v = [0.0] * 8
        v[base] = 1.0
        v[(base + 1) % 8] = eps
        return v

    rows = ([(i, vec(0, 0.01 * i), 0) for i in range(1, 7)]
            + [(10 + i, vec(4, 0.01 * i), 1) for i in range(1, 7)])
    emb = spark.createDataFrame(rows,
                                "vec_id long, embedding array<float>, label int")
    out = knn_classify(emb, emb, k=3).collect()
    assert len(out) == 12
    assert all(r.correct for r in out)
    assert all(r.n_votes == 3 for r in out)


def test_regression_stump_finds_step(spark):
    """y jumps from 0 to 10 at x > 5 -> split at 5, means exact."""
    from kiara_spark.operators.quality import regression_stump

    rows = [(float(x), 0.0 if x <= 5 else 10.0)
            for x in range(1, 11) for _ in range(3)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = regression_stump(df, "x", "y").collect()[0]
    assert r.split_value == 5.0
    assert r.n_left == 15 and r.n_right == 15
    assert r.mean_left == 0.0 and r.mean_right == 10.0
    assert r.gain > 0


def test_average_precision_perfect_and_random(spark):
    from kiara_spark.operators.quality import average_precision

    perfect = spark.createDataFrame(
        [(float(10 + i), 1) for i in range(5)]
        + [(float(i), 0) for i in range(5)], "s double, y int")
    r = average_precision(perfect, "s", "y").collect()[0]
    assert r.average_precision == 1.0 and r.n_pos == 5
    const = spark.createDataFrame(
        [(1.0, 1), (1.0, 0), (1.0, 1), (1.0, 0)], "s double, y int")
    r2 = average_precision(const, "s", "y").collect()[0]
    assert r2.average_precision == 0.5  # one tie-block: precision = base rate


def test_t_closeness_uniform_is_zero(spark):
    from kiara_spark.operators.quality import t_closeness_report

    rows = [(g, s) for g in ("a", "b") for s in ("x", "y") for _ in range(5)]
    df = spark.createDataFrame(rows, "g string, s string")
    out = t_closeness_report(df, ["g"], "s", t=0.1).collect()
    assert all(r.tvd == 0.0 and not r.violates_t for r in out)
    skewed = spark.createDataFrame(
        [("a", "x")] * 9 + [("a", "y")] + [("b", "x")] + [("b", "y")] * 9,
        "g string, s string")
    out2 = {r.g: r for r in
            t_closeness_report(skewed, ["g"], "s", t=0.1).collect()}
    assert out2["a"].tvd == 0.4 and out2["a"].violates_t


def test_holt_forecast_matches_python_recursion(spark):
    from kiara_spark.operators.events import holt_linear_forecast

    from decimal import ROUND_HALF_UP, Decimal

    def rnd(x, n):
        # Spark ROUND = HALF_UP over BigDecimal.valueOf(double), which is
        # the shortest decimal repr — Python round() is half-even
        return float(Decimal(repr(x)).quantize(
            Decimal(1).scaleb(-n), ROUND_HALF_UP))

    xs = [10.0, 12.0, 15.0, 13.0, 18.0]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "d long, value double").select(
        F.timestamp_seconds(F.col("d") * 86400).alias("ts"), "value")
    l, b = xs[0], 0.0
    for x in xs[1:]:
        ln = rnd(0.5 * x + 0.5 * (l + b), 9)
        b = rnd(0.3 * (ln - l) + 0.7 * b, 9)
        l = ln
    r = holt_linear_forecast(df, alpha=0.5, beta=0.3, horizon=7).collect()[0]
    assert r.n_days == 5
    assert r.level == rnd(l, 6) and r.trend == rnd(b, 6)
    assert r.forecast_1 == rnd(l + b, 6)
    assert r.forecast_h == rnd(l + 7.0 * b, 6)


def test_naive_bayes_separable_vocab(spark):
    from kiara_spark.operators.text import naive_bayes_classify

    rows = ([(i, "aaa bbb aaa", "en") for i in range(5)]
            + [(10 + i, "zzz yyy zzz", "de") for i in range(5)])
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = naive_bayes_classify(df).collect()
    assert len(out) == 10
    assert all(r.correct for r in out)


def test_scene_cuts_hand_case(spark):
    from kiara_spark.operators.misc import scene_cuts_stub

    # feature(id=0) = (idx*104729 + len) % 997 — hand-pick lens so frame 1
    # jumps past the threshold and frame 2 does not
    frames = spark.createDataFrame(
        [(0, 0, 0, 10), (0, 1, 10, 10), (0, 2, 20, 10)],
        "id long, frame_idx int, frame_offset long, frame_len long")
    f = [(i * 104729 + 10) % 997 for i in range(3)]
    expect_cuts = sum(1 for a, b in zip(f, f[1:]) if abs(b - a) > 500)
    r = scene_cuts_stub(frames, threshold=500).collect()[0]
    assert r.n_frames == 3 and r.n_cuts == expect_cuts


def test_kmeans_silhouette_separated_clusters(spark):
    from kiara_spark.operators.similarity import kmeans_silhouette

    def vec(axis, i):
        v = [0.0] * 4
        v[axis] = 10.0 + 0.1 * i
        return v

    rows = [(i, vec(i % 2, i)) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_silhouette(emb, k=2, n_iter=2).collect()
    assert sum(r.n for r in out) == 12
    assert all(r.mean_sil > 0.5 for r in out)  # well-separated axes
    assert all(r.min_sil <= r.mean_sil <= r.max_sil for r in out)


def test_kneser_ney_prefers_seen_bigrams(spark):
    from kiara_spark.operators.text import kneser_ney_bigram_logprob

    docs = {1: "the cat sat", 2: "the cat ran", 3: "dog the cat"}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    out = {r.doc_id: r for r in kneser_ney_bigram_logprob(df).collect()}
    assert set(out) == {1, 2, 3}
    assert all(r.n_bigrams == 2 for r in out.values())

    # independent pure-Python KN reference over the same corpus
    bigrams = [(w1, w2) for t in docs.values()
               for w1, w2 in zip(t.split(), t.split()[1:])]
    c2 = {}
    for bg in bigrams:
        c2[bg] = c2.get(bg, 0) + 1
    c1 = {}
    n1p = {}
    cont = {}
    for (w1, w2), c in c2.items():
        c1[w1] = c1.get(w1, 0) + c
        n1p[w1] = n1p.get(w1, 0) + 1
        cont[w2] = cont.get(w2, 0) + 1
    tt = len(c2)

    def p_kn(w1, w2):
        return (max(c2[(w1, w2)] - 0.75, 0.0) / c1[w1]
                + 0.75 * n1p[w1] / c1[w1] * (cont[w2] / tt))

    for did, text in docs.items():
        ws = text.split()
        terms = [round(-math.log(p_kn(a, b)), 9)
                 for a, b in zip(ws, ws[1:])]
        want = round(sum(terms) / len(terms), 6)
        assert out[did].avg_neg_logprob_kn == pytest.approx(want, abs=2e-6)


def test_round7_operations_registered(ctx):
    reg = ctx.operation_registry
    for op in ["table.drift.ks", "table.ml.linear_regression",
               "table.ml.logistic_regression", "table.ml.regression_stump",
               "table.ml.average_precision", "table.privacy.t_closeness",
               "events.sequence_pattern", "events.holt_forecast",
               "network_graph.landmark_centrality", "embedding.topk_recall",
               "embedding.kmeans_silhouette", "embedding.knn_classify",
               "text.bpe_encode", "text.kneser_ney_bigram",
               "text.naive_bayes_classify", "media.scene_cuts"]:
        assert reg.resolve(op) is not None, op


def test_jaro_winkler_kernel_matches_duckdb():
    """Kernel parity on the textbook pairs + edge cases — same values
    DuckDB's jaro_winkler_similarity returns."""
    import duckdb

    from kiara_spark.operators.dedup import _jaro_winkler_py

    con = duckdb.connect()
    cases = [("martha", "marhta"), ("dwayne", "duane"), ("abc", "abc"),
             ("abc", ""), ("", ""), ("aaaaaaaaaa", "aaaaaaaaab"),
             ("prefix common tail x", "prefix common tail y"),
             ("a", "b"), ("ab", "ba"), ("jellyfish", "smellyfish")]
    for a, b in cases:
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
        assert _jaro_winkler_py(a, b) == pytest.approx(want, abs=1e-12), (a, b)


def test_jaro_winkler_pairs_blocked(spark):
    """Blocking + threshold semantics: only same-block pairs surface,
    ordered id_a < id_b, jw rounded to 6dp; the length band never drops a
    qualifying pair (2x length ratio is the admissibility boundary)."""
    from kiara_spark.operators.dedup import (_jaro_winkler_py,
                                             jaro_winkler_pairs)

    rows = [
        (1, "martha stewart", "m"),
        (2, "marhta stewart", "m"),
        (3, "martha stewartstewartstewart xx", "m"),  # >2x longer than #1
        (4, "martha stewart", "other-block"),
        (5, "zzzz yyyy", "m"),
    ]
    df = spark.createDataFrame(rows, "id bigint, txt string, blk string")
    got = {(r.id_a, r.id_b): r.jw
           for r in jaro_winkler_pairs(df, "id", "txt", "blk", 0.9).collect()}
    assert (1, 2) in got
    assert got[(1, 2)] == pytest.approx(
        round(_jaro_winkler_py("martha stewart", "marhta stewart"), 6))
    # cross-block identical text must NOT pair
    assert not any(4 in p for p in got)
    # dissimilar same-block text filtered by threshold
    assert not any(5 in p for p in got)
    # every surviving pair is ordered and above threshold
    assert all(a < b for a, b in got)
    assert all(v >= 0.9 for v in got.values())


def test_jaro_winkler_band_admissibility(spark):
    """Pairs within the 2x length-ratio bound survive the log2 banding even
    when they straddle a bucket boundary (len 15 vs 17 -> buckets 4 vs 5)."""
    from kiara_spark.operators.dedup import jaro_winkler_pairs

    a = "abcdefghijklmno"          # len 15 (bucket 4)
    b = "abcdefghijklmnopq"        # len 17 (bucket 5)
    df = spark.createDataFrame([(1, a, "x"), (2, b, "x")],
                               "id bigint, txt string, blk string")
    got = jaro_winkler_pairs(df, "id", "txt", "blk", 0.9).collect()
    assert len(got) == 1 and got[0].jw > 0.9


def test_recursive_cte_subtree_rollup(spark):
    """WITH RECURSIVE decimal-trie rollup on a hand data set: node 1 has
    descendants {10..12, 100} (depths 1 and 2)."""
    from kiara_spark.operators.tables import sql_query

    keys = [1, 10, 11, 12, 100]
    df = spark.createDataFrame([(k, 1.0) for k in keys],
                               "p_partkey bigint, p_retailprice double")
    sql = """
    WITH RECURSIVE anc(pk, node, depth) AS (
      SELECT p_partkey, p_partkey DIV 10, 1 FROM part WHERE p_partkey >= 10
      UNION ALL
      SELECT a.pk, a.node DIV 10, a.depth + 1 FROM anc a WHERE a.node >= 10
    )
    SELECT a.node, COUNT(*) AS n_desc, MAX(a.depth) AS max_depth
    FROM anc a JOIN part p ON p.p_partkey = a.pk
    GROUP BY a.node
    """
    got = {r.node: (r.n_desc, r.max_depth)
           for r in sql_query(spark, sql, tables={"part": df}).collect()}
    assert got[1] == (4, 2)    # 10,11,12 at depth 1 + 100 at depth 2
    assert got[10] == (1, 1)   # 100 only


def _day_events(spec, ty="click"):
    """[(day_offset, count)] -> rows (event_id, ts, user_id, event_type)."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    i = 0
    for d, c in spec:
        for k in range(c):
            rows.append((i, base + datetime.timedelta(days=d, minutes=k),
                         k, ty))
            i += 1
    return rows


def test_dft_periodogram_finds_planted_period(spark):
    """Daily counts 10 + 6·(t mod 4 == 0) have a strong 4-day cycle: power
    at period 4 dominates periods 3/5/6/7."""
    from kiara_spark.operators.events import dft_periodogram

    spec = [(t, 16 if t % 4 == 0 else 10) for t in range(28)]
    df = spark.createDataFrame(
        _day_events(spec), "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string")
    out = {r.period: r.power
           for r in dft_periodogram(df, "ts", 2, 7).collect()}
    assert out[4] == max(out.values())
    assert out[4] > 5 * max(v for p, v in out.items() if p not in (2, 4))


def test_cross_correlation_finds_planted_lag(spark):
    """y is x shifted 2 days -> r = 1.0 exactly at lag +2, lower elsewhere."""
    from kiara_spark.operators.events import cross_correlation

    xspec = [(t, 5 + (t * 7) % 11) for t in range(30)]
    yspec = [(t + 2, c) for t, c in xspec]
    rows = (_day_events(xspec, "click") +
            [(10_000 + i, ts, u, ty) for i, (_, ts, u, _unused)
             in enumerate(_day_events(yspec, "x"))
             for ty in ["purchase"]])
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string")
    out = {r.lag: r for r in
           cross_correlation(df, "click", "purchase", max_lag=3).collect()}
    assert out[2].r == pytest.approx(1.0, abs=1e-9)
    assert all(abs(v.r) < 0.9 for k, v in out.items()
               if k != 2 and v.r is not None)
    assert out[2].n_days == 30


def test_dp_noisy_counts_deterministic_and_salted(spark):
    from kiara_spark.operators.quality import dp_noisy_counts

    df = spark.createDataFrame(
        [(g, i) for g in "abc" for i in range(10 + ord(g) % 3)],
        "g string, i bigint")
    r1 = {r.g: r.noisy_count for r in dp_noisy_counts(df, ["g"]).collect()}
    r2 = {r.g: r.noisy_count for r in dp_noisy_counts(df, ["g"]).collect()}
    assert r1 == r2                      # derived noise is reproducible
    r3 = {r.g: r.noisy_count
          for r in dp_noisy_counts(df, ["g"], salt="other").collect()}
    assert r1 != r3                      # new salt -> new noise draw
    # Laplace(1) noise: |noise| < 20 with overwhelming probability, and the
    # noisy values should stay near the true counts (10..12 here)
    assert all(abs(v - 11) < 25 for v in r1.values())
    assert any(v != int(v) for v in r1.values())   # noise actually applied


def test_js_divergence_identical_and_disjoint(spark):
    """Two identical corpora -> jsd 0; disjoint vocabularies -> ln 2."""
    import math

    from kiara_spark.operators.text import token_distribution_divergence

    rows = [("a", "alpha beta gamma alpha"), ("b", "alpha beta gamma alpha"),
            ("c", "delta epsilon zeta delta")]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = {(r.group_a, r.group_b): r.jsd
           for r in token_distribution_divergence(df, "lang", "text",
                                                  top_k=50).collect()}
    assert out[("a", "b")] == pytest.approx(0.0, abs=1e-9)
    assert out[("a", "c")] == pytest.approx(math.log(2), abs=1e-6)
    assert out[("b", "c")] == pytest.approx(math.log(2), abs=1e-6)


def test_ktruss_k4_keeps_clique_prunes_triangle(spark):
    """K4 survives a 4-truss (every edge in 2 triangles); a lone triangle
    (support 1) and a pendant edge (support 0) are pruned."""
    from kiara_spark.operators.graph import ktruss_prune

    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    extra = [(5, 6), (6, 7), (5, 7), (7, 8)]
    df = spark.createDataFrame(k4 + extra, "src bigint, dst bigint")
    out = {(r.src, r.dst): r.support
           for r in ktruss_prune(df, k=4, rounds=2).collect()}
    assert set(out) == set(k4)
    assert all(v == 2 for v in out.values())
    out3 = {(r.src, r.dst): r.support
            for r in ktruss_prune(df, k=3, rounds=2).collect()}
    assert set(out3) == set(k4) | {(5, 6), (6, 7), (5, 7)}
    assert out3[(5, 6)] == 1
    assert (7, 8) not in out3


def test_weighted_reservoir_topk_exact_k_and_bias(spark):
    """Returns exactly k rows, reproducibly; heavy-weight rows dominate the
    selection (expected inclusion ~ proportional to weight)."""
    from kiara_spark.operators.text import weighted_reservoir_topk

    rows = [(i, 1000.0 if i < 50 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double")
    got = weighted_reservoir_topk(df, "w", k=60, id_col="doc_id").collect()
    assert len(got) == 60
    heavy = sum(1 for r in got if r.doc_id < 50)
    assert heavy >= 45          # nearly every heavy row selected
    again = weighted_reservoir_topk(df, "w", k=60, id_col="doc_id").collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in again]
    other = weighted_reservoir_topk(df, "w", k=60, id_col="doc_id",
                                    salt="ep2").collect()
    assert [r.doc_id for r in got] != [r.doc_id for r in other]
    # zero/negative weights can never be selected
    df2 = spark.createDataFrame([(1, 0.0), (2, -1.0), (3, 5.0)],
                                "doc_id bigint, w double")
    got2 = weighted_reservoir_topk(df2, "w", k=3, id_col="doc_id").collect()
    assert [r.doc_id for r in got2] == [3]


def test_zipf_fit_recovers_exact_power_law(spark):
    """Frequencies c = round(1000/r) follow ln c = ln 1000 - ln r ->
    slope ~ -1, r2 ~ 1."""
    from kiara_spark.operators.text import zipf_fit

    rows = []
    for r in range(1, 31):
        w = f"w{r:03d}"
        rows.extend((w,) for _ in range(round(1000 / r)))
    df = spark.createDataFrame([(" ".join(x[0] for x in [row]),)
                                for row in rows], "text string")
    out = zipf_fit(df, "text", top_n=30).collect()[0]
    assert out.n_tokens == 30
    assert out.slope == pytest.approx(-1.0, abs=0.02)
    assert out.r2 > 0.999


def test_bootstrap_ci_brackets_mean(spark):
    """CI brackets the true mean; point estimate is the exact mean; wider
    level -> narrower interval nesting."""
    from kiara_spark.operators.quality import bootstrap_ci_mean

    rows = [(i, float(100 + (i * 17) % 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "id bigint, v double")
    true_mean = sum(v for _, v in rows) / 500
    r = bootstrap_ci_mean(df, "v", "id", b_resamples=100).collect()[0]
    assert r.n_rows == 500 and r.b_resamples == 100
    assert r.point_mean == pytest.approx(true_mean, abs=1e-6)
    assert r.ci_lo < true_mean < r.ci_hi
    assert r.ci_hi - r.ci_lo < 10      # ~2*1.96*sd/sqrt(n) ballpark
    r80 = bootstrap_ci_mean(df, "v", "id", b_resamples=100,
                            level=0.80).collect()[0]
    assert r.ci_lo <= r80.ci_lo and r80.ci_hi <= r.ci_hi


def test_link_prediction_square_graph(spark):
    """4-cycle a-b-c-d: the two diagonals are the only candidates, each
    with 2 common neighbors of degree 2 -> adamic_adar = 2/ln 2; existing
    edges never appear."""
    import math

    from kiara_spark.operators.graph import link_prediction

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1)],
                               "src bigint, dst bigint")
    out = {(r.src, r.dst): r for r in link_prediction(df, top_k=10,
                                                      min_common=2).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    for r in out.values():
        assert r.common_neighbors == 2
        assert r.adamic_adar == pytest.approx(2 / math.log(2), abs=1e-5)
        assert r.pref_attachment == 4


def test_gmm_em_separates_bimodal(spark):
    """Two well-separated clumps (around 1.0 and 5.0) -> component means
    land near the clumps, mixing weight near 0.5, loglik improves over
    a single round."""
    from kiara_spark.operators.quality import gmm_em_1d

    rows = [(1.0 + 0.01 * (i % 10),) for i in range(200)] + \
           [(5.0 + 0.01 * (i % 10),) for i in range(200)]
    df = spark.createDataFrame(rows, "x double")
    r = gmm_em_1d(df, "x", iterations=3,
                  init=(0.5, 4.0, 1.0, 1.0, 0.5)).collect()[0]
    assert r.n == 400
    assert r.mu1 == pytest.approx(1.045, abs=0.1)
    assert r.mu2 == pytest.approx(5.045, abs=0.1)
    assert r.pi1 == pytest.approx(0.5, abs=0.05)
    assert r.sigma1 < 0.5 and r.sigma2 < 0.5
    r1 = gmm_em_1d(df, "x", iterations=1,
                   init=(0.5, 4.0, 1.0, 1.0, 0.5)).collect()[0]
    assert r.avg_loglik > r1.avg_loglik


def test_ndcg_hand_computed(spark):
    """Perfect ranking -> ndcg 1; inverted ranking -> hand-computed value;
    no relevant items -> ndcg/mrr 0."""
    import math

    from kiara_spark.operators.quality import ndcg_at_k

    rows = [
        # q1: perfect (scores align with relevance 2,1,0)
        ("q1", 9.0, 2, 1), ("q1", 5.0, 1, 2), ("q1", 1.0, 0, 3),
        # q2: inverted (most relevant last)
        ("q2", 1.0, 2, 4), ("q2", 5.0, 1, 5), ("q2", 9.0, 0, 6),
        # q3: nothing relevant
        ("q3", 9.0, 0, 7), ("q3", 5.0, 0, 8),
    ]
    df = spark.createDataFrame(rows, "q string, s double, rel int, i bigint")
    out = {r.q: r for r in ndcg_at_k(df, "q", "s", "rel", "i", k=5).collect()}
    assert out["q1"].ndcg == pytest.approx(1.0, abs=1e-9)
    assert out["q1"].mrr == pytest.approx(1.0)
    dcg2 = 1 / math.log2(3) + 3 / math.log2(4)   # rel 1 at rank 2, rel 2 at 3
    idcg = 3 / math.log2(2) + 1 / math.log2(3)
    assert out["q2"].ndcg == pytest.approx(dcg2 / idcg, abs=1e-5)
    assert out["q2"].mrr == pytest.approx(0.5)   # first relevant at rank 2
    assert out["q3"].ndcg == 0.0 and out["q3"].mrr == 0.0


def test_collocations_llr_detects_fixed_phrase(spark):
    """A bigram that always co-occurs ('new york') scores far above a
    frequent-but-independent pair."""
    from kiara_spark.operators.text import collocations_llr

    fill = ["alpha", "beta", "gamma", "delta"]
    docs = []
    for i in range(40):
        docs.append(f"{fill[i % 4]} new york {fill[(i + 1) % 4]} "
                    f"{fill[(i + 2) % 4]} {fill[(i + 3) % 4]}")
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    out = collocations_llr(df, "text", top_k=10, min_count=3).collect()
    assert (out[0].w1, out[0].w2) == ("new", "york")
    g2 = {(r.w1, r.w2): r.g2 for r in out}
    indep = [v for kk, v in g2.items() if kk != ("new", "york")]
    assert not indep or g2[("new", "york")] > 3 * max(indep)


def test_skyline_hand_cases(spark):
    """Frontier with ties and duplicates: duplicates of a frontier point
    both survive; a point tied on one axis but worse on the other is
    dominated."""
    from kiara_spark.operators.tables import skyline_2d

    rows = [
        (1, 1.0, 9),   # frontier (cheapest)
        (2, 3.0, 5),   # frontier
        (3, 3.0, 5),   # duplicate of #2 -> also survives
        (4, 3.0, 7),   # same price as #2, bigger -> dominated
        (5, 8.0, 2),   # frontier (smallest)
        (6, 9.0, 2),   # same size as #5, pricier -> dominated
        (7, 9.0, 9),   # dominated by everything on the frontier
    ]
    df = spark.createDataFrame(rows, "id bigint, price double, size int")
    got = sorted(r.id for r in skyline_2d(df, "price", "size").collect())
    assert got == [1, 2, 3, 5]


def test_active_users_hand_windows(spark):
    """3 users on day0, 1 on day3: DAU exact per day; WAU(7) carries day0
    users forward; a user active twice one day counts once; the output
    STOPS at the last observed day (r8: no phantom trailing-decay days —
    round-7 ADVICE)."""
    import datetime

    from kiara_spark.operators.events import active_users

    base = datetime.datetime(2024, 3, 1)
    rows = [(1, base, 10), (2, base, 11), (3, base, 12),
            (4, base + datetime.timedelta(hours=2), 10),   # dup user-day
            (5, base + datetime.timedelta(days=3), 99)]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint")
    out = {str(r.day): r for r in
           active_users(df, "ts", "user_id", windows=(1, 7, 30)).collect()}
    assert out["2024-03-01"].active_1d == 3
    assert out["2024-03-01"].active_7d == 3
    assert out["2024-03-03"].active_1d == 0
    assert out["2024-03-03"].active_7d == 3
    assert out["2024-03-04"].active_1d == 1
    assert out["2024-03-04"].active_7d == 4
    assert out["2024-03-04"].active_30d == 4
    assert max(out) == "2024-03-04"   # capped at the max observed day


def test_lexical_richness_hand(spark):
    """'a a b' -> N=3 V=2 hapax=1; richer text scores higher TTR."""
    from kiara_spark.operators.text import lexical_richness

    df = spark.createDataFrame(
        [("x", "a a b"), ("y", "one two three four")],
        "lang string, text string")
    out = {r.lang: r for r in lexical_richness(df, "lang", "text").collect()}
    assert (out["x"].n_tokens, out["x"].vocab, out["x"].hapax) == (3, 2, 1)
    assert out["x"].ttr == pytest.approx(2 / 3, abs=1e-6)
    assert out["y"].ttr == 1.0 and out["y"].hapax_ratio == 1.0
