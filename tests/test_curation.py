"""Corpus-curation operators: PII redaction, decontamination, repetition
filters, TF-IDF (operators/curation.py)."""

import pyspark.sql.functions as F
import pytest

from kiara_spark.operators.curation import (decontaminate, redact_pii,
                                            repetition_stats, tfidf_top_terms)


def test_redact_pii_masks_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@example.com or alice@test.org, call 555-123-4567, host 10.0.0.1"),
         (2, "clean text with no identifiers at all")],
        "doc_id int, text string")
    rows = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_phone"]) == (2, 1, 1)
    red = rows[1]["redacted_text"]
    assert "<EMAIL>" in red and "<IPV4>" in red and "<PHONE>" in red
    assert "bob@example.com" not in red and "10.0.0.1" not in red
    assert rows[2]["redacted_text"] == rows[2]["text"]
    assert (rows[2]["n_email"], rows[2]["n_ipv4"], rows[2]["n_phone"]) == (0, 0, 0)


def test_decontaminate_flags_ngram_overlap(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "completely unrelated words about database engines here"),
         (3, "short doc")],  # < n tokens -> no grams, never contaminated
        "doc_id int, text string")
    ev = spark.createDataFrame(
        [("quick brown fox jumps over the moon",)], "text string")
    got = {r["doc_id"]: (r["n_contaminated_grams"], r["contaminated"])
           for r in decontaminate(train, ev, n=5).collect()}
    # train doc 1 shares the 5-grams "quick brown fox jumps over" (+1 more
    # shifted) is NOT shared since eval continues "the moon": exactly 1 gram
    assert got[1][1] == 1 and got[1][0] >= 1
    assert got[2] == (0, 0)
    assert got[3] == (0, 0)


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [(1, "same line\nsame line\nother line"),
         (2, "a b c d"),
         (3, "x x x x")],
        "doc_id int, text string")
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert rows[1]["n_lines"] == 3
    assert rows[1]["dup_line_frac"] == pytest.approx(1 / 3)
    assert rows[2]["dup_token_frac"] == 0.0
    assert rows[3]["dup_token_frac"] == pytest.approx(3 / 4)


def test_tfidf_distinctive_term_wins(spark):
    df = spark.createDataFrame(
        [(1, "common zebra"),
         (2, "common words here"),
         (3, "common words there")],
        "doc_id int, text string")
    top1 = {r["doc_id"]: r["term"] for r in tfidf_top_terms(df, k=1).collect()}
    # equal tf=1 in doc 1: "zebra" (df=1, idf=ln(2)+1) beats "common"
    # (df=3, idf=1)
    assert top1[1] == "zebra"


def test_curation_ops_registered(ctx):
    for op in ("table.redact_pii", "table.decontaminate",
               "table.repetition_stats", "table.tfidf_top_terms"):
        assert op in ctx.operation_registry.operation_ids


def test_mixture_sample_ratios_and_determinism(spark):
    from pyspark.sql import functions as F

    from kiara_spark.operators import text as X

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    weights = {"en": 0.4, "de": 0.2, "fr": 0.2, "es": 0.15, "zh": 0.05}
    out = X.mixture_sample(docs, "lang", weights)
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(got.values())
    # composition tracks the target ratios (hash sampling ⇒ loose tolerance
    # at this tiny SF), and a repartitioned rerun picks identical rows
    for lang, w in weights.items():
        assert abs(got.get(lang, 0) / total - w) < 0.12, (lang, got, total)
    again = X.mixture_sample(docs.repartition(7), "lang", weights)
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == \
           sorted(r["doc_id"] for r in again.select("doc_id").collect())


def test_token_budget_cap_respects_budget_and_order(spark):
    from pyspark.sql import functions as F

    from kiara_spark.operators import text as X

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = X.token_budget_cap(docs, "lang", 2000)
    rows = out.select("lang", "n_chars", "doc_id", "n_tokens").collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        # exclusive-cumsum rule: every kept row starts under budget, so the
        # total may exceed it by at most the last row's tokens
        tot = sum(r["n_tokens"] for r in rs)
        assert tot - max(r["n_tokens"] for r in rs) < 2000, (lang, tot)
        # kept set is a prefix of the (n_chars desc, doc_id) ranking: every
        # kept row outranks every dropped row of the same lang
        kept_ids = {r["doc_id"] for r in rs}
        ranked = (docs.filter(F.col("lang") == lang)
                  .orderBy(F.col("n_chars").desc(), "doc_id")
                  .select("doc_id").collect())
        ranked_ids = [r["doc_id"] for r in ranked]
        assert set(ranked_ids[:len(rs)]) == kept_ids, lang


def test_dict_encode_and_split_by_group(spark):
    from pyspark.sql import functions as F

    from kiara_spark.operators import text as X

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    encoded, dictionary = X.dict_encode(docs, "source")
    # bijection: one dense id per distinct source, 1..K by sort order
    d = sorted((r["source"], r["source_id"]) for r in dictionary.collect())
    assert [i for _, i in d] == list(range(1, len(d) + 1))
    assert [s for s, _ in d] == sorted(s for s, _ in d)
    # encoding is total and consistent
    assert encoded.filter(F.col("source_id").isNull()).count() == 0

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    split = X.split_by_group(ev, "user_id")
    # leakage-safety: every user's rows share a single split label
    per_user = (split.groupBy("user_id")
                .agg(F.countDistinct("split").alias("k")).collect())
    assert all(r["k"] == 1 for r in per_user)
    got = {r["split"] for r in split.select("split").distinct().collect()}
    assert got <= {"train", "val", "test"} and "train" in got


def test_pack_concat_budget_and_order(spark):
    from pyspark.sql import functions as F

    from kiara_spark.operators.text import pack_concat_sequences

    rows = [(i, f"word{i} " * 10) for i in range(8)]  # 10 tokens each
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_concat_sequences(df, budget=25, shards=1, sep="|")
    got = {r.bin_no: r for r in out.collect()}
    # exclusive cumsum: docs 0-2 (0,10,20) -> bin 0; 3-4 (30,40) -> bin 1...
    assert got[0].n_docs == 3 and got[0].total_tokens == 30
    # concatenation preserves id order with the separator
    assert got[0].packed_text.split("|")[0].startswith("word0")
    assert got[0].packed_text.split("|")[2].startswith("word2")


def test_pack_concat_op_registered(ctx):
    assert ctx.operation_registry.resolve("text.pack_concat") is not None


def test_inverted_index_postings_and_min_df(spark):
    from kiara_spark.operators.curation import inverted_index

    rows = [(1, "alpha beta beta"), (2, "beta gamma"), (3, "alpha")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.term: (r.doc_freq, r.postings)
           for r in inverted_index(df, min_df=1).collect()}
    # within-doc duplicates collapse; postings sorted by id
    assert out["beta"] == (2, "1,2")
    assert out["alpha"] == (2, "1,3")
    assert out["gamma"] == (1, "2")
    out2 = {r.term for r in inverted_index(df, min_df=2).collect()}
    assert out2 == {"alpha", "beta"}


def test_bm25_tf_saturation_and_length_norm(spark):
    from kiara_spark.operators.curation import bm25_score

    # doc 2 repeats the query term but is longer; doc 3 lacks it entirely
    rows = [(1, "cat sits"), (2, "cat cat cat dog dog dog dog dog"),
            (3, "dog dog")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.bm25 for r in bm25_score(df, ["cat"]).collect()}
    assert set(out) == {1, 2}  # doc 3 never scores
    assert out[2] > out[1] > 0  # higher tf still wins despite length norm
    # saturation: tripled tf must NOT triple the score (k1 bounds the gain)
    assert out[2] < 3 * out[1]


def test_bm25_multi_term_hit_count(spark):
    from kiara_spark.operators.curation import bm25_score

    rows = [(1, "alpha beta"), (2, "alpha")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.n_query_terms_hit
           for r in bm25_score(df, ["alpha", "beta"]).collect()}
    assert out == {1: 2, 2: 1}


def test_search_ops_registered(ctx):
    for op in ("table.inverted_index", "table.bm25_score"):
        assert ctx.operation_registry.resolve(op) is not None


def test_term_freq_histogram(spark):
    from kiara_spark.operators.curation import term_freq_histogram

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string")
    out = {r.occurrences: r.n_terms
           for r in term_freq_histogram(df).collect()}
    # a:2, b:2, c:1 -> one singleton term, two doubled terms
    assert out == {1: 1, 2: 2}


def test_token_dropout_deterministic_and_bounded(spark):
    from kiara_spark.operators.text import token_dropout

    rows = [(i, "one two three four five six seven eight nine ten")
            for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r.doc_id: (r.augmented_text, r.n_kept)
         for r in token_dropout(df, drop_pct=20).collect()}
    b = {r.doc_id: (r.augmented_text, r.n_kept)
         for r in token_dropout(df.repartition(7), drop_pct=20).collect()}
    assert a == b  # pure function of (id, position)
    kept_total = sum(v[1] for v in a.values())
    assert 0.70 * 500 < kept_total < 0.90 * 500  # ~20% dropped
    # kept tokens preserve original order
    for text, _ in a.values():
        toks = text.split()
        order = ["one", "two", "three", "four", "five", "six", "seven",
                 "eight", "nine", "ten"]
        assert toks == [t for t in order if t in toks]


def test_token_dropout_empty_doc(spark):
    from kiara_spark.operators.text import token_dropout

    df = spark.createDataFrame([(1, "")], "doc_id long, text string")
    out = token_dropout(df).collect()[0]
    assert out.augmented_text == "" and out.n_kept == 0


def test_token_dropout_op_registered(ctx):
    assert ctx.operation_registry.resolve("text.augment.token_dropout") is not None


def test_canonical_url_rules(spark):
    """Every normalization rule: scheme, www, fragment, tracking params,
    default ports, host case (path case preserved), trailing slash."""
    from kiara_spark.operators.curation import canonical_url

    cases = [
        ("HTTP://WWW.Ex.COM/Path/", "ex.com/Path"),
        ("https://ex.com:443/a", "ex.com/a"),
        ("http://ex.com:80", "ex.com"),
        ("https://ex.com/a?utm_source=x&utm_campaign=y", "ex.com/a"),
        ("https://ex.com/a?utm_source=x&real=1&gclid=z", "ex.com/a?real=1"),
        ("https://ex.com/a#section", "ex.com/a"),
        ("https://ex.com:8080/a", "ex.com:8080/a"),  # non-default port kept
        ("ex.com/a", "ex.com/a"),  # already bare
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i int, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonical_url("url").alias("c")).collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_url_dup_groups_min_id_survivor(ctx, spark):
    from kiara_spark.operators.curation import url_dup_groups

    df = spark.createDataFrame(
        [(1, "https://www.ex.com/a"), (2, "HTTP://EX.com/a?utm_source=t"),
         (3, "https://ex.com/b")],
        "doc_id int, url string")
    groups = {r["canonical_url"]: r for r in url_dup_groups(df).collect()}
    assert groups["ex.com/a"]["n_dups"] == 2
    assert groups["ex.com/a"]["keep_id"] == 1
    assert groups["ex.com/a"]["url_host"] == "ex.com"
    assert groups["ex.com/b"]["n_dups"] == 1
    assert ctx.operation_registry.resolve("table.dedup.url") is not None


def test_extract_html_text_rules(ctx, spark):
    from kiara_spark.operators.text import extract_html_text

    cases = [
        ("<p>Hello</p><script>bad()</script><b>World</b>", "Hello World"),
        ("<style>p{}</style>A<!-- x -->B", "A B"),
        ("Tom &amp; Jerry &lt;3 &quot;hi&quot; &#39;q&#39;",
         "Tom & Jerry <3 \"hi\" 'q'"),
        ("line1<br/>line2<div class='c'>line3</div>", "line1 line2 line3"),
        ("plain  text   here", "plain text here"),  # idempotent on plain
    ]
    df = spark.createDataFrame([(i, h) for i, (h, _) in enumerate(cases)],
                               "i int, html string")
    got = {r["i"]: r["t"] for r in
           df.select("i", extract_html_text(F.col("html")).alias("t")).collect()}
    for i, (h, want) in enumerate(cases):
        assert got[i] == want, (h, got[i], want)
    assert ctx.operation_registry.resolve("text.extract_html") is not None


def test_canonical_url_tracking_param_boundaries(spark):
    """r4 review: tracking-param removal must anchor at a separator —
    'xfbclid' is NOT a tracking param; consecutive tracking params all go;
    a removed first param promotes the next separator to '?'."""
    from kiara_spark.operators.curation import canonical_url

    cases = [
        ("https://ex.com/?xfbclid=1&a=2", "ex.com/?xfbclid=1&a=2"),
        ("https://ex.com/?utm_a=1&utm_b=2&real=3", "ex.com/?real=3"),
        ("https://ex.com/?utm_a=1&real=2&gclid=3&utm_c=4", "ex.com/?real=2"),
        ("https://ex.com/p?fbclid=x", "ex.com/p"),
        ("https://ex.com/p?a=utm_source%3Dx", "ex.com/p?a=utm_source%3Dx"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i int, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonical_url("url").alias("c")).collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_extract_html_no_double_entity_decode(ctx, spark):
    """r4 review: '&amp;lt;' renders as the literal '&lt;' — amp decodes
    LAST so escaped entity references never double-decode."""
    from kiara_spark.operators.text import extract_html_text

    df = spark.createDataFrame(
        [(1, "<p>a &amp;lt; b</p>"), (2, "<p>x &amp;amp; y</p>")],
        "i int, html string")
    got = {r["i"]: r["t"] for r in
           df.select("i", extract_html_text(F.col("html")).alias("t")).collect()}
    assert got[1] == "a &lt; b"
    assert got[2] == "x &amp; y"


def test_canonical_url_literal_ampersand_in_path_untouched(spark):
    """r4 review round 2: a literal '&' outside the query string is a
    legal character — removal of tracking params must never promote it."""
    from kiara_spark.operators.curation import canonical_url

    cases = [
        ("https://ex.com/a&b", "ex.com/a&b"),
        ("https://ex.com/a&b?q=1", "ex.com/a&b?q=1"),
        ("https://ex.com/a&b?utm_x=1", "ex.com/a&b"),
        ("https://ex.com/a?", "ex.com/a"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(cases)],
                               "i int, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonical_url("url").alias("c")).collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_gopher_rules_battery(spark):
    from kiara_spark.operators.text import with_gopher_rules

    rows = [
        # good: 60 required-ish words, clean lines
        (1, " ".join(["the quick brown fox jumps over lazy dogs today and"] * 6)),
        # too short
        (2, "tiny doc"),
        # symbol-heavy
        (3, "the " + "# " * 40 + "of and that have with be to words here"),
        # bullet-heavy
        (4, "\n".join("- item number %d in the list of things" % i
                      for i in range(10))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in with_gopher_rules(df).collect()}
    assert got[1].ok_word_count and got[1].ok_alpha_words
    assert got[1].ok_required_words and got[1].pass_gopher
    assert not got[2].ok_word_count and not got[2].pass_gopher
    assert not got[3].ok_symbol_ratio and not got[3].ok_alpha_words
    assert got[4].bullet_line_ratio == 1.0 and not got[4].ok_bullet_lines


def test_clean_c4_line_and_doc_rules(spark):
    from kiara_spark.operators.text import clean_c4

    rows = [
        (1, "This is a good sentence.\nshort.\nNo terminal punctuation here\n"
            "Another proper sentence stands here. And one more follows it."),
        (2, "Uses javascript for tracking everywhere.\nA clean line is here."),
        (3, "Contains the banned { brace.\nA clean line sits here. More."),
        (4, "lorem ipsum dolor sit amet.\nA clean line sits right here."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in clean_c4(df, min_sentences=2).collect()}
    # doc 1: line1 + line4 kept ('short.' <3 words, line3 no punct)
    assert got[1].n_kept_lines == 2 and got[1].kept_doc
    assert "No terminal" not in got[1].cleaned_text
    # javascript line dropped, doc survives on the clean line? only 1
    # sentence left -> dropped by min_sentences=2
    assert got[2].n_kept_lines == 1 and not got[2].kept_doc
    assert not got[3].kept_doc  # brace kills the whole doc
    assert not got[4].kept_doc  # lorem ipsum kills the whole doc


def test_wordlist_score_fractions_and_verdict(spark):
    from kiara_spark.operators.text import with_wordlist_score

    rows = [
        (1, "clean text with table and row words only"),   # 0 hits / 8
        (2, "slow big merge hash"),                        # 4 hits / 4
        (3, "one slow token among ten total words here ok x"),  # 1/10
        (4, ""),                                           # empty doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in with_wordlist_score(df).collect()}
    assert got[1].wl_n_flagged == 0 and not got[1].wl_flagged
    assert got[2].wl_flag_fraction == 1.0 and got[2].wl_flagged
    assert got[3].wl_n_tokens == 10 and got[3].wl_n_flagged == 1
    assert got[3].wl_flag_fraction == 0.1 and not got[3].wl_flagged
    assert got[4].wl_n_tokens == 0 and got[4].wl_flag_fraction == 0.0
    assert not got[4].wl_flagged
    # custom list + threshold boundary: fraction == threshold flags
    got2 = {r.doc_id: r for r in with_wordlist_score(
        df, wordlist=("clean",), flag_threshold=0.125).collect()}
    assert got2[1].wl_flag_fraction == 0.125 and got2[1].wl_flagged
    assert got2[2].wl_n_flagged == 0 and not got2[2].wl_flagged


def test_perplexity_buckets_orders_rare_docs_to_tail(spark):
    from kiara_spark.operators.curation import perplexity_buckets

    common = "alpha beta gamma delta " * 5
    docs = [(i, common) for i in range(1, 7)]
    docs.append((7, "zeta eta theta iota kappa"))  # all-rare tokens
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in perplexity_buckets(df).collect()}
    assert got[7].label == "tail" and got[7].bucket == 3
    assert got[1].label == "head"
    assert all(got[i].avg_neg_logprob < got[7].avg_neg_logprob
               for i in range(1, 7))


def test_dsir_prefers_target_like_docs(spark):
    from kiara_spark.operators.curation import dsir_sample

    tgt_like = "the cat sat on the mat and the dog ran off"
    off_dom = "numeric tables of figures list digits rows columns cells"
    raw = [(i, tgt_like) for i in range(10)] + \
          [(i, off_dom) for i in range(10, 20)]
    df = spark.createDataFrame(raw, "doc_id long, text string")
    target = spark.createDataFrame(
        [(100, tgt_like), (101, "the cat and the dog sat")],
        "doc_id long, text string")
    got = dsir_sample(df, target, top_k=10, gumbel=False).collect()
    picked = {r.doc_id for r in got}
    assert picked == set(range(10))  # every target-like doc outranks off-domain
    ranks = {r.doc_id: r.rank for r in got}
    assert sorted(ranks.values()) == list(range(1, 11))
    # gumbel variant is deterministic: same call, same draw
    g1 = [r.doc_id for r in dsir_sample(df, target, top_k=5).collect()]
    g2 = [r.doc_id for r in dsir_sample(df, target, top_k=5).collect()]
    assert g1 == g2


def test_new_curation_ops_registered(ctx):
    for op in ("table.sample.dsir", "table.quality.perplexity_buckets",
               "text.quality.gopher", "text.clean.c4"):
        assert ctx.operation_registry.resolve(op) is not None


def test_readability_flesch(spark):
    from kiara_spark.operators.text import with_readability

    rows = [(1, "The cat sat. The dog ran."),
            (2, "no terminal punctuation here"),
            (3, "Incomprehensibility characterizes institutionalization.")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in with_readability(df).collect()}
    assert got[1].n_sentences == 2 and got[1].n_words == 6
    assert got[2].flesch_score is None  # zero sentences -> NULL, not inf
    # polysyllabic monster scores far below the simple sentences
    assert got[3].flesch_score < got[1].flesch_score - 50


def test_bpe_merge_candidates_weighted_counts(spark):
    from kiara_spark.operators.text import bpe_merge_candidates

    # 'aaab' x3 + 'ab': pairs aa(2x3=6), ab(1x3+1=4), b alone contributes none
    df = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "aaab ab b")], "doc_id long, text string")
    got = {r.pair: (r.rank, r.n_occurrences)
           for r in bpe_merge_candidates(df, top_k=10).collect()}
    assert got["aa"] == (1, 6)
    assert got["ab"] == (2, 4)
    assert "b" not in got  # single chars produce no pair


def test_cooccurrence_pmi_collocation(spark):
    import math

    from kiara_spark.operators.text import cooccurrence_pmi

    # "alpha beta" always together (perfect collocation); "noise" everywhere.
    rows = [(i, "alpha beta noise") for i in range(6)] \
        + [(i + 10, "noise only filler") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.a, r.b): r for r in
           cooccurrence_pmi(df, min_count=3, top_k=10).collect()}
    ab = out[("alpha", "beta")]
    assert ab.cab == 6 and ab.ca == 6 and ab.cb == 6
    # pmi(alpha,beta) = ln(6*12/(6*6)) = ln(2)
    assert abs(ab.pmi - round(math.log(2), 6)) < 1e-9
    # alpha-noise co-occurs only as often as chance predicts a subset:
    # pmi = ln(6*12/(6*12)) = 0
    assert out[("alpha", "noise")].pmi == 0.0
    # rare pairs below min_count are absent
    assert ("only", "alpha") not in out


def test_cooccurrence_pmi_registered(ctx):
    assert ctx.operation_registry.resolve("text.cooccurrence_pmi") is not None


def test_chi2_feature_select_discriminative_token(spark, ctx):
    from kiara_spark.operators.text import chi2_feature_select

    # "uniq" appears in every 'en' doc and no 'fr' doc: maximal chi2;
    # "shared" appears everywhere: excluded (tt == N); "mid" is mixed.
    rows = [(i, "uniq shared mid" if i % 2 else "uniq shared", "en")
            for i in range(10)] \
        + [(i + 100, "shared autre mid" if i % 2 else "shared autre", "fr")
           for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = chi2_feature_select(df, min_df=3, top_k=3).collect()
    by_label = {}
    for r in out:
        by_label.setdefault(r.label, []).append(r)
    # top-1 for 'en' is the perfectly discriminative token, chi2 = N = 20
    top_en = sorted(by_label["en"], key=lambda r: r.rank)[0]
    assert top_en.token in ("uniq", "autre")
    assert top_en.chi2 == 20.0
    # universal token never appears
    assert all(r.token != "shared" for r in out)
    assert ctx.operation_registry.resolve(
        "text.chi2_feature_select") is not None


def test_textrank_hub_word_wins(spark, ctx):
    from kiara_spark.operators.text import textrank_keywords

    # "core" neighbors every other word; satellites only touch "core"
    rows = [(1, "core alpha"), (2, "core beta"), (3, "core gamma"),
            (4, "core delta"), (5, "core epsilon")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textrank_keywords(df, window=2, iterations=3, top_k=3).collect()
    assert out[0].keyword == "core"
    assert out[0].rank > out[1].rank
    assert ctx.operation_registry.resolve("text.textrank_keywords") is not None


def test_bigram_logprob_rare_sequence_scores_higher(spark, ctx):
    from kiara_spark.operators.text import bigram_logprob

    # doc 99 uses a bigram seen nowhere else; docs 1-10 repeat "a b"
    rows = [(i, "a b") for i in range(10)] + [(99, "zz qq")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bigram_logprob(df).collect()}
    assert out[1].n_bigrams == 1
    assert out[99].avg_neg_logprob > out[1].avg_neg_logprob
    # single-token / empty docs produce no bigrams
    short = spark.createDataFrame([(1, "solo"), (2, "")],
                                  "doc_id long, text string")
    assert bigram_logprob(short).collect() == []
    assert ctx.operation_registry.resolve("text.bigram_logprob") is not None


def test_kwic_concordance_edges(spark, ctx):
    from kiara_spark.operators.text import kwic_concordance

    df = spark.createDataFrame(
        [(1, "Target at start and target at the very end target")],
        "doc_id long, text string")
    out = sorted(kwic_concordance(df, "Target", window=2).collect(),
                 key=lambda r: r.position)
    assert [r.position for r in out] == [1, 5, 10]
    # doc-start occurrence has empty left context
    assert out[0].left_context == "" and out[0].right_context == "at start"
    # mid-doc gets both sides
    assert out[1].left_context == "start and"
    assert out[1].right_context == "at the"
    # doc-end occurrence has empty right context
    assert out[2].right_context == "" and out[2].left_context == "very end"
    assert out[0].term == "target"  # matching is case-folded
    assert ctx.operation_registry.resolve("text.kwic") is not None


def test_remove_stopwords_and_trends(spark, ctx):
    from kiara_spark.operators.text import remove_stopwords, term_trends

    df = spark.createDataFrame(
        [(1, "the cat and the hat", "a"), (2, "cat cat dog", "b")],
        "doc_id long, text string, source string")
    out = {r.doc_id: r for r in remove_stopwords(df).collect()}
    assert out[1].text_content == "cat hat" and out[1].n_removed == 3
    assert out[2].n_removed == 0
    tr = {(r.source, r.term): r for r in
          term_trends(df, ["cat", "zebra"], group_col="source").collect()}
    assert tr[("a", "cat")].n == 1
    assert tr[("a", "cat")].per_1000_tokens == 200.0  # 1 of 5 tokens
    assert tr[("b", "cat")].per_1000_tokens == round(2000 / 3, 6)
    assert tr[("b", "zebra")].n == 0  # zero cells preserved
    assert ctx.operation_registry.resolve(
        "text.remove_stopwords") is not None
    assert ctx.operation_registry.resolve("text.term_trends") is not None


def test_sstemmer_rules(spark, ctx):
    from kiara_spark.operators.text import stem_tokens

    df = spark.createDataFrame(
        [(1, "ponies horses classes buses bus glass goes trees dogs")],
        "doc_id long, text string")
    r = stem_tokens(df).collect()[0]
    # ponies->pony (ies->y), horses->horse (es->e), classes->classe,
    # buses->buse, bus stays (-us), glass stays (-ss), goes stays (-oes),
    # trees stays (-ees), dogs->dog (-s)
    assert r.text_stemmed == \
        "pony horse classe buse bus glass goes trees dog"
    assert r.n_changed == 5
    assert ctx.operation_registry.resolve("text.stem") is not None


def test_balanced_sample_operation(spark, ctx):
    import pandas as pd

    # majority class 40 rows, minority 5: balanced keeps minority whole
    # and downsamples the majority toward ~5
    pdf = pd.DataFrame(
        [(i, "big") for i in range(40)] + [(100 + i, "small") for i in range(5)],
        columns=["doc_id", "lang"])
    df = spark.createDataFrame(pdf)
    tbl = ctx.register_table(df)
    out = ctx.run_job("table.sample.balanced", {"table": tbl},
                      operation_config={"group_column": "lang"})
    got = out["table"].data.groupBy("lang").count().collect()
    counts = {r["lang"]: r["count"] for r in got}
    assert counts.get("small", 0) == 5          # minority kept whole
    assert 0 < counts.get("big", 0) <= 14       # majority ~n_min (hash noise)


def test_code_detect_separates_code_from_prose(spark):
    from kiara_spark.operators.text import with_code_signals

    code = ("def add(a, b):\n"
            "    total = (a + b);\n"
            "    return total;\n"
            "import os\n"
            "class Greeter:\n"
            "    def hello(self):\n"
            "        print('hi');\n")
    prose = ("The quick brown fox jumps over the lazy dog. "
             "It was the best of times, it was the worst of times. "
             "Call me Ishmael. Some years ago, never mind how long "
             "precisely, I went to sea.")
    df = spark.createDataFrame([(1, code), (2, prose)],
                               "doc_id bigint, text string")
    got = {r.doc_id: r for r in with_code_signals(df).collect()}
    assert got[1].is_code is True
    assert got[2].is_code is False
    assert got[1].code_score > 0.3 > got[2].code_score
    assert got[1].indent_line_ratio > 0.4  # 4 of 7 lines indented
    assert got[1].punct_line_ratio > 0.4   # ;-terminated lines
    assert got[1].kw_hits >= 4             # def/return/import/class/print
    assert got[2].kw_hits == 0 and got[2].symbol_density == 0.0


def test_code_detect_empty_and_guards(spark):
    from kiara_spark.operators.text import with_code_signals

    df = spark.createDataFrame([(1, ""), (2, "   \n  \n")],
                               "doc_id bigint, text string")
    got = {r.doc_id: r for r in with_code_signals(df).collect()}
    for r in got.values():
        assert r.n_lines == 0 and r.code_score == 0.0
        assert r.is_code is False


def test_code_detect_operation_minted(ctx, spark):
    df = spark.createDataFrame(
        [(1, "x = 1;\ny = 2;\nreturn x;\n")],
        "doc_id bigint, text string")
    out = ctx.run_job("text.quality.code_detect", {"table": df})
    row = out["table"].data.collect()[0]
    assert row.is_code is True and row.punct_line_ratio == 1.0


def test_script_detect_dominant_and_mixed(spark):
    from kiara_spark.operators.text import with_script_signals

    rows = [
        (1, "plain english text only"),
        (2, "привет мир это тестовый текст"),            # cyrillic
        (3, "这是一个测试文本没有别的"),                      # cjk
        (4, "Пример mixed текст with латиница here"),    # cyr + latin
        (5, "12345 ... !!!"),                            # no script chars
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in with_script_signals(df).collect()}
    assert got[1].dominant_script == "latin" and not got[1].mixed_script
    assert got[1].latin_ratio == 1.0
    assert got[2].dominant_script == "cyrillic"
    assert got[2].cyrillic_ratio == 1.0 and got[2].n_scripts == 1
    assert got[3].dominant_script == "cjk" and got[3].cjk_ratio == 1.0
    assert got[4].mixed_script and got[4].n_scripts == 2
    assert got[4].cyrillic_ratio > 0.3 and got[4].latin_ratio > 0.3
    assert got[5].dominant_script == "none"
    assert got[5].n_script_chars == 0 and got[5].n_scripts == 0


def test_script_detect_counts_exact(spark):
    """Exact char accounting: 5 latin + 6 cyrillic (spaces/digits not
    script-classified)."""
    from kiara_spark.operators.text import with_script_signals

    df = spark.createDataFrame([(1, "abcde привет 123")],
                               "doc_id bigint, text string")
    r = with_script_signals(df).collect()[0]
    assert r.n_script_chars == 11
    assert r.latin_ratio == pytest.approx(5 / 11, abs=1e-6)
    assert r.cyrillic_ratio == pytest.approx(6 / 11, abs=1e-6)
    assert r.dominant_script == "cyrillic"


def test_script_detect_operation_minted(ctx, spark):
    df = spark.createDataFrame([(1, "שלום עולם זה מבחן")],
                               "doc_id bigint, text string")
    out = ctx.run_job("text.script_detect", {"table": df})
    r = out["table"].data.collect()[0]
    assert r.dominant_script == "hebrew" and not r.mixed_script
