"""Round-3 additions: product quantization (encode + ADC top-k) and the
exact substring-dedup primitive (duplicate n-gram spans)."""

import pytest

from pyspark.sql import functions as F


def _emb(spark, n=40, dim=8, seed=3):
    import hashlib

    def val(i, d):
        h = int(hashlib.md5(f"{seed}_{i}_{d}".encode()).hexdigest()[:8], 16)
        return (h % 2001 - 1000) / 1000.0

    rows = [(i, [val(i, d) for d in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_encode_seed_vectors_have_zero_error(spark):
    from kiara_spark.operators.similarity import pq_encode, pq_seed_codebook

    emb = _emb(spark)
    cb = pq_seed_codebook(emb, m=2, k=4)
    out = {r.vec_id: r for r in pq_encode(emb, cb).collect()}
    assert len(out) == 40
    # the k lowest-id vectors ARE codewords: they encode to themselves
    for i in range(4):
        assert out[i].recon_err_e9 == 0
        assert out[i].codes == [i, i]
    for r in out.values():
        assert len(r.codes) == 2
        assert all(0 <= c < 4 for c in r.codes)
        assert r.recon_err_e9 >= 0


def test_pq_fast_path_matches_exact_assignment(spark):
    from kiara_spark.operators.similarity import pq_encode, pq_seed_codebook

    emb = _emb(spark)
    cb = pq_seed_codebook(emb, m=2, k=4)
    exact = {r.vec_id: r.codes for r in pq_encode(emb, cb).collect()}
    fast = {r.vec_id: r.codes
            for r in pq_encode(emb, cb, exact=False).collect()}
    assert exact == fast  # same argmin on non-adversarial data


def test_pq_rejects_indivisible_dim(spark):
    from kiara_spark.operators.similarity import pq_seed_codebook

    emb = _emb(spark, dim=7)
    with pytest.raises(ValueError, match="not divisible"):
        pq_seed_codebook(emb, m=2, k=4)


def test_pq_topk_adc_ranks(spark):
    from kiara_spark.operators.similarity import pq_seed_codebook, pq_topk_adc

    emb = _emb(spark)
    cb = pq_seed_codebook(emb, m=2, k=4)
    queries = emb.filter("vec_id < 3")
    got = pq_topk_adc(emb, queries, cb, k=5).collect()
    by_q = {}
    for r in got:
        assert r.neighbor_id != r.query_id
        assert r.adc_dist_e9 >= 0
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        dists = [r.adc_dist_e9 for r in sorted(rows, key=lambda r: r.rank)]
        assert dists == sorted(dists)


def test_duplicate_ngram_spans_merges_overlaps(spark):
    from kiara_spark.operators.dedup import duplicate_ngram_spans

    shared = "alpha beta gamma delta"          # 4-token phrase, n=3 below
    docs = spark.createDataFrame([
        (1, f"one two {shared} three four"),   # dup grams at pos 2 and 3
        (2, f"xx yy zz {shared} ww"),          # dup grams at pos 3 and 4
        (3, "totally unrelated words here now"),
    ], "doc_id long, text string")
    out = {r.doc_id: r for r in duplicate_ngram_spans(
        docs, n=3, min_count=2).collect()}
    # doc1: grams (alpha beta gamma)@2 and (beta gamma delta)@3 overlap ->
    # one merged span [2, 6)
    assert (out[1].span_start, out[1].span_end, out[1].span_tokens) == (2, 6, 4)
    assert (out[2].span_start, out[2].span_end) == (3, 7)
    assert 3 not in out


def test_duplicate_ngram_spans_within_doc_repeat(spark):
    from kiara_spark.operators.dedup import duplicate_ngram_spans

    # the same 3-gram twice INSIDE one doc also counts (corpus-wide >= 2)
    docs = spark.createDataFrame(
        [(1, "p q r s t p q r")], "doc_id long, text string")
    got = sorted(
        (r.span_start, r.span_end)
        for r in duplicate_ngram_spans(docs, n=3, min_count=2).collect())
    assert got == [(0, 3), (5, 8)]


def test_duplicate_ngram_spans_short_docs_empty(spark):
    from kiara_spark.operators.dedup import duplicate_ngram_spans

    docs = spark.createDataFrame(
        [(1, "too short"), (2, "too short")], "doc_id long, text string")
    assert duplicate_ngram_spans(docs, n=10).count() == 0


def test_clip_duplicate_spans(spark):
    from kiara_spark.operators.dedup import clip_duplicate_spans

    shared = "alpha beta gamma delta"
    docs = spark.createDataFrame([
        (1, f"one two {shared} three four"),
        (2, f"xx yy zz {shared} ww"),
        (3, "totally unrelated words here now"),
    ], "doc_id long, text string")
    out = {r.doc_id: r for r in clip_duplicate_spans(
        docs, n=3, min_count=2).collect()}
    assert out[1].clipped_text == "one two three four"
    assert out[1].n_tokens == 8 and out[1].n_tokens_removed == 4
    assert out[2].clipped_text == "xx yy zz ww"
    assert out[3].clipped_text == "totally unrelated words here now"
    assert out[3].n_tokens_removed == 0


def test_clip_fully_duplicated_doc_empties(spark):
    from kiara_spark.operators.dedup import clip_duplicate_spans

    docs = spark.createDataFrame([
        (1, "a b c d"), (2, "a b c d")], "doc_id long, text string")
    out = {r.doc_id: r for r in clip_duplicate_spans(
        docs, n=4, min_count=2).collect()}
    assert out[1].clipped_text == "" and out[1].n_tokens_removed == 4


def test_pq_training_reduces_reconstruction_error(spark):
    from kiara_spark.operators.similarity import (pq_encode,
                                                  pq_seed_codebook,
                                                  pq_train_codebook)

    emb = _emb(spark, n=60)
    seed = pq_seed_codebook(emb, m=2, k=4)
    trained = pq_train_codebook(emb, m=2, k=4, n_iter=2)
    err_seed = sum(r.recon_err_e9 for r in pq_encode(emb, seed).collect())
    err_trained = sum(r.recon_err_e9
                      for r in pq_encode(emb, trained).collect())
    # Lloyd updates move codewords to their cells' centroids: total
    # quantization error must not increase, and on random data it drops
    assert err_trained < err_seed


def test_pq_topk_bucket_pruning(spark):
    from kiara_spark.operators.similarity import pq_seed_codebook, pq_topk_adc

    emb = _emb(spark).withColumn(
        "label", (F.col("vec_id") % 2).cast("string"))
    cb = pq_seed_codebook(emb, m=2, k=4)
    queries = emb.filter("vec_id < 2")
    got = pq_topk_adc(emb, queries, cb, k=40, bucket_col="label").collect()
    # nprobe=1: every scored neighbor shares the query's bucket parity
    for r in got:
        assert r.neighbor_id % 2 == r.query_id % 2


def test_new_ops_registered(ctx):
    assert ctx.operation_registry.resolve("table.dedup.ngram_spans") is not None
    assert ctx.operation_registry.resolve("table.dedup.clip_spans") is not None
    assert ctx.operation_registry.resolve("embedding.pq_encode") is not None
    assert ctx.operation_registry.resolve("embedding.pq_topk") is not None
