"""Pseudo-sf1 scale probe (r2 verdict task 5): union-replicate the sf0.1
fixtures 10x with DISJOINT ids/content and re-run the most expensive
non-streaming queries, recording sf0.1 vs pseudo-sf1 time AND output-row
ratios in BENCH_SCALE.json.

Replication is content-perturbing so the probe measures scaling, not
artifact inflation: ids shift by copy*100M (joins stay within-copy), text
is alphabet-rotated per copy (no cross-copy near-duplicates), embedding
vectors are dimension-rotated per copy (cross-copy cosine decorrelates).
Fixed-cardinality dims (region/nation) stay verbatim; supplier replicates
with shifted keys since r10 so the TPC-H probes' supplier joins stay
within-copy.

A query is flagged when its time ratio exceeds FLAG_RATIO (15x at 10x
data) AND the growth is not explained by output size (time_ratio >
3x rows_ratio) — e.g. geo pairs legitimately grow superlinearly because
replicated points densify the same lat/lon lattice.

Usage: python tools/bench_scale.py [--rebuild]
Writes BENCH_SCALE.json at the repo root; the scaled dataset is cached at
$KIARA_SCALE_DIR (default /tmp/kiara_scale_pseudo_sf1).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

SRC_DIR = "/root/testdata/sf0.1"
REPLICAS = 10
OFF = 100_000_000
FLAG_RATIO = 15.0

PROBE_QUERIES = [
    "graph_2hop_neighbors",
    "graph_pagerank",
    "basket_association_parts",
    "dedup_minhash_pairs",
    "dedup_minhash_clusters",
    "dedup_keep_longest_per_cluster",
    "dedup_simhash",
    "geo_radius_pairs_customers",
    "entity_resolution_parts",
    "kmeans_embeddings",
    "sim_topk_ivf",
    "bloom_prefilter_lineitem",
    # round-3 additions: span dedup (3 linear shuffles) and PQ (map-only
    # encode / code-join retrieval) must hold their shape at 10x
    "text_duplicate_ngram_spans",
    "embedding_pq_codes",
    "sim_topk_ivfpq",
    # round 4: the de-skewed jaccard must stay sub-quadratic at 10x on the
    # replicated (skewed-language) corpus — the whole point of LSH-band
    # blocking over the natural `lang` key
    "dedup_ngram_jaccard_lsh_blocked",
    # round 4: paragraph dedup is explode + one digest aggregate +
    # semi-join + reassembly — must hold near-linear at 10x
    "dedup_paragraphs_boilerplate",
    # round 6: the broadcast-parallelized semantic dedup, the banded dHash
    # image dedup, alternating HITS, hash-walk corpus, and DSIR weights
    # must all keep their banded/broadcast shapes at 10x
    "dedup_semantic_semdedup",
    "multimodal_image_neardup_pairs",
    "graph_hits_hubs_authorities",
    "graph_random_walks",
    "sample_dsir_documents",
    # round-6 continuation: the heaviest new plans must hold shape at 10x —
    # wedge-join butterflies (O(wedges)), the single-shuffle funnel fold,
    # PMI's pruned pair join, TextRank's positional join + pagerank,
    # skip-gram's windowed self-join, triples' pruned enumeration, and
    # PCA's long-form covariance (d² cells, map-side combined)
    "graph_bipartite_butterflies",
    "events_funnel_signup_purchase",
    "text_cooccurrence_pmi",
    "text_textrank_keywords",
    "graph_walk_skipgram_pairs",
    "basket_association_triples",
    "embedding_pca_top_component",
    # round 7: the new heaviest plans — NB's token×class scoring join,
    # landmark-tagged BFS, KN's model joins, the BPE replace-fold, the
    # stump's distinct-value grid, and the CEP per-key sequence build —
    # must hold near-linear shape at 10x
    "ml_naive_bayes_lang",
    "graph_landmark_centrality",
    "text_kneser_ney_bigram",
    "text_bpe_encode_stats",
    "ml_regression_stump_lineitem",
    "events_sequence_pattern",
    # round-7 continuation: the recursion (O(log N) rounds), the blocked
    # JW pandas-UDF kernel, triangle-support prune rounds, the wedge-join
    # link scorer, the B-weighted bootstrap aggregate, the per-epoch GMM
    # aggregate, and the pairwise JSD grid must all hold shape at 10x
    "sql_recursive_bom_rollup",
    "dedup_jaro_winkler_pairs",
    "graph_ktruss_suppliers",
    "graph_link_prediction",
    "stats_bootstrap_ci_mean",
    "ml_gmm_em_totalprice",
    "text_js_divergence_langs",
    # round 8: the single-Gram-aggregate CV (two scans regardless of k)
    # and the fold-broadcast scoring join must hold linear shape at 10x;
    # the range-partitioned skyline prefix-min (r7 verdict item 4) must
    # show no single-partition serialization as distinct-x grows 10x
    "ml_kfold_cv_ols_lineitem",
    "skyline_cheap_small_parts",
    # round 8b: the rank/grid statistics must hold their range-partitioned
    # prefix shape at 10x (near-unique value grids are where the old
    # single-window plan serialized); the bigram GT table and the
    # (doc,word) burstiness rollup must stay linear
    "stats_mann_whitney_orders",
    "stats_spearman_lineitem",
    "stats_kendall_tau_lineitem",
    "text_good_turing_bigrams",
    "text_term_burstiness",
    "text_heaps_law_by_lang",
    # round-8b continuation: the quantile-normalize merge scan must stay
    # O((gt+gr) log) at 10x grids (the inequality-join shape it replaced
    # was quadratic)
    "ml_quantile_normalize_orders",
    # round 9: Sen's slope now takes the exact lower median on the
    # DISTINCT-slope grid via range-partitioned prefix counts (no
    # unpartitioned row_number window); the day-bucket grid is bounded by
    # the calendar horizon, so 10x rows must NOT grow the pair join —
    # expect a near-1x ratio, and any blow-up means the bucket envelope
    # guard regressed
    "events_mann_kendall_trend",
    # round 10 (r9 verdict item 6): TPC-H joins the probe — q8/q12/q21 are
    # the former forced-broadcast class (now size-gated maybe_broadcast:
    # at pseudo-sf1 the slices still hint-broadcast, far past the cap AQE
    # takes over), q9/q18 are the heaviest multi-join aggregates.  All
    # five must scale near-linearly; a blow-up here means a broadcast
    # frame outgrew its gate or a join lost its co-located shuffle.
    "q8_market_share",
    "q9_nation_profit",
    "q12_late_shipments",
    "q18_large_volume_customers",
    "q21_waiting_suppliers",
    # round-10 additions: gram-novelty explodes one hash per word 5-gram
    # (the spans-op shape — two aggregates + a co-located gram join) and
    # BH-FDR's family grows with distinct (type, day) buckets — both must
    # hold linear shape at 10x
    "dedup_ngram_novelty",
    "stats_bh_fdr_daily_anomalies",
    # round 11 (r10 verdict item 5): the remaining round-10 bench
    # additions — CUPED is one conditional aggregate + staged 1-row
    # projections (post the r11 codegen fix), script/code detect are
    # map-only regex batteries; all three must stay flat-linear at 10x
    "stats_cuped_events",
    "text_script_detect",
    "text_code_detect",
    # round 11: DiD is one conditional aggregate over a grouped unit
    # frame — must stay flat-linear at 10x like its CUPED sibling; the
    # segmented variant swaps it for one segment-keyed hash aggregate
    "stats_diff_in_diff_events",
    "stats_did_segments_events",
    # round 12: scalar_map_battery joins the probe (r11 verdict item 3 —
    # it was the only bench mover without probe coverage; map-only
    # per-row map construction, must stay flat-linear), and the
    # oracle-backed sketch twins re-probe under their NEW plans (each now
    # computes exact + sketch in ONE aggregate; the exact side dominates
    # — sliding-window distinct state is O(users/window), the 2-hop pair
    # set is sum-of-squared-degrees — so these track their exact
    # siblings' growth, not the sketch's constant state)
    "scalar_map_battery",
    # round 12: power/MDE is one conditional aggregate (the CUPED shape);
    # mSPRT is one day-keyed aggregate + O(days) bounded-grid windows —
    # both must stay flat-linear at 10x
    "stats_power_mde_events",
    "stats_msprt_events",
    "stats_ratio_metric_events",
    "events_sliding_distinct_users_approx",
    "graph_2hop_neighbors_approx",
    "events_hll_daily_rollup",
    "theta_event_type_overlap",
    "agg_percentile_approx",
    "text_bpe_train_merges",
    # round 12b: the word-list scorer is one token split + two array
    # folds, map-only — must stay flat-linear at 10x like its clean_c4
    # sibling
    "quality_toxicity_wordlist",
    # round 12c: conformal = one Gram aggregate + histogram-refinement
    # selection (O(log) rounds) + one coverage aggregate; stratified ATE
    # and isotonic collapse to bounded grids after one keyed aggregate;
    # DBSCAN candidate pairs are eps-cell-bounded (pair count scales with
    # per-cell density, not N^2); Shapley is one user-keyed + one
    # subset-keyed aggregate over a fixed 2^k grid
    "stats_conformal_interval_lineitem",
    "stats_stratified_ate_events",
    "ml_isotonic_calibration_orders",
    "ml_dbscan_customers",
    "events_attribution_shapley",
    # qini: one user-keyed aggregate + bounded decile grid — flat-linear
    "ml_uplift_qini_events",
    # raking: one cell-count aggregate + bounded-grid driver fold
    "weights_rake_orders",
    # Fellegi-Sunter: blocked self-join + 2^k pattern aggregate; pair
    # count grows with block density under replication (10x per-block
    # population -> ~100x pairs, the geo_radius class)
    "linkage_fs_patterns_parts",
    # TOST + IV-Wald: single conditional exact-decimal aggregates (the
    # welch/CCC shape) — flat-linear
    "stats_tost_equivalence_orders",
    "stats_iv_wald_events",
]

# r10 verdict item 5: distinguish "the fixture got denser" from "the plan
# is super-linear".  Replication perturbs text and embeddings so copies
# don't near-duplicate each other, but some fixtures densify anyway —
# identical geo coordinates replicate into co-located lattices (each
# sf0.1 near-pair becomes up to REPLICAS² cross-copy pairs), and
# fixed-size candidate buckets gain REPLICAS× population.  For queries
# listed here the probe emits the expected super-linear component with
# the result row, so a reviewer reads the ratio against the documented
# envelope instead of a bare linear expectation.
EXPECTED_GROWTH = {
    "geo_radius_pairs_customers":
        "lat/lon are NOT perturbed by replication, so every copy lands on "
        "the same coordinate lattice: each sf0.1 near-pair becomes up to "
        "REPLICAS^2 cross-copy pairs (rows_ratio ~100x at 10x).  The plan "
        "(grid-cell bucket join) is linear in candidate pairs — judge "
        "time_ratio against rows_ratio, not against 10x.",
    "dedup_ngram_jaccard_lsh_blocked":
        "near-dup density: the fixture's built-in near-duplicate families "
        "replicate per copy and band buckets gain 10x population, so "
        "LSH candidate pairs grow faster than rows where bucket keys "
        "collide across copies; the banded plan is linear in candidates.",
    "dedup_keep_longest_per_cluster":
        "cluster population: replication multiplies each minhash cluster's "
        "membership, so the per-cluster max-length resolution processes "
        "denser clusters than a naturally-grown corpus would have.",
    "stats_bootstrap_ci_mean":
        "B=100 Poisson resamples by construction: the single aggregate "
        "folds 100 weighted copies of every row, so absolute time is "
        "B-dominated and the 10x ratio reflects the resample constant, "
        "not a shuffle shape.",
    "ml_dbscan_customers":
        "density clustering on a FIXED-volume point cloud: 10x points in "
        "the same 25 boxes is 10x per-cell density, so eps-neighbor pairs "
        "and core-core edges grow ~100x by the definition of density — "
        "intrinsic to DBSCAN, not a plan defect; the grid join is linear "
        "in candidate pairs (judge time_ratio against rows-of-pairs, "
        "and note a naturally-grown corpus spreads over more volume).",
    "linkage_fs_patterns_parts":
        "block density: p_size has a fixed 50-value domain, so 10x parts "
        "is 10x per-block population and ~100x candidate pairs by "
        "construction; the blocked self-join is linear in pairs (a real "
        "catalog would block on a key whose cardinality grows with the "
        "data).",
}

EXCLUDED = {
    "sim_recall_truncated_dims":
        "brute-force eval harness by definition (full-dim AND prefix exact "
        "top-k over the whole corpus for a sampled query set): at 10x data "
        "the pair count is 100x by construction, like the other "
        "cosine_topk_bruteforce evals — the probe would re-measure the "
        "definition, not a scaling property.",
    "dedup_semantic_semdedup":
        "the demo config pins k=4, so at 10x data each kmeans cluster is "
        "10x larger and the within-cluster cosine check is ~100x pairs by "
        "construction; the operator's scale contract is k growing with "
        "the corpus (documented on semantic_dedup), which a fixed-k probe "
        "cannot exercise.",
}

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _rot_text(name: str, i: int):
    """Keyed alphabet permutation per copy (r12: was a 26-rotation, which
    repeats at copy 26 — the 100x curve probe needs any replica count):
    every word changes deterministically per copy, so copies are not
    near-duplicates of each other (shingle/minhash sees fresh content)."""
    if i == 0:
        return F.col(name)
    import random

    perm = "".join(random.Random(i).sample(_ALPHA, len(_ALPHA)))
    return F.translate(F.col(name), _ALPHA, perm)


def _rot_vec(name: str, i: int):
    """Orthogonal sign-flip per copy (r12: was a dimension rotation, which
    repeats at copy = dim and breaks past it — dim is 64, the 100x curve
    probe replicates 100x): multiplying every vector in a copy by the same
    deterministic diagonal ±1 matrix preserves norms and ALL within-copy
    inner products exactly while decorrelating cross-copy cosine."""
    if i == 0:
        return F.col(name)
    import random

    signs = [random.Random(i * 1000003 + j).choice((1.0, -1.0))
             for j in range(256)]
    arr = "array(" + ",".join(f"{s}" for s in signs) + ")"
    return F.expr(
        f"zip_with({name}, slice({arr}, 1, size({name})), (x, s) -> x * s)")


def build_scaled(spark, dst: str, src: str = SRC_DIR,
                 replicas: int = REPLICAS) -> None:
    from kiara_spark.io import load_table

    os.makedirs(dst, exist_ok=True)
    shifts = {
        "customer": ["c_custkey"],
        "part": ["p_partkey"],
        # r10: supplier replicates too (shifted like the other fact-side
        # keys) so s_suppkey joins match lineitem's shifted l_suppkey in
        # every copy — required by the TPC-H probes (q8/q9/q21 join
        # supplier); no pre-r10 probe query reads the supplier table, so
        # prior ratios are unaffected.  Only region/nation stay verbatim.
        "supplier": ["s_suppkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    perturb = {
        "documents": ("text", _rot_text),
        "part": ("p_name", _rot_text),
        "embeddings": ("embedding", _rot_vec),
    }
    for name in ("region", "nation", *shifts):
        out = os.path.join(dst, f"{name}.parquet")
        if os.path.exists(out):
            continue
        base = load_table(spark, src, name, parallelize=False)
        if name not in shifts:
            base.write.mode("overwrite").parquet(out)
            continue
        copies = []
        for i in range(replicas):
            c = base
            for key in shifts[name]:
                c = c.withColumn(key, F.col(key) + F.lit(i * OFF))
            if name in perturb:
                col, fn = perturb[name]
                c = c.withColumn(col, fn(col, i))
            copies.append(c)
        allc = copies[0]
        for c in copies[1:]:
            allc = allc.unionByName(c)
        allc.write.mode("overwrite").parquet(out)
        print(f"built {name}: {replicas}x", flush=True)


def main() -> int:
    from kiara_spark.queries import QUERIES
    from kiara_spark.session import build_spark

    dst = os.environ.get("KIARA_SCALE_DIR", "/tmp/kiara_scale_pseudo_sf1")
    spark = build_spark(app_name="kiara-spark-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv:
        import shutil

        shutil.rmtree(dst, ignore_errors=True)
    build_scaled(spark, dst)

    import gc

    def run(name: str, sf_dir: str) -> tuple[float, int]:
        # r12: time construction + a noop-sink write, not count() —
        # count() lets Catalyst prune a map-only projection down to a bare
        # parquet count, so the probe's map-only entries (script/code
        # detect, scalar batteries, the wordlist scorer) measured the
        # scan, not the operator; construction stays inside the timer
        # because iterative operators (CC, kmeans, pagerank) run eager
        # actions while building the frame.  The noop sink materializes
        # every output column; ratios stay comparable (both points use the
        # same action).  Rows are counted untimed afterwards.
        t0 = time.monotonic()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        n = df.count()
        gc.collect()
        return dt, n

    results: dict[str, dict] = {}
    for name in PROBE_QUERIES:
        # r12: one UNTIMED warm-up at sf0.1 first — the first execution
        # of a plan pays its Janino codegen compile, which otherwise
        # lands entirely on the small point and deflates the ratio
        # (generated code depends on plan shape, not data, so the small
        # run warms the big run's classes too).
        run(name, SRC_DIR)
        t_small, n_small = run(name, SRC_DIR)
        t_big, n_big = run(name, dst)
        time_ratio = round(t_big / t_small, 2) if t_small > 0 else None
        rows_ratio = round(n_big / n_small, 2) if n_small else None
        flagged = bool(
            time_ratio and time_ratio > FLAG_RATIO
            and (not rows_ratio or time_ratio > 3 * rows_ratio))
        results[name] = {
            "sf01_sec": round(t_small, 3), "sf1_sec": round(t_big, 3),
            "time_ratio": time_ratio,
            "sf01_rows": n_small, "sf1_rows": n_big,
            "rows_ratio": rows_ratio, "flagged": flagged,
        }
        if name in EXPECTED_GROWTH:
            results[name]["expected_growth"] = EXPECTED_GROWTH[name]
        print(f"{name}: {t_small:.2f}s -> {t_big:.2f}s "
              f"({time_ratio}x time, {rows_ratio}x rows)"
              f"{'  ** FLAGGED' if flagged else ''}", flush=True)

    out = {
        "replicas": REPLICAS,
        "src": SRC_DIR,
        "flag_ratio": FLAG_RATIO,
        "queries": results,
        "excluded": EXCLUDED,
        "n_flagged": sum(1 for r in results.values() if r["flagged"]),
    }
    path = Path(__file__).resolve().parent.parent / "BENCH_SCALE.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({"metric": "scale_probe_flagged",
                      "value": out["n_flagged"],
                      "detail": "BENCH_SCALE.json"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
