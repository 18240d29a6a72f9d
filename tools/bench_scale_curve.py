"""Three-point scaling CURVE probe (r12): run flagship queries at sf0.1,
pseudo-sf1 (10x) and pseudo-sf10 (100x) and fit the log-log growth
exponent, so "would this plan survive a 100x scale-up?" is answered with
two decades of measured data instead of one ratio.

Reuses bench_scale.build_scaled (content-perturbing replication: keyed
ids, per-copy alphabet permutation for text, orthogonal sign-flip for
embeddings — cross-copy joins/dedup/cosine stay decorrelated at ANY
replica count).  For each query it records t(1x), t(10x), t(100x),
output rows at each point, and two exponents:

  exp_fit     — least-squares slope of log t vs log scale over all three
                points (polluted by the fixed ~0.5-1s Spark overhead at
                the 1x point, reported for completeness);
  exp_10_100  — log10(t100/t10), the honest asymptotic signal: both
                points sit well above fixed overhead, so a shuffle-shaped
                O(N log N)-or-worse plan cannot hide in it.

A query is flagged when exp_10_100 > 1.3 AND time growth outpaces output
growth (t100/t10 > 3 * rows100/rows10) — same output-bound escape hatch
as the 10x probe.  Expect exponents ~1.0 for the linear plans, < 1 for
aggregates with sub-linear output, and documented super-linear growth
only where candidate-pair density is replicated by construction.

Usage: python tools/bench_scale_curve.py [--rebuild]
Writes BENCH_SCALE100.json at the repo root; fixtures cached at
$KIARA_SCALE_DIR (10x, default /tmp/kiara_scale_pseudo_sf1) and
$KIARA_SCALE100_DIR (100x, default /tmp/kiara_scale_pseudo_sf10).
"""

from __future__ import annotations

import gc
import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.bench_scale import SRC_DIR, build_scaled  # noqa: E402

FLAG_EXP = 1.3

# Flagship cross-section: every major plan family that must survive a
# real cluster — multi-join TPC-H aggregates, banded-LSH dedup, explode+
# digest paragraph dedup, IVF-PQ retrieval, iterative kmeans/pagerank,
# one-aggregate experimentation stats, per-key CEP sequences, the pruned
# PMI pair join, and the r12b map-only word-list scorer.
CURVE_QUERIES = [
    "q9_nation_profit",
    "q18_large_volume_customers",
    "dedup_minhash_clusters",
    "dedup_paragraphs_boilerplate",
    "sim_topk_ivfpq",
    "kmeans_embeddings",
    "graph_pagerank",
    "stats_cuped_events",
    "events_sequence_pattern",
    "text_cooccurrence_pmi",
    "quality_toxicity_wordlist",
]

# By-construction super-linear output at replicated density (mirrors
# bench_scale.EXPECTED_GROWTH): judge time against rows, not scale.
EXPECTED_GROWTH = {
    "dedup_minhash_clusters":
        "near-dup cluster density: the fixture's built-in near-duplicate "
        "families replicate per copy, so cluster membership (and the "
        "keep/drop output) grows with replication; the banded plan is "
        "linear in candidate pairs.",
}


def _fit_slope(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    den = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / den


def main() -> int:
    from kiara_spark.queries import QUERIES
    from kiara_spark.session import build_spark

    dst10 = os.environ.get("KIARA_SCALE_DIR", "/tmp/kiara_scale_pseudo_sf1")
    dst100 = os.environ.get("KIARA_SCALE100_DIR",
                            "/tmp/kiara_scale_pseudo_sf10")
    spark = build_spark(app_name="kiara-spark-scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    if "--rebuild" in sys.argv:
        import shutil

        shutil.rmtree(dst10, ignore_errors=True)
        shutil.rmtree(dst100, ignore_errors=True)
    build_scaled(spark, dst10, replicas=10)
    build_scaled(spark, dst100, replicas=100)

    def run(name: str, sf_dir: str) -> tuple[float, int]:
        # time construction + a noop-sink write, not count(): count() lets
        # Catalyst prune a map-only projection down to a bare parquet
        # count, so pure-map operators would measure nothing; construction
        # must stay inside the timer because iterative operators (CC,
        # kmeans, pagerank) run eager actions while building the frame.
        # The noop sink materializes every output column.  Rows are
        # counted untimed afterwards (cached iteratives make it cheap).
        t0 = time.monotonic()
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        n = df.count()
        gc.collect()
        return dt, n

    results: dict[str, dict] = {}
    for name in CURVE_QUERIES:
        # one UNTIMED warm-up at the smallest scale before any timed
        # point: the first execution of a plan pays its Janino codegen
        # compile (~1-20s), which would otherwise land on whichever point
        # ran first and distort the exponent; generated code depends on
        # the plan shape, not the data, so the cheap 1x run warms all
        # three points' classes.
        run(name, SRC_DIR)
        t1, n1 = run(name, SRC_DIR)
        t10, n10 = run(name, dst10)
        t100, n100 = run(name, dst100)
        exp_fit = round(_fit_slope(
            [0.0, 1.0, 2.0],
            [math.log10(t) for t in (t1, t10, t100)]), 3)
        exp_asym = round(math.log10(t100 / t10), 3)
        rows_ratio = round(n100 / n10, 2) if n10 else None
        time_ratio = round(t100 / t10, 2)
        flagged = bool(
            exp_asym > FLAG_EXP
            and (not rows_ratio or time_ratio > 3 * rows_ratio))
        results[name] = {
            "sec": [round(t1, 3), round(t10, 3), round(t100, 3)],
            "rows": [n1, n10, n100],
            "exp_fit": exp_fit, "exp_10_100": exp_asym,
            "t100_over_t10": time_ratio,
            "rows100_over_rows10": rows_ratio,
            "flagged": flagged,
        }
        if name in EXPECTED_GROWTH:
            results[name]["expected_growth"] = EXPECTED_GROWTH[name]
        print(f"{name}: {t1:.2f}s / {t10:.2f}s / {t100:.2f}s  "
              f"exp10-100={exp_asym} rows x{rows_ratio}"
              f"{'  ** FLAGGED' if flagged else ''}", flush=True)

    out = {
        "scales": [1, 10, 100], "src": SRC_DIR, "flag_exp": FLAG_EXP,
        "queries": results,
        "n_flagged": sum(1 for r in results.values() if r["flagged"]),
    }
    path = Path(__file__).resolve().parent.parent / "BENCH_SCALE100.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps({"metric": "scale_curve_flagged",
                      "value": out["n_flagged"],
                      "detail": "BENCH_SCALE100.json"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
