#!/usr/bin/env python3
"""Per-query bench regression gate (r3 VERDICT item 2).

Compares the fresh ``BENCH_DETAIL.json`` in the working tree against the
last COMMITTED version (``git show HEAD:BENCH_DETAIL.json``) and fails when
any query regressed beyond ``--ratio`` (default 1.5x) AND by more than
``--min-delta`` seconds (default 1.0s — sub-second queries are scheduling
noise at local[32]; a 0.1s -> 0.2s blip is not a regression signal).

Usage:
    python bench.py                      # writes BENCH_DETAIL.json
    python tools/bench_regression.py     # gate vs last committed detail
    git add BENCH_DETAIL.json            # commit the new detail at round close

Exit codes: 0 ok / 1 regressions found / 2 no baseline in git yet.
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _queries(doc: dict) -> dict[str, float]:
    out = dict(doc.get("queries", {}))
    out.update(doc.get("streaming_extra_queries", {}))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--min-delta", type=float, default=1.0)
    args = ap.parse_args()

    cur_path = REPO / "BENCH_DETAIL.json"
    if not cur_path.exists():
        print("BENCH_DETAIL.json missing — run `python bench.py` first")
        return 2
    cur = _queries(json.loads(cur_path.read_text()))

    proc = subprocess.run(
        ["git", "-C", str(REPO), "show", "HEAD:BENCH_DETAIL.json"],
        capture_output=True, text=True)
    if proc.returncode != 0:
        print("no committed BENCH_DETAIL.json baseline yet "
              "(commit one to arm the gate)")
        return 2
    base = _queries(json.loads(proc.stdout))

    regressions, improved, new = [], 0, 0
    for name, t in sorted(cur.items()):
        b = base.get(name)
        if b is None:
            new += 1
            continue
        if t > b * args.ratio and t - b > args.min_delta:
            regressions.append((name, b, t))
        elif t < b / args.ratio and b - t > args.min_delta:
            improved += 1
    for name, b, t in regressions:
        print(f"REGRESSION {name}: {b:.2f}s -> {t:.2f}s "
              f"({t / b:.2f}x, +{t - b:.2f}s)")
    print(f"{len(cur)} queries: {len(regressions)} regressed "
          f"(> {args.ratio}x and > {args.min_delta}s), {improved} improved, "
          f"{new} new, baseline {len(base)}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
