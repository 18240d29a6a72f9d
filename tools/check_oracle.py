"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf, compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by all
columns as strings, doubles rounded to 9 significant-ish decimals only for
display — the hash uses exact repr so any real drift fails).

Usage: python tools/check_oracle.py [--cap1] [--json PATH] [sf_dir] [query_name ...]

``--cap1`` is the CLUSTER-REGIME sweep: it sets
``KIARA_SPARK_BROADCAST_CAP_BYTES=1`` before any Spark import, so every
size-gated broadcast hint in the repo drops out and AQE picks join
strategies the way it would on a 1000-executor cluster where the "small"
side no longer fits an executor broadcast.  A full-battery ``--cap1`` PASS
is the standing evidence that correctness never depends on a broadcast
hint; run it once per round and record the summary with ``--json``
(see README "cluster-regime sweep").
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _tag(v):
    """Coarse type tag so the hash is TYPE-AWARE like the driver's comparator
    (a DuckDB HUGEINT that exports as decimal/float must not silently equal a
    Spark BIGINT).  Width differences (int32 vs int64) deliberately collapse."""
    import datetime
    import decimal
    if v is None:
        return "n"
    if isinstance(v, bool):
        return "b"
    if isinstance(v, int):
        return "i"
    if isinstance(v, float):
        return "f"
    if isinstance(v, decimal.Decimal):
        return "d"
    if isinstance(v, str):
        return "s"
    if isinstance(v, datetime.datetime):
        return "T"
    if isinstance(v, datetime.date):
        return "D"
    if isinstance(v, (bytes, bytearray)):
        return "y"
    if isinstance(v, (list, tuple)):
        return "l"
    if isinstance(v, dict):
        return "m"
    return "o"


def canon(rows, columns):
    """Order-insensitive canonical form: sort columns by name, then rows.
    Each value is hashed with its coarse type tag (see ``_tag``)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            t = _tag(v)
            if isinstance(v, float):
                vals.append(t + repr(round(v, 9)))
            elif isinstance(v, bool):
                vals.append(t + str(bool(v)))
            else:
                vals.append(t + str(v))
        out.append("\x01".join(vals))
    out.sort()
    return hashlib.sha256("\x02".join(out).encode()).hexdigest(), len(out)


#: DuckDB result types that export as decimal128/float64 through Arrow/pandas
#: and therefore hash-mismatch a Spark BIGINT in the driver's typed compare.
_BANNED_DUCK_TYPES = ("HUGEINT", "UHUGEINT")


def oracle_type_violations(con, sql):
    """DESCRIBE the oracle and return [(column, type)] whose DuckDB result
    type is in ``_BANNED_DUCK_TYPES`` — the q12_late_shipments failure class
    (un-cast integer SUM typing as int128)."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [(r[0], r[1]) for r in rows
            if any(b in str(r[1]).upper() for b in _BANNED_DUCK_TYPES)]


def main():
    import os

    args = sys.argv[1:]
    cap1 = "--cap1" in args
    if cap1:
        args.remove("--cap1")
        # must land before kiara_spark.operators.joins reads it at call time
        os.environ["KIARA_SPARK_BROADCAST_CAP_BYTES"] = "1"
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: check_oracle.py [--cap1] [--json PATH] "
                  "[sf_dir] [query ...]  (--json needs a path)",
                  file=sys.stderr)
            return 2
        json_path = args[i + 1]
        del args[i:i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entrymod
    from kiara_spark.session import build_spark

    spark = build_spark(app_name="oracle-check")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duck_con(sf_dir)

    n_pass = n_fail = 0
    results: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc(limit=4)
            n_fail += 1
            results[name] = "FAIL"
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(s_rows)} rows  ({time.monotonic()-t0:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: DUCKDB ERROR {e}")
            n_fail += 1
            results[name] = "FAIL"
            continue
        sh, sn = canon(s_rows, s_cols)
        dh, dn = canon(d_rows, d_cols)
        ok_cols = sorted(s_cols) == sorted(d_cols)
        viol = oracle_type_violations(con, oracles[name])
        if viol:
            print(f"FAIL {name}: banned DuckDB result type {viol} "
                  "(exports as decimal128/float64 — CAST it)")
            n_fail += 1
            results[name] = "FAIL"
            continue
        status = "PASS" if (sh == dh and ok_cols) else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        detail = ""
        if not ok_cols:
            detail = f" cols spark={sorted(s_cols)} duck={sorted(d_cols)}"
        elif sn != dn:
            detail = f" rows spark={sn} duck={dn}"
        elif sh != dh:
            detail = " value-hash mismatch"
        print(f"{status} {name}: {sn} rows  ({time.monotonic()-t0:.1f}s){detail}")
        results[name] = status
    print(f"\n{n_pass} passed, {n_fail} failed"
          + (" [cluster regime: broadcast cap 1 byte]" if cap1 else ""))
    if json_path:
        import json

        summary = {
            "sf_dir": sf_dir,
            "regime": "broadcast_cap_1_byte" if cap1 else "default",
            "n_pass": n_pass,
            "n_fail": n_fail,
            "failed": sorted(n for n, s in results.items() if s != "PASS"),
        }
        with open(json_path, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"summary -> {json_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
