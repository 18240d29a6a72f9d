"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf, compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by all
columns as strings, doubles rounded to 9 significant-ish decimals only for
display — the hash uses exact repr so any real drift fails).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
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


def canon(rows, columns):
    """Order-insensitive canonical form: sort columns by name, then rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                vals.append(repr(round(v, 9)))
            elif isinstance(v, bool):
                vals.append(str(bool(v)))
            else:
                vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return hashlib.sha256("\x02".join(out).encode()).hexdigest(), len(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from kiara_spark.session import build_spark

    spark = build_spark(app_name="oracle-check")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duck_con(sf_dir)

    n_pass = n_fail = 0
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
            continue
        sh, sn = canon(s_rows, s_cols)
        dh, dn = canon(d_rows, d_cols)
        ok_cols = sorted(s_cols) == sorted(d_cols)
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
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
