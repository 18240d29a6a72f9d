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
        viol = oracle_type_violations(con, oracles[name])
        if viol:
            print(f"FAIL {name}: banned DuckDB result type {viol} "
                  "(exports as decimal128/float64 — CAST it)")
            n_fail += 1
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
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
