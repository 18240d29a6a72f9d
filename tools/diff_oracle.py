"""Row-level diff between a Spark query and its DuckDB oracle.

Usage: python tools/diff_oracle.py <query_name> [sf_dir]
Prints the first differing canonical rows side by side.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_oracle import duck_con  # noqa: E402


def canon_rows(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            vals.append(repr(round(v, 9)) if isinstance(v, float) else str(v))
        out.append(tuple(vals))
    out.sort()
    return cols, out


def main():
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from kiara_spark.session import build_spark

    spark = build_spark(app_name="oracle-diff")
    fn = entrymod.queries()[name]
    sdf = fn(spark, sf_dir)
    s_cols, s_rows = canon_rows([tuple(r) for r in sdf.collect()], sdf.columns)

    con = duck_con(sf_dir)
    cur = con.execute(entrymod.oracle_sql()[name])
    d_cols, d_rows = canon_rows(cur.fetchall(), [d[0] for d in cur.description])

    print("cols:", s_cols)
    if s_cols != d_cols:
        print("COL MISMATCH duck:", d_cols)
    shown = 0
    for i in range(max(len(s_rows), len(d_rows))):
        s = s_rows[i] if i < len(s_rows) else None
        d = d_rows[i] if i < len(d_rows) else None
        if s != d:
            print(f"row {i}:\n  spark={s}\n  duck ={d}")
            shown += 1
            if shown >= 6:
                break
    if not shown:
        print(f"identical ({len(s_rows)} rows)")


if __name__ == "__main__":
    main()
