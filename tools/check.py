#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle on the same sf dir. Dev-only tool (the
real gate is driver-side); not part of the shipped library.

Usage: python3 tools/check.py <outDir> <sfDir>
"""
import json
import sys

import duckdb


def canon(rows, cols):
    """Sort columns by name, round floats, stringify — order-insensitive."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = f"{round(v, 6):.6f}"
            vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return out


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            g_cols, g_rows = got.columns, got.fetchall()
            exp = con.sql(sql)
            e_cols, e_rows = exp.columns, exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if sorted(g_cols) != sorted(e_cols):
            print(f"FAIL {name}: cols spark={sorted(g_cols)} oracle={sorted(e_cols)}")
            n_bad += 1
            continue
        cg, ce = canon(g_rows, g_cols), canon(e_rows, e_cols)
        if cg == ce:
            print(f"ok   {name} ({len(cg)} rows)")
            n_ok += 1
        else:
            n_bad += 1
            diff = [(a, b) for a, b in zip(cg, ce) if a != b][:3]
            print(f"FAIL {name}: {len(cg)} vs {len(ce)} rows; first diffs:")
            for a, b in diff:
                print(f"   spark : {a}\n   oracle: {b}")
    print(f"== {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
