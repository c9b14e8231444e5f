#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle on the same sf dir. Dev-only tool (the
real gate is driver-side); not part of the shipped library.

Strictness matches the driver: both sides go through a pandas round-trip
(DuckDB .df()), and values are compared as RAW strings — no rounding.
This is what catches type-formatting divergence the values themselves
don't show: DuckDB types a bare integer SUM as HUGEINT, pandas renders
HUGEINT as float64, and "26143.0" != "26143" even though the numbers are
equal (the r1 gate reds). Round-1's round-to-6dp canonicalization hid
exactly that, so it shipped locally-green and failed driver-side.

The one normalization kept is negative zero: -0.0 == 0.0 is a genuine
IEEE identity, and f-string formatting would otherwise emit "-0.0" vs
"0.0" for bit-different-but-equal zeros.

Usage: python3 tools/check.py <outDir> <sfDir>
"""
import json
import sys

import duckdb


def canon(df):
    """Sort columns by name, stringify raw pandas values, sort rows.

    Per-column .tolist(), NOT iterrows(): iterrows upcasts each row to a
    common dtype, so an all-numeric frame with int64 + float64 columns
    would stringify ints as "3.0" on BOTH sides and mask exactly the
    HUGEINT->float64 divergence this tool exists to catch.
    """
    cols = sorted(df.columns)
    col_vals = [df[c].tolist() for c in cols]
    out = []
    for i in range(len(df)):
        vals = []
        for cv in col_vals:
            v = cv[i]
            if isinstance(v, float) and v == 0:
                v = 0.0  # normalize -0.0: equal under IEEE, differs as text
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
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_bad += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: cols spark={sorted(got.columns)} oracle={sorted(exp.columns)}")
            n_bad += 1
            continue
        cg, ce = canon(got), canon(exp)
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
