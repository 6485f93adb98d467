#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
output against the DuckDB oracle and diff exactly (sorted columns, sorted
rows, exact value equality — stricter than any hash compare).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    return df.sort_values(by=cols, na_position="first",
                          ignore_index=True, kind="mergesort")

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = canon(con.sql(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df())
        try:
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if got.dtypes.tolist() != exp.dtypes.tolist():
            print(f"WARN {name}: dtypes {got.dtypes.tolist()} vs {exp.dtypes.tolist()}")
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=True)
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")[0:6]
            print(f"FAIL {name}: {' | '.join(msg)}")
            # show first differing cell for debugging
            for c in got.columns:
                neq = ~((got[c] == exp[c]) | (got[c].isna() & exp[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"  first diff col={c} row={i}: got={got[c][i]!r} exp={exp[c][i]!r}")
                    break
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
