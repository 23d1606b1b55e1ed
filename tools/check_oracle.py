#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read the parquet results
written by graft.Verify, run each oracle SQL in DuckDB over the same fixture
tables, and compare schemas + values. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

def load_result(path):
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        return None
    return pd.read_parquet(path)

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        got = load_result(f"{out_dir}/{name}")
        if got is None:
            print(f"FAIL {name}: no spark result written"); n_fail += 1; continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        got, want = canon(got), canon(want)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                if str(a.dtype) != str(b.dtype):
                    # surface dtype drift but compare values anyway
                    print(f"  note {name}.{c}: dtype {a.dtype} vs {b.dtype}")
                if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                    import numpy as np
                    af, bf = a.astype(float).values, b.astype(float).values
                    eq = (af == bf) | (pd.isna(af) & pd.isna(bf))
                else:
                    eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
                if not eq.all():
                    i = int((~eq).argmax())
                    mismatch = f"col {c} row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}"
                    break
            except Exception as e:
                mismatch = f"col {c}: compare error {e}"
                break
        if mismatch:
            print(f"FAIL {name}: {mismatch}"); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
