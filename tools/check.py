#!/usr/bin/env python3
"""Dev-loop replica of the driver's t2 correctness gate.

Reads the parquet dumps Verify wrote to OUT_DIR, runs each oracle SQL
from oracle_sql.json in DuckDB over the same fixture tables, canonical-
izes both sides (sort columns by name, round floats to 6dp, timestamps
to 'yyyy-MM-dd HH:mm:ss.SSSSSS' UTC, sort rows), and diffs.

Usage: tools/check.py SF_DIR OUT_DIR [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # fractional seconds included: whole-second formatting hid
            # sub-second mismatches (e.g. s2's microsecond session bounds)
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir) or (only and name not in only):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = canon(pd.concat([pd.read_parquet(f) for f in files]))
        if name not in oracle:
            print(f"SKIP {name}: rows-only ({len(got)} rows)"); continue
        try:
            want = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1; continue
        got2, want2 = got.astype(str), want.astype(str)
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        if not got2.equals(want2):
            neq = (got2 != want2).any(axis=1)
            print(f"FAIL {name}: {neq.sum()} differing rows; first:")
            idx = neq.idxmax()
            print("  spark:", got.iloc[idx].to_dict())
            print("  duck :", want.iloc[idx].to_dict())
            n_fail += 1; continue
        # dtype-level schema sanity (int width / float / object)
        schema_note = ""
        for c in got.columns:
            if str(got[c].dtype) != str(want[c].dtype):
                schema_note += f" [dtype {c}: {got[c].dtype} vs {want[c].dtype}]"
        print(f"PASS {name} ({len(got)} rows){schema_note}")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
