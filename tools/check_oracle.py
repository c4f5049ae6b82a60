#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify output
against DuckDB oracles over the same parquet tables. Dev tool only — the
engine itself has no Python.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import duckdb, sys, json, glob, os
import pandas as pd

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        res_dir = f"{outdir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark result dir"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read result: {e}"); n_fail += 1; continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        def canon(df):
            df = df.copy()
            for c in df.columns:
                df[c] = df[c].map(lambda v: json.dumps(v.tolist()) if hasattr(v, "tolist") else v)
            return df
        g, e = canon(got), canon(exp)
        ordered_eq = g.reset_index(drop=True).equals(e.reset_index(drop=True))
        gs = g.sort_values(by=list(g.columns)).reset_index(drop=True)
        es = e.sort_values(by=list(e.columns)).reset_index(drop=True)
        sorted_eq = gs.equals(es)
        if ordered_eq and sorted_eq:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: ordered_eq={ordered_eq} sorted_eq={sorted_eq}")
            diff = gs.compare(es) if gs.shape == es.shape else None
            if diff is not None and not diff.empty:
                print(diff.head(10))
            else:
                print("  got:", g.head(5).to_dict("records"))
                print("  exp:", e.head(5).to_dict("records"))
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
