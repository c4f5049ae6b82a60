#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify output
against DuckDB oracles over the same parquet tables. Dev tool only — the
engine itself has no Python.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--jobs N]

--jobs N runs the per-query checks in N worker processes (each worker opens
its own DuckDB connection with a bounded thread count) — the sf0.1 sweep's
handful of quadratic pair oracles dominate wall-clock and parallelize well.
"""
import duckdb, sys, json, glob, os
import pandas as pd


def check_one(args):
    sfdir, outdir, name, sql, threads = args
    con = duckdb.connect()
    if threads:
        con.sql(f"SET threads TO {threads}")
    for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
        t = os.path.basename(p).replace(".parquet", "")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    res_dir = f"{outdir}/{name}"
    if not os.path.isdir(res_dir):
        return (name, False, "no spark result dir")
    try:
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
    except Exception as e:
        return (name, False, f"cannot read result: {e}")
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        return (name, False, f"oracle sql error: {e}")
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        return (name, False, f"columns {list(got.columns)} vs {list(exp.columns)}")
    if len(got) != len(exp):
        return (name, False, f"rows {len(got)} vs {len(exp)}")

    # Driver parity: the driver's comparator sorts raw frames and CRASHES on
    # nested (array/struct/map) cells — this gate used to JSON-encode them,
    # which let q_embed_bulk_inference pass locally while failing the driver
    # (round-6 verdict #1). Fail loudly on nested cells instead.
    import numpy as np
    for c in got.columns:
        if got[c].dtype == object:
            head = got[c].dropna().head(1)
            if len(head) and isinstance(head.iloc[0], (np.ndarray, list, dict)):
                return (name, False,
                        f"nested cell in column '{c}' ({type(head.iloc[0]).__name__}) — "
                        "the driver comparator crashes on these; unnest to scalar rows")

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
        return (name, True, f"{len(got)} rows")
    detail = f"ordered_eq={ordered_eq} sorted_eq={sorted_eq}"
    try:
        diff = gs.compare(es) if gs.shape == es.shape else None
        if diff is not None and not diff.empty:
            detail += "\n" + str(diff.head(10))
        else:
            detail += "\n  got: " + str(g.head(5).to_dict("records"))
            detail += "\n  exp: " + str(e.head(5).to_dict("records"))
    except Exception:
        pass
    return (name, False, detail)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    jobs = 1
    if "--jobs" in sys.argv:
        jobs = int(sys.argv[sys.argv.index("--jobs") + 1])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(oracle)
    threads = 0 if jobs == 1 else max(2, (os.cpu_count() or 8) // jobs)
    work = [(sfdir, outdir, n, oracle[n], threads) for n in names]
    n_pass = n_fail = 0
    if jobs == 1:
        results = map(check_one, work)
        for name, ok, detail in results:
            print(f"{'PASS' if ok else 'FAIL'} {name}{': ' if not ok else ' ('}{detail}{'' if not ok else ')'}",
                  flush=True)
            n_pass += ok
            n_fail += not ok
    else:
        import multiprocessing as mp
        with mp.Pool(jobs) as pool:
            for name, ok, detail in pool.imap_unordered(check_one, work):
                print(f"{'PASS' if ok else 'FAIL'} {name}{': ' if not ok else ' ('}{detail}{'' if not ok else ')'}",
                      flush=True)
                n_pass += ok
                n_fail += not ok
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
