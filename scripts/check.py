#!/usr/bin/env python3
"""Local dev harness: replicate the driver's DuckDB-oracle compare.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]

For each query: load the Spark-written parquet from <verifyOutDir>/<name>,
run the oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the
sfDir parquet files registered as views, then compare after sorting columns
by name and rows by all values (mirrors 'sorts columns by name before
hashing values').
"""
import atexit, json, re, shutil, sys, glob, os, tempfile
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    # Optional resource caps for PARALLEL gate lanes at the big
    # fixtures: an uncapped DuckDB defaults to ~80% of RAM per
    # PROCESS, so four concurrent 100x oracles OOM the box instead of
    # spilling. Capped, each lane spills to temp and completes.
    if os.environ.get("GRAFT_DUCKDB_MEM"):
        mem = os.environ["GRAFT_DUCKDB_MEM"].strip()
        # validate before interpolating into SET (r14 ADVICE): a value
        # with a quote would break the statement opaquely
        if not re.fullmatch(r"[0-9]+(\.[0-9]+)?\s*[KMGT]i?B", mem):
            sys.exit(f"GRAFT_DUCKDB_MEM must look like '24GB', got: {mem!r}")
        con.execute(f"SET memory_limit='{mem}'")
        spill = tempfile.mkdtemp(prefix="duckspill_")
        atexit.register(shutil.rmtree, spill, ignore_errors=True)
        con.execute(f"SET temp_directory='{spill}'")
    if os.environ.get("GRAFT_DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['GRAFT_DUCKDB_THREADS'])}")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pq = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not pq:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = canon(pd.concat([pd.read_parquet(p) for p in sorted(pq)]))
        try:
            exp = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); n_fail += 1; continue
        # exact value compare (the driver hashes, so no tolerance)
        mism = []
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                eq = ((a.astype(object).where(a.notna(), None) ==
                       b.astype(object).where(b.notna(), None)) |
                      (a.isna() & b.isna()))  # NULL == NULL for this compare
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mism.append(f"{c}[{i}]: {a.iloc[i]!r} vs {b.iloc[i]!r}")
        if mism:
            print(f"FAIL {name}: " + "; ".join(mism[:4])); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
