#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate: for each
query result parquet written by graft.Verify, run the corresponding
oracle SQL in DuckDB over the same sf dir and hash-compare (columns
sorted by name, rows sorted). Usage:
    python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, os, json, math
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = f"{v:.6g}"
            vals.append(str(v))
        out.append("|".join(vals))
    out.sort()
    return out

fails = 0
for name in sorted(oracle):
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no result parquet"); fails += 1; continue
    try:
        got = con.execute(f"SELECT * FROM '{res_dir}/*.parquet'")
        gcols = [d[0] for d in got.description]; grows = got.fetchall()
        exp = con.execute(oracle[name])
        ecols = [d[0] for d in exp.description]; erows = exp.fetchall()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    if sorted(gcols) != sorted(ecols):
        print(f"FAIL {name}: cols spark={sorted(gcols)} oracle={sorted(ecols)}"); fails += 1; continue
    g, e = canon(grows, gcols), canon(erows, ecols)
    if g == e:
        print(f"OK   {name}: {len(g)} rows")
    else:
        fails += 1
        diff_g = [x for x in g if x not in set(e)][:3]
        diff_e = [x for x in e if x not in set(g)][:3]
        print(f"FAIL {name}: {len(g)} vs {len(e)} rows; spark-only={diff_g} oracle-only={diff_e}")
print(f"\n{fails} failures / {len(oracle)} queries")
sys.exit(1 if fails else 0)
