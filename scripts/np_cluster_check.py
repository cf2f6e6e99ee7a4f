#!/usr/bin/env python3
"""Independent NUMPY oracle for the embedding-graph queries whose DuckDB
oracles (recursive-CTE CC over all-pairs / LSH-bucket candidates) exceed
any reasonable budget at the 30x fixture: q78_semantic_clusters,
q81_semantic_lsh, q88_cluster_reps.

Same math as engine + DuckDB oracle, with exactness argued per step:
 - quantization round(float(x) * 10000) -> int64 (identical);
 - COSINE dots via float64 BLAS matmul — EXACT: every product
   |qi*qj| <= 1e8 and every partial sum <= 64 * 1e8 = 6.4e9 < 2^53, so
   float64 accumulation is exact integer arithmetic in any order;
 - cosine = double(dot) / sqrt(double(n2a) * double(n2b)), the engine's
   cosExpr operation order;
 - LSH BUCKET dots in int64 (NOT float64: |w| < 2^31 so partial sums
   reach ~1.4e18 > 2^53); weights w(p,d) = h32(f"{p}:{d}") - 2^31 with
   h32 = first 4 md5 bytes (H32Helper), bucket bit p set iff dot > 0,
   table id folded into the key as (t << 32) | bucket;
 - q88 scoring dot(x, sum(members)) exact in float64: |x_i * S_i| <=
   1e4 * 2e8 = 2e12, 64-term sums <= 1.28e14 < 2^53;
 - components via union-find with min-id labels over edge endpoints
   only (singletons excluded), the engine contract.

Usage: python3 scripts/np_cluster_check.py <sfDir> <verifyOutDir> [query ...]
Defaults to all three queries. PASS/FAIL per query; exit 1 on any FAIL.
"""
import glob, hashlib, sys
import numpy as np
import pandas as pd

TH = 0.5        # q78/q81 pair threshold
TH_Q88 = 0.4    # q88 shares the 0.4 pair tier (SparkEntry registration)
TABLES, PLANES = 4, 4


def h32(s: str) -> int:
    d = hashlib.md5(s.encode("utf-8")).digest()
    return (d[0] << 24) | (d[1] << 16) | (d[2] << 8) | d[3]


def load(sf):
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    qv = np.stack([np.round(np.asarray(v, dtype=np.float64) * 10000)
                   for v in emb["embedding"]])
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    n2 = (qv * qv).sum(axis=1)
    keep = n2 > 0
    qv, ids, n2 = qv[keep], ids[keep], n2[keep]
    order = np.argsort(ids)
    return qv[order], ids[order], n2[order]


class UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        p = self.p
        r = x
        while p[r] != r:
            r = p[r]
        while p[x] != r:
            p[x], x = r, p[x]
        return r

    def union(self, a, b):
        for v in (a, b):
            if v not in self.p:
                self.p[v] = v
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)

    def comps(self):
        out = {}
        for v in self.p:
            out.setdefault(self.find(v), []).append(v)
        return out


def exact_edges_union(qv, ids, n2, uf, th=TH):
    """All-pairs cosine >= th -> union-find (blocked, exact)."""
    n = len(ids)
    B = 2048
    edges = 0
    for i0 in range(0, n, B):
        i1 = min(i0 + B, n)
        cos = (qv[i0:i1] @ qv.T) / np.sqrt(n2[i0:i1, None] * n2[None, :])
        ii, jj = np.nonzero(cos >= th)
        gi = ii + i0
        m = gi < jj
        for a, b in zip(ids[gi[m]], ids[jj[m]]):
            uf.union(int(a), int(b))
        edges += int(m.sum())
    return edges


def spark_dump(out, name):
    pq = sorted(glob.glob(f"{out}/{name}/*.parquet"))
    return pd.concat([pd.read_parquet(p) for p in pq]).reset_index(drop=True)


def compare(got, expect, name):
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    expect = expect[list(got.columns)].sort_values(list(got.columns)) \
        .reset_index(drop=True)
    ok = len(got) == len(expect) and all(
        (got[c].to_numpy() == expect[c].to_numpy()).all() for c in got.columns)
    print(("PASS" if ok else "FAIL") +
          f" {name} ({len(got)} rows, numpy oracle)")
    return ok


def check_q78(sf, out):
    qv, ids, n2 = load(sf)
    uf = UF()
    edges = exact_edges_union(qv, ids, n2, uf)
    print(f"  q78: {len(ids)} vecs, {edges} edges", flush=True)
    rows = sorted((c, len(vs), max(vs)) for c, vs in uf.comps().items())
    expect = pd.DataFrame(rows, columns=["component", "n_vecs", "max_vec"])
    return compare(spark_dump(out, "q78_semantic_clusters"), expect,
                   "q78_semantic_clusters")


def check_q81(sf, out):
    qv, ids, n2 = load(sf)
    dims = qv.shape[1]
    w = np.array([[h32(f"{p}:{d}") - 2147483648 for d in range(dims)]
                  for p in range(TABLES * PLANES)], dtype=np.int64)
    # int64 bucket dots (exactness: see header)
    dots = qv.astype(np.int64) @ w.T            # (n, 16)
    uf = UF()
    pairs = 0
    for t in range(TABLES):
        bits = (dots[:, t * PLANES:(t + 1) * PLANES] > 0).astype(np.int64)
        bucket = bits @ (1 << np.arange(PLANES, dtype=np.int64))
        for bk in np.unique(bucket):
            mem = np.nonzero(bucket == bk)[0]
            if len(mem) < 2:
                continue
            sub = qv[mem]
            cos = (sub @ sub.T) / np.sqrt(n2[mem, None] * n2[None, mem])
            ii, jj = np.nonzero(cos >= TH)
            m = ii < jj
            for a, b in zip(ids[mem[ii[m]]], ids[mem[jj[m]]]):
                uf.union(int(a), int(b))
            pairs += int(m.sum())
    print(f"  q81: {pairs} verified in-bucket pairs (pre-dedup)", flush=True)
    rows = sorted((c, len(vs), max(vs)) for c, vs in uf.comps().items())
    expect = pd.DataFrame(rows, columns=["component", "n_vecs", "max_vec"])
    return compare(spark_dump(out, "q81_semantic_lsh"), expect,
                   "q81_semantic_lsh")


def check_q88(sf, out):
    qv, ids, n2 = load(sf)
    uf = UF()
    exact_edges_union(qv, ids, n2, uf, th=TH_Q88)
    idx = {int(v): i for i, v in enumerate(ids)}
    rows = []
    for comp, vs in uf.comps().items():
        mem = np.array([idx[v] for v in vs])
        centroid = qv[mem].sum(axis=0)          # int sums <= 2e8 per dim
        dot = qv[mem] @ centroid                # exact (see header)
        vid = ids[mem]
        best = np.lexsort((vid, -dot))[0]       # dot desc, v asc
        rows.append((comp, len(vs), int(vid[best]), int(dot[best])))
    expect = pd.DataFrame(sorted(rows),
                          columns=["component", "n_vecs", "rep_vec", "rep_dot"])
    return compare(spark_dump(out, "q88_cluster_reps"), expect,
                   "q88_cluster_reps")


def calibrate_vs_duckdb(sf, out, which):
    """The STANDING calibration gate (r13 verdict item 6): wherever the
    DuckDB oracle CAN run (the small fixtures), assert numpy == DuckDB
    directly — a third-party tiebreak so a drift in either oracle is
    loud. The numpy checks above asserted spark == numpy; duckdb ==
    spark closes the triangle. Oracle SQL comes from the Verify dump's
    oracle_sql.json — the exact text the driver gates with."""
    import json
    import duckdb
    names = {"q78": "q78_semantic_clusters", "q81": "q81_semantic_lsh",
             "q88": "q88_cluster_reps"}
    with open(f"{out}/oracle_sql.json") as f:
        oracle = json.load(f)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    ok = True
    for q in which:
        name = names[q]
        if name not in oracle:
            continue
        duck = con.execute(oracle[name]).df()
        duck = duck[sorted(duck.columns)]
        duck = duck.sort_values(list(duck.columns)).reset_index(drop=True)
        spark = spark_dump(out, name)
        spark = spark[sorted(spark.columns)]
        spark = spark.sort_values(list(spark.columns)).reset_index(drop=True)
        same = (len(duck) == len(spark) and
                all(int(a) == int(b)
                    for ca, cb in zip(duck.columns, spark.columns)
                    for a, b in zip(duck[ca], spark[cb])))
        print(("CAL-PASS" if same else "CAL-FAIL") +
              f" {name}: duckdb {'==' if same else '!='} spark(==numpy)")
        ok = ok and same
    return ok


def main():
    argv = [a for a in sys.argv[1:] if a != "--calibrate"]
    calibrate = "--calibrate" in sys.argv
    sf, out = argv[0], argv[1]
    which = argv[2:] or ["q78", "q81", "q88"]
    ok = True
    for q in which:
        ok &= {"q78": check_q78, "q81": check_q81, "q88": check_q88}[q](sf, out)
    if calibrate:
        ok &= calibrate_vs_duckdb(sf, out, which)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
