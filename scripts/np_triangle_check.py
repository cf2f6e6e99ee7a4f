#!/usr/bin/env python3
"""Independent NUMPY oracle for q146_triangle_sample AND
q123_triangles, for the scale fixtures where the DuckDB oracles'
wedge-close joins (hundreds of millions of triangles at 30x) exceed any
reasonable budget — the same precedent as scripts/np_cluster_check.py
for q78/q81/q88. ALWAYS calibrate at sf0.1 against the DuckDB oracle
before using it on a scale fixture.

q123 (exact census, threshold 0.4): per-vertex triangle counts via the
symmetric adjacency A — triangles through v = ((A @ A) * A) row-sum
/ 2, exact by the same float32/float64 bounds as below — histogrammed
over the vertices of the pair list (0-triangle bucket included).

Same math as engine + DuckDB oracle, exactness argued per step:
 - quantization round(float(x) * 10000) -> int64 (identical);
 - cosine dots via float64 BLAS matmul — EXACT: |qi*qj| <= 1e8 and
   64-term sums <= 6.4e9 < 2^53, so float64 accumulation is exact
   integer arithmetic in any order;
 - cosine = double(dot) / sqrt(double(n2a) * double(n2b)) — the same
   operation order np_cluster_check verified against the engine;
 - edge keep-test: first 8 hex chars of md5(f"{a}_{b}") as int,
   % sampleMod == 0 — byte-identical to the engine's
   conv(substr(md5(concat(a,'_',b)),1,8),16,10) and the oracle's
   CAST(concat('0x', ...) AS BIGINT);
 - triangle count: with U the strictly-upper-triangular kept adjacency
   (a < b), triangles = sum((U @ U) * U). Wedge counts per pair are
   <= n < 2^24, exact in float32 sgemm; the masked sum accumulates in
   float64 (each addend <= n, total <= |kept| * n <= ~2^43 < 2^53).

Usage: python3 scripts/np_triangle_check.py <sfDir> <verifyOutDir>
       [q146_triangle_sample] [q123_triangles]
(default: both, each checked only if its spark output dir exists;
 q146 at threshold 0.3 / sampleMod 2, q123 at threshold 0.4 — the
 driver parameters)
PASS/FAIL per query; exit 1 on any FAIL.
"""
import glob, hashlib, sys
import numpy as np
import pandas as pd


def cos_matrix(sf_dir):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb[emb.embedding.notna()]
    ids = emb.vec_id.to_numpy(np.int64)
    q = np.rint(np.stack(emb.embedding.to_numpy()).astype(np.float64)
                * 10000.0).astype(np.int64)
    n2 = (q * q).sum(axis=1)
    keep = n2 > 0
    ids, q, n2 = ids[keep], q[keep], n2[keep]
    order = np.argsort(ids)
    ids, q, n2 = ids[order], q[order], n2[order]
    n = len(ids)

    # exact integer dots in float64, cosine in the verified op order
    dots = q.astype(np.float64) @ q.astype(np.float64).T
    denom = np.sqrt(np.outer(n2.astype(np.float64), n2.astype(np.float64)))
    return ids, dots / denom


def spark_df(out_dir, name):
    pq = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not pq:
        print(f"FAIL {name}: no spark output")
        sys.exit(1)
    return pd.concat([pd.read_parquet(p) for p in sorted(pq)])


def check_q146(ids, cos, out_dir, th=0.3, mod=2):
    n = len(ids)
    iu = np.triu_indices(n, k=1)
    hit = cos[iu] >= th
    ai, bi = iu[0][hit], iu[1][hit]          # index pairs, a < b by id order
    n_edges = int(hit.sum())

    # deterministic md5 keep-test per edge
    kept = np.fromiter(
        (int(hashlib.md5(f"{ids[a]}_{ids[b]}".encode()).hexdigest()[:8], 16)
         % mod == 0 for a, b in zip(ai, bi)),
        dtype=bool, count=n_edges)
    ka, kb = ai[kept], bi[kept]
    kept_edges = int(kept.sum())

    # triangles on the sampled graph: sum((U @ U) * U) over strict
    # upper-triangular boolean adjacency
    u = np.zeros((n, n), dtype=np.float32)
    u[ka, kb] = 1.0
    tri_sampled = int(round(float(((u @ u) * u).sum(dtype=np.float64))))
    exp = (n_edges, kept_edges, tri_sampled, tri_sampled * (mod ** 3))

    got_df = spark_df(out_dir, "q146_triangle_sample")
    got = tuple(int(got_df.iloc[0][c]) for c in
                ("n_edges", "kept_edges", "tri_sampled", "tri_est"))
    if got != exp:
        print(f"FAIL q146_triangle_sample: engine {got} vs numpy {exp}")
        return False
    print(f"PASS q146_triangle_sample {got} (numpy oracle)")
    return True


def advise_mod(wedge_vol, budget):
    """Mirror of Similarity.sampleModFor: smallest m with
    m^2 * budget >= wedge_vol (float-sqrt candidate + one integer
    adjustment step, so exact squares land exactly)."""
    if wedge_vol <= budget:
        return 1
    cand = max(1, int(np.ceil(np.sqrt(wedge_vol / float(budget)))))
    if cand > 1 and (cand - 1) * (cand - 1) * budget >= wedge_vol:
        return cand - 1
    if cand * cand * budget < wedge_vol:
        return cand + 1
    return cand


def check_q147(ids, cos, out_dir, th=0.3, budget=1000000):
    """q147_triangle_advisor: the q146 estimator with the sampleMod
    ADVISOR in the loop — wedge volume from the degree profile, the
    smallest mod whose expected sampled wedge volume fits the budget,
    then the identical md5 keep-test / wedge-close / exact-integer
    estimator at that mod."""
    n = len(ids)
    iu = np.triu_indices(n, k=1)
    hit = cos[iu] >= th
    ai, bi = iu[0][hit], iu[1][hit]
    n_edges = int(hit.sum())

    # wedge volume on the ORDERED pair list: sum_b lower(b) * higher(b)
    nlo = np.bincount(bi, minlength=n).astype(np.int64)
    nhi = np.bincount(ai, minlength=n).astype(np.int64)
    wedge_vol = int((nlo * nhi).sum())
    mod = advise_mod(wedge_vol, budget)

    kept = np.fromiter(
        (int(hashlib.md5(f"{ids[a]}_{ids[b]}".encode()).hexdigest()[:8], 16)
         % mod == 0 for a, b in zip(ai, bi)),
        dtype=bool, count=n_edges)
    ka, kb = ai[kept], bi[kept]
    kept_edges = int(kept.sum())
    u = np.zeros((n, n), dtype=np.float32)
    u[ka, kb] = 1.0
    tri_sampled = int(round(float(((u @ u) * u).sum(dtype=np.float64))))
    exp = (wedge_vol, mod, n_edges, kept_edges, tri_sampled,
           tri_sampled * (mod ** 3))

    got_df = spark_df(out_dir, "q147_triangle_advisor")
    got = tuple(int(got_df.iloc[0][c]) for c in
                ("wedge_vol", "sample_mod", "n_edges", "kept_edges",
                 "tri_sampled", "tri_est"))
    if got != exp:
        print(f"FAIL q147_triangle_advisor: engine {got} vs numpy {exp}")
        return False
    print(f"PASS q147_triangle_advisor {got} (numpy oracle)")
    return True


def check_q123(ids, cos, out_dir, th=0.4):
    n = len(ids)
    a = (cos >= th).astype(np.float32)
    np.fill_diagonal(a, 0.0)
    # triangles through v = ((A @ A) * A) row-sum / 2 on the symmetric
    # adjacency; wedge counts < 2^24 exact in float32, sums in float64
    per_v = ((a @ a) * a).sum(axis=1, dtype=np.float64) / 2.0
    in_graph = a.sum(axis=1) > 0          # vertices of the pair list
    counts = per_v[in_graph].astype(np.int64)
    hist = pd.Series(counts).value_counts().sort_index()
    exp = [(int(t), int(c)) for t, c in hist.items()]

    got_df = spark_df(out_dir, "q123_triangles").sort_values("triangles")
    got = [(int(r.triangles), int(r.n_vecs)) for r in got_df.itertuples()]
    if got != exp:
        print(f"FAIL q123_triangles: engine {got[:6]}… vs numpy {exp[:6]}…")
        return False
    print(f"PASS q123_triangles ({len(got)} histogram rows, "
          f"{int(counts.sum() // 3)} triangles, numpy oracle)")
    return True


def main():
    argv = [a for a in sys.argv[1:] if a != "--calibrate"]
    calibrate = "--calibrate" in sys.argv
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    ids, cos = cos_matrix(sf_dir)
    ok = True
    if not only or "q146_triangle_sample" in only:
        ok = check_q146(ids, cos, out_dir) and ok
    if not only or "q147_triangle_advisor" in only:
        ok = check_q147(ids, cos, out_dir) and ok
    if not only or "q123_triangles" in only:
        ok = check_q123(ids, cos, out_dir) and ok
    if calibrate:
        ok = calibrate_vs_duckdb(sf_dir, out_dir, only) and ok
    if not ok:
        sys.exit(1)


def calibrate_vs_duckdb(sf_dir, out_dir, only):
    """The STANDING calibration gate (r13 verdict item 6): wherever the
    DuckDB oracle CAN run (the small fixtures), assert numpy == DuckDB
    directly — a third-party tiebreak, so a drift in either oracle is
    loud instead of silently re-baselining the scale gates. Reads the
    oracle SQL from the Verify dump's oracle_sql.json (the exact text
    the driver gates with) and compares full result frames after the
    same column-sort/row-sort normalization as scripts/check.py."""
    import json
    import duckdb
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in ("embeddings",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    ok = True
    for q in ("q146_triangle_sample", "q147_triangle_advisor",
              "q123_triangles"):
        if (only and q not in only) or q not in oracle:
            continue
        duck = con.execute(oracle[q]).df()
        duck = duck[sorted(duck.columns)]
        duck = duck.sort_values(list(duck.columns)).reset_index(drop=True)
        spark = spark_df(out_dir, q)
        spark = spark[sorted(spark.columns)]
        spark = spark.sort_values(list(spark.columns)).reset_index(drop=True)
        same = (len(duck) == len(spark) and
                all(int(a) == int(b)
                    for ca, cb in zip(duck.columns, spark.columns)
                    for a, b in zip(duck[ca], spark[cb])))
        # numpy already asserted spark == numpy above, so duck == spark
        # closes the triangle: numpy == duckdb
        print(("CAL-PASS" if same else "CAL-FAIL") +
              f" {q}: duckdb {'==' if same else '!='} spark(==numpy)")
        ok = ok and same
    return ok


if __name__ == "__main__":
    main()
