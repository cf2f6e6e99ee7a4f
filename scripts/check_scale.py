#!/usr/bin/env python3
"""Scale-fixture correctness pass: run scripts/check.py PER QUERY in a
subprocess with a timeout, collect pass/fail/timeout into one JSON
artifact (CORRECTNESS_SF3-style). Per-query process isolation keeps one
pathological DuckDB oracle (quadratic CTEs at 30x) from sinking the
whole pass — a timeout is recorded as such, not silently skipped.

Usage: python3 scripts/check_scale.py <sfDir> <verifyOutDir> <outJson> \
           [timeoutSec] [--only name1,name2,...]
--only restricts the pass to the named queries (a targeted-family scale
run dumps only its family; without the filter every other oracle entry
would be recorded as no_spark_output noise).
"""
import json, os, subprocess, sys

def main():
    argv = list(sys.argv[1:])
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    sf_dir, out_dir, out_json = argv[0], argv[1], argv[2]
    timeout = int(argv[3]) if len(argv) > 3 else 600
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for name in sorted(oracle):
        if only is not None and name not in only:
            continue
        if not os.path.isdir(os.path.join(out_dir, name)):
            results[name] = {"status": "no_spark_output"}
            print(f"MISSING {name}", flush=True)
            continue
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(here, "check.py"),
                 sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=timeout)
            tail = (p.stdout or "").strip().splitlines()
            line = next((l for l in tail if l.startswith(("PASS", "FAIL"))), "")
            if line.startswith("PASS"):
                results[name] = {"status": "pass", "detail": line}
            else:
                results[name] = {"status": "fail",
                                 "detail": line or (p.stderr or "")[-500:]}
            print(line or f"FAIL {name}: no output", flush=True)
        except subprocess.TimeoutExpired:
            results[name] = {"status": "oracle_timeout", "timeout_sec": timeout}
            print(f"TIMEOUT {name} (oracle side, {timeout}s)", flush=True)
    counts = {}
    for v in results.values():
        counts[v["status"]] = counts.get(v["status"], 0) + 1
    artifact = {"sf": sf_dir, "timeout_sec": timeout,
                "counts": counts, "queries": results}
    with open(out_json, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"== {counts} -> {out_json} ==")

if __name__ == "__main__":
    main()
