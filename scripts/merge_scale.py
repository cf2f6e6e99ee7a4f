#!/usr/bin/env python3
"""Merge per-lane check_scale.py outputs (+ numpy-oracle PASS lines)
into one CORRECTNESS_SF*-style artifact:

  {sf, fixture, procedure, timeout_sec, counts, queries}

Usage:
  python3 scripts/merge_scale.py <outJson> <sf> <fixture> <procedure> \
      <timeoutSec> lane1.json [lane2.json ...] [--numpy np_log.txt ...]

Lane files are check_scale.py outputs ({name: {status, detail}}). Later
lanes override earlier entries (retry lanes list the stragglers only).
--numpy files are np_*_check.py stdout logs: every `PASS <name> ...`
line becomes {"status": "pass", "detail": <line>} and overrides a
DuckDB timeout/fail for that query (the documented 30x route for the
recursive-CC / all-pairs oracles).
"""
import json, sys


def main():
    argv = sys.argv[1:]
    np_logs = []
    if "--numpy" in argv:
        i = argv.index("--numpy")
        np_logs = argv[i + 1:]
        argv = argv[:i]
    out_json, sf, fixture, procedure, timeout = argv[:5]
    lanes = argv[5:]
    queries = {}
    for lane in lanes:
        d = json.load(open(lane))
        d = d.get("queries", d)  # accept both raw and wrapped shapes
        for k, v in d.items():
            queries[k] = v
    for log in np_logs:
        for line in open(log):
            line = line.strip()
            if line.startswith("PASS "):
                name = line.split()[1]
                queries[name] = {"status": "pass", "detail": line}
    counts = {}
    for v in queries.values():
        counts[v["status"]] = counts.get(v["status"], 0) + 1
    artifact = {"sf": sf, "fixture": fixture, "procedure": procedure,
                "timeout_sec": int(timeout), "counts": counts,
                "queries": {k: queries[k] for k in sorted(queries)}}
    json.dump(artifact, open(out_json, "w"), indent=1)
    print(f"== {counts} -> {out_json} ==")
    sys.exit(0 if set(counts) == {"pass"} else 1)


if __name__ == "__main__":
    main()
