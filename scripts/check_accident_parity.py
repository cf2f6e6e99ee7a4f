#!/usr/bin/env python3
"""Cell-level parity check: reference accident kernel vs graft
dangerScores on the same CSV rows.

Compares every metric cell per (road_feature, weather, time_of_day)
group. `count` must match exactly (integer semantics). The rounded
float cells are expected to match almost everywhere; the residual
divergence channel is the REFERENCE's own order-dependent float sum
(reduce_func: avg = sum(list)/n in shuffle-arrival order, so its 2-dp
rounding can flip per run/topology), where graft sums in DECIMAL —
mismatches are reported with both values for manual attribution.

Usage: python3 scripts/check_accident_parity.py <refDump.json> <graftCsvDir>
"""
import csv
import glob
import json
import sys


def main():
    ref = json.load(open(sys.argv[1]))
    path = glob.glob(sys.argv[2] + "/*.csv")[0]
    rows = list(csv.DictReader(open(path)))
    graft = {}
    for r in rows:
        key = f"{r['road_feature']}_{r['weather_cat']}_{r['time_of_day']}"
        graft[key] = r
    assert set(ref) == set(graft), (
        f"group sets differ: only-ref={set(ref) - set(graft)} "
        f"only-graft={set(graft) - set(ref)}")
    cells = mism = 0
    count_mism = 0
    for key, rv in sorted(ref.items()):
        gv = graft[key]
        if int(gv["count"]) != rv["count"]:
            count_mism += 1
            print(f"COUNT MISMATCH {key}: graft={gv['count']} ref={rv['count']}")
        for f in ["log_count", "avg_impact", "danger_score",
                  "min_impact", "max_impact"]:
            cells += 1
            if abs(float(gv[f]) - float(rv[f])) > 1e-9:
                mism += 1
                print(f"cell {key}.{f}: graft={gv[f]} ref={rv[f]}")
        cells += 1
        if gv["formula"] != rv["formula"]:
            mism += 1
            print(f"cell {key}.formula: graft={gv['formula']!r} ref={rv['formula']!r}")
    print(f"== {len(ref)} groups, {cells} cells, {mism} float-cell "
          f"mismatches, {count_mism} count mismatches ==")
    sys.exit(1 if count_mism else 0)


if __name__ == "__main__":
    main()
