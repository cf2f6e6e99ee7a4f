#!/usr/bin/env python3
"""Deterministic US-Accidents-style CSV fixture (FIXTURES.md A.2) for
the reference-vs-graft accident-analysis throughput comparison.

Writes the SAME rows twice: pre-split node{1..4}/accidents.csv for the
reference's worker layout, and all/accidents.csv (one directory) for
graft's CSV reader — identical bytes per row. Distributions cover every
branch of tasks/accident_analysis.py: all weather buckets (incl. the
CASE-order traps), all road-feature flags (incl. multi-flag priority
and all-false), garbage Severity/Distance, missing End_Time (duration
0), Day/Night.

Usage: python3 scripts/gen_accident_csv.py <outDir> [rows]
"""
import csv
import os
import random
import sys

WEATHERS = [
    "Fair", "Fair / Windy", "Mostly Cloudy", "Cloudy", "Cloudy / Windy",
    "Clear", "Partly Cloudy", "Overcast", "Mostly Cloudy / Windy",
    "Light Rain", "Heavy Snow", "Fog", "", None,
]
FLAGS = ["Station", "Junction", "Crossing", "Traffic_Signal", "Stop",
         "Railway", "Roundabout"]


def main():
    out_dir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1000000
    rng = random.Random(20260813)
    workers = 4
    writers = []
    header = (["Severity", "Distance(mi)", "Start_Time", "End_Time",
               "Weather_Condition", "Sunrise_Sunset"] + FLAGS)
    paths = [os.path.join(out_dir, f"node{w + 1}") for w in range(workers)]
    paths.append(os.path.join(out_dir, "all"))
    files = []
    for p in paths:
        os.makedirs(p, exist_ok=True)
        f = open(os.path.join(p, "accidents.csv"), "w", newline="")
        files.append(f)
        w = csv.writer(f)
        w.writerow(header)
        writers.append(w)
    for i in range(n):
        sev = rng.choice(["1", "2", "3", "4", "garbage", ""]) \
            if i % 17 == 0 else str(rng.randint(1, 4))
        dist = rng.choice(["", "junk"]) if i % 23 == 0 \
            else f"{rng.random() * 5:.3f}"
        h = rng.randint(0, 23)
        mins = rng.randint(0, 59)
        start = f"2023-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d} " \
                f"{h:02d}:{mins:02d}:{rng.randint(0, 59):02d}"
        end = "" if i % 31 == 0 else start[:11] + \
            f"{min(h + rng.randint(0, 3), 23):02d}:{mins:02d}:00"
        weather = rng.choice(WEATHERS) or ""
        tod = rng.choice(["Day", "Night"])
        flags = ["False"] * len(FLAGS)
        if i % 5 != 0:  # 20% all-false -> 'None'
            for j in rng.sample(range(len(FLAGS)), rng.randint(1, 3)):
                flags[j] = "True"
        row = [sev, dist, start, end, weather, tod] + flags
        writers[i % workers].writerow(row)
        writers[workers].writerow(row)
    for f in files:
        f.close()
    sz = os.path.getsize(os.path.join(out_dir, "all", "accidents.csv"))
    print(f"[gen_accident_csv] {n} rows, {sz / 1e6:.1f} MB -> {out_dir}")


if __name__ == "__main__":
    main()
