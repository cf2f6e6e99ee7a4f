#!/usr/bin/env python3
"""Scale-linearity report: join two Bench JSON artifacts (baseline sf0.1
vs the skewed 10x fixture) and print per-query time and shuffle-io
ratios, flagging anything superlinear. Usage:
    python3 scripts/scale_ratio.py BENCH_base.json BENCH_sf1.json [data_ratio]
"""
import json
import sys


def main():
    base = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for q in sorted(base["queries"]):
        if q not in big["queries"]:
            continue
        t0, t1 = base["queries"][q], big["queries"][q]
        io0 = base["io"][q]["shuffle_read_mb"] + base["io"][q]["shuffle_write_mb"]
        io1 = big["io"][q]["shuffle_read_mb"] + big["io"][q]["shuffle_write_mb"]
        rows.append((q, t0, t1, t1 / t0 if t0 > 0 else float("inf"),
                     io0, io1, io1 / io0 if io0 > 0.001 else None))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':28s} {'t_base':>7s} {'t_10x':>7s} {'t_ratio':>7s} "
          f"{'io_base':>8s} {'io_10x':>8s} {'io_ratio':>8s}")
    flagged = []
    for q, t0, t1, tr, io0, io1, ior in rows:
        iors = f"{ior:8.1f}" if ior is not None else "     n/a"
        print(f"{q:28s} {t0:7.2f} {t1:7.2f} {tr:7.1f} {io0:8.2f} {io1:8.2f} {iors}")
        # superlinear = time ratio clearly above the data ratio (fixed
        # per-query overheads make small queries sublinear; the flag is
        # for the other direction)
        if tr > data_ratio * 1.5:
            flagged.append((q, tr, ior))
    print(f"\ntotal: {base['value']:.1f}s -> {big['value']:.1f}s "
          f"({big['value'] / base['value']:.1f}x on {data_ratio:.0f}x data)")
    if flagged:
        print("SUPERLINEAR (time ratio > 1.5x data ratio):")
        for q, tr, ior in flagged:
            print(f"  {q}: time x{tr:.1f} io x{ior if ior else 0:.1f}")
    else:
        print("no query exceeds 1.5x the data ratio")


if __name__ == "__main__":
    main()
