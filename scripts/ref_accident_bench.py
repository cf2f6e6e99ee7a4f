#!/usr/bin/env python3
"""Single-node throughput baseline for the reference's FLAGSHIP task
(tasks/accident_analysis.py) — same harness discipline as
ref_kernel_bench.py: exec the reference's own task code (the way the
worker ships it, engine/worker.py:71) and drive its exact phases
(worker.py:83–158) in process over the node{1..4} pre-split written by
gen_accident_csv.py. All network/serialization costs the real
deployment pays are omitted in the reference's favor; per-phase wall is
the max across the 4 workers (perfect-parallelism assumption).

Note the reference's OWN shuffle for this task routes by weather bucket
(accident_analysis.py:90–104) — 4 keys to 4 workers — so its reduce
skew is part of its measured behavior, not an artifact of this harness.

TRUST ASSUMPTION: this script exec()s task code read from
/root/reference — content this project treats as PUBLIC UNTRUSTED.
Executing it is inherent to measuring the reference kernel, but it
grants that code full interpreter access: run this bench only in a
disposable/sandboxed environment, never where credentials or writable
state matter.

Usage: python3 scripts/ref_accident_bench.py <dataRoot> [reps] [dumpJson]
With dumpJson, the merged (key -> result) reduce output is written for
scripts/check_accident_parity.py.
"""
import json
import os
import sys
import time


def main():
    root = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    num_workers = 4
    with open("/root/reference/tasks/accident_analysis.py") as f:
        task_code = f.read()
    ns = {}
    exec(task_code, ns)
    map_func, shuffle_func, reduce_func = (
        ns["map_func"], ns["shuffle_func"], ns["reduce_func"])

    best = None
    for _ in range(reps):
        phase = {"map": [], "shuffle": [], "reduce": []}
        outs = []
        for w in range(num_workers):
            t0 = time.time()
            outs.append(map_func(os.path.join(root, f"node{w + 1}"), w))
            phase["map"].append(time.time() - t0)
        inboxes = [[] for _ in range(num_workers)]
        for w in range(num_workers):
            t0 = time.time()
            buckets = {i: [] for i in range(num_workers)}
            for key, value in outs[w]:
                for target in shuffle_func(key):
                    buckets[target % num_workers].append((key, value))
            for i in range(num_workers):
                inboxes[i].extend(buckets[i])
            phase["shuffle"].append(time.time() - t0)
        n_rows = 0
        merged = {}
        for w in range(num_workers):
            t0 = time.time()
            grouped = {}
            for key, value in inboxes[w]:
                if key not in grouped:
                    grouped[key] = []
                grouped[key].append(value)
            out = reduce_func(grouped.items(), w)
            n_rows += len(out)
            merged.update(dict(out))
            phase["reduce"].append(time.time() - t0)
        wall = sum(max(ts) for ts in phase.values())
        rec = {
            "metric": "ref_accident_kernel", "value": round(wall, 3),
            "unit": "sec",
            "phases": {k: round(max(v), 3) for k, v in phase.items()},
            "phase_sums": {k: round(sum(v), 3) for k, v in phase.items()},
            "result_rows": n_rows, "workers": num_workers, "data": root,
            "note": "in-process kernel only; network/serialization omitted "
                    "(reference-favoring)",
        }
        if best is None or rec["value"] < best["value"]:
            best = rec
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            json.dump(merged, f, sort_keys=True)
    print(json.dumps(best))


if __name__ == "__main__":
    main()
