#!/usr/bin/env python3
"""Scale the sf0.1 documents corpus by an integer factor for the
reference-vs-graft single-node throughput comparison
(scripts/ref_kernel_bench.py + graft.RefCompare).

Replicates every document N times with offset doc_ids (text unchanged
— wordcount totals scale exactly N times), writing BOTH engines' input
from the same rows: documents.parquet for graft, and the reference's
pre-split data/node{1..4}/docs.txt layout with the same text bytes.

Usage: python3 scripts/gen_ref_corpus.py <outDir> [factor] [sfDir]
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def main():
    out_dir = sys.argv[1]
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    src = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    n = src.num_rows
    cols = {c: src.column(c).to_pylist() for c in src.column_names}
    big = {c: [] for c in cols}
    for r in range(factor):
        for c, vals in cols.items():
            if c == "doc_id":
                big[c].extend(v + r * n for v in vals)
            else:
                big[c].extend(vals)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table({c: pa.array(big[c], src.schema.field(c).type) for c in cols}),
        os.path.join(out_dir, "documents.parquet"))
    workers = 4
    files = []
    for w in range(workers):
        d = os.path.join(out_dir, f"node{w + 1}")
        os.makedirs(d, exist_ok=True)
        files.append(open(os.path.join(d, "docs.txt"), "w", encoding="utf-8"))
    total = 0
    for i, t in enumerate(big["text"]):
        line = (t or "").replace("\n", " ")
        files[i % workers].write(line + "\n")
        total += len(line) + 1
    for f in files:
        f.close()
    print(f"[gen_ref_corpus] {factor}x: {len(big['text'])} docs, "
          f"{total / 1e6:.1f} MB text -> {out_dir}")


if __name__ == "__main__":
    main()
