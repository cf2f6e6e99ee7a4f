#!/usr/bin/env python3
"""Skewed scale fixture generator — the TESTDATA.md generator extended
with ENGINEERED SKEW, for scale-proofing the plan-shape claims
(VERDICT r5 item 1). Produces the same 10-table schema as
/root/testdata/sf* (bit-compatible parquet physical types, including
events' TIMESTAMP(NANOS)) at ~10x sf0.1 volume, with the hostile
distributions the 100-TB arguments assume:

  - documents: ONE source owns 90% of the corpus (q62 hot-source
    sharding, q63 quota, q67 funnel), tokens are ZIPFIAN over an open
    vocabulary (q31/q68 map-side collapse + profile growth, q72), one
    hot boilerplate sentence is appended to 30% of docs (q69 AQE
    skew-split), and 5% of docs are planted exact/near duplicates
    (q24-q27, q59, q61 operate on real clusters, not noise).
  - orders: one hot customer owns 2% of all orders (join skew).
  - events: one hot user emits 5% of all events (hot window/session
    partition in q10/q11/q74; stream-join key skew in q56).
  - embeddings: 2x vectors with planted near-identical pairs (q28's
    exact-quadratic tier bounds this table — its banded/LSH siblings
    carry the linear-scale story).

Deterministic (numpy PCG64, fixed seed). Usage:
    python3 scripts/gen_scale.py <outDir> [relScale] [eventDays]
relScale is relative to sf0.1 (default 10). eventDays (default 30)
embedVecs (default 4000 = 2x sf0.1) sizes the embeddings table
separately — the exact-quadratic tier (q28, exact q88 pair source)
bounds how far this table can scale; pass a larger count explicitly
when sweeping the similarity tier.
sets the events table's time span: 30 at any scale densifies windows
(adversarial for interval joins); 30*relScale keeps density constant
(how a real log grows).
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260813
DAY_MS = 86400000


def write(out_dir, name, table):
    pq.write_table(table, f"{out_dir}/{name}.parquet")
    print(f"[gen] {name}: {table.num_rows} rows")


def gen_region_nation(out_dir):
    # fixed tiny dimension tables — same values as every sf tier
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": pa.array(regions)}))
    write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))


def gen_customer(rng, out_dir, n):
    segs = np.array(["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"])
    write(out_dir, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n)]),
        "c_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n), 2)),
        "c_mktsegment": pa.array(segs[rng.integers(0, 5, n)])}))


def gen_supplier(rng, out_dir, n):
    write(out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n)]),
        "s_nationkey": pa.array(rng.integers(0, 25, n), pa.int32()),
        "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n), 2))}))


def gen_part(rng, out_dir, n):
    adjs = np.array(["large", "small", "hot", "cold", "blue", "red", "green", "shiny"])
    nouns = np.array(["ring", "bolt", "gear", "plate", "rod", "cap", "pin", "tube"])
    types = np.array(["LARGE", "SMALL", "ECONOMY", "MEDIUM", "STANDARD", "PROMO"])
    a = adjs[rng.integers(0, len(adjs), n)]
    b = nouns[rng.integers(0, len(nouns), n)]
    write(out_dir, "part", pa.table({
        "p_partkey": pa.array(np.arange(n), pa.int64()),
        "p_name": pa.array([f"{x} {y}" for x, y in zip(a, b)]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 21, n)]),
        "p_type": pa.array(types[rng.integers(0, len(types), n)]),
        "p_size": pa.array(rng.integers(1, 51, n), pa.int32()),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 2100, n), 2))}))


def gen_orders(rng, out_dir, n, n_cust):
    # SKEW: customer 42 owns 2% of all orders
    cust = rng.integers(0, n_cust, n)
    cust[rng.random(n) < 0.02] = 42
    base = np.datetime64("1995-01-01").astype("datetime64[ms]").astype(np.int64)
    odate = base + rng.integers(0, 2400, n) * DAY_MS
    stat = np.array(["O", "P", "F"])
    prio = np.array(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
    write(out_dir, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n), pa.int64()),
        "o_custkey": pa.array(cust, pa.int64()),
        "o_orderstatus": pa.array(stat[rng.integers(0, 3, n)]),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 500000, n), 2)),
        "o_orderdate": pa.array(odate, pa.timestamp("ms")),
        "o_orderpriority": pa.array(prio[rng.integers(0, 5, n)])}))
    return odate


def gen_lineitem(rng, out_dir, n_orders, odate_ms, n_part, n_supp):
    counts = rng.integers(1, 8, n_orders)  # mean 4 lines/order
    okey = np.repeat(np.arange(n_orders), counts)
    n = len(okey)
    linenum = np.concatenate([np.arange(1, c + 1) for c in counts]).astype(np.int32)
    # SKEW: part 7 appears in 1% of lines
    pkey = rng.integers(0, n_part, n)
    pkey[rng.random(n) < 0.01] = 7
    sdate = np.repeat(odate_ms, counts) + rng.integers(1, 101, n) * DAY_MS
    rflag = np.array(["A", "N", "R"])
    lstat = np.array(["O", "F"])
    write(out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(okey, pa.int64()),
        "l_partkey": pa.array(pkey, pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n), pa.int64()),
        "l_linenumber": pa.array(linenum, pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, n).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 105000, n), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, n), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, n), 2)),
        "l_returnflag": pa.array(rflag[rng.integers(0, 3, n)]),
        "l_linestatus": pa.array(lstat[rng.integers(0, 2, n)]),
        "l_shipdate": pa.array(sdate, pa.timestamp("ms"))}))


def gen_events(rng, out_dir, n, n_users, days=30):
    # TIMESTAMP(NANOS) like the driver fixture — Spark reads it via the
    # nanosAsLong conf (Tables.events), DuckDB natively.
    # days=30 at every relScale DENSIFIES time (per-window event counts
    # grow with rel — the adversarial case for windowed/interval
    # operators, whose per-window output is quadratic in density);
    # days=30*rel instead EXTENDS the range (density constant — how a
    # real event log grows), isolating operator scaling from the
    # semantics-driven output growth.
    base = np.datetime64("2024-01-01").astype("datetime64[ns]").astype(np.int64)
    ts = base + rng.integers(0, days * 86400 * 10**9, n, dtype=np.int64)
    # SKEW: user 7 emits 5% of all events (hot session/window partition)
    users = rng.integers(0, n_users, n)
    users[rng.random(n) < 0.05] = 7
    types = np.array(["click", "view", "purchase", "signup", "error"])
    write(out_dir, "events", pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("ns")),
        "user_id": pa.array(users, pa.int64()),
        "event_type": pa.array(types[rng.integers(0, 5, n)]),
        "value": pa.array(np.round(rng.uniform(0, 560, n), 2)),
        "props": pa.array([f'{{"k": {v}}}' for v in rng.integers(0, 100, n)])}))


def gen_documents(rng, out_dir, n):
    # zipfian open vocabulary: the 31 core fixture words get zipf mass,
    # a 5000-word tail grows the vocab with the corpus
    core = ("spark window merge table column vector stream value key scan "
            "order join part line filter query hash group sort batch fast "
            "slow small a the of to in on for agg").split()
    tail = [f"w{i:05d}" for i in range(5000)]
    vocab = np.array(core + tail)
    ranks = np.arange(1, len(core) + 1, dtype=np.float64)
    w = np.concatenate([1.0 / ranks, np.full(len(tail), 0.1 / len(tail) * ranks.size)])
    p = w / w.sum()
    lens = rng.integers(8, 101, n)
    total = int(lens.sum())
    words = rng.choice(vocab, total, p=p)
    offs = np.concatenate([[0], np.cumsum(lens)])
    boiler = ("all rights reserved contact site admin for the full terms "
              "of service and privacy policy")
    texts = []
    for i in range(n):
        t = " ".join(words[offs[i]:offs[i + 1]])
        if rng.random() < 0.30:  # hot boilerplate window in 30% of docs
            t = t + " " + boiler
        texts.append(t)
    # planted duplicate structure: 1% exact dups, 4% near dups (1-2 word
    # edits) — both copy an EARLIER doc so cluster labels are stable
    kinds = rng.random(n)
    for i in range(1, n):
        if kinds[i] < 0.01:
            texts[i] = texts[rng.integers(0, i)]
        elif kinds[i] < 0.05:
            src = texts[rng.integers(0, i)].split()
            for _ in range(min(2, len(src))):
                src[rng.integers(0, len(src))] = vocab[rng.integers(0, len(core))]
            texts[i] = " ".join(src)
    # SKEW: src0 owns 90% of the corpus
    srcs = np.array([f"src{i}" for i in range(20)])
    source = srcs[1 + rng.integers(0, 19, n)]
    source[rng.random(n) < 0.90] = "src0"
    langs = np.array(["en", "de", "es", "fr", "zh"])
    lang = langs[np.minimum(rng.integers(0, 8, n), 4)]  # en-heavy (~50%)
    write(out_dir, "documents", pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(lang),
        "source": pa.array(source),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64())}))


def gen_embeddings(rng, out_dir, n, dims=64, labels=10):
    label = rng.integers(0, labels, n).astype(np.int32)
    means = rng.normal(0, 0.08, (labels, dims))
    vecs = (means[label] + rng.normal(0, 0.12, (n, dims))).astype(np.float32)
    # planted near-identical pairs so the exact near-dup tier (q28) has
    # real positives: vec 2i+1 := vec 2i + tiny noise for 20 low ids
    for i in range(20):
        vecs[2 * i + 1] = vecs[2 * i] + rng.normal(0, 0.002, dims).astype(np.float32)
        label[2 * i + 1] = label[2 * i]
    write(out_dir, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([v for v in vecs.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(label, pa.int32())}))


def main():
    out_dir = sys.argv[1]
    rel = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    import os
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)
    gen_region_nation(out_dir)
    n_cust = int(15000 * rel)
    n_supp = int(1000 * rel)
    n_part = int(20000 * rel)
    n_orders = int(150000 * rel)
    gen_customer(rng, out_dir, n_cust)
    gen_supplier(rng, out_dir, n_supp)
    gen_part(rng, out_dir, n_part)
    odate = gen_orders(rng, out_dir, n_orders, n_cust)
    gen_lineitem(rng, out_dir, n_orders, odate, n_part, n_supp)
    days = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    gen_events(rng, out_dir, int(100000 * rel), int(1500 * rel), days)
    gen_documents(rng, out_dir, int(5000 * rel))
    # embeddings scale 2x, not rel-x: q28's exact all-pairs baseline is
    # quadratic BY CONTRACT (the banded/LSH tiers are the linear path),
    # and the DuckDB oracle pays that quadratic in interpreted list ops
    emb_n = int(sys.argv[4]) if len(sys.argv) > 4 else 4000
    gen_embeddings(rng, out_dir, emb_n)
    print(f"[gen] fixture complete: {out_dir}")


if __name__ == "__main__":
    main()
