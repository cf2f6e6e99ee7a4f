#!/bin/bash
# Round-14 measurement chain — strictly serial sbt invocations (a
# parallel sbt pair races the shared target dir, VARIANCE.md).
#   1. Verify at the 100x fixture (21-query admission/dedup family)
#      -> /tmp/v_sf10_r14 for the CORRECTNESS_SF10_r14 DuckDB gate
#   2. BENCH_SF10_hot_r14.json — the family re-measured at r14 HEAD
#      (q134 now runs the DEFAULT hash-chunked micro-batch path)
#   3. ADMISSION_SWEEP_CHUNK_r14.json — the chunk sweep refreshed on
#      the DEPLOYED xxhash64 chunk assignment (r13 used contiguous
#      id ranges; the skew tail lived there)
#   4. BENCH_Q136_SF10_r14.json — isolated best-of-2 q136 with io,
#      adjudicating the r13 7.1->27.3 s single-run reading
#   5. BENCH_SLOWTIER_{COLD,WARM}_r14.json — isolated q139/q143/q144/
#      q145 pair at sf0.1: cold (store wiped, first-touch builds) vs
#      warm (probe/replay steady state)
set -e
cd /root/repo
export SPARK_GRAFT_CPUS=32
export SPARK_DRIVER_MEM=64g
FAMN="q25_dedup_minhash q26_dedup_simhash q27_ngram_jaccard q59_dup_clusters q61_dedup_keepers q102_doc_rarity q113_heavy_hitters q130_incremental_dedup q132_stream_admission q133_admission_index q134_stream_neardup q135_emb_admission_index q136_stream_emb_admission q137_admission_lifecycle q138_admission_compaction q139_front_door q141_emb_lifecycle q142_emb_compaction q143_front_door_lifecycle q144_front_door_compaction q145_front_door_stream"
FAMP="q25_,q26_,q27_,q59_,q61_,q102_,q113_,q130_,q132_,q133_,q134_,q135_,q136_,q137_,q138_,q139_,q141_,q142_,q143_,q144_,q145_"

echo "=== STEP 1: Verify sf10skew family ($(date))"
rm -rf /tmp/v_sf10_r14
sbt -batch "runMain graft.Verify /root/repo/scaledata/sf10skew /tmp/v_sf10_r14 $FAMN"

echo "=== STEP 2: BENCH_SF10_hot_r14 ($(date))"
SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf10skew SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_BENCH_ONLY="$FAMP" SPARK_GRAFT_BENCH_OUT=BENCH_SF10_hot_r14.json \
sbt -batch "runMain graft.Bench"

echo "=== STEP 3: chunk sweep r14, hash chunks ($(date))"
SPARK_GRAFT_SWEEP_MODE=chunk SPARK_GRAFT_SWEEP_OUT=ADMISSION_SWEEP_CHUNK_r14.json \
sbt -batch "runMain graft.AdmissionSweep"

echo "=== STEP 4: q136 isolated best-of-2 ($(date))"
SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf10skew SPARK_GRAFT_BENCH_RUNS=2 \
SPARK_GRAFT_BENCH_ONLY="q136_" SPARK_GRAFT_BENCH_OUT=BENCH_Q136_SF10_r14.json \
sbt -batch "runMain graft.Bench"

echo "=== STEP 5: slow-tier isolated pair, cold then warm ($(date))"
rm -rf target/graft-index
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_BENCH_ONLY="q139_,q143_,q144_,q145_" \
SPARK_GRAFT_BENCH_OUT=BENCH_SLOWTIER_COLD_r14.json \
sbt -batch "runMain graft.Bench"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_BENCH_ONLY="q139_,q143_,q144_,q145_" \
SPARK_GRAFT_BENCH_OUT=BENCH_SLOWTIER_WARM_r14.json \
sbt -batch "runMain graft.Bench"

echo "=== STEP 6: 30x triangle family dump for the numpy gate ($(date))"
rm -rf /tmp/v_sf3_tri_r14
sbt -batch "runMain graft.Verify /root/repo/scaledata/sf3skew /tmp/v_sf3_tri_r14 q123_triangles q146_triangle_sample q147_triangle_advisor"
echo "=== CHAIN A DONE ($(date))"
