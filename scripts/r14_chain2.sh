#!/bin/bash
# Round-14 chain, part 2 (steps 3-6 after the ANSI-overflow fix in the
# chunk-sweep checksum; steps 1-2 completed in part 1).
set -e
cd /root/repo
export SPARK_GRAFT_CPUS=32
export SPARK_DRIVER_MEM=64g

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
echo "=== CHAIN2 DONE ($(date))"
