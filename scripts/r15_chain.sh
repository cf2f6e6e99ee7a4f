#!/bin/bash
# Round-15 measurement chain — strictly serial sbt invocations (a
# parallel sbt pair races the shared target dir, VARIANCE.md).
#   1. TRUE-COLD 100x q145 (store wiped: all three fds index builds +
#      the stream's first fold) then immediate WARM re-run — r14
#      verdict item 4 (the r14 7.9 s reading was the replay path).
#   2. ADMISSION_SWEEP_CHUNK_r15.json — the serial k-curve re-measured
#      at r15 HEAD plus the DEPLOYED pairsVsIndexChunked (shared
#      touched-bucket band manifest + overlapped chunk rounds) at
#      driver-pool widths 1..4 — r14 verdict items 1 + 2.
#   3. q134 isolated best-of-2 with shuffle io — checks the chunked
#      probe's 2x io trade is reclaimed (target: back toward the
#      2.6 GB single-batch figure at <= 126 s wall).
#   4. Verify the BROADENED 29-query family at the 100x fixture
#      (21 heavy + text tier q31/q68/q83/q104/q112 + event tier
#      q74/q82/q91... using the capped-DuckDB procedure) — r14
#      verdict item 5; gate it afterwards with check_scale lanes:
#      GRAFT_DUCKDB_MEM=20GB GRAFT_DUCKDB_THREADS=8 \
#      python3 scripts/check_scale.py /root/repo/scaledata/sf10skew \
#        /tmp/v_sf10_r15 CORRECTNESS_SF10_r15.json 3600 --only <names>
set -e
cd /root/repo
export SPARK_GRAFT_CPUS=32
export SPARK_DRIVER_MEM=64g
FAM29="q25_dedup_minhash q26_dedup_simhash q27_ngram_jaccard q31_langid q59_dup_clusters q61_dedup_keepers q68_lm_score q74_session_bounds q82_session_quota q83_tfidf_terms q91_funnel q102_doc_rarity q104_collocations q112_token_weighted_lengths q113_heavy_hitters q130_incremental_dedup q132_stream_admission q133_admission_index q134_stream_neardup q135_emb_admission_index q136_stream_emb_admission q137_admission_lifecycle q138_admission_compaction q139_front_door q141_emb_lifecycle q142_emb_compaction q143_front_door_lifecycle q144_front_door_compaction q145_front_door_stream"

echo "=== STEP 1: true-cold 100x q145 (store wiped), then warm ($(date))"
rm -rf target/graft-index
SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf10skew SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_BENCH_ONLY="q145_" SPARK_GRAFT_BENCH_OUT=BENCH_Q145_SF10_COLD_r15.json \
sbt -batch "runMain graft.Bench"
SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf10skew SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_BENCH_ONLY="q145_" SPARK_GRAFT_BENCH_OUT=BENCH_Q145_SF10_WARM_r15.json \
sbt -batch "runMain graft.Bench"

echo "=== STEP 2: chunk sweep r15 (serial curve + deployed par 1-4) ($(date))"
SPARK_GRAFT_SWEEP_MODE=chunk SPARK_GRAFT_SWEEP_OUT=ADMISSION_SWEEP_CHUNK_r15.json \
sbt -batch "runMain graft.AdmissionSweep"

echo "=== STEP 3: q134 isolated best-of-2 with io ($(date))"
SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf10skew SPARK_GRAFT_BENCH_RUNS=2 \
SPARK_GRAFT_BENCH_ONLY="q134_" SPARK_GRAFT_BENCH_OUT=BENCH_Q134_SF10_r15.json \
sbt -batch "runMain graft.Bench"

echo "=== STEP 4: Verify broadened 29-query family at 100x ($(date))"
rm -rf /tmp/v_sf10_r15
sbt -batch "runMain graft.Verify /root/repo/scaledata/sf10skew /tmp/v_sf10_r15 $FAM29"
echo "=== CHAIN DONE ($(date))"
