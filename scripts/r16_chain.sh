#!/bin/bash
# Round-16 measurement chain — strictly serial sbt invocations (a
# parallel sbt pair races the shared target dir, VARIANCE.md). DuckDB
# gate lanes (pure python) may overlap a LATER sbt Verify, never a
# bench step (bench numbers want a quiet box).
#
#   1. Full-inventory Verify at 30x (all 148 queries incl. the new
#      q148_stream_sunk) -> /tmp/v_sf3_r16; gate with 4 mem-capped
#      check_scale lanes at 1200 s, retry stragglers at 5400 s, numpy
#      oracles for q78/q81/q88 (np_cluster_check) and q123/q146/q147
#      (np_triangle_check; q146 double-checked by both) -> merge into
#      CORRECTNESS_SF3_r16.json. Restores the standing three-scale
#      refresh (r15 verdict item 3); values must be bit-identical to
#      r14's (503,644,355 triangles / 17,052 histogram rows).
#   2. 10x targeted gate for the round's changed queries (q134 q139
#      q143 q144 q145 q148) -> CORRECTNESS_SF1_CHANGED_r16.json.
#   3. sf0.1 calibration dump (q78 q81 q88 q123 q146 q147) and the
#      standing numpy<->DuckDB calibration gate (--calibrate) at
#      sf0.01 AND sf0.1 at r16 HEAD.
#   4. 100x Verify of the broadened 40-query family: the r15 29 +
#      q78/q81/q88 (numpy lane) + q62/q67/q85/q94 (capped DuckDB
#      lanes) + q123/q146/q147 (numpy) + q148 -> /tmp/v_sf10_r16;
#      gate -> CORRECTNESS_SF10_r16.json (r15 verdict item 4).
#   5. ADMISSION_SWEEP_FDCHUNK_r16.json — the DEPLOYED composed
#      front-door probe (shared three-tier manifests, tier-2 verify
#      rounds overlapped) at pool widths 1-4 plus the single-batch
#      bound, attribution checksum identity asserted in-harness
#      (r15 verdict item 1's Done artifact).
#   6. TRUE-COLD 100x q145 (store wiped: all three fds index builds +
#      first folds) then immediate WARM re-run — the post-restructure
#      twin of r15's 339.4 s / 8.5 s pair (r15 verdict item 6).
#   7. BENCH_SF10_hot_r16.json — the 21-query heavy family at r16
#      HEAD; BENCH_Q134_SF10_r16.json — isolated best-of-2 with io.
#   8. sf0.1: full-suite BENCH_r16_clean.json (best-of-2) +
#      BENCH_SHARED49_r16.json (isolated shared-49 binding pair).
#   9. Gate fuzz at 1000 cases (the r16 grammar adds window-over-join
#      and non-projected-aggregate HAVING): FuzzVerify + check.py.
set -e
cd /root/repo
export SPARK_GRAFT_CPUS=32
export SPARK_DRIVER_MEM=64g

CHANGED="q134_stream_neardup q139_front_door q143_front_door_lifecycle q144_front_door_compaction q145_front_door_stream q148_stream_sunk"
NUMPYQ="q78_semantic_clusters q81_semantic_lsh q88_cluster_reps q123_triangles q146_triangle_sample q147_triangle_advisor"
FAM40="q25_dedup_minhash q26_dedup_simhash q27_ngram_jaccard q31_langid q59_dup_clusters q61_dedup_keepers q62_token_packing q67_curation_funnel q68_lm_score q74_session_bounds q78_semantic_clusters q81_semantic_lsh q82_session_quota q83_tfidf_terms q85_token_budget q88_cluster_reps q91_funnel q94_weighted_sample q102_doc_rarity q104_collocations q112_token_weighted_lengths q113_heavy_hitters q123_triangles q130_incremental_dedup q132_stream_admission q133_admission_index q134_stream_neardup q135_emb_admission_index q136_stream_emb_admission q137_admission_lifecycle q138_admission_compaction q139_front_door q141_emb_lifecycle q142_emb_compaction q143_front_door_lifecycle q144_front_door_compaction q145_front_door_stream q146_triangle_sample q147_triangle_advisor q148_stream_sunk"

echo "=== STEP 1: full-inventory Verify at 30x ($(date))"
rm -rf /tmp/v_sf3_r16
sbt -batch "runMain graft.Verify /root/repo/scaledata/sf3skew /tmp/v_sf3_r16"
# gate: 4 mem-capped lanes at 1200 s (see memory: parallel DuckDB lanes
# need mem caps or the OOM killer takes children mid-query), stragglers
# retried at 5400 s, numpy oracles for the 6 graph queries, merged by
# scripts/merge_scale.py into CORRECTNESS_SF3_r16.json.

echo "=== STEP 2: 10x changed-query gate ($(date))"
rm -rf /tmp/v_sf1_r16
sbt -batch "runMain graft.Verify /root/repo/scaledata/sf1skew /tmp/v_sf1_r16 $CHANGED"
GRAFT_DUCKDB_MEM=20GB GRAFT_DUCKDB_THREADS=16 python3 scripts/check_scale.py \
  /root/repo/scaledata/sf1skew /tmp/v_sf1_r16 CORRECTNESS_SF1_CHANGED_r16.json 3600 \
  --only $(echo $CHANGED | tr ' ' ',')

echo "=== STEP 3: sf0.1 calibration dump + numpy calibration ($(date))"
rm -rf /tmp/v_sf01_cal_r16
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/v_sf01_cal_r16 $NUMPYQ"
python3 scripts/np_cluster_check.py /root/testdata/sf0.1 /tmp/v_sf01_cal_r16 --calibrate
python3 scripts/np_triangle_check.py /root/testdata/sf0.1 /tmp/v_sf01_cal_r16 --calibrate

echo "=== STEP 4: 100x Verify of the 40-query family ($(date))"
rm -rf /tmp/v_sf10_r16
sbt -batch "runMain graft.Verify /root/repo/scaledata/sf10skew /tmp/v_sf10_r16 $FAM40"
# gate: 4 lanes, GRAFT_DUCKDB_MEM=20GB GRAFT_DUCKDB_THREADS=8,
# timeout 5400 (heavy minhash oracles 25-50 min each); q78/q81/q88 and
# q123/q146/q147 via the numpy oracles -> CORRECTNESS_SF10_r16.json.

echo "=== STEP 5: deployed front-door chunk sweep at 100x ($(date))"
SPARK_GRAFT_SWEEP_MODE=fdchunk SPARK_GRAFT_SWEEP_OUT=ADMISSION_SWEEP_FDCHUNK_r16.json \
sbt -batch "runMain graft.AdmissionSweep"

echo "=== STEP 6: true-cold 100x q145 (store wiped), then warm ($(date))"
rm -rf target/graft-index
SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf10skew SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_BENCH_ONLY="q145_" SPARK_GRAFT_BENCH_OUT=BENCH_Q145_SF10_COLD_r16.json \
sbt -batch "runMain graft.Bench"
SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf10skew SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_BENCH_ONLY="q145_" SPARK_GRAFT_BENCH_OUT=BENCH_Q145_SF10_WARM_r16.json \
sbt -batch "runMain graft.Bench"

echo "=== STEP 7: 100x hot family + isolated q134 ($(date))"
FAMP="q25_,q26_,q27_,q59_,q61_,q102_,q113_,q130_,q132_,q133_,q134_,q135_,q136_,q137_,q138_,q139_,q141_,q142_,q143_,q144_,q145_"
SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf10skew SPARK_GRAFT_BENCH_RUNS=1 \
SPARK_GRAFT_BENCH_ONLY="$FAMP" SPARK_GRAFT_BENCH_OUT=BENCH_SF10_hot_r16.json \
sbt -batch "runMain graft.Bench"
SPARK_GRAFT_SF_DIR=/root/repo/scaledata/sf10skew SPARK_GRAFT_BENCH_RUNS=2 \
SPARK_GRAFT_BENCH_ONLY="q134_" SPARK_GRAFT_BENCH_OUT=BENCH_Q134_SF10_r16.json \
sbt -batch "runMain graft.Bench"

echo "=== STEP 8: sf0.1 full clean bench + shared-49 binding ($(date))"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=2 \
SPARK_GRAFT_BENCH_OUT=BENCH_r16_clean.json sbt -batch "runMain graft.Bench"
S49=$(python3 - <<'EOF'
import json
names = sorted(json.load(open('/tmp/verify_out/oracle_sql.json')))
print(','.join(sorted({n.split('_')[0] + '_' for n in names
                       if n[1:3].isdigit() and int(n[1:3]) <= 49 and len(n.split('_')[0]) == 3})))
EOF
)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=2 \
SPARK_GRAFT_BENCH_ONLY="$S49" SPARK_GRAFT_BENCH_OUT=BENCH_SHARED49_r16.json \
sbt -batch "runMain graft.Bench"

echo "=== STEP 9: gate fuzz at 1000 ($(date))"
rm -rf /tmp/fuzz_r16
sbt -batch "runMain graft.FuzzVerify /root/testdata/sf0.01 /tmp/fuzz_r16 1000"
python3 scripts/check.py /root/testdata/sf0.01 /tmp/fuzz_r16 | tail -3
echo "=== CHAIN DONE ($(date))"

# ---- continuation session (same round, post-crash recovery) ----------
# Steps 6-9 above were executed in this continuation; additionally:

echo "=== STEP 10: full-inventory Verify + gate at 10x ($(date))"
rm -rf /tmp/v_sf1_full_r16
sbt -batch "runMain graft.Verify /root/repo/scaledata/sf1skew /tmp/v_sf1_full_r16"
# 4 round-robin mem-capped lanes (GRAFT_DUCKDB_MEM=16GB THREADS=8,
# timeout 2700) -> merge_scale.py -> CORRECTNESS_SF1_r16.json (148/148,
# zero retries).

echo "=== STEP 11: 100x complement Verify + gate ($(date))"
# complement = full inventory minus the 40-query heavy family already
# gated in CORRECTNESS_SF10_r16 (108 queries)
rm -rf /tmp/v_sf10_comp_r16
SPARK_DRIVER_MEM=64g sbt -batch "runMain graft.Verify /root/repo/scaledata/sf10skew /tmp/v_sf10_comp_r16 $(cat /tmp/sf10_comp_r16.txt)"
# 4 round-robin mem-capped lanes (16GB/8thr, timeout 3600): 107/108
# within budget; q53_contamination's oracle (per-row list_intersect
# against the unioned bench list) timed out -> rewritten to the
# exactly-equivalent unnest+hash-join form (Pipeline.scala), values
# re-verified at sf0.01 (148/148) + sf0.1, then re-gated at 7200s
# (~5 min actual). Union of heavy-40 + complement + q53 ->
# CORRECTNESS_SF10_FULL_r16.json: 148/148 — full inventory at 100x.

echo "=== STEP 12: independent sbt test at r16 HEAD ($(date))"
sbt -batch test   # 485/485
