#!/bin/bash
# Quiet-gated interleaved 32c/8c pairs: waits for 1-min loadavg < 1.2
# before EACH run (up to 20 min per wait), so the pair ratios are not
# inverted by ambient external load (the r13 and first r14 attempts
# were void for exactly that reason).
KEYS="stream_stateful_admission,stream_session_finalize,dedup_components,pipeline_dedup_policy,sim_ivfpq_apply,dedup_semdedup,mm_pair_dedup,sketch_bloom_rollup,text_unigram_lm_em,sketch_quantile_dyadic,profile_drift_ks,ml_logreg_gd"
OUT="/root/repo/scripts/scaling_quiet_r14.log"
wait_quiet() {
  for i in $(seq 1 120); do
    l=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$l" 'BEGIN{exit !(l < 1.2)}' && return 0
    sleep 10
  done
  return 0  # proceed anyway after 20 min; load is recorded per run
}
for i in 1 2; do
  for c in 32 8; do
    wait_quiet
    echo "{\"cpus\":$c,\"round\":$i,\"load\":$(cut -d' ' -f1 /proc/loadavg)}" >> "$OUT"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$c \
      SPARK_GRAFT_BENCH_ONLY="$KEYS" timeout 590 python /root/repo/bench.py 2>/dev/null \
      | grep -o '"queries":{[^}]*}' | head -1 >> "$OUT"
  done
done
echo DONE >> "$OUT"
