#!/bin/bash
# VERDICT r13 #8: interleaved 8c-vs-32c pairs taken in the SAME window
# for the top headline keys, so the scaling block rests on minima from
# alternating draws rather than two far-apart runs (the r13 c8
# comparison was void — the 32c run was load-inflated).
KEYS="${1:-stream_stateful_admission,stream_session_finalize,dedup_components,pipeline_dedup_policy,sim_ivfpq_apply,dedup_semdedup,mm_pair_dedup,sketch_bloom_rollup,text_unigram_lm_em,sketch_quantile_dyadic,profile_drift_ks,ml_logreg_gd}"
ROUNDS="${2:-3}"; OUT="${3:-/root/repo/scripts/scaling_r14.log}"
for i in $(seq 1 "$ROUNDS"); do
  for c in 32 8; do
    echo "{\"cpus\":$c,\"round\":$i,\"load\":$(cut -d' ' -f1 /proc/loadavg)}" >> "$OUT"
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=$c \
      SPARK_GRAFT_BENCH_ONLY="$KEYS" timeout 590 python /root/repo/bench.py 2>/dev/null \
      | grep -o '"queries":{[^}]*}' | head -1 >> "$OUT"
  done
done
echo DONE >> "$OUT"
