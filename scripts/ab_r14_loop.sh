#!/bin/bash
# Interleaved BEFORE/AFTER fresh-process bench subsets; per-key minima
# across draws are the credible estimator on this ambient-loaded box
# (OPTIMIZATION_r13.md methodology).
KEYS="$1"; ROUNDS="${2:-6}"; OUT="${3:-/root/repo/scripts/ab_r14.log}"
for i in $(seq 1 "$ROUNDS"); do
  echo "{\"side\":\"before\",\"round\":$i,\"load\":$(cut -d' ' -f1 /proc/loadavg)}" >> "$OUT"
  (cd /tmp/r14_before && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_ONLY="$KEYS" timeout 590 python bench.py 2>/dev/null \
    | grep -o '"queries":{[^}]*}' | head -1) >> "$OUT"
  echo "{\"side\":\"after\",\"round\":$i,\"load\":$(cut -d' ' -f1 /proc/loadavg)}" >> "$OUT"
  (SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
    SPARK_GRAFT_BENCH_ONLY="$KEYS" timeout 590 python bench.py 2>/dev/null \
    | grep -o '"queries":{[^}]*}' | head -1) >> "$OUT"
done
echo DONE >> "$OUT"
