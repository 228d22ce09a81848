#!/usr/bin/env bash
# Round-close exit gate (VERDICT r7 #8; reworked r12 per VERDICT r11
# #1/#2/#5/#8): ONE command that runs everything a round must have
# green AFTER its last code commit, in an order that keeps the bench
# artifact trustworthy and couples the proof to HEAD mechanically:
#
#   0. refuse to run with uncommitted CODE (*.py/*.sh/*.sql) — the
#      manifest must describe a commit, not a dirty tree
#   1. idle-wait: block until 1-min loadavg is low enough that bench
#      numbers mean something (or time out loudly)
#   2. sf0.1 bench FIRST — before the mirror + 20-min pytest suite
#      heat the box (r10/r11 recorded hot-box numbers) — full headline
#      once + the comparable set twice more in fresh processes; the
#      OFFICIAL number is the MEDIAN of the 3 subtotals (VERDICT r12
#      #1: a single bounce draw can't be the number of record), with
#      the per-key normalized budget and a consecutive-GATE agreement
#      line
#   3. full oracle mirror at driver fidelity -> last_mirror_run.log
#      (now with per-key wall times + top-10 slowest summary)
#   4. COVERAGE.md regeneration + SURVEY.md key-index refresh
#   5. survey completeness check
#   6. full pytest
#   7. fresh-process rotation age report (every key <= 2 rounds old)
#   8. gate_manifest.json: git SHA + sha256 of both logs — the judge
#      verifies the manifest's SHA is the round's last code commit and
#      the committed logs hash to the manifest's digests; the gate goes
#      RED if HEAD moved while it ran
#
# Run from /root/repo:   bash scripts/exit_gate.sh
set -uo pipefail
cd "$(dirname "$0")/.."

SHA_START=$(git rev-parse HEAD)
TS_START=$(date -u +%Y-%m-%dT%H:%M:%SZ)
echo "== exit gate: $TS_START @ ${SHA_START:0:10}"

echo "== 0/8 clean-code check"
DIRTY_CODE=$(git status --porcelain | grep -E '\.(py|sh|sql)$' || true)
if [ -n "$DIRTY_CODE" ]; then
  echo "$DIRTY_CODE"
  echo "EXIT GATE RED: uncommitted code — commit before running the gate"
  exit 1
fi

echo "== 1/8 idle-wait (1-min loadavg <= ${GATE_MAX_LOAD:=12.0}, up to ${GATE_IDLE_WAIT_SEC:=600}s)"
waited=0
while :; do
  load=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(python - "$load" "$GATE_MAX_LOAD" <<'PY'
import sys
print(1 if float(sys.argv[1]) <= float(sys.argv[2]) else 0)
PY
)
  [ "$ok" = "1" ] && { echo "loadavg $load ok (waited ${waited}s)"; break; }
  if [ "$waited" -ge "$GATE_IDLE_WAIT_SEC" ]; then
    echo "WARNING: loadavg still $load after ${waited}s — bench numbers may be load-inflated (recorded in manifest)"
    break
  fi
  sleep 15; waited=$((waited + 15))
done
LOAD_AT_BENCH=$(cut -d' ' -f1 /proc/loadavg)

echo "== 2/8 bench per-key budget (sf0.1; full headline once + comparable set 2 more times, official number = MEDIAN of the 3 subtotals — VERDICT r12 #1)"
PREV_MEDIAN=$(python - <<'PY' 2>/dev/null
import json
m = json.load(open("scripts/gate_manifest.json"))
print(m.get("bench_r2_median", m.get("bench_subtotal_r2_norm", "")))
PY
)
python bench.py 2>/dev/null | tee scripts/last_bench_run.log | tail -1
for i in 1 2; do
  echo "-- comparable-set rerun $i/2 (fresh process)"
  SPARK_GRAFT_BENCH_ONLY=r2 python bench.py 2>/dev/null \
    | tee "scripts/bench_gate_r2_run$i.log" | tail -1
done
python - "$PREV_MEDIAN" <<'PY' || { echo "EXIT GATE RED: per-key bench budget exceeded"; exit 1; }
import json, statistics, sys

def head(path):
    lines = [l for l in open(path) if l.strip().startswith("{")]
    return json.loads(lines[-1])

main = head("scripts/last_bench_run.log")
viol = main.get("budget_violations", {})
if viol:
    print(f"budget violations (> normalized per-key cap): {viol}")
    sys.exit(1)
print("per-key budget ok (violations: none)")
subs = [main.get("subtotal_r2_norm")] + [
    head(f"scripts/bench_gate_r2_run{i}.log").get("subtotal_r2_norm")
    for i in (1, 2)
]
med = round(statistics.median(subs), 3)
print(f"comparable subtotals (3 fresh-process runs): {subs}; MEDIAN = {med}")
prev = sys.argv[1]
if prev:
    delta = (med - float(prev)) / float(prev) * 100
    tag = "ok (<=10%)" if abs(delta) <= 10 else "ABOVE the 10% agreement bar"
    print(f"consecutive-GATE agreement: median {prev} -> {med} "
          f"({delta:+.1f}%, {tag})")
PY

echo "== 3/8 full oracle mirror (sf0.01)"
python scripts/oracle_check.py 2>/dev/null | tee scripts/last_mirror_run.log | tail -2
grep -q "^0 failures" <(tail -2 scripts/last_mirror_run.log) || {
  echo "EXIT GATE RED: oracle mirror has failures"; exit 1; }
echo "-- top mirror costs:"
grep -A 11 "^slowest mirror keys" scripts/last_mirror_run.log || true

echo "== 4/8 coverage + survey index regeneration"
python scripts/gen_coverage.py scripts/last_mirror_run.log || {
  echo "EXIT GATE RED: coverage generation failed"; exit 1; }

echo "== 5/8 survey completeness check"
python scripts/check_survey.py || {
  echo "EXIT GATE RED: survey check failed"; exit 1; }

echo "== 6/8 full pytest"
python -m pytest tests/ -q --tb=line 2>&1 | tail -3 | tee /tmp/gate_pytest_tail
rc=${PIPESTATUS[0]}
[ "$rc" -eq 0 ] || { echo "EXIT GATE RED: pytest exit $rc"; exit 1; }

echo "== 7/8 fresh-process rotation age"
python scripts/mirror_rotate.py --report || {
  echo "EXIT GATE RED: a registered key has no independent evidence within 2 rounds — run scripts/mirror_rotate.py"; exit 1; }

echo "== 8/8 gate manifest"
SHA_END=$(git rev-parse HEAD)
if [ "$SHA_END" != "$SHA_START" ]; then
  echo "EXIT GATE RED: HEAD moved during the gate ($SHA_START -> $SHA_END) — re-run at the final commit"
  exit 1
fi
python - "$SHA_START" "$TS_START" "$LOAD_AT_BENCH" <<'PY'
import hashlib, json, subprocess, sys, time

def sha256(p):
    return hashlib.sha256(open(p, "rb").read()).hexdigest()

bench = [l for l in open("scripts/last_bench_run.log") if l.strip().startswith("{")]
head = json.loads(bench[-1])
import statistics
r2_subs = [head.get("subtotal_r2_norm")]
for i in (1, 2):
    lines = [l for l in open(f"scripts/bench_gate_r2_run{i}.log")
             if l.strip().startswith("{")]
    r2_subs.append(json.loads(lines[-1]).get("subtotal_r2_norm"))
age = 0
for line in subprocess.run(
    [sys.executable, "scripts/mirror_rotate.py", "--report"],
    capture_output=True, text=True).stdout.splitlines():
    if line.startswith("oldest_fresh_process_age_rounds="):
        age = int(line.split("=")[1])
manifest = {
    "git_sha": sys.argv[1],
    "started": sys.argv[2],
    "finished": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    "loadavg_at_bench": float(sys.argv[3]),
    "mirror_log_sha256": sha256("scripts/last_mirror_run.log"),
    "bench_log_sha256": sha256("scripts/last_bench_run.log"),
    "bench_r2_run_log_sha256": [
        sha256(f"scripts/bench_gate_r2_run{i}.log") for i in (1, 2)
    ],
    "bench_subtotal_r2_norm": head.get("subtotal_r2_norm"),
    # the round's OFFICIAL comparable number: median of 3 fresh-process
    # subtotals (full-headline run + 2 comparable-set reruns) — a single
    # tail-wind/bounce draw can no longer be the number of record
    # (VERDICT r12 #1)
    "bench_r2_subtotals": r2_subs,
    "bench_r2_median": round(statistics.median(r2_subs), 3),
    "bench_headline_norm": head.get("value_norm"),
    "pytest_tail": open("/tmp/gate_pytest_tail").read().strip().splitlines()[-1],
    "oldest_fresh_process_age_rounds": age,
}
json.dump(manifest, open("scripts/gate_manifest.json", "w"), indent=1)
print(json.dumps(manifest, indent=1))
PY

echo "== exit gate GREEN: $(date -u +%Y-%m-%dT%H:%M:%SZ) @ ${SHA_START:0:10}"
echo "   commit scripts/last_mirror_run.log scripts/last_bench_run.log scripts/gate_manifest.json (+ regenerated COVERAGE/SURVEY) in the round-close commit"
