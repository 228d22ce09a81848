"""Rotating deep-verify: fresh-process oracle checks for the registered
keys with the OLDEST independent evidence (VERDICT r10 #4).

The driver's 50-key random sample has touched only ~113 of the 400+
registered keys across ten rounds; the rest are covered only by the
single-session mirror (scripts/oracle_check.py), which can mask
session-state leakage (a key that passes because an earlier key in the
same session warmed a cache, registered a temp view, or left a staging
artifact). This script burns that blind spot down a cohort per round:

1. Rank every registered key by (last driver-sampled round from
   CORRECTNESS_r*.json, last rotation round from the state file, key
   name) — never-driver-sampled and never-rotated keys first.
2. Take the oldest N (default 40).
3. Run EACH in a FRESH python process (`oracle_check.py <sf_dir> <key>`)
   — one JVM, one DuckDB, one key — so nothing another key did in-
   session can help it pass.
4. Record per-key verdicts in scripts/mirror_rotate_state.json (which
   future runs use to advance the rotation) and append a human-readable
   log to scripts/mirror_rotate.log (committed with the round).

Usage: python scripts/mirror_rotate.py [--n 40] [--sf-dir /root/testdata/sf0.01]
Exit 0 iff every key in the cohort passed.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE_PATH = os.path.join(REPO, "scripts", "mirror_rotate_state.json")
LOG_PATH = os.path.join(REPO, "scripts", "mirror_rotate.log")


def driver_sample_rounds() -> dict[str, int]:
    """{key: last round the driver's CORRECTNESS sample touched it}."""
    seen: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        try:
            rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
            for k in json.load(open(f)):
                seen[k] = max(seen.get(k, 0), rnd)
        except Exception:  # noqa: BLE001 — a malformed artifact skips
            continue
    return seen


def load_state() -> dict:
    if os.path.exists(STATE_PATH):
        return json.load(open(STATE_PATH))
    return {"rotated": {}}


def registered_keys() -> list[str]:
    sys.path.insert(0, REPO)
    from airbnb_listings_reviews_data_engineering_spark.plans import (
        all_queries,
    )

    return sorted(all_queries())


def pick_cohort(n: int) -> list[str]:
    driver = driver_sample_rounds()
    state = load_state()
    rotated = state.get("rotated", {})
    keys = registered_keys()
    # oldest evidence first: never driver-sampled AND never rotated
    # sorts before everything; ties break by name for determinism
    keys.sort(
        key=lambda k: (
            max(driver.get(k, 0), rotated.get(k, {}).get("round", 0)),
            rotated.get(k, {}).get("ts", 0),
            k,
        )
    )
    return keys[:n]


def report_ages(rnd: int) -> int:
    """Print the independent-evidence age distribution and return the
    oldest age in rounds (VERDICT r11 #5: the exit gate surfaces
    staleness at round close — every key should be <= 2 rounds from a
    driver sample or a fresh-process rotation)."""
    driver = driver_sample_rounds()
    rotated = load_state().get("rotated", {})
    ages: dict[str, int] = {}
    for k in registered_keys():
        ev = max(driver.get(k, 0), rotated.get(k, {}).get("round", 0))
        ages[k] = rnd - ev if ev else rnd
    hist: dict[int, int] = {}
    for a in ages.values():
        hist[a] = hist.get(a, 0) + 1
    oldest = max(ages.values(), default=0)
    print(f"evidence ages at round {rnd} (age_rounds: n_keys): "
          + ", ".join(f"{a}: {hist[a]}" for a in sorted(hist)))
    worst = sorted(ages.items(), key=lambda kv: -kv[1])[:5]
    print("oldest keys: " + ", ".join(f"{k}({a})" for k, a in worst))
    print(f"oldest_fresh_process_age_rounds={oldest}")
    return oldest


def _run_one(key: str, sf_dir: str, child_cpus: int) -> tuple[str, bool, str, float]:
    """One fresh-process oracle check; returns (key, ok, tail, secs)."""
    t0 = time.time()
    tail = ""
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(child_cpus))
    try:
        proc = subprocess.run(
            [sys.executable,
             os.path.join(REPO, "scripts", "oracle_check.py"),
             sf_dir, key],
            capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
        )
        ok = proc.returncode == 0 and "0 failures" in proc.stdout
        if not ok:
            tail = "\n".join(
                (proc.stdout.splitlines() + proc.stderr.splitlines())[-8:]
            )
    except subprocess.TimeoutExpired:
        ok = False
        tail = "TIMEOUT after 600s (fresh-process oracle_check hung)"
    return key, ok, tail, time.time() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument(
        "--workers", type=int, default=1,
        help="fresh processes to run concurrently (VERDICT r12 #5: "
        "~250 keys/round needs parallelism; each child JVM is capped "
        "to --child-cpus cores so N children share the box). Isolation "
        "is unchanged — every key still gets its own process.",
    )
    ap.add_argument("--child-cpus", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--report", action="store_true",
        help="print the evidence-age distribution and exit (exit code 1 "
        "iff the oldest age exceeds 2 rounds)",
    )
    ap.add_argument(
        "--round", type=int, default=0,
        help="round number recorded in the state file (0 = infer from "
        "max CORRECTNESS round + 1)",
    )
    ap.add_argument(
        "--keys", default="",
        help="comma-separated explicit cohort (overrides the oldest-"
        "evidence picker; for re-verifying keys whose previous rotation "
        "hit an infrastructure failure)",
    )
    args = ap.parse_args()
    rnd = args.round or (max(driver_sample_rounds().values(), default=0) + 1)

    if args.report:
        return 1 if report_ages(rnd) > 2 else 0

    if args.keys:
        known = set(registered_keys())
        cohort = [k for k in args.keys.split(",") if k]
        unknown = [k for k in cohort if k not in known]
        if unknown:
            raise SystemExit(f"unknown keys: {unknown}")
    else:
        cohort = pick_cohort(args.n)
    state = load_state()
    results: dict[str, str] = {}
    t_start = time.time()
    # one hung oracle must not lose the cohort's accumulated verdicts
    # (ADVICE r11): TimeoutExpired is recorded as a FAIL and the state
    # file is dumped incrementally after EVERY completion. Completions
    # are funneled through this single thread, so the state writes
    # never race even with --workers > 1.
    from concurrent.futures import ThreadPoolExecutor, as_completed

    done = 0
    with ThreadPoolExecutor(max_workers=max(1, args.workers)) as ex:
        futs = [
            ex.submit(_run_one, key, args.sf_dir, args.child_cpus)
            for key in cohort
        ]
        for fut in as_completed(futs):
            key, ok, tail, secs = fut.result()
            done += 1
            results[key] = "ok" if ok else "FAIL"
            state.setdefault("rotated", {})[key] = {
                "round": rnd,
                "verdict": results[key],
                "ts": int(time.time()),
            }
            json.dump(state, open(STATE_PATH, "w"), indent=1, sort_keys=True)
            print(
                f"[{done}/{len(cohort)}] {results[key]:4s} {key} "
                f"({secs:.1f}s, fresh process)",
                flush=True,
            )
            if not ok:
                print(f"  --- output tail ---\n{tail}")
    n_fail = sum(1 for v in results.values() if v != "ok")
    stamp = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    with open(LOG_PATH, "a") as f:
        f.write(
            f"== rotate round {rnd} @ {stamp}: {len(cohort)} keys, "
            f"{n_fail} failures, {time.time() - t_start:.0f}s, "
            f"sf_dir={args.sf_dir}\n"
        )
        for k in cohort:
            f.write(f"   {results[k]:4s} {k}\n")
    print(f"\n{n_fail} failures / {len(cohort)} rotated (round {rnd})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
