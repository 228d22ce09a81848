"""Simulate the driver's t2 correctness gate locally.

Runs every ``queries()[name]`` on Spark and the matching ``oracle_sql()[name]``
on DuckDB over the same parquet tables, comparing row count, sorted column
names, and an order-insensitive value multiset (stringified; floats compared
bitwise via repr() — every query's determinism contract makes floats
bitwise-equal cross-engine).

Usage: python scripts/oracle_check.py [sf_dir] [key ...]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.checkpoint import (  # noqa: E402
    release_pins,
)
from airbnb_listings_reviews_data_engineering_spark.plans.registry import (  # noqa: E402
    REGISTRY,
    TABLES,
    lint_oracle_types,
)
from airbnb_listings_reviews_data_engineering_spark.session import (  # noqa: E402
    get_spark,
)


def norm_cell(v):
    import datetime
    import decimal
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr, matching tests/test_driver_oracle.py: every query's
        # determinism contract makes floats bitwise-equal cross-engine
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{norm_cell(v[k])}" for k in sorted(v)) + "}"
    if hasattr(v, "asDict"):
        d = v.asDict()
        return "{" + ",".join(f"{k}:{norm_cell(d[k])}" for k in sorted(d)) + "}"
    return str(v)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    sig = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    return sorted_cols, sig


def _parse_sf(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return -1.0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    sf = _parse_sf(sf_dir)
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = queries()
    oracles = oracle_sql()
    failures = []
    # per-key wall time (VERDICT r11 #8): the full mirror is the gate's
    # longest non-pytest step — record each key's cost in the log and
    # summarize the top-10 so a key whose oracle got expensive surfaces
    # the same way a bench budget violation does
    key_secs: dict[str, float] = {}
    import time as _time

    for key, fn in qs.items():
        if only and key not in only:
            continue
        _t0 = _time.perf_counter()

        def _el(_t0=_t0, key=key) -> str:
            dt = _time.perf_counter() - _t0
            key_secs[key] = dt
            return f"{dt:.1f}s"

        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append((key, f"SPARK ERROR: {e}"))
            print(f"FAIL {key}: spark error: {e} ({_el()})")
            continue
        finally:
            # result fully collected (or failed) — free any checkpoint
            # blocks this query pinned, so 182 queries in one session
            # don't accumulate executor storage (ADVICE r2)
            release_pins(spark)
        if key not in oracles:
            print(f"ok   {key}: rows-only ({len(srows)} rows, {_el()})")
            continue
        # Scaled-parameter keys (SemDedup k, FFD groups): the Spark side
        # reads its scale knob from parquet footers; such keys register
        # an oracle_tmpl that renders the SQL with the SAME knob for
        # this sf_dir, so the compare hash-matches at every scale (the
        # driver's static oracle is the sf0.01 rendering of the same
        # template — asserted by tests/test_driver_oracle.py). Keys
        # still declaring only gate_sf_max downgrade to rows-only above
        # the bound (ADVICE r7; no registered key does as of round 11).
        spec = REGISTRY.get(key)
        osql = spec.oracle_for(sf_dir) if spec is not None else oracles[key]
        if (
            spec is not None
            and spec.oracle_tmpl is None
            and spec.gate_sf_max is not None
            and sf > spec.gate_sf_max + 1e-12
        ):
            print(
                f"ok   {key}: rows-only ({len(srows)} rows) — SKIPPED "
                f"oracle compare: scaled-param key, parity pinned to "
                f"sf <= {spec.gate_sf_max} (sf_dir is sf{sf:g}, {_el()})"
            )
            continue
        try:
            orel = con.sql(osql)
            type_errs = lint_oracle_types(orel.columns, orel.types, key)
            if type_errs:
                failures.append((key, "; ".join(type_errs)))
                print(f"FAIL {key}: {'; '.join(type_errs)} ({_el()})")
                continue
            rel = con.execute(osql)
            ocols = [d[0] for d in rel.description]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((key, f"DUCKDB ERROR: {e}"))
            print(f"FAIL {key}: duckdb error: {e} ({_el()})")
            continue
        sc, ss = frame_sig(scols, srows)
        oc, os_ = frame_sig(ocols, orows)
        if len(srows) != len(orows):
            failures.append((key, f"rowcount {len(srows)} vs {len(orows)}"))
            print(f"FAIL {key}: rowcount {len(srows)} vs {len(orows)} ({_el()})")
        elif sc != oc:
            failures.append((key, f"cols {sc} vs {oc}"))
            print(f"FAIL {key}: cols {sc} vs {oc} ({_el()})")
        elif ss != os_:
            diff = next(
                (i for i, (a, b) in enumerate(zip(ss, os_)) if a != b), None
            )
            detail = (
                f"first diff row {diff}:\n  spark: {ss[diff][:300]}\n  duck:  {os_[diff][:300]}"
                if diff is not None
                else "??"
            )
            failures.append((key, "value mismatch"))
            print(f"FAIL {key}: value mismatch ({_el()}); {detail}")
        else:
            print(f"ok   {key}: {len(srows)} rows match ({_el()})")
    if len(key_secs) > 1:
        top = sorted(key_secs.items(), key=lambda kv: -kv[1])[:10]
        print("\nslowest mirror keys (wall s):")
        for k, dt in top:
            print(f"  {dt:7.1f}s {k}")
        print(f"total mirror wall: {sum(key_secs.values()):.0f}s over "
              f"{len(key_secs)} keys")
    print(f"\n{len(failures)} failures / {len(only) if only else len(qs)} checked")
    for k, m in failures:
        print(f"  {k}: {m.splitlines()[0]}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
