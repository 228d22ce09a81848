"""Meta-tests for scripts/oracle_check.py's comparison core: the gate
must actually catch mismatches (a comparator that passes everything
would make 147 green queries meaningless)."""

from __future__ import annotations

import datetime
import importlib.util
import sys
from decimal import Decimal
from pathlib import Path

spec = importlib.util.spec_from_file_location(
    "oracle_check", Path(__file__).resolve().parent.parent / "scripts" / "oracle_check.py"
)
oc = importlib.util.module_from_spec(spec)
sys.modules["oracle_check"] = oc
spec.loader.exec_module(oc)


def test_identical_frames_match():
    cols = ["b", "a"]
    rows = [(1, "x"), (2, "y")]
    assert oc.frame_sig(cols, rows) == oc.frame_sig(cols, rows)


def test_row_order_insensitive():
    cols = ["a", "b"]
    assert oc.frame_sig(cols, [(1, "x"), (2, "y")]) == oc.frame_sig(
        cols, [(2, "y"), (1, "x")]
    )


def test_column_order_normalized_by_name():
    sig1 = oc.frame_sig(["a", "b"], [(1, "x")])
    sig2 = oc.frame_sig(["b", "a"], [("x", 1)])
    assert sig1 == sig2


def test_value_difference_detected():
    cols = ["a"]
    assert oc.frame_sig(cols, [(1,)]) != oc.frame_sig(cols, [(2,)])


def test_null_vs_zero_distinct():
    cols = ["a"]
    assert oc.frame_sig(cols, [(None,)]) != oc.frame_sig(cols, [(0,)])


def test_float_decimal_date_normalization():
    # Decimal trailing zeros normalize away; dates are ISO
    assert oc.norm_cell(Decimal("1.50")) == oc.norm_cell(Decimal("1.5"))
    assert oc.norm_cell(datetime.date(2024, 1, 2)) == "2024-01-02"
    assert oc.norm_cell([1, None, "x"]) == "[1,NULL,x]"


def test_float_comparison_is_exact():
    # repr-based: any bit difference is a mismatch (matches the pytest
    # oracle gate; every query's determinism contract guarantees
    # bitwise-equal floats cross-engine)
    assert oc.norm_cell(1.0000001) != oc.norm_cell(1.0000002)
    assert oc.norm_cell(0.1 + 0.2) != oc.norm_cell(0.3)
    assert oc.norm_cell(1.5) == oc.norm_cell(1.5)


def test_lint_flags_spark_incompatible_duckdb_types():
    """The round-4 postmortem class: an integer sum() types as HUGEINT in
    DuckDB, which the driver's hasher distinguishes from Spark's bigint
    even when values are identical — the mirror must FAIL such oracles,
    not pass them."""
    import duckdb

    from airbnb_listings_reviews_data_engineering_spark.plans.registry import (
        lint_oracle_types,
    )

    rel = duckdb.sql("SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)")
    errs = lint_oracle_types(rel.columns, rel.types, "demo_key")
    assert errs and "HUGEINT" in errs[0] and "demo_key" in errs[0]

    ok = duckdb.sql(
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)"
    )
    assert lint_oracle_types(ok.columns, ok.types, "demo_key") == []


def test_every_registered_oracle_is_lint_clean():
    """No registered oracle may emit a DuckDB type with no exact Spark
    analog — building each relation against the sf0.001 views is enough
    to resolve the output types."""
    import duckdb

    from airbnb_listings_reviews_data_engineering_spark.plans import all_queries
    from airbnb_listings_reviews_data_engineering_spark.plans.registry import (
        TABLES,
        lint_oracle_types,
    )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    bad = []
    for key, spec in all_queries().items():
        if spec.oracle is None:
            continue
        rel = con.sql(spec.oracle)
        bad += lint_oracle_types(rel.columns, rel.types, key)
    assert bad == []


def _split_top(s: str, sep: str) -> list[str]:
    """Split on ``sep`` at nesting depth 0 only (angle brackets and
    parens open a level) — DECIMAL(10,2) inside a STRUCT field list must
    not split on its own comma."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _coarse_spark_type(dt: str) -> str:
    dt = dt.strip().lower()
    # recurse into nested ELEMENT types (VERDICT r5 #5: array<bigint> vs
    # LIST(HUGEINT) must compare element-wise, like the scalars do)
    if dt.startswith("array<") and dt.endswith(">"):
        return f"array<{_coarse_spark_type(dt[6:-1])}>"
    if dt.startswith("map<") and dt.endswith(">"):
        k, v = _split_top(dt[4:-1], ",")
        return f"map<{_coarse_spark_type(k)},{_coarse_spark_type(v)}>"
    if dt.startswith("struct<") and dt.endswith(">"):
        fields = []
        for f in _split_top(dt[7:-1], ","):
            name, _, t = f.partition(":")
            fields.append(f"{name.strip()}:{_coarse_spark_type(t)}")
        return "struct<" + ",".join(fields) + ">"
    if dt.startswith("decimal"):
        return "decimal"
    if dt in ("bigint", "int", "smallint", "tinyint"):
        return "int"
    if dt in ("double", "float"):
        return "float"
    if dt == "boolean":
        return "bool"
    if dt in ("string", "varchar"):
        return "str"
    if dt == "date":
        return "date"
    if dt.startswith("timestamp"):
        return "ts"
    return dt


def _coarse_duck_type(dt) -> str:
    dt = str(dt).strip().upper()
    if dt.endswith("[]"):
        return f"array<{_coarse_duck_type(dt[:-2])}>"
    if dt.startswith("MAP(") and dt.endswith(")"):
        k, v = _split_top(dt[4:-1], ",")
        return f"map<{_coarse_duck_type(k)},{_coarse_duck_type(v)}>"
    if dt.startswith("STRUCT(") and dt.endswith(")"):
        fields = []
        for f in _split_top(dt[7:-1], ","):
            name, _, t = f.strip().partition(" ")
            fields.append(f'{name.strip().strip(chr(34)).lower()}:{_coarse_duck_type(t)}')
        return "struct<" + ",".join(fields) + ">"
    if dt.startswith("DECIMAL"):
        return "decimal"
    if dt in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT"):
        return "int"
    if dt in ("DOUBLE", "FLOAT", "REAL"):
        return "float"
    if dt == "BOOLEAN":
        return "bool"
    if dt in ("VARCHAR", "JSON"):
        # JSON stringifies identically; oracles still CAST to VARCHAR
        return "str"
    if dt == "DATE":
        return "date"
    if dt.startswith("TIMESTAMP"):
        return "ts"
    return dt.lower()


def test_coarse_types_recurse_into_nested():
    """array/struct/map ELEMENT types normalize like the scalars do:
    compatible nested pairs agree, incompatible ones stay distinct."""
    assert _coarse_spark_type("array<bigint>") == _coarse_duck_type("BIGINT[]")
    assert _coarse_spark_type("array<string>") == _coarse_duck_type("VARCHAR[]")
    assert _coarse_spark_type(
        "struct<p:int,m:double>"
    ) == _coarse_duck_type("STRUCT(p INTEGER, m DOUBLE)")
    assert _coarse_spark_type(
        "array<struct<p:int,m:decimal(10,2)>>"
    ) == _coarse_duck_type("STRUCT(p INTEGER, m DECIMAL(10,2))[]")
    assert _coarse_spark_type("map<string,bigint>") == _coarse_duck_type(
        "MAP(VARCHAR, BIGINT)"
    )
    # a nested element divergence must NOT collapse to equality
    assert _coarse_spark_type("array<bigint>") != _coarse_duck_type("DOUBLE[]")
    assert _coarse_spark_type("array<bigint>") != _coarse_duck_type(
        "BIGINT[][]"
    )


def test_lint_fires_on_nested_hugeint():
    """LIST(HUGEINT) must fail the no-Spark-analog lint exactly like a
    bare HUGEINT (VERDICT r5 #5's negative test): list_agg of an
    uncast sum() is the realistic way this type sneaks into an oracle."""
    import duckdb

    from airbnb_listings_reviews_data_engineering_spark.plans.registry import (
        lint_oracle_types,
    )

    rel = duckdb.sql(
        "SELECT list(s) AS xs FROM "
        "(SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x))"
    )
    assert str(rel.types[0]).upper() == "HUGEINT[]"
    errs = lint_oracle_types(rel.columns, rel.types, "demo_key")
    assert errs and "HUGEINT" in errs[0]
    # and the coarse differential sees the element type too
    assert _coarse_duck_type("HUGEINT[]") == "array<int>"


def test_spark_and_oracle_output_types_agree(spark):
    """Cross-engine TYPE differential over every registered key: a
    column typed DECIMAL by Spark but DOUBLE by DuckDB (or vice versa)
    can hash equal locally through string formatting and still diverge
    in the driver's normalizer — the round-4 HUGEINT failure class from
    the Spark side. Plans are built (never executed), so this covers
    all keys cheaply."""
    import duckdb

    from airbnb_listings_reviews_data_engineering_spark.checkpoint import (
        release_pins,
    )
    from airbnb_listings_reviews_data_engineering_spark.plans import all_queries
    from airbnb_listings_reviews_data_engineering_spark.plans.registry import (
        TABLES,
    )

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    bad = []
    for key, spec in sorted(all_queries().items()):
        if spec.oracle is None:
            continue
        try:
            sdf = spec.fn(spark, sf)
            stypes = {n: _coarse_spark_type(d) for n, d in sdf.dtypes}
            rel = con.sql(spec.oracle)
            dtypes = {
                c: _coarse_duck_type(t) for c, t in zip(rel.columns, rel.types)
            }
            bad += [
                (key, c, stypes[c], dtypes[c])
                for c in stypes
                if c in dtypes and stypes[c] != dtypes[c]
            ]
        finally:
            release_pins(spark)
    assert bad == []
