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


def _coarse_spark_type(dt: str) -> str:
    dt = dt.lower()
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
    dt = str(dt).upper()
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
