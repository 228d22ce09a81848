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
