"""Property-based tests (hypothesis) for the cleaning primitives —
SURVEY.md §5.4: money-parser roundtrip, zipcode-normalizer invariants.

The properties run against the REAL Spark expressions (one local
DataFrame per example batch would be slow, so examples are accumulated
into a single batched DataFrame per property run)."""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airbnb_listings_reviews_data_engineering_spark.airbnb.etl import parse_money

settings.register_profile("spark", max_examples=30, deadline=None)
settings.load_profile("spark")


@st.composite
def money_strings(draw):
    """Reference-shaped money text: optional '$', thousands commas, 2dp."""
    units = draw(st.integers(min_value=0, max_value=99_999_999))
    cents = draw(st.integers(min_value=0, max_value=99))
    dollar = draw(st.booleans())
    commas = draw(st.booleans())
    body = f"{units:,d}" if commas else str(units)
    return (
        ("$" if dollar else "") + body + f".{cents:02d}",
        Decimal(units) + Decimal(cents) / 100,
    )


@given(st.lists(money_strings(), min_size=1, max_size=50))
def test_money_parse_roundtrip(spark, examples):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(examples)], "i int, price string"
    )
    out = {
        r.i: r.parsed
        for r in df.select("i", parse_money("price").alias("parsed")).collect()
    }
    for i, (_, expected) in enumerate(examples):
        assert out[i] == expected, (examples[i], out[i])


def _zip_norm():
    return F.when(
        F.length("zipcode") > 5, F.substring("zipcode", 1, 5)
    ).otherwise(F.col("zipcode"))


@given(
    st.lists(
        st.one_of(
            st.from_regex(r"[0-9]{5}", fullmatch=True),
            st.from_regex(r"[0-9]{5}-[0-9]{1,4}", fullmatch=True),
            st.from_regex(r"[0-9]{1,4}", fullmatch=True),
            st.none(),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_zipcode_normalizer_invariants(spark, zips):
    df = spark.createDataFrame(
        [(i, z) for i, z in enumerate(zips)], "i int, zipcode string"
    )
    out = {r.i: r.z for r in df.select("i", _zip_norm().alias("z")).collect()}
    for i, z in enumerate(zips):
        got = out[i]
        if z is None:
            assert got is None
        else:
            # invariants: length <= 5, output is a prefix of the input,
            # already-short inputs pass through unchanged
            assert got is not None and len(got) <= 5
            assert z.startswith(got)
            if len(z) <= 5:
                assert got == z
