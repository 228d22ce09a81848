"""Splittable multiLine-CSV re-chunk (sources/csv_rechunk.py, VERDICT r2 #5).

Pins the property the helper exists for: a single multiLine CSV file
scans as ONE task (unsplittable by construction), and the re-chunked
parquet staging scans with real parallelism — plus content fidelity
through embedded newlines and RFC-4180 doubled quotes, and idempotent
reuse of the staged version.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbnb_listings_reviews_data_engineering_spark.sources.csv_rechunk import (
    rechunk_multiline_csv,
)
from airbnb_listings_reviews_data_engineering_spark.sources.staging import ROOT_CONF

N_ROWS = 20_000

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("body", T.StringType()),
        T.StructField("tag", T.StringType()),
    ]
)


@pytest.fixture(scope="module")
def one_file_csv(spark, tmp_path_factory):
    """One 20k-row CSV file whose every `body` field holds embedded
    newlines and doubled-quote escapes — the real-dump shape at a
    many-row size (multi-GB-shaped: parse cost is per-row, so row count
    is what stresses the single-task parse)."""
    root = tmp_path_factory.mktemp("rechunk")
    src = str(root / "src")
    df = spark.range(N_ROWS).select(
        F.col("id"),
        F.concat(
            F.lit('line one "q'),
            F.lit('"'),  # doubled in CSV by the writer's escape
            F.lit('uoted"\nline two of row '),
            F.col("id").cast("string"),
            F.lit("\nline three"),
        ).alias("body"),
        (F.col("id") % 7).cast("string").alias("tag"),
    )
    df.coalesce(1).write.mode("overwrite").option("header", True).option(
        "quote", '"'
    ).option("escape", '"').csv(src)
    return src, df


def test_multiline_read_is_single_task_but_rechunk_splits(
    spark, one_file_csv, tmp_path
):
    src, df = one_file_csv
    spark.conf.set(ROOT_CONF, str(tmp_path))
    try:
        raw = (
            spark.read.option("header", True)
            .option("multiLine", True)
            .option("quote", '"')
            .option("escape", '"')
            .csv(src, schema=SCHEMA)
        )
        # the documented caveat: one file -> one task, whatever its size
        assert raw.rdd.getNumPartitions() == 1
        staged = rechunk_multiline_csv(
            spark, src, SCHEMA, stage_key="t1", partitions=8
        )
        assert staged.rdd.getNumPartitions() >= 4
        assert staged.count() == N_ROWS
    finally:
        spark.conf.unset(ROOT_CONF)


def test_rechunk_content_fidelity(spark, one_file_csv, tmp_path):
    src, df = one_file_csv
    spark.conf.set(ROOT_CONF, str(tmp_path))
    try:
        staged = rechunk_multiline_csv(
            spark, src, SCHEMA, stage_key="t2", partitions=4
        )
        got = {r["id"]: (r["body"], r["tag"]) for r in staged.collect()}
        want = {r["id"]: (r["body"], r["tag"]) for r in df.collect()}
        assert got == want  # newlines and doubled quotes survive intact
    finally:
        spark.conf.unset(ROOT_CONF)


def test_rechunk_reuse_skips_reparse(spark, one_file_csv, tmp_path):
    src, _df = one_file_csv
    spark.conf.set(ROOT_CONF, str(tmp_path))
    try:
        first = rechunk_multiline_csv(
            spark, src, SCHEMA, stage_key="t3", partitions=4
        )
        assert first.count() == N_ROWS
        import shutil

        shutil.rmtree(src)  # source gone: refresh=False must not re-read it
        again = rechunk_multiline_csv(
            spark, src, SCHEMA, stage_key="t3", partitions=4, refresh=False
        )
        assert again.count() == N_ROWS
    finally:
        spark.conf.unset(ROOT_CONF)
