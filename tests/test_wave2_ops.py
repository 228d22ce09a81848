"""Unit tests for sample_weighted, join_asof_tolerance,
mm_shard_manifest, text_minhash_containment on crafted inputs."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from airbnb_listings_reviews_data_engineering_spark.plans.pipeline_ext import (
    mm_shard_manifest,
    text_minhash_containment,
)
from airbnb_listings_reviews_data_engineering_spark.plans.sampling_ext import (
    sample_weighted,
)
from airbnb_listings_reviews_data_engineering_spark.plans.window_ext import (
    join_asof_tolerance,
)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def _write_events(spark, tmp_path, rows):
    base = dt.datetime(2024, 1, 1)
    data = [
        (eid, base + dt.timedelta(minutes=m), uid, et, 1.0, "{}")
        for eid, uid, et, m in rows
    ]
    spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    return str(tmp_path)


def test_sample_weighted_huge_weight_always_selected(spark, tmp_path):
    # doc 999 has overwhelming weight -> its ES key is ~0, always in top-5
    rows = [(i, "t", "en", "s0", 10) for i in range(30)]
    rows.append((999, "t", "en", "s0", 1_000_000_000))
    sf = _write_docs(spark, tmp_path, rows)
    out = sample_weighted(spark, sf)
    ids = {r.doc_id for r in out.collect()}
    assert 999 in ids and len(ids) == 5


def test_sample_weighted_is_rerun_stable(spark, tmp_path):
    rows = [(i, "t", "en", f"s{i % 3}", 10 + i) for i in range(60)]
    sf = _write_docs(spark, tmp_path, rows)
    a = sorted((r.source, r.doc_id) for r in sample_weighted(spark, sf).collect())
    b = sorted((r.source, r.doc_id) for r in sample_weighted(spark, sf).collect())
    assert a == b
    # exactly 5 per source
    from collections import Counter

    assert set(Counter(s for s, _ in a).values()) == {5}


def test_asof_tolerance_strict_and_bounded(spark, tmp_path):
    rows = [
        # user 1: click at 0, purchases at 0 (same instant -> excluded),
        # 30 (within 1 h -> attributed), 40 (later, ignored)
        (1, 1, "click", 0), (2, 1, "purchase", 0),
        (3, 1, "purchase", 30), (4, 1, "purchase", 40),
        # user 2: click at 0, first purchase at 90 min -> beyond tolerance
        (5, 2, "click", 0), (6, 2, "purchase", 90),
        # user 3: click with no purchase
        (7, 3, "click", 0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {r.event_id: (r.purchase_id, r.latency_s)
           for r in join_asof_tolerance(spark, sf).collect()}
    assert out[1] == (3, 1800.0)
    assert out[5] == (None, None)
    assert out[7] == (None, None)


def test_shard_manifest_offsets_are_contiguous(spark, tmp_path):
    rows = [(i, "x" * 100, "en", "s0", 100) for i in range(50)]
    sf = _write_docs(spark, tmp_path, rows)
    out = sorted(
        (r.doc_id, r.shard, r.offset, r.nb) for r in mm_shard_manifest(spark, sf).collect()
    )
    # every shard starts at offset 0 and members are back-to-back
    pos = {}
    for doc_id, shard, offset, nb in out:
        assert offset == pos.get(shard, 0)
        pos[shard] = offset + nb
    # 50 docs x 100 bytes = 5000 bytes -> one 64 KiB shard
    assert {s for _, s, _, _ in out} == {0}


def test_containment_detects_subdocument(spark, tmp_path):
    words = [f"w{i}" for i in range(20)]
    inner = " ".join(words[:10])           # doc 1
    outer = " ".join(words)                # doc 2 contains doc 1's prefix
    other = " ".join(f"z{i}" for i in range(12))
    sf = _write_docs(
        spark,
        tmp_path,
        [(1, inner, "en", "s0", 1), (2, outer, "en", "s0", 1),
         (3, other, "en", "s0", 1)],
    )
    out = {(r.doc_a, r.doc_b): r.containment
           for r in text_minhash_containment(spark, sf).collect()}
    # all 8 of doc 1's shingles appear in doc 2 -> containment 1.0
    assert out[(1, 2)] == 1.0
    # doc 2 -> doc 1 is diluted (8 of 18 shingles) -> below 0.8, absent
    assert (2, 1) not in out
    assert all(3 not in pair for pair in out)


def test_point_in_time_never_leaks_future_versions(spark, tmp_path):
    import datetime as dt
    from airbnb_listings_reviews_data_engineering_spark.plans.window_ext import (
        join_point_in_time,
    )

    d = dt.date
    orders = spark.createDataFrame(
        [
            # customer 1: URGENT from Jan, LOW from Mar
            (100, 1, d(2024, 1, 1), "1-URGENT"),
            (101, 1, d(2024, 3, 1), "5-LOW"),
        ],
        "o_orderkey long, o_custkey long, o_orderdate date, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            # ships in Feb (order 100): URGENT era
            (100, d(2024, 2, 1), 10.0, 0.0),
            # order 100's later line ships in April: by then LOW — the
            # leakage-prone case a naive "current value" join gets wrong
            (100, d(2024, 4, 1), 20.0, 0.0),
            (101, d(2024, 3, 15), 40.0, 0.0),
        ],
        "l_orderkey long, l_shipdate date, l_extendedprice double, l_discount double",
    )
    sf = str(tmp_path)
    orders.write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    li.write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    out = {r.prio_at_ship: (r.n_lines, r.revenue)
           for r in join_point_in_time(spark, sf).collect()}
    assert out == {"1-URGENT": (1, 10.0), "5-LOW": (2, 60.0)}
