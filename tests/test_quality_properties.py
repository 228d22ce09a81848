"""Property tests for the quality/reconciliation family: boilerplate
line removal reconstructs exactly what a reference implementation keeps,
and rank-based decile binning always yields near-equal bins regardless
of ties or value distribution."""

from __future__ import annotations

import hashlib
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

settings.register_profile("spark_q", max_examples=15, deadline=None)
settings.load_profile("spark_q")

WORDS = ["alpha", "beta", "gamma", "delta", "eps"]


def _line_dedup_reference(docs: list[str]) -> dict[int, tuple[int, int, str]]:
    """Pure-python mirror of text_line_dedup semantics: 3-token lines,
    drop lines appearing in >1 doc, md5 of kept lines in order."""
    lines_per_doc = []
    for text in docs:
        tok = text.split(" ")
        lines = [
            " ".join(tok[i : i + 3]) for i in range(0, len(tok), 3)
        ]
        lines_per_doc.append(lines)
    df = Counter()
    for lines in lines_per_doc:
        for line in set(lines):
            df[line] += 1
    out = {}
    for doc_id, lines in enumerate(lines_per_doc):
        kept = [ln for ln in lines if df[ln] == 1]
        digest = (
            hashlib.md5(" ".join(kept).encode()).hexdigest() if kept else ""
        )
        out[doc_id] = (len(lines), len(kept), digest)
    return out


@given(
    st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=12).map(
            " ".join
        ),
        min_size=1,
        max_size=12,
    )
)
def test_line_dedup_matches_reference(spark, docs):
    from airbnb_listings_reviews_data_engineering_spark.plans.pipeline_ext import text_line_dedup

    import os
    import tempfile

    ref = _line_dedup_reference(docs)
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "xx", "src1", len(t)) for i, t in enumerate(docs)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).write.parquet(os.path.join(d, "documents.parquet"))
        rows = text_line_dedup(spark, d).collect()
    got = {r.doc_id: (r.n_lines, r.n_kept, r.kept_md5) for r in rows}
    assert got == ref


@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=10,
        max_size=200,
    )
)
def test_rank_decile_bins_near_equal(spark, prices):
    """Rank-based binning (the xform_quantile_bin decomposition) always
    produces bins of size n/10 rounded — even with massive ties —
    because the bin comes from the unique global rank, not the value."""
    n = len(prices)
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(prices)], "o_orderkey long, o_totalprice double"
    )
    from pyspark.sql import Window as W

    w = W.orderBy("o_totalprice", "o_orderkey")
    binned = (
        df.withColumn("rk", F.row_number().over(w))
        .select(
            F.floor(((F.col("rk") - 1) * 10.0) / n).cast("bigint").alias("b")
        )
        .groupBy("b")
        .count()
        .collect()
    )
    sizes = {r.b: r["count"] for r in binned}
    assert sum(sizes.values()) == n
    # every decile's size is floor/ceil of n/10
    import math

    lo, hi = math.floor(n / 10), math.ceil(n / 10)
    assert all(lo <= s <= hi for s in sizes.values())
    assert set(sizes) == set(range(10)) if n >= 10 else True


@given(
    st.lists(
        st.integers(min_value=-(10**8), max_value=10**8),
        min_size=1,
        max_size=8,
    )
)
def test_dyadic_ewma_exact_under_reordering(vq):
    """The grouped_pandas_ewma determinism claim, as a property: with
    alpha=1/2 (power-of-two weights) and 1e-4-quantized integer values,
    every weighted term is exact in binary floating point and the
    window sum is identical under ANY accumulation order."""
    m = len(vq)

    def weight(i):
        if m == 1:
            return 1.0
        if i == 1:
            return 2.0 ** (-(m - 1))
        return 2.0 ** (-(m - i + 1))

    terms = [v * weight(i) for i, v in enumerate(vq, start=1)]
    fwd = sum(terms)
    rev = sum(reversed(terms))
    import random

    rng = random.Random(42)
    shuffled = terms[:]
    rng.shuffle(shuffled)
    assert fwd == rev == sum(shuffled)
    assert sum(weight(i) for i in range(1, m + 1)) == 1.0
