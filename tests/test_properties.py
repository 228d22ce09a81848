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


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),   # key
            st.sampled_from(["a", "b", "c", None]),  # new attr value
            st.sampled_from(["2024-03-01", "2024-06-01", "2024-09-01"]),
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=12, deadline=None)
def test_scd2_invariants_hold_for_any_batch(spark, batch_rows):
    """merge_scd2 invariants over arbitrary batches: at most one current
    row per key, closed history is never mutated, and re-applying the
    same batch is a no-op (idempotence)."""
    from airbnb_listings_reviews_data_engineering_spark.operators.merge import (
        merge_scd2,
    )

    base = spark.createDataFrame(
        [
            (0, "a", "2024-01-01", None, True),
            (1, "b", "2024-01-01", None, True),
            (1, "old", "2023-01-01", "2024-01-01", False),
            (2, None, "2024-01-01", None, True),
        ],
        "k long, attr string, valid_from string, valid_to string, is_current boolean",
    )
    updates = spark.createDataFrame(
        batch_rows, "k long, attr string, eff string"
    )
    out = merge_scd2(base, updates, ["k"], ["attr"], "eff")
    rows = out.collect()
    # at most one current row per key
    from collections import Counter

    cur = Counter(r.k for r in rows if r.is_current)
    assert all(v == 1 for v in cur.values()), cur
    # pre-existing closed history is untouched
    closed = [(r.k, r.attr, r.valid_from, r.valid_to) for r in rows if not r.is_current]
    assert (1, "old", "2023-01-01", "2024-01-01") in closed
    # idempotence: same batch again changes nothing
    again = merge_scd2(out, updates, ["k"], ["attr"], "eff")
    assert sorted(map(str, again.collect())) == sorted(map(str, rows))


@given(
    st.lists(st.integers(min_value=0, max_value=4), min_size=4, max_size=14),
    st.integers(min_value=0, max_value=3),
)
@settings(max_examples=10, deadline=None)
def test_prefix_filter_lossless_on_random_corpora(spark, word_ids, seed):
    """AllPairs prefix filtering must return exactly the exhaustive
    thresholded pairs on arbitrary small corpora (the theorem, checked
    empirically over random shingle-overlap structures)."""
    from airbnb_listings_reviews_data_engineering_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    vocab = ["alpha", "bravo", "charlie", "delta", "echo"]
    docs = []
    for i in range(len(word_ids) - 3):
        toks = [vocab[(w + seed * (j + 1)) % 5] for j, w in enumerate(word_ids[i : i + 4])]
        docs.append((i, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    filtered = ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.5, prefix_filter=True)
    exhaustive = ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.5, prefix_filter=False)
    assert sorted(map(str, filtered.collect())) == sorted(
        map(str, exhaustive.collect())
    )


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=8,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=3),
)
@settings(max_examples=10)
def test_salted_knn_equals_naive_window_topk(spark, vecs, k):
    """The two-stage salted top-k in operators/similarity.py:knn_join must
    return EXACTLY the rows of the naive single-window formulation for any
    vector set — the decomposition is pure plan-shape, never semantics."""
    from pyspark.sql.window import Window

    from airbnb_listings_reviews_data_engineering_spark.functions.arrays import (
        as_double_array,
        cosine,
    )
    from airbnb_listings_reviews_data_engineering_spark.operators.similarity import (
        knn_join,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    # drop zero vectors (cosine undefined) and use the first two as queries
    rows = [(i, v) for i, v in rows if any(x != 0.0 for x in v)]
    if len(rows) < 3:
        return
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.limit(2).select(
        F.col("vec_id").alias("q_id"), as_double_array("embedding").alias("qv")
    )
    corpus = df.join(qs.select(F.col("q_id").alias("vec_id")), "vec_id", "left_anti")

    got = {
        tuple(r)
        for r in knn_join(corpus, qs, "vec_id", "embedding", k=k, n_salt=4).collect()
    }
    naive_w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "vec_id")
    naive = {
        tuple(r)
        for r in corpus.select(
            F.col("vec_id"), as_double_array("embedding").alias("v")
        )
        .crossJoin(F.broadcast(qs))
        .select(
            "q_id",
            "vec_id",
            F.round(cosine(F.col("v"), F.col("qv")), 6).alias("cos_sim"),
        )
        .withColumn("rnk", F.row_number().over(naive_w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "cos_sim", F.col("rnk").cast("int").alias("rnk"))
        .collect()
    }
    assert got == naive


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=32),
            min_size=2,
            max_size=16,
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=10)
def test_int8_quantization_error_bound(spark, vecs):
    """emb_quantize's reconstruction contract |dequant - x| <= scale/2
    (+1 ulp) and code range [0, 255] hold for ANY float vector, including
    constant vectors (scale 0 -> all-zero codes)."""
    from airbnb_listings_reviews_data_engineering_spark.plans.pipeline_ext import (
        emb_quantize,
    )
    import os
    import tempfile

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    with tempfile.TemporaryDirectory() as td:
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        ).write.parquet(os.path.join(td, "embeddings.parquet"))
        out = emb_quantize(spark, td).collect()
    assert len(out) == len(rows)
    assert all(r.ok for r in out), [tuple(r) for r in out if not r.ok]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 99), min_size=1, max_size=130),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 60),
)
def test_chunking_reconstructs_and_covers(spark, docs_tokens, chunk):
    """chunk_tokens invariants for ANY corpus and chunk size:
    with stride == chunk (no overlap) the ordered chunk concatenation
    reproduces each document exactly; window count = ceil(n/stride);
    every chunk_tok is in [1, chunk] and totals n."""
    import math

    from airbnb_listings_reviews_data_engineering_spark.operators.text import (
        chunk_tokens,
    )

    rows = [
        (i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(docs_tokens)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_tokens(df, "doc_id", "text", chunk=chunk, stride=chunk).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, toks in enumerate(docs_tokens):
        n = len(toks)
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        assert len(chunks) == math.ceil(n / chunk)
        assert [c["chunk_idx"] for c in chunks] == list(
            range(1, len(chunks) + 1)
        )
        assert all(1 <= c["chunk_tok"] <= chunk for c in chunks)
        assert sum(c["chunk_tok"] for c in chunks) == n
        rebuilt = " ".join(c["chunk_text"] for c in chunks)
        assert rebuilt == " ".join(f"w{t}" for t in toks)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 99), min_size=1, max_size=130),
        min_size=1,
        max_size=4,
    ),
    st.integers(2, 60),
    st.data(),
)
def test_chunking_overlap_covers_every_token(spark, docs_tokens, chunk, data):
    """chunk_tokens with stride < chunk (overlapping windows — the case
    ADVICE r3 flagged as unpinned): every token position is covered by
    at least one window, consecutive windows overlap by exactly
    chunk - stride tokens while both are full, and each window slices
    the original token stream verbatim at its stated start."""
    stride = data.draw(st.integers(1, chunk - 1), label="stride")
    from airbnb_listings_reviews_data_engineering_spark.operators.text import (
        chunk_tokens,
    )

    rows = [
        (i, " ".join(f"w{t}" for t in toks)) for i, toks in enumerate(docs_tokens)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_tokens(df, "doc_id", "text", chunk=chunk, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, toks in enumerate(docs_tokens):
        n = len(toks)
        words = [f"w{t}" for t in toks]
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_idx"])
        covered: set[int] = set()
        for c in chunks:
            start = (c["chunk_idx"] - 1) * stride  # 0-based token start
            window = words[start : start + chunk]
            assert c["chunk_text"].split(" ") == window  # verbatim slice
            assert c["chunk_tok"] == len(window)
            covered.update(range(start, start + len(window)))
        assert covered == set(range(n))  # no token gaps, ever


def test_chunking_rejects_gapped_stride(spark):
    import pytest as _pytest

    from airbnb_listings_reviews_data_engineering_spark.operators.text import (
        chunk_tokens,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="stride"):
        chunk_tokens(df, "doc_id", "text", chunk=10, stride=11)
    with _pytest.raises(ValueError, match=">= 1"):
        chunk_tokens(df, "doc_id", "text", chunk=10, stride=0)
