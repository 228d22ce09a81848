"""Composite pipeline queries: the reference's full Q1/Q5 shapes as ONE
Catalyst plan each (doc filter -> semi-join -> join -> project/aggregate),
instantiated on driver testdata. The per-operator keys in relational.py
test each piece in isolation; these verify the composition — predicate
pushdown through the semi-join, broadcast of the matched-id set, and a
single shuffle for the final aggregate (the whole point of replacing the
reference's two-engine round trip, SURVEY.md §3.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load, register

_Q1_ANALOG_SQL = """
WITH matched AS (
  SELECT doc_id FROM documents WHERE regexp_matches(text, '(?i)merge')
),
spend AS (
  SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spent
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey AS id,
       concat_ws('#', c.c_name, CAST(c.c_nationkey AS VARCHAR)) AS address,
       s.total_spent
FROM customer c
JOIN spend s ON s.o_custkey = c.c_custkey
WHERE c.c_custkey IN (SELECT doc_id FROM matched)
"""


@register("pipeline_q1_analog", oracle=_Q1_ANALOG_SQL)
def pipeline_q1_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 end-to-end shape (Airbnb_Analysis.py:24-65): regex doc match ->
    left-semi join (replacing the Mongo-ids-to-SQL-IN-list splice) ->
    relational join -> null-skipping concat projection. One plan, one
    engine; the matched-id set broadcasts instead of passing through the
    driver."""
    matched = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").rlike("(?i)merge"))
        .select(F.col("doc_id"))
    )
    spend = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"))
    )
    cust = load(spark, sf_dir, "customer")
    return (
        cust.join(spend, cust.c_custkey == spend.o_custkey)
        .join(matched, cust.c_custkey == matched.doc_id, "left_semi")
        .select(
            F.col("c_custkey").alias("id"),
            F.concat_ws(
                "#", F.col("c_name"), F.col("c_nationkey").cast("string")
            ).alias("address"),
            "total_spent",
        )
    )


_Q5_ANALOG_SQL = """
WITH matched AS (
  SELECT doc_id FROM documents
  WHERE (regexp_matches(text, '(?i)merge') OR regexp_matches(text, '(?i)batch'))
    AND (regexp_matches(text, '(?i)stream') OR regexp_matches(text, '(?i)window'))
),
toks AS (SELECT doc_id, lang, string_split(text, ' ') AS tok FROM documents)
SELECT t.lang, count(*) AS number_of_docs
FROM toks t
WHERE list_contains(t.tok, 'join') AND list_contains(t.tok, 'scan')
  AND t.doc_id IN (SELECT doc_id FROM matched)
GROUP BY t.lang
"""


@register("pipeline_q5_analog", oracle=_Q5_ANALOG_SQL)
def pipeline_q5_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 end-to-end shape (Airbnb_Analysis.py:124-183): AND-of-OR regex
    doc match -> left-semi join -> array-membership filter -> grouped
    count (with the group key output — the recorded Q5 divergence)."""
    docs = load(spark, sf_dir, "documents")
    matched = docs.filter(
        (F.col("text").rlike("(?i)merge") | F.col("text").rlike("(?i)batch"))
        & (F.col("text").rlike("(?i)stream") | F.col("text").rlike("(?i)window"))
    ).select("doc_id")
    tok = F.split("text", " ")
    return (
        docs.select("doc_id", "lang", tok.alias("tok"))
        .join(matched, "doc_id", "left_semi")
        .filter(
            F.array_contains("tok", "join") & F.array_contains("tok", "scan")
        )
        .groupBy("lang")
        .agg(F.count("*").alias("number_of_docs"))
    )


_Q6_ANALOG_SQL = r"""
WITH reviews AS (
  SELECT o_custkey AS listing_id, o_orderkey AS review_id,
         strftime(o_orderdate, '%Y-%m-%d') AS review_date,
         concat_ws(' ', o_orderstatus,
                   CASE WHEN o_orderpriority = '5-LOW'
                        THEN 'low priority posting'
                        ELSE o_orderpriority END) AS comment
  FROM orders
),
matched AS (
  SELECT DISTINCT listing_id FROM reviews
  WHERE regexp_matches(comment, '(?i)urgent')
)
SELECT r.listing_id, r.review_id, r.review_date,
       CASE WHEN regexp_extract(r.comment, '\d+') = '' THEN 1
            ELSE CAST(regexp_extract(r.comment, '\d+') AS INTEGER)
       END AS cancel_days
FROM reviews r
WHERE r.listing_id IN (SELECT listing_id FROM matched)
"""


@register("pipeline_q6_analog", oracle=_Q6_ANALOG_SQL)
def pipeline_q6_analog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 end-to-end shape (Airbnb_Analysis.py:185-220): the Mongo
    pipeline `$match` on a nested review-comment regex -> `$project` of
    nested review fields plus a `$cond`/`$regexMatch` day-count
    extraction, as ONE Catalyst plan over the doc model.

    Faithful to the doc shape: orders are packed into per-listing
    review-struct arrays (collect_list — the docmodel idiom; review
    count per listing is bounded, so the buffer is too), the listing
    matches if ANY review comment matches '(?i)urgent' (higher-order
    `exists`, the `$match` on an array field), matched docs explode
    back to per-review rows (the `$project` over `reviews.*`), and
    cancel_days = first digit run in the comment with `when/otherwise`
    default 1 — the reference's broken `$cond` (it compares
    `$regexMatch` to None, Airbnb_Analysis.py:202-208) resolved as
    intent, matching airbnb/analysis.py Q6. The '5-LOW' -> 'low
    priority posting' rewrite gives the default branch live rows, so
    both `$cond` arms are exercised at every SF."""
    comment = F.concat_ws(
        " ",
        F.col("o_orderstatus"),
        F.when(F.col("o_orderpriority") == "5-LOW", "low priority posting")
        .otherwise(F.col("o_orderpriority")),
    )
    reviews = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("listing_id"),
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("date"),
            comment.alias("comment"),
        ).alias("r"),
    )
    docs = reviews.groupBy("listing_id").agg(F.collect_list("r").alias("reviews"))
    matched = docs.filter(
        F.exists("reviews", lambda r: r["comment"].rlike("(?i)urgent"))
    )
    ex = matched.select("listing_id", F.explode("reviews").alias("r"))
    day = F.regexp_extract(F.col("r.comment"), r"\d+", 0)
    return ex.select(
        "listing_id",
        F.col("r.id").alias("review_id"),
        F.col("r.date").alias("review_date"),
        F.when(day == "", F.lit(1)).otherwise(day.cast("int")).alias("cancel_days"),
    )


# ---------------------------------------------------------------------------
# feature-matrix construction (entity-day grain)
# ---------------------------------------------------------------------------

_FEATURE_MATRIX_SQL = """
WITH daily AS (
  SELECT user_id, ts::DATE AS day, count(*) AS n_events,
         CAST(round(avg(value) * 10000) AS BIGINT) AS avg_q,
         count(*) FILTER (WHERE event_type = 'purchase') > 0 AS label_purchase
  FROM events WHERE user_id < 10 GROUP BY 1, 2
)
SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n_events,
       round(avg_q / 10000.0, 4) AS avg_value,
       CAST(sum(n_events) OVER (PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_events,
       (day - min(day) OVER (PARTITION BY user_id)) AS days_since_first,
       label_purchase
FROM daily
"""


@register("pipeline_feature_matrix", oracle=_FEATURE_MATRIX_SQL)
def pipeline_feature_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-matrix construction at the (entity, day) grain — the
    last mile before model training, chaining the feature-engineering
    shapes in ONE lazy plan: daily rollup (map-side-combined agg;
    avg fixed-point-quantized BEFORE emission so the feature is
    reproducible), per-entity running total and tenure via
    entity-partitioned windows (one shuffle on user_id serves BOTH —
    same partitioning, no second exchange), and a same-grain label
    (purchase that day) ready for a leakage-safe split
    (split_train_test_group hashes the same entity key). At 100 TB the
    plan is one key shuffle + windows whose state is per-entity days —
    the exact shape feature platforms materialize nightly."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.avg("value") * 10000).cast("bigint").alias("avg_q"),
        (
            F.count(F.when(F.col("event_type") == "purchase", 1)) > 0
        ).alias("label_purchase"),
    )
    from pyspark.sql import Window as W

    w_cum = (
        W.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("user_id")
    return daily.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        F.round(F.col("avg_q") / 10000.0, 4).alias("avg_value"),
        F.sum("n_events").over(w_cum).alias("cum_events"),
        F.datediff("day", F.min("day").over(w_all)).alias("days_since_first"),
        "label_purchase",
    )
