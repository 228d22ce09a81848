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
