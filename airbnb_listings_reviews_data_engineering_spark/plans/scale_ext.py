"""Scale-technique queries: the physical-layout levers a 100 TB
deployment lives on, demonstrated end-to-end and oracle-checked.

- bucketed co-located join: both sides pre-bucketed on the join key ->
  sort-merge join with NO shuffle exchange (the replacement for the
  reference's B-tree ids at distributed scale, SURVEY.md §4);
- partition-pruned scan: directory-partitioned layout + a partition
  predicate -> the scan touches one partition's files;
- salted skew join: explicit key salting (big side salted by a
  deterministic residue, small side replicated per salt) — the manual
  fallback when AQE's skew split can't help (e.g. a single hot key in a
  broadcast-ineligible join).

The staged tables are written once per (sf_dir, session) under the
staging root; plan tests assert the physical properties (no Exchange /
PartitionFilters) so regressions are caught structurally, not by timing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checkpoint import pin
from ..sources.staging import fs_delete, staging_root
from .registry import load, register


def _sf_tag(sf_dir: str) -> str:
    return sf_dir.strip("/").replace("/", "_").replace(".", "p")


_BUCKETED_SQL = """
SELECT c.c_mktsegment AS segment, count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def _ensure_bucketed(spark: SparkSession, sf_dir: str) -> None:
    tag = _sf_tag(sf_dir)
    existing = {t.name for t in spark.catalog.listTables()}
    for src, key, tbl in (
        ("orders", "o_custkey", f"orders_bkt_{tag}"),
        ("customer", "c_custkey", f"customer_bkt_{tag}"),
    ):
        if tbl not in existing:
            (
                load(spark, sf_dir, src)
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", os.path.join(staging_root(spark), tbl))
                .mode("overwrite")
                .saveAsTable(tbl)
            )


@register("join_bucketed", oracle=_BUCKETED_SQL)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join: both sides bucketed (8 buckets) on the join key,
    so the sort-merge join reads matching buckets directly — the plan has
    NO shuffle Exchange before the join (asserted in plan tests). At
    100 TB this converts the nightly fact-dim join from a full shuffle of
    the fact table into a local merge per bucket."""
    _ensure_bucketed(spark, sf_dir)
    tag = _sf_tag(sf_dir)
    o = spark.table(f"orders_bkt_{tag}")
    c = spark.table(f"customer_bkt_{tag}")
    return (
        o.hint("merge")  # keep SMJ: broadcast would hide the bucket effect
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


_PARTITION_PRUNE_SQL = """
SELECT event_type, count(*) AS n, round(sum(value), 4) AS sum_value
FROM events
WHERE event_type = 'click'
GROUP BY event_type
"""


@register("src_partition_pruning", oracle=_PARTITION_PRUNE_SQL)
def src_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory-partitioned layout + partition predicate: the scan lists
    only the matching partition directory (PartitionFilters in the plan —
    the distributed analog of the reference's B-tree index lookups). At
    100 TB, partition-by-date + predicate = reading 1/365th of the data."""
    tag = _sf_tag(sf_dir)
    staged = os.path.join(staging_root(spark), f"events_by_type_{tag}")
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        load(spark, sf_dir, "events").write.partitionBy("event_type").mode(
            "overwrite"
        ).parquet(staged)
    df = spark.read.parquet(staged)
    return (
        df.filter(F.col("event_type") == "click")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


_JSONL_SQL = "SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id < 300"


@register("src_jsonl", oracle=_JSONL_SQL)
def src_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL source/sink roundtrip — the interchange format of LLM data
    pipelines. Write with an explicit schema, read back schema-first (a
    schemaless JSON read over 100 TB costs a full inference scan)."""
    tag = _sf_tag(sf_dir)
    staged = os.path.join(staging_root(spark), f"docs_jsonl_{tag}")
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    docs.write.mode("overwrite").json(staged)
    return spark.read.json(staged, schema=docs.schema).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


_ORC_SQL = "SELECT p_partkey, p_name, p_brand, p_retailprice FROM part WHERE p_partkey < 500"


@register("src_orc", oracle=_ORC_SQL)
def src_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink roundtrip — second columnar format, same
    vectorized reader + predicate pushdown path as parquet."""
    tag = _sf_tag(sf_dir)
    staged = os.path.join(staging_root(spark), f"part_orc_{tag}")
    part = load(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    part.write.mode("overwrite").orc(staged)
    return spark.read.orc(staged).select(
        "p_partkey", "p_name", "p_brand", "p_retailprice"
    )


_CSV_PERMISSIVE_SQL = "SELECT n_nationkey, n_name, n_regionkey FROM nation"


@register("src_csv_permissive", oracle=_CSV_PERMISSIVE_SQL)
def src_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE CSV ingest with corrupt-record quarantine: three
    malformed lines are injected into the staged file; the reader parses
    what it can, captures the rest in _corrupt_record, and the query
    keeps the clean rows (the quarantined ones would go to a dead-letter
    sink). At 100 TB one bad row must never kill the job (FAILFAST) nor
    silently vanish (DROPMALFORMED without audit)."""
    from pyspark.sql import types as T

    tag = _sf_tag(sf_dir)
    staged = os.path.join(staging_root(spark), f"nation_dirty_{tag}")
    nat = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    nat.coalesce(1).write.mode("overwrite").option("header", True).csv(staged)
    # separate file, NOT an append: Spark's FileStatusCache pinned the
    # part file's length at write time, and a length change fails the scan
    with open(os.path.join(staged, "bad-rows.csv"), "w") as f:
        f.write(
            "n_nationkey,n_name,n_regionkey\n"
            "not_a_number,Bad Row,xyz\n99,TooFewCols\nzz,,\n"
        )
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    raw = spark.read.csv(
        staged,
        header=True,
        schema=schema,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    )
    return (
        raw.filter(F.col("_corrupt_record").isNull())
        .select("n_nationkey", "n_name", "n_regionkey")
    )


_CSV_MULTILINE_SPLIT_SQL = """
SELECT doc_id, regexp_replace(text, ' ', chr(10), 'g') AS text_nl, lang
FROM documents WHERE doc_id < 400
"""


@register("src_csv_multiline_split", oracle=_CSV_MULTILINE_SPLIT_SQL)
def src_csv_multiline_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Splittable multiLine-CSV ingest via the re-chunk pre-pass
    (sources/csv_rechunk.py — VERDICT r2 #5). The fixture turns every
    document's spaces into embedded newlines, so every quoted field is
    multi-line and the single-task multiLine parse is genuinely
    exercised; the re-chunk lands it as n-way parquet, which is what
    every downstream read scans — splittable even when the source was
    ONE file. The single-task caveat of airbnb/etl.read_listings_csv is
    thereby the handled case, not a docstring warning."""
    from pyspark.sql import types as T

    from ..sources.csv_rechunk import rechunk_multiline_csv

    tag = _sf_tag(sf_dir)
    staged_csv = os.path.join(staging_root(spark), f"docs_mlcsv_{tag}")
    docs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 400)
        .select(
            "doc_id",
            F.regexp_replace("text", " ", "\n").alias("text_nl"),
            "lang",
        )
    )
    # ONE csv file -> the unsplittable worst case the re-chunk exists for
    docs.coalesce(1).write.mode("overwrite").option("header", True).option(
        "quote", '"'
    ).option("escape", '"').csv(staged_csv)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text_nl", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    return rechunk_multiline_csv(
        spark, staged_csv, schema, stage_key=f"docs_mlcsv_{tag}", partitions=8
    ).select("doc_id", "text_nl", "lang")


_THETA_ONLY_SQL = """
SELECT r.r_name, count(*) AS n_higher_nations
FROM region r JOIN nation n ON n.n_regionkey > r.r_regionkey
GROUP BY r.r_name
"""


@register("join_theta_only", oracle=_THETA_ONLY_SQL)
def join_theta_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure theta join (no equi key) — compiles to
    BroadcastNestedLoopJoin; legitimate ONLY when one side is tiny
    (dims here). The engine supports it; the plan test pins that the big
    fact tables never take this path."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return (
        r.join(F.broadcast(n), n.n_regionkey > r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_higher_nations"))
    )


_SALTED_SQL = """
SELECT n.n_name, count(*) AS n_customers, round(sum(c.c_acctbal), 2) AS total_bal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
"""


@register("join_salted", oracle=_SALTED_SQL)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit salted join for skewed keys: the big side's key gains a
    deterministic residue salt (pmod of a row-unique column), the small
    side is replicated once per salt value, and the join runs on
    (key, salt) — splitting any hot key across SALT partitions. Manual
    fallback for when AQE skew-split doesn't apply; result is identical
    to the unsalted join (the oracle proves it)."""
    salt_n = 8
    cust = load(spark, sf_dir, "customer").withColumn(
        "salt", F.pmod(F.col("c_custkey"), F.lit(salt_n)).cast("int")
    )
    nat = (
        load(spark, sf_dir, "nation")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1))))
        .withColumn("salt", F.col("salt").cast("int"))
    )
    return (
        cust.hint("merge")  # force the shuffle join salting is for
        .join(nat, (cust.c_nationkey == nat.n_nationkey) & (cust.salt == nat.salt))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


_BLOOM_PREFILTER_SQL = """
SELECT l.l_returnflag AS flag, count(*) AS n_lines,
       round(sum(l.l_quantity), 2) AS sum_qty
FROM lineitem l
WHERE l.l_suppkey IN (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
GROUP BY l.l_returnflag
"""


@register("join_bloom_prefilter", oracle=_BLOOM_PREFILTER_SQL)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective fact-dim semi-join with an explicit Bloom prefilter
    (operators/bloomjoin.py): the filtered supplier keys fold into a
    single-row map<int,bigint> bit array, broadcast to every lineitem
    task, and probed map-side (xxhash64 x5 + bit tests, pure codegen) so
    non-matching fact rows are dropped BEFORE the join exchange. No
    false negatives, and the exact semi-join afterwards removes the
    ~<1 % false positives — hence the oracle is the plain IN-subquery:
    the prefilter must be semantically invisible. At 100 TB this is the
    shuffle-volume lever for selective joins; Spark's own runtime
    bloomFilter does the same when it fires (the explicit form also
    covers reusing one built filter across many queries)."""
    from ..operators import bloomjoin as B

    # project BEFORE the operator: the probe-then-join barrier inside it
    # (see bloomjoin.bloom_prefilter_semi_join) is a pruning boundary, so
    # column pruning must happen upstream of the checkpoint
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_quantity", "l_returnflag"
    )
    supp = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey") < 5)
    pruned = B.bloom_prefilter_semi_join(li, supp, "l_suppkey", "s_suppkey")
    return (
        pruned.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


def _zvalue_sql(bx: str, by: str, bits: int, shift: str) -> str:
    """Bit-interleave expression text: z = .. y1 x1 y0 x0 (x in odd
    positions). ``shift`` is the engine's right-shift syntax with {v}
    and {i} placeholders — DuckDB has the >> operator, Spark SQL spells
    it shiftright()."""
    terms = []
    for i in range(bits):
        xbit = f"({shift.format(v=bx, i=i)} & 1)"
        ybit = f"({shift.format(v=by, i=i)} & 1)"
        terms.append(f"{xbit} * {1 << (2 * i + 1)}")
        terms.append(f"{ybit} * {1 << (2 * i)}")
    return "(" + " + ".join(terms) + ")"


_Z_BITS = 8
_Z_BUCKET = 4096  # 2^12 -> 16 z-buckets over the 16-bit z space

_ZORDER_SQL = f"""
WITH src AS (
  SELECT l_orderkey, l_partkey % 256 AS bx, l_suppkey % 256 AS by
  FROM lineitem
),
z AS (
  SELECT l_orderkey, bx, by,
         {_zvalue_sql('bx', 'by', _Z_BITS, '({v} >> {i})')} AS zval
  FROM src
)
SELECT CAST(floor(zval / ({_Z_BUCKET} * 1.0e0)) AS INT) AS zbucket, count(*) AS n_rows,
       min(bx) AS min_x, max(bx) AS max_x,
       min(by) AS min_y, max(by) AS max_y
FROM z GROUP BY CAST(floor(zval / ({_Z_BUCKET} * 1.0e0)) AS INT)
"""


@register("maintenance_zorder", oracle=_ZORDER_SQL)
def maintenance_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering — the multi-column data-skipping
    lever: interleaving the bits of two bucketed dimensions gives every
    zval range locality in BOTH columns at once, so after
    `repartitionByRange(zval) + sortWithinPartitions(zval)` each parquet
    file's min/max stats are tight for x AND y and a predicate on either
    column prunes files (single-column sort only prunes its own column).
    The registered result is the skipping evidence, not the rewrite: per
    z-bucket row counts and per-bucket min/max of both dimensions — each
    16-bit-z bucket of 4096 spans at most a 64-value slice of bx and by
    (sqrt locality), which is what makes the file-level stats selective.
    The bit interleave is integer-exact column arithmetic, identical in
    both engines modulo shift syntax."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_partkey") % 256).alias("bx"),
        (F.col("l_suppkey") % 256).alias("by"),
    )
    z = li.withColumn(
        "zval",
        F.expr(_zvalue_sql("bx", "by", _Z_BITS, "shiftright({v}, {i})")),
    )
    return (
        z.groupBy(
            F.floor(F.col("zval") / (_Z_BUCKET * 1.0)).cast("int").alias("zbucket")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("bx").alias("min_x"),
            F.max("bx").alias("max_x"),
            F.min("by").alias("min_y"),
            F.max("by").alias("max_y"),
        )
    )


_SCHEMA_EVOLUTION_SQL = """
SELECT lang, count(*) AS n,
       CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_missing_source,
       CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END) AS BIGINT)
         AS chars_gen2
FROM documents GROUP BY lang
"""


@register("src_schema_evolution", oracle=_SCHEMA_EVOLUTION_SQL)
def src_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution read (mergeSchema): one dataset written by TWO
    producer generations — gen1 files lack the later `source`/`n_chars`
    columns — read back as a single frame whose schema is the union,
    with the missing columns null-filled for gen1 rows. The ingestion
    reality of any long-lived 100 TB corpus: producers add columns;
    consumers must read across generations without a rewrite.
    mergeSchema costs a footer-union across files (not a data scan);
    steady-state deployments pin the merged schema explicitly, which
    this read then applies per row group for free."""
    tag = _sf_tag(sf_dir)
    staged = os.path.join(staging_root(spark), f"docs_evolved_{tag}")
    docs = load(spark, sf_dir, "documents")
    gen1 = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text", "lang")
    gen2 = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    gen1.write.mode("overwrite").parquet(os.path.join(staged, "gen=1"))
    gen2.write.mode("overwrite").parquet(os.path.join(staged, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(staged)
    return merged.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("source").isNull(), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_missing_source"),
        F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).alias("chars_gen2"),
    )


_PARTITION_OVERWRITE_SQL = """
SELECT event_type, count(*) AS n,
       round(sum(CASE WHEN event_type = 'click' THEN value * 2
                      ELSE value END), 4) AS sum_value
FROM events GROUP BY event_type
"""


@register("sink_partition_overwrite", oracle=_PARTITION_OVERWRITE_SQL)
def sink_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the idempotent-backfill primitive.
    Full history is written partitioned by event_type; a backfill then
    recomputes ONLY the 'click' partition (value doubled) and overwrites
    it in place with partitionOverwriteMode=dynamic, leaving every other
    partition's files untouched. At 100 TB this is how a bad day/segment
    is recomputed: rewrite one directory, not the table; reruns are
    idempotent because overwrite replaces rather than appends. The
    read-back aggregates per partition and must show exactly one
    partition changed (the oracle's CASE) — duplicated or leftover files
    would double counts and fail the gate."""
    tag = _sf_tag(sf_dir)
    staged = os.path.join(staging_root(spark), f"events_overwrite_{tag}")
    events = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    events.write.partitionBy("event_type").mode("overwrite").parquet(staged)
    backfill = events.filter(F.col("event_type") == "click").withColumn(
        "value", F.col("value") * 2
    )
    (
        backfill.write.partitionBy("event_type")
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(staged)
    )
    return (
        spark.read.parquet(staged)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


# ---------------------------------------------------------------------------
# quarantine split (corrupt-record ingestion)
# ---------------------------------------------------------------------------

_QUARANTINE_SQL = """
WITH raw AS (
  SELECT event_id,
         CASE WHEN event_id % 13 = 0 THEN replace(props, '{', '?')
              ELSE props END AS props
  FROM events
), tagged AS (
  SELECT event_id, props,
         CASE WHEN json_valid(props)
              THEN json_extract(props, '$.k') IS NOT NULL
              ELSE FALSE END AS ok
  FROM raw
)
SELECT CASE WHEN ok THEN 'valid' ELSE 'quarantined' END AS status,
       count(*) AS n_rows, min(event_id) AS min_id, max(event_id) AS max_id,
       CAST(coalesce(sum(CASE WHEN ok
                    THEN CAST(json_extract(props, '$.k') AS BIGINT) END), 0)
            AS BIGINT) AS sum_k
FROM tagged GROUP BY 1
"""


@register("src_quarantine_split", oracle=_QUARANTINE_SQL)
def src_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record QUARANTINE ingestion — the permissive-load
    pattern at the semantic level: malformed JSON payloads (here
    deterministically corrupted rows stand in for upstream garbage)
    route to a quarantine bucket with counts and id ranges for triage,
    while valid rows parse and flow on (sum of the extracted field
    proves the good path) — ONE bad record in a 100 TB load must
    neither abort the job (fail-fast) nor vanish silently
    (DROPMALFORMED); this is the explicit third way. Validity is
    from_json's null-on-malformed contract; the split is a map-side
    CASE — one scan, one small aggregate, no second pass over the
    data. Validity = parses AND carries the required field (Spark's
    PERMISSIVE from_json yields a null-FIELDED struct for malformed
    input, so the field-level check is the portable contract)."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.when(
            F.col("event_id") % 13 == 0,
            F.regexp_replace("props", r"\{", "?"),
        )
        .otherwise(F.col("props"))
        .alias("props"),
    )
    parsed = ev.select(
        "event_id",
        "props",
        F.from_json("props", "k BIGINT").alias("j"),
    ).withColumn("ok", F.col("j.k").isNotNull())
    return (
        parsed.groupBy(
            F.when(F.col("ok"), "valid").otherwise("quarantined").alias("status")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
            F.coalesce(
                F.sum(F.when(F.col("ok"), F.col("j.k"))), F.lit(0)
            ).alias("sum_k"),
        )
    )


# ---------------------------------------------------------------------------
# dynamic partition pruning (runtime partition skip from a dim filter)
# ---------------------------------------------------------------------------

_DPP_SQL = """
SELECT o.o_orderpriority, count(*) AS n_orders,
       round(sum(o.o_totalprice), 2) AS total_price
FROM orders o
JOIN (SELECT DISTINCT o_orderpriority FROM orders
      WHERE o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%') d
  ON o.o_orderpriority = d.o_orderpriority
GROUP BY o.o_orderpriority
"""


@register("join_dynamic_partition_pruning", oracle=_DPP_SQL)
def join_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is directory-
    partitioned on the join key; the dimension side carries the
    selective filter (not expressible as a static partition predicate),
    and Catalyst injects a runtime `dynamicpruning` subquery that reads
    the dim FIRST and skips every non-matching fact partition at scan
    time. src_partition_pruning shows the static case; THIS is the one
    that matters for star joins at 100 TB — 'WHERE dim.attr = x' prunes
    the fact scan to the matching date/priority directories without the
    query author naming them (tests/test_plan_quality.py pins the
    dynamicpruning expression in the physical plan)."""
    tag = _sf_tag(sf_dir)
    staged = os.path.join(staging_root(spark), f"orders_by_prio_{tag}")
    if not os.path.exists(os.path.join(staged, "_SUCCESS")):
        load(spark, sf_dir, "orders").write.partitionBy(
            "o_orderpriority"
        ).mode("overwrite").parquet(staged)
    fact = spark.read.parquet(staged)
    dim = (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority")
        .distinct()
        .filter(
            F.col("o_orderpriority").like("1-%")
            | F.col("o_orderpriority").like("2-%")
        )
    )
    return (
        fact.join(dim.hint("broadcast"), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


_XML_SQL = """
SELECT s_suppkey, s_name, s_nationkey, s_acctbal
FROM supplier WHERE s_suppkey < 100
"""


@register("src_xml", oracle=_XML_SQL)
def src_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source/sink roundtrip via Spark 4's BUILT-IN xml data source
    (the spark-xml package merged upstream in 4.0): write a supplier
    slice as <supplier> row elements, read it back SCHEMA-FIRST with an
    explicit rowTag. XML is the interchange format of enterprise feeds
    (the reference world's listings arrive as CSV, but partner/booking
    feeds are commonly XML); schema-first matters doubly here because
    XML inference costs a full scan AND type-widens numeric elements.
    The reader is splittable on row-element boundaries, so a 100 TB
    feed parallelizes like any file source; predicate pushdown does
    not reach into XML (a parse is always paid), which is exactly why
    the pattern is XML -> parquet ONCE, then every downstream query
    reads columnar — this key demonstrates the ingest edge of that
    funnel."""
    tag = _sf_tag(sf_dir)
    staged = os.path.join(staging_root(spark), f"supplier_xml_{tag}")
    supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") < 100)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    )
    (
        supp.write.format("xml")
        .option("rootTag", "suppliers")
        .option("rowTag", "supplier")
        .mode("overwrite")
        .save(staged)
    )
    # pin() materializes the XML parse before the staged dir is removed
    # (a lazily-returned scan would read a deleted path); the delete
    # follows the repo's _scratch_dir convention — staged fixture dirs
    # don't outlive the call (ADVICE r12). The pin doubles as the
    # demonstrated funnel: XML is parsed ONCE, downstream consumers
    # read the materialized columnar form.
    out = pin(
        spark.read.format("xml")
        .option("rowTag", "supplier")
        .schema(supp.schema)
        .load(staged)
        .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
        label="src_xml_reread",
    )
    fs_delete(staged, spark)
    return out


_PYDS_N = 1000
_PYDS_PARTS = 8

_PYDS_SQL = f"""
SELECT i AS id,
       CAST('0x' || substr(md5('pyds:' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)
         AS h,
       CAST(CAST('0x' || substr(md5('pyds:' || CAST(i AS VARCHAR)), 1, 15) AS BIGINT)
            % 10 AS INT) AS bucket
FROM generate_series(0, {_PYDS_N - 1}) g(i)
"""


@register("src_python_datasource", oracle=_PYDS_SQL)
def src_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector via Spark 4's PYTHON DATA SOURCE API
    (pyspark.sql.datasource — the extension point for systems with no
    native reader: internal feed services, bespoke binary stores,
    paginated APIs). The source is registered once per session and
    declares its OWN partitioning ({parts} InputPartitions over
    {n} ids), so Spark schedules one reader task per partition —
    exactly how a paginated-API connector parallelizes page ranges
    across executors. Rows are generated deterministically (id +
    the engine's md5-derived hash60 of 'pyds:'||id), which is what
    lets the DuckDB oracle reproduce the connector's output exactly —
    the parity gate covers the full read path: plan -> Python worker
    -> Arrow batches -> rows.

    Scale judgment: reader code runs Python-side (the API Arrow-
    batches the yielded rows), so this is for INGEST EDGES where no
    JVM connector exists — land the feed once, convert to parquet,
    never re-read through Python (the same funnel argument as
    src_xml). The partitions() contract is the lever that keeps a
    100 TB ingest parallel."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _SeqReader(DataSourceReader):
        def __init__(self, options):
            self.n = int(options.get("n", _PYDS_N))
            self.parts = int(options.get("parts", _PYDS_PARTS))

        def partitions(self):
            step = (self.n + self.parts - 1) // self.parts
            return [
                InputPartition((i * step, min((i + 1) * step, self.n)))
                for i in range(self.parts)
            ]

        def read(self, part):
            import hashlib

            lo, hi = part.value
            for i in range(lo, hi):
                h = int(hashlib.md5(f"pyds:{i}".encode()).hexdigest()[:15], 16)
                yield (i, h, h % 10)

    class _SeqSource(DataSource):
        @classmethod
        def name(cls):
            return "spark_graft_seqsrc"

        def schema(self):
            return "id bigint, h bigint, bucket int"

        def reader(self, schema):
            return _SeqReader(self.options)

    # idempotent per session: re-registration replaces the class (the
    # key runs repeatedly under bench reps)
    spark.dataSource.register(_SeqSource)
    return (
        spark.read.format("spark_graft_seqsrc")
        .option("n", str(_PYDS_N))
        .option("parts", str(_PYDS_PARTS))
        .load()
    )


src_python_datasource.__doc__ = src_python_datasource.__doc__.format(
    parts=_PYDS_PARTS, n=_PYDS_N
)
