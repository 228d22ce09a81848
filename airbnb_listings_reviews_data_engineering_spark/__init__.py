"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo ``Zihe888/Airbnb-Listings-Reviews-Data-Engineering``.

The reference is an Airflow + pandas + Postgres + MongoDB ETL/analytics
pipeline (see SURVEY.md). This package re-expresses every operator it
executes — scans, cleaning transforms, vertical-partition sinks, document
assembly, upsert/merge semantics, six analytical queries — as idiomatic
Spark DataFrame / Spark SQL plans, plus the large-scale training-data
pipeline extensions (dedup, similarity search, text analysis, multimodal
plumbing) that a 100 TB deployment needs.

Layout:
  sources/    CSV / Parquet readers and sinks (explicit schemas, no inference)
  functions/  column-expression helpers (money parse, zip/state normalize, ...)
  operators/  reusable DataFrame->DataFrame operators (cleaning, merge, dedup,
              similarity, text analysis, multimodal stubs)
  plans/      end-to-end query plans: the reference's Q1-Q6 on the Airbnb
              schema, and the driver-testdata query registry consumed by
              __spark_entry__.py
  streaming/  Structured Streaming ingest (availableNow + foreachBatch merge)
"""

__version__ = "0.1.0"
