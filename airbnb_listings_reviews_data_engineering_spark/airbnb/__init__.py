"""User-facing Airbnb pipeline: the reference's data model, ETL, and six
analytical queries on the actual Airbnb schemas (SURVEY.md §1, §3).

A user of the reference repo switches by calling:
  etl.run_listings_etl / etl.run_reviews_etl   (the two DAGs)
  analysis.q1_... .. q6_...                    (Airbnb_Analysis.py:24-229)
"""

from . import analysis, etl, schemas  # noqa: F401
