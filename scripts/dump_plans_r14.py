"""Dump .explain('formatted') for the named keys to plans/r14/<key>_<tag>.txt."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from airbnb_listings_reviews_data_engineering_spark.checkpoint import release_pins  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.plans import all_queries  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.session import get_spark  # noqa: E402

tag = sys.argv[1]
keys = sys.argv[2:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = "/root/repo/plans/r14"
os.makedirs(out_dir, exist_ok=True)
spark = get_spark()
qs = all_queries()
for key in keys:
    df = qs[key].fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(out_dir, f"{key}_{tag}.txt"), "w") as f:
        f.write(plan)
    release_pins(spark)
    print("dumped", key, flush=True)
