"""Weak-scaling probe for the round-12 second-wave keys.

Times the Spark-side plan (noop sink, min of 3 reps after a staging
rep) at sf0.01 and sf0.1 — 10x the documents/embeddings corpus — and
prints the per-key ratio. The composite keys' claim is linear-in-corpus
cost (one corpus shuffle / scan each); the fixed-fixture graph key
should be FLAT (its 120-node planted graph is scale-independent after
the bounded customer-slice scan).

Usage: python scripts/round12b_scale.py [key ...]
Output table is committed to scripts/round12b_scale.log (SCALING.md
quotes numbers only with a committed raw log — VERDICT r11 #2).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from airbnb_listings_reviews_data_engineering_spark.checkpoint import (  # noqa: E402
    release_pins,
)
from airbnb_listings_reviews_data_engineering_spark.plans import all_queries  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.session import get_spark  # noqa: E402

DEFAULT_KEYS = [
    "pipeline_training_mixture",
    "sample_contrastive_triplets",
    "ml_adaboost_stumps",
    "sample_influence_proxy",
    "text_semantic_chunking",
    "graph_label_prop_communities",
]

SFS = ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def time_key(spark, fn, sf_dir: str, reps: int = 3) -> float:
    # staging rep: JIT + shuffle-file warmup, not measured
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    release_pins(spark)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
        release_pins(spark)
    return best


def main() -> int:
    keys = sys.argv[1:] or DEFAULT_KEYS
    spark = get_spark()
    qs = all_queries()
    print(f"{'key':<32} {'sf0.01 s':>9} {'sf0.1 s':>9} {'ratio':>6}")
    for k in keys:
        ts = [time_key(spark, qs[k].fn, sf) for sf in SFS]
        print(f"{k:<32} {ts[0]:>9.3f} {ts[1]:>9.3f} {ts[1] / ts[0]:>6.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
