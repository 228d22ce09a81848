"""Fact blow-up sweep for the two steepest round-12 second-wave slopes
(VERDICT r12 #8): sample_influence_proxy (sf0.01->0.1 ratio 1.87) and
text_semantic_chunking (1.53).

Instead of the sf ladder (whose steps confound corpus size with table
shape), this stages 1x/10x/30x FACT BLOW-UPS of the sf0.01 tables each
key actually loads — documents for the chunker, lineitem+orders for the
influence scorer (copy i offsets every key by i*10_000_000, suffixes
every token by the copy index) — into sf-dir-shaped scratch directories
and runs the UNMODIFIED keys against them. Linear plans must show
t10/t1 <= 10 and t30/t10 <= 3, with the ratios FALLING as fixed
overhead amortizes; a superlinear stage would show the opposite.

Usage: python scripts/round13_scale.py
Output table is committed to scripts/round13_scale.log (SCALING.md
quotes numbers only with a committed raw log — VERDICT r11 #2).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from airbnb_listings_reviews_data_engineering_spark.checkpoint import (  # noqa: E402
    release_pins,
)
from airbnb_listings_reviews_data_engineering_spark.plans import all_queries  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.session import get_spark  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.sources.staging import (  # noqa: E402
    staging_root,
)

BASE = "/root/testdata/sf0.01"
MULTS = [1, 10, 30]
KEYS = ["sample_influence_proxy", "text_semantic_chunking"]


def _union_copies(base, k, remap):
    out = None
    for i in range(k):
        c = remap(base, i)
        out = c if out is None else out.unionByName(c)
    return out


def stage_blowup(spark, k: int) -> str:
    """Write 1 blown-up copy-set of the tables the swept keys load into
    an sf-dir-shaped scratch directory."""
    root = os.path.join(staging_root(spark), f"r13_blowup_{k}x")
    if os.path.isdir(root):
        shutil.rmtree(root)
    os.makedirs(root)
    docs = spark.read.parquet(f"{BASE}/documents.parquet").select(
        "doc_id", "text"
    )
    _union_copies(
        docs,
        k,
        lambda b, i: b.select(
            (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
            F.concat_ws(
                " ",
                F.expr(f"transform(split(text, ' '), t -> concat(t, '{i}'))"),
            ).alias("text"),
        ),
    ).write.parquet(os.path.join(root, "documents.parquet"))
    orders = spark.read.parquet(f"{BASE}/orders.parquet").select(
        "o_orderkey"
    )
    _union_copies(
        orders,
        k,
        lambda b, i: b.select(
            (F.col("o_orderkey") + i * 10_000_000).alias("o_orderkey")
        ),
    ).write.parquet(os.path.join(root, "orders.parquet"))
    li = spark.read.parquet(f"{BASE}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    _union_copies(
        li,
        k,
        lambda b, i: b.select(
            (F.col("l_orderkey") + i * 10_000_000).alias("l_orderkey"),
            "l_quantity",
        ),
    ).write.parquet(os.path.join(root, "lineitem.parquet"))
    return root


def time_key(spark, fn, sf_dir: str, reps: int = 3) -> float:
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
    spark = get_spark()
    qs = all_queries()
    dirs = {k: stage_blowup(spark, k) for k in MULTS}
    print(
        f"{'key':<28} {'1x s':>8} {'10x s':>8} {'30x s':>8} "
        f"{'r10/1':>6} {'r30/10':>7}"
    )
    for key in KEYS:
        ts = [time_key(spark, qs[key].fn, dirs[m]) for m in MULTS]
        print(
            f"{key:<28} {ts[0]:>8.3f} {ts[1]:>8.3f} {ts[2]:>8.3f} "
            f"{ts[1] / ts[0]:>6.2f} {ts[2] / ts[1]:>7.2f}"
        )
    for d in dirs.values():
        shutil.rmtree(d, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
