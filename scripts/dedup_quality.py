"""Measured precision/recall of MinHash-LSH near-dup pairs vs exact
n-gram Jaccard (VERDICT r2 "Next round" #8).

Both operators run on the SAME corpus slice with the same shingle width;
exact `ngram_jaccard_pairs` (AllPairs prefix filtering — zero false
negatives at the threshold) is the ground truth, `minhash_lsh_pairs`
(8-hash signature, 4 bands) is the probe. A pair is:

- true positive: emitted by LSH AND truly >= t by exact Jaccard;
- false positive: emitted by LSH (est >= t) but exact Jaccard < t —
  signature-agreement overestimates on a small hash count;
- false negative: truly >= t but never collided in any band, or
  collided with est < t.

precision = TP/(TP+FP), recall = TP/(TP+FN). The 8-hash/4-band S-curve
is coarse (est is a multiple of 1/8); the table quantifies what that
budget buys and what raising num_hashes adds — the dedup-quality twin
of the ANN recall table.

Usage: python scripts/dedup_quality.py [sf_dir]
Updates the marker-delimited section of SCALING.md.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from airbnb_listings_reviews_data_engineering_spark.checkpoint import (  # noqa: E402
    release_pins,
)
from airbnb_listings_reviews_data_engineering_spark.operators import (  # noqa: E402
    dedup as D,
)
from airbnb_listings_reviews_data_engineering_spark.session import get_spark  # noqa: E402

START = "<!-- DEDUP_QUALITY_START -->"
END = "<!-- DEDUP_QUALITY_END -->"

THRESHOLD = 0.5
SHINGLE = 3


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark()
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    # Variants keep a PREFIX of each doc's tokens whose fraction sweeps
    # 0.30..0.94 by doc id, so true pair Jaccards spread across the
    # whole [0.2, 0.95] range and straddle the threshold — dropping one
    # word (the scale_smoke fixture) puts every true pair at J~0.97,
    # where any budget scores a trivial 1.0/1.0 and the S-curve is
    # invisible.
    variants = base.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.expr(
            "concat_ws(' ', slice(split(text, ' '), 1, greatest(3, "
            "cast(size(split(text, ' ')) * (0.30 + (doc_id % 65) / 100.0) "
            "as int))))"
        ).alias("text"),
    )
    corpus = base.unionByName(variants)

    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(
            corpus, "doc_id", "text", shingle=SHINGLE, threshold=THRESHOLD
        ).collect()
    }
    lines = [
        f"### {sf_dir}: {corpus.count():,} docs "
        f"({base.count():,} base + near-dup variants), threshold {THRESHOLD}, "
        f"{SHINGLE}-gram shingles",
        "",
        "| LSH budget | pairs emitted | true pairs | precision | recall |",
        "|---|---|---|---|---|",
    ]
    for num_hashes, bands in ((8, 4), (16, 8), (32, 16)):
        lsh = {
            (r["doc_a"], r["doc_b"])
            for r in D.minhash_lsh_pairs(
                corpus,
                "doc_id",
                "text",
                num_hashes=num_hashes,
                bands=bands,
                threshold=THRESHOLD,
                shingle=SHINGLE,
            ).collect()
        }
        tp = len(lsh & exact)
        prec = tp / len(lsh) if lsh else 1.0
        rec = tp / len(exact) if exact else 1.0
        lines.append(
            f"| {num_hashes} hashes / {bands} bands | {len(lsh):,} | "
            f"{len(exact):,} | {prec:.3f} | {rec:.3f} |"
        )
        print(
            f"{num_hashes}h/{bands}b: lsh={len(lsh)} exact={len(exact)} "
            f"p={prec:.3f} r={rec:.3f}",
            flush=True,
        )
        release_pins(spark)

    body = [
        START,
        "",
        "## MinHash-LSH dedup quality vs exact n-gram Jaccard",
        "",
        *lines,
        "",
        "Ground truth is the prefix-filtered AllPairs exact join (zero",
        "false negatives at the threshold, tests/test_iterative_ops.py).",
        "Precision loss = signature-agreement overestimate (est is a",
        "multiple of 1/num_hashes); recall loss = true pairs that never",
        "collide in a band. Both tighten as the signature budget grows;",
        "the map-side signature cost grows linearly with num_hashes while",
        "the band join stays an equi-join — at 100 TB the budget is a",
        "per-run knob, not an architecture change.",
        f"Regenerate: `python scripts/dedup_quality.py {sf_dir}`.",
        END,
    ]
    text = "\n".join(body) + "\n"
    with open("/root/repo/SCALING.md") as f:
        old = f.read()
    if START in old:
        new = old.split(START)[0] + text + old.split(END)[-1]
    else:
        new = old.rstrip() + "\n\n" + text
    with open("/root/repo/SCALING.md", "w") as f:
        f.write(new)
    print("SCALING.md dedup-quality section updated")


if __name__ == "__main__":
    main()
