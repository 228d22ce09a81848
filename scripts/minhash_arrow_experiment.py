"""Experiment (guide §4.2): can the minhash signature map-side pass be
faster as mapInPandas + hashlib/numpy than as the JVM md5+HOF chain,
with BITWISE-identical output?"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from airbnb_listings_reviews_data_engineering_spark.session import get_spark  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.plans.registry import load  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.operators import dedup as D  # noqa: E402
from airbnb_listings_reviews_data_engineering_spark.functions.hashing import XOR_SEEDS  # noqa: E402

sf_dir = "/root/testdata/sf0.1"
spark = get_spark()
docs = load(spark, sf_dir, "documents").select("doc_id", "text")

NUM_HASHES = 8
SHINGLE = 3


def jvm_sig():
    return D.minhash_signature(docs, "doc_id", "text", NUM_HASHES, SHINGLE)


def arrow_sig():
    import hashlib

    import numpy as np
    import pandas as pd

    seeds = np.array(XOR_SEEDS[:NUM_HASHES], dtype=np.int64)

    def gen(batches):
        for pdf in batches:
            ids = []
            sigs = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                tok = text.split(" ")
                n = len(tok)
                if n < SHINGLE:
                    continue
                hs = np.fromiter(
                    (
                        int(
                            hashlib.md5(
                                " ".join(tok[i : i + SHINGLE]).encode()
                            ).hexdigest()[:15],
                            16,
                        )
                        for i in range(n - SHINGLE + 1)
                    ),
                    dtype=np.int64,
                    count=n - SHINGLE + 1,
                )
                ids.append(doc_id)
                sigs.append((hs[:, None] ^ seeds[None, :]).min(axis=0))
            if ids:
                out = pd.DataFrame(
                    np.vstack(sigs), columns=[f"h{j}" for j in range(NUM_HASHES)]
                )
                out.insert(0, "doc_id", np.array(ids, dtype=np.int64))
                yield out

    schema = "doc_id long, " + ", ".join(f"h{j} long" for j in range(NUM_HASHES))
    return docs.mapInPandas(gen, schema=schema)


for name, fn in (("jvm", jvm_sig), ("arrow", arrow_sig)):
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: best {best:.3f}s", flush=True)

# bitwise equality
a = jvm_sig().orderBy("doc_id").collect()
b = arrow_sig().orderBy("doc_id").collect()
print("rows:", len(a), len(b), "identical:", a == b)
