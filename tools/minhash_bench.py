#!/usr/bin/env python
"""MinHash-LSH near-dup measurement at scale (round 8 — SCALING.md).

The recall contract for `minhash_near_dup_pairs` (q_dedup_near's engine)
is unit-tested at fixture scale against the exact n-gram Jaccard key;
this tool measures the SCALE story: a deterministic synthetic corpus of
N documents with PLANTED near-duplicate pairs, fully expression-side (no
Python RNG, same args → same corpus):

- doc i gets L=60 tokens `w<xxhash64(base, j) mod V>` (hash-scrambled,
  so unrelated docs share no shingle runs — an early arithmetic
  token formula made every 7th doc pair near-identical and the join
  rightly exploded);
- every 100th EVEN doc's odd neighbor is a mutated copy: same base
  tokens, every 10th position replaced — ~16 of 58 3-shingles broken,
  planted Jaccard ≈ 0.57 (distance ≈ 0.43, inside the 0.6 cut).

Reported: wall for the full LSH pipeline (shingle → HashingTF →
MinHashLSH → banded join → distance refine), recall over the planted
pairs, total emitted pairs, and the candidate-blowup ratio vs n².

Usage: python tools/minhash_bench.py [n_docs] [num_tables]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from correlationapi_spark.llm.dedup import minhash_near_dup_pairs  # noqa: E402
from correlationapi_spark.session import get_spark  # noqa: E402

L = 60       # tokens per doc
V = 100_000  # vocabulary size
PLANT_EVERY = 100  # every PLANT_EVERY-th even doc gets a near-dup twin


def synthetic_docs(spark, n: int):
    """(doc_id, text): deterministic, expression-side corpus with
    planted near-dup (2k, 2k+1) pairs for k % (PLANT_EVERY//2) == 0."""
    planted = (F.col("id") % PLANT_EVERY == 1)
    base = F.when(planted, F.col("id") - 1).otherwise(F.col("id"))

    def token(j):
        jj = j.cast("long")
        mutate = planted & (jj % 10 == 0)
        return F.when(mutate, F.concat(F.lit("x"), jj.cast("string"))).otherwise(
            F.concat(F.lit("w"), F.pmod(F.xxhash64(base, jj), F.lit(V)).cast("string"))
        )

    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.transform(F.sequence(F.lit(0), F.lit(L - 1)), token)
        ).alias("text"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    num_tables = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("minhash-bench")
    spark.sparkContext.setLogLevel("ERROR")

    docs = synthetic_docs(spark, n).persist()
    docs.count()  # materialize outside the timed region

    t0 = time.time()
    pairs = minhash_near_dup_pairs(
        docs, max_distance=0.6, num_tables=num_tables
    ).persist()
    n_pairs = pairs.count()
    wall = time.time() - t0

    planted = {(i - 1, i) for i in range(1, n, PLANT_EVERY)}
    got = {
        (r.doc_a, r.doc_b)
        for r in pairs.filter(
            (F.col("doc_b") - F.col("doc_a") == 1)
            & (F.col("doc_a") % PLANT_EVERY == 0)
        ).collect()
    }
    recall = len(got & planted) / len(planted)

    out = {
        "n_docs": n,
        "num_tables": num_tables,
        "n_planted": len(planted),
        "recall_planted": round(recall, 4),
        "n_pairs_emitted": n_pairs,
        "pairs_vs_n2": round(n_pairs / (n * (n - 1) / 2), 10),
        "wall_sec": round(wall, 2),
        "docs_per_sec": int(n / wall),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
