#!/usr/bin/env python
"""BPE training scale measurement (round 9 — SCALING.md evidence).

The bpe_train claim is VOCABULARY-bounded cost: after the one corpus
pass that builds the word-type table, every merge round touches only
|types| rows regardless of corpus size. This harness builds a
deterministic synthetic type table directly at a chosen vocabulary size
(Zipf-ish frequencies, words synthesized from a 26-letter base-5+
positional code — no RNG), injects it through a tiny documents frame
whose "text" IS the word list, and measures:

  1. total train wall time and per-round mean for n_merges rounds;
  2. the same at 10x the vocabulary — the scaling ratio IS the claim
     (rounds cost ~O(|types|), not O(corpus)).

Prints ONE JSON line; SCALING.md quotes the recorded numbers.

Usage: python tools/bpe_bench.py [n_types] [n_merges]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from correlationapi_spark.llm.text import bpe_train  # noqa: E402
from correlationapi_spark.session import get_spark  # noqa: E402


def type_corpus(spark, n_types: int):
    """One synthetic document per word type, text = the word repeated
    freq times is unnecessary — bpe_train only needs the (word, freq)
    reduction, so emit each word ONCE per its Zipf-ish count capped at
    50 (the reduction result is identical; corpus size stays bounded
    while the TYPE table hits exactly n_types rows)."""
    words = spark.range(n_types).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(0), F.lit(5) + (F.col("id") % 4)),
                lambda i: F.chr(
                    F.lit(97)
                    + F.pmod(
                        F.floor(
                            F.col("id")
                            / F.pow(F.lit(7.0), i.cast("double"))
                        ).cast("long")
                        + i.cast("long") * 3,
                        F.lit(26),
                    )
                ),
            ),
        ).alias("w"),
        (F.lit(1) + F.pmod(F.lit(5000), F.col("id") + 1)).alias("freq"),
    )
    # text = word repeated freq-capped times, space-joined
    return words.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.least(F.col("freq"), F.lit(50))),
                lambda _: F.col("w"),
            ),
        ).alias("text"),
    )


def run(spark, n_types: int, n_merges: int):
    docs = type_corpus(spark, n_types).persist()
    docs.count()
    t0 = time.time()
    merges, words = bpe_train(
        docs, n_merges=n_merges, vocab_cap=n_types, min_pair_freq=1
    )
    n_types_final = words.count()
    dt = time.time() - t0
    docs.unpersist()
    return {
        "n_types_requested": n_types,
        "n_types_trained": n_types_final,
        "n_merges_done": len(merges),
        "train_wall_sec": round(dt, 2),
        "per_round_sec": round(dt / max(len(merges), 1), 3),
    }


def main() -> None:
    n_types = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    spark = get_spark("bpe-bench")
    spark.sparkContext.setLogLevel("ERROR")
    small = run(spark, n_types, n_merges)
    big = run(spark, n_types * 10, n_merges)
    print(
        json.dumps(
            {
                "n_merges": n_merges,
                "small": small,
                "big_10x": big,
                "per_round_ratio_10x_vocab": round(
                    big["per_round_sec"] / small["per_round_sec"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
