#!/usr/bin/env python
"""Skew-join measurement harness (round 10 — the r9 verdict's ask:
hard evidence that BOTH skew mitigations bound the straggler on a
deliberately zipfian key distribution, and where the crossover sits).

Corpus: a DETERMINISTIC 10M-row fact table whose join key mixes a
planted hot key (30% of all rows on key 1 — the "celebrity" row) with
a zipf(s≈1) tail over 100k keys (key = ⌊pow(n_keys, u)⌋ with u a
xxhash64-derived uniform — log-uniform sampling gives p(k) ∝ 1/k).
The dim side carries one row per key, too big to broadcast honestly
(autoBroadcastJoinThreshold = -1 for every variant), so the join is a
shuffled sort-merge join — the shape where a hot key becomes ONE
straggler task.

Variants (identical results, verified by comparing the aggregate):
  a. skew_unmitigated — AQE on but skewJoin disabled: the straggler
     baseline (one task owns 3M of 10M rows).
  b. aqe_skew_split  — AQE skewJoin enabled with thresholds sized to
     the fixture (skewedPartitionThresholdInBytes lowered so a 3M-row
     partition qualifies); Spark splits the hot partition at runtime.
  c. manual_salt_16  — the q_join_salted technique: dim exploded x16,
     fact salted by pmod(xxhash64(row_id), 16), join on (key, salt);
     works even where AQE can't re-plan (pre-aggregated exchanges,
     non-SMJ paths) at the cost of 16x dim replication.

Prints ONE JSON line; SCALING.md quotes the recorded numbers.

Usage: python tools/skew_bench.py [n_rows] [n_keys]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from correlationapi_spark.session import get_spark  # noqa: E402

SALT = 16
HOT_FRACTION = 0.3


def tables(spark, n_rows: int, n_keys: int):
    """Deterministic zipfian fact + per-key dim (no RNG state)."""
    u1 = (F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(1_000_000))
          .cast("double") / 1_000_000.0)
    u2 = (F.pmod(F.xxhash64(F.col("id") * 2), F.lit(1_000_000))
          .cast("double") / 1_000_000.0)
    zipf_tail = (
        F.pow(F.lit(float(n_keys)), u2).cast("bigint") + 1
    )  # p(k) ~ 1/k over [1, n_keys]
    fact = spark.range(n_rows).select(
        F.col("id").alias("row_id"),
        F.when(u1 < HOT_FRACTION, F.lit(1)).otherwise(zipf_tail).alias("k"),
        (F.col("id") % 1000).cast("double").alias("x"),
    )
    dim = spark.range(1, n_keys + 2).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).cast("double").alias("w"),
    )
    return fact, dim


def run_variant(spark, fact, dim, salted: bool):
    """Join + global aggregate; returns (wall_sec, checksum)."""
    t0 = time.time()
    if salted:
        dim_s = dim.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1)))
        )
        fact_s = fact.withColumn(
            "salt", F.pmod(F.xxhash64("row_id"), F.lit(SALT)).cast("int")
        )
        j = fact_s.join(dim_s, ["k", "salt"])
    else:
        j = fact.join(dim, "k")
    row = j.agg(
        F.count("*").alias("n"),
        F.sum(F.col("x") * F.col("w")).alias("s"),
    ).collect()[0]
    return time.time() - t0, (int(row.n), round(float(row.s), 3))


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # size the AQE skew thresholds to the fixture: default 256 MB would
    # never classify a ~50 MB hot partition as skewed
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m"
    )
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m"
    )

    fact, dim = tables(spark, n_rows, n_keys)
    fact = fact.persist()
    hot_rows = fact.filter(F.col("k") == 1).count()  # also materializes

    results = {}
    checks = set()
    for name, skew_on, salted in (
        ("skew_unmitigated", False, False),
        ("aqe_skew_split", True, False),
        ("manual_salt_16", False, True),
    ):
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower()
        )
        # two timed runs, keep the best (JIT/shuffle-service warmup)
        best, check = None, None
        for _ in range(2):
            dt, check = run_variant(spark, fact, dim, salted)
            best = dt if best is None else min(best, dt)
        results[name] = round(best, 2)
        checks.add(check)
    assert len(checks) == 1, f"variants disagree: {checks}"

    print(
        json.dumps(
            {
                "n_rows": n_rows,
                "n_keys": n_keys,
                "hot_key_rows": hot_rows,
                "hot_key_share": round(hot_rows / n_rows, 4),
                "salt": SALT,
                "wall_sec": results,
                "result_checksum": list(checks)[0],
                "notes": "identical aggregates across variants; "
                "autoBroadcastJoinThreshold=-1 so all variants are "
                "shuffled sort-merge joins",
            }
        )
    )


if __name__ == "__main__":
    main()
