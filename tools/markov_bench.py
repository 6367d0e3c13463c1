#!/usr/bin/env python
"""Large-state scale evidence for markov_stationary (the engine behind
q_event_markov_stationary / api.stationary): a LAZY STAR chain with a
known NON-uniform stationary distribution at 100k+ states.

Center c: stays put w.p. 0.5, else uniform over the n-1 leaves; every
leaf: stays w.p. 0.5, else returns to c. Detailed balance gives
pi_c = 1/2 and pi_leaf = 1/(2(n-1)) exactly — and because the start is
UNIFORM (maximally far from this pi), convergence is non-trivial: the
lazy chain contracts at ~0.5/round, so the round count is a sharp
signal that the iteration actually moved mass.
Usage: python tools/markov_bench.py [--quick]
"""

from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from pyspark.sql import functions as F

from correlationapi_spark.session import get_spark


def main() -> int:
    quick = "--quick" in sys.argv
    n = 10_000 if quick else 100_000
    spark = get_spark("markov-bench")
    from correlationapi_spark.operators.analytics import markov_stationary

    leaves = spark.range(1, n)
    tm = (
        # center 0: lazy self-loop + uniform exit to the leaves
        spark.range(1).select(
            F.lit("0").alias("s"), F.lit("0").alias("d"),
            F.lit(0.5).alias("p"),
        )
        .unionAll(
            leaves.select(
                F.lit("0").alias("s"),
                F.col("id").cast("string").alias("d"),
                (F.lit(0.5) / (n - 1)).alias("p"),
            )
        )
        # every leaf: lazy self-loop + return to center
        .unionAll(
            leaves.select(
                F.col("id").cast("string").alias("s"),
                F.col("id").cast("string").alias("d"),
                F.lit(0.5).alias("p"),
            )
        )
        .unionAll(
            leaves.select(
                F.col("id").cast("string").alias("s"),
                F.lit("0").alias("d"),
                F.lit(0.5).alias("p"),
            )
        )
    )
    t0 = time.time()
    res = markov_stationary(tm, n_iter=60, tol=1e-9)
    pi_leaf = 1.0 / (2.0 * (n - 1))
    stats = res.agg(
        F.count("*").alias("k"),
        F.max(F.when(F.col("state") == "0", F.col("pi"))).alias("pi_c"),
        F.max(
            F.when(F.col("state") != "0", F.abs(F.col("pi") - pi_leaf))
        ).alias("max_leaf_dev"),
        F.any_value("n_rounds").alias("rounds"),
    ).collect()[0]
    wall = time.time() - t0
    assert stats.k == n
    assert abs(stats.pi_c - 0.5) <= 1e-6, stats      # pi_center = 1/2
    assert stats.max_leaf_dev <= 1e-6, stats         # pi_leaf = 1/(2(n-1))
    assert stats.rounds >= 10, stats  # non-trivial mass movement
    print(
        f"markov_stationary: {n}-state lazy star -> pi_c "
        f"{stats.pi_c} (exact 0.5), leaf dev {stats.max_leaf_dev:.1e} "
        f"in {stats.rounds} rounds, {wall:.1f}s wall"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
