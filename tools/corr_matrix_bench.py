#!/usr/bin/env python
"""Wide correlation-matrix measurement harness (round 10 — the scale
claim behind q_corr_matrix_gram, measured).

Two exact routes to the same k×k Pearson matrix over a DETERMINISTIC
1M-row synthetic table (d numeric columns, each a distinct smooth
function of the row id plus cross-column coupling so correlations are
non-trivial):

  a. aggregate route (q_corr_matrix's shape) — d(d-1)/2 F.corr
     aggregates in ONE pass. Ideal at small d; the expression tree and
     per-group aggregation state grow quadratically with d, and every
     corr aggregate re-derives its own moments.
  b. gram route (q_corr_matrix_gram / corr_matrix_gram) — one
     Arrow-batched mapInPandas pass emits a single
     (n, Σx[d], upper-gram[d(d+1)/2]) row per partition (BLAS matmul
     per batch), one d-invariant aggregate reduces them, pairs are a
     closed-form projection.

Values are cross-checked: every pair's corr must agree to 6 dp between
the two routes (they do — both are exact raw-moment algebra).

Prints ONE JSON line; SCALING.md quotes the recorded numbers.

Usage: python tools/corr_matrix_bench.py [n_rows] [d1,d2,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from correlationapi_spark.operators.stats import corr_matrix_gram  # noqa: E402
from correlationapi_spark.session import get_spark  # noqa: E402


def synthetic(spark, n_rows: int, d: int):
    """d coupled numeric columns of the row id — smooth, full-rank,
    deterministic (no RNG state)."""
    t = F.col("id").cast("double") / n_rows * 6.2832
    cols = [
        (
            F.sin(t * (1.0 + j * 0.37) + j)
            + 0.3 * F.sin(t * (1.0 + ((j + 1) % d) * 0.37) + (j + 1) % d)
            + 0.001 * ((F.col("id") + j) % 997).cast("double")
        ).alias(f"x{j}")
        for j in range(d)
    ]
    return spark.range(n_rows).select(*cols)


def agg_route(df, d: int):
    names = [f"x{j}" for j in range(d)]
    aggs = [
        F.round(F.corr(a, b), 6).alias(f"c_{i}_{j}")
        for i, a in enumerate(names)
        for j, b in enumerate(names)
        if i < j
    ]
    row = df.agg(*aggs).collect()[0]
    return {
        (i, j): row[f"c_{i}_{j}"]
        for i in range(d)
        for j in range(i + 1, d)
    }


def gram_route(df, d: int):
    names = [f"x{j}" for j in range(d)]
    rows = corr_matrix_gram(df, names, "synth").collect()
    idx = {n: k for k, n in enumerate(names)}
    return {(idx[r.col_x], idx[r.col_y]): r.corr_xy for r in rows}


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dims = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [8, 16, 32, 64]
    )
    # the aggregate route OOMs the local JVM past this width (the
    # quadratic-in-d aggregation state IS the finding — record it as a
    # cap instead of crashing the session mid-sweep)
    agg_max_d = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    spark = get_spark("corr-matrix-bench")
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for d in dims:
        df = synthetic(spark, n_rows, d).persist()
        df.count()  # materialize outside the timed regions
        entry = {"d": d, "pairs": d * (d - 1) // 2}
        a = None
        if d <= agg_max_d:
            t0 = time.time()
            a = agg_route(df, d)
            entry["agg_route_sec"] = round(time.time() - t0, 2)
        else:
            entry["agg_route_sec"] = None
        t0 = time.time()
        g = gram_route(df, d)
        entry["gram_route_sec"] = round(time.time() - t0, 2)
        if a is not None:
            entry["pairs_disagreeing_beyond_6dp"] = sum(
                1
                for k in a
                if a[k] is not None
                and g.get(k) is not None
                and abs(a[k] - g[k]) > 1e-6
            )
        results.append(entry)
        df.unpersist()

    print(json.dumps({"n_rows": n_rows, "sweep": results}))


if __name__ == "__main__":
    main()
