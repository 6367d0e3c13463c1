#!/usr/bin/env python
"""Iterative k-means scale measurement (round 8 — SCALING.md evidence).

`kmeans_lloyd` is the convergence loop whose single round the
oracle-checked q_cluster_kmeans_step pins. Each iteration is ONE fused
mapInPandas pass over the corpus (E-step matmul + batch-local M-step
partial sums) plus a k×(d+1)-row aggregate — the corpus is never
shuffled and never joined back, and the only driver state is the k×d
float64 centroid matrix. This tool measures the loop at scale on the
same deterministic synthetic manifold corpus as tools/ivf_bench.py /
tools/assign_bench.py.

Reported:
- total wall and per-iteration wall for n_iter Lloyd rounds;
- rows/s per iteration (each iteration reads the persisted corpus once);
- the objective trace (mean cosine — must be non-decreasing) and final
  shift, as a correctness sanity on the measured run;
- the driver-state ceiling: k × d × 8 bytes.

Usage: python tools/kmeans_bench.py [n_vectors] [k] [n_iter]
Prints ONE JSON line; SCALING.md quotes the recorded numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from correlationapi_spark.llm.similarity import kmeans_lloyd  # noqa: E402
from correlationapi_spark.session import get_spark  # noqa: E402
from tools.ivf_bench import DIM, synthetic_corpus  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_iter = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("kmeans-bench")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = synthetic_corpus(spark, n).persist()
    corpus.count()  # materialize outside the timed region

    t0 = time.time()
    res = kmeans_lloyd(corpus, k=k, n_iter=n_iter, tol=0.0)
    wall = time.time() - t0
    iters = res["iterations"]
    mono = all(
        b >= a - 1e-9
        for a, b in zip(res["objective"], res["objective"][1:])
    )
    print(
        json.dumps(
            {
                "n_vectors": n,
                "k": k,
                "dim": DIM,
                "n_iter_run": iters,
                "converged": res["converged"],
                "wall_sec": round(wall, 2),
                "wall_per_iter_sec": round(wall / iters, 2),
                "rows_per_sec_per_iter": int(n * iters / wall),
                "objective": [round(o, 6) for o in res["objective"]],
                "objective_monotone": mono,
                "final_shift": round(res["shifts"][-1], 6),
                "driver_state_bytes": k * DIM * 8,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
