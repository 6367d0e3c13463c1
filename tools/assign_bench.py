#!/usr/bin/env python
"""Centroid-assignment scale measurement (round 8 — SCALING.md evidence).

`nearest_centroid_assign` is the k-means E-step / IVF-routing primitive:
broadcast k centroid rows, score every corpus row map-side (k guarded
cosines per row, no corpus shuffle), argmax via a row-local window.
Round 7 oracle-checked its 8-centroid fixture form; this tool measures
the SCALE form the 100 TB story rests on: 1M vectors × k=256 centroids
(the round-7 verdict's task-7 prescription), on the same deterministic
synthetic manifold corpus as tools/ivf_bench.py.

Reported:
- wall time for the full assignment (count() over the labeled corpus);
- rows/s;
- the broadcast-size ceiling: k × (dim+overhead) doubles — the ONLY
  driver-side state, independent of corpus size (k=256, d=32 →
  ~66 KB; even k=65536, d=1024 is ~0.5 GB, still broadcastable).

Usage: python tools/assign_bench.py [n_vectors] [k]
Prints ONE JSON line; SCALING.md quotes the recorded numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from correlationapi_spark.llm.similarity import (  # noqa: E402
    nearest_centroid_assign,
    nearest_centroid_assign_np,
)
from correlationapi_spark.session import get_spark  # noqa: E402
from tools.ivf_bench import DIM, synthetic_corpus  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    impls = (sys.argv[3].split(",") if len(sys.argv) > 3 else ["np", "expr"])
    spark = get_spark("assign-bench")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = synthetic_corpus(spark, n).persist()
    corpus.count()  # materialize outside the timed region

    # centroid ids spread across the manifold (same spreading rationale
    # as ivf_bench's probes: clustered ids would make every cell tiny)
    centroid_ids = [i * (n // k) for i in range(k)]

    out = {
        "n_vectors": n,
        "k": k,
        "dim": DIM,
        "broadcast_bytes_ceiling": k * (DIM + 2) * 8,
    }
    for impl in impls:
        fn = nearest_centroid_assign_np if impl == "np" else nearest_centroid_assign
        t0 = time.time()
        assigned = fn(corpus, centroid_ids)
        n_assigned = assigned.count()
        wall = time.time() - t0
        n_cells = assigned.select("cell").distinct().count()
        out[impl] = {
            "n_assigned": n_assigned,
            "n_cells_used": n_cells,
            "wall_sec": round(wall, 2),
            "rows_per_sec": int(n_assigned / wall),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
