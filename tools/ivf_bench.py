#!/usr/bin/env python
"""IVF ANN measurement harness (round 6 — SCALING.md evidence).

Builds a DETERMINISTIC synthetic corpus (default 100k vectors, d=32: a
smooth 1D manifold swept through R^32 plus per-id sinusoidal jitter — no
RNG state, same args → same vectors), then measures:

1. exact brute-force top-10 for N_PROBES probe ids (ground truth + the
   exact-path latency baseline);
2. the IVF path: one index (n_cells=100 KMeans coarse quantizer trained
   on a 10% SAMPLE — the 100 TB posture) reused across an n_probe sweep,
   recording recall@10 vs the exact answer and wall time per setting;
3. the bucketed-layout demonstration: the assigned corpus written
   ``partitionBy("cell")``, then a probe-read filtered to one probe's
   n_probe cells — asserting the scan PRUNES partitions (PartitionFilters
   in the plan, pruned file count) and timing the pruned refine against
   a full-scan refine.

Prints ONE JSON line; SCALING.md quotes the recorded numbers.

Usage: python tools/ivf_bench.py [n_vectors] [out_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from correlationapi_spark.llm.similarity import (  # noqa: E402
    cosine,
    ivf_append,
    ivf_imbalance,
    ivf_index,
    ivf_live,
    ivf_probe,
    ivf_recluster,
    ivf_write,
    topk_neighbors_exact,
)
from correlationapi_spark.session import get_spark  # noqa: E402

N_CLUSTERS = 50
DIM = 32
K = 10
N_PROBES = 20
N_CELLS = 100
TRAIN_FRACTION = 0.1
PROBE_SWEEP = (1, 2, 5, 10, 20, 50, 100)


def synthetic_corpus(spark, n: int):
    """(vec_id, v): smooth-manifold position + deterministic per-id
    sinusoidal jitter — fully expression-side, no Python RNG."""
    # round 9: the manifold period SCALES with n (n//5 → 5 near-duplicate
    # ids per position at any corpus size). The round-6 fixed 20k period
    # collapsed the recall curve at 1M: 50 same-position duplicates per
    # probe meant its entire top-10 sat in its own cell and every
    # n_probe scored 1.0 — a harness artifact, not index quality.
    period = max(20_000, n // 5)

    def component(d):
        dd = d.cast("double")
        # a smooth 1D manifold (position t ∈ [0, 2π) sweeps a curve in
        # R^32) + small per-id jitter: KMeans cells cut the manifold
        # into arcs, so a probe near a cut has true neighbors in the
        # ADJACENT cell — the recall-vs-n_probe trade-off is visible.
        # (Separated blob mixtures were useless here: each blob fell
        # wholly inside one cell and n_probe=1 already scored 0.97.)
        t = (F.col("id") % period).cast("double") / period * 6.2832
        return F.sin(t * (1.0 + dd * 0.11) + dd) + 0.05 * F.sin(
            F.col("id").cast("double") * 1.0001 + dd * 0.37
        )

    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)), component).alias("v"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ivf_bench"
    spark = get_spark("ivf-bench")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = synthetic_corpus(spark, n).persist()
    corpus.count()  # materialize outside any timed region

    # probe ids SPREAD across the corpus (vec_id < 20 put all probes at
    # one manifold position whose whole neighborhood shared one cell —
    # recall was 1.0 at every n_probe, no curve)
    probe_ids = [i * (n // N_PROBES) for i in range(N_PROBES)]
    probe_filter = F.col("vec_id").isin(probe_ids)

    # 1. exact ground truth + latency baseline
    t0 = time.time()
    exact_rows = topk_neighbors_exact(corpus, probe_filter, K).collect()
    t_exact = time.time() - t0
    truth: dict[int, set[int]] = {}
    for r in exact_rows:
        truth.setdefault(r.probe_id, set()).add(r.neighbor_id)

    # 2. one sample-trained index, swept over n_probe
    t0 = time.time()
    assigned, cents = ivf_index(
        corpus, n_cells=N_CELLS, train_fraction=TRAIN_FRACTION
    )
    assigned = assigned.persist()
    assigned.count()  # force train + assign inside the build timing
    t_build = time.time() - t0
    probes = assigned.filter(probe_filter).select(
        F.col("vec_id").alias("probe_id"),
        F.col("v").alias("pv"),
        F.col("na").alias("pna"),
    ).persist()
    probes.count()

    def recall_vs_truth(rows) -> float:
        """recall@K of collected ivf_probe rows against the exact
        ground truth — shared by the §2 sweep and the §6 recluster
        before/after so the two numbers quoted side by side in
        SCALING.md can never diverge in tally logic."""
        got: dict[int, set[int]] = {}
        for r in rows:
            got.setdefault(r.probe_id, set()).add(r.neighbor_id)
        hits = sum(len(got.get(p, set()) & t) for p, t in truth.items())
        return round(hits / sum(len(t) for t in truth.values()), 4)

    sweep = []
    for n_probe in PROBE_SWEEP:
        t0 = time.time()
        rows = ivf_probe(assigned, cents, probes, K, n_probe=n_probe).collect()
        dt = time.time() - t0
        sweep.append(
            {
                "n_probe": n_probe,
                "recall_at_10": recall_vs_truth(rows),
                "wall_sec": round(dt, 2),
            }
        )

    # 3. partitionBy(cell) layout: pruned probe-read vs full scan
    path = os.path.join(out_dir, "corpus_by_cell")
    shutil.rmtree(path, ignore_errors=True)
    assigned.select("vec_id", "v", "cell").write.partitionBy("cell").parquet(
        path
    )
    on_disk = spark.read.parquet(path)
    # the first probe's 10 nearest cells, ranked driver-side from the
    # tiny centroid table (k×d floats)
    p0 = probes.filter(F.col("probe_id") == 0).collect()[0]
    cent_rows = cents.collect()
    ranked = sorted(
        cent_rows,
        key=lambda c: sum(x * x for x in c.cv)
        - 2 * sum(a * b for a, b in zip(p0.pna, c.cv)),
    )
    probe_cells = [c.cell for c in ranked[:10]]
    pruned = on_disk.filter(F.col("cell").isin(probe_cells))
    plan = pruned._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters" in plan, "probe read must prune partitions"

    def refine(df):
        return (
            df.select(
                "vec_id", F.round(cosine(F.lit(p0.pv), F.col("v")), 6).alias("c")
            )
            .orderBy(F.desc("c"), "vec_id")
            .limit(K)
            .collect()
        )

    t0 = time.time()
    refine(pruned)
    t_pruned = time.time() - t0
    t0 = time.time()
    refine(on_disk)
    t_full = time.time() - t0
    pruned_rows = pruned.count()

    # 4. incremental maintenance (round 10): append a 20% delta to the
    # persisted base-index layout vs re-training + rewriting everything.
    # The append assigns ONLY the delta against the frozen centroids
    # and appends those rows' cell files; the rebuild re-runs KMeans
    # over the union and rewrites the full corpus.
    base_path = os.path.join(out_dir, "append_base")
    shutil.rmtree(base_path, ignore_errors=True)
    base = corpus.filter(F.col("vec_id") % 5 != 0)
    delta = corpus.filter(F.col("vec_id") % 5 == 0)
    t0 = time.time()
    b_assigned, b_cents = ivf_index(
        base, n_cells=N_CELLS, train_fraction=TRAIN_FRACTION
    )
    ivf_write(b_assigned, b_cents, base_path)
    t_base_build = time.time() - t0
    t0 = time.time()
    ivf_append(spark, base_path, delta)
    t_append = time.time() - t0
    imb = ivf_imbalance(spark, base_path).collect()[0]
    rebuild_path = os.path.join(out_dir, "append_rebuild")
    shutil.rmtree(rebuild_path, ignore_errors=True)
    t0 = time.time()
    r_assigned, r_cents = ivf_index(
        corpus, n_cells=N_CELLS, train_fraction=TRAIN_FRACTION
    )
    ivf_write(r_assigned, r_cents, rebuild_path)
    t_rebuild = time.time() - t0

    # 5. O(delta) append guard (round 11 — r10 verdict item 3): the SAME
    # fixed delta appended to a corpus grown 10× — wall time must stay
    # ~flat. The id Bloom sidecar screens the delta driver-side of the
    # corpus: a clean append (zero Bloom positives) never opens the
    # corpus id column at all, so cost tracks |delta|, not |corpus|.
    delta_n = max(2_000, n // 50)
    big = synthetic_corpus(spark, n + delta_n).persist()
    big.count()
    curve = []
    for size in (max(10_000, n // 10), n):
        pth = os.path.join(out_dir, f"append_curve_{size}")
        shutil.rmtree(pth, ignore_errors=True)
        b_a, b_c = ivf_index(
            big.filter(F.col("vec_id") < size),
            n_cells=N_CELLS, train_fraction=TRAIN_FRACTION,
        )
        ivf_write(b_a, b_c, pth)
        d = big.filter(F.col("vec_id") >= n)  # ids disjoint from any base
        t0 = time.time()
        ivf_append(spark, pth, d)
        curve.append(
            {
                "corpus": size,
                "delta": delta_n,
                "append_sec": round(time.time() - t0, 2),
            }
        )
    append_flat_ratio = round(
        curve[-1]["append_sec"] / max(curve[0]["append_sec"], 1e-9), 2
    )

    # 6. recluster (round 12 — acting on the imbalance gauge): re-train
    # the quantizer of the appended index via the journaled staged-swap
    # publish. Cost must track the plain rebuild it replaces (§4's
    # t_rebuild: same KMeans, same full-corpus rewrite — the crash-safe
    # protocol may only add manifest/rename overhead), and probe recall
    # at a fixed n_probe must not regress vs the drifted pre-recluster
    # layout.
    def persisted_recall(pth: str, n_probe: int) -> float:
        corpus_l, cents_l = ivf_live(spark, pth)
        pr = corpus_l.filter(F.col("vec_id").isin(probe_ids)).select(
            F.col("vec_id").alias("probe_id"),
            F.col("v").alias("pv"),
            F.col("na").alias("pna"),
        )
        return recall_vs_truth(
            ivf_probe(corpus_l, cents_l, pr, K, n_probe=n_probe).collect()
        )

    recall_pre = persisted_recall(base_path, n_probe=5)
    t0 = time.time()
    rec = ivf_recluster(
        spark, base_path, threshold=0.0, train_fraction=TRAIN_FRACTION
    )
    t_recluster = time.time() - t0
    recall_post = persisted_recall(base_path, n_probe=5)

    print(
        json.dumps(
            {
                "n_vectors": n,
                "dim": DIM,
                "n_cells": N_CELLS,
                "train_fraction": TRAIN_FRACTION,
                "k": K,
                "n_probes": N_PROBES,
                "exact_wall_sec": round(t_exact, 2),
                "index_build_sec": round(t_build, 2),
                "sweep": sweep,
                "bucketed_probe": {
                    "cells_read": len(probe_cells),
                    "rows_scanned": pruned_rows,
                    "rows_total": n,
                    "pruned_refine_sec": round(t_pruned, 2),
                    "full_refine_sec": round(t_full, 2),
                    "partition_filters_in_plan": True,
                },
                "append_maintenance": {
                    "delta_fraction": 0.2,
                    "base_build_write_sec": round(t_base_build, 2),
                    "append_sec": round(t_append, 2),
                    "rebuild_sec": round(t_rebuild, 2),
                    "speedup_vs_rebuild": round(t_rebuild / t_append, 1),
                    "imbalance_after_append": float(imb.imbalance),
                    "recluster_signaled": bool(imb.recluster),
                    "n_vectors_after_append": int(imb.n_vectors),
                },
                "append_vs_corpus_size": {
                    "curve": curve,
                    # 10× corpus, same delta: ~1.0 = O(delta) holds
                    "flat_ratio_10x": append_flat_ratio,
                },
                "recluster_maintenance": {
                    "recluster_sec": round(t_recluster, 2),
                    "plain_rebuild_sec": round(t_rebuild, 2),
                    # ~1.0 = the journaled publish is free vs the
                    # retrain+rewrite it wraps
                    "vs_rebuild_ratio": round(
                        t_recluster / max(t_rebuild, 1e-9), 2
                    ),
                    "recall_at_10_nprobe5_before": recall_pre,
                    "recall_at_10_nprobe5_after": recall_post,
                    "imbalance_before": rec["imbalance_before"],
                    "imbalance_after": rec.get("imbalance_after"),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
