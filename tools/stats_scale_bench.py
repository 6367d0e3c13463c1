#!/usr/bin/env python
"""Scale measurement for the round-8 statistics families at 100M rows.

Synthesizes a 100M-row frame driver-free (spark.range + xxhash64 — no
data generation step, no disk), then times the three new reduction
shapes at a size 1000x the sf0.1 fixture:

  * moments   — q_agg_moments' exact decimal power-sum aggregate
                (one map-side-combinable shuffle, 7 groups)
  * contingency — the q_corr_cramer / q_theil_u / q_mutual_info cell
                reduction (category-sized shuffle, 7x5 cells)
  * gini      — q_agg_gini's range-partitioned avg-rank plan over
                ~1e6 DISTINCT values (the rank table is value-domain
                sized, not row sized)

Usage: python tools/stats_scale_bench.py [n_rows]
Prints one JSON line; paste the numbers into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from pyspark.sql import functions as F

from correlationapi_spark.operators.stats import avg_rank_table
from correlationapi_spark.session import get_spark


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    spark = get_spark("stats-scale-bench")
    out: dict = {"n_rows": n, "cpus": os.cpu_count()}

    # deterministic synthetic frame: 7-level factor a, 5-level factor b,
    # cents uniform over ~1e6 distinct values (value-domain bounded so
    # the gini rank table stays domain-sized)
    base = spark.range(n).select(
        (F.col("id") % 7).cast("string").alias("a"),
        (F.abs(F.xxhash64("id")) % 5).cast("string").alias("b"),
        (F.abs(F.xxhash64(F.col("id") + 1)) % 1_000_000).alias("cents"),
    )

    # -- moments: exact power sums, one shuffle ---------------------------
    cd = F.col("cents").cast("decimal(38,0)")
    t0 = time.time()
    rows = (
        base.groupBy("a")
        .agg(
            F.count("*").alias("n"),
            F.sum(cd).cast("double").alias("s1"),
            F.sum(cd * F.col("cents")).cast("double").alias("s2"),
            F.sum(cd * F.col("cents") * F.col("cents"))
            .cast("double")
            .alias("s3"),
            F.sum(cd * F.col("cents") * F.col("cents") * F.col("cents"))
            .cast("double")
            .alias("s4"),
        )
        .collect()
    )
    out["moments_sec"] = round(time.time() - t0, 2)
    out["moments_groups"] = len(rows)

    # -- contingency: cramer/theil/mi cell reduction ----------------------
    t0 = time.time()
    cells = base.groupBy("a", "b").agg(F.count("*").alias("o")).collect()
    out["contingency_sec"] = round(time.time() - t0, 2)
    out["contingency_cells"] = len(cells)

    # -- gini: avg-rank join-back + exact rank-weighted sum ---------------
    x = base.select("cents")
    t0 = time.time()
    ranks = avg_rank_table(x, "cents", "ar")
    r2 = F.round(F.col("ar") * 2, 0).cast("long")
    s = (
        x.join(ranks, "cents")
        .agg(
            F.sum(F.col("cents").cast("decimal(38,0)") * r2).alias("t"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("sc"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    out["gini_sec"] = round(time.time() - t0, 2)
    out["gini"] = round(
        float((int(s.t) - (s.n + 1) * int(s.sc)) / (s.n * int(s.sc))), 6
    )

    # -- two-sample KS + Mann-Whitney (shared engine) ---------------------
    from correlationapi_spark.operators.stats import two_sample_stats

    ts = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, "A").otherwise("B").alias("g"),
        (F.abs(F.xxhash64(F.col("id") + 2)) % 1_000_000).alias("cents"),
    )
    t0 = time.time()
    r = two_sample_stats(ts).collect()[0]
    out["two_sample_sec"] = round(time.time() - t0, 2)
    out["ks_d"] = r.ks_d
    out["mw_z"] = r.z

    # -- drift monitor (per-period KS + PSI, shared drift_frame) ----------
    from correlationapi_spark.operators.stats import drift_frame

    dd = spark.range(n).select(
        (F.col("id") % 30).alias("d"),
        (F.abs(F.xxhash64(F.col("id") + 3)) % 1_000_000).alias("v"),
    )
    t0 = time.time()
    rows = drift_frame(dd, ks=True, psi=True).collect()
    out["drift_sec"] = round(time.time() - t0, 2)
    out["drift_periods"] = len(rows)
    out["drift_max_ks"] = max(r.ks_d for r in rows)
    out["drift_max_psi"] = max(r.psi for r in rows)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
