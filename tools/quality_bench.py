#!/usr/bin/env python
"""Large-N scale evidence for the round-9 engines: basket_rules,
cusum_frame, pca_spectrum, fk_edge_audit.

Synthesizes deterministic corpora far beyond the fixtures (1M basket
memberships / 1M embedding rows / 2M event rows) and measures wall
time + result sanity, so SCALING.md can cite measured numbers instead
of design claims. Usage: python tools/quality_bench.py [--quick]
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
    n_members = 100_000 if quick else 1_000_000
    n_vec = 100_000 if quick else 1_000_000
    n_events = 200_000 if quick else 2_000_000
    spark = get_spark("quality-bench")

    # --- basket_rules at n_members memberships, zipf-ish item mix ----
    from correlationapi_spark.operators.analytics import basket_rules

    # ~8 items per basket, 200-item catalog with a hash-skewed mix —
    # deterministic, no RNG (repo rule)
    m = (
        spark.range(n_members)
        .select(
            (F.col("id") / 8).cast("long").alias("ok"),
            (
                F.pmod(F.xxhash64(F.col("id")), F.lit(1000)) % 200
                * F.pmod(F.xxhash64(F.col("id") + 7), F.lit(3))
                % 200
            ).alias("b"),
        )
        .distinct()
    )
    t0 = time.time()
    rules = basket_rules(m, min_count=50)
    n_rules = rules.count()
    t_basket = time.time() - t0
    top = rules.orderBy(F.desc("lift"), "b1", "b2").first()
    print(
        f"basket_rules: {n_members} memberships -> {n_rules} rules "
        f"in {t_basket:.2f}s (top lift {top.lift:.3f})"
    )

    # --- cusum_frame at n_events rows over 365 periods --------------
    from correlationapi_spark.operators.stats import cusum_frame

    ev = spark.range(n_events).select(
        F.timestamp_seconds(
            F.lit(1_600_000_000)
            + (F.col("id") % 365) * 86_400
        ).alias("d"),
        (
            F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_000))
            # injected level shift after period 200
            + F.when((F.col("id") % 365) > 200, 300_000).otherwise(0)
        ).alias("micro"),
    )
    t0 = time.time()
    curve = cusum_frame(ev).collect()
    t_cusum = time.time() - t0
    peak = max(curve, key=lambda r: abs(r.cusum))
    print(
        f"cusum_frame: {n_events} rows / {len(curve)} periods in "
        f"{t_cusum:.2f}s (peak at {peak.d}, |C|={abs(peak.cusum):.0f})"
    )

    # --- pca_spectrum at n_vec x 64 ----------------------------------
    from correlationapi_spark.llm.similarity import pca_spectrum

    d = 64
    vecs = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (
                    F.pmod(F.xxhash64(F.col("id") * 64 + i), F.lit(10_000))
                    / 10_000.0
                    # first 4 dims carry 4x the variance -> visible spectrum
                    * (4.0 if i < 4 else 1.0)
                )
                for i in range(d)
            ]
        ).alias("v"),
    )
    t0 = time.time()
    spec = pca_spectrum(vecs, k=8).collect()
    t_pca = time.time() - t0
    print(
        f"pca_spectrum: {n_vec}x{d} in {t_pca:.2f}s "
        f"(top evr {spec[0].explained_var:.4f}, "
        f"cum8 {spec[7].cum_explained_var:.4f})"
    )
    assert spec[0].eigenvalue >= spec[7].eigenvalue

    # --- fk_edge_audit at n_events children --------------------------
    from correlationapi_spark.operators.analytics import fk_edge_audit

    child = spark.range(n_events).select(
        F.pmod(F.xxhash64("id"), F.lit(n_events // 10)).alias("fk")
    )
    parent = spark.range(n_events // 10).select(
        F.col("id").alias("pk")
    ).filter("pk % 100 != 0")  # 1% of parents missing -> real orphans
    t0 = time.time()
    audit = fk_edge_audit(child, "fk", parent, "pk", "child->parent")
    row = audit.collect()[0]
    t_fk = time.time() - t0
    print(
        f"fk_edge_audit: {n_events} children in {t_fk:.2f}s "
        f"({row.n_orphans} orphans, share "
        f"{row.n_orphans / row.n_child:.4f})"
    )
    assert row.n_orphans > 0

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
