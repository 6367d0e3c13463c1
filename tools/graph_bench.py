#!/usr/bin/env python
"""Large-N scale evidence for the round-9 graph/series engines:
triangle_stats, mutual-kNN symmetrization, holt_winters_additive.

Synthesizes deterministic structures with KNOWN ground truth (planted
cliques, planted reciprocal edges, constant series) far beyond the
fixtures and measures wall time + exact-recovery sanity, so SCALING.md
can cite measured numbers instead of design claims.
Usage: python tools/graph_bench.py [--quick]
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
    n_cliques = 10_000 if quick else 100_000
    n_nodes = 20_000 if quick else 200_000
    n_groups = 20_000 if quick else 200_000
    spark = get_spark("graph-bench")

    # --- triangle_stats on disjoint planted K5 cliques ---------------
    # n_cliques disjoint 5-cliques: C(5,2)=10 edges and C(5,3)=10
    # triangles each — exact expected totals, no randomness.
    from correlationapi_spark.operators.analytics import triangle_stats

    pairs = [(i, j) for i in range(5) for j in range(5) if i < j]
    pair_df = spark.createDataFrame(pairs, "pi int, pj int")
    edges = (
        spark.range(n_cliques)
        .crossJoin(F.broadcast(pair_df))
        .select(
            (F.col("id") * 5 + F.col("pi")).alias("u"),
            (F.col("id") * 5 + F.col("pj")).alias("v"),
        )
    )
    t0 = time.time()
    r = triangle_stats(edges).collect()[0]
    t_tri = time.time() - t0
    assert r.n_triangles == 10 * n_cliques, r
    assert r.n_edges == 10 * n_cliques, r
    print(
        f"triangle_stats: {10 * n_cliques} edges ({n_cliques} planted K5) "
        f"-> {r.n_triangles} triangles (exact) in {t_tri:.2f}s; "
        f"clustering {r.global_clustering}"
    )

    # --- mutual-kNN symmetrization at 5·n directed edges -------------
    # Directed lists: i -> i±1, i±2 (all reciprocated => mutual) plus
    # i -> i+7 (never reciprocated => dropped). Expected mutual edges:
    # 2·n exactly (pairs at distance 1 and 2 on the ring).
    n = n_nodes
    offs = spark.createDataFrame(
        [(1,), (2,), (-1,), (-2,), (7,)], "o int"
    )
    knn = (
        spark.range(n)
        .crossJoin(F.broadcast(offs))
        .select(
            F.col("id").alias("src"),
            F.pmod(F.col("id") + F.col("o"), F.lit(n)).alias("dst"),
            F.lit(0.5).alias("cosine"),
        )
    )
    t0 = time.time()
    mutual = (
        knn.groupBy(
            F.least("src", "dst").alias("id_a"),
            F.greatest("src", "dst").alias("id_b"),
        )
        .agg(F.min("cosine").alias("cosine"), F.count("*").alias("_n"))
        .filter(F.col("_n") == 2)
    )
    n_mutual = mutual.count()
    t_mut = time.time() - t0
    assert n_mutual == 2 * n, n_mutual
    print(
        f"mutual-kNN symmetrize: {5 * n} directed edges -> "
        f"{n_mutual} mutual (exact 2n, asymmetric +7 edges dropped) "
        f"in {t_mut:.2f}s"
    )

    # --- holt_winters_additive at n_groups series --------------------
    # Constant series: level == y, trend == 0, season == 0 — closed-form
    # expectation for every group, 30 periods each.
    from correlationapi_spark.operators.stats import holt_winters_additive

    daily = (
        spark.range(n_groups * 30)
        .select(
            (F.col("id") % n_groups).cast("string").alias("grp"),
            (F.col("id") / n_groups + 1).cast("long").alias("t"),
            (F.pmod(F.col("id"), F.lit(n_groups)) + 100.0).alias("y"),
        )
    )
    t0 = time.time()
    hw = holt_winters_additive(daily)
    stats = hw.agg(
        F.count("*").alias("n"),
        F.max(F.abs(F.col("trend"))).alias("max_trend"),
        F.max(F.abs(F.col("season_next"))).alias("max_season"),
    ).collect()[0]
    t_hw = time.time() - t0
    assert stats.n == n_groups
    assert stats.max_trend < 1e-6 and stats.max_season < 1e-6, stats
    print(
        f"holt_winters_additive: {n_groups} groups x 30 periods in "
        f"{t_hw:.2f}s (constant-series pin: |trend|,|season| < 1e-6)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
