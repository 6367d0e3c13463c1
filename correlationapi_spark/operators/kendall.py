"""Distributed EXACT Kendall tau-b — no row cap, grouped or not.

The sequential bound in api._kendall exists because tau-b has no mergeable
sufficient statistic: the discordant-pair count D is a global property of
the joint order. But D IS decomposable. Sort the sample by (group, x, y);
then within each group D = the number of strict y-descents across
positions (the classic inversion formulation — equal-x pairs contribute
nothing because y is ascending within an x tie run, and equal-y pairs are
never inversions). Partition the POSITION axis into contiguous blocks and
the Y axis into monotone value buckets, and every discordant pair of a
group falls in exactly one of three classes:

* same block                        -> counted inside one (group, block)
                                       task                          (D2)
* different block, same bucket      -> counted inside one (group,
                                       bucket) task, minus its
                                       same-block cells              (D3)
* different block, different bucket -> bucket_i > bucket_j fully
  determines y_i > y_j, so the count needs only the per-group
  (block, bucket) contingency matrix — G·B longs per group,
  prefix-summed driver-side                                          (D1)

All three are exact for ANY monotone bucketing (quantile boundaries are
used only for balance) and every stage is keyed by the group column, so
cross-group pairs are never counted. D = D1 + D2 + D3 per group, with two
applyInPandas passes of O(m log m) merge counting over ~n/G and ~n/B row
slices and one contingency collect. Tie terms (n1/n2/n3 and the variance
sums for the ties-adjusted z) come from plain groupBy aggregations.
Global positions come from ordering.global_row_number over
(group, x, y) — range partitioning + per-partition numbering, never a
single-partition sort — whose lazy localCheckpoint pins one boundary
sample across the consumer jobs. A huge group therefore SPANS partitions
instead of landing in one window task (the failure mode the sequential
cap guards).

Scale: the widest shuffles carry (group, pos, y, block, bucket) — 5
narrow columns; the driver sees per-group G·B counts plus per-slice
inversion subtotals, never rows. Python-side work is bounded per task by
the block/bucket fan-out. Intended for the FEW groups that exceed the
sequential bound (api._kendall routes each group by size); the
contingency collect is |big groups|·G·B longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ordering import global_row_number

#: Per-task slice target for the block/bucket fan-out: n_blocks/n_buckets
#: grow with the counted total so a worker-side pandas slice stays near
#: this many rows no matter how large the sample (a FIXED fan-out would
#: scale slices as n/64 — the OOM mode the sequential cap guards).
_TARGET_SLICE_ROWS = 250_000


def make_inversion_counter():
    """Strict-descent (inversion) counter as a NESTED function — pickled
    by value into applyInPandas workers (the make_extract_meta rule).
    Bottom-up merge sort, O(m log m), same counting as api._make_tau_b."""

    def count_inversions(a: list) -> int:
        n = len(a)
        buf = list(a)
        src, dst = buf, [0] * n
        width, inv = 1, 0
        while width < n:
            for lo in range(0, n, 2 * width):
                mid, hi = min(lo + width, n), min(lo + 2 * width, n)
                i, j, k = lo, mid, lo
                while i < mid and j < hi:
                    if src[i] <= src[j]:
                        dst[k] = src[i]; i += 1
                    else:
                        dst[k] = src[j]; j += 1
                        inv += mid - i
                    k += 1
                dst[k:hi] = src[i:mid] if i < mid else src[j:hi]
            src, dst = dst, src
            width *= 2
        return inv

    return count_inversions


def _tie_sums_by_group(
    data: DataFrame, cols: list[str]
) -> dict[str | None, tuple[int, float, float]]:
    """Per group: (Σc(c−1), Σc(c−1)(2c+5), Σc(c−1)(c−2)) over the
    value-group sizes of ``cols`` — one distributed groupBy + one tiny
    agg per group. The first sum feeds the EXACT integer numerator (kept
    as long: ≤ n², safe to n ~ 3·10⁹); the other two feed only the float
    variance, so they are accumulated as double (c³ terms would overflow
    int64 near c ~ 2·10⁶)."""
    g = data.groupBy("_grp", *cols).agg(F.count("*").alias("c"))
    c = F.col("c")
    rows = g.groupBy("_grp").agg(
        F.sum(c * (c - 1)).alias("t2"),
        F.sum((c * (c - 1)).cast("double") * (2 * c + 5)).alias("t25"),
        F.sum((c * (c - 1)).cast("double") * (c - 2)).alias("t3"),
    ).collect()
    return {
        r._grp: (int(r.t2 or 0), float(r.t25 or 0.0), float(r.t3 or 0.0))
        for r in rows
    }


def _assemble(
    n: int,
    tx: tuple[int, float, float],
    ty: tuple[int, float, float],
    t2xy: int,
    dis: int,
) -> tuple[float | None, float | None]:
    """(tau_b, ties-adjusted z) from the exact integer counts — the same
    algebra as api._make_tau_b, so the two paths agree to the last bit."""
    t2x, vtx, vtx3 = tx
    t2y, vty, vty3 = ty
    n0 = n * (n - 1) // 2
    n1, n2, n3 = t2x // 2, t2y // 2, t2xy // 2
    if n < 2 or n0 == n1 or n0 == n2:
        return None, None  # degenerate / constant variable
    s = n0 - n1 - n2 + n3 - 2 * dis
    tau = s / ((n0 - n1) * (n0 - n2)) ** 0.5
    var = (n * (n - 1) * (2 * n + 5) - vtx - vty) / 18.0
    if n > 2:
        var += (vtx3 * vty3) / (9.0 * n * (n - 1) * (n - 2))
    var += (float(t2x) * float(t2y)) / (2.0 * n * (n - 1))
    z = s / var**0.5 if var > 0 else None
    return tau, z


def kendall_tau_by_group(
    data: DataFrame, n_blocks: int = 64, n_buckets: int = 64
) -> dict[str | None, tuple[float | None, float | None, int]]:
    """Exact {group: (tau_b, z, n)} over columns ``_grp``, ``_x``, ``_y``.

    ``data`` must be pre-filtered to non-null, non-NaN doubles (the
    caller owns pairwise deletion, matching api._kendall); ``_grp`` is a
    nullable string (a NULL group is a group). Degenerate groups (n < 2
    or a constant variable) yield (None, None, n)."""
    ns = {
        r._grp: r.c
        for r in data.groupBy("_grp").agg(F.count("*").alias("c")).collect()
    }
    if not ns:
        return {}
    total = sum(ns.values())
    # scale the fan-out with the data: a FIXED 64×64 would let per-task
    # pandas slices grow as n/64, re-creating the single-task-OOM mode
    # the sequential cap guards. Target ≤ _TARGET_SLICE_ROWS rows per
    # block/bucket slice (callers may still force a larger fan-out).
    n_blocks = max(n_blocks, -(-total // _TARGET_SLICE_ROWS))
    n_buckets = max(n_buckets, -(-total // _TARGET_SLICE_ROWS))
    tx = _tie_sums_by_group(data, ["_x"])
    ty = _tie_sums_by_group(data, ["_y"])
    txy = _tie_sums_by_group(data, ["_x", "_y"])

    numbered = global_row_number(
        data.select("_grp", "_x", "_y"),
        [F.col("_grp").asc(), F.col("_x").asc(), F.col("_y").asc()],
        alias="_pos",
    )
    blk = max(1, -(-total // n_blocks))
    # monotone y-bucketing shared by ALL groups (monotone for each, which
    # is all exactness needs); quantile boundaries only for BALANCE.
    # n_buckets <= 1 means ONE bucket (no boundaries — D1 is then 0 and
    # D3 degenerates to whole-sample counting; still exact, just
    # unbalanced — approxQuantile would reject an empty fraction list).
    # Low-cardinality y collapses duplicate boundaries, so a bucket can
    # be ONE y value — those buckets are excluded from the D3 shuffle
    # below (equal-y pairs are never discordant), which keeps e.g.
    # binary-y inputs from funneling n/2 rows into one task.
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = (
        sorted(set(data.stat.approxQuantile("_y", fracs, 0.01)))
        if fracs else []
    )
    b_expr = F.lit(0)
    for bd in bounds:
        b_expr = b_expr + F.when(F.col("_y") > F.lit(float(bd)), 1).otherwise(0)
    nb = len(bounds) + 1
    # a position block may straddle a group boundary; every stage below
    # keys by (_grp, ...) so each cell is the intersection — exactly the
    # per-group decomposition (module docstring)
    cells = numbered.select(
        "_grp",
        "_pos",
        "_y",
        F.expr(f"CAST((_pos - 1) DIV {blk} AS INT)").alias("_blk"),
        b_expr.cast("int").alias("_b"),
    )

    # four actions consume cells (bucket-cardinality probe, contingency,
    # D2, D3) — persist so the numbering join + bucket projection run
    # once, not four times (only the checkpointed ranged RDD below them
    # is otherwise reused)
    cells = cells.persist()
    try:
        return _count_and_assemble(cells, ns, nb, tx, ty, txy)
    finally:
        cells.unpersist()


def _count_and_assemble(cells, ns, nb, tx, ty, txy):
    """D1/D2/D3 counting over the persisted cells + per-group assembly —
    split out so the caller can guarantee unpersist on any failure."""
    # D1 — cross-block cross-bucket, per group, from the contingency
    # matrix: iterate a group's blocks in position order; a row in block
    # g bucket b pairs discordantly with every EARLIER-block row of a
    # STRICTLY HIGHER bucket (higher bucket => strictly greater y).
    cnt: dict[tuple[str | None, int, int], int] = {
        (r._grp, r._blk, r._b): r["count"]
        for r in cells.groupBy("_grp", "_blk", "_b").count().collect()
    }
    d1: dict[str | None, int] = {grp: 0 for grp in ns}
    for grp in ns:
        hist_prev = [0] * nb
        for g in sorted({bk for gk, bk, _ in cnt if gk == grp}):
            suff = [0] * (nb + 1)
            for b in range(nb - 1, -1, -1):
                suff[b] = suff[b + 1] + hist_prev[b]
            for b in range(nb):
                c = cnt.get((grp, g, b), 0)
                if c:
                    d1[grp] += c * suff[b + 1]
            for b in range(nb):
                hist_prev[b] += cnt.get((grp, g, b), 0)

    inv = make_inversion_counter()

    def per_block(pdf):
        import pandas as _pd

        return _pd.DataFrame(
            {
                "_grp": [pdf["_grp"].iloc[0]],
                "d": [inv(pdf.sort_values("_pos")["_y"].tolist())],
            }
        )

    def per_bucket(pdf):
        import pandas as _pd

        s = pdf.sort_values("_pos")
        total_inv = inv(s["_y"].tolist())
        same = sum(
            inv(grp["_y"].tolist()) for _, grp in s.groupby("_blk", sort=False)
        )
        return _pd.DataFrame(
            {"_grp": [pdf["_grp"].iloc[0]], "d": [total_inv - same]}
        )

    d2: dict[str | None, int] = {grp: 0 for grp in ns}
    for r in (
        cells.groupBy("_grp", "_blk")
        .applyInPandas(per_block, "_grp string, d long")
        .collect()
    ):
        d2[r._grp] += r.d

    # D3 ships only buckets holding ≥2 DISTINCT y values: a single-value
    # bucket contributes zero inversions (equal-y pairs are never
    # discordant), and excluding it up front keeps a hot y value
    # (binary/categorical y) from funneling its whole mass into one task
    multi = [
        r._b
        for r in cells.groupBy("_b")
        .agg(F.count_distinct("_y").alias("ny"))
        .collect()
        if r.ny > 1
    ]
    d3: dict[str | None, int] = {grp: 0 for grp in ns}
    if multi:
        for r in (
            cells.filter(F.col("_b").isin(multi))
            .groupBy("_grp", "_b")
            .applyInPandas(per_bucket, "_grp string, d long")
            .collect()
        ):
            d3[r._grp] += r.d

    out: dict[str | None, tuple[float | None, float | None, int]] = {}
    for grp, n in ns.items():
        zero = (0, 0.0, 0.0)
        tau, z = _assemble(
            n,
            tx.get(grp, zero),
            ty.get(grp, zero),
            txy.get(grp, zero)[0],
            d1[grp] + d2[grp] + d3[grp],
        )
        out[grp] = (tau, z, n)
    return out


def kendall_tau_distributed(
    data: DataFrame, n_blocks: int = 64, n_buckets: int = 64
) -> tuple[float | None, float | None, int]:
    """Ungrouped convenience wrapper: exact (tau_b, z, n) over columns
    ``_x``, ``_y`` — one constant group through kendall_tau_by_group."""
    grouped = kendall_tau_by_group(
        data.select(F.lit("_all").alias("_grp"), "_x", "_y"),
        n_blocks,
        n_buckets,
    )
    if not grouped:
        return None, None, 0
    return grouped["_all"]
