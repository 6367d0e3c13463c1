"""Distributed EXACT Kendall tau-b — no per-group row cap.

The sequential bound in api._kendall exists because tau-b has no mergeable
sufficient statistic: the discordant-pair count D is a global property of
the joint order. But D IS decomposable. Sort the sample by (x, y); then
D = the number of strict y-descents across positions (the classic
inversion formulation — equal-x pairs contribute nothing because y is
ascending within an x tie run, and equal-y pairs are never inversions).
Partition the POSITION axis into contiguous blocks g and the Y axis into
monotone value buckets b, and every discordant pair falls in exactly one
of three classes:

* same block                      -> counted inside one block task  (D2)
* different block, same bucket    -> counted inside one bucket task,
                                     minus its same-block cells      (D3)
* different block, different bucket -> bucket_i > bucket_j fully
  determines y_i > y_j, so the count needs only the tiny (block,
  bucket) contingency matrix — G·B longs, prefix-summed driver-side (D1)

All three are exact for ANY monotone bucketing (quantile boundaries are
used only for balance), so D = D1 + D2 + D3 with two applyInPandas
passes of O(m log m) merge counting over ~n/G and ~n/B row slices and one
G×B count collect. Tie terms (n1/n2/n3 and the variance sums for the
ties-adjusted z) come from plain groupBy aggregations. Global positions
come from ordering.global_row_number (range partitioning + per-partition
numbering — never a single-partition sort), whose lazy localCheckpoint
pins one boundary sample across the three consumer jobs.

Scale: the widest shuffles carry (pos, y, g, b) — 4 narrow columns; the
driver sees G·B counts plus per-slice inversion subtotals, never rows.
Python-side work is bounded per task by the block/bucket fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ordering import global_row_number


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


def _tie_sums(data: DataFrame, cols: list[str]) -> tuple[int, float, float]:
    """(Σc(c−1), Σc(c−1)(2c+5), Σc(c−1)(c−2)) over the value-group sizes
    of ``cols`` — one distributed groupBy + one tiny agg. The first sum
    feeds the EXACT integer numerator (kept as long: ≤ n², safe to
    n ~ 3·10⁹); the other two feed only the float variance, so they are
    accumulated as double (c³ terms would overflow int64 near c ~ 2·10⁶)."""
    g = data.groupBy(*cols).agg(F.count("*").alias("c"))
    c = F.col("c")
    r = g.agg(
        F.sum(c * (c - 1)).alias("t2"),
        F.sum((c * (c - 1)).cast("double") * (2 * c + 5)).alias("t25"),
        F.sum((c * (c - 1)).cast("double") * (c - 2)).alias("t3"),
    ).collect()[0]
    return int(r.t2 or 0), float(r.t25 or 0.0), float(r.t3 or 0.0)


def kendall_tau_distributed(
    data: DataFrame, n_blocks: int = 64, n_buckets: int = 64
) -> tuple[float | None, float | None, int]:
    """Exact (tau_b, ties-adjusted z, n) over columns ``_x``, ``_y``.

    ``data`` must be pre-filtered to non-null, non-NaN doubles (the
    caller owns pairwise deletion, matching api._kendall). Returns
    (None, None, n) when n < 2 or either variable is constant — the same
    degenerate contract as the sequential tau_b."""
    n = data.count()
    if n < 2:
        return None, None, n
    n0 = n * (n - 1) // 2
    t2x, vtx, vtx3 = _tie_sums(data, ["_x"])
    t2y, vty, vty3 = _tie_sums(data, ["_y"])
    t2xy, _, _ = _tie_sums(data, ["_x", "_y"])
    n1, n2, n3 = t2x // 2, t2y // 2, t2xy // 2
    if n0 == n1 or n0 == n2:
        return None, None, n  # constant variable

    numbered = global_row_number(
        data.select("_x", "_y"),
        [F.col("_x").asc(), F.col("_y").asc()],
        alias="_pos",
    )
    blk = max(1, -(-n // n_blocks))
    # monotone y-bucketing; quantile boundaries only for BALANCE —
    # any boundaries keep D1/D3 exact (module docstring)
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(data.stat.approxQuantile("_y", fracs, 0.01)))
    b_expr = F.lit(0)
    for bd in bounds:
        b_expr = b_expr + F.when(F.col("_y") > F.lit(float(bd)), 1).otherwise(0)
    nb = len(bounds) + 1
    cells = numbered.select(
        "_pos",
        "_y",
        F.expr(f"CAST((_pos - 1) DIV {blk} AS INT)").alias("_g"),
        b_expr.cast("int").alias("_b"),
    )

    # D1 — cross-block cross-bucket, from the G×B contingency matrix:
    # iterate blocks in position order; a row in block g bucket b pairs
    # discordantly with every EARLIER-block row of a STRICTLY HIGHER
    # bucket (higher bucket => strictly greater y).
    cnt: dict[tuple[int, int], int] = {
        (r._g, r._b): r["count"]
        for r in cells.groupBy("_g", "_b").count().collect()
    }
    d1 = 0
    hist_prev = [0] * nb
    for g in sorted({gk for gk, _ in cnt}):
        suff = [0] * (nb + 1)
        for b in range(nb - 1, -1, -1):
            suff[b] = suff[b + 1] + hist_prev[b]
        for b in range(nb):
            c = cnt.get((g, b), 0)
            if c:
                d1 += c * suff[b + 1]
        for b in range(nb):
            hist_prev[b] += cnt.get((g, b), 0)

    inv = make_inversion_counter()

    def per_block(pdf):
        import pandas as _pd

        return _pd.DataFrame(
            {"d": [inv(pdf.sort_values("_pos")["_y"].tolist())]}
        )

    def per_bucket(pdf):
        import pandas as _pd

        s = pdf.sort_values("_pos")
        total = inv(s["_y"].tolist())
        same = sum(
            inv(grp["_y"].tolist()) for _, grp in s.groupby("_g", sort=False)
        )
        return _pd.DataFrame({"d": [total - same]})

    d2 = sum(
        r.d for r in cells.groupBy("_g").applyInPandas(per_block, "d long").collect()
    )
    d3 = sum(
        r.d for r in cells.groupBy("_b").applyInPandas(per_bucket, "d long").collect()
    )
    dis = d1 + d2 + d3

    s = n0 - n1 - n2 + n3 - 2 * dis
    tau = s / ((n0 - n1) * (n0 - n2)) ** 0.5
    var = (n * (n - 1) * (2 * n + 5) - vtx - vty) / 18.0
    if n > 2:
        var += (vtx3 * vty3) / (9.0 * n * (n - 1) * (n - 2))
    var += (float(t2x) * float(t2y)) / (2.0 * n * (n - 1))
    z = s / var**0.5 if var > 0 else None
    return tau, z, n
