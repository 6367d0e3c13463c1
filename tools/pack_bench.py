#!/usr/bin/env python
"""Measure pack_chunks_layout at synthetic scale (round 7).

The packing layout's one global reduction — the range-partitioned
two-pass running sum — is plan-canaried, but canaries prove shape, not
cost. This probe runs the REAL engine on a generated (doc_id, n_tok)
table (no text materialization: the counter column is driven directly,
the same entry q_pack_bpeish uses) and verifies the result against the
CLOSED FORM of the generator, so exactness is checked at a scale where
collecting the layout is impossible:

  n_tok(id) = (id % 100) + 1  →  prefix sums are exact integers:
  off(id)   = 5050 * (id // 100) + k*(k+1)/2  with k = id % 100

Usage: python tools/pack_bench.py [n_rows ...]   (default 1e6 and 1e7)
"""

from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from pyspark.sql import functions as F  # noqa: E402

from correlationapi_spark.llm.text import pack_chunks_layout  # noqa: E402
from correlationapi_spark.session import get_spark  # noqa: E402

CAP = 2048
PERIOD_SUM = 5050  # sum of 1..100


def closed_form_off(doc_id: int) -> int:
    k = doc_id % 100
    return PERIOD_SUM * (doc_id // 100) + k * (k + 1) // 2


def main() -> int:
    sizes = [int(float(a)) for a in sys.argv[1:]] or [1_000_000, 10_000_000]
    spark = get_spark("pack-bench")
    for n in sizes:
        docs = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 100 + 1).alias("n_tok"),
            F.lit("").alias("text"),
        )
        layout = pack_chunks_layout(docs, CAP, n_tok=F.col("n_tok"))
        # BOTH verification aggregates fold into ONE action so the wall
        # time is a genuine single pass over the layout (review r07: the
        # total-tokens check used to re-run the whole unpersisted plan a
        # second time OUTSIDE the timed window, underreporting the work)
        mismatch = (
            F.col("off")
            != PERIOD_SUM * F.floor(F.col("doc_id") / 100)
            + (F.col("doc_id") % 100) * (F.col("doc_id") % 100 + 1) / 2
        )
        t0 = time.time()
        agg = layout.agg(
            F.sum(F.when(mismatch, 1).otherwise(0)).alias("bad"),
            F.max(F.col("off") + F.col("n_tok")).alias("total"),
        ).collect()[0]
        wall = time.time() - t0
        bad, total = int(agg.bad), int(agg.total)
        want_total = closed_form_off(n - 1) + ((n - 1) % 100) + 1
        ok = bad == 0 and total == want_total
        print(
            f"rows={n:>10,}  wall={wall:6.2f}s  mismatches={bad}  "
            f"total_tokens={total:,} (closed-form {want_total:,})  "
            f"{'OK' if ok else 'FAIL'}"
        )
        if not ok:
            return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
