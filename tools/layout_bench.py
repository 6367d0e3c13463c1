#!/usr/bin/env python
"""Data-layout evidence: row-group skipping on sorted parquet (round 8).

The engine's scan keys pin that predicates REACH the parquet reader
(PushedFilters canaries); this tool measures what that pushdown is worth
when the writer cooperates — and documents where it is worth NOTHING.

Same table, same filter, two layouts:
- `shuffled`: lineitem hash-scrambled on write — every row group spans
  the full key range, min/max stats prune nothing;
- `sorted`: `repartitionByRange(key)` + `sortWithinPartitions(key)` —
  each row group covers a narrow key slice.

Measured via the SCAN node's own numOutputRows metric — rows surviving
row-group pruning, before any residual filter (at fixture scale,
FS-bytes deltas are dominated by footer/page-index reads, so the
per-node row metric is the honest signal) — with a small parquet block
size so files hold many row groups.

FINDING (round 8, Spark 4.1 / parquet-mr): row-group stats pruning
fires for INT64 keys (l_orderkey) but NOT for TimestampNTZ columns —
the timestamp predicate IS pushed (PushedFilters shows it) yet the scan
still emits every row group. At 100 TB: lay out time-partitioned facts
on an integer surrogate (epoch day/micros as BIGINT) or directory
`partitionBy`, both of which prune; don't rely on NTZ min/max stats.
The tool reports both cases so the caveat stays measured, not folklore.

Usage: python tools/layout_bench.py [sf_dir]
Prints ONE JSON line; SCALING.md records the numbers.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _scan_rows(df) -> int:
    """numOutputRows of the leaf scan node after executing df."""
    df.collect()

    def find_scan(node):
        if "Scan" in node.nodeName():
            return node
        for i in range(node.children().length()):
            r = find_scan(node.children().apply(i))
            if r is not None:
                return r
        return None

    scan = find_scan(df._jdf.queryExecution().executedPlan())
    return int(scan.metrics().apply("numOutputRows").value())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("layout-bench")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.hadoop.parquet.block.size", str(256 * 1024))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    n_total = li.count()
    max_key = li.agg(F.max("l_orderkey")).collect()[0][0]
    cut = int(max_key * 0.05)  # ~5% key slice

    d = tempfile.mkdtemp(prefix="layout_bench_")
    shuffled_path = os.path.join(d, "shuffled")
    sorted_path = os.path.join(d, "sorted")
    try:
        li.repartition(8, F.hash("l_linenumber", "l_suppkey")).write.parquet(
            shuffled_path
        )
        (
            li.repartitionByRange(8, F.col("l_orderkey"))
            .sortWithinPartitions("l_orderkey")
            .write.parquet(sorted_path)
        )

        def probe(path: str, flt):
            df = spark.read.parquet(path).filter(flt).select(
                "l_orderkey", "l_quantity"
            )
            return _scan_rows(df)

        int_flt = F.col("l_orderkey") < cut
        scan_shuf = probe(shuffled_path, int_flt)
        scan_sort = probe(sorted_path, int_flt)

        # the TimestampNTZ caveat, measured on a shipdate-sorted copy
        ts_path = os.path.join(d, "ts_sorted")
        (
            li.repartitionByRange(8, F.col("l_shipdate"))
            .sortWithinPartitions("l_shipdate")
            .write.parquet(ts_path)
        )
        ts_flt = (
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01 00:00:00")))
        )
        ts_df = spark.read.parquet(ts_path).filter(ts_flt).select(
            "l_shipdate", "l_quantity"
        )
        ts_scan = _scan_rows(ts_df)

        out = {
            "sf_dir": sf_dir,
            "n_rows_total": n_total,
            "int_key": {
                "scan_rows_shuffled": scan_shuf,
                "scan_rows_sorted": scan_sort,
                "scan_row_skip_ratio": round(scan_shuf / max(1, scan_sort), 2),
            },
            "ntz_timestamp": {
                "scan_rows_sorted": ts_scan,
                "pruned": ts_scan < n_total,
            },
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
