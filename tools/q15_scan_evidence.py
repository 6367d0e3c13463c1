"""Measure the materialized-reuse win on TPC-H Q15's shape.

Q15 consumes one revenue aggregate twice (max side + equality probe).
Without a pin, Spark recomputes it — two full lineitem scans. With
``ordering.materialize()`` (lazy localCheckpoint) the producing stage
runs once and both consumers read the checkpointed blocks.

This tool runs the SAME consumer query over the two variants at a given
SF dir and reports local-filesystem bytes read during the collect —
measurable in local mode because executors share the driver JVM, so
Hadoop ``FileSystem.getAllStatistics()`` sees every scan's reads.

Usage: python tools/q15_scan_evidence.py [sf_dir]   (default sf0.1)
Prints one JSON line; record the numbers in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from correlationapi_spark.io import load_tables
from correlationapi_spark.numerics import exact_money_sum, revenue_cents
from correlationapi_spark.ordering import materialize


def _rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01 00:00:00")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01 00:00:00")))
        )
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(exact_money_sum(revenue_cents(), 10000.0).alias("total_revenue"))
    )


def _consume(spark: SparkSession, sf_dir: str, rev: DataFrame) -> int:
    t = load_tables(spark, sf_dir)
    best = rev.agg(F.max("total_revenue").alias("_best"))
    out = (
        rev.join(F.broadcast(best), F.col("total_revenue") == F.col("_best"))
        .join(t["supplier"], F.col("s_suppkey") == F.col("suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )
    return len(out.collect())


def _fs_bytes_read(spark: SparkSession) -> int:
    total = 0
    for st in spark._jvm.org.apache.hadoop.fs.FileSystem.getAllStatistics():
        if st.getScheme() == "file":
            total += st.getBytesRead()
    return total


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("q15-scan-evidence")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the metastore/file-index paths so listing costs don't skew run 1
    _consume(spark, sf_dir, _rev(spark, sf_dir))

    b0 = _fs_bytes_read(spark)
    rows_plain = _consume(spark, sf_dir, _rev(spark, sf_dir))
    b1 = _fs_bytes_read(spark)
    rows_mat = _consume(spark, sf_dir, materialize(_rev(spark, sf_dir)))
    b2 = _fs_bytes_read(spark)

    out = {
        "sf_dir": sf_dir,
        "rows_plain": rows_plain,
        "rows_materialized": rows_mat,
        "bytes_read_plain": b1 - b0,
        "bytes_read_materialized": b2 - b1,
        "ratio": round((b1 - b0) / max(1, b2 - b1), 3),
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
