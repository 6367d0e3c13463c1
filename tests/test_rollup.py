"""Materialized continuous-aggregate tests (operators/rollup.py):
the stored hourly rollup must answer the daily query exactly, reading
the rollup parquet (not raw events), with partition pruning available."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from correlationapi_spark.io import load_tables
from correlationapi_spark.operators.rollup import (
    daily_from_rollup,
    hourly_rollup,
    merge_to_grain,
    write_rollup,
)

from .conftest import SF_SMOKE


def test_materialized_rollup_equals_direct(spark):
    ev = load_tables(spark, SF_SMOKE)["events"]
    d = os.path.join(tempfile.gettempdir(), f"rollup_{uuid.uuid4().hex}")
    try:
        write_rollup(ev, d)
        from_rollup = daily_from_rollup(spark, d)
        direct = merge_to_grain(hourly_rollup(ev), "day")
        cols = sorted(direct.columns)
        assert sorted(map(tuple, from_rollup.select(cols).collect())) == \
               sorted(map(tuple, direct.select(cols).collect()))
        # the query plan reads the ROLLUP path, not events.parquet
        plan = from_rollup._jdf.queryExecution().executedPlan().toString()
        assert d in plan and "events.parquet" not in plan
        # day-partitioned layout → a date-ranged query prunes partitions
        pruned = spark.read.parquet(d).filter(F.col("day") == "2024-01-05")
        pplan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in pplan
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_rollup_weekly_grain_also_merges(spark):
    # the same rollup answers ANY coarser grain — weekly here; totals
    # must match a direct weekly aggregation of raw events
    ev = load_tables(spark, SF_SMOKE)["events"]
    weekly = merge_to_grain(hourly_rollup(ev), "week")
    direct = (
        ev.groupBy(F.date_trunc("week", "ts").alias("bucket"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_v"))
    )
    a = {(r.bucket, r.event_type): (r.n, r.sum_v) for r in weekly.collect()}
    b = {(r.bucket, r.event_type): (r.n, r.sum_v) for r in direct.collect()}
    assert a == b
