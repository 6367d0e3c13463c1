"""Hypertable-style continuous aggregates: mergeable time-grain rollups.

The TimescaleDB/Druid pattern re-expressed Spark-first: maintain a FINE
grain (hourly) aggregate table whose statistics are MERGEABLE — sums of
sums, counts of counts, min of mins, max of maxes, avg carried as
(sum, count) — so any coarser grain (day, week, month) is answered by
re-aggregating the tiny rollup instead of rescanning raw events. At
100 TB the raw table is touched once per refresh window; every dashboard
query reads grains×groups rows.

Two faces here:

* ``q_ts_rollup`` — the re-aggregation ALGEBRA as a declared,
  oracle-checked key (hourly partials → daily finals in one plan).
* ``write_rollup`` / ``daily_from_rollup`` — the materialized form:
  the hourly rollup lands as parquet partitioned by day, and the daily
  query reads the rollup file, verified equal to direct computation and
  plan-verified to scan the rollup, in tests/test_rollup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_tables
from ..registry import query

def _hourly_aggs():
    # built lazily: Column construction needs an active SparkContext
    # (module import happens before any session exists under pytest)
    return [
        F.count("*").alias("n"),
        F.sum("value").alias("sum_v"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
    ]


def hourly_rollup(ev: DataFrame) -> DataFrame:
    """The fine-grain continuous aggregate: (hour, event_type) partials."""
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(*_hourly_aggs())


def merge_to_grain(rollup: DataFrame, grain: str) -> DataFrame:
    """Coarser grain from the rollup by merging partials — no raw scan."""
    return (
        rollup.groupBy(
            F.date_trunc(grain, "hour").alias("bucket"), "event_type"
        )
        .agg(
            F.sum("n").alias("n"),
            F.round(F.sum("sum_v"), 2).alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
        .select(
            "bucket",
            "event_type",
            "n",
            "sum_v",
            "min_v",
            "max_v",
            # avg from merged partials — NEVER avg-of-avgs (wrong under
            # uneven bucket sizes); round after the one division
            F.round(F.col("sum_v") / F.col("n"), 6).alias("avg_v"),
        )
    )


@query(
    "q_ts_rollup",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   count(*) AS n, sum(value) AS sum_v,
                   min(value) AS min_v, max(value) AS max_v
            FROM events GROUP BY 1, 2
        )
        SELECT date_trunc('day', hour) AS bucket, event_type,
               CAST(sum(n) AS BIGINT)   AS n,
               round(sum(sum_v), 2)     AS sum_v,
               min(min_v)               AS min_v,
               max(max_v)               AS max_v,
               round(round(sum(sum_v), 2) / sum(n), 6) AS avg_v
        FROM hourly GROUP BY 1, 2
    """,
    doc="Hypertable rollup: daily stats merged from hourly mergeable "
    "partials (sum-of-sums / count-of-counts / min-of-mins), no raw "
    "rescan at the coarse grain.",
)
def q_ts_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level time-grain aggregation — the continuous-aggregate
    algebra as one oracle-checked plan. Spark executes this as partial
    aggregation inside the scan stage, ONE exchange on (hour, type),
    then a near-free second groupBy (the hourly relation is
    hours×types rows); the materialized variant (write_rollup below)
    turns level one into a stored table the coarse query reads instead
    of raw events — same algebra, tested equal in tests/test_rollup.py.

    The daily sum is rounded to 2 dp BEFORE the avg division on BOTH
    engines (sum of a 2 dp column — numerics.py rule 1 — so the rounded
    value is the exact grid point and the division sees identical
    operands)."""
    ev = load_tables(spark, sf_dir)["events"]
    return merge_to_grain(hourly_rollup(ev), "day")


def write_rollup(ev: DataFrame, path: str) -> None:
    """Materialize the hourly rollup, partitioned by day for pruning:
    a coarse-grain query over a date range touches only its day
    directories (PartitionFilters), and an incremental refresh
    overwrites only the days in the refresh window (dynamic partition
    overwrite)."""
    (
        hourly_rollup(ev)
        .withColumn("day", F.to_date("hour"))
        .write.mode("overwrite")
        .partitionBy("day")
        .parquet(path)
    )


def daily_from_rollup(spark: SparkSession, path: str) -> DataFrame:
    """Answer the daily query FROM the materialized rollup (no events
    scan; the plan's FileScan reads the rollup path)."""
    return merge_to_grain(spark.read.parquet(path).drop("day"), "day")
