"""Scans, sources and sinks (SURVEY.md §2.1).

Scale notes: both declared keys are expressed so Catalyst pushes the work
into the parquet scan itself — `q_scan_pruned`'s filter and projection
reach the reader (PushedFilters + ReadSchema in `.explain("formatted")`),
so at 100 TB only the needed row groups / columns are read. CSV/JSON
ingest and the parquet/CSV sinks are exercised by unit tests (no fixture
files exist for them, so no driver-checked key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import SCHEMAS, load_tables
from ..registry import query


@query(
    "q_scan_parquet",
    oracle="SELECT count(*) AS n_rows FROM lineitem",
    doc="Full parquet scan; count projection (scan + local agg only).",
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t["lineitem"].agg(F.count("*").alias("n_rows"))


@query(
    "q_scan_pruned",
    oracle="""
        SELECT l_orderkey, l_quantity
        FROM lineitem
        WHERE l_quantity < 3 AND l_returnflag = 'A'
    """,
    doc="Column-pruned, predicate-pushed scan (ReadSchema=2 cols, PushedFilters).",
)
def q_scan_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .filter((F.col("l_quantity") < 3) & (F.col("l_returnflag") == "A"))
        .select("l_orderkey", "l_quantity")
    )


# --- non-declared source/sink helpers (unit-tested; SURVEY.md §2.1 rows
# without keys) -------------------------------------------------------------


def read_csv(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Schema-pinned CSV ingest for any fixture-shaped table."""
    return spark.read.schema(SCHEMAS[table]).option("header", "true").csv(path)


def read_json(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Schema-pinned JSON-lines ingest for any fixture-shaped table."""
    return spark.read.schema(SCHEMAS[table]).json(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Parquet sink; partitioned layout is the 100 TB-scale default."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)
