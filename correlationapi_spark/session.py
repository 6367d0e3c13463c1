"""SparkSession factory + runtime-config pinning.

Two concerns live here:

1. ``get_spark()`` — build a session for local runs (tests, bench).
2. ``ensure_conf(spark)`` — pin the *runtime-settable* configs this engine
   depends on for cross-engine determinism, on a session we did NOT build
   (the correctness driver passes us its own session). Everything pinned
   here is settable after session start (``spark.sql.*`` runtime confs).

Determinism contract (SURVEY.md §4.2): session timezone is UTC so Spark
and the DuckDB oracle agree on timestamp values; ANSI mode stays at the
Spark 4 default; Arrow is enabled for toPandas/pandas-UDF paths.

Scale posture: AQE on (partition coalescing + skew-join splitting covers
the skewed-key story at 100 TB without hand-salting every query); shuffle
partitions default small for local scale factors but are overridable via
SPARK_GRAFT_SHUFFLE_PARTITIONS for cluster runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs pinned on every session that runs our queries.
_RUNTIME_CONF = {
    # DuckDB's TIMESTAMP is naive/UTC; pin Spark to match (SURVEY.md §7.4).
    "spark.sql.session.timeZone": "UTC",
    # Arrow for toPandas / pandas UDFs — the fast Python boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Adaptive execution: runtime partition coalescing + skew handling.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
}


def _shuffle_partitions() -> str:
    return os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")


def ensure_conf(spark: SparkSession) -> SparkSession:
    """Idempotently pin runtime confs on an externally-built session.

    Called from every query entry point so correctness does not depend on
    who constructed the SparkSession.
    """
    for k, v in _RUNTIME_CONF.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be non-settable
            pass
    try:
        spark.conf.set("spark.sql.shuffle.partitions", _shuffle_partitions())
    except Exception:  # pragma: no cover
        pass
    return spark


def get_spark(app_name: str = "correlationapi-spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a local SparkSession configured for this engine.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. On a real cluster
    the master/resource settings come from spark-submit; everything this
    engine *needs* is runtime conf and is re-pinned by :func:`ensure_conf`.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", _shuffle_partitions())
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.pythonUDF.arrow.enabled", "true")
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return ensure_conf(spark)
