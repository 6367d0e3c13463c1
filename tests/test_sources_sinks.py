"""Source/sink round-trips (SURVEY.md §2.1 rows without declared keys):
CSV/JSON ingest with pinned schemas, parquet/CSV sinks, partitioned write.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import functions as F

from correlationapi_spark.io import load_tables
from correlationapi_spark.operators.scans import (
    read_csv,
    read_json,
    write_csv,
    write_parquet,
)

from .conftest import SF_SMOKE


def _tmp() -> str:
    return os.path.join(tempfile.gettempdir(), f"io_{uuid.uuid4().hex}")


def _sorted(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_csv_roundtrip(spark):
    nation = load_tables(spark, SF_SMOKE)["nation"]
    d = _tmp()
    try:
        write_csv(nation, d)
        back = read_csv(spark, d, "nation")
        assert _sorted(back, nation.columns) == _sorted(nation, nation.columns)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_json_roundtrip(spark):
    cust = load_tables(spark, SF_SMOKE)["customer"]
    d = _tmp()
    try:
        cust.write.mode("overwrite").json(d)
        back = read_json(spark, d, "customer")
        assert _sorted(back, cust.columns) == _sorted(cust, cust.columns)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_partitioned_parquet_sink_prunes(spark):
    """Partitioned layout is the 100 TB default: assert partition pruning
    actually happens on read (PartitionFilters, not a full scan)."""
    li = load_tables(spark, SF_SMOKE)["lineitem"]
    d = _tmp()
    try:
        write_parquet(li, d, partition_by=["l_returnflag"])
        back = spark.read.parquet(d).filter(F.col("l_returnflag") == "A")
        plan = back._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "PartitionFilters" in plan
        assert back.count() == li.filter(F.col("l_returnflag") == "A").count()
        # only the A partition directory is touched
        dirs = {p for p in os.listdir(d) if p.startswith("l_returnflag=")}
        assert dirs == {"l_returnflag=A", "l_returnflag=N", "l_returnflag=R"}
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_orc_roundtrip(spark):
    # ORC is Spark's other first-class columnar format; same predicate-
    # pushdown machinery as parquet (searchArgument), so a warehouse that
    # lands ORC plugs in with one format string.
    sup = load_tables(spark, SF_SMOKE)["supplier"]
    d = _tmp()
    try:
        sup.write.mode("overwrite").orc(d)
        back = spark.read.orc(d)
        assert _sorted(back, sup.columns) == _sorted(sup, sup.columns)
        plan = back.filter(F.col("s_suppkey") < 5)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "PushedFilters: [IsNotNull(s_suppkey), LessThan(s_suppkey,5)]" in plan
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_sf_dir_switch_reregisters_views(spark):
    # one session, two scale dirs: load_tables must re-point the temp
    # views (a stale registration would silently serve the old scale —
    # the verify-skill gotcha). Row counts differ 10× between dirs.
    n_small = load_tables(spark, "/root/testdata/sf0.001")["orders"].count()
    assert spark.sql("SELECT count(*) AS n FROM orders").collect()[0].n == n_small
    n_big = load_tables(spark, "/root/testdata/sf0.01")["orders"].count()
    assert spark.sql("SELECT count(*) AS n FROM orders").collect()[0].n == n_big
    assert n_big > n_small
    # and switching BACK also re-registers
    load_tables(spark, "/root/testdata/sf0.001")
    assert spark.sql("SELECT count(*) AS n FROM orders").collect()[0].n == n_small


def test_events_ts_matches_duckdb_exactly(spark):
    """Unit-drift canary: the driver's testdata generation changed
    events.ts from parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between
    rounds 3 and 4; the old unconditional ns div-1000 read silently
    shifted every event to 1970. Pin load_tables' timestamps to DuckDB's
    reading of the same file (engine-independent truth) at every SF so
    any future unit change fails loudly here."""
    import duckdb

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        ev = load_tables(spark, sf_dir)["events"]
        got = ev.selectExpr(
            "CAST(min(ts) AS STRING) AS lo", "CAST(max(ts) AS STRING) AS hi"
        ).collect()[0]
        want = duckdb.sql(
            "SELECT CAST(min(ts) AS VARCHAR) AS lo, CAST(max(ts) AS VARCHAR) AS hi "
            f"FROM read_parquet('{sf_dir}/events.parquet')"
        ).fetchone()
        assert (got.lo, got.hi) == want, (sf_dir, got, want)
