#!/usr/bin/env python
"""Per-action profiler: wraps every PySpark DataFrame action with a
timer that logs (call site, duration), so a bench phase's wall time can
be attributed to its individual Spark jobs without touching engine code.

Usage: python tools/action_profile.py <what> [sf_dir]
  what = append | scd2 | pq | gram | key:<registry_key>
Prints one line per action: seconds, action name, engine call site.
"""

from __future__ import annotations

import functools
import os
import sys
import time
import traceback

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

# Spark 4: pyspark.sql.DataFrame is a facade; instances are the classic
# subclass, whose overriding methods must be the ones wrapped.
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

LOG: list[tuple[float, str, str]] = []


def _site() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "correlationapi_spark" in fn or fn.endswith("bench.py"):
            return f"{os.path.basename(fn)}:{fr.lineno}"
    return "?"


def _wrap(cls, name):
    orig = getattr(cls, name)

    @functools.wraps(orig)
    def timed(self, *a, **kw):
        t0 = time.time()
        try:
            return orig(self, *a, **kw)
        finally:
            LOG.append((time.time() - t0, name, _site()))

    setattr(cls, name, timed)


for n in ("collect", "take", "count", "first", "toPandas",
          "localCheckpoint"):
    _wrap(DataFrame, n)
for n in ("save", "parquet", "json", "csv", "text"):
    _wrap(DataFrameWriter, n)


def main() -> int:
    what = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)
    from correlationapi_spark.session import get_spark

    spark = get_spark("action-profile")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    # warm-up like the bench
    from correlationapi_spark.io import load_tables
    from correlationapi_spark.registry import load_registry

    registry = load_registry()
    tables = load_tables(spark, sf_dir)
    tables["region"].count()
    registry["q_tpch_q10"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    tables["documents"].selectExpr("sum(length(text))").collect()
    tables["embeddings"].selectExpr("sum(size(embedding))").collect()
    LOG.clear()

    t0 = time.time()
    if what == "append":
        ph = bench._bench_index_append_phases(spark, sf_dir)
    elif what == "scd2":
        ph = bench._bench_scd2_merge_phases(spark, sf_dir)
    elif what == "pq":
        ph = bench._bench_pq_stored_phases(spark, sf_dir)
    elif what.startswith("key:"):
        key = what[4:]
        ph = {}
        for run in range(2):
            t1 = time.time()
            registry[key].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            ph[f"run{run}"] = round(time.time() - t1, 3)
    else:
        raise SystemExit(f"unknown target {what!r}")
    wall = time.time() - t0
    print(f"\n== {what} phases={ph} wall={wall:.3f}s ==")
    acc = 0.0
    for dur, name, site in LOG:
        acc += dur
        print(f"{dur:8.3f}  {name:<16} {site}")
    print(f"actions total {acc:.3f}s of {wall:.3f}s wall "
          f"({len(LOG)} actions)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
