#!/usr/bin/env python
"""Time EVERY registry key's Spark execution (noop sink, no oracle).

Usage: python tools/time_all_keys.py [sf_dir] [out_json]
One line per key: seconds + key, sorted slowest-first at the end.
Construction (fn call, includes any eager engine jobs) and execution
(noop write) are timed separately — keys whose fn() is eager show the
cost where it really sits.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from correlationapi_spark.registry import load_registry
from correlationapi_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/key_times.json"
    registry = load_registry()
    spark = get_spark("time-all-keys")
    spark.sparkContext.setLogLevel("ERROR")
    # shared warm-up (bench.py's): parquet reader, codegen, agg machinery
    from correlationapi_spark.io import load_tables

    tables = load_tables(spark, sf_dir)
    tables["region"].count()
    registry["q_tpch_q10"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite").save()
    tables["documents"].selectExpr("sum(length(text))").collect()
    tables["embeddings"].selectExpr("sum(size(embedding))").collect()

    times: dict[str, dict] = {}
    for key, spec in sorted(registry.items()):
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
        except Exception as e:  # noqa: BLE001
            print(f"ERR {key}: {type(e).__name__}: {e}")
            continue
        times[key] = {
            "build": round(t1 - t0, 3),
            "exec": round(t2 - t1, 3),
            "total": round(t2 - t0, 3),
        }
        print(f"{times[key]['total']:8.3f} ({times[key]['build']:.3f}b) {key}",
              flush=True)
    with open(out_path, "w") as f:
        json.dump(times, f, indent=1, sort_keys=True)
    print("\n== slowest ==")
    for k, v in sorted(times.items(), key=lambda kv: -kv[1]["total"])[:40]:
        print(f"{v['total']:8.3f} ({v['build']:.3f}b) {k}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
