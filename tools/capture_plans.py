#!/usr/bin/env python
"""Capture .explain("formatted") for bench-flagged (or named) queries.

Usage: python tools/capture_plans.py <out_dir> [--suffix S] [key ...]
Writes <out_dir>/<key><S>.txt per key. Defaults to all bench keys at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from correlationapi_spark.registry import load_registry
from correlationapi_spark.session import get_spark


def main() -> int:
    out_dir = sys.argv[1]
    keys = sys.argv[2:]
    suffix = ""
    if keys and keys[0] == "--suffix":
        suffix = keys[1]
        keys = keys[2:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_registry()
    if not keys:
        keys = sorted(k for k, s in registry.items() if s.bench)
    spark = get_spark("correlationapi-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        df = registry[key].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{key}{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {key} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
