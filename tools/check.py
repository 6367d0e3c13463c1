#!/usr/bin/env python
"""Run the full declared inventory against the DuckDB oracle locally.

Usage: python tools/check.py [sf_dir] [key ...]
Defaults to /root/testdata/sf0.01 (the driver's t2 scale) and all keys.
Exit code 1 if any key fails.
"""

from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

from correlationapi_spark.registry import load_registry
from correlationapi_spark.session import get_spark
from correlationapi_spark.testing import duckdb_connect, run_compare


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    keys = args[1:] if args and os.path.isdir(args[0]) else args
    registry = load_registry()
    if keys:
        registry = {k: registry[k] for k in keys}
    spark = get_spark("correlationapi-check")
    con = duckdb_connect(sf_dir)
    failures = 0
    t_all = time.time()
    for key, spec in registry.items():
        t0 = time.time()
        try:
            res = run_compare(key, spec.fn(spark, sf_dir), spec.oracle, con)
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"[ERR ] {key}: {type(e).__name__}: {e}")
            continue
        if not res.ok:
            failures += 1
        print(f"{res}  ({time.time() - t0:.2f}s)")
    print(f"\n{len(registry)} keys, {failures} failures, {time.time() - t_all:.1f}s total")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
