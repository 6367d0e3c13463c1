"""Spark-vs-DuckDB oracle comparison for every declared key, at sf0.001.

This is the driver's t2 check run early and locally (SURVEY.md §5.3) —
same semantics (row count + schema + order-insensitive values), stricter
diagnostics. The slower sf0.01 sweep is tools/check.py.
"""

from __future__ import annotations

import pytest

from correlationapi_spark.registry import load_registry
from correlationapi_spark.testing import duckdb_connect, run_compare

from .conftest import SF_SMOKE

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("key", sorted(REGISTRY))
def test_query_matches_oracle(key, spark, con):
    spec = REGISTRY[key]
    res = run_compare(key, spec.fn(spark, SF_SMOKE), spec.oracle, con)
    assert res.ok, str(res) + (f"\nfirst diffs: {res.mismatches}" if res.mismatches else "")
    if spec.oracle is None:
        # rows-only keys must still produce rows on the smoke fixture
        # unless the spec documents an empty-at-tiny-scale reason.
        assert res.spark_rows >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_every_query_key_has_spec_contract():
    for key, spec in REGISTRY.items():
        assert spec.oracle is not None or spec.rows_only_reason, key
