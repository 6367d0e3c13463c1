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


class TestComparatorTypeStrict:
    """Round-7 regression pins for the r6 q_pack_chunks driver hash-FAIL:
    the driver's value-hash is type-sensitive (int64 32 != float64 32.0
    from DuckDB HUGEINT->pandas), and the local comparator must be too
    (numerics.py rule 4)."""

    def test_int_vs_float_same_values_fail(self):
        # the exact r6 failure mode: byte-identical values, int64 vs float64
        import numpy as np
        import pandas as pd

        from correlationapi_spark.testing import compare_frames

        a = pd.DataFrame({"x": np.array([32, 64], dtype="int64")})
        b = pd.DataFrame({"x": np.array([32.0, 64.0], dtype="float64")})
        assert not compare_frames("t", a, b).ok

    def test_decimal_vs_int_fail(self):
        import decimal

        import numpy as np
        import pandas as pd

        from correlationapi_spark.testing import compare_frames

        a = pd.DataFrame({"x": np.array([32], dtype="int64")})
        b = pd.DataFrame({"x": [decimal.Decimal("32")]})
        assert not compare_frames("t", a, b).ok

    def test_int_width_still_collapses(self):
        # the driver hashes Python-object values: int32 vs int64 is NOT
        # a difference there, so it must not be one locally either
        import numpy as np
        import pandas as pd

        from correlationapi_spark.testing import compare_frames

        a = pd.DataFrame({"x": np.array([32], dtype="int32")})
        b = pd.DataFrame({"x": np.array([32], dtype="int64")})
        assert compare_frames("t", a, b).ok

    def test_all_null_int_vs_float_dtype_parity(self):
        # dtype-parity catches class drift the per-cell tags can't see
        import numpy as np
        import pandas as pd

        from correlationapi_spark.testing import compare_frames

        a = pd.DataFrame({"x": pd.array([None, None], dtype="Int64")})
        b = pd.DataFrame({"x": np.array([np.nan, np.nan], dtype="float64")})
        r = compare_frames("t", a, b)
        assert not r.ok and "dtype-class" in r.detail

    def test_hugeint_widening_detected_end_to_end(self, con):
        # a windowed sum of BIGINT in DuckDB widens to HUGEINT ->
        # float64 in pandas; an uncast oracle must fail against the
        # int64 the CAST'd form produces (the q_pack_chunks fix)
        from correlationapi_spark.testing import compare_frames

        uncast = con.execute(
            "SELECT sum(r_regionkey) OVER (ORDER BY r_regionkey ROWS BETWEEN"
            " UNBOUNDED PRECEDING AND CURRENT ROW) AS s FROM region"
        ).df()
        cast = con.execute(
            "SELECT CAST(sum(r_regionkey) OVER (ORDER BY r_regionkey ROWS"
            " BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s"
            " FROM region"
        ).df()
        assert str(uncast["s"].dtype) == "float64"  # the HUGEINT drift
        assert str(cast["s"].dtype) == "int64"
        assert not compare_frames("t", cast, uncast).ok
