"""Service-API tests: the CorrelationAPI surface against DuckDB ground
truth and the declared registry keys."""

from __future__ import annotations

import os

import pytest

from correlationapi_spark.api import CorrelationAPI
from correlationapi_spark.registry import load_registry
from correlationapi_spark.testing import duckdb_connect

from .conftest import SF_SMOKE

REGISTRY = load_registry()


@pytest.fixture(scope="module")
def api(spark):
    a = CorrelationAPI(spark)
    for t in ("lineitem", "events", "customer"):
        a.register_dataset(t, os.path.join(SF_SMOKE, f"{t}.parquet"))
    return a


def test_registry_and_variables(api):
    assert api.list_datasets() == ["customer", "events", "lineitem"]
    assert "l_quantity" in api.variables("lineitem")
    assert "l_returnflag" not in api.variables("lineitem")


def test_pairwise_pearson_matches_duckdb(api):
    res = api.correlate("lineitem", "l_quantity", "l_extendedprice")
    con = duckdb_connect(SF_SMOKE)
    want = con.execute(
        "SELECT round(corr(l_quantity, l_extendedprice), 6) FROM lineitem"
    ).fetchone()[0]
    assert res["correlation"] == want
    assert res["n"] == 6000


def test_grouped_pearson(api):
    res = api.correlate(
        "lineitem", "l_quantity", "l_extendedprice", group_by="l_returnflag"
    )
    assert set(res["groups"]) == {"A", "N", "R"}
    for g in res["groups"].values():
        assert -1 <= g["correlation"] <= 1 and g["n"] > 0


def test_spearman_matches_declared_key(api, spark):
    res = api.correlate("lineitem", "l_quantity", "l_extendedprice", method="spearman")
    want = (
        REGISTRY["q_corr_spearman"].fn(spark, SF_SMOKE).collect()[0].spearman_qty_price
    )
    assert res["correlation"] == want


def test_matrix_symmetric_and_consistent(api):
    res = api.correlation_matrix(
        "lineitem", ["l_quantity", "l_extendedprice", "l_discount"]
    )
    m = res["matrix"]
    assert len(m) == 3 and all(m[i][i] == 1.0 for i in range(3))
    assert all(m[i][j] == m[j][i] for i in range(3) for j in range(3))
    pair = api.correlate("lineitem", "l_quantity", "l_extendedprice")
    assert m[0][1] == pair["correlation"]


def test_lagged_matches_declared_key(api, spark):
    res = api.lagged_correlation("events", "ts", "value", lag=1, grain="day")
    # q_corr_lagged rounds the daily means; the API doesn't — compare loosely
    want = REGISTRY["q_corr_lagged"].fn(spark, SF_SMOKE).collect()[0].lag1_autocorr
    assert abs(res["correlation"] - want) < 1e-3
    assert res["n_pairs"] > 0


def test_covariance(api):
    res = api.covariance("customer", "c_acctbal", "c_nationkey")
    assert res["kind"] == "sample" and isinstance(res["covariance"], float)


def test_errors(api):
    with pytest.raises(KeyError):
        api.correlate("nope", "a", "b")
    with pytest.raises(KeyError):
        api.correlate("lineitem", "nope", "l_quantity")
    with pytest.raises(ValueError):
        api.correlate("lineitem", "l_quantity", "l_tax", method="kendall")


def test_results_are_json_serializable(api):
    import json

    for res in (
        api.correlate("lineitem", "l_quantity", "l_tax"),
        api.correlation_matrix("lineitem", ["l_quantity", "l_tax"]),
        api.lagged_correlation("events", "ts", "value"),
    ):
        json.dumps(res)
