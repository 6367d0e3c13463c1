"""REST-adapter tests: the stdlib HTTP listener over CorrelationAPI,
exercised over real sockets, plus the pure routing function's error map."""

from __future__ import annotations

import json
import os
import threading
import urllib.error
import urllib.request

import pytest

from correlationapi_spark.api import CorrelationAPI
from correlationapi_spark.http_api import _route, make_server

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def base_url(spark):
    api = CorrelationAPI(spark)
    server = make_server(api, port=0)  # ephemeral port
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _get(url: str):
    with urllib.request.urlopen(url) as resp:
        return resp.status, json.loads(resp.read())


def _post(url: str, payload: dict):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def test_health_and_empty_datasets(base_url):
    assert _get(f"{base_url}/health") == (200, {"status": "ok"})
    status, names = _get(f"{base_url}/datasets")
    assert status == 200 and isinstance(names, list)


def test_register_then_correlate_roundtrip(base_url, spark):
    status, reg = _post(
        f"{base_url}/datasets/lineitem",
        {"path": os.path.join(SF_SMOKE, "lineitem.parquet")},
    )
    assert status == 201 and "l_quantity" in reg["columns"]

    status, variables = _get(f"{base_url}/datasets/lineitem/variables")
    assert status == 200 and "l_quantity" in variables

    status, res = _get(
        f"{base_url}/correlate?dataset=lineitem&x=l_quantity&y=l_extendedprice"
    )
    assert status == 200
    # must equal the in-process service answer exactly (same engine)
    want = CorrelationAPI(spark)
    want.register_dataset("li", os.path.join(SF_SMOKE, "lineitem.parquet"))
    direct = want.correlate("li", "l_quantity", "l_extendedprice")
    assert res["correlation"] == direct["correlation"]
    assert res["n"] == direct["n"]


def test_matrix_and_lagged_over_http(base_url):
    status, res = _post(
        f"{base_url}/matrix",
        {"dataset": "lineitem", "variables": ["l_quantity", "l_extendedprice", "l_tax"]},
    )
    assert status == 200 and len(res["matrix"]) == 3
    assert res["matrix"][0][1] == res["matrix"][1][0]

    _post(
        f"{base_url}/datasets/events",
        {"path": os.path.join(SF_SMOKE, "events.parquet")},
    )
    status, res = _get(
        f"{base_url}/lagged?dataset=events&time=ts&value=value&lag=1&grain=day"
    )
    assert status == 200 and res["n_pairs"] > 0

    status, res = _get(
        f"{base_url}/rolling?dataset=events&time=ts&value=value&window=14"
    )
    assert status == 200 and len(res["series"]) > 0
    assert all(p["n"] == 14 for p in res["series"])

    status, res = _get(
        f"{base_url}/xcorr?dataset=events&time=ts&x=value&y=value&max_lag=2"
    )
    assert status == 200 and sorted(res["lags"]) == ["-1", "-2", "0", "1", "2"]
    # lag 0 of a series against itself is a perfect correlation
    assert res["lags"]["0"]["correlation"] == 1.0

    status, res = _get(
        f"{base_url}/acf?dataset=events&time=ts&value=value&max_lag=2"
    )
    assert status == 200 and sorted(res["lags"]) == ["0", "1", "2"]
    assert res["lags"]["0"]["correlation"] == 1.0

    status, res = _get(
        f"{base_url}/partial?dataset=lineitem"
        "&x=l_quantity&y=l_extendedprice&control=l_discount"
    )
    assert status == 200 and res["n"] > 0
    assert -1.0 <= res["partial_correlation"] <= 1.0


@pytest.mark.parametrize(
    ("url", "code"),
    [
        ("/correlate?dataset=nope&x=a&y=b", 404),           # unknown dataset
        ("/correlate?dataset=lineitem&x=zz&y=l_tax", 404),  # unknown variable
        ("/correlate?dataset=lineitem&x=l_quantity&y=l_tax&method=banana", 400),
        ("/correlate?dataset=lineitem", 400),               # missing params
        ("/nope", 404),
    ],
)
def test_http_error_mapping(base_url, url, code):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(f"{base_url}{url}")
    assert exc.value.code == code
    assert "error" in json.loads(exc.value.read())


def test_route_function_direct(spark):
    # the pure router is the unit surface: no sockets needed
    api = CorrelationAPI(spark)
    status, payload = _route(api, "GET", "/health", {}, {})
    assert (status, payload) == (200, {"status": "ok"})
    status, payload = _route(api, "GET", "/bogus", {}, {})
    assert status == 404
    with pytest.raises(ValueError):
        _route(api, "POST", "/datasets/x", {}, {})  # body missing "path"


def test_round5_response_surface(base_url):
    """Round-5 additions over the wire: pacf + significance (band,
    Ljung-Box) on /acf, ci_95 + t_stat on /correlate, comma-separated
    multi-control /partial."""
    _post(
        f"{base_url}/datasets/events",
        {"path": os.path.join(SF_SMOKE, "events.parquet")},
    )
    _post(
        f"{base_url}/datasets/lineitem",
        {"path": os.path.join(SF_SMOKE, "lineitem.parquet")},
    )

    status, res = _get(
        f"{base_url}/acf?dataset=events&time=ts&value=value&max_lag=3"
    )
    assert status == 200
    assert set(res["pacf"]) == {"1", "2", "3"}
    assert res["significance"]["band"] > 0
    assert res["significance"]["ljung_box"]["df"] == 3

    status, res = _get(
        f"{base_url}/correlate?dataset=lineitem&x=l_quantity&y=l_extendedprice"
    )
    assert status == 200
    assert res["ci_95"][0] < res["correlation"] < res["ci_95"][1]
    assert res["t_stat"] is not None

    status, res = _get(
        f"{base_url}/partial?dataset=lineitem&x=l_quantity"
        "&y=l_extendedprice&control=l_discount,l_tax"
    )
    assert status == 200
    assert res["control"] == ["l_discount", "l_tax"]
    assert -1.0 <= res["partial_correlation"] <= 1.0
