"""HTTP API shim tests: JSON contract of /api/v1/* (reference
api/http/query.go:194-277,536-564) driven through a real socket."""

from __future__ import annotations

import json
import urllib.request

import pytest

from tests.conftest import make_samples

S = 1000


@pytest.fixture(scope="module")
def server(spark):
    from thanos_parquet_gateway_spark.api import PromHTTPServer
    from thanos_parquet_gateway_spark.promql import PromQLEngine
    rows = ([({"__name__": "m", "job": "a"}, i * 10 * S, float(i + 1))
             for i in range(5)] +
            [({"__name__": "m", "job": "b"}, i * 10 * S, float(10 * (i + 1)))
             for i in range(5)])
    eng = PromQLEngine(make_samples(spark, rows), lookback_ms=300_000,
                       deterministic=True)
    srv = PromHTTPServer(eng, port=0)
    srv.serve_background()
    yield srv
    srv.shutdown()


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}") as r:
        return json.loads(r.read())


def test_instant_query(server):
    out = _get(server, "/api/v1/query?query=sum(m)&time=40")
    assert out["status"] == "success"
    assert out["data"]["resultType"] == "vector"
    assert out["data"]["result"][0]["value"] == [40.0, "55"]


def test_range_query(server):
    out = _get(server, "/api/v1/query_range?query=m&start=0&end=40&step=20")
    assert out["data"]["resultType"] == "matrix"
    series = {tuple(sorted(s["metric"].items())): s["values"]
              for s in out["data"]["result"]}
    a = series[(("__name__", "m"), ("job", "a"))]
    assert a == [[0.0, "1"], [20.0, "3"], [40.0, "5"]]


def test_scalar_and_error(server):
    out = _get(server, "/api/v1/query?query=1%2B2&time=0")
    assert out["data"]["resultType"] == "scalar"
    assert out["data"]["result"] == [0.0, "3"]
    import urllib.error
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/api/v1/query?query=sum(&time=0")
    assert e.value.code == 422
    body = json.loads(e.value.read())
    assert body["status"] == "error"


def test_metadata_endpoints(server):
    assert _get(server, "/api/v1/labels?start=0&end=100")["data"] == \
        ["__name__", "job"]
    assert _get(server, "/api/v1/label/job/values?start=0&end=100")["data"] == \
        ["a", "b"]
    series = _get(server,
                  "/api/v1/series?match[]=m{job=%22a%22}&start=0&end=100")["data"]
    assert series == [{"__name__": "m", "job": "a"}]


def test_row_quota_admission(spark, sf_dir):
    """A25 quota analogue: a query materializing more rows than the quota is
    rejected; within-quota queries pass (reference limits/limit.go:66-93)."""
    import pytest as _pytest

    from thanos_parquet_gateway_spark.api.http import QueryAPI, QuotaExceeded
    from thanos_parquet_gateway_spark.promql import PromQLEngine
    from thanos_parquet_gateway_spark.sources import samples_from_events

    eng = PromQLEngine(samples_from_events(spark, sf_dir),
                       lookback_ms=7 * 86400_000, deterministic=True)
    api = QueryAPI(eng, row_quota=3)
    t = 1704412800000
    with _pytest.raises(QuotaExceeded):
        api.query("click", t)           # one row per active series > 3
    out = api.query("sum(click)", t)    # aggregates to one row
    assert len(out["result"]) == 1
