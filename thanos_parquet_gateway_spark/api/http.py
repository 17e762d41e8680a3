"""Prometheus HTTP API shim over the Spark engine.

JSON contract mirrors the reference's endpoints (reference
api/http/query.go:175-179, response shaping :232-251,536-564):
/api/v1/query, /query_range, /series, /labels, /label/<name>/values.

Driver-side control plane only: parses params, delegates to PromQLEngine
(executors do the work), serializes {status, data:{resultType, result}}.
Concurrency guardrails (reference internal/limits/limit.go:27-64) map to a
semaphore here + Spark fair-scheduler pools underneath.
"""

from __future__ import annotations

import json
import math
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from thanos_parquet_gateway_spark.promql.engine import PromQLEngine


def _fmt_val(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    return repr(v) if v != int(v) else str(int(v))


def _parse_time(s: str | None, default_ms: int) -> int:
    if not s:
        return default_ms
    try:
        return int(float(s) * 1000)
    except ValueError:
        from datetime import datetime
        return int(datetime.fromisoformat(s.replace("Z", "+00:00"))
                   .timestamp() * 1000)


class QuotaExceeded(RuntimeError):
    """Per-query result quota hit (reference internal/limits/limit.go:66-93:
    Quota.Reserve on select rows; surfaced as a 422-style error)."""


class QueryAPI:
    """Transport-independent request handlers (unit-testable without HTTP).

    ``row_quota`` bounds the rows a single query may materialize to the
    driver — the admission-control analogue of the reference's row/byte
    quotas.  Enforced with limit(quota+1) so the check costs no extra job
    and the executors stop early instead of shipping an oversized result.
    """

    def __init__(self, engine: PromQLEngine, max_concurrent: int = 100,
                 row_quota: int = 0):
        self.engine = engine
        self.sem = threading.Semaphore(max_concurrent)
        self.row_quota = row_quota

    def _collect(self, df):
        if self.row_quota:
            rows = df.limit(self.row_quota + 1).collect()
            if len(rows) > self.row_quota:
                raise QuotaExceeded(
                    f"query would return more than {self.row_quota} rows")
            return rows
        return df.collect()

    def query(self, q: str, t_ms: int) -> dict:
        with self.sem:
            res = self.engine.query_instant(q, t_ms)
            if res.result_type == "scalar":
                row = res.df.collect()[0]
                return {"resultType": "scalar",
                        "result": [t_ms / 1000.0, _fmt_val(row["value"])]}
            rows = self._collect(res.df)
            return {"resultType": "vector", "result": [
                {"metric": dict(r["labels"]),
                 "value": [r["t"] / 1000.0, _fmt_val(r["value"])]}
                for r in rows]}

    def query_range(self, q: str, start_ms: int, end_ms: int,
                    step_ms: int) -> dict:
        with self.sem:
            res = self.engine.query_range(q, start_ms, end_ms, step_ms)
            rows = self._collect(res.df)
            if res.result_type == "scalar":
                return {"resultType": "matrix", "result": [{
                    "metric": {},
                    "values": [[r["t"] / 1000.0, _fmt_val(r["value"])]
                               for r in sorted(rows, key=lambda r: r["t"])]}]}
            series: dict = {}
            for r in rows:
                series.setdefault(r["sig"], {"metric": dict(r["labels"]),
                                             "values": []})
                series[r["sig"]]["values"].append(
                    [r["t"] / 1000.0, _fmt_val(r["value"])])
            for s in series.values():
                s["values"].sort(key=lambda v: v[0])
            return {"resultType": "matrix",
                    "result": [series[k] for k in sorted(series)]}

    def series(self, match: list[str], start_ms: int, end_ms: int,
               limit: int = 0) -> list[dict]:
        rows = self.engine.series(match, start_ms, end_ms, limit).collect()
        return [dict(r["labels"]) for r in rows]

    def labels(self, match: list[str] | None, start_ms: int, end_ms: int,
               limit: int = 0) -> list[str]:
        return [r["name"] for r in
                self.engine.label_names(match, start_ms, end_ms, limit).collect()]

    def label_values(self, name: str, match: list[str] | None, start_ms: int,
                     end_ms: int, limit: int = 0) -> list[str]:
        return [r["value"] for r in
                self.engine.label_values(name, match, start_ms, end_ms,
                                         limit).collect()]


class PromHTTPServer:
    def __init__(self, engine: PromQLEngine, port: int = 9090,
                 max_concurrent: int = 100):
        self.api = QueryAPI(engine, max_concurrent)
        api = self.api

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, payload, code=200):
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802
                self.do_POST()

            def do_POST(self):  # noqa: N802
                try:
                    u = urlparse(self.path)
                    qs = parse_qs(u.query)
                    if self.headers.get("Content-Length"):
                        n = int(self.headers["Content-Length"])
                        qs.update(parse_qs(self.rfile.read(n).decode()))
                    now = int(time.time() * 1000)
                    one = lambda k, d=None: qs.get(k, [d])[0]  # noqa: E731
                    if u.path == "/api/v1/query":
                        data = api.query(one("query"), _parse_time(one("time"), now))
                    elif u.path == "/api/v1/query_range":
                        step = one("step", "30")
                        data = api.query_range(
                            one("query"), _parse_time(one("start"), now),
                            _parse_time(one("end"), now),
                            int(float(step) * 1000))
                    elif u.path == "/api/v1/series":
                        data = api.series(qs.get("match[]", []),
                                          _parse_time(one("start"), 0),
                                          _parse_time(one("end"), now),
                                          int(one("limit", "0")))
                    elif u.path == "/api/v1/labels":
                        data = api.labels(qs.get("match[]") or None,
                                          _parse_time(one("start"), 0),
                                          _parse_time(one("end"), now),
                                          int(one("limit", "0")))
                    elif u.path.startswith("/api/v1/label/") and \
                            u.path.endswith("/values"):
                        name = u.path[len("/api/v1/label/"):-len("/values")]
                        data = api.label_values(name, qs.get("match[]") or None,
                                                _parse_time(one("start"), 0),
                                                _parse_time(one("end"), now),
                                                int(one("limit", "0")))
                    else:
                        self._send({"status": "error",
                                    "errorType": "bad_data",
                                    "error": "unknown endpoint"}, 404)
                        return
                    self._send({"status": "success", "data": data})
                except Exception as e:  # noqa: BLE001
                    self._send({"status": "error", "errorType": "execution",
                                "error": str(e)}, 422)

        self.server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
        self.port = self.server.server_address[1]

    def serve_background(self):
        t = threading.Thread(target=self.server.serve_forever, daemon=True)
        t.start()
        return t

    def shutdown(self):
        self.server.shutdown()
