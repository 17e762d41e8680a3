"""Prometheus HTTP API shim over the Spark engine.

JSON contract mirrors the reference's endpoints (reference
api/http/query.go:175-179, response shaping :232-251,536-564):
/api/v1/query, /query_range, /series, /labels, /label/<name>/values.

Driver-side control plane only: parses params, delegates to PromQLEngine
(executors do the work), serializes {status, data:{resultType, result}}.
Concurrency guardrails (reference internal/limits/limit.go:27-64) map to a
semaphore here + Spark fair-scheduler pools underneath.

Resource quotas (reference internal/limits/limit.go:66-93):
- row quota: limit(q+1) admission on the result DataFrame — executors stop
  early instead of shipping an oversized result;
- byte quota: admission against the Catalyst-optimized plan's estimated
  input size (post partition-pruning file bytes) — the Spark analogue of
  reserving chunk bytes before materialization.
Truncation warnings (reference internal/warnings/warnings.go:9-13) ride in
the top-level ``warnings`` array; per-query samples-scanned stats (reference
api/grpc/thanos.go:561-566) come from the executed plan's scan metrics.
"""

from __future__ import annotations

import json
import math
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from thanos_parquet_gateway_spark.promql.engine import PromQLEngine

# Reference internal/warnings/warnings.go:9
WARN_TRUNCATED = "results truncated due to limit"


def _fmt_val(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    return repr(v) if v != int(v) else str(int(v))


def _hist_json(h) -> dict:
    """Collected hist struct → the Prometheus HTTP API histogram object:
    {"count", "sum", "buckets": [[boundary_rule, lower, upper, count]...]}
    (values as Prometheus-formatted strings; empty buckets omitted like
    upstream).  boundary_rule: 0 = (lower, upper], 1 = [lower, upper),
    3 = closed both (the zero bucket).  A "schema" int rides along as an
    extension so the gRPC layer can rebuild exact bounds."""
    sch = h["schema"]
    sch_i = -53 if sch is None else int(sch)
    bks = sorted((float(b["le"]), float(b["count"])) for b in h["buckets"])
    out = []
    if sch_i == -53:
        prev = float("-inf")
        for le, c in bks:
            if c:
                out.append([0, _fmt_val(prev), _fmt_val(le), _fmt_val(c)])
            prev = le
    else:
        base = 2.0 ** (2.0 ** -sch_i)
        for le, c in bks:
            if not c:
                continue
            if le == 0.0:
                # zero bucket; the engine model does not track the zero
                # threshold, so the bound collapses to the point 0
                out.append([3, "0", "0", _fmt_val(c)])
            elif le > 0:
                out.append([0, _fmt_val(le / base), _fmt_val(le),
                            _fmt_val(c)])
            else:
                out.append([1, _fmt_val(le * base), _fmt_val(le),
                            _fmt_val(c)])
    return {"count": _fmt_val(float(h["count"])),
            "sum": _fmt_val(float(h["sum"])),
            "schema": sch_i, "buckets": out}


def _parse_time(s: str | None, default_ms: int) -> int:
    if not s:
        return default_ms
    try:
        return int(float(s) * 1000)
    except ValueError:
        from datetime import datetime
        return int(datetime.fromisoformat(s.replace("Z", "+00:00"))
                   .timestamp() * 1000)


# large-but-finite backstop for metadata endpoints when the operator sets no
# quota and the client sends no limit (round-9 verdict #6): big enough that
# no legitimate label/series listing hits it, small enough that a forgotten
# knob yields a 400 resource_exhausted instead of a driver OOM
DEFAULT_METADATA_ROW_QUOTA = 1_000_000


class QuotaExceeded(RuntimeError):
    """Per-query resource quota hit (reference internal/limits/limit.go:66-93:
    Quota.Reserve; surfaced with errorType=resource_exhausted like the
    reference's HTTP layer, api/http/query.go:188,216)."""


def plan_input_bytes(df) -> int:
    """Catalyst-estimated *input* size of the optimized plan: the sum of
    sizeInBytes over the plan's leaf relations (for file scans, the pruned
    file bytes) — the admission analogue of the reference's chunk-bytes
    quota (internal/limits/limit.go:66-93 wired at db/db.go).  Summing
    leaves (not the root) matters: the root estimate is the *output* size,
    which collapses after aggregates (quota would never fire on huge scans)
    and multiplies after joins (spurious rejections)."""
    try:
        leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
        total = 0
        for i in range(leaves.size()):
            total += int(leaves.apply(i).stats().sizeInBytes())
        return total
    except Exception:  # noqa: BLE001 — stats are advisory
        return 0


_scan_files_probe_warned = False


def plan_scan_files(df) -> int:
    """Post-pruning file count the query would scan, summed over the
    plan's file scans — the admission analogue of the reference's SHARD
    quota (a Select may touch at most N parquet shards; the repo's
    conversion writes ~6M-row shard files, so files ≡ shards here).
    Driver-side only: reads FileSourceScanExec.selectedPartitions (the
    pruned listing the scan will use anyway — computed once, cached by
    the node).

    UPPER-BOUND admission: this walks the AQE ``initialPlan`` (the query
    has not run at admission time), so counts reflect static partition
    pruning only — files that dynamic partition pruning or AQE would
    later skip at runtime are still counted.  The quota therefore only
    ever over-estimates (rejects a query that would have scanned fewer
    files), never under-admits — the conservative direction for an
    admission control (pinned by test_api).

    Advisory: returns 0 (quota off) when the private interface is
    unavailable, with a ONE-TIME warning so a silently-disabled quota is
    visible (the shape is also pinned by test_api so a Spark upgrade
    fails loudly)."""
    global _scan_files_probe_warned
    try:
        leaves: list = []
        _walk_leaves(df._jdf.queryExecution().executedPlan(), leaves,
                     adaptive="initial")
        total = 0
        for leaf in leaves:
            if leaf.getClass().getSimpleName() == "FileSourceScanExec":
                total += int(leaf.selectedPartitions().totalNumberOfFiles())
        return total
    except Exception:  # noqa: BLE001 — stats are advisory
        if not _scan_files_probe_warned:
            _scan_files_probe_warned = True
            import warnings
            warnings.warn(
                "plan_scan_files: FileSourceScanExec.selectedPartitions "
                "probe failed — the shard quota is DISABLED (returns 0) "
                "for this process", RuntimeWarning, stacklevel=2)
        return 0


def _walk_leaves(node, out, adaptive: str = "executed"):
    """Collect physical-plan leaves, descending through AQE wrappers
    (AdaptiveSparkPlanExec / *QueryStageExec / ReusedExchangeExec), which
    collectLeaves() treats as opaque.  ``adaptive`` picks which side of
    an AdaptiveSparkPlanExec to walk: "executed" (post-run, for stats)
    or "initial" (pre-run, for admission — no stages exist yet)."""
    cls = node.getClass().getSimpleName()
    if cls.startswith("AdaptiveSparkPlan"):
        sub = (node.initialPlan() if adaptive == "initial"
               else node.executedPlan())
        _walk_leaves(sub, out, adaptive)
        return
    if "QueryStage" in cls:
        _walk_leaves(node.plan(), out, adaptive)
        return
    if cls.startswith("ReusedExchange"):
        _walk_leaves(node.child(), out, adaptive)
        return
    ch = node.children()
    if ch.size() == 0:
        out.append(node)
        return
    for i in range(ch.size()):
        _walk_leaves(ch.apply(i), out, adaptive)


def scan_stats(df) -> dict:
    """Per-query scan statistics from the *executed* plan's leaf metrics
    (call after an action): total rows produced by all scans and the largest
    single scan — the analogue of the reference's samples total/peak stats
    (api/grpc/thanos.go:561-566).

    Scan-level counters ride along when the leaves are parquet scans
    (reference search/metrics.go:35-76 exports pages/rows/bytes per query):
    ``filesScanned`` (split count after partition/stats pruning — the
    page-run analogue) and ``bytesScanned`` (pruned file bytes)."""
    try:
        leaves: list = []
        _walk_leaves(df._jdf.queryExecution().executedPlan(), leaves)
        total = peak = files = fbytes = 0
        for leaf in leaves:
            m = leaf.metrics()
            if m.contains("numOutputRows"):
                v = int(m.apply("numOutputRows").value())
                total += v
                peak = max(peak, v)
            if m.contains("numFiles"):
                files += int(m.apply("numFiles").value())
            if m.contains("filesSize"):
                fbytes += int(m.apply("filesSize").value())
        return {"totalQueried": total, "peakSamples": peak,
                "filesScanned": files, "bytesScanned": fbytes}
    except Exception:  # noqa: BLE001 — stats are advisory
        return {"totalQueried": 0, "peakSamples": 0,
                "filesScanned": 0, "bytesScanned": 0}


class QueryAPI:
    """Transport-independent request handlers (unit-testable without HTTP).

    ``row_quota`` bounds the rows a single query may materialize to the
    driver; ``byte_quota`` bounds the estimated input bytes a query may
    scan; ``shard_quota`` bounds the post-pruning file count a query may
    touch (the reference's shard quota).  All reject with QuotaExceeded
    before shipping oversized work, mirroring the reference's
    Quota.Reserve admission.
    """

    def __init__(self, engine: PromQLEngine, max_concurrent: int = 100,
                 row_quota: int = 0, byte_quota: int = 0,
                 shard_quota: int = 0,
                 label_names_row_quota: int = 0,
                 label_values_row_quota: int = 0,
                 default_metadata_row_quota: int = DEFAULT_METADATA_ROW_QUOTA):
        self.engine = engine
        self.sem = threading.Semaphore(max_concurrent)
        self.row_quota = row_quota
        self.byte_quota = byte_quota
        self.shard_quota = shard_quota
        # per-endpoint metadata quotas, mirroring the reference's
        # LabelNamesRowCountQuota / LabelValuesRowCountQuota options
        # (api/http/query.go:130-140 wired to internal/limits Quota)
        self.label_names_row_quota = label_names_row_quota
        self.label_values_row_quota = label_values_row_quota
        # backstop when an operator configures NO quota and the client sends
        # NO limit: the reference defaults to UnlimitedQuota, but an
        # unbounded metadata collect is a driver OOM at 100x scale — degrade
        # to a 400 at a large-but-finite ceiling instead.  Pass 0 to restore
        # the reference's truly-unlimited behavior.
        self.default_metadata_row_quota = default_metadata_row_quota

    def _admit(self, df):
        if self.byte_quota:
            est = plan_input_bytes(df)
            if est > self.byte_quota:
                raise QuotaExceeded(
                    f"resource exhausted (query would scan ~{est} bytes, "
                    f"quota {self.byte_quota})")
        if self.shard_quota:
            n = plan_scan_files(df)
            if n > self.shard_quota:
                raise QuotaExceeded(
                    f"resource exhausted (query would scan {n} shards, "
                    f"quota {self.shard_quota})")

    def _collect(self, df):
        """Collect under the row quota.  Returns (rows, executed_df): scan
        metrics must be read from the DataFrame that actually ran — under a
        quota that is the limit(q+1) plan, not the original."""
        self._admit(df)
        if self.row_quota:
            limited = df.limit(self.row_quota + 1)
            rows = limited.collect()
            if len(rows) > self.row_quota:
                raise QuotaExceeded(
                    f"resource exhausted (query would return more than "
                    f"{self.row_quota} rows)")
            return rows, limited
        return df.collect(), df

    @staticmethod
    def _with_annotations(payload: dict, res) -> dict:
        """Attach PromQL annotations (upstream util/annotations) as the
        Prometheus API's warnings/infos arrays (the HTTP layer lifts them
        to the top-level response fields)."""
        if hasattr(res, "all_annotations"):
            # includes data-dependent probe annotations (bounded
            # side-aggregations, collected once here)
            ann = res.all_annotations()
        else:
            ann = getattr(res, "annotations", None) or []
        warns = [m for k, m in ann if k == "warn"]
        infos = [m for k, m in ann if k == "info"]
        if warns:
            payload["warnings"] = warns
        if infos:
            payload["infos"] = infos
        return payload

    def query(self, q: str, t_ms: int) -> dict:
        with self.sem:
            res = self.engine.query_instant(q, t_ms)
            if res.result_type == "string":
                row = res.df.collect()[0]
                return self._with_annotations(
                    {"resultType": "string",
                     "result": [t_ms / 1000.0, row["value"]]}, res)
            if res.result_type == "scalar":
                row = res.df.collect()[0]
                return self._with_annotations(
                    {"resultType": "scalar",
                     "result": [t_ms / 1000.0, _fmt_val(row["value"])],
                     "stats": {"samples": scan_stats(res.df)}}, res)
            rows, ran = self._collect(res.df)
            # Prometheus execution error: an instant vector must not contain
            # two samples with the same labelset (can arise from
            # label_replace/label_join collapsing labels).  Checked here on
            # the collected result — no extra job.
            seen: set = set()
            for r in rows:
                key = frozenset(dict(r["labels"]).items())
                if key in seen:
                    raise ValueError(
                        "vector cannot contain metrics with the same labelset")
                seen.add(key)
            has_hist = "hist" in res.df.columns
            result = []
            for r in rows:
                item = {"metric": dict(r["labels"])}
                if has_hist and r["hist"] is not None:
                    # native-histogram sample: Prometheus API "histogram"
                    # slot instead of "value" (value is the NaN carrier)
                    item["histogram"] = [r["t"] / 1000.0,
                                         _hist_json(r["hist"])]
                else:
                    item["value"] = [r["t"] / 1000.0, _fmt_val(r["value"])]
                result.append(item)
            return self._with_annotations(
                {"resultType": "vector", "result": result,
                 "stats": {"samples": scan_stats(ran)}}, res)

    def query_range(self, q: str, start_ms: int, end_ms: int,
                    step_ms: int) -> dict:
        with self.sem:
            res = self.engine.query_range(q, start_ms, end_ms, step_ms)
            rows, ran = self._collect(res.df)
            stats = {"samples": scan_stats(ran)}
            if res.result_type == "scalar":
                return self._with_annotations(
                    {"resultType": "matrix", "result": [{
                        "metric": {},
                        "values": [[r["t"] / 1000.0, _fmt_val(r["value"])]
                                   for r in sorted(rows,
                                                   key=lambda r: r["t"])]}],
                     "stats": stats}, res)
            has_hist = "hist" in res.df.columns
            series: dict = {}
            seen_points: set = set()
            for r in rows:
                # two rows on one (series, step) = duplicate labelsets
                # (Prometheus execution error, as in the vector case)
                if (r["sig"], r["t"]) in seen_points:
                    raise ValueError(
                        "vector cannot contain metrics with the same labelset")
                seen_points.add((r["sig"], r["t"]))
                s = series.setdefault(r["sig"],
                                      {"metric": dict(r["labels"]),
                                       "values": []})
                if has_hist and r["hist"] is not None:
                    s.setdefault("histograms", []).append(
                        [r["t"] / 1000.0, _hist_json(r["hist"])])
                else:
                    s["values"].append(
                        [r["t"] / 1000.0, _fmt_val(r["value"])])
            for s in series.values():
                s["values"].sort(key=lambda v: v[0])
                if "histograms" in s:
                    s["histograms"].sort(key=lambda v: v[0])
                    if not s["values"]:  # upstream omits the empty slot
                        del s["values"]
            return self._with_annotations(
                {"resultType": "matrix",
                 "result": [series[k] for k in sorted(series)],
                 "stats": stats}, res)

    # -- metadata endpoints: (data, warnings) pairs ----------------------
    def _limited(self, df, limit: int, quota: int = 0):
        """Collect limit+1 rows; report truncation as a warning instead of
        silently clipping (reference search/materialize.go:53-58,
        db/db.go:339-347).  ``quota`` is the operator-set per-endpoint row
        ceiling (reference LabelNames/LabelValuesRowCountQuota): exceeding
        it is a 400 resource_exhausted, unlike the client ``limit`` which
        truncates with a warning — and the quota probe pulls at most
        quota+1 rows, never the full result.  With NO quota and NO limit,
        ``default_metadata_row_quota`` backstops the otherwise-unbounded
        collect (the reference's UnlimitedQuota default would OOM the
        driver at scale; 0 restores it)."""
        self._admit(df)
        if not quota and not limit:
            quota = self.default_metadata_row_quota
        if quota:
            rows = df.limit(quota + 1).collect()
            if len(rows) > quota:
                raise QuotaExceeded(
                    f"resource exhausted (metadata result exceeds the "
                    f"{quota}-row quota)")
            if limit and len(rows) > limit:
                return rows[:limit], [WARN_TRUNCATED]
            return rows, []
        if not limit:
            return df.collect(), []
        rows = df.limit(limit + 1).collect()
        if len(rows) > limit:
            return rows[:limit], [WARN_TRUNCATED]
        return rows, []

    def series(self, match: list[str], start_ms: int, end_ms: int,
               limit: int = 0) -> tuple[list[dict], list[str]]:
        rows, warns = self._limited(
            self.engine.series(match, start_ms, end_ms), limit,
            quota=self.row_quota)
        return [dict(r["labels"]) for r in rows], warns

    def labels(self, match: list[str] | None, start_ms: int, end_ms: int,
               limit: int = 0) -> tuple[list[str], list[str]]:
        rows, warns = self._limited(
            self.engine.label_names(match, start_ms, end_ms), limit,
            quota=self.label_names_row_quota)
        return [r["name"] for r in rows], warns

    def label_values(self, name: str, match: list[str] | None, start_ms: int,
                     end_ms: int, limit: int = 0) -> tuple[list[str], list[str]]:
        rows, warns = self._limited(
            self.engine.label_values(name, match, start_ms, end_ms), limit,
            quota=self.label_values_row_quota)
        return [r["value"] for r in rows], warns


class PromHTTPServer:
    def __init__(self, engine: PromQLEngine, port: int = 9090,
                 max_concurrent: int = 100, row_quota: int = 0,
                 byte_quota: int = 0, shard_quota: int = 0,
                 label_names_row_quota: int = 0,
                 label_values_row_quota: int = 0,
                 default_metadata_row_quota: int = DEFAULT_METADATA_ROW_QUOTA):
        self.api = QueryAPI(engine, max_concurrent, row_quota=row_quota,
                            byte_quota=byte_quota, shard_quota=shard_quota,
                            label_names_row_quota=label_names_row_quota,
                            label_values_row_quota=label_values_row_quota,
                            default_metadata_row_quota=default_metadata_row_quota)
        api = self.api
        # Internal-API surface (reference cmd/config.go:183-191 serves
        # /-/healthy, /-/ready and /metrics on a separate internal port;
        # here they share the query port — one listener in-process).
        # Counters are plain ints under a lock, rendered in Prometheus
        # text exposition format by /metrics.
        self._counters: dict[tuple[str, str], int] = {}
        self._counters_lock = threading.Lock()
        counters, counters_lock = self._counters, self._counters_lock

        def _count(name: str, label: str) -> None:
            with counters_lock:
                counters[(name, label)] = counters.get((name, label), 0) + 1

        # Known-endpoint buckets only: counting raw client paths would let
        # arbitrary /api/* strings (404s, arbitrary label names) grow the
        # counter map without bound on a long-running server, and a path
        # containing ``"`` / ``\`` / newline would corrupt the exposition
        # output for every scraper thereafter.  Dynamic label-values paths
        # collapse to one bucket; everything else is endpoint="other".
        _ENDPOINTS = frozenset((
            "/api/v1/query", "/api/v1/query_range", "/api/v1/format_query",
            "/api/v1/parse_query", "/api/v1/series", "/api/v1/labels"))

        def _endpoint_bucket(path: str) -> str:
            if path in _ENDPOINTS:
                return path
            if path.startswith("/api/v1/label/") and path.endswith("/values"):
                return "/api/v1/label/:name/values"
            return "other"

        def _esc_label(v: str) -> str:
            # Prometheus text exposition escaping for label values
            return (v.replace("\\", r"\\").replace('"', r"\"")
                     .replace("\n", r"\n"))

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

            def _ok(self, data, warnings=None, infos=None):
                payload = {"status": "success", "data": data}
                # query handlers return warnings/infos inside the data dict;
                # the Prometheus API carries them at the top level
                if isinstance(data, dict):
                    warnings = warnings or data.pop("warnings", None)
                    infos = infos or data.pop("infos", None)
                if warnings:
                    payload["warnings"] = warnings
                if infos:
                    payload["infos"] = infos
                self._send(payload)

            def do_GET(self):  # noqa: N802
                self.do_POST()

            def _send_text(self, body: bytes, code: int = 200,
                           ctype: str = "text/plain; charset=utf-8"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_POST(self):  # noqa: N802
                try:
                    u = urlparse(self.path)
                    if u.path in ("/-/healthy", "/-/ready", "/metrics"):
                        # Drain any request body BEFORE responding: leaving
                        # Content-Length bytes unread is harmless on
                        # HTTP/1.0 (no keep-alive) but becomes a
                        # request-desync if protocol_version is ever
                        # bumped to HTTP/1.1.
                        if self.headers.get("Content-Length"):
                            remaining = int(self.headers["Content-Length"])
                            while remaining > 0:
                                chunk = self.rfile.read(min(remaining, 65536))
                                if not chunk:
                                    break
                                remaining -= len(chunk)
                    if u.path in ("/-/healthy", "/-/ready"):
                        # reference cmd/config.go:183-191: plain "OK"
                        self._send_text(b"OK")
                        return
                    if u.path == "/metrics":
                        with counters_lock:
                            items = sorted(counters.items())
                        lines = [
                            "# HELP pqg_http_requests_total HTTP requests "
                            "by endpoint.",
                            "# TYPE pqg_http_requests_total counter"]
                        lines += [
                            f'pqg_http_requests_total'
                            f'{{endpoint="{_esc_label(lb)}"}} {v}'
                            for (name, lb), v in items
                            if name == "requests"]
                        lines += [
                            "# HELP pqg_http_errors_total HTTP error "
                            "responses by type.",
                            "# TYPE pqg_http_errors_total counter"]
                        lines += [
                            f'pqg_http_errors_total'
                            f'{{type="{_esc_label(lb)}"}} {v}'
                            for (name, lb), v in items if name == "errors"]
                        self._send_text(("\n".join(lines) + "\n").encode(),
                                        ctype="text/plain; version=0.0.4; "
                                              "charset=utf-8")
                        return
                    if u.path.startswith("/api/"):
                        _count("requests", _endpoint_bucket(u.path))
                    qs = parse_qs(u.query)
                    if self.headers.get("Content-Length"):
                        n = int(self.headers["Content-Length"])
                        qs.update(parse_qs(self.rfile.read(n).decode()))
                    now = int(time.time() * 1000)
                    one = lambda k, d=None: qs.get(k, [d])[0]  # noqa: E731
                    if u.path == "/api/v1/query":
                        self._ok(api.query(one("query"),
                                           _parse_time(one("time"), now)))
                    elif u.path == "/api/v1/query_range":
                        step = one("step", "30")
                        self._ok(api.query_range(
                            one("query"), _parse_time(one("start"), now),
                            _parse_time(one("end"), now),
                            int(float(step) * 1000)))
                    elif u.path == "/api/v1/format_query":
                        # Prometheus 3 query formatter: parse + prettify
                        # (promql/printer.py; long expressions split across
                        # indented lines like upstream Pretty)
                        from thanos_parquet_gateway_spark.promql.parser import (
                            parse as _pq_parse,
                        )
                        from thanos_parquet_gateway_spark.promql.printer import (
                            prettify,
                        )
                        self._ok(prettify(_pq_parse(one("query") or "")))
                    elif u.path == "/api/v1/parse_query":
                        # Prometheus 3 AST endpoint: the parsed expression
                        # as a JSON tree (promql/printer.ast_to_json)
                        from thanos_parquet_gateway_spark.promql.parser import (
                            parse as _pq_parse,
                        )
                        from thanos_parquet_gateway_spark.promql.printer import (
                            ast_to_json,
                        )
                        self._ok(ast_to_json(_pq_parse(one("query") or "")))
                    elif u.path == "/api/v1/series":
                        data, warns = api.series(qs.get("match[]", []),
                                                 _parse_time(one("start"), 0),
                                                 _parse_time(one("end"), now),
                                                 int(one("limit", "0")))
                        self._ok(data, warns)
                    elif u.path == "/api/v1/labels":
                        data, warns = api.labels(qs.get("match[]") or None,
                                                 _parse_time(one("start"), 0),
                                                 _parse_time(one("end"), now),
                                                 int(one("limit", "0")))
                        self._ok(data, warns)
                    elif u.path.startswith("/api/v1/label/") and \
                            u.path.endswith("/values"):
                        name = u.path[len("/api/v1/label/"):-len("/values")]
                        data, warns = api.label_values(
                            name, qs.get("match[]") or None,
                            _parse_time(one("start"), 0),
                            _parse_time(one("end"), now),
                            int(one("limit", "0")))
                        self._ok(data, warns)
                    else:
                        self._send({"status": "error",
                                    "errorType": "bad_data",
                                    "error": "unknown endpoint"}, 404)
                        return
                except QuotaExceeded as e:
                    # reference maps resource-exhausted to HTTP 400 with
                    # errorType=resource_exhausted (api/http/query.go:188,216)
                    _count("errors", "resource_exhausted")
                    self._send({"status": "error",
                                "errorType": "resource_exhausted",
                                "error": str(e)}, 400)
                except Exception as e:  # noqa: BLE001
                    _count("errors", "execution")
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
