"""Proto3 wire codecs for the public Thanos gRPC query API.

The reference serves four gRPC services to a Thanos Querier (reference
api/grpc/thanos.go:116-167): ``thanos.Query`` (Query/QueryRange,
pkg/api/query/querypb/query.proto), ``thanos.info.Info`` (Info,
pkg/info/infopb/rpc.proto) and ``thanos.Store``
(Series/LabelNames/LabelValues, pkg/store/storepb/rpc.proto), with label
and sample payloads from pkg/store/labelpb/types.proto and
pkg/store/storepb/prompb/types.proto.  All of those .proto files are public
(thanos-io/thanos, Apache-2.0); this module hand-encodes the same proto3
wire format with NO protobuf dependency — same approach as
convert/sidecar_pb.py — so messages are byte-compatible with the upstream
stubs.  Field numbers below are cited from the upstream .proto files.

Messages are plain dicts; unknown fields are skipped on decode (proto3
semantics).  Deterministic subset on encode: fields in field-number order,
defaults omitted.
"""

from __future__ import annotations

import math
import re
import struct

from thanos_parquet_gateway_spark.convert.sidecar_pb import (
    _iter_fields,
    _ld,
    _tag,
    _to_i64,
    _uvarint,
    _varint64,
    _vi,
)

_WT_FIXED64 = 1


def _dbl(field: int, v: float) -> bytes:
    return _tag(field, _WT_FIXED64) + struct.pack("<d", v)


def _vi64(field: int, n: int) -> bytes:
    """int64 field, omitted when 0 (proto3 default)."""
    return b"" if n == 0 else _tag(field, 0) + _varint64(n)


def _s(field: int, s: str) -> bytes:
    return b"" if s == "" else _ld(field, s.encode())


# ------------------------------------------------------- labelpb / prompb

def encode_label(name: str, value: str) -> bytes:
    # labelpb.Label: name=1 value=2 (labelpb/types.proto)
    return _s(1, name) + _s(2, value)


def decode_label(data: bytes) -> tuple[str, str]:
    name = value = ""
    for f, _wt, v in _iter_fields(data):
        if f == 1:
            name = v.decode()
        elif f == 2:
            value = v.decode()
    return name, value


def encode_label_set(labels: dict[str, str]) -> bytes:
    # labelpb.ZLabelSet: labels=1
    return b"".join(_ld(1, encode_label(k, v))
                    for k, v in sorted(labels.items()))


def decode_label_set(data: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for f, _wt, v in _iter_fields(data):
        if f == 1:
            k, val = decode_label(v)
            out[k] = val
    return out


# --------------------------------------------- prompb.Histogram (float)

CUSTOM_SCHEMA = -53  # upstream histogram.CustomBucketsSchema


def _zz(n: int, bits: int) -> int:
    """Protobuf zigzag encoding for sint32/sint64."""
    return ((n << 1) ^ (n >> (bits - 1))) & ((1 << (bits + 1)) - 1)


def _unzz(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _sint(field: int, n: int, bits: int = 64) -> bytes:
    return b"" if n == 0 else _tag(field, 0) + _uvarint(_zz(n, bits))


def _packed_dbl(field: int, vals: list[float]) -> bytes:
    if not vals:
        return b""
    return _ld(field, b"".join(struct.pack("<d", v) for v in vals))


def _unpack_dbl(data: bytes) -> list[float]:
    return [struct.unpack("<d", data[i:i + 8])[0]
            for i in range(0, len(data), 8)]


def _spans(indices: list[int]) -> list[tuple[int, int]]:
    """Sorted bucket indices → prompb.BucketSpan (offset, length) list:
    the first offset is absolute, later offsets are gaps from the previous
    span's end (prompb/types.proto BucketSpan semantics)."""
    spans: list[tuple[int, int]] = []
    prev_end = 0
    for i, idx in enumerate(indices):
        if i == 0:
            spans.append((idx, 1))
        elif idx == prev_end:
            spans[-1] = (spans[-1][0], spans[-1][1] + 1)
        else:
            spans.append((idx - prev_end, 1))
        prev_end = idx + 1
    return spans


def _span_indices(spans: list[tuple[int, int]]) -> list[int]:
    out: list[int] = []
    pos = 0
    for off, length in spans:
        pos += off
        out.extend(range(pos, pos + length))
        pos += length
    return out


def _enc_span(off: int, length: int) -> bytes:
    # prompb.BucketSpan: offset=1 (sint32) length=2 (uint32)
    return _sint(1, off, 32) + _vi(2, length)


def _dec_span(data: bytes) -> tuple[int, int]:
    off = length = 0
    for f, _wt, v in _iter_fields(data):
        if f == 1:
            off = _unzz(v)
        elif f == 2:
            length = v
    return off, length


def _on_exponential_grid(buckets: list[tuple[float, float]],
                         sch: int) -> bool:
    """True iff every bound sits exactly on schema ``sch``'s grid (le =
    base^i for positives, -(base^(i-1)) for negatives) with no index
    collisions, and no non-zero ±Inf bucket exists."""
    base_log = 2.0 ** -sch
    pos_idx: set[int] = set()
    neg_idx: set[int] = set()
    for le, c in buckets:
        if le == 0.0:
            continue
        if le == float("inf") or le == float("-inf"):
            if c:
                return False
            continue
        raw = math.log2(abs(le)) / base_log
        idx = round(raw)
        if abs(raw - idx) > 1e-9:
            return False
        side = pos_idx if le > 0 else neg_idx
        if idx in side:
            return False  # two bounds collapsing to one index
        side.add(idx)
    return True


def encode_histogram_sample(ts_ms: int, count: float, hsum: float,
                            buckets: list[tuple[float, float]],
                            schema: int | None) -> bytes:
    """Our explicit-bound histogram model → prompb.Histogram (the FLOAT
    flavor the reference streams on Query/QueryRange, thanos.go:274-277;
    field numbers from prometheus prompb/types.proto, Apache-2.0):
    count_float=2 sum=3 schema=4(sint32) zero_threshold=5
    zero_count_float=7 negative_spans=8 negative_counts=10(packed)
    positive_spans=11 positive_counts=13(packed) timestamp=15
    custom_values=16(packed).

    Exponential schemas invert the ingest mapping (promqltest_runner /
    histograms.py): positive le = base^i → index i; negative stored le =
    -(base^(i-1)) → index i; le == 0 → the zero bucket.  Custom bounds
    (schema -53 / NULL) become custom_values + an overflow count.  The
    zero threshold is not tracked by the engine model and is emitted as 0.
    """
    sch = effective_schema(buckets, schema)
    buckets = [(float(le), float(c)) for le, c in (buckets or [])]
    out = [_dbl(2, float(count)), _dbl(3, float(hsum)),
           _sint(4, sch, 32)]
    if sch == CUSTOM_SCHEMA:
        finite = [(le, c) for le, c in buckets if le != float("inf")]
        overflow = sum(c for le, c in buckets if le == float("inf"))
        counts = [c for _le, c in finite] + [overflow]
        out.append(_ld(11, _enc_span(0, len(counts))))
        out.append(_packed_dbl(13, counts))
        out.append(_vi64(15, ts_ms))
        out.append(_packed_dbl(16, [le for le, _c in finite]))
        return b"".join(out)
    zero_count, pos, neg = _grid_parts(buckets, sch)
    if zero_count:
        out.append(_dbl(7, zero_count))
    for field_span, field_cnt, side in ((8, 10, neg), (11, 13, pos)):
        if side:
            for off, length in _spans([i for i, _ in side]):
                out.append(_ld(field_span, _enc_span(off, length)))
            out.append(_packed_dbl(field_cnt, [c for _, c in side]))
    out.append(_vi64(15, ts_ms))
    return b"".join(out)


def effective_schema(buckets: list[tuple[float, float]],
                     schema: int | None) -> int:
    """The schema a sample actually encodes under: its own exponential
    schema when every bound sits on that grid, else CUSTOM_SCHEMA.
    Merged mixed-schema histograms (h0+h1 keeps the le-union with schema =
    coalesce) and saturated ±Inf bounds don't sit on any single
    exponential grid — colliding indices would produce invalid negative
    span offsets; custom-bounds encoding carries the exact le set
    losslessly instead."""
    sch = CUSTOM_SCHEMA if schema is None else int(schema)
    bks = [(float(le), float(c)) for le, c in (buckets or [])]
    if sch != CUSTOM_SCHEMA and not _on_exponential_grid(bks, sch):
        sch = CUSTOM_SCHEMA
    return sch


def _grid_parts(buckets: list[tuple[float, float]], sch: int
                ) -> tuple[float, list, list]:
    """Explicit-bound buckets on schema ``sch``'s grid → (zero_count,
    pos [(index, count)...] sorted, neg [(index, count)...] sorted).
    Positive le = base^i → index i; negative stored le = -(base^(i-1)) →
    index i; le == 0 → the zero bucket; ±Inf carries count 0 by the grid
    check and is dropped."""
    base_log = 2.0 ** -sch  # log2(base); index i = log2(bound) / base_log
    pos: list[tuple[int, float]] = []
    neg: list[tuple[int, float]] = []
    zero_count = 0.0
    for le, c in buckets:
        if le == 0.0:
            zero_count += c
        elif le == float("inf") or le == float("-inf"):
            pass  # grid check above guarantees count 0 here
        elif le > 0:
            pos.append((round(math.log2(le) / base_log), c))
        else:
            neg.append((round(math.log2(-le) / base_log) + 1, c))
    pos.sort()
    neg.sort()
    return zero_count, pos, neg


def decode_histogram_sample(data: bytes) -> dict:
    """prompb.Histogram → {ts, count, sum, buckets: [(le, count)...],
    schema} in the engine's explicit-bound model (inverse of
    encode_histogram_sample; int-flavor fields 1/6/9/12 also accepted)."""
    h = {"ts": 0, "count": 0.0, "sum": 0.0, "schema": 0,
         "zero_count": 0.0}
    neg_spans: list[tuple[int, int]] = []
    pos_spans: list[tuple[int, int]] = []
    neg_counts: list[float] = []
    pos_counts: list[float] = []
    custom: list[float] | None = None
    neg_deltas: list[int] = []
    pos_deltas: list[int] = []
    for f, wt, v in _iter_fields(data):
        if f == 1:
            h["count"] = float(v)
        elif f == 2:
            h["count"] = struct.unpack("<d", v)[0]
        elif f == 3:
            h["sum"] = struct.unpack("<d", v)[0]
        elif f == 4:
            h["schema"] = _unzz(v)
        elif f == 6:
            h["zero_count"] = float(v)
        elif f == 7:
            h["zero_count"] = struct.unpack("<d", v)[0]
        elif f == 8:
            neg_spans.append(_dec_span(v))
        elif f == 9:
            neg_deltas = [_unzz(u) for u in _unpack_varints(v)]
        elif f == 10:
            neg_counts = _unpack_dbl(v)
        elif f == 11:
            pos_spans.append(_dec_span(v))
        elif f == 12:
            pos_deltas = [_unzz(u) for u in _unpack_varints(v)]
        elif f == 13:
            pos_counts = _unpack_dbl(v)
        elif f == 15:
            h["ts"] = _to_i64(v)
        elif f == 16:
            custom = _unpack_dbl(v)
    for deltas, counts in ((neg_deltas, neg_counts),
                           (pos_deltas, pos_counts)):
        if deltas and not counts:  # int flavor: delta-coded counts
            run = 0
            for d in deltas:
                run += d
                counts.append(float(run))
    sch = h["schema"]
    buckets: list[tuple[float, float]] = []
    if custom is not None or sch == CUSTOM_SCHEMA:
        # sparse NHCB: spans map count positions onto custom_values
        # indices (a real peer skips empty buckets via span gaps); absent
        # spans mean the dense positional layout our encoder writes
        cv = custom or []
        idxs = (_span_indices(pos_spans) if pos_spans
                else list(range(len(pos_counts))))
        for idx, c in zip(idxs, pos_counts):
            buckets.append((cv[idx] if idx < len(cv) else float("inf"), c))
        if not buckets or buckets[-1][0] != float("inf"):
            buckets.append((float("inf"), 0.0))
        return {"ts": h["ts"], "count": h["count"], "sum": h["sum"],
                "buckets": buckets, "schema": CUSTOM_SCHEMA}
    base_log = 2.0 ** -sch

    def _bound(idx: int) -> float:
        try:
            return 2.0 ** (idx * base_log)
        except OverflowError:  # peer-sent index beyond double range
            return float("inf")

    for idx, c in zip(_span_indices(neg_spans), neg_counts):
        buckets.append((-_bound(idx - 1), c))
    if h["zero_count"]:
        buckets.append((0.0, h["zero_count"]))
    for idx, c in zip(_span_indices(pos_spans), pos_counts):
        buckets.append((_bound(idx), c))
    buckets.sort()
    if not buckets or buckets[-1][0] != float("inf"):
        buckets.append((float("inf"), 0.0))
    return {"ts": h["ts"], "count": h["count"], "sum": h["sum"],
            "buckets": buckets, "schema": sch}


def _unpack_varints(data: bytes) -> list[int]:
    out, val, shift = [], 0, 0
    for b in data:
        val |= (b & 0x7F) << shift
        if b & 0x80:
            shift += 7
        else:
            out.append(val)
            val = shift = 0
    return out


def encode_time_series(labels: dict[str, str],
                       samples: list[tuple[int, float]],
                       histograms: list[bytes] | None = None) -> bytes:
    # prompb.TimeSeries: labels=1 samples=2 exemplars=3 histograms=4;
    # prompb.Sample: value=1 (double) timestamp=2; histograms carry
    # pre-encoded prompb.Histogram payloads (encode_histogram_sample) —
    # the reference streams them alongside float samples (thanos.go:274)
    out = [
        _ld(1, encode_label(k, v)) for k, v in sorted(labels.items())
    ]
    for ts, val in samples:
        out.append(_ld(2, _dbl(1, val) + _vi64(2, ts)))
    for hmsg in histograms or []:
        out.append(_ld(4, hmsg))
    return b"".join(out)


def decode_time_series(data: bytes) -> dict:
    labels: dict[str, str] = {}
    samples: list[tuple[int, float]] = []
    histograms: list[dict] = []
    for f, _wt, v in _iter_fields(data):
        if f == 1:
            k, val = decode_label(v)
            labels[k] = val
        elif f == 2:
            ts, value = 0, 0.0
            for sf, _swt, sv in _iter_fields(v):
                if sf == 1:
                    value = struct.unpack("<d", sv)[0]
                elif sf == 2:
                    ts = _to_i64(sv)
            samples.append((ts, value))
        elif f == 4:
            histograms.append(decode_histogram_sample(v))
    out = {"labels": labels, "samples": samples}
    if histograms:
        out["histograms"] = histograms
    return out


# --------------------------------------------------------------- querypb

def encode_query_request(query: str, time_seconds: int, *,
                         timeout_seconds: int = 0,
                         replica_labels: list[str] | None = None,
                         lookback_delta_seconds: int = 0) -> bytes:
    # querypb.QueryRequest: query=1 time_seconds=2 timeout_seconds=3
    # max_resolution_seconds=4 replica_labels=5 storeMatchers=6
    # enableDedup=7 enablePartialResponse=8 (9 reserved) skipChunks=10
    # shard_info=11 lookback_delta_seconds=12 engine=13
    # (querypb/query.proto)
    out = [_s(1, query), _vi64(2, time_seconds), _vi64(3, timeout_seconds)]
    out += [_ld(5, r.encode()) for r in (replica_labels or [])]
    out.append(_vi64(12, lookback_delta_seconds))
    return b"".join(out)


def decode_query_request(data: bytes) -> dict:
    out = {"query": "", "time_seconds": 0, "timeout_seconds": 0,
           "replica_labels": [], "lookback_delta_seconds": 0}
    for f, _wt, v in _iter_fields(data):
        if f == 1:
            out["query"] = v.decode()
        elif f == 2:
            out["time_seconds"] = _to_i64(v)
        elif f == 3:
            out["timeout_seconds"] = _to_i64(v)
        elif f == 5:
            out["replica_labels"].append(v.decode())
        elif f == 12:
            out["lookback_delta_seconds"] = _to_i64(v)
    return out


def encode_query_range_request(query: str, start_s: int, end_s: int,
                               interval_s: int, *, timeout_seconds: int = 0,
                               replica_labels: list[str] | None = None,
                               lookback_delta_seconds: int = 0) -> bytes:
    # querypb.QueryRangeRequest: query=1 start_time_seconds=2
    # end_time_seconds=3 interval_seconds=4 timeout_seconds=5
    # max_resolution_seconds=6 replica_labels=7 storeMatchers=8
    # enableDedup=9 enablePartialResponse=10 (11 reserved) skipChunks=12
    # shard_info=13 lookback_delta_seconds=14 engine=15
    out = [_s(1, query), _vi64(2, start_s), _vi64(3, end_s),
           _vi64(4, interval_s), _vi64(5, timeout_seconds)]
    out += [_ld(7, r.encode()) for r in (replica_labels or [])]
    out.append(_vi64(14, lookback_delta_seconds))
    return b"".join(out)


def decode_query_range_request(data: bytes) -> dict:
    out = {"query": "", "start_time_seconds": 0, "end_time_seconds": 0,
           "interval_seconds": 0, "timeout_seconds": 0,
           "replica_labels": [], "lookback_delta_seconds": 0}
    for f, _wt, v in _iter_fields(data):
        if f == 1:
            out["query"] = v.decode()
        elif f == 2:
            out["start_time_seconds"] = _to_i64(v)
        elif f == 3:
            out["end_time_seconds"] = _to_i64(v)
        elif f == 4:
            out["interval_seconds"] = _to_i64(v)
        elif f == 5:
            out["timeout_seconds"] = _to_i64(v)
        elif f == 7:
            out["replica_labels"].append(v.decode())
        elif f == 14:
            out["lookback_delta_seconds"] = _to_i64(v)
    return out


def encode_query_response(*, warnings: str | None = None,
                          timeseries: bytes | None = None,
                          stats: tuple[int, int] | None = None) -> bytes:
    # querypb.Query(Range)Response oneof: warnings=1 timeseries=2 stats=3;
    # querypb.QueryStats: samples_total=1 peak_samples=2
    if warnings is not None:
        return _ld(1, warnings.encode())
    if timeseries is not None:
        return _ld(2, timeseries)
    st, pk = stats or (0, 0)
    return _ld(3, _vi64(1, st) + _vi64(2, pk))


def decode_query_response(data: bytes) -> dict:
    for f, _wt, v in _iter_fields(data):
        if f == 1:
            return {"warnings": v.decode()}
        if f == 2:
            return {"timeseries": decode_time_series(v)}
        if f == 3:
            st = {"samples_total": 0, "peak_samples": 0}
            for sf, _swt, sv in _iter_fields(v):
                if sf == 1:
                    st["samples_total"] = _to_i64(sv)
                elif sf == 2:
                    st["peak_samples"] = _to_i64(sv)
            return {"stats": st}
    return {}


# ---------------------------------------------------------------- infopb

def encode_info_response(info: dict) -> bytes:
    # infopb.InfoResponse: label_sets=1 ComponentType=2 store=3 ... query=8;
    # infopb.StoreInfo: min_time=1 max_time=2 supports_sharding=3
    # supports_without_replica_labels=4 tsdb_infos=5; infopb.TSDBInfo:
    # labels=1 min_time=2 max_time=3  (infopb/rpc.proto)
    out = [_ld(1, encode_label_set(ls)) for ls in info.get("labelSets", [])]
    out.append(_s(2, info.get("componentType", "")))
    store = info.get("store", {})
    sbody = [_vi64(1, store.get("minTime", 0)),
             _vi64(2, store.get("maxTime", 0))]
    if store.get("supportsWithoutReplicaLabels"):
        sbody.append(_tag(4, 0) + _uvarint(1))
    for ti in store.get("tsdbInfos", []):
        sbody.append(_ld(5, _ld(1, encode_label_set(ti.get("labels", {})))
                        + _vi64(2, ti.get("minTime", 0))
                        + _vi64(3, ti.get("maxTime", 0))))
    out.append(_ld(3, b"".join(sbody)))
    if "query" in info:
        out.append(_ld(8, b""))  # QueryAPIInfo{}
    return b"".join(out)


def decode_info_response(data: bytes) -> dict:
    out: dict = {"labelSets": [], "componentType": "", "store": {}}
    for f, _wt, v in _iter_fields(data):
        if f == 1:
            out["labelSets"].append(decode_label_set(v))
        elif f == 2:
            out["componentType"] = v.decode()
        elif f == 3:
            store: dict = {"minTime": 0, "maxTime": 0,
                           "supportsWithoutReplicaLabels": False,
                           "tsdbInfos": []}
            for sf, _swt, sv in _iter_fields(v):
                if sf == 1:
                    store["minTime"] = _to_i64(sv)
                elif sf == 2:
                    store["maxTime"] = _to_i64(sv)
                elif sf == 4:
                    store["supportsWithoutReplicaLabels"] = bool(sv)
                elif sf == 5:
                    ti = {"labels": {}, "minTime": 0, "maxTime": 0}
                    for tf, _twt, tv in _iter_fields(sv):
                        if tf == 1:
                            ti["labels"] = decode_label_set(tv)
                        elif tf == 2:
                            ti["minTime"] = _to_i64(tv)
                        elif tf == 3:
                            ti["maxTime"] = _to_i64(tv)
                    store["tsdbInfos"].append(ti)
            out["store"] = store
        elif f == 8:
            out["query"] = {}
    return out


# --------------------------------------------------------------- storepb

MATCHER_OPS = {0: "=", 1: "!=", 2: "=~", 3: "!~"}  # LabelMatcher.Type
MATCHER_TYPES = {v: k for k, v in MATCHER_OPS.items()}


def encode_label_matcher(op: str, name: str, value: str) -> bytes:
    # storepb.LabelMatcher: type=1 name=2 value=3 (EQ/NEQ/RE/NRE)
    return _vi(1, MATCHER_TYPES[op]) + _s(2, name) + _s(3, value)


def decode_label_matcher(data: bytes) -> tuple[str, str, str]:
    t, name, value = 0, "", ""
    for f, _wt, v in _iter_fields(data):
        if f == 1:
            t = v
        elif f == 2:
            name = v.decode()
        elif f == 3:
            value = v.decode()
    return MATCHER_OPS[t], name, value


_SELECTOR_IDENT = re.compile(r"[a-zA-Z_][a-zA-Z0-9_]*\Z")


def _quote_promql(s: str) -> str:
    """Double-quoted PromQL string literal — escapes exactly what the
    lexer's unescape table decodes, so value → selector → parse is
    lossless (the reference never round-trips through a string at all,
    storepb.MatchersToPromMatchers, thanos.go:379; here the selector IS
    the engine API, so the splice must be escape-correct)."""
    return '"' + (s.replace("\\", "\\\\").replace('"', '\\"')
                  .replace("\n", "\\n").replace("\t", "\\t")
                  .replace("\r", "\\r")) + '"'


def matchers_to_selector(matchers: list[tuple[str, str, str]]) -> str:
    """LabelMatcher list → one PromQL selector string (the reference's
    storepb.MatchersToPromMatchers + querier re-parse round trip).
    Values are escaped (regex matchers routinely carry backslashes, e.g.
    pod=~"api-\\d+"); non-identifier names use the quoted-label-name
    selector form the parser accepts."""
    quoted = ", ".join(
        (name if _SELECTOR_IDENT.match(name) else _quote_promql(name))
        + op + _quote_promql(val)
        for op, name, val in matchers)
    return "{" + quoted + "}"


def encode_series_request(min_time: int, max_time: int,
                          matchers: list[tuple[str, str, str]], *,
                          skip_chunks: bool = False,
                          without_replica_labels: list[str] | None = None,
                          limit: int = 0) -> bytes:
    # storepb.SeriesRequest: min_time=1 max_time=2 matchers=3
    # max_resolution_window=4 aggregates=5 (6 deprecated)
    # partial_response_strategy=7 skip_chunks=8 query_hints=9 shard_info=10
    # without_replica_labels=11 limit=12  (storepb/rpc.proto)
    out = [_vi64(1, min_time), _vi64(2, max_time)]
    out += [_ld(3, encode_label_matcher(*m)) for m in matchers]
    if skip_chunks:
        out.append(_tag(8, 0) + _uvarint(1))
    out += [_ld(11, r.encode()) for r in (without_replica_labels or [])]
    out.append(_vi64(12, limit))
    return b"".join(out)


def decode_series_request(data: bytes) -> dict:
    out = {"min_time": 0, "max_time": 0, "matchers": [],
           "skip_chunks": False, "without_replica_labels": [], "limit": 0}
    for f, _wt, v in _iter_fields(data):
        if f == 1:
            out["min_time"] = _to_i64(v)
        elif f == 2:
            out["max_time"] = _to_i64(v)
        elif f == 3:
            out["matchers"].append(decode_label_matcher(v))
        elif f == 8:
            out["skip_chunks"] = bool(v)
        elif f == 11:
            out["without_replica_labels"].append(v.decode())
        elif f == 12:
            out["limit"] = _to_i64(v)
    return out


CHUNK_XOR = 0  # storepb.Chunk.Encoding (storepb/types.proto)
CHUNK_HISTOGRAM = 1
CHUNK_FLOAT_HISTOGRAM = 2
# Private encoding for custom-bounds (NHCB) histogram chunks: a run of
# length-prefixed prompb.Histogram messages.  The varbit custom-values
# chunk layout is not reconstruction-verified in-sandbox, and tagging a
# non-varbit payload with the standard FLOAT_HISTOGRAM enum would make
# conformant Store API peers mis-decode it — an out-of-range enum makes
# them skip the chunk instead (proto3 open enums).
CHUNK_PROMPB_FLOAT_HISTOGRAM = 255


def encode_histogram_chunk(samples: list[tuple[int, dict]]) -> bytes:
    """FLOAT_HISTOGRAM chunk payload in the real tsdb varbit format
    (chunkenc.encode_float_histogram_chunk; prometheus tsdb/chunkenc/
    float_histogram.go), byte-compatible with what the reference passes
    through on Series (thanos.go:462-473 chunkEncToStoreEnc).

    Samples are the engine's explicit-bound model ``(ts, {count, sum,
    buckets, schema})``; every sample must sit on one shared exponential
    schema grid — callers split runs with split_histogram_chunks, which
    routes custom-bounds samples to the prompb payload instead."""
    from . import chunkenc
    native = []
    for ts, h in samples:
        sch = effective_schema(h["buckets"], h.get("schema"))
        if sch == CUSTOM_SCHEMA:
            raise ValueError("custom-bounds sample in a varbit chunk; "
                             "use split_histogram_chunks")
        bks = [(float(le), float(c)) for le, c in (h["buckets"] or [])]
        zero_count, pos, neg = _grid_parts(bks, sch)
        native.append({"ts": int(ts), "count": float(h["count"]),
                       "zero_count": zero_count, "sum": float(h["sum"]),
                       "schema": sch, "zero_threshold": 0.0,
                       "pos": pos, "neg": neg})
    if len({s["schema"] for s in native}) > 1:
        raise ValueError("mixed schemas in a varbit chunk; "
                         "use split_histogram_chunks")
    return chunkenc.encode_float_histogram_chunk(native)


def encode_prompb_histogram_chunk(samples: list[tuple[int, dict]]) -> bytes:
    """CHUNK_PROMPB_FLOAT_HISTOGRAM payload: a run of length-prefixed
    prompb.Histogram messages (encode_histogram_sample), one per sample —
    carries custom-bounds (NHCB) histograms losslessly where the varbit
    layout is unavailable (see CHUNK_PROMPB_FLOAT_HISTOGRAM)."""
    out = []
    for ts, h in samples:
        msg = encode_histogram_sample(int(ts), h["count"], h["sum"],
                                      h["buckets"], h.get("schema"))
        out.append(_uvarint(len(msg)) + msg)
    return b"".join(out)


def split_histogram_chunks(samples: list[tuple[int, dict]],
                           max_samples: int = 120) -> list[tuple]:
    """Engine-model histogram samples → storepb chunk tuples
    ``(min_time, max_time, payload, encoding)``: consecutive runs sharing
    one exponential schema become varbit FLOAT_HISTOGRAM chunks (the
    Prometheus appender likewise cuts a chunk on schema change), and
    custom-bounds runs become private prompb-payload chunks."""
    chunks: list[tuple] = []
    run: list[tuple[int, dict]] = []
    run_sch: int | None = None

    def _flush() -> None:
        if not run:
            return
        if run_sch == CUSTOM_SCHEMA:
            payload = encode_prompb_histogram_chunk(run)
            enc = CHUNK_PROMPB_FLOAT_HISTOGRAM
        else:
            payload = encode_histogram_chunk(run)
            enc = CHUNK_FLOAT_HISTOGRAM
        chunks.append((run[0][0], run[-1][0], payload, enc))
        run.clear()

    for ts, h in samples:
        sch = effective_schema(h["buckets"], h.get("schema"))
        if run and (sch != run_sch or len(run) >= max_samples):
            _flush()
        run_sch = sch
        run.append((int(ts), h))
    _flush()
    return chunks


def decode_histogram_chunk(data: bytes,
                           ctype: int = CHUNK_FLOAT_HISTOGRAM
                           ) -> list[tuple[int, dict]]:
    """Chunk payload → engine-model ``(ts, {count, sum, buckets, schema})``
    samples; dispatches on the storepb encoding enum."""
    if ctype == CHUNK_PROMPB_FLOAT_HISTOGRAM:
        return _decode_prompb_histogram_chunk(data)
    if ctype not in (CHUNK_FLOAT_HISTOGRAM, CHUNK_HISTOGRAM):
        raise ValueError(f"unsupported histogram chunk encoding {ctype}")
    from . import chunkenc
    out = []
    native = (chunkenc.decode_histogram_chunk_int(data)
              if ctype == CHUNK_HISTOGRAM
              else chunkenc.decode_float_histogram_chunk(data))
    for s in native:
        sch = s["schema"]
        base_log = 2.0 ** -sch
        buckets: list[tuple[float, float]] = []
        for idx, c in s["neg"]:
            try:
                buckets.append((-(2.0 ** ((idx - 1) * base_log)), float(c)))
            except OverflowError:  # peer index beyond double range
                buckets.append((float("-inf"), float(c)))
        if s["zero_count"]:
            buckets.append((0.0, float(s["zero_count"])))
        for idx, c in s["pos"]:
            try:
                buckets.append((2.0 ** (idx * base_log), float(c)))
            except OverflowError:  # peer index beyond double range
                buckets.append((float("inf"), float(c)))
        buckets.sort()
        if not buckets or buckets[-1][0] != float("inf"):
            buckets.append((float("inf"), 0.0))
        out.append((s["ts"], {"count": float(s["count"]),
                              "sum": float(s["sum"]),
                              "buckets": buckets, "schema": sch}))
    return out


def _decode_prompb_histogram_chunk(data: bytes) -> list[tuple[int, dict]]:
    out = []
    i, n = 0, len(data)
    while i < n:
        ln, shift = 0, 0
        while True:
            if i >= n:
                raise ValueError("truncated histogram chunk")
            b = data[i]
            i += 1
            ln |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        if i + ln > n:
            raise ValueError("truncated histogram chunk message")
        h = decode_histogram_sample(data[i:i + ln])
        i += ln
        out.append((h.pop("ts"), h))
    return out


def encode_series_response(*, labels: dict[str, str] | None = None,
                           chunks: list[tuple] | None = None,
                           warning: str | None = None) -> bytes:
    # storepb.SeriesResponse oneof: series=1 warning=2 hints=3;
    # storepb.Series: labels=1 chunks=2; storepb.AggrChunk: min_time=1
    # max_time=2 raw=3; storepb.Chunk: type=1 data=2.  Chunk tuples are
    # (mint, maxt, raw[, type]) — type defaults to XOR (0); the reference
    # passes HISTOGRAM=1 / FLOAT_HISTOGRAM=2 through the same enum
    # (thanos.go chunkEncToStoreEnc, storepb/types.proto)
    if warning is not None:
        return _ld(2, warning.encode())
    body = [_ld(1, encode_label(k, v))
            for k, v in sorted((labels or {}).items())]
    for chunk in chunks or []:
        mint, maxt, raw = chunk[0], chunk[1], chunk[2]
        ctype = chunk[3] if len(chunk) > 3 else CHUNK_XOR
        chk = _vi(1, ctype) + (_ld(2, raw) if raw else b"")
        body.append(_ld(2, _vi64(1, mint) + _vi64(2, maxt) + _ld(3, chk)))
    return _ld(1, b"".join(body))


def decode_series_response(data: bytes) -> dict:
    for f, _wt, v in _iter_fields(data):
        if f == 2:
            return {"warning": v.decode()}
        if f == 1:
            labels: dict[str, str] = {}
            chunks: list[dict] = []
            for sf, _swt, sv in _iter_fields(v):
                if sf == 1:
                    k, val = decode_label(sv)
                    labels[k] = val
                elif sf == 2:
                    c = {"min_time": 0, "max_time": 0, "type": 0,
                         "data": b""}
                    for cf, _cwt, cv in _iter_fields(sv):
                        if cf == 1:
                            c["min_time"] = _to_i64(cv)
                        elif cf == 2:
                            c["max_time"] = _to_i64(cv)
                        elif cf == 3:
                            for rf, _rwt, rv in _iter_fields(cv):
                                if rf == 1:
                                    c["type"] = rv
                                elif rf == 2:
                                    c["data"] = rv
                    chunks.append(c)
            return {"series": {"labels": labels, "chunks": chunks}}
    return {}


def encode_label_names_request(start: int, end: int, *,
                               matchers: list[tuple[str, str, str]]
                               | None = None,
                               without_replica_labels: list[str]
                               | None = None,
                               limit: int = 0) -> bytes:
    # storepb.LabelNamesRequest: (1 deprecated) partial_response_strategy=2
    # start=3 end=4 hints=5 matchers=6 without_replica_labels=7 limit=8
    out = [_vi64(3, start), _vi64(4, end)]
    out += [_ld(6, encode_label_matcher(*m)) for m in (matchers or [])]
    out += [_ld(7, r.encode()) for r in (without_replica_labels or [])]
    out.append(_vi64(8, limit))
    return b"".join(out)


def decode_label_names_request(data: bytes) -> dict:
    out = {"start": 0, "end": 0, "matchers": [],
           "without_replica_labels": [], "limit": 0}
    for f, _wt, v in _iter_fields(data):
        if f == 3:
            out["start"] = _to_i64(v)
        elif f == 4:
            out["end"] = _to_i64(v)
        elif f == 6:
            out["matchers"].append(decode_label_matcher(v))
        elif f == 7:
            out["without_replica_labels"].append(v.decode())
        elif f == 8:
            out["limit"] = _to_i64(v)
    return out


def encode_label_values_request(label: str, start: int, end: int, *,
                                matchers: list[tuple[str, str, str]]
                                | None = None,
                                without_replica_labels: list[str]
                                | None = None,
                                limit: int = 0) -> bytes:
    # storepb.LabelValuesRequest: label=1 (2 deprecated)
    # partial_response_strategy=3 start=4 end=5 hints=6 matchers=7
    # without_replica_labels=8 limit=9
    out = [_s(1, label), _vi64(4, start), _vi64(5, end)]
    out += [_ld(7, encode_label_matcher(*m)) for m in (matchers or [])]
    out += [_ld(8, r.encode()) for r in (without_replica_labels or [])]
    out.append(_vi64(9, limit))
    return b"".join(out)


def decode_label_values_request(data: bytes) -> dict:
    out = {"label": "", "start": 0, "end": 0, "matchers": [],
           "without_replica_labels": [], "limit": 0}
    for f, _wt, v in _iter_fields(data):
        if f == 1:
            out["label"] = v.decode()
        elif f == 4:
            out["start"] = _to_i64(v)
        elif f == 5:
            out["end"] = _to_i64(v)
        elif f == 7:
            out["matchers"].append(decode_label_matcher(v))
        elif f == 8:
            out["without_replica_labels"].append(v.decode())
        elif f == 9:
            out["limit"] = _to_i64(v)
    return out


def encode_label_strings_response(values: list[str], warnings: list[str],
                                  *, field_values: int = 1) -> bytes:
    # storepb.LabelNamesResponse: names=1 warnings=2 hints=3;
    # storepb.LabelValuesResponse: values=1 warnings=2 hints=3
    out = [_ld(field_values, s.encode()) for s in values]
    out += [_ld(2, w.encode()) for w in warnings]
    return b"".join(out)


def decode_label_strings_response(data: bytes) -> dict:
    out: dict = {"values": [], "warnings": []}
    for f, _wt, v in _iter_fields(data):
        if f == 1:
            out["values"].append(v.decode())
        elif f == 2:
            out["warnings"].append(v.decode())
    return out
