"""Minimal gRPC client for the Thanos query services — the dial side of
api/grpc_server.py, used by tests to exercise the server over a real
localhost TCP channel (the reference's integration tests dial the served
port the same way, api/grpc/thanos_test.go).

Speaks the identical cleartext-HTTP/2 + gRPC framing as the server
(api/h2.py) and the same hand-rolled protos (api/grpc_pb.py).  Synchronous
and single-RPC-at-a-time: each call opens the next odd stream id, sends
HEADERS + DATA(END_STREAM), then pumps frames until the response stream
ends, returning (decoded messages, trailer map).
"""

from __future__ import annotations

import socket

from thanos_parquet_gateway_spark.api import grpc_pb as pb
from thanos_parquet_gateway_spark.api.h2 import (
    CONTINUATION,
    DATA,
    FLAG_ACK,
    FLAG_END_HEADERS,
    FLAG_END_STREAM,
    GOAWAY,
    HEADERS,
    PING,
    PREFACE,
    SETTINGS,
    WINDOW_UPDATE,
    Conn,
    grpc_frame,
    pack_frame,
    split_grpc_frames,
    strip_padding,
    strip_priority,
)


class GrpcError(Exception):
    def __init__(self, code: int, message: str) -> None:
        super().__init__(f"grpc-status {code}: {message}")
        self.code = code
        self.message = message


class ThanosGrpcClient:
    def __init__(self, host: str, port: int, timeout: float = 120.0) -> None:
        sock = socket.create_connection((host, port), timeout=timeout)
        self.conn = Conn(sock)
        self.conn.send(PREFACE)
        self.conn.send_settings()
        self._next_stream = 1
        # drain the server's connection preamble (SETTINGS + its big
        # connection WINDOW_UPDATE) BEFORE the first call: this client is
        # single-threaded, so a request body larger than the 64 KiB
        # default window would otherwise block in send_data while the
        # grants sit unread in the socket
        for _ in range(2):
            ftype, flags, fsid, payload = self.conn.read_frame()
            if ftype == SETTINGS:
                self.conn.handle_settings(flags, payload)
            elif ftype == WINDOW_UPDATE:
                self.conn.handle_window_update(fsid, payload)

    def close(self) -> None:
        self.conn.send_goaway()
        try:
            self.conn.sock.close()
        except OSError:
            pass

    def __enter__(self) -> "ThanosGrpcClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ------------------------------------------------------------- core
    def call(self, path: str, request: bytes) -> list[bytes]:
        """One RPC: returns response messages; raises GrpcError on
        non-zero grpc-status."""
        sid = self._next_stream
        self._next_stream += 2
        self.conn.register_stream(sid)
        self.conn.send_headers(sid, [
            (":method", "POST"),
            (":scheme", "http"),
            (":path", path),
            (":authority", "localhost"),
            ("content-type", "application/grpc"),
            ("te", "trailers"),
        ])
        self.conn.send_data(sid, grpc_frame(request), end_stream=True)

        data = b""
        headers: list[tuple[str, str]] = []
        hblock = b""
        while True:
            ftype, flags, fsid, payload = self.conn.read_frame()
            if ftype == SETTINGS:
                self.conn.handle_settings(flags, payload)
                continue
            if ftype == PING:
                if not flags & FLAG_ACK:
                    self.conn.send(pack_frame(PING, FLAG_ACK, 0, payload))
                continue
            if ftype == GOAWAY:
                raise ConnectionError("server sent GOAWAY")
            if ftype == WINDOW_UPDATE:
                # replenishes OUR send budget (connection-level updates
                # arrive on stream 0 — they must not be skipped below)
                self.conn.handle_window_update(fsid, payload)
                continue
            if fsid != sid:
                continue
            if ftype == HEADERS:
                hblock += strip_priority(flags, strip_padding(flags, payload))
                if flags & FLAG_END_HEADERS:
                    headers += self.conn.hdec.decode(hblock)
                    hblock = b""
                if flags & FLAG_END_STREAM:
                    break
            elif ftype == CONTINUATION:
                hblock += payload
                if flags & FLAG_END_HEADERS:
                    headers += self.conn.hdec.decode(hblock)
                    hblock = b""
            elif ftype == DATA:
                data += strip_padding(flags, payload)
                if flags & FLAG_END_STREAM:
                    break

        self.conn.release_stream(sid)
        hmap = dict(headers)
        status = int(hmap.get("grpc-status", "0"))
        if status != 0:
            raise GrpcError(status, hmap.get("grpc-message", ""))
        msgs, _rest = split_grpc_frames(data)
        return msgs

    # ------------------------------------------------------ typed calls
    def info(self) -> dict:
        msgs = self.call("/thanos.info.Info/Info", b"")
        return pb.decode_info_response(msgs[0])

    def query(self, q: str, time_seconds: int, *,
              replica_labels: list[str] | None = None) -> list[dict]:
        msgs = self.call("/thanos.Query/Query", pb.encode_query_request(
            q, time_seconds, replica_labels=replica_labels))
        return [pb.decode_query_response(m) for m in msgs]

    def query_range(self, q: str, start_s: int, end_s: int,
                    interval_s: int, *,
                    replica_labels: list[str] | None = None) -> list[dict]:
        msgs = self.call("/thanos.Query/QueryRange",
                         pb.encode_query_range_request(
                             q, start_s, end_s, interval_s,
                             replica_labels=replica_labels))
        return [pb.decode_query_response(m) for m in msgs]

    def series(self, matchers: list[tuple[str, str, str]], min_time: int,
               max_time: int, *, skip_chunks: bool = False,
               without_replica_labels: list[str] | None = None,
               limit: int = 0) -> list[dict]:
        msgs = self.call("/thanos.Store/Series", pb.encode_series_request(
            min_time, max_time, matchers, skip_chunks=skip_chunks,
            without_replica_labels=without_replica_labels, limit=limit))
        return [pb.decode_series_response(m) for m in msgs]

    def series_samples(self, matchers: list[tuple[str, str, str]],
                       min_time: int, max_time: int, **kw
                       ) -> list[dict]:
        """Series with every chunk decoded — what a querier does with the
        stream (reference querier side of thanos.go:462-473).  Returns
        ``[{labels, samples: [(ts, float)...], histograms: [(ts, h)...]}]``;
        streamed warning frames are skipped (use ``series()`` for the raw
        frames).  Handles every chunk encoding the wire can carry: XOR
        (0), integer HISTOGRAM (1), varbit FLOAT_HISTOGRAM (2) and the
        private prompb NHCB fallback (255)."""
        from thanos_parquet_gateway_spark.api.chunkenc import (
            decode_xor_chunk,
        )
        out = []
        for m in self.series(matchers, min_time, max_time, **kw):
            if "series" not in m:
                continue
            s = m["series"]
            samples: list[tuple[int, float]] = []
            hists: list[tuple[int, dict]] = []
            for c in s["chunks"]:
                if c["type"] == pb.CHUNK_XOR:
                    samples += decode_xor_chunk(c["data"])
                else:
                    hists += pb.decode_histogram_chunk(c["data"], c["type"])
            out.append({"labels": s["labels"], "samples": samples,
                        "histograms": hists})
        return out

    def label_names(self, start: int, end: int, *,
                    matchers: list[tuple[str, str, str]] | None = None,
                    limit: int = 0) -> dict:
        msgs = self.call("/thanos.Store/LabelNames",
                         pb.encode_label_names_request(
                             start, end, matchers=matchers, limit=limit))
        return pb.decode_label_strings_response(msgs[0])

    def label_values(self, label: str, start: int, end: int, *,
                     matchers: list[tuple[str, str, str]] | None = None,
                     limit: int = 0) -> dict:
        msgs = self.call("/thanos.Store/LabelValues",
                         pb.encode_label_values_request(
                             label, start, end, matchers=matchers,
                             limit=limit))
        return pb.decode_label_strings_response(msgs[0])
