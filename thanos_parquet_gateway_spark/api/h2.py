"""Minimal HTTP/2 (RFC 7540) framing + gRPC-over-HTTP/2 message layer.

grpcio is not available in this sandbox, and gRPC is "just" protobuf
messages length-prefixed inside HTTP/2 DATA frames (gRPC spec
PROTOCOL-HTTP2.md): request = HEADERS(:method POST, :path
/pkg.Service/Method, content-type application/grpc) + DATA(1-byte
compressed flag + 4-byte big-endian length + message)* END_STREAM;
response = HEADERS(:status 200) + DATA(messages)* + trailers
HEADERS(grpc-status, grpc-message, END_STREAM).  This module implements
exactly that over a TCP socket with cleartext prior-knowledge h2 (what
grpc-go uses on insecure channels):

- connection preface + SETTINGS exchange,
- HEADERS/CONTINUATION assembly with HPACK (api/hpack.py),
- DATA with padding handling, gRPC length-prefix reassembly across frames,
- PING reply, RST_STREAM/GOAWAY teardown,
- OUTBOUND flow control (RFC 7540 §5.2/§6.9): the peer's connection and
  per-stream send windows are tracked from its SETTINGS_INITIAL_WINDOW_SIZE
  and WINDOW_UPDATE frames, and DATA sends block/chunk against them — a
  real grpc-go peer starts at ~64 KB windows and must treat over-window
  DATA as FLOW_CONTROL_ERROR, so unbounded sends would kill the connection
  on any large Series/QueryRange response.  Our own large advertised
  window only governs INBOUND data.
- frames chunked to the peer's SETTINGS_MAX_FRAME_SIZE.

HPACK (api/hpack.py) decodes Huffman-coded literals for the printable-
ASCII region of the RFC 7541 Appendix B code — what grpc-go emits by
default for header text — verified against the RFC's Appendix C example
ciphertexts; control/non-ASCII header bytes (19-30 bit codes, unverified
in-sandbox) raise a clean HpackError instead of risking corruption.

Shared by the server (api/grpc_server.py) and the in-repo test client.
"""

from __future__ import annotations

import socket
import struct
import threading
import time

from thanos_parquet_gateway_spark.api.hpack import Decoder, Encoder

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

# frame types (RFC 7540 §6)
DATA, HEADERS, PRIORITY, RST_STREAM, SETTINGS = 0, 1, 2, 3, 4
PUSH_PROMISE, PING, GOAWAY, WINDOW_UPDATE, CONTINUATION = 5, 6, 7, 8, 9

FLAG_END_STREAM = 0x1
FLAG_ACK = 0x1
FLAG_END_HEADERS = 0x4
FLAG_PADDED = 0x8
FLAG_PRIORITY = 0x20

SETTINGS_MAX_FRAME_SIZE = 0x5
SETTINGS_INITIAL_WINDOW_SIZE = 0x4

DEFAULT_MAX_FRAME = 16384
BIG_WINDOW = (1 << 30)
DEFAULT_WINDOW = 65535  # RFC 7540 §6.9.2 initial flow-control window
MAX_WINDOW = (1 << 31) - 1  # §6.9.1 flow-control window ceiling

#: a peer that stops draining entirely (no WINDOW_UPDATE while we hold
#: pending DATA) is broken or gone; fail the send instead of hanging the
#: handler thread forever
FLOW_STALL_TIMEOUT_S = 30.0


class H2Error(Exception):
    pass


def pack_frame(ftype: int, flags: int, stream_id: int,
               payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload))[1:]
            + bytes([ftype, flags]) + struct.pack(">I", stream_id)
            + payload)


class Conn:
    """One HTTP/2 connection (either side).  Reads are pull-based
    (read_frame); writes are locked so response streams can interleave."""

    def __init__(self, sock: socket.socket) -> None:
        self.sock = sock
        self.rbuf = b""
        self.wlock = threading.Lock()
        self.henc = Encoder()
        self.hdec = Decoder()
        self.max_frame = DEFAULT_MAX_FRAME
        self.closed = False
        # peer's receive capacity = our SEND budget (RFC 7540 §5.2.1):
        # grown by its WINDOW_UPDATEs, consumed by our DATA.  Guarded by
        # flow_cond so a blocked sender wakes when the reader thread
        # processes a WINDOW_UPDATE / SETTINGS frame.
        self.flow_cond = threading.Condition()
        self.peer_conn_window = DEFAULT_WINDOW
        self.peer_initial_window = DEFAULT_WINDOW
        self.stream_send_windows: dict[int, int] = {}
        # highest released stream id: a straggler WINDOW_UPDATE for a
        # finished stream must not re-insert (and so leak) its entry
        self._released_watermark = 0

    # ----------------------------------------------------------- raw io
    def _recv_exact(self, n: int) -> bytes:
        while len(self.rbuf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("peer closed")
            self.rbuf += chunk
        out, self.rbuf = self.rbuf[:n], self.rbuf[n:]
        return out

    def send(self, data: bytes) -> None:
        with self.wlock:
            self.sock.sendall(data)

    def read_frame(self) -> tuple[int, int, int, bytes]:
        hdr = self._recv_exact(9)
        length = (hdr[0] << 16) | (hdr[1] << 8) | hdr[2]
        ftype, flags = hdr[3], hdr[4]
        stream_id = struct.unpack(">I", hdr[5:9])[0] & 0x7FFFFFFF
        return ftype, flags, stream_id, self._recv_exact(length)

    # ------------------------------------------------------- handshake
    def send_settings(self) -> None:
        self.send(pack_frame(SETTINGS, 0, 0, struct.pack(
            ">HI", SETTINGS_INITIAL_WINDOW_SIZE, BIG_WINDOW)))
        # connection-level window bump so flow control never stalls us
        self.send(pack_frame(WINDOW_UPDATE, 0, 0,
                             struct.pack(">I", BIG_WINDOW - 65535)))

    def handle_settings(self, flags: int, payload: bytes) -> None:
        if flags & FLAG_ACK:
            return
        for off in range(0, len(payload) - 5, 6):
            ident, value = struct.unpack(">HI", payload[off:off + 6])
            if ident == SETTINGS_MAX_FRAME_SIZE:
                # §6.5.2: legal range is 2^14..2^24-1; outside it is a
                # PROTOCOL_ERROR.  Accepting a tiny/zero value would also
                # break the CONTINUATION chunker (step 0) and the DATA
                # quota loop, so fail loud like the zero-increment case.
                if not 16_384 <= value <= 16_777_215:
                    raise H2Error(f"SETTINGS_MAX_FRAME_SIZE {value} outside "
                                  "2^14..2^24-1 (RFC 7540 §6.5.2)")
                self.max_frame = value
            elif ident == SETTINGS_INITIAL_WINDOW_SIZE:
                # §6.9.2: adjusts every open stream's SEND window by the
                # delta (the connection window is NOT affected)
                with self.flow_cond:
                    delta = value - self.peer_initial_window
                    self.peer_initial_window = value
                    for sid in self.stream_send_windows:
                        self.stream_send_windows[sid] += delta
                    self.flow_cond.notify_all()
        self.send(pack_frame(SETTINGS, FLAG_ACK, 0, b""))

    def handle_window_update(self, stream_id: int, payload: bytes) -> None:
        """Grow the peer's advertised receive capacity (our send budget).

        A zero increment is a protocol error (§6.9) and windows are
        clamped at 2^31-1 (§6.9.1) so a misbehaving peer can't accumulate
        an unbounded budget."""
        if len(payload) < 4:
            return
        incr = struct.unpack(">I", payload[:4])[0] & 0x7FFFFFFF
        if incr == 0:
            raise H2Error("WINDOW_UPDATE with increment 0 (RFC 7540 §6.9)")
        with self.flow_cond:
            if stream_id == 0:
                self.peer_conn_window = min(
                    self.peer_conn_window + incr, MAX_WINDOW)
            elif (stream_id in self.stream_send_windows
                  or stream_id > self._released_watermark):
                # active streams always have an entry (register_stream at
                # open); the watermark guard only screens ids never seen —
                # a straggler for a released stream must not re-insert
                # (and so leak) its entry
                self.stream_send_windows[stream_id] = min(
                    self.stream_send_windows.get(
                        stream_id, self.peer_initial_window) + incr,
                    MAX_WINDOW)
            self.flow_cond.notify_all()

    def register_stream(self, stream_id: int) -> None:
        """Record a stream as open the moment it exists, so its
        WINDOW_UPDATEs count even before the first DATA send (liveness is
        tracked explicitly, not inferred from the released watermark)."""
        with self.flow_cond:
            if stream_id > self._released_watermark or \
                    stream_id in self.stream_send_windows:
                self.stream_send_windows.setdefault(
                    stream_id, self.peer_initial_window)

    def release_stream(self, stream_id: int) -> None:
        with self.flow_cond:
            self.stream_send_windows.pop(stream_id, None)
            self._released_watermark = max(self._released_watermark,
                                           stream_id)

    # --------------------------------------------------------- sending
    def send_headers(self, stream_id: int, headers: list[tuple[str, str]],
                     end_stream: bool = False) -> None:
        es = FLAG_END_STREAM if end_stream else 0
        with self.wlock:
            # encode INSIDE the write lock: the HPACK dynamic table and the
            # on-wire HEADERS order must agree when handler threads
            # interleave responses on one connection
            block = self.henc.encode(headers)
            limit = self.max_frame
            if len(block) <= limit:
                self.sock.sendall(pack_frame(HEADERS, FLAG_END_HEADERS | es,
                                             stream_id, block))
                return
            # RFC 7540 §4.2: a frame above SETTINGS_MAX_FRAME_SIZE is a
            # FRAME_SIZE_ERROR connection error — an oversized block (e.g.
            # a long grpc-status-message) must continue in CONTINUATION
            # frames (§6.10): END_STREAM on the HEADERS frame, END_HEADERS
            # only on the final CONTINUATION, all sent back-to-back under
            # the write lock (§4.3: no interleaving on the connection)
            chunks = [block[i:i + limit]
                      for i in range(0, len(block), limit)]
            out = [pack_frame(HEADERS, es, stream_id, chunks[0])]
            out += [pack_frame(CONTINUATION, 0, stream_id, c)
                    for c in chunks[1:-1]]
            out.append(pack_frame(CONTINUATION, FLAG_END_HEADERS,
                                  stream_id, chunks[-1]))
            self.sock.sendall(b"".join(out))

    def _acquire_send_quota(self, stream_id: int, want: int) -> int:
        """Block until the peer's connection AND stream windows admit at
        least one byte; return the grant (≤ want, ≤ max_frame)."""
        with self.flow_cond:
            deadline = None
            while True:
                sw = self.stream_send_windows.setdefault(
                    stream_id, self.peer_initial_window)
                grant = min(want, self.max_frame, self.peer_conn_window, sw)
                if grant > 0:
                    self.peer_conn_window -= grant
                    self.stream_send_windows[stream_id] = sw - grant
                    return grant
                if self.closed:
                    raise ConnectionError("connection closed during send")
                if deadline is None:
                    deadline = time.monotonic() + FLOW_STALL_TIMEOUT_S
                remaining = deadline - time.monotonic()
                if remaining <= 0 or not self.flow_cond.wait(remaining):
                    raise H2Error(
                        f"flow-control stall: peer window exhausted for "
                        f"{FLOW_STALL_TIMEOUT_S:.0f}s on stream {stream_id}")

    def send_data(self, stream_id: int, data: bytes,
                  end_stream: bool = False) -> None:
        if not data and end_stream:
            self.send(pack_frame(DATA, FLAG_END_STREAM, stream_id, b""))
            return
        off = 0
        while off < len(data):
            grant = self._acquire_send_quota(stream_id, len(data) - off)
            chunk = data[off:off + grant]
            off += len(chunk)
            last = off >= len(data)
            self.send(pack_frame(
                DATA, FLAG_END_STREAM if (last and end_stream) else 0,
                stream_id, chunk))

    def send_goaway(self, last_stream: int = 0, code: int = 0) -> None:
        try:
            self.send(pack_frame(GOAWAY, 0, 0,
                                 struct.pack(">II", last_stream, code)))
        except OSError:
            pass


def grpc_frame(message: bytes) -> bytes:
    """gRPC length-prefixed message (compressed flag always 0)."""
    return b"\x00" + struct.pack(">I", len(message)) + message


def split_grpc_frames(buf: bytes) -> tuple[list[bytes], bytes]:
    """Extract complete length-prefixed messages; return (messages, rest)."""
    out = []
    while len(buf) >= 5:
        if buf[0] != 0:
            raise H2Error("compressed gRPC messages unsupported")
        ln = struct.unpack(">I", buf[1:5])[0]
        if len(buf) < 5 + ln:
            break
        out.append(buf[5:5 + ln])
        buf = buf[5 + ln:]
    return out, buf


class Stream:
    """Server-side per-stream accumulation state."""

    def __init__(self, stream_id: int) -> None:
        self.id = stream_id
        self.headers: list[tuple[str, str]] = []
        self.header_block = b""
        self.headers_done = False
        self.data = b""
        self.ended = False


def strip_padding(flags: int, payload: bytes) -> bytes:
    if flags & FLAG_PADDED:
        pad = payload[0]
        return payload[1:len(payload) - pad]
    return payload


def strip_priority(flags: int, payload: bytes) -> bytes:
    if flags & FLAG_PRIORITY:
        return payload[5:]
    return payload
