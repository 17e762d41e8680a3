"""Minimal HPACK (RFC 7541) header codec for the gRPC wire binding.

Implements the full static table, dynamic-table insertion/eviction/size
updates, and prefix-integer / literal-string coding — enough to decode
header blocks from a peer that uses incremental indexing, and to encode
our own blocks (literal-with-incremental-indexing for repeated headers,
never Huffman on encode; RFC 7541 §5.2 makes Huffman optional for
encoders).

Huffman-coded string literals (H bit set) are NOT decodable here: the
RFC 7541 Appendix B code table cannot be fetched in this sandbox to be
transcribed verifiably, and a silently-wrong table would corrupt headers.
Decoding raises ``HpackError('huffman-coded literal unsupported')``
instead; the in-repo HTTP/2 client (api/h2.py) never Huffman-encodes, so
served and dialed traffic inside this repo round-trips fully.
"""

from __future__ import annotations


class HpackError(Exception):
    pass


# RFC 7541 Appendix A — the static table, entries 1..61.
STATIC_TABLE: list[tuple[str, str]] = [
    (":authority", ""),
    (":method", "GET"),
    (":method", "POST"),
    (":path", "/"),
    (":path", "/index.html"),
    (":scheme", "http"),
    (":scheme", "https"),
    (":status", "200"),
    (":status", "204"),
    (":status", "206"),
    (":status", "304"),
    (":status", "400"),
    (":status", "404"),
    (":status", "500"),
    ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"),
    ("accept-language", ""),
    ("accept-ranges", ""),
    ("accept", ""),
    ("access-control-allow-origin", ""),
    ("age", ""),
    ("allow", ""),
    ("authorization", ""),
    ("cache-control", ""),
    ("content-disposition", ""),
    ("content-encoding", ""),
    ("content-language", ""),
    ("content-length", ""),
    ("content-location", ""),
    ("content-range", ""),
    ("content-type", ""),
    ("cookie", ""),
    ("date", ""),
    ("etag", ""),
    ("expect", ""),
    ("expires", ""),
    ("from", ""),
    ("host", ""),
    ("if-match", ""),
    ("if-modified-since", ""),
    ("if-none-match", ""),
    ("if-range", ""),
    ("if-unmodified-since", ""),
    ("last-modified", ""),
    ("link", ""),
    ("location", ""),
    ("max-forwards", ""),
    ("proxy-authenticate", ""),
    ("proxy-authorization", ""),
    ("range", ""),
    ("referer", ""),
    ("refresh", ""),
    ("retry-after", ""),
    ("server", ""),
    ("set-cookie", ""),
    ("strict-transport-security", ""),
    ("transfer-encoding", ""),
    ("user-agent", ""),
    ("vary", ""),
    ("via", ""),
    ("www-authenticate", ""),
]

_STATIC_LOOKUP = {e: i + 1 for i, e in enumerate(STATIC_TABLE)}
_STATIC_NAME: dict[str, int] = {}
for _i, (_n, _v) in enumerate(STATIC_TABLE):
    _STATIC_NAME.setdefault(_n, _i + 1)


def _encode_int(value: int, prefix_bits: int, first_byte: int) -> bytes:
    """RFC 7541 §5.1 prefix integer; first_byte carries the pattern bits."""
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytes([first_byte | value])
    out = bytearray([first_byte | limit])
    value -= limit
    while value >= 0x80:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def _decode_int(data: bytes, i: int, prefix_bits: int) -> tuple[int, int]:
    limit = (1 << prefix_bits) - 1
    v = data[i] & limit
    i += 1
    if v < limit:
        return v, i
    shift = 0
    while True:
        if i >= len(data):
            raise HpackError("truncated integer")
        b = data[i]
        i += 1
        v += (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return v, i


class Encoder:
    """Literal encoding with incremental indexing for non-pseudo repeated
    headers; indexed representation when the entry is already present."""

    def __init__(self, max_table_size: int = 4096) -> None:
        self.max_size = max_table_size
        self.table: list[tuple[str, str]] = []  # newest first
        self.size = 0

    def _evict(self) -> None:
        while self.size > self.max_size and self.table:
            n, v = self.table.pop()
            self.size -= len(n) + len(v) + 32

    def _add(self, name: str, value: str) -> None:
        self.table.insert(0, (name, value))
        self.size += len(name) + len(value) + 32
        self._evict()

    def _index_of(self, name: str, value: str) -> int:
        full = _STATIC_LOOKUP.get((name, value))
        if full:
            return full
        for j, e in enumerate(self.table):
            if e == (name, value):
                return len(STATIC_TABLE) + 1 + j
        return 0

    def encode(self, headers: list[tuple[str, str]]) -> bytes:
        out = bytearray()
        for name, value in headers:
            idx = self._index_of(name, value)
            if idx:
                out += _encode_int(idx, 7, 0x80)  # §6.1 indexed
                continue
            nidx = _STATIC_NAME.get(name, 0)
            # §6.2.1 literal with incremental indexing
            out += _encode_int(nidx, 6, 0x40)
            if not nidx:
                nb = name.encode()
                out += _encode_int(len(nb), 7, 0x00) + nb
            vb = value.encode()
            out += _encode_int(len(vb), 7, 0x00) + vb
            self._add(name, value)
        return bytes(out)


class Decoder:
    def __init__(self, max_table_size: int = 4096) -> None:
        self.max_size = max_table_size
        self.table: list[tuple[str, str]] = []
        self.size = 0

    def _evict(self) -> None:
        while self.size > self.max_size and self.table:
            n, v = self.table.pop()
            self.size -= len(n) + len(v) + 32

    def _add(self, name: str, value: str) -> None:
        self.table.insert(0, (name, value))
        self.size += len(name) + len(value) + 32
        self._evict()

    def _entry(self, idx: int) -> tuple[str, str]:
        if idx == 0:
            raise HpackError("index 0")
        if idx <= len(STATIC_TABLE):
            return STATIC_TABLE[idx - 1]
        j = idx - len(STATIC_TABLE) - 1
        if j >= len(self.table):
            raise HpackError(f"index {idx} beyond dynamic table")
        return self.table[j]

    def _string(self, data: bytes, i: int) -> tuple[str, int]:
        huffman = bool(data[i] & 0x80)
        ln, i = _decode_int(data, i, 7)
        if i + ln > len(data):
            raise HpackError("truncated string literal")
        raw = data[i:i + ln]
        if huffman:
            raise HpackError("huffman-coded literal unsupported")
        return raw.decode("utf-8", "surrogateescape"), i + ln

    def decode(self, data: bytes) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        i = 0
        while i < len(data):
            b = data[i]
            if b & 0x80:  # §6.1 indexed
                idx, i = _decode_int(data, i, 7)
                out.append(self._entry(idx))
            elif b & 0x40:  # §6.2.1 literal, incremental indexing
                idx, i = _decode_int(data, i, 6)
                name = self._entry(idx)[0] if idx else None
                if name is None:
                    name, i = self._string(data, i)
                value, i = self._string(data, i)
                out.append((name, value))
                self._add(name, value)
            elif b & 0x20:  # §6.3 dynamic table size update
                sz, i = _decode_int(data, i, 5)
                self.max_size = sz
                self._evict()
            else:  # §6.2.2 / §6.2.3 literal, not indexed / never indexed
                idx, i = _decode_int(data, i, 4)
                name = self._entry(idx)[0] if idx else None
                if name is None:
                    name, i = self._string(data, i)
                value, i = self._string(data, i)
                out.append((name, value))
        return out
