"""Minimal HPACK (RFC 7541) header codec for the gRPC wire binding.

Implements the full static table, dynamic-table insertion/eviction/size
updates, prefix-integer / literal-string coding, and Huffman coding for
the FULL RFC 7541 Appendix B alphabet (all 256 byte symbols + EOS) —
enough to decode header blocks from any conformant peer, and to encode
our own blocks (literal-with-incremental-indexing for repeated headers,
never Huffman on encode; RFC 7541 §5.2 makes Huffman optional for
encoders).

The Huffman table could not be fetched from the RFC in this sandbox; it
is reconstructed and then VERIFIED three independent ways, all of which
must hold or the module fails loudly at import:

1. RFC 7541's code is CANONICAL: codes are fully determined by the
   per-symbol bit LENGTHS (sorted by (length, symbol), each code is
   ``(prev + 1) << (len - prev_len)``).  Only ``_HUFFMAN_LENGTHS`` below
   is remembered data; every code is derived, so a wrong code can only
   come from a wrong length.
2. The code must be COMPLETE: the Kraft sum ``Σ 2^(30 - len)`` over all
   257 symbols must equal exactly ``2^30``, and the final (EOS, 30-bit)
   code must be all ones (``0x3fffffff``).  Any single wrong length
   breaks one of these.
3. The derived codes for the printable-ASCII region must bit-match
   ``HUFFMAN_CODES`` below, which is pinned by the RFC's own Appendix C
   example ciphertexts (C.4.1-C.4.3, C.6.1-C.6.3: "www.example.com" →
   f1e3c2e5f23a6ba0ab90f4ff, "no-cache" → a8eb10649cbf, the full Date
   header, "https://www.example.com", "gzip", "private",
   "custom-key"/"custom-value", "302"/"307") in tests/test_grpc.py —
   real RFC-supplied interop vectors, not self-derived ones.

Residual risk: two compensating length errors among symbols outside the
RFC-example subset (control bytes / 0x80-0xFF) would survive checks 1-2;
a networked round should diff ``_HUFFMAN_LENGTHS`` against the RFC text.
Per §5.2 the decoder treats a complete EOS code in the payload and
invalid padding as decoding errors.
"""

from __future__ import annotations


class HpackError(Exception):
    pass


# RFC 7541 Appendix B per-symbol code LENGTHS for all 257 symbols
# (bytes 0..255 + EOS).  This is the only remembered table data — the
# codes themselves are derived canonically below and cross-checked
# against the RFC-ciphertext-pinned printable subset (module docstring).
_HUFFMAN_LENGTHS: tuple[int, ...] = (
    # 0x00-0x1f (control bytes)
    13, 23, 28, 28, 28, 28, 28, 28, 28, 24, 30, 28, 28, 30, 28, 28,
    28, 28, 28, 28, 28, 28, 30, 28, 28, 28, 28, 28, 28, 28, 28, 28,
    # 0x20-0x3f
    6, 10, 10, 12, 13, 6, 8, 11, 10, 10, 8, 11, 8, 6, 6, 6,
    5, 5, 5, 6, 6, 6, 6, 6, 6, 6, 7, 8, 15, 6, 12, 10,
    # 0x40-0x5f
    13, 6, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
    7, 7, 7, 7, 7, 7, 7, 7, 8, 7, 8, 13, 19, 13, 14, 6,
    # 0x60-0x7f
    15, 5, 6, 5, 6, 5, 6, 6, 6, 5, 7, 7, 6, 6, 6, 5,
    6, 7, 6, 5, 5, 6, 7, 7, 7, 7, 7, 15, 11, 14, 13, 28,
    # 0x80-0x9f
    20, 22, 20, 20, 22, 22, 22, 23, 22, 23, 23, 23, 23, 23, 24, 23,
    24, 24, 22, 23, 24, 23, 23, 23, 23, 21, 22, 23, 22, 23, 23, 24,
    # 0xa0-0xbf
    22, 21, 20, 22, 22, 23, 23, 21, 23, 22, 22, 24, 21, 22, 23, 23,
    21, 21, 22, 21, 23, 22, 23, 23, 20, 22, 22, 22, 23, 22, 22, 23,
    # 0xc0-0xdf
    26, 26, 20, 19, 22, 23, 22, 25, 26, 26, 26, 27, 27, 26, 24, 25,
    19, 21, 26, 27, 27, 26, 27, 24, 21, 21, 26, 26, 28, 27, 27, 27,
    # 0xe0-0xff
    20, 24, 20, 21, 22, 21, 21, 23, 22, 22, 25, 25, 24, 24, 26, 23,
    26, 27, 26, 26, 27, 27, 27, 27, 27, 28, 27, 27, 27, 27, 27, 26,
    # 256 = EOS
    30,
)

EOS = 256


def _derive_canonical(lengths: tuple[int, ...]) -> dict[int, tuple[int, int]]:
    """Derive the canonical code for each symbol from its bit length
    (RFC 7541's Appendix B table IS the canonical code over these
    lengths) and verify completeness; fail loudly on any inconsistency."""
    if len(lengths) != 257:
        raise AssertionError("huffman length table must have 257 entries")
    kraft = sum(1 << (30 - ln) for ln in lengths)
    if kraft != 1 << 30:
        raise AssertionError(f"huffman code not complete: kraft={kraft:#x}")
    code = 0
    prev_len = 0
    out: dict[int, tuple[int, int]] = {}
    for sym in sorted(range(257), key=lambda s: (lengths[s], s)):
        ln = lengths[sym]
        if prev_len:
            code = (code + 1) << (ln - prev_len)
        prev_len = ln
        out[sym] = (code, ln)
    if out[EOS] != ((1 << 30) - 1, 30):
        raise AssertionError("huffman EOS code must be 30 one-bits")
    return out


# symbol → (code, bit length), all 257 symbols, canonically derived.
HUFFMAN_FULL: dict[int, tuple[int, int]] = _derive_canonical(_HUFFMAN_LENGTHS)

# RFC 7541 Appendix B Huffman code, printable-ASCII subset (0x20-0x7E):
# symbol → (code, bit length).  Verified against the Appendix C example
# ciphertexts (see module docstring); prefix-freeness is asserted in tests.
HUFFMAN_CODES: dict[int, tuple[int, int]] = {
    32: (0x14, 6), 33: (0x3f8, 10), 34: (0x3f9, 10), 35: (0xffa, 12),
    36: (0x1ff9, 13), 37: (0x15, 6), 38: (0xf8, 8), 39: (0x7fa, 11),
    40: (0x3fa, 10), 41: (0x3fb, 10), 42: (0xf9, 8), 43: (0x7fb, 11),
    44: (0xfa, 8), 45: (0x16, 6), 46: (0x17, 6), 47: (0x18, 6),
    48: (0x0, 5), 49: (0x1, 5), 50: (0x2, 5), 51: (0x19, 6),
    52: (0x1a, 6), 53: (0x1b, 6), 54: (0x1c, 6), 55: (0x1d, 6),
    56: (0x1e, 6), 57: (0x1f, 6), 58: (0x5c, 7), 59: (0xfb, 8),
    60: (0x7ffc, 15), 61: (0x20, 6), 62: (0xffb, 12), 63: (0x3fc, 10),
    64: (0x1ffa, 13), 65: (0x21, 6), 66: (0x5d, 7), 67: (0x5e, 7),
    68: (0x5f, 7), 69: (0x60, 7), 70: (0x61, 7), 71: (0x62, 7),
    72: (0x63, 7), 73: (0x64, 7), 74: (0x65, 7), 75: (0x66, 7),
    76: (0x67, 7), 77: (0x68, 7), 78: (0x69, 7), 79: (0x6a, 7),
    80: (0x6b, 7), 81: (0x6c, 7), 82: (0x6d, 7), 83: (0x6e, 7),
    84: (0x6f, 7), 85: (0x70, 7), 86: (0x71, 7), 87: (0x72, 7),
    88: (0xfc, 8), 89: (0x73, 7), 90: (0xfd, 8), 91: (0x1ffb, 13),
    92: (0x7fff0, 19), 93: (0x1ffc, 13), 94: (0x3ffc, 14), 95: (0x22, 6),
    96: (0x7ffd, 15), 97: (0x3, 5), 98: (0x23, 6), 99: (0x4, 5),
    100: (0x24, 6), 101: (0x5, 5), 102: (0x25, 6), 103: (0x26, 6),
    104: (0x27, 6), 105: (0x6, 5), 106: (0x74, 7), 107: (0x75, 7),
    108: (0x28, 6), 109: (0x29, 6), 110: (0x2a, 6), 111: (0x7, 5),
    112: (0x2b, 6), 113: (0x76, 7), 114: (0x2c, 6), 115: (0x8, 5),
    116: (0x9, 5), 117: (0x2d, 6), 118: (0x77, 7), 119: (0x78, 7),
    120: (0x79, 7), 121: (0x7a, 7), 122: (0x7b, 7), 123: (0x7ffe, 15),
    124: (0x7fc, 11), 125: (0x3ffd, 14), 126: (0x1ffd, 13),
}

# Cross-check 3 (module docstring): the canonically-derived codes must
# bit-match the RFC-example-pinned printable-ASCII subset.
for _sym, _cl in HUFFMAN_CODES.items():
    if HUFFMAN_FULL[_sym] != _cl:
        raise AssertionError(
            f"derived huffman code for {_sym:#x} {HUFFMAN_FULL[_sym]} "
            f"!= RFC-example-pinned {_cl}")

_HUFFMAN_DECODE = {cl: sym for sym, cl in HUFFMAN_FULL.items()}
_HUFFMAN_MAX_BITS = 30


def huffman_encode(data: bytes) -> bytes:
    """Huffman-code a string literal over the full Appendix B alphabet
    (test/interop helper; the Encoder below never Huffman-codes, which
    RFC 7541 §5.2 permits)."""
    bits = n = 0
    for ch in data:
        c, ln = HUFFMAN_FULL[ch]
        bits = (bits << ln) | c
        n += ln
    pad = (8 - n % 8) % 8
    bits = (bits << pad) | ((1 << pad) - 1)  # EOS-prefix padding (§5.2)
    n += pad
    return bits.to_bytes(n // 8, "big") if n else b""


def huffman_decode(data: bytes) -> bytes:
    """Decode a Huffman-coded string literal over the full Appendix B
    alphabet.  Raises on a complete EOS code in the payload and on
    invalid padding (§5.2: trailing bits must be the most-significant
    prefix of EOS, ≤ 7 bits — both MUST be treated as decoding errors)."""
    out = bytearray()
    acc = n = 0
    for byte in data:
        for shift in (7, 6, 5, 4, 3, 2, 1, 0):
            acc = (acc << 1) | ((byte >> shift) & 1)
            n += 1
            sym = _HUFFMAN_DECODE.get((acc, n))
            if sym is not None:
                if sym == EOS:
                    raise HpackError("EOS code in huffman payload")
                out.append(sym)
                acc = n = 0
            elif n > _HUFFMAN_MAX_BITS:
                raise HpackError("invalid huffman code")
    if n >= 8 or acc != (1 << n) - 1:
        raise HpackError("invalid huffman padding")
    return bytes(out)


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
            raw = huffman_decode(raw)
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
