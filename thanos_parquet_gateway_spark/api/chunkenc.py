"""Prometheus XOR chunk codec (Gorilla-style float compression).

The reference's Series RPC streams raw XOR-encoded chunk bytes
(reference api/grpc/thanos.go:420-436: ``storepb.Chunk{Type: XOR, Data:
chk.Chunk.Bytes()}``); a Thanos Querier decodes them with Prometheus's
``chunkenc``.  This module implements that public on-disk/on-wire format
(prometheus/tsdb/chunkenc/xor.go; Pelkonen et al., "Gorilla: A Fast,
Scalable, In-Memory Time Series Database", VLDB 2015 §4.1) in pure Python:

    - 2-byte big-endian sample count header
    - sample 0: timestamp as signed varint (encoding/binary PutVarint ==
      zigzag), value as raw 8-byte float bits
    - sample 1: timestamp delta as unsigned varint, value XOR-encoded
    - samples 2+: delta-of-delta timestamp with the 0 / 10+14 / 110+17 /
      1110+20 / 1111+64 bit prefix ladder, value XOR-encoded
    - value XOR: '0' bit if equal to previous; '10' + significant bits if
      the leading/trailing-zero window still fits; '11' + 5-bit leading +
      6-bit length (64 stored as 0) + significant bits otherwise

Used by the gRPC Series binding (api/grpc_server.py) to emit
querier-decodable chunks from the long-format samples the Spark plan
returns.  Encoder and decoder are both here so tests can round-trip; byte
compatibility is fixed by the format, not by shared code.
"""

from __future__ import annotations

import struct


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.nbits = 0  # bits used in the last byte (0 == byte full/none)

    def write_bit(self, bit: int) -> None:
        if self.nbits == 0:
            self.buf.append(0)
            self.nbits = 8
        if bit:
            self.buf[-1] |= 1 << (self.nbits - 1)
        self.nbits -= 1

    def write_bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write_bit((value >> i) & 1)

    def write_byte(self, b: int) -> None:
        self.write_bits(b, 8)


class _BitReader:
    def __init__(self, data: bytes, bitpos: int = 0) -> None:
        self.data = data
        self.pos = bitpos

    def read_bit(self) -> int:
        idx = self.pos >> 3
        if idx >= len(self.data):  # truncated wire payload, not a crash
            raise ValueError("xor chunk truncated: bit reader overran "
                             f"{len(self.data)}-byte payload")
        bit = (self.data[idx] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_byte(self) -> int:
        return self.read_bits(8)

    def read_uvarint(self) -> int:
        shift = val = 0
        while True:
            b = self.read_byte()
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val
            shift += 7

    def read_varint(self) -> int:
        u = self.read_uvarint()
        return (u >> 1) ^ -(u & 1)  # zigzag


def _put_varint(w: _BitWriter, n: int) -> None:
    """encoding/binary PutVarint: zigzag then uvarint."""
    _put_uvarint(w, (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1)


def _put_uvarint(w: _BitWriter, n: int) -> None:
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            w.write_byte(b | 0x80)
        else:
            w.write_byte(b)
            return


def _f2b(v: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", v))[0]


def _b2f(b: int) -> float:
    return struct.unpack("<d", struct.pack("<Q", b))[0]


def _clz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def _ctz64(x: int) -> int:
    return (x & -x).bit_length() - 1 if x else 64


def _bit_range(x: int, nbits: int) -> bool:
    # xor.go bitRange: fits nbits as used by the dod ladder
    return -((1 << (nbits - 1)) - 1) <= x <= (1 << (nbits - 1))


def encode_xor_chunk(samples: list[tuple[int, float]]) -> bytes:
    """Encode (timestamp_ms, value) pairs, ascending by timestamp."""
    if len(samples) > 0xFFFF:
        raise ValueError("XOR chunk holds at most 65535 samples")
    w = _BitWriter()
    w.write_bits(len(samples), 16)  # big-endian uint16 count
    prev_t = prev_td = 0
    prev_v = 0
    leading, trailing = 0xFF, 0  # 0xff == no window yet
    for i, (t, v) in enumerate(samples):
        if i == 0:
            _put_varint(w, t)
            w.write_bits(_f2b(v), 64)
        elif i == 1:
            td = t - prev_t
            if td < 0:
                raise ValueError("timestamps must be ascending")
            _put_uvarint(w, td)
            prev_td = td
            leading, trailing = _write_vdelta(w, prev_v, _f2b(v),
                                              leading, trailing)
        else:
            td = t - prev_t
            if td < 0:
                raise ValueError("timestamps must be ascending")
            dod = td - prev_td
            prev_td = td
            if dod == 0:
                w.write_bit(0)
            elif _bit_range(dod, 14):
                w.write_bits(0b10, 2)
                w.write_bits(dod & 0x3FFF, 14)
            elif _bit_range(dod, 17):
                w.write_bits(0b110, 3)
                w.write_bits(dod & 0x1FFFF, 17)
            elif _bit_range(dod, 20):
                w.write_bits(0b1110, 4)
                w.write_bits(dod & 0xFFFFF, 20)
            else:
                w.write_bits(0b1111, 4)
                w.write_bits(dod & 0xFFFFFFFFFFFFFFFF, 64)
            leading, trailing = _write_vdelta(w, prev_v, _f2b(v),
                                              leading, trailing)
        prev_t = t
        prev_v = _f2b(v)
    return bytes(w.buf)


def _write_vdelta(w: _BitWriter, prev_bits: int, cur_bits: int,
                  leading: int, trailing: int) -> tuple[int, int]:
    xor = prev_bits ^ cur_bits
    if xor == 0:
        w.write_bit(0)
        return leading, trailing
    w.write_bit(1)
    lead = min(_clz64(xor), 31)  # 5-bit field caps leading at 31
    trail = _ctz64(xor)
    if leading != 0xFF and lead >= leading and trail >= trailing:
        w.write_bit(0)
        w.write_bits(xor >> trailing, 64 - leading - trailing)
        return leading, trailing
    w.write_bit(1)
    w.write_bits(lead, 5)
    sigbits = 64 - lead - trail
    w.write_bits(sigbits & 0x3F, 6)  # 64 stored as 0 (sigbits never 0 here)
    w.write_bits(xor >> trail, sigbits)
    return lead, trail


def decode_xor_chunk(data: bytes) -> list[tuple[int, float]]:
    if len(data) < 2:
        raise ValueError(
            f"xor chunk too short: {len(data)} bytes (need >= 2 for the "
            "sample-count header)")
    n = (data[0] << 8) | data[1]
    r = _BitReader(data, 16)
    out: list[tuple[int, float]] = []
    t = td = 0
    vbits = 0
    leading, trailing = 0, 0
    for i in range(n):
        if i == 0:
            t = r.read_varint()
            vbits = r.read_bits(64)
        elif i == 1:
            td = r.read_uvarint()
            t += td
            vbits, leading, trailing = _read_vdelta(r, vbits,
                                                    leading, trailing)
        else:
            ladder = 0
            for _ in range(4):
                if r.read_bit() == 0:
                    break
                ladder += 1
            if ladder == 0:
                dod = 0
            elif ladder == 4:
                raw = r.read_bits(64)
                dod = raw - (1 << 64) if raw >= (1 << 63) else raw
            else:
                sz = {1: 14, 2: 17, 3: 20}[ladder]
                raw = r.read_bits(sz)
                # xor.go readValue: value 1<<(sz-1) means "stay positive
                # max"; values above are negative (two's complement in sz
                # bits), matching bitRange's asymmetric bounds
                dod = raw if raw <= (1 << (sz - 1)) else raw - (1 << sz)
            td += dod
            t += td
            vbits, leading, trailing = _read_vdelta(r, vbits,
                                                    leading, trailing)
        out.append((t, _b2f(vbits)))
    return out


def _read_vdelta(r: _BitReader, prev_bits: int, leading: int,
                 trailing: int) -> tuple[int, int, int]:
    if r.read_bit() == 0:
        return prev_bits, leading, trailing
    if r.read_bit() == 1:
        leading = r.read_bits(5)
        sigbits = r.read_bits(6) or 64
        trailing = 64 - leading - sigbits
    sigbits = 64 - leading - trailing
    xor = r.read_bits(sigbits) << trailing
    return prev_bits ^ xor, leading, trailing
