"""Wire-compatible proto3 block sidecars: meta.pb / stream.pb /
deletion-marker.pb.

The reference stores per-(stream, day) block metadata as tiny protobuf
messages beside the parquet files (reference proto/metapb/meta.proto,
proto/streampb/stream.proto; written at convert/convert.go:273-302 and
locate/deletion.go:140-169; discovery unloads marked days at
locate/deletion.go:22-47).  This module hand-encodes the same proto3 wire
format (public spec: varints + tag/length-delimited records) with NO
protobuf dependency, so sidecars written here are byte-compatible with the
reference's readers and vice versa.  Map entries are emitted in sorted key
order and fields in field-number order — a deterministic subset of valid
proto3 serializations.

Message shapes (field numbers from the reference .proto files):
  Metadata  {mint=1 maxt=2 shards=3 columnsForName=4 version=5
             convertedFromBLIDs=6}  with Columns {columns=1}
  DeletionMark {reason=1}
  StreamDescriptor {externalLabels=1}   (map<string,string>)
"""

from __future__ import annotations

# Reference file names (schema/block.go:23-24, locate/deletion.go:22).
# On-disk here they carry a leading underscore so Spark's parquet file
# listing treats them as metadata and skips them (same convention as the
# _manifest/_label_stats sidecar dirs); a sync job exporting a block to a
# reference-served bucket strips the prefix.  The CONTENT is byte-identical.
META_FILE = "_meta.pb"
STREAM_FILE = "_stream.pb"
DELETION_MARKER_FILE = "_deletion-marker.pb"

_WT_VARINT = 0
_WT_LEN = 2


def _uvarint(n: int) -> bytes:
    if n < 0:
        raise ValueError("uvarint: negative")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _varint64(n: int) -> bytes:
    """proto int64: negatives are 64-bit two's complement (10-byte varint)."""
    return _uvarint(n & 0xFFFFFFFFFFFFFFFF)


def _to_i64(n: int) -> int:
    return n - (1 << 64) if n >= (1 << 63) else n


def _tag(field: int, wt: int) -> bytes:
    return _uvarint((field << 3) | wt)


def _ld(field: int, payload: bytes) -> bytes:
    return _tag(field, _WT_LEN) + _uvarint(len(payload)) + payload


def _vi(field: int, n: int) -> bytes:
    """Varint field; proto3 omits default-valued (0) scalar fields."""
    return b"" if n == 0 else _tag(field, _WT_VARINT) + _varint64(n)


def _str_entry(field: int, k: str, v: str) -> bytes:
    return _ld(field, _ld(1, k.encode()) + _ld(2, v.encode()))


def _iter_fields(data: bytes):
    """Generic TLV walk: yields (field, wiretype, int | bytes)."""
    i, n = 0, len(data)

    def uvarint():
        nonlocal i
        shift, val = 0, 0
        while True:
            if i >= n:
                raise ValueError("truncated varint")
            b = data[i]
            i += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val
            shift += 7

    while i < n:
        key = uvarint()
        field, wt = key >> 3, key & 0x7
        if wt == _WT_VARINT:
            yield field, wt, uvarint()
        elif wt == _WT_LEN:
            ln = uvarint()
            if i + ln > n:
                raise ValueError("truncated length-delimited field")
            yield field, wt, data[i:i + ln]
            i += ln
        elif wt == 5:  # fixed32 (not used by these messages, but walkable)
            yield field, wt, data[i:i + 4]
            i += 4
        elif wt == 1:  # fixed64
            yield field, wt, data[i:i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")


# ------------------------------------------------------------- Metadata
def encode_metadata(*, mint: int = 0, maxt: int = 0, shards: int = 0,
                    version: int = 0,
                    columns_for_name: dict[str, list[str]] | None = None,
                    converted_from_blids: list[str] | None = None) -> bytes:
    out = _vi(1, mint) + _vi(2, maxt) + _vi(3, shards)
    for name in sorted(columns_for_name or {}):
        cols = b"".join(_ld(1, c.encode())
                        for c in columns_for_name[name])
        out += _ld(4, _ld(1, name.encode()) + _ld(2, cols))
    out += _vi(5, version)
    for blid in converted_from_blids or []:
        out += _ld(6, blid.encode())
    return out


def decode_metadata(data: bytes) -> dict:
    meta = {"mint": 0, "maxt": 0, "shards": 0, "version": 0,
            "columns_for_name": {}, "converted_from_blids": []}
    for field, wt, val in _iter_fields(data):
        if field == 1 and wt == _WT_VARINT:
            meta["mint"] = _to_i64(val)
        elif field == 2 and wt == _WT_VARINT:
            meta["maxt"] = _to_i64(val)
        elif field == 3 and wt == _WT_VARINT:
            meta["shards"] = _to_i64(val)
        elif field == 5 and wt == _WT_VARINT:
            meta["version"] = _to_i64(val)
        elif field == 6 and wt == _WT_LEN:
            meta["converted_from_blids"].append(val.decode())
        elif field == 4 and wt == _WT_LEN:
            key, cols = "", []
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1 and w2 == _WT_LEN:
                    key = v2.decode()
                elif f2 == 2 and w2 == _WT_LEN:
                    cols.extend(v3.decode() for f3, w3, v3 in _iter_fields(v2)
                                if f3 == 1 and w3 == _WT_LEN)
            meta["columns_for_name"][key] = cols
    return meta


# --------------------------------------------------------- DeletionMark
def encode_deletion_mark(reason: str) -> bytes:
    return _ld(1, reason.encode()) if reason else b""


def decode_deletion_mark(data: bytes) -> dict:
    out = {"reason": ""}
    for field, wt, val in _iter_fields(data):
        if field == 1 and wt == _WT_LEN:
            out["reason"] = val.decode()
    return out


# ----------------------------------------------------- StreamDescriptor
def encode_stream_descriptor(external_labels: dict[str, str]) -> bytes:
    return b"".join(_str_entry(1, k, external_labels[k])
                    for k in sorted(external_labels))


def decode_stream_descriptor(data: bytes) -> dict[str, str]:
    labels: dict[str, str] = {}
    for field, wt, val in _iter_fields(data):
        if field == 1 and wt == _WT_LEN:
            k = v = ""
            for f2, w2, v2 in _iter_fields(val):
                if f2 == 1 and w2 == _WT_LEN:
                    k = v2.decode()
                elif f2 == 2 and w2 == _WT_LEN:
                    v = v2.decode()
            labels[k] = v
    return labels
