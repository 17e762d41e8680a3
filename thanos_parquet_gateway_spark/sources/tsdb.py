"""Prometheus TSDB block reader: native block ingestion (B1 parity).

The reference's converter reads real Prometheus TSDB blocks — index +
chunks + tombstones — through the Prometheus libraries
(reference convert/convert.go:353-396 `tsdb.NewBlockChunkSeriesSet`,
convert/tsdb.go:63-158 `indexRowReader.ReadRows`).  This module is the
from-scratch Spark-first analogue, implementing the PUBLIC on-disk
formats (Prometheus repo, tsdb/docs/format/{index,chunks,tombstones}.md
— the same public-spec discipline as api/chunkenc.py):

- ``index`` v2: TOC → symbol table → all-postings list → series entries
  (label symbol refs + per-chunk (mint, maxt, data ref) metas)
- ``chunks/NNNNNN`` segments: uvarint len + encoding byte + data +
  CRC32C, encodings XOR(1) / histogram(2) / float histogram(3), decoded
  by the golden-byte-tested codecs in api/chunkenc.py
- ``tombstones``: per-series deletion intervals, applied sample-wise
- ``meta.json``: ulid / minTime / maxTime

Scale design (100 TB lens): the index is read ONCE driver-side (the
reference downloads it the same way; it is MBs per block, not data) and
compiled into a small work table of one row per chunk.  Chunk DECODING —
the actual data volume — runs on executors via Arrow-batched
``mapInArrow``: work rows are range-partitioned by (segment, offset) so
each task reads ONE contiguous byte span of one segment (coalesced
sequential I/O, no read amplification), then decodes with the pure-
Python codecs.  File access goes through ``pyarrow.fs`` so the same code
reads ``file:``, ``s3://``, ``gs://``, ``hdfs://`` blocks — the executor-
side equivalent of the reference's bucket client (locate/bucket.go).
"""

from __future__ import annotations

import json
import struct

INDEX_MAGIC = 0xBAAAD700
INDEX_VERSION = 2
CHUNKS_MAGIC = 0x85BD40DD
CHUNKS_VERSION = 1
TOMBSTONES_MAGIC = 0x0130BA30
TOMBSTONES_VERSION = 1

# on-disk chunk encodings (tsdb/chunkenc/chunk.go) — note these differ
# from the storepb wire enums in api/grpc_pb.py (XOR there is 0)
ENC_XOR = 1
ENC_HISTOGRAM = 2
ENC_FLOAT_HISTOGRAM = 3

_STALE_NAN_BITS = 0x7FF0000000000002  # Prometheus staleness marker payload


# --------------------------------------------------------------- CRC32C
def _make_crc32c_table() -> list[int]:
    poly = 0x82F63B78  # Castagnoli, reflected
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_CRC32C_TABLE = _make_crc32c_table()


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    tbl = _CRC32C_TABLE
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


# ------------------------------------------------------- varint helpers
def uvarint(buf: bytes, i: int) -> tuple[int, int]:
    """LEB128 unsigned varint at buf[i:] → (value, next_index)."""
    val = shift = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def varint(buf: bytes, i: int) -> tuple[int, int]:
    """Go binary.Varint: zigzag-encoded signed varint."""
    u, i = uvarint(buf, i)
    return (u >> 1) ^ -(u & 1), i


def put_uvarint(out: bytearray, n: int) -> None:
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)


def put_varint(out: bytearray, n: int) -> None:
    put_uvarint(out, (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1)


# ------------------------------------------------------------ pyarrow fs
def _fs_path(path: str):
    """(pyarrow FileSystem, fs-local path) for a URI or plain path."""
    from pyarrow import fs as pafs
    if path.startswith("file:"):
        path = path[len("file:"):]
        while path.startswith("//"):  # file:///x and file://x → /x
            path = path[1:]
        return pafs.LocalFileSystem(), path
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _read_file(path: str) -> bytes:
    fs, p = _fs_path(path)
    with fs.open_input_stream(p) as f:
        return f.read()


# ------------------------------------------------------------- meta.json
def read_block_meta_json(block_dir: str) -> dict:
    return json.loads(_read_file(f"{block_dir.rstrip('/')}/meta.json"))


# ------------------------------------------------------------ tombstones
def read_tombstones(block_dir: str) -> dict[int, list[tuple[int, int]]]:
    """series ref → closed [mint, maxt] deletion intervals.  A missing
    file means no deletions (Prometheus always writes one, but tolerate
    hand-assembled blocks)."""
    path = f"{block_dir.rstrip('/')}/tombstones"
    fs, p = _fs_path(path)
    from pyarrow import fs as pafs
    if fs.get_file_info(p).type == pafs.FileType.NotFound:
        return {}
    buf = _read_file(path)
    if len(buf) < 5:
        raise ValueError("tombstones file too short")
    magic = struct.unpack_from(">I", buf, 0)[0]
    if magic != TOMBSTONES_MAGIC:
        raise ValueError(f"bad tombstones magic 0x{magic:08x}")
    if buf[4] != TOMBSTONES_VERSION:
        raise ValueError(f"unsupported tombstones version {buf[4]}")
    content, want = buf[5:-4], struct.unpack_from(">I", buf, len(buf) - 4)[0]
    if crc32c(content) != want:
        raise ValueError("tombstones checksum mismatch")
    out: dict[int, list[tuple[int, int]]] = {}
    i = 0
    while i < len(content):
        ref, i = uvarint(content, i)
        mint, i = varint(content, i)
        maxt, i = varint(content, i)
        out.setdefault(ref, []).append((mint, maxt))
    return out


# ------------------------------------------------------------ index file
class IndexReader:
    """Driver-side reader of the TSDB index v2 (format doc:
    tsdb/docs/format/index.md).  The whole file is held in memory — like
    the reference, which downloads the index per block; it is metadata
    (MBs), never samples."""

    def __init__(self, buf: bytes):
        if len(buf) < 5 + 52:
            raise ValueError("index file too short")
        magic = struct.unpack_from(">I", buf, 0)[0]
        if magic != INDEX_MAGIC:
            raise ValueError(f"bad index magic 0x{magic:08x}")
        if buf[4] != INDEX_VERSION:
            raise ValueError(
                f"unsupported index version {buf[4]} (v2 only — v1 blocks "
                "predate Prometheus 2.3 and use offset symbol refs)")
        self._buf = buf
        toc = buf[-52:]
        (self.toc_symbols, self.toc_series, self.toc_label_indices,
         self.toc_label_table, self.toc_postings,
         self.toc_postings_table) = struct.unpack(">6Q", toc[:48])
        if crc32c(toc[:48]) != struct.unpack(">I", toc[48:])[0]:
            raise ValueError("index TOC checksum mismatch")
        self.symbols = self._read_symbols()

    def _section(self, off: int) -> bytes:
        """len(4BE) + content + CRC32C(4BE) → verified content."""
        buf = self._buf
        (ln,) = struct.unpack_from(">I", buf, off)
        content = buf[off + 4:off + 4 + ln]
        (want,) = struct.unpack_from(">I", buf, off + 4 + ln)
        if crc32c(content) != want:
            raise ValueError(f"index section at {off}: checksum mismatch")
        return content

    def _read_symbols(self) -> list[str]:
        content = self._section(self.toc_symbols)
        (count,) = struct.unpack_from(">I", content, 0)
        i, out = 4, []
        for _ in range(count):
            ln, i = uvarint(content, i)
            out.append(content[i:i + ln].decode("utf-8"))
            i += ln
        return out

    def postings_offset_entries(self) -> list[tuple[str, str, int]]:
        """(name, value, absolute offset of the postings list)."""
        content = self._section(self.toc_postings_table)
        (count,) = struct.unpack_from(">I", content, 0)
        i, out = 4, []
        for _ in range(count):
            nkeys, i = uvarint(content, i)
            keys = []
            for _ in range(nkeys):
                ln, i = uvarint(content, i)
                keys.append(content[i:i + ln].decode("utf-8"))
                i += ln
            off, i = uvarint(content, i)
            if len(keys) != 2:
                raise ValueError(f"postings table entry with {nkeys} keys")
            out.append((keys[0], keys[1], off))
        return out

    def postings(self, off: int) -> list[int]:
        content = self._section(off)
        (count,) = struct.unpack_from(">I", content, 0)
        return list(struct.unpack_from(f">{count}I", content, 4))

    def all_postings(self) -> list[int]:
        """Series refs of every series: the special allPostingsKey
        ("", "") entry Prometheus writes into the postings offset table."""
        for name, value, off in self.postings_offset_entries():
            if name == "" and value == "":
                return self.postings(off)
        raise ValueError("index has no all-postings entry")

    def postings_for_matchers(
            self,
            matchers: dict[str, str] | list[tuple[str, str, str]],
    ) -> list[int]:
        """Series refs whose label sets satisfy every matcher — the
        PostingsForMatchers path (Prometheus tsdb/querier.go), resolved
        entirely against the postings offset table + postings lists,
        never by scanning series entries.

        ``matchers`` is either a dict (equality only) or a list of
        ``(name, op, value)`` with ops ``= != =~ !~`` (regex anchored,
        fullmatch — PromQL semantics).  The missing-label rule is
        honored exactly: a matcher its predicate accepts the EMPTY
        string for (``x!="a"``, ``x=~".*"``, ``x=""``) also matches
        series that don't carry the label at all, computed as
        all-postings minus the union of rejected values' lists."""
        import re
        if isinstance(matchers, dict):
            matchers = [(n, "=", v) for n, v in matchers.items()]
        if not matchers:
            return self.all_postings()
        by_name: dict[str, list[tuple[str, int]]] = {}
        for n, v, off in self.postings_offset_entries():
            if n != "":
                by_name.setdefault(n, []).append((v, off))
        result: set[int] | None = None
        for name, op, value in matchers:
            if op == "=":
                pred = lambda v: v == value          # noqa: E731
            elif op == "!=":
                pred = lambda v: v != value          # noqa: E731
            elif op in ("=~", "!~"):
                rx = re.compile(value)
                if op == "=~":
                    pred = lambda v: rx.fullmatch(v) is not None  # noqa: E731
                else:
                    pred = lambda v: rx.fullmatch(v) is None      # noqa: E731
            else:
                raise ValueError(f"unsupported matcher op {op!r}")
            vals = by_name.get(name, [])
            if pred(""):
                # missing label matches too: complement of rejected values
                sat = set(self.all_postings())
                for v, off in vals:
                    if not pred(v):
                        sat.difference_update(self.postings(off))
            else:
                sat = set()
                for v, off in vals:
                    if pred(v):
                        sat.update(self.postings(off))
            result = sat if result is None else (result & sat)
            if not result:
                return []
        return sorted(result)

    def series(self, ref: int) -> tuple[dict[str, str],
                                        list[tuple[int, int, int]]]:
        """Series entry at ref (byte offset = ref*16, index v2) →
        (labels, [(chunk data ref, mint, maxt), ...]).  Unlike the TOC
        sections, series entries carry a UVARINT length prefix."""
        buf = self._buf
        ln, i = uvarint(buf, ref * 16)
        content = buf[i:i + ln]
        (want,) = struct.unpack_from(">I", buf, i + ln)
        if crc32c(content) != want:
            raise ValueError(f"series entry at ref {ref}: checksum mismatch")
        syms = self.symbols
        nlabels, i = uvarint(content, 0)
        labels: dict[str, str] = {}
        for _ in range(nlabels):
            kref, i = uvarint(content, i)
            vref, i = uvarint(content, i)
            labels[syms[kref]] = syms[vref]
        nchunks, i = uvarint(content, i)
        chunks: list[tuple[int, int, int]] = []
        mint = maxt = cref = 0
        for k in range(nchunks):
            if k == 0:
                mint, i = varint(content, i)
                span, i = uvarint(content, i)
                cref, i = uvarint(content, i)
            else:
                dmint, i = varint(content, i)
                mint = maxt + dmint
                span, i = uvarint(content, i)
                dref, i = varint(content, i)
                cref += dref
            maxt = mint + span
            chunks.append((cref, mint, maxt))
        return labels, chunks


def read_index(block_dir: str) -> IndexReader:
    return IndexReader(_read_file(f"{block_dir.rstrip('/')}/index"))


# --------------------------------------------------------- chunk decode
def decode_chunk(enc: int, data: bytes) -> list[tuple[int, object]]:
    """(ts, value-or-hist-dict) samples of one chunk payload.  Stale-NaN
    floats (the reserved 0x7ff0000000000002 payload) map to None — the
    long format's staleness encoding (schema.py)."""
    if enc == ENC_XOR:
        from thanos_parquet_gateway_spark.api.chunkenc import decode_xor_chunk
        out = []
        for t, v in decode_xor_chunk(data):
            bits = struct.unpack(">Q", struct.pack(">d", v))[0]
            out.append((t, None if bits == _STALE_NAN_BITS else v))
        return out
    if enc in (ENC_HISTOGRAM, ENC_FLOAT_HISTOGRAM):
        from thanos_parquet_gateway_spark.api.grpc_pb import (
            CHUNK_FLOAT_HISTOGRAM,
            CHUNK_HISTOGRAM,
            decode_histogram_chunk,
        )
        ctype = (CHUNK_HISTOGRAM if enc == ENC_HISTOGRAM
                 else CHUNK_FLOAT_HISTOGRAM)
        return decode_histogram_chunk(data, ctype)
    raise ValueError(f"unsupported chunk encoding {enc}")


def _parse_chunk_at(buf: bytes, pos: int,
                    verify_crc: bool) -> tuple[int, bytes, int]:
    """Chunk entry at buf[pos:] → (encoding, data, end_pos)."""
    ln, i = uvarint(buf, pos)
    enc = buf[i]
    data = bytes(buf[i + 1:i + 1 + ln])
    end = i + 1 + ln + 4
    if verify_crc:
        (want,) = struct.unpack_from(">I", buf, i + 1 + ln)
        if crc32c(buf[i:i + 1 + ln]) != want:
            raise ValueError(f"chunk at offset {pos}: checksum mismatch")
    return enc, data, end


# ------------------------------------------------------ block discovery
def discover_blocks(src: str) -> list[str]:
    """Block dirs under ``src`` (reference locate/discover.go: a block is
    a ULID dir carrying meta.json).  ``src`` itself being a block counts.
    One directory LIST — driver-side, object-store-safe via pyarrow.fs."""
    from pyarrow import fs as pafs
    fsys, p = _fs_path(src.rstrip("/"))
    if fsys.get_file_info(f"{p}/meta.json").type != pafs.FileType.NotFound:
        return [src.rstrip("/")]
    out = []
    for info in fsys.get_file_info(pafs.FileSelector(p)):
        if info.type == pafs.FileType.Directory and \
                fsys.get_file_info(f"{info.path}/meta.json").type != \
                pafs.FileType.NotFound:
            # keep the caller's scheme/prefix form
            out.append(f"{src.rstrip('/')}/{info.base_name}")
    return sorted(out)


# --------------------------------------------------- block → samples df
def block_chunk_work(block_dir: str, min_ms: int | None = None,
                     max_ms: int | None = None,
                     matchers: dict[str, str] | None = None) -> list[dict]:
    """Driver-side compile: one work row per live chunk —
    {labels, seg (segment file path), offset, mint, maxt, dranges}.
    Tombstoned intervals ride along; fully-deleted chunks are dropped
    here so executors never fetch them (the reference's tombstone-aware
    ChunkSeriesSet does the same), and an optional [min_ms, max_ms) window
    prunes non-overlapping chunks from the index metas — the reference's
    chunk-range pruning, no data touched for skipped chunks.
    ``matchers`` (label equality, e.g. {"__name__": "up"}) select series
    through the postings index — the PostingsForMatchers fast path — so
    a targeted backfill never reads non-matching series entries or
    chunks."""
    block_dir = block_dir.rstrip("/")
    idx = read_index(block_dir)
    stones = read_tombstones(block_dir)
    work: list[dict] = []
    for sref in idx.postings_for_matchers(matchers or {}):
        labels, chunks = idx.series(sref)
        dranges = stones.get(sref, [])
        for cref, mint, maxt in chunks:
            if any(dm <= mint and maxt <= dx for dm, dx in dranges):
                continue  # whole chunk deleted
            if min_ms is not None and maxt < min_ms:
                continue
            if max_ms is not None and mint >= max_ms:
                continue
            seq, off = cref >> 32, cref & 0xFFFFFFFF
            work.append({
                "labels": labels,
                "seg": f"{block_dir}/chunks/{seq + 1:06d}",
                "offset": off, "mint": mint, "maxt": maxt,
                "dranges": [{"mint": dm, "maxt": dx}
                            for dm, dx in dranges] or None,
            })
    return work


_SAMPLES_SCHEMA = ("labels map<string,string>, ts long, value double, "
                   "hist struct<count:double,sum:double,"
                   "buckets:array<struct<le:double,count:double>>,"
                   "schema:int>")


def tsdb_block_samples(spark, block_dir: str,
                       verify_crc: bool = True,
                       min_ms: int | None = None,
                       max_ms: int | None = None,
                       matchers: dict[str, str] | None = None):
    """Ingest one TSDB block as a samples DataFrame
    (labels, ts, value, hist) — the input shape convert_samples and the
    PromQL engine take.  See the module docstring for the distribution
    design; ``verify_crc`` checks every chunk's CRC32C (on by default —
    corruption must fail loudly, same as the reference's chunk reader).

    Decoding runs via ``mapInArrow`` (not mapInPandas): a pandas float64
    column cannot carry NULL and NaN as distinct values, and the format
    needs both — NULL is the staleness marker, NaN is a real sample."""
    import pyarrow as pa

    from pyspark.sql import functions as F

    work = block_chunk_work(block_dir, min_ms, max_ms, matchers)
    if not work:
        return spark.createDataFrame([], _SAMPLES_SCHEMA)
    wdf = spark.createDataFrame(
        [(w["labels"], w["seg"], w["offset"], w["mint"], w["maxt"],
          w["dranges"]) for w in work],
        "labels map<string,string>, seg string, offset long, mint long, "
        "maxt long, dranges array<struct<mint:long,maxt:long>>")
    # contiguous offset bands per task → one coalesced span read each;
    # ~512 chunks (~60k samples, ~2 MB decoded) per task, capped at 4x
    # parallelism so a billion-chunk block still schedules sanely
    npart = max(1, min(-(-len(work) // 512),
                       spark.sparkContext.defaultParallelism * 4))
    wdf = wdf.repartitionByRange(npart, F.col("seg"), F.col("offset"))

    hist_t = pa.struct([
        ("count", pa.float64()), ("sum", pa.float64()),
        ("buckets", pa.list_(pa.struct([("le", pa.float64()),
                                        ("count", pa.float64())]))),
        ("schema", pa.int32())])
    out_t = pa.schema([
        ("labels", pa.map_(pa.string(), pa.string())),
        ("ts", pa.int64()), ("value", pa.float64()), ("hist", hist_t)])

    def decode_batches(batches):
        for batch in batches:
            rows = {"labels": [], "ts": [], "value": [], "hist": []}
            cols = {n: batch.column(n).to_pylist()
                    for n in ("labels", "seg", "offset", "dranges")}
            by_seg: dict[str, list[int]] = {}
            for i, seg in enumerate(cols["seg"]):
                by_seg.setdefault(seg, []).append(i)
            for seg, idxs in by_seg.items():
                idxs.sort(key=lambda i: cols["offset"][i])
                base = cols["offset"][idxs[0]]
                buf = _read_segment_span(seg, base, verify_crc)
                for i in idxs:
                    enc, data, _ = _parse_chunk_at(
                        buf, cols["offset"][i] - base, verify_crc)
                    lab = cols["labels"][i]  # [(k, v), ...] from MapArray
                    dr = cols["dranges"][i]
                    deleted = ([] if dr is None else
                               [(d["mint"], d["maxt"]) for d in dr])
                    for t, v in decode_chunk(enc, data):
                        if any(dm <= t <= dx for dm, dx in deleted):
                            continue
                        rows["labels"].append(lab)
                        rows["ts"].append(t)
                        if isinstance(v, dict):
                            rows["value"].append(float("nan"))
                            rows["hist"].append({
                                "count": v["count"], "sum": v["sum"],
                                "buckets": [{"le": le, "count": c}
                                            for le, c in v["buckets"]],
                                "schema": v.get("schema")})
                        else:
                            rows["value"].append(v)
                            rows["hist"].append(None)
            yield pa.RecordBatch.from_arrays(
                [pa.array(rows["labels"], out_t.field("labels").type),
                 pa.array(rows["ts"], pa.int64()),
                 pa.array(rows["value"], pa.float64()),
                 pa.array(rows["hist"], hist_t)], schema=out_t)

    out = wdf.mapInArrow(decode_batches, _SAMPLES_SCHEMA)
    # chunk pruning keeps boundary-straddling chunks; trim them exactly
    if min_ms is not None:
        out = out.filter(F.col("ts") >= min_ms)
    if max_ms is not None:
        out = out.filter(F.col("ts") < max_ms)
    return out


def _read_segment_span(seg: str, start: int, verify_header: bool) -> bytes:
    """Read segment bytes from ``start`` to EOF in one ranged request.
    Each task's work rows form a contiguous offset band of one segment
    (repartitionByRange above), so tasks collectively read each segment
    about once, sequentially — reading to EOF instead of to the band's
    last chunk costs one over-read per segment tail but avoids a second
    round-trip to learn the final chunk's length."""
    fs, p = _fs_path(seg)
    with fs.open_input_file(p) as f:
        if verify_header:
            hdr = f.read_at(8, 0)
            magic, ver = struct.unpack(">IB", hdr[:5])
            if magic != CHUNKS_MAGIC or ver != CHUNKS_VERSION:
                raise ValueError(f"{seg}: bad chunks segment header")
        size = f.size()
        return f.read_at(size - start, start)


def tsdb_samples(spark, src: str, verify_crc: bool = True,
                 min_ms: int | None = None, max_ms: int | None = None,
                 matchers: dict[str, str] | None = None):
    """Samples from EVERY block under ``src`` (one block dir or a parent
    holding several), unioned — overlapping blocks are legal TSDB state
    and the conversion's dropDuplicates handles the overlap, exactly like
    the reference's vertical merge over multiple source blocks.  Blocks
    whose meta.json window misses [min_ms, max_ms) are skipped without
    opening their index."""
    dfs = []
    for b in discover_blocks(src):
        meta = read_block_meta_json(b)
        if min_ms is not None and meta.get("maxTime", 1 << 62) <= min_ms:
            continue
        if max_ms is not None and meta.get("minTime", 0) >= max_ms:
            continue
        dfs.append(tsdb_block_samples(spark, b, verify_crc, min_ms, max_ms,
                                      matchers))
    if not dfs:
        return spark.createDataFrame([], _SAMPLES_SCHEMA)
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def tsdb_source_days(spark, src: str):
    """Planner source coverage straight from block META files — one tiny
    JSON read per block, NO index or chunk I/O at plan time (the
    reference plans from block metas the same way, convert/plan.go:41-178).
    Returns the (stream, date, mint, maxt) shape convert.planner.plan_days
    consumes."""
    import datetime as _dt
    day_ms = 86_400_000
    rows = []
    for b in discover_blocks(src):
        meta = read_block_meta_json(b)
        mint, maxt = int(meta["minTime"]), int(meta["maxTime"])  # [mint, maxt)
        day = mint - mint % day_ms
        while day < maxt:
            date = _dt.datetime.fromtimestamp(
                day / 1000, tz=_dt.timezone.utc).strftime("%Y-%m-%d")
            rows.append((date, max(mint, day),
                         min(maxt - 1, day + day_ms - 1)))
            day += day_ms
    df = spark.createDataFrame(rows or [], "date string, mint long, maxt long")
    from pyspark.sql import functions as F
    return (df.groupBy("date")
            .agg(F.min("mint").alias("mint"), F.max("maxt").alias("maxt"))
            .withColumn("stream", F.lit("0")))


def convert_tsdb_block(spark, block_dir: str, out_path: str, *,
                       stream: str = "0", **kwargs):
    """End-to-end B1 parity: Prometheus block dir → the partitioned
    samples table (reference convert/convert.go:353-396 feeding the same
    conversion pipeline).  Returns the conversion manifest."""
    from thanos_parquet_gateway_spark.convert.convert import convert_samples
    samples = tsdb_samples(spark, block_dir)
    return convert_samples(samples, out_path, stream=stream, **kwargs)
