"""Prometheus TSDB block WRITER — fixture/interop utility.

Emits a complete, spec-conformant block directory (index v2 + chunks
segment + tombstones + meta.json) from in-memory series, implementing
the same public on-disk formats sources/tsdb.py reads (Prometheus repo,
tsdb/docs/format/*.md).  Purpose: hand-built fixture blocks for the
reader's golden tests and the convert_tsdb_block differential oracle —
the production system never writes TSDB blocks (Prometheus does; the
reference likewise only reads them, convert/convert.go:353-396).

Self-derived-golden caveat (tests/NOTES.md): reader and writer share an
author, so a symmetric misreading of the spec would cancel out.  The
structural invariants a foreign reader would trip on (magics, CRC32C,
16-byte series alignment, sorted symbols/label-sets, zigzag varints)
are pinned by tests/test_tsdb.py against spelled-out byte layouts; full
interop proof (a Prometheus-written block) joins the first networked
round's checklist.
"""

from __future__ import annotations

import json
import struct
from pathlib import Path

from thanos_parquet_gateway_spark.sources.tsdb import (
    CHUNKS_MAGIC,
    CHUNKS_VERSION,
    INDEX_MAGIC,
    INDEX_VERSION,
    TOMBSTONES_MAGIC,
    TOMBSTONES_VERSION,
    crc32c,
    put_uvarint,
    put_varint,
)

_DEFAULT_CHUNK_SAMPLES = 120  # Prometheus head-compaction target


def _chunk_series(samples, max_per_chunk):
    for i in range(0, len(samples), max_per_chunk):
        yield samples[i:i + max_per_chunk]


def write_block(block_dir: str,
                series: list[tuple[dict[str, str], list[tuple[int, float]]]],
                *,
                tombstones: dict[int, list[tuple[int, int]]] | None = None,
                max_per_chunk: int = _DEFAULT_CHUNK_SAMPLES,
                max_segment_bytes: int | None = None,
                ulid: str = "01TESTFIXTUREBLOCK00000000",
                meta_extra: dict | None = None) -> dict:
    """Write a block from ``[(labels, [(ts_ms, value), ...]), ...]``.

    Samples must be ascending per series; series are sorted by label set
    (an index invariant).  ``tombstones`` keys are positions in the
    SORTED series order (0-based) — they are rewritten to the real series
    refs.  ``max_segment_bytes`` cuts additional chunks segment files
    (000002, ...) like Prometheus's 512 MiB segment roll — chunk refs
    then carry the 0-based segment sequence in their upper 32 bits.
    ``meta_extra`` dict-merges into meta.json top-level — e.g.
    ``{"thanos": {"labels": {...}}}`` builds a Thanos-uploaded block
    with external labels (stream-discovery fixtures).
    Returns {"series_refs": [...], "mint": m, "maxt": x}.
    """
    out = Path(block_dir)
    (out / "chunks").mkdir(parents=True, exist_ok=True)
    series = sorted(series, key=lambda s: sorted(s[0].items()))

    # ------------------------------------------------ chunks/000001
    # float series → XOR chunks (enc 1); a series whose sample values are
    # native-histogram dicts (the encode_*_histogram_chunk shape:
    # ts/count/zero_count/sum/schema/zero_threshold/pos/neg) → integer-
    # histogram chunks (enc 2) when the dict carries ``"int": True``
    # (count/zero_count/bucket counts must be ints — the shape Prometheus
    # scrapes produce), else float-histogram chunks (enc 3)
    from thanos_parquet_gateway_spark.api.chunkenc import (
        encode_float_histogram_chunk,
        encode_histogram_chunk_int,
        encode_xor_chunk,
    )
    _SEG_HDR = struct.pack(">IB3x", CHUNKS_MAGIC, CHUNKS_VERSION)
    segments: list[bytearray] = [bytearray(_SEG_HDR)]
    chunk_metas: list[list[tuple[int, int, int]]] = []  # per series
    for _labels, samples in series:
        metas = []
        for chunk in _chunk_series(samples, max_per_chunk):
            if isinstance(chunk[0][1], dict):
                hists = [dict(h, ts=t) for t, h in chunk]
                if chunk[0][1].get("int"):
                    data = encode_histogram_chunk_int(hists)
                    enc = 2  # ENC_HISTOGRAM
                else:
                    data = encode_float_histogram_chunk(hists)
                    enc = 3  # ENC_FLOAT_HISTOGRAM
            else:
                data = encode_xor_chunk(chunk)
                enc = 1  # ENC_XOR
            if (max_segment_bytes is not None
                    and len(segments[-1]) > len(_SEG_HDR)
                    and len(segments[-1]) + len(data) + 16
                        > max_segment_bytes):
                segments.append(bytearray(_SEG_HDR))  # roll the segment
            seg = segments[-1]
            # ref packs (0-based segment sequence << 32) | offset of the
            # length uvarint; file names are 1-based (%06d)
            ref = ((len(segments) - 1) << 32) | len(seg)
            put_uvarint(seg, len(data))
            body_start = len(seg)
            seg.append(enc)
            seg += data
            seg += struct.pack(">I", crc32c(seg[body_start:]))
            metas.append((ref, chunk[0][0], chunk[-1][0]))
        chunk_metas.append(metas)
    for i, seg in enumerate(segments):
        (out / "chunks" / f"{i + 1:06d}").write_bytes(seg)

    # ------------------------------------------------------- index
    buf = bytearray(struct.pack(">IB", INDEX_MAGIC, INDEX_VERSION))

    def _section(content: bytes) -> None:
        buf.extend(struct.pack(">I", len(content)))
        buf.extend(content)
        buf.extend(struct.pack(">I", crc32c(content)))

    # symbol table: sorted unique strings; refs are ordinals
    syms = sorted({s for labels, _ in series
                   for kv in labels.items() for s in kv})
    sym_ref = {s: i for i, s in enumerate(syms)}
    toc_symbols = len(buf)
    content = bytearray(struct.pack(">I", len(syms)))
    for s in syms:
        raw = s.encode("utf-8")
        put_uvarint(content, len(raw))
        content += raw
    _section(bytes(content))

    # series section: 16-byte aligned entries; ref = offset/16
    toc_series = len(buf)
    series_refs: list[int] = []
    for (labels, _samples), metas in zip(series, chunk_metas):
        while len(buf) % 16:
            buf.append(0)
        series_refs.append(len(buf) // 16)
        content = bytearray()
        put_uvarint(content, len(labels))
        for k in sorted(labels):
            put_uvarint(content, sym_ref[k])
            put_uvarint(content, sym_ref[labels[k]])
        put_uvarint(content, len(metas))
        prev_maxt = prev_ref = 0
        for i, (ref, mint, maxt) in enumerate(metas):
            if i == 0:
                put_varint(content, mint)
            else:
                put_varint(content, mint - prev_maxt)
            put_uvarint(content, maxt - mint)
            if i == 0:
                put_uvarint(content, ref)
            else:
                put_varint(content, ref - prev_ref)
            prev_maxt, prev_ref = maxt, ref
        put_uvarint(buf, len(content))
        buf.extend(content)
        buf.extend(struct.pack(">I", crc32c(content)))

    # label indices: not consumed by the reader; empty region + empty
    # offset table keeps the TOC well-formed
    toc_label_indices = len(buf)

    # postings lists: one per (name, value) pair + the all-postings key
    def _postings(refs: list[int]) -> int:
        off = len(buf)
        _section(struct.pack(f">I{len(refs)}I", len(refs), *refs))
        return off

    toc_postings = len(buf)
    table_entries: list[tuple[str, str, int]] = []
    pairs: dict[tuple[str, str], list[int]] = {}
    for (labels, _), sref in zip(series, series_refs):
        for k, v in labels.items():
            pairs.setdefault((k, v), []).append(sref)
    table_entries.append(("", "", _postings(series_refs)))  # allPostingsKey
    for (k, v), refs in sorted(pairs.items()):
        table_entries.append((k, v, _postings(sorted(refs))))

    # label offset table (empty) then postings offset table
    toc_label_table = len(buf)
    _section(struct.pack(">I", 0))
    toc_postings_table = len(buf)
    content = bytearray(struct.pack(">I", len(table_entries)))
    for name, value, off in table_entries:
        put_uvarint(content, 2)
        for s in (name, value):
            raw = s.encode("utf-8")
            put_uvarint(content, len(raw))
            content += raw
        put_uvarint(content, off)
    _section(bytes(content))

    toc = struct.pack(">6Q", toc_symbols, toc_series, toc_label_indices,
                      toc_label_table, toc_postings, toc_postings_table)
    buf.extend(toc)
    buf.extend(struct.pack(">I", crc32c(toc)))
    (out / "index").write_bytes(buf)

    # -------------------------------------------------- tombstones
    content = bytearray()
    for pos, intervals in sorted((tombstones or {}).items()):
        for mint, maxt in intervals:
            put_uvarint(content, series_refs[pos])
            put_varint(content, mint)
            put_varint(content, maxt)
    tomb = bytearray(struct.pack(">IB", TOMBSTONES_MAGIC,
                                 TOMBSTONES_VERSION))
    tomb.extend(content)
    tomb.extend(struct.pack(">I", crc32c(bytes(content))))
    (out / "tombstones").write_bytes(tomb)

    # --------------------------------------------------- meta.json
    all_ts = [t for _, samples in series for t, _ in samples]
    mint, maxt = (min(all_ts), max(all_ts) + 1) if all_ts else (0, 0)
    nchunks = sum(len(m) for m in chunk_metas)
    meta = {"ulid": ulid, "minTime": mint, "maxTime": maxt,
            "stats": {"numSamples": len(all_ts),
                      "numSeries": len(series), "numChunks": nchunks},
            "compaction": {"level": 1, "sources": [ulid]}, "version": 1}
    meta.update(meta_extra or {})
    (out / "meta.json").write_text(json.dumps(meta))
    return {"series_refs": series_refs, "mint": mint, "maxt": maxt}
