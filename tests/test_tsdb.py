"""Prometheus TSDB block reader (sources/tsdb.py) against hand-built
fixture blocks (sources/tsdb_writer.py) — B1 parity (the reference reads
blocks via tsdb.NewBlockChunkSeriesSet, convert/convert.go:353-396).

Structural byte-layout invariants are asserted directly against the
public format docs (tsdb/docs/format/*.md) so a symmetric reader/writer
misreading can't hide behind roundtrip symmetry for: magics, versions,
TOC placement, CRC32C values, 16-byte series alignment, symbol table
ordering, and zigzag varints.  Full foreign-interop (a Prometheus-
written block) is on the networked-round checklist (tests/NOTES.md).
"""

from __future__ import annotations

import struct

import pytest

from thanos_parquet_gateway_spark.sources import tsdb
from thanos_parquet_gateway_spark.sources.tsdb_writer import write_block


def _mkseries():
    return [
        ({"__name__": "up", "job": "a"},
         [(1000 * i, float(i)) for i in range(300)]),
        ({"__name__": "up", "job": "b"},
         [(1000 * i, 2.5 * i) for i in range(5)]),
        ({"__name__": "http_reqs", "job": "a", "code": "200"},
         [(500 + 250 * i, float(i * i)) for i in range(130)]),
    ]


@pytest.fixture()
def block(tmp_path):
    d = str(tmp_path / "block")
    info = write_block(d, _mkseries())
    return d, info


# ------------------------------------------------------------ low level
def test_varint_encodings():
    """Golden byte values straight from the LEB128 / zigzag definitions."""
    out = bytearray()
    tsdb.put_uvarint(out, 300)
    assert bytes(out) == b"\xac\x02"
    assert tsdb.uvarint(bytes(out), 0) == (300, 2)
    out = bytearray()
    tsdb.put_varint(out, -3)  # zigzag(-3) = 5
    assert bytes(out) == b"\x05"
    assert tsdb.varint(b"\x05", 0) == (-3, 1)
    out = bytearray()
    tsdb.put_varint(out, 3)  # zigzag(3) = 6
    assert bytes(out) == b"\x06"


def test_crc32c_known_vector():
    # RFC 3720 B.4: CRC32C of 32 zero bytes
    assert tsdb.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert tsdb.crc32c(b"123456789") == 0xE3069283  # classic check value


def test_on_disk_structure(block):
    """Magics/versions/TOC per the public format docs."""
    d, info = block
    idx_bytes = open(f"{d}/index", "rb").read()
    assert struct.unpack_from(">I", idx_bytes, 0)[0] == 0xBAAAD700
    assert idx_bytes[4] == 2
    toc = idx_bytes[-52:]
    assert tsdb.crc32c(toc[:48]) == struct.unpack(">I", toc[48:])[0]
    seg = open(f"{d}/chunks/000001", "rb").read()
    assert struct.unpack_from(">I", seg, 0)[0] == 0x85BD40DD
    assert seg[4] == 1 and seg[5:8] == b"\x00\x00\x00"
    tomb = open(f"{d}/tombstones", "rb").read()
    assert struct.unpack_from(">I", tomb, 0)[0] == 0x0130BA30
    assert tomb[4] == 1
    # series refs point at 16-byte-aligned entries (ref = offset/16)
    idx = tsdb.read_index(d)
    assert idx.all_postings() == sorted(info["series_refs"])
    # symbols sorted lexicographically, refs = ordinals
    assert idx.symbols == sorted(idx.symbols)
    assert set(idx.symbols) == {"__name__", "up", "http_reqs", "job", "a",
                                "b", "code", "200"}


def test_index_series_entries(block):
    d, _ = block
    idx = tsdb.read_index(d)
    got = {}
    for r in idx.all_postings():
        labels, chunks = idx.series(r)
        got[tuple(sorted(labels.items()))] = chunks
    want_sets = {tuple(sorted(ls.items())) for ls, _ in _mkseries()}
    assert set(got) == want_sets
    # chunk metas: 300 samples at 120/chunk -> 3 chunks with exact bounds
    up_a = got[(("__name__", "up"), ("job", "a"))]
    assert len(up_a) == 3
    assert up_a[0][1:] == (0, 119_000)
    assert up_a[1][1:] == (120_000, 239_000)
    assert up_a[2][1:] == (240_000, 299_000)
    # per-(name,value) postings exist alongside the all-postings key
    entries = dict(((n, v), off)
                   for n, v, off in idx.postings_offset_entries())
    assert ("", "") in entries and ("job", "a") in entries
    job_a = idx.postings(entries[("job", "a")])
    assert len(job_a) == 2 and job_a == sorted(job_a)


def test_checksums_fail_loudly(block, tmp_path):
    d, info = block
    # corrupt one byte inside the first chunk's data
    seg_path = f"{d}/chunks/000001"
    seg = bytearray(open(seg_path, "rb").read())
    seg[12] ^= 0xFF
    open(seg_path, "wb").write(seg)
    work = tsdb.block_chunk_work(d)
    first = min(work, key=lambda w: w["offset"])
    buf = open(seg_path, "rb").read()
    with pytest.raises(ValueError, match="checksum"):
        tsdb._parse_chunk_at(buf, first["offset"], verify_crc=True)
    # corrupt the index TOC
    idx_path = f"{d}/index"
    idx = bytearray(open(idx_path, "rb").read())
    idx[-10] ^= 0xFF
    open(idx_path, "wb").write(idx)
    with pytest.raises(ValueError, match="TOC checksum"):
        tsdb.read_index(d)


def test_unsupported_versions_fail_loudly(tmp_path):
    d = tmp_path / "b"
    d.mkdir()
    (d / "index").write_bytes(
        struct.pack(">IB", 0xBAAAD700, 1) + b"\x00" * 60)
    with pytest.raises(ValueError, match="version 1"):
        tsdb.read_index(str(d))
    (d / "index").write_bytes(struct.pack(">I", 0xDEAD) + b"\x00" * 60)
    with pytest.raises(ValueError, match="magic"):
        tsdb.read_index(str(d))


# --------------------------------------------------------------- reading
def test_block_roundtrip_exact(spark, block):
    d, _ = block
    rows = tsdb.tsdb_block_samples(spark, d).collect()
    got = sorted((tuple(sorted(dict(r["labels"]).items())),
                  r["ts"], r["value"]) for r in rows)
    want = sorted((tuple(sorted(ls.items())), t, v)
                  for ls, ss in _mkseries() for t, v in ss)
    assert got == want  # bit-exact XOR roundtrip, no row lost or invented


def test_tombstones_applied(spark, tmp_path):
    d = str(tmp_path / "block")
    # sorted series order: http_reqs.., up/a, up/b -> up/b is position 2
    write_block(d, _mkseries(),
                tombstones={2: [(1000, 2000)],        # partial intervals
                            0: [(0, 10_000_000)]})    # whole series
    assert tsdb.read_tombstones(d)  # parse side
    # whole-chunk-deleted work rows never reach executors
    work = tsdb.block_chunk_work(d)
    assert all(dict(w["labels"])["__name__"] != "http_reqs" for w in work)
    rows = tsdb.tsdb_block_samples(spark, d).collect()
    got = {(dict(r["labels"])["job"], r["ts"]) for r in rows}
    assert ("b", 1000) not in got and ("b", 2000) not in got
    assert ("b", 0) in got and ("b", 3000) in got
    assert not any(j == "a" and dict == "http_reqs" for j, _ in got)
    assert len(rows) == 300 + (5 - 2)  # up/a intact, up/b minus 2, no http


def test_stale_nan_maps_to_null(spark, tmp_path):
    """Prometheus staleness markers (NaN payload 0x7ff0000000000002)
    become value IS NULL — the long format's staleness encoding
    (schema.py); ordinary NaNs stay NaN."""
    stale = struct.unpack(">d", struct.pack(">Q", 0x7FF0000000000002))[0]
    d = str(tmp_path / "block")
    write_block(d, [({"__name__": "m"},
                     [(0, 1.0), (1000, stale), (2000, float("nan")),
                      (3000, 2.0)])])
    rows = {r["ts"]: r["value"]
            for r in tsdb.tsdb_block_samples(spark, d).collect()}
    assert rows[0] == 1.0 and rows[3000] == 2.0
    assert rows[1000] is None
    import math
    assert math.isnan(rows[2000])


def test_histogram_chunks_decode(spark, tmp_path):
    """Float-histogram chunks (enc 3) surface as engine-model hist
    structs (count/sum/le-buckets/schema), same mapping the gRPC Series
    path uses."""
    h = [{"count": 4.0 + i, "zero_count": 1.0, "sum": 10.0 + i,
          "schema": 0, "zero_threshold": 0.0,
          "pos": [(1, 2.0 + i), (2, 1.0)], "neg": []}
         for i in range(3)]
    d = str(tmp_path / "block")
    write_block(d, [({"__name__": "hm"},
                     [(1000 * (i + 1), hi) for i, hi in enumerate(h)])])
    rows = sorted(tsdb.tsdb_block_samples(spark, d).collect(),
                  key=lambda r: r["ts"])
    assert len(rows) == 3
    for i, r in enumerate(rows):
        assert r["hist"] is not None
        assert r["hist"]["count"] == 4.0 + i
        assert r["hist"]["sum"] == 10.0 + i
        assert r["hist"]["schema"] == 0
        les = {b["le"]: b["count"] for b in r["hist"]["buckets"]}
        # schema 0 -> base 2: pos idx 1 covers (1,2], idx 2 covers (2,4]
        assert les[0.0] == 1.0 and les[2.0] == 2.0 + i and les[4.0] == 1.0


def test_empty_block(spark, tmp_path):
    d = str(tmp_path / "block")
    write_block(d, [])
    assert tsdb.tsdb_block_samples(spark, d).count() == 0


def test_meta_json(block):
    d, _ = block
    meta = tsdb.read_block_meta_json(d)
    assert meta["version"] == 1
    assert meta["minTime"] == 0 and meta["maxTime"] == 299_001
    assert meta["stats"]["numSeries"] == 3
    assert meta["stats"]["numSamples"] == 435


# ------------------------------------------------------------ end-to-end
def test_convert_tsdb_block_e2e(spark, tmp_path):
    """Block dir → partitioned samples table → PromQL query: the full B1
    path the reference runs (convert/convert.go:353-396 feeding the same
    conversion pipeline)."""
    from thanos_parquet_gateway_spark.promql import PromQLEngine

    day = 1704067200000  # 2024-01-01
    d = str(tmp_path / "block")
    write_block(d, [
        ({"__name__": "up", "job": "a"},
         [(day + 60_000 * i, float(i)) for i in range(100)]),
        ({"__name__": "up", "job": "b"},
         [(day + 90_000_000 + 60_000 * i, 10.0 * i) for i in range(50)]),
    ])
    out = str(tmp_path / "table")
    manifest = tsdb.convert_tsdb_block(spark, d, out)
    got = {(r["stream"], r["date"]): r["n_samples"]
           for r in manifest.collect()}
    assert got == {("0", "2024-01-01"): 100, ("0", "2024-01-02"): 50}
    conv = spark.read.parquet(out)
    eng = PromQLEngine(conv, lookback_ms=600_000, deterministic=True)
    res = eng.query_instant("sum by (job) (up)", day + 10 * 60_000)
    vals = {dict(r["labels"])["job"]: r["value"] for r in res.df.collect()}
    assert vals == {"a": 10.0}  # job=b starts the next day


# -------------------------------------------- discovery / planning / CLI
def test_discover_blocks_and_multi_block_union(spark, tmp_path):
    root = tmp_path / "blocks"
    day = 1704067200000
    write_block(str(root / "01BLOCKA"),
                [({"__name__": "m", "job": "a"},
                  [(day + 1000 * i, float(i)) for i in range(10)])])
    write_block(str(root / "01BLOCKB"),
                [({"__name__": "m", "job": "b"},
                  [(day + 1000 * i, 2.0 * i) for i in range(10)])])
    (root / "not_a_block").mkdir()
    found = tsdb.discover_blocks(str(root))
    assert [b.rsplit("/", 1)[1] for b in found] == ["01BLOCKA", "01BLOCKB"]
    # src itself being a block
    assert tsdb.discover_blocks(str(root / "01BLOCKA")) == \
        [str(root / "01BLOCKA")]
    rows = tsdb.tsdb_samples(spark, str(root)).collect()
    assert len(rows) == 20
    assert {dict(r["labels"])["job"] for r in rows} == {"a", "b"}


def test_chunk_range_pruning(spark, tmp_path):
    """[min_ms, max_ms) prunes chunks at the index metas (no data read)
    and trims boundary chunks exactly."""
    d = str(tmp_path / "block")
    # 300 samples @1s -> 3 chunks: [0,119s], [120s,239s], [240s,299s]
    write_block(d, [({"__name__": "m"},
                     [(1000 * i, float(i)) for i in range(300)])])
    all_work = tsdb.block_chunk_work(d)
    assert len(all_work) == 3
    pruned = tsdb.block_chunk_work(d, min_ms=130_000, max_ms=200_000)
    assert len(pruned) == 1 and pruned[0]["mint"] == 120_000
    rows = tsdb.tsdb_block_samples(
        spark, d, min_ms=130_000, max_ms=200_000).collect()
    assert sorted(r["ts"] for r in rows) == \
        [1000 * i for i in range(130, 200)]
    # block-level skip: meta window disjoint from the request
    assert tsdb.tsdb_samples(spark, d, min_ms=10**12).count() == 0


def test_tsdb_source_days(spark, tmp_path):
    """Planner coverage straight from meta.json — day rows with clipped
    bounds, consumable by convert.planner.plan_days."""
    from thanos_parquet_gateway_spark.convert.planner import plan_days

    day = 1704067200000  # 2024-01-01
    d = str(tmp_path / "blocks" / "01B")
    # samples span 1.5 days
    write_block(d, [({"__name__": "m"},
                     [(day + 60_000 * i, float(i)) for i in range(2160)])])
    src = tsdb.tsdb_source_days(spark, str(tmp_path / "blocks"))
    got = {r["date"]: (r["mint"], r["maxt"]) for r in src.collect()}
    assert set(got) == {"2024-01-01", "2024-01-02"}
    assert got["2024-01-01"] == (day, day + 86_400_000 - 1)
    # maxTime in meta is exclusive: maxt clips to last covered ms
    assert got["2024-01-02"][0] == day + 86_400_000
    # plan_days consumes it: day 2 is partial -> dropped as newest
    plan = plan_days(src, None)
    assert [r["date"] for r in plan.collect()] == ["2024-01-01"]


def test_cli_convert_tsdb_source(spark, tmp_path):
    """`convert --src-format tsdb` ingests a block dir end-to-end: plans
    from metas, decodes only planned days, and the converted table
    answers PromQL like the block contents."""
    from thanos_parquet_gateway_spark.cli import main
    from thanos_parquet_gateway_spark.promql import PromQLEngine

    day = 1704067200000
    blocks = tmp_path / "blocks"
    # two full days + a partial third (planner drops the partial newest)
    write_block(str(blocks / "01B"), [
        ({"__name__": "up", "job": "a"},
         [(day + 60_000 * i, float(i)) for i in range(2 * 1440 + 10)]),
    ])
    dst = str(tmp_path / "conv")
    assert main(["convert", "--src", str(blocks), "--src-format", "tsdb",
                 "--dst", dst]) == 0
    import glob as _glob
    days = sorted(p.split("date=")[-1]
                  for p in _glob.glob(f"{dst}/stream=0/date=*"))
    assert days == ["2024-01-01", "2024-01-02"]
    eng = PromQLEngine(spark.read.parquet(dst), lookback_ms=600_000,
                       deterministic=True)
    res = eng.query_instant("up", day + 100 * 60_000).df.collect()
    assert len(res) == 1 and res[0]["value"] == 100.0


def test_multi_segment_chunk_refs(spark, tmp_path):
    """Chunk refs pack (segment sequence << 32) | offset; segment files
    are 1-based (000001...) while the sequence is 0-based — the exact
    mapping tsdb/chunks.go uses.  A tiny max_segment_bytes forces several
    segments and the reader must follow refs across all of them."""
    d = str(tmp_path / "block")
    series = [({"__name__": "m", "i": str(i)},
               [(1000 * j, float(i * 1000 + j)) for j in range(150)])
              for i in range(4)]
    write_block(d, series, max_segment_bytes=400)
    import glob as _glob
    segs = sorted(_glob.glob(f"{d}/chunks/*"))
    assert len(segs) >= 3
    assert [s.rsplit("/", 1)[1] for s in segs][:2] == ["000001", "000002"]
    # index refs actually point into later segments
    work = tsdb.block_chunk_work(d)
    assert {w["seg"].rsplit("/", 1)[1] for w in work} == \
        {s.rsplit("/", 1)[1] for s in segs}
    rows = tsdb.tsdb_block_samples(spark, d).collect()
    got = sorted((dict(r["labels"])["i"], r["ts"], r["value"]) for r in rows)
    want = sorted((ls["i"], t, v) for ls, ss in series for t, v in ss)
    assert got == want


# ------------------------------------------------------------- fuzz
def _decode_block_driver_side(d: str) -> list[tuple[tuple, int, object]]:
    """Pure-Python decode of every live sample in a block (no Spark):
    the same parse path tsdb_block_samples ships to executors."""
    out = []
    bufs: dict[str, bytes] = {}
    for w in tsdb.block_chunk_work(d):
        if w["seg"] not in bufs:
            bufs[w["seg"]] = open(w["seg"], "rb").read()
        enc, data, _ = tsdb._parse_chunk_at(
            bufs[w["seg"]], w["offset"], verify_crc=True)
        deleted = [(x["mint"], x["maxt"]) for x in (w["dranges"] or [])]
        for t, v in tsdb.decode_chunk(enc, data):
            if any(dm <= t <= dx for dm, dx in deleted):
                continue
            out.append((tuple(sorted(w["labels"].items())), t, v))
    return out


def test_tsdb_roundtrip_fuzz(tmp_path):
    """Property fuzz over the whole writer→reader path: random unicode
    label sets, adversarial float values (NaN / ±Inf / -0.0 / stale-NaN /
    subnormals), random chunking and segment rolling, random tombstone
    intervals — decoded samples must equal the input minus tombstoned
    rows, with stale-NaN mapped to None and ordinary NaN preserved."""
    import math
    import shutil

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    stale = struct.unpack(">d", struct.pack(">Q", 0x7FF0000000000002))[0]
    label_str = st.text(
        alphabet=st.characters(codec="utf-8",
                               blacklist_categories=("Cs",)),
        min_size=1, max_size=8)
    values = st.one_of(
        st.floats(allow_nan=False, width=64),
        st.sampled_from([float("nan"), float("inf"), float("-inf"),
                         -0.0, 5e-324, stale]))

    @st.composite
    def blocks(draw):
        n_series = draw(st.integers(1, 5))
        used = set()
        series = []
        for i in range(n_series):
            labels = draw(st.dictionaries(label_str, label_str,
                                          min_size=1, max_size=3))
            labels["__name__"] = draw(label_str)
            key = tuple(sorted(labels.items()))
            if key in used:
                continue
            used.add(key)
            ts = sorted(draw(st.sets(st.integers(0, 10_000_000),
                                     min_size=1, max_size=60)))
            series.append((labels, [(t, draw(values)) for t in ts]))
        stones = {}
        for pos in range(len(series)):
            if draw(st.booleans()):
                a = draw(st.integers(0, 10_000_000))
                b = draw(st.integers(0, 10_000_000))
                stones[pos] = [(min(a, b), max(a, b))]
        return (series, stones, draw(st.integers(1, 25)),
                draw(st.sampled_from([None, 300, 4096])))

    import os
    n_examples = int(os.environ.get("FUZZ_N_TSDB", "60"))

    @settings(max_examples=n_examples, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(blocks())
    def check(case):
        series, stones, per_chunk, seg_bytes = case
        d = str(tmp_path / "fuzz_block")
        shutil.rmtree(d, ignore_errors=True)
        write_block(d, series, tombstones=stones,
                    max_per_chunk=per_chunk, max_segment_bytes=seg_bytes)
        got = sorted(_decode_block_driver_side(d),
                     key=lambda r: (r[0], r[1]))
        series_sorted = sorted(series, key=lambda s: sorted(s[0].items()))
        want = []
        for pos, (labels, samples) in enumerate(series_sorted):
            dels = stones.get(pos, [])
            for t, v in samples:
                if any(dm <= t <= dx for dm, dx in dels):
                    continue
                if struct.unpack(">Q", struct.pack(">d", v))[0] \
                        == 0x7FF0000000000002:
                    v = None
                want.append((tuple(sorted(labels.items())), t, v))
        want.sort(key=lambda r: (r[0], r[1]))
        assert len(got) == len(want)
        for (gl, gt, gv), (wl, wt, wv) in zip(got, want):
            assert gl == wl and gt == wt
            if wv is None:
                assert gv is None
            elif isinstance(wv, float) and math.isnan(wv):
                assert math.isnan(gv)
            else:
                # bit-exact XOR roundtrip, ±0.0 and subnormals included
                assert struct.pack(">d", gv) == struct.pack(">d", wv)

    check()


def test_postings_for_matchers_selective_read(spark, block, tmp_path):
    """Equality matchers select series through the postings index
    (Prometheus PostingsForMatchers): non-matching series entries and
    chunks are never compiled into work rows — the targeted-backfill
    fast path."""
    d, _ = block
    idx = tsdb.read_index(d)
    all_refs = idx.all_postings()
    # single matcher
    up = idx.postings_for_matchers({"__name__": "up"})
    assert len(up) == 2 and set(up) < set(all_refs)
    # intersection of two matchers
    up_a = idx.postings_for_matchers({"__name__": "up", "job": "a"})
    assert len(up_a) == 1
    labels, _chunks = idx.series(up_a[0])
    assert labels == {"__name__": "up", "job": "a"}
    # absent (name, value) -> empty, no series scan
    assert idx.postings_for_matchers({"job": "nope"}) == []
    assert idx.postings_for_matchers({}) == all_refs
    # work compile honors matchers: only the selected series' chunks
    work = tsdb.block_chunk_work(d, matchers={"__name__": "up"})
    assert work and all(
        dict(w["labels"])["__name__"] == "up" for w in work)
    # end-to-end selective decode, composed with a time window
    rows = tsdb.tsdb_block_samples(
        spark, d, matchers={"__name__": "up", "job": "a"},
        min_ms=100_000, max_ms=200_000).collect()
    assert sorted(r["ts"] for r in rows) == \
        [1000 * i for i in range(100, 200)]
    assert {dict(r["labels"])["job"] for r in rows} == {"a"}


def test_postings_for_matchers_full_surface(block):
    """Regex / negative matchers with PromQL's missing-label rule: a
    matcher whose predicate accepts "" also matches series that don't
    carry the label at all — resolved purely from the postings tables."""
    d, _ = block
    idx = tsdb.read_index(d)
    def names(refs):
        out = set()
        for r in refs:
            labels, _ = idx.series(r)
            out.add((labels["__name__"], labels.get("job", ""),
                     labels.get("code", "")))
        return out

    # regex positive (anchored fullmatch: "up" must not match "upx")
    assert names(idx.postings_for_matchers([("__name__", "=~", "u.")])) == \
        {("up", "a", ""), ("up", "b", "")}
    assert idx.postings_for_matchers([("__name__", "=~", "u")]) == []
    # != : series MISSING the label match too (code!="404" includes the
    # two up series, which have no code label)
    got = names(idx.postings_for_matchers([("code", "!=", "404")]))
    assert got == {("up", "a", ""), ("up", "b", ""),
                   ("http_reqs", "a", "200")}
    # != with a present value excludes exactly it
    got = names(idx.postings_for_matchers([("code", "!=", "200")]))
    assert got == {("up", "a", ""), ("up", "b", "")}
    # =~ matching empty ≡ "label absent or matching"
    got = names(idx.postings_for_matchers([("code", "=~", "2.*|")]))
    assert got == {("up", "a", ""), ("up", "b", ""),
                   ("http_reqs", "a", "200")}
    # !~ rejects matching values, keeps absent
    got = names(idx.postings_for_matchers([("code", "!~", "2.*")]))
    assert got == {("up", "a", ""), ("up", "b", "")}
    # combination: equality + negative regex
    got = names(idx.postings_for_matchers(
        [("__name__", "=", "up"), ("job", "!~", "b")]))
    assert got == {("up", "a", "")}
    # presence matcher: x!="" ≡ label must exist non-empty
    got = names(idx.postings_for_matchers([("code", "!=", "")]))
    assert got == {("http_reqs", "a", "200")}
    with pytest.raises(ValueError, match="unsupported matcher op"):
        idx.postings_for_matchers([("job", "~", "a")])


# --------------------------------------------------- xxh64 / stream keys
def test_xxh64_spec_vectors_and_spark_differential(spark):
    """Pure-Python XXH64 against the spec's published vectors, then
    differentially against Spark's JVM xxhash64 (which is XXH64 with
    seed 42 over the raw UTF-8 bytes for a string column) — an
    independent implementation, so a shared misreading is impossible."""
    # xxhash_spec.md test vector (seed 0); seeded behavior is pinned by
    # the Spark differential below ("" and every case run at seed 42)
    assert tsdb.xxh64(b"") == 0xEF46DB3751D8E999
    import random

    from pyspark.sql import functions as F
    rng = random.Random(7)
    cases = ["", "a", "abc", "0123456789abcdef0123456789abcdef!", "é中文"]
    cases += ["".join(rng.choice("abcdefXYZ 01é") for _ in range(rng.randrange(0, 100)))
              for _ in range(40)]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {r["s"]: r["h"]
           for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for c in cases:
        want = tsdb.xxh64(c.encode("utf-8"), seed=42)
        # Spark returns a signed long
        assert got[c] & ((1 << 64) - 1) == want, c


def test_external_labels_hash_keying():
    """Reference schema/block.go:44-66: empty set -> 0; keys hashed in
    sorted order (insertion-order independent); distinct sets collide
    only as xxh64 does."""
    assert tsdb.external_labels_hash({}) == 0
    a = tsdb.external_labels_hash({"replica": "a", "cluster": "x"})
    b = tsdb.external_labels_hash({"cluster": "x", "replica": "a"})
    assert a == b != 0
    assert tsdb.external_labels_hash({"replica": "b", "cluster": "x"}) != a
    # matches a hand-computed concatenation: xxh64 over k1 v1 k2 v2 sorted
    assert a == tsdb.xxh64(b"clusterxreplicaa")


# ------------------------------------------------- banded segment reads
def test_assign_bands_plan():
    """Driver-side I/O plan: bands are contiguous, disjoint, and each
    band's byte end is the next band's first chunk offset (None = EOF
    for the segment's last band)."""
    work = [{"seg": "s1", "offset": o} for o in (8, 40, 100, 160, 300)]
    work += [{"seg": "s0", "offset": o} for o in (8, 64)]
    n = tsdb._assign_bands(work, band_chunks=2)
    assert n == 4  # ceil(5/2) + ceil(2/2)
    by_band = {}
    for w in work:
        by_band.setdefault((w["seg"], w["band"]), []).append(w)
    # global band ids unique across segments
    assert len(by_band) == 4
    s1 = sorted(((b, sorted(r["offset"] for r in rows), rows[0]["end"])
                 for (s, b), rows in by_band.items() if s == "s1"))
    assert [(offs, end) for _, offs, end in s1] == [
        ([8, 40], 100), ([100, 160], 300), ([300], None)]
    s0 = [(sorted(r["offset"] for r in rows), rows[0]["end"])
          for (s, _b), rows in by_band.items() if s == "s0"]
    assert s0 == [([8, 64], None)]


def test_band_bounded_segment_reads(spark, tmp_path):
    """The read-amplification pin (r11 verdict item #1): with many bands
    per segment, executor ranged reads are DISJOINT and total fetched
    bytes equal total segment bytes — each segment is read exactly once
    collectively, however many tasks share it — and the decode output is
    unchanged."""
    import glob as _glob
    import json as _json

    d = str(tmp_path / "block")
    # 40 series x 1 chunk each in one segment; band_chunks=4 -> 10 bands
    series = [({"__name__": "m", "i": f"{i:02d}"},
               [(1000 * j, float(i * 100 + j)) for j in range(50)])
              for i in range(40)]
    write_block(d, series)
    trace = tmp_path / "io_trace"
    trace.mkdir()
    rows = tsdb.tsdb_block_samples(
        spark, d, band_chunks=4, io_trace_dir=str(trace)).collect()
    got = sorted((dict(r["labels"])["i"], r["ts"], r["value"]) for r in rows)
    want = sorted((ls["i"], t, v) for ls, ss in series for t, v in ss)
    assert got == want
    reads = [_json.loads(open(p).read())
             for p in _glob.glob(f"{trace}/read-*.json")]
    assert len(reads) >= 10  # one per band (retries could add more)
    seg_sizes = {p: len(open(p, "rb").read())
                 for p in _glob.glob(f"{d}/chunks/*")}
    by_seg: dict[str, list] = {}
    for r in reads:
        by_seg.setdefault(r["seg"], []).append((r["start"],
                                                r["start"] + r["n"]))
    total = 0
    for seg, spans in by_seg.items():
        spans.sort()
        for (a0, a1), (b0, _b1) in zip(spans, spans[1:]):
            assert a1 <= b0, f"overlapping reads in {seg}: {spans}"
        total += sum(b - a for a, b in spans)
    assert total <= sum(seg_sizes.values())
    # and collectively they cover every chunk byte: first read starts at
    # the first chunk (offset 8, after the segment header)
    assert min(s for spans in by_seg.values() for s, _ in spans) == 8


def test_band_bounded_reads_multi_segment(spark, tmp_path):
    """Bands + segment rolling compose: disjoint exact spans per segment,
    refs followed across segments, output intact."""
    import glob as _glob
    import json as _json

    d = str(tmp_path / "block")
    series = [({"__name__": "m", "i": f"{i:02d}"},
               [(1000 * j, float(i * 1000 + j)) for j in range(150)])
              for i in range(6)]
    write_block(d, series, max_segment_bytes=600)
    trace = tmp_path / "io_trace"
    trace.mkdir()
    rows = tsdb.tsdb_block_samples(
        spark, d, band_chunks=2, io_trace_dir=str(trace)).collect()
    got = sorted((dict(r["labels"])["i"], r["ts"], r["value"]) for r in rows)
    want = sorted((ls["i"], t, v) for ls, ss in series for t, v in ss)
    assert got == want
    reads = [_json.loads(open(p).read())
             for p in _glob.glob(f"{trace}/read-*.json")]
    by_seg: dict[str, list] = {}
    for r in reads:
        by_seg.setdefault(r["seg"], []).append((r["start"],
                                                r["start"] + r["n"]))
    assert len(by_seg) == len(_glob.glob(f"{d}/chunks/*")) >= 2
    for seg, spans in by_seg.items():
        spans.sort()
        for (a0, a1), (b0, _b1) in zip(spans, spans[1:]):
            assert a1 <= b0, f"overlapping reads in {seg}: {spans}"
        size = len(open(seg, "rb").read())
        assert sum(b - a for a, b in spans) <= size


# ---------------------------------------------------- stream discovery
def _stream_fixture(root, day=1704067200000):
    """Two Prometheis (replica a/b sharing cluster=x) + one label-less
    block; returns the two replica stream keys."""
    write_block(str(root / "01REPA"), [
        ({"__name__": "up", "job": "j"},
         [(day + 60_000 * i, float(i)) for i in range(100)])],
        ulid="01REPA0000000000000000000A",
        meta_extra={"thanos": {"labels": {"cluster": "x", "replica": "a"}}})
    write_block(str(root / "01REPB"), [
        ({"__name__": "up", "job": "j"},
         [(day + 60_000 * i, float(i) + 1000.0) for i in range(100)])],
        ulid="01REPB0000000000000000000B",
        meta_extra={"thanos": {"labels": {"cluster": "x", "replica": "b"}}})
    write_block(str(root / "01PLAIN"), [
        ({"__name__": "other"}, [(day, 1.0)])],
        ulid="01PLAIN00000000000000000000")
    ka = str(tsdb.external_labels_hash({"cluster": "x", "replica": "a"}))
    kb = str(tsdb.external_labels_hash({"cluster": "x", "replica": "b"}))
    return ka, kb


def test_discover_streams_grouping_and_filters(tmp_path):
    """TSDBDiscoverer parity (reference locate/discover.go:518-651):
    ext-label stream grouping, deletion-mark skip, downsample skip,
    zero-chunk skip, ext-label matchers, min-age."""
    import json as _json

    root = tmp_path / "blocks"
    day = 1704067200000
    ka, kb = _stream_fixture(root, day)
    streams = tsdb.discover_streams(str(root))
    assert set(streams) == {ka, kb, "0"}
    assert streams[ka]["labels"] == {"cluster": "x", "replica": "a"}
    assert streams["0"]["labels"] == {}
    assert streams[ka]["mint"] == day
    # deletion-mark skip
    (root / "01REPB" / "deletion-mark.json").write_text(
        _json.dumps({"id": "01REPB", "deletion_time": 1}))
    assert set(tsdb.discover_streams(str(root))) == {ka, "0"}
    (root / "01REPB" / "deletion-mark.json").unlink()
    # downsampled block skip (thanos.downsample.resolution != 0)
    write_block(str(root / "01DOWN"), [({"__name__": "d"}, [(day, 1.0)])],
                ulid="01DOWNSAMPLED0000000000000",
                meta_extra={"thanos": {
                    "labels": {"cluster": "x", "replica": "a"},
                    "downsample": {"resolution": 300000}}})
    assert set(tsdb.discover_streams(str(root))) == {ka, kb, "0"}
    # zero-chunk block skip
    write_block(str(root / "01EMPTY"), [],
                ulid="01EMPTY0000000000000000000")
    assert set(tsdb.discover_streams(str(root))) == {ka, kb, "0"}
    # ext-label matchers (missing label matches as "")
    got = tsdb.discover_streams(
        str(root), ext_label_matchers=[("replica", "=", "a")])
    assert set(got) == {ka}
    got = tsdb.discover_streams(
        str(root), ext_label_matchers=[("replica", "=~", "a|")])
    assert set(got) == {ka, "0"}
    got = tsdb.discover_streams(
        str(root), ext_label_matchers=[("cluster", "!=", "")])
    assert set(got) == {ka, kb}
    # min-age: the replica blocks' maxTime is day+99min (inside the 60min
    # churn window at now=day+100min -> skipped); the label-less block's
    # is day+1 (old enough -> kept)
    now = day + 100 * 60_000
    assert set(tsdb.discover_streams(str(root), min_age_ms=60 * 60_000,
                                     now_ms=now)) == {"0"}
    assert set(tsdb.discover_streams(str(root), min_age_ms=1,
                                     now_ms=now + 10 ** 9)) \
        == {ka, kb, "0"}


def test_tsdb_source_days_per_stream(spark, tmp_path):
    """Planner coverage is grouped PER STREAM, so two Prometheis plan
    independently and plan_days anti-joins stream-wise."""
    root = tmp_path / "blocks"
    ka, kb = _stream_fixture(root)
    src = tsdb.tsdb_source_days(spark, str(root))
    got = {(r["stream"], r["date"]) for r in src.collect()}
    assert got == {(ka, "2024-01-01"), (kb, "2024-01-01"),
                   ("0", "2024-01-01")}


def test_convert_tsdb_streams_e2e(spark, tmp_path):
    """Multi-stream conversion (B15 complete): two replicas' blocks land
    in DIFFERENT stream= partitions with correct stream.pb descriptors,
    and query-time replica dedup across the streams works through the
    engine (reference TSDBDiscoverer grouping + db/shard.go dedup)."""
    from thanos_parquet_gateway_spark.convert import sidecar_pb
    from thanos_parquet_gateway_spark.convert.convert import (
        read_stream_descriptors,
    )
    from thanos_parquet_gateway_spark.promql import PromQLEngine

    day = 1704067200000
    root = tmp_path / "blocks"
    ka, kb = _stream_fixture(root)
    out = str(tmp_path / "conv")
    manifest = tsdb.convert_tsdb_streams(spark, str(root), out)
    got = {(r["stream"], r["date"]): r["n_samples"]
           for r in manifest.collect()}
    assert got == {(ka, "2024-01-01"): 100, (kb, "2024-01-01"): 100,
                   ("0", "2024-01-01"): 1}
    # stream.pb sidecars carry each stream's external labels (the file is
    # "_stream.pb" — underscore-prefixed so Spark's data listing skips it)
    for key, labels in [(ka, {"cluster": "x", "replica": "a"}),
                        (kb, {"cluster": "x", "replica": "b"}),
                        ("0", {})]:
        pb = open(f"{out}/stream={key}/{sidecar_pb.STREAM_FILE}",
                  "rb").read()
        assert sidecar_pb.decode_stream_descriptor(pb) == labels
    streams = read_stream_descriptors(spark, out)
    assert streams[ka] == {"cluster": "x", "replica": "a"}
    # replica dedup across the two streams: one series remains, replica
    # label dropped, cluster label decorates
    eng = PromQLEngine(spark.read.parquet(out), lookback_ms=600_000,
                       deterministic=True, streams=streams,
                       replica_labels=["replica"])
    res = eng.query_instant("up", day + 50 * 60_000).df.collect()
    assert len(res) == 1
    labels = dict(res[0]["labels"])
    assert labels.get("cluster") == "x" and "replica" not in labels
    # replica a sorts first -> its value wins (deterministic min-by rule)
    assert res[0]["value"] == 50.0
    # ext-label matcher filtering narrows the conversion
    out2 = str(tmp_path / "conv2")
    tsdb.convert_tsdb_streams(spark, str(root), out2,
                              ext_label_matchers=[("replica", "=", "b")])
    import glob as _glob
    assert [p.rsplit("=", 1)[1] for p in
            sorted(_glob.glob(f"{out2}/stream=*"))] == [kb]


def test_convert_tsdb_streams_no_blocks(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError, match="no convertible"):
        tsdb.convert_tsdb_streams(None, str(tmp_path / "empty"),
                                  str(tmp_path / "out"))


# ------------------------------------------- integer-histogram blocks
def _int_hist(i):
    return {"int": True, "count": 6 + i, "zero_count": 1,
            "sum": 10.0 + i, "schema": 0, "zero_threshold": 0.0,
            "pos": [(1, 3 + i), (2, 2)], "neg": []}


def test_int_histogram_block_roundtrip(spark, tmp_path):
    """Integer-histogram (enc 2) chunks through the BLOCK path — writer
    emits enc 2, reader follows index metas and decodes to the same
    engine model the codec-level goldens pin (r11 verdict item #3)."""
    d = str(tmp_path / "block")
    write_block(d, [({"__name__": "ih"},
                     [(1000 * (i + 1), _int_hist(i)) for i in range(5)])],
                max_per_chunk=2)
    # on-disk encoding byte really is 2 for every chunk
    work = tsdb.block_chunk_work(d)
    assert len(work) == 3  # 5 samples at 2/chunk
    seg = open(work[0]["seg"], "rb").read()
    for w in work:
        enc, _data, _ = tsdb._parse_chunk_at(seg, w["offset"], True)
        assert enc == 2
    rows = sorted(tsdb.tsdb_block_samples(spark, d).collect(),
                  key=lambda r: r["ts"])
    assert [r["ts"] for r in rows] == [1000 * (i + 1) for i in range(5)]
    for i, r in enumerate(rows):
        assert r["hist"]["count"] == 6.0 + i
        assert r["hist"]["sum"] == 10.0 + i
        les = {b["le"]: b["count"] for b in r["hist"]["buckets"]}
        assert les[0.0] == 1.0 and les[2.0] == 3.0 + i and les[4.0] == 2.0


def test_int_histogram_block_fuzz(tmp_path):
    """Block-layer fuzz for enc-2 (and mixed enc-1/2/3) series: the
    block roundtrip must yield exactly what the codec yields on the
    independently-encoded chunk bytes with the same chunking — pinning
    refs/metas/ordering/tombstones for histogram chunks (the codec
    bytes themselves are golden-tested in test_grpc)."""
    import os
    import shutil

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from thanos_parquet_gateway_spark.api.chunkenc import (
        encode_histogram_chunk_int,
    )

    @st.composite
    def hist_blocks(draw):
        n_series = draw(st.integers(1, 3))
        series = []
        for i in range(n_series):
            schema = draw(st.integers(-2, 3))
            ts = sorted(draw(st.sets(st.integers(0, 1_000_000),
                                     min_size=1, max_size=20)))
            samples = []
            for t in ts:
                pos = [(idx, draw(st.integers(0, 50)))
                       for idx in sorted(draw(st.sets(
                           st.integers(-5, 10), min_size=0, max_size=4)))]
                neg = [(idx, draw(st.integers(0, 50)))
                       for idx in sorted(draw(st.sets(
                           st.integers(-5, 10), min_size=0, max_size=2)))]
                samples.append((t, {
                    "int": True, "count": draw(st.integers(0, 500)),
                    "zero_count": draw(st.integers(0, 50)),
                    "sum": draw(st.floats(allow_nan=False, width=64)),
                    "schema": schema, "zero_threshold": 0.0,
                    "pos": pos, "neg": neg}))
            series.append(({"__name__": f"h{i}"}, samples))
        return series, draw(st.integers(1, 7))

    n_examples = int(os.environ.get("FUZZ_N_TSDB_HIST", "25"))

    @settings(max_examples=n_examples, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(hist_blocks())
    def check(case):
        series, per_chunk = case
        d = str(tmp_path / "hist_block")
        shutil.rmtree(d, ignore_errors=True)
        write_block(d, series, max_per_chunk=per_chunk)
        got = sorted(_decode_block_driver_side(d),
                     key=lambda r: (r[0], r[1]))
        want = []
        for labels, samples in series:
            key = tuple(sorted(labels.items()))
            for chunk in _chunk_series_like_writer(samples, per_chunk):
                data = encode_histogram_chunk_int(
                    [dict(h, ts=t) for t, h in chunk])
                for t, v in tsdb.decode_chunk(tsdb.ENC_HISTOGRAM, data):
                    want.append((key, t, v))
        want.sort(key=lambda r: (r[0], r[1]))
        assert got == want

    check()


def _chunk_series_like_writer(samples, max_per_chunk):
    for i in range(0, len(samples), max_per_chunk):
        yield samples[i:i + max_per_chunk]


def test_cross_stream_replica_dedup_respects_other_ext_labels(spark):
    """Replica dedup crosses ONLY streams whose non-replica external
    labels coincide (Thanos semantics, reference db/db.go:124-128):
    {env=p,replica=a} + {env=p,replica=b} merge into one env=p series,
    while {env=q,replica=a} stays its own series — and a stale marker
    from the winning replica loses to a real sample."""
    from pyspark.sql import functions as F  # noqa: F401

    from thanos_parquet_gateway_spark.promql import PromQLEngine

    t0 = 1704067200000
    rows = [({"__name__": "up", "job": "j"}, t0, val, s)
            for s, val in [("pa", 1.0), ("pb", 2.0), ("qa", 3.0)]]
    samples = spark.createDataFrame(
        [(ls, ts, v, s) for ls, ts, v, s in rows],
        "labels map<string,string>, ts long, value double, stream string")
    streams = {"pa": {"env": "p", "replica": "a"},
               "pb": {"env": "p", "replica": "b"},
               "qa": {"env": "q", "replica": "a"}}
    eng = PromQLEngine(samples, lookback_ms=600_000, deterministic=True,
                       streams=streams, replica_labels=["replica"])
    res = eng.query_instant("up", t0).df.collect()
    got = {dict(r["labels"])["env"]: r["value"] for r in res}
    # env=p: replica a (sorts first) wins with 1.0; env=q untouched
    assert got == {"p": 1.0, "q": 3.0}
    assert all("replica" not in dict(r["labels"]) for r in res)
    # matcher on a surviving ext label still prunes streams
    res = eng.query_instant('up{env="q"}', t0).df.collect()
    assert len(res) == 1 and res[0]["value"] == 3.0


def test_contiguous_day_runs_and_selector_parse():
    from thanos_parquet_gateway_spark.cli import (
        _contiguous_day_runs,
        _parse_selectors,
    )
    d = 86_400_000

    def ms(s):
        import datetime as _dt
        return int(_dt.datetime.strptime(s, "%Y-%m-%d")
                   .replace(tzinfo=_dt.timezone.utc).timestamp() * 1000)

    # sparse plan -> one window per contiguous run, gap never decoded
    runs = _contiguous_day_runs(["2024-01-01", "2024-01-02", "2024-06-01"])
    assert runs == [(ms("2024-01-01"), ms("2024-01-02") + d),
                    (ms("2024-06-01"), ms("2024-06-01") + d)]
    assert _contiguous_day_runs(["2024-01-05"]) == \
        [(ms("2024-01-05"), ms("2024-01-05") + d)]
    # duplicates and order don't matter
    assert _contiguous_day_runs(["2024-01-02", "2024-01-01",
                                 "2024-01-02"]) == \
        [(ms("2024-01-01"), ms("2024-01-02") + d)]
    assert _parse_selectors(["replica=a", "env!=prod", "c=~x|y",
                             "d!~z.*"]) == \
        [("replica", "=", "a"), ("env", "!=", "prod"),
         ("c", "=~", "x|y"), ("d", "!~", "z.*")]
    # '=' inside a regex value survives (ops tried longest-first)
    assert _parse_selectors(["e=~a=b"]) == [("e", "=~", "a=b")]
    with pytest.raises(SystemExit):
        _parse_selectors(["nonsense"])


def test_cli_convert_tsdb_multistream(spark, tmp_path):
    """`convert --src-format tsdb` over a multi-Prometheus block dir:
    per-stream partitions + descriptors, and
    --select-external-labels narrows discovery (reference
    tsdb.discovery.select-external-labels)."""
    import glob as _glob

    from thanos_parquet_gateway_spark.cli import main

    day = 1704067200000
    root = tmp_path / "blocks"
    # full-day replica blocks so the planner doesn't drop them as partial
    write_block(str(root / "01RA"), [
        ({"__name__": "up", "job": "j"},
         [(day + 60_000 * i, float(i)) for i in range(1441)])],
        ulid="01RA0000000000000000000000",
        meta_extra={"thanos": {"labels": {"replica": "a"}}})
    write_block(str(root / "01RB"), [
        ({"__name__": "up", "job": "j"},
         [(day + 60_000 * i, float(i) + 5000) for i in range(1441)])],
        ulid="01RB0000000000000000000000",
        meta_extra={"thanos": {"labels": {"replica": "b"}}})
    ka = str(tsdb.external_labels_hash({"replica": "a"}))
    kb = str(tsdb.external_labels_hash({"replica": "b"}))
    dst = str(tmp_path / "conv")
    assert main(["convert", "--src", str(root), "--src-format", "tsdb",
                 "--dst", dst]) == 0
    got = sorted(p.rsplit("stream=", 1)[1]
                 for p in _glob.glob(f"{dst}/stream=*"))
    assert got == sorted([ka, kb])
    # narrowed discovery: only replica b converts
    dst2 = str(tmp_path / "conv2")
    assert main(["convert", "--src", str(root), "--src-format", "tsdb",
                 "--dst", dst2,
                 "--select-external-labels", "replica=b"]) == 0
    got = [p.rsplit("stream=", 1)[1] for p in _glob.glob(f"{dst2}/stream=*")]
    assert got == [kb]


def test_band_reads_survive_arrow_batch_splits(spark, tmp_path):
    """Arrow input batching (~10k rows/batch by default) is orthogonal
    to bands; the decoder groups work rows across the whole partition
    iterator, so a band split across several incoming Arrow batches
    still costs exactly ONE ranged read — forced here with a 3-row
    Arrow batch size against 8-chunk bands."""
    import glob as _glob
    import json as _json

    d = str(tmp_path / "block")
    series = [({"__name__": "m", "i": f"{i:02d}"},
               [(1000 * j, float(i + j)) for j in range(30)])
              for i in range(32)]
    write_block(d, series)
    trace = tmp_path / "io_trace"
    trace.mkdir()
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "3")
    try:
        rows = tsdb.tsdb_block_samples(
            spark, d, band_chunks=8, io_trace_dir=str(trace)).collect()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    got = sorted((dict(r["labels"])["i"], r["ts"], r["value"]) for r in rows)
    want = sorted((ls["i"], t, v) for ls, ss in series for t, v in ss)
    assert got == want
    reads = [_json.loads(open(p).read())
             for p in _glob.glob(f"{trace}/read-*.json")]
    # 32 chunks / 8 per band = 4 bands -> exactly 4 disjoint reads
    assert len(reads) == 4
    spans = sorted((r["start"], r["start"] + r["n"]) for r in reads)
    for (a0, a1), (b0, _b1) in zip(spans, spans[1:]):
        assert a1 <= b0


def test_discover_streams_meta_edge_cases(tmp_path):
    """Meta corner rules: a missing stats section is NOT treated as
    zero-chunk (only an explicit numChunks==0 skips); empty thanos
    labels and an absent thanos section both key stream "0" and group
    together (reference ExternalLabels.Hash: empty set -> 0)."""
    import json as _json

    root = tmp_path / "blocks"
    day = 1704067200000
    write_block(str(root / "01A"), [({"__name__": "m"}, [(day, 1.0)])],
                ulid="01A00000000000000000000000")
    # strip the stats section entirely
    mp = root / "01A" / "meta.json"
    meta = _json.loads(mp.read_text())
    del meta["stats"]
    mp.write_text(_json.dumps(meta))
    # empty thanos.labels (vs 01A's absent thanos section)
    write_block(str(root / "01B"), [({"__name__": "n"}, [(day, 2.0)])],
                ulid="01B00000000000000000000000",
                meta_extra={"thanos": {"labels": {}}})
    streams = tsdb.discover_streams(str(root))
    assert set(streams) == {"0"}
    assert len(streams["0"]["blocks"]) == 2
    assert streams["0"]["labels"] == {}


def test_stream_key_above_int64_survives_partition_inference(spark,
                                                             tmp_path):
    """Stream keys are uint64 decimal strings and can exceed int64 max
    (e.g. replica=r1 -> 10485900719457318063).  Spark's partition-value
    inference must not mangle them (20-digit values infer as decimal,
    not long) — conversion, manifest, descriptors, and engine stream
    decoration all keep the exact key."""
    day = 1704067200000
    root = tmp_path / "blocks"
    labels = {"replica": "r1"}
    key = str(tsdb.external_labels_hash(labels))
    assert int(key) > (1 << 63)  # the hazard under test
    write_block(str(root / "01B"), [
        ({"__name__": "up"}, [(day + 1000 * i, float(i))
                              for i in range(10)])],
        ulid="01BIGKEY000000000000000000",
        meta_extra={"thanos": {"labels": labels}})
    out = str(tmp_path / "conv")
    manifest = tsdb.convert_tsdb_streams(spark, str(root), out)
    assert [r["stream"] for r in manifest.collect()] == [key]
    from thanos_parquet_gateway_spark.convert.convert import (
        read_stream_descriptors,
    )
    from thanos_parquet_gateway_spark.promql import PromQLEngine
    streams = read_stream_descriptors(spark, out)
    assert streams == {key: labels}
    conv = spark.read.parquet(out)
    got = {str(r["stream"]) for r in conv.select("stream").distinct()
           .collect()}
    assert got == {key}
    eng = PromQLEngine(conv, lookback_ms=600_000, deterministic=True,
                       streams=streams, replica_labels=["replica"])
    res = eng.query_instant("up", day + 9000).df.collect()
    assert len(res) == 1 and res[0]["value"] == 9.0
    assert "replica" not in dict(res[0]["labels"])


def test_cross_stream_dedup_differential_fuzz(spark):
    """Hypothesis differential over the streams+replica dedup path: for
    random stream layouts (random ext labels incl. 0-2 replica labels),
    random sparse samples (incl. staleness NULLs), the engine's deduped
    sample set must equal a pure-Python model — dedup crosses exactly
    the streams whose non-replica ext labels coincide, lowest
    (intrinsic + ext) replica key wins, stale markers lose to real
    samples of the winning key, decoration = stripped ext labels."""
    import os

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from thanos_parquet_gateway_spark.promql import PromQLEngine

    t0 = 1704067200000
    REPS = ["replica", "rep2"]

    @st.composite
    def layouts(draw):
        n_streams = draw(st.integers(1, 4))
        streams = {}
        for i in range(n_streams):
            ls = {}
            if draw(st.booleans()):
                ls["env"] = draw(st.sampled_from(["p", "q"]))
            for rl in REPS:
                if draw(st.booleans()):
                    ls[rl] = draw(st.sampled_from(["a", "b", "c"]))
            streams[f"s{i}"] = ls
        rows = []
        for s in streams:
            for ts_off in draw(st.sets(st.integers(0, 3), min_size=1,
                                       max_size=4)):
                val = draw(st.one_of(st.none(),
                                     st.floats(allow_nan=False, width=32)))
                rows.append((s, t0 + ts_off * 1000, val))
        return streams, rows

    n_examples = int(os.environ.get("FUZZ_N_STREAM_DEDUP", "12"))

    @settings(max_examples=n_examples, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(layouts())
    def check(case):
        streams, rows = case
        samples = spark.createDataFrame(
            [({"__name__": "m"}, ts, v, s) for s, ts, v in rows],
            "labels map<string,string>, ts long, value double, "
            "stream string")
        eng = PromQLEngine(samples, lookback_ms=600_000,
                           deterministic=True, streams=streams,
                           replica_labels=REPS)
        got = {}
        for r in eng.samples.select("labels", "ts", "value",
                                    "stream").collect():
            grp_labels = tuple(sorted(
                {k: v for k, v in streams[r["stream"]].items()
                 if k not in REPS}.items()))
            got[(grp_labels, r["ts"])] = r["value"]
        # pure-Python model
        want = {}
        best = {}
        for s, ts, v in rows:
            ls = streams[s]
            grp = tuple(sorted((k, x) for k, x in ls.items()
                               if k not in REPS))
            # mirror the engine's order key: (replica rank, stale flag,
            # -value) — a real sample (any value, incl. -inf) beats a
            # stale marker at the same rank
            repkey = ("\x1f" + "\x1f".join(ls.get(rl, "") for rl in REPS),
                      1 if v is None else 0,
                      float("inf") if v is None else -v)
            k = (grp, ts)
            if k not in best or repkey < best[k]:
                best[k] = repkey
                want[k] = v
        assert set(got) == set(want)
        for k in want:
            if want[k] is None:
                assert got[k] is None
            else:
                assert got[k] == want[k]

    check()
