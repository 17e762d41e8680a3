"""Wire-format tests for the proto3 block sidecars (meta.pb / stream.pb /
deletion-marker.pb) + conversion/retention integration.

Golden byte vectors are hand-derived from the public proto3 wire spec
(varint, tag = field<<3|wiretype, length-delimited) against the message
shapes in the reference .proto files — no protobuf dependency exists in
this environment, so byte-compat is proven against the spec itself.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from thanos_parquet_gateway_spark.convert import sidecar_pb as pb


def test_metadata_golden_bytes():
    # Metadata{mint=1, maxt=2, shards=3, version=2, blids=["a"]}:
    # 08 01 | 10 02 | 18 03 | 28 02 | 32 01 'a'
    got = pb.encode_metadata(mint=1, maxt=2, shards=3, version=2,
                             converted_from_blids=["a"])
    assert got == bytes.fromhex("080110021803280232") + b"\x01a"
    # proto3 default omission: all-zero message is empty
    assert pb.encode_metadata() == b""
    # multi-byte varint: 300 = 0xAC 0x02
    assert pb.encode_metadata(mint=300) == b"\x08\xac\x02"
    # negative int64 = 10-byte two's-complement varint
    enc = pb.encode_metadata(mint=-1)
    assert enc == b"\x08" + b"\xff" * 9 + b"\x01"
    assert pb.decode_metadata(enc)["mint"] == -1


def test_metadata_roundtrip_with_columns_map():
    cols = {"http_requests": ["s_hash", "val_0"], "up": []}
    enc = pb.encode_metadata(mint=1704067200000, maxt=1704153600000,
                             shards=4, version=2, columns_for_name=cols,
                             converted_from_blids=["01H", "01J"])
    dec = pb.decode_metadata(enc)
    assert dec["mint"] == 1704067200000 and dec["maxt"] == 1704153600000
    assert dec["shards"] == 4 and dec["version"] == 2
    assert dec["columns_for_name"] == cols
    assert dec["converted_from_blids"] == ["01H", "01J"]


def test_stream_descriptor_golden_and_roundtrip():
    # {externalLabels: {"cluster": "a"}}: entry = 0A 07 'cluster' 12 01 'a'
    # outer: 0A 0C <entry>
    enc = pb.encode_stream_descriptor({"cluster": "a"})
    assert enc == b"\x0a\x0c\x0a\x07cluster\x12\x01a"
    labels = {"cluster": "eu-1", "replica": "r0", "zzz": ""}
    assert pb.decode_stream_descriptor(
        pb.encode_stream_descriptor(labels)) == labels
    # sorted-key determinism
    assert (pb.encode_stream_descriptor({"b": "2", "a": "1"})
            == pb.encode_stream_descriptor({"a": "1", "b": "2"}))


def test_deletion_mark_golden_and_roundtrip():
    assert pb.encode_deletion_mark("retention") == b"\x0a\x09retention"
    assert pb.decode_deletion_mark(b"\x0a\x09retention") == {
        "reason": "retention"}
    assert pb.decode_deletion_mark(b"") == {"reason": ""}


def test_decoder_skips_unknown_fields():
    # a future field 15 (varint) must not break decoding: tag = 15<<3 = 0x78
    data = b"\x78\x2a" + pb.encode_metadata(mint=7)
    assert pb.decode_metadata(data)["mint"] == 7


def test_conversion_writes_block_sidecars(spark, sf_dir, tmp_path):
    from thanos_parquet_gateway_spark.convert import convert as C
    from thanos_parquet_gateway_spark.sources import samples_from_events

    out = str(tmp_path / "converted")
    raw = samples_from_events(spark, sf_dir).limit(5000)
    manifest = C.convert_samples(raw, out, dedup=True)
    rows = manifest.collect()
    assert rows
    for r in rows[:3]:
        meta = C.read_block_meta(out, r["stream"], r["date"])
        assert meta["version"] == C.SCHEMA_VERSION
        assert meta["shards"] >= 1
        # day bounds contain the data extremes recorded in the manifest
        assert meta["mint"] <= r["mint"] <= r["maxt"] < meta["maxt"]
        assert meta["maxt"] - meta["mint"] == 86_400_000


def test_retention_markers_written_and_discovered(spark, sf_dir, tmp_path):
    from thanos_parquet_gateway_spark.convert import convert as C
    from thanos_parquet_gateway_spark.convert import retention as R

    out = str(tmp_path / "converted")
    raw = samples = None
    from thanos_parquet_gateway_spark.sources import samples_from_events
    raw = samples_from_events(spark, sf_dir).limit(3000)
    manifest = C.convert_samples(raw, out, dedup=True)
    dates = sorted(r["date"] for r in manifest.collect())
    assert len(dates) >= 2
    # retention cutoff right after the oldest day -> exactly the old days
    # marked; markers land in their block dirs and are discoverable
    import datetime as dt
    oldest = dt.datetime.strptime(dates[0], "%Y-%m-%d") \
        .replace(tzinfo=dt.timezone.utc)
    now_ms = int((oldest.timestamp() + 2.5 * 86400) * 1000)
    marked = R.mark_for_deletion(manifest, retention_days=1, now_ms=now_ms,
                                 table_path=out, reason="retention")
    n_marked = marked.filter("deleted_at IS NOT NULL").count()
    assert n_marked >= 1
    found = R.deletion_marked(out)
    assert len(found) == n_marked
    assert all(d <= dates[0] for _, d in found)
    # marker content is the reference DeletionMark message
    from pathlib import Path
    s, d = found[0]
    raw_marker = (Path(out) / f"stream={s}" / f"date={d}"
                  / pb.DELETION_MARKER_FILE).read_bytes()
    assert pb.decode_deletion_mark(raw_marker) == {"reason": "retention"}
    # sweep after the consistency delay removes the dir and its marker
    deleted = R.apply_retention(marked, out,
                                now_ms=now_ms + R.CONSISTENCY_DELAY_MS + 1)
    assert len(deleted) == n_marked
    assert R.deletion_marked(out) == []


def test_streaming_convert_sidecar_refresh(spark, tmp_path):
    """After an availableNow streaming conversion drains, refresh_sidecars
    produces the same manifest + meta.pb state a batch conversion would."""
    from thanos_parquet_gateway_spark.convert import convert as C
    from thanos_parquet_gateway_spark.streaming.convert_stream import (
        stream_convert,
    )

    raw_dir, out = str(tmp_path / "raw"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [({"__name__": "m", "job": "a"}, ts, 1.0)
            for ts in (1704067200000, 1704070800000, 1704153600000)]
    spark.createDataFrame(
        rows, "labels map<string,string>, ts long, value double") \
        .write.mode("overwrite").parquet(raw_dir)
    q = stream_convert(spark, raw_dir, out, ckpt)
    q.awaitTermination(120)
    manifest = C.refresh_sidecars(spark, out)
    got = {(r["stream"], r["date"]): r for r in manifest.collect()}
    assert set(got) == {("0", "2024-01-01"), ("0", "2024-01-02")}
    meta = C.read_block_meta(out, "0", "2024-01-01")
    assert meta["version"] == C.SCHEMA_VERSION and meta["shards"] >= 1
    assert meta["mint"] == 1704067200000
    assert meta["maxt"] == 1704067200000 + 86_400_000


def test_sidecars_on_uri_out_path(spark, sf_dir, tmp_path):
    """Object-store-safe sidecar I/O (fsio): the whole conversion +
    sidecar + retention flow over an EXPLICIT ``file:`` URI out_path.
    Under the old pathlib implementation every sidecar write silently
    no-op'd on a scheme-qualified path (``Path('file:/x')`` is a relative
    dir named 'file:'), so each assertion here fails on a local-FS-only
    regression; on a real deployment the same calls hit s3a/gs through
    the identical Hadoop FileSystem route (reference bucket client,
    locate/bucket.go:37-105)."""
    import datetime as dt

    from thanos_parquet_gateway_spark.convert import convert as C
    from thanos_parquet_gateway_spark.convert import fsio
    from thanos_parquet_gateway_spark.convert import retention as R
    from thanos_parquet_gateway_spark.convert.convert import (
        convert_streams,
        read_stream_descriptors,
    )
    from thanos_parquet_gateway_spark.sources import samples_from_events

    out = "file:" + str(tmp_path / "uri_table")
    raw = samples_from_events(spark, sf_dir).limit(4000)
    user = F.element_at("labels", "user").cast("long")
    manifest = convert_streams(
        {"a": raw.filter(user % 2 == 0), "b": raw.filter(user % 2 == 1)},
        out, ext_labels={"a": {"replica": "a"}, "b": {"replica": "b"}})
    rows = manifest.collect()
    assert rows

    # meta.pb written + readable through the Hadoop FS route
    r0 = rows[0]
    meta = C.read_block_meta(out, r0["stream"], r0["date"], spark)
    assert meta["version"] == C.SCHEMA_VERSION
    assert meta["shards"] >= 1  # shard counting keyed on qualified URIs
    assert meta["mint"] <= r0["mint"] <= r0["maxt"] < meta["maxt"]

    # stream.pb sidecars exist under the URI path
    assert read_stream_descriptors(spark, out) == {
        "a": {"replica": "a"}, "b": {"replica": "b"}}
    for s in ("a", "b"):
        assert fsio.exists(fsio.join(out, f"stream={s}", pb.STREAM_FILE),
                           spark)

    # two-phase retention: markers written + discovered + swept, all on
    # the URI path
    dates = sorted({r["date"] for r in rows})
    oldest = dt.datetime.strptime(dates[0], "%Y-%m-%d") \
        .replace(tzinfo=dt.timezone.utc)
    now_ms = int((oldest.timestamp() + 2.5 * 86400) * 1000)
    marked = R.mark_for_deletion(manifest, retention_days=1, now_ms=now_ms,
                                 table_path=out)
    n_marked = marked.filter("deleted_at IS NOT NULL").count()
    assert n_marked >= 1
    found = R.deletion_marked(out, spark)
    assert len(found) == n_marked
    raw_marker = fsio.read_bytes(
        fsio.join(out, f"stream={found[0][0]}", f"date={found[0][1]}",
                  pb.DELETION_MARKER_FILE), spark)
    assert pb.decode_deletion_mark(raw_marker) == {"reason": "retention"}
    deleted = R.apply_retention(marked, out,
                                now_ms=now_ms + R.CONSISTENCY_DELAY_MS + 1)
    assert len(deleted) == n_marked
    assert R.deletion_marked(out, spark) == []
