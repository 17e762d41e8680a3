"""Multimodal column plumbing (SURVEY.md §7.1 M8).

Images/audio/video are opaque ``binary`` columns with typed metadata structs.
Decode / feature-extract run as Arrow-batched ``mapInPandas`` — the Spark-side
plumbing (schema, batch shape, partition behavior) is real and tested; the
actual codec call is stubbed behind ``_decode_payload`` because media
libraries are not available in this environment (NotImplementedError for real
codecs, deterministic fake for the 'raw' codec used in tests).

At 100TB: binary payloads stay columnar in parquet; mapInPandas streams Arrow
batches so peak memory is one batch per core, and metadata-only queries never
touch the payload column (Parquet column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("checksum", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
])


def _decode_payload(payload: bytes, codec: str) -> list[float]:
    """Stub decode: real codecs (jpeg/png/wav/...) are NOT implemented in this
    container.  'raw' produces a deterministic 4-dim byte-statistics feature
    so the mapInPandas plumbing is testable end-to-end."""
    if codec != "raw":
        raise NotImplementedError(
            f"codec {codec!r}: media libraries unavailable; plug a decoder here")
    if not payload:
        return [0.0, 0.0, 0.0, 0.0]
    n = len(payload)
    return [float(n), float(payload[0]), float(payload[-1]),
            float(sum(payload) % 997)]


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as a 'raw'-codec media payload —
    exercises the full binary-column path on driver-provided data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(F.lit("raw").alias("codec"),
                 F.lit(None).cast("int").alias("width"),
                 F.lit(None).cast("int").alias("height"),
                 F.octet_length(F.encode(F.col("text"), "UTF-8"))
                  .cast("long").alias("n_bytes")).alias("meta"))


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    The byte statistics (n_bytes / checksum / first / last / mod-997) are
    computed vectorized over the whole Arrow batch: all payloads are packed
    into one contiguous uint8 buffer and reduced with ``np.add.reduceat`` —
    no per-row Python in the batch hot path.  Only a non-'raw' codec falls
    back to the (stubbed) per-item decoder.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"]
            ]
            codecs = [
                (m["codec"] if m is not None else "raw") for m in pdf["meta"]
            ]
            for c in codecs:
                if c != "raw":
                    _decode_payload(b"", c)  # raises NotImplementedError
            lens = np.fromiter((len(p) for p in payloads), dtype=np.int64,
                               count=len(payloads))
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            ends = np.cumsum(lens)
            starts = ends - lens
            sums = np.zeros(len(payloads), dtype=np.int64)
            nonempty = lens > 0
            if buf.size:
                # reduceat needs strictly valid offsets; run it only over
                # non-empty payloads (empty ones keep sum=0).
                idx = starts[nonempty]
                seg = np.add.reduceat(buf.astype(np.int64), idx) \
                    if idx.size else np.array([], dtype=np.int64)
                sums[nonempty] = seg
            first = np.zeros(len(payloads), dtype=np.int64)
            last = np.zeros(len(payloads), dtype=np.int64)
            if buf.size:
                first[nonempty] = buf[starts[nonempty]]
                last[nonempty] = buf[ends[nonempty] - 1]
            feature = [
                [float(n), float(f), float(l), float(s % 997)]
                if n else [0.0, 0.0, 0.0, 0.0]
                for n, f, l, s in zip(lens, first, last, sums)
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "n_bytes": lens,
                "checksum": sums % (1 << 31),
                "feature": feature,
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), True),
])


def resize_media(media: DataFrame, width: int, height: int,
                 batch_size: int = 256) -> DataFrame:
    """Resize plumbing: same media schema out, payload re-encoded to the
    target dimensions, meta updated.  The 'raw' codec resize is a
    deterministic fake — truncate / zero-pad to width*height bytes — so the
    full batch path (binary in, binary out, meta rewrite) is testable and
    oracle-checkable; real image codecs plug into ``_decode_payload``'s slot
    and raise NotImplementedError until a library is available.

    Vectorized: one contiguous uint8 buffer per Arrow batch, sliced per row
    with numpy — no per-byte Python."""
    import numpy as np

    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = list(pdf["meta"])
            for m in metas:
                c = m["codec"] if m is not None else "raw"
                if c != "raw":
                    _decode_payload(b"", c)
            out = []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b""
                if len(b) >= target:
                    out.append(b[:target])
                else:
                    out.append(b + b"\x00" * (target - len(b)))
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "payload": out,
                "meta": [{"codec": (m["codec"] if m else "raw"),
                          "width": width, "height": height,
                          "n_bytes": target} for m in metas],
            })

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 64,
                  every: int = 4) -> DataFrame:
    """Frame-sampling plumbing (video → sparse frames): emit every
    ``every``-th fixed-size frame of the payload as its own row — the
    one-row-in / many-rows-out mapInPandas shape a real video pipeline needs
    (output batches are NOT aligned with input rows).  The 'raw' codec
    "video" is the byte stream chunked into ``frame_bytes`` frames
    (deterministic, oracle-checkable); container formats (mp4/webm) plug in
    where the chunker is and raise NotImplementedError until a demuxer is
    available."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p, m in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                c = m["codec"] if m is not None else "raw"
                if c != "raw":
                    _decode_payload(b"", c)
                b = bytes(p) if p is not None else b""
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[i * frame_bytes:(i + 1) * frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs,
                                "frame": frames})

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — must not read the payload column (verify
    with .explain(): ReadSchema excludes `payload`)."""
    return (media.groupBy(F.col("meta.codec").alias("codec"))
            .agg(F.count("*").alias("n_items"),
                 F.sum("meta.n_bytes").alias("total_bytes"),
                 F.max("meta.n_bytes").alias("max_bytes")))
