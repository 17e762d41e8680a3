"""Retention: two-phase partition expiry.

Reference semantics (locate/deletion.go:22-169): day-partitions older than the
retention window are first *marked* (deletion-marker sidecar), and physically
deleted only after a consistency delay — so in-flight readers finish.  Spark
analogue: a manifest column `deleted_at`, then a partition-directory drop.
"""

from __future__ import annotations

import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONSISTENCY_DELAY_MS = 12 * 3600 * 1000  # reference: 12h (locate/deletion.go)


def mark_for_deletion(manifest: DataFrame, retention_days: int,
                      now_ms: int, table_path: str | None = None,
                      reason: str = "retention") -> DataFrame:
    """Phase 1: mark (stream, date) rows older than retention.  With
    ``table_path``, additionally drop the reference's deletion-marker
    sidecar (metapb.DeletionMark wire format, locate/deletion.go:140-169)
    into each marked block dir so external tooling sees the same signal the
    manifest column carries."""
    cutoff = F.date_format(
        F.timestamp_millis(F.lit(now_ms) - F.lit(retention_days * 86_400_000)),
        "yyyy-MM-dd")
    marked = manifest.withColumn(
        "deleted_at",
        F.when(F.col("date") < cutoff,
               F.coalesce(F.col("deleted_at") if "deleted_at" in manifest.columns
                          else F.lit(None).cast("long"), F.lit(now_ms))))
    if table_path is not None:
        from thanos_parquet_gateway_spark.convert import sidecar_pb
        rows = (marked.filter(F.col("deleted_at").isNotNull())
                .select("stream", "date").collect())
        payload = sidecar_pb.encode_deletion_mark(reason)
        for r in rows:
            d = Path(table_path) / f"stream={r['stream']}" / f"date={r['date']}"
            if d.is_dir():
                (d / sidecar_pb.DELETION_MARKER_FILE).write_bytes(payload)
    return marked


def deletion_marked(table_path: str) -> list[tuple[str, str]]:
    """Discovery-side marker scan (reference DeletionMarkerFilter
    .ShouldUnload, locate/deletion.go:26-47): (stream, date) pairs whose
    block dir carries a deletion marker."""
    from thanos_parquet_gateway_spark.convert import sidecar_pb
    out = []
    for marker in Path(table_path).glob(
            f"stream=*/date=*/{sidecar_pb.DELETION_MARKER_FILE}"):
        date_dir, stream_dir = marker.parent, marker.parent.parent
        out.append((stream_dir.name.split("=", 1)[1],
                    date_dir.name.split("=", 1)[1]))
    return sorted(out)


def apply_retention(marked_manifest: DataFrame, table_path: str,
                    now_ms: int | None = None,
                    consistency_delay_ms: int = CONSISTENCY_DELAY_MS) -> list[str]:
    """Phase 2: physically drop partitions whose marker is older than the
    consistency delay.  Returns the deleted partition dirs.  Driver-side
    control-plane work on a small manifest — same shape as the reference's
    bucket iteration (locate/deletion.go:105-169)."""
    now_ms = now_ms or int(time.time() * 1000)
    rows = (marked_manifest
            .filter(F.col("deleted_at").isNotNull() &
                    (F.col("deleted_at") <= now_ms - consistency_delay_ms))
            .select("stream", "date").collect())
    deleted = []
    for r in rows:
        part = Path(table_path) / f"stream={r['stream']}" / f"date={r['date']}"
        if part.exists():
            shutil.rmtree(part)
            deleted.append(str(part))
    return deleted
