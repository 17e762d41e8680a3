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
                      now_ms: int) -> DataFrame:
    """Phase 1: mark (stream, date) rows older than retention."""
    cutoff = F.date_format(
        F.timestamp_millis(F.lit(now_ms) - F.lit(retention_days * 86_400_000)),
        "yyyy-MM-dd")
    return manifest.withColumn(
        "deleted_at",
        F.when(F.col("date") < cutoff,
               F.coalesce(F.col("deleted_at") if "deleted_at" in manifest.columns
                          else F.lit(None).cast("long"), F.lit(now_ms))))


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
