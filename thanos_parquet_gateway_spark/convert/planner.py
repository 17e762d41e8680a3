"""Conversion planner: which (stream, day)s still need converting.

Reference semantics (convert/plan.go:41-178, tests convert/plan_test.go:22+):
covered-by-source minus covered-by-parquet (anti-join), drop the newest
partial day, newest-first, soft cap maxDays.  One small DataFrame anti-join
(SURVEY.md §2.B B3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def source_days(raw: DataFrame, stream: str = "0") -> DataFrame:
    """Days covered by the raw source, with completeness bounds."""
    return (raw
            .withColumn("date", F.date_format(F.timestamp_millis(F.col("ts")),
                                              "yyyy-MM-dd"))
            .groupBy("date")
            .agg(F.min("ts").alias("mint"), F.max("ts").alias("maxt"))
            .withColumn("stream", F.lit(stream)))


def plan_days(src_days: DataFrame, manifest: DataFrame | None,
              max_days: int = 0, drop_partial_newest: bool = True) -> DataFrame:
    """Anti-join source coverage against converted coverage; newest first.

    drop_partial_newest mirrors the reference's skip of the most recent,
    still-accumulating day (convert/plan.go:58-74): a day is partial when its
    max ts is not at the day's end boundary.
    """
    plan = src_days
    if manifest is not None:
        done = manifest.select("stream", "date").distinct()
        plan = plan.join(done, ["stream", "date"], "left_anti")
    if drop_partial_newest:
        newest = (src_days.groupBy().agg(F.max("date").alias("__newest")))
        plan = (plan.join(F.broadcast(newest))
                .withColumn(
                    "__day_end",
                    F.unix_millis(F.to_timestamp(F.col("date"))) + 86_400_000 - 1)
                .filter((F.col("date") != F.col("__newest")) |
                        (F.col("maxt") >= F.col("__day_end") - 60_000))
                .drop("__newest", "__day_end"))
    plan = plan.orderBy(F.col("date").desc())
    if max_days:
        plan = plan.limit(max_days)
    return plan.select("stream", "date", "mint", "maxt")
