"""SparkSession construction with scale-appropriate defaults.

The reference sizes itself with row-group/page knobs and I/O coalescing
(reference: convert/convert.go:193-204, cmd/serve.go:112-114).  In Spark the
equivalent levers are AQE, shuffle-partition count, file split sizes and the
vectorized parquet reader — set once here so every entry point agrees.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "thanos_parquet_gateway_spark",
              extra_conf: dict | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # match local cores; on a 1000-executor cluster this would be set to
        # ~2-3x total cores by the deployment, AQE coalesces the rest.
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # events.parquet carries TIMESTAMP(NANOS); Spark's TimestampType is
        # micros — read nanos as long and normalize in sources/tables.py
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # label-map rebuilds (label_replace, group_left include) may produce
        # duplicate keys; PromQL semantics = last write wins
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # broadcast by SIZE, never by hint, for SF-proportional tables:
        # Spark's 10 MB default predates 100+ GiB executors — 64 MB keeps
        # mid-size dims (e.g. TPC-H customer at sf1, ~30 MB) on the
        # broadcast path while a multi-TB table at 100 TB scale still
        # correctly shuffle-joins.  AQE re-checks with runtime sizes.
        .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "67108864")
        # overwrite only the partitions present in the written data — makes
        # day-incremental conversion (cli.py convert) safe against the
        # stream/date-partitioned table
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # PySpark 4's error-context enrichment walks the Python stack and
        # makes one extra JVM round trip (PySparkCurrentOrigin) for EVERY
        # DataFrame/Column API call — profiling showed ~600 such calls per
        # compiled query, pure driver-side latency.  Query compile time is
        # serving latency here, so trade the error call-site decoration away.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
