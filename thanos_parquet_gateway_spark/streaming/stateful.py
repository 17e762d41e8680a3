"""Custom stateful streaming operator: per-series reset-corrected running
increase (the streaming analogue of PromQL ``increase`` accumulation).

Built-in streaming aggregations (tumbling/session windows) cannot express
"carry the last sample + cumulative reset correction per series across
micro-batches", so this uses ``applyInPandasWithState`` — the designated
escape hatch for custom stateful logic (Arrow-batched, grouped state keyed
by series sig).

State per series: (last_ts, last_value, cum_increase).  Each incoming batch
is sorted by ts; counter resets (v < prev) add prev to the correction, so
cum_increase is monotone like PromQL's increase over an ever-growing window.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from thanos_parquet_gateway_spark.schema import canonical_sig

OUTPUT_SCHEMA = T.StructType([
    T.StructField("sig", T.StringType()),
    T.StructField("ts", T.LongType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("cum_increase", T.DoubleType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("last_ts", T.LongType()),
    T.StructField("last_value", T.DoubleType()),
    T.StructField("cum", T.DoubleType()),
])


def _update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    """Reset-corrected running increase.  State: (last_ts, last_value, acc)
    where acc = cumulative increase up to and including last sample."""
    (sig,) = key
    if state.exists:
        last_ts, last_value, acc = state.get
    else:
        last_ts, last_value, acc = -1, None, 0.0
    outs = []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        rows = []
        for ts, v in zip(pdf["ts"], pdf["value"]):
            ts, v = int(ts), float(v)
            if ts <= last_ts:
                continue  # late/duplicate sample: state already past it
            if last_value is not None:
                acc += v if v < last_value else v - last_value
            last_ts, last_value = ts, v
            rows.append((sig, ts, v, acc))
        if rows:
            outs.append(pd.DataFrame(rows, columns=["sig", "ts", "value",
                                                    "cum_increase"]))
    state.update((last_ts, last_value if last_value is not None else 0.0, acc))
    yield from outs


def stream_running_increase(spark, in_path: str, out_path: str,
                            checkpoint: str, *, available_now: bool = True):
    """File-source stream → per-series running increase → parquet sink."""
    from thanos_parquet_gateway_spark.streaming.convert_stream import RAW_SCHEMA
    raw = spark.readStream.schema(RAW_SCHEMA).parquet(in_path)
    keyed = raw.select(canonical_sig("labels").alias("sig"), "ts", "value")
    out = keyed.groupBy("sig").applyInPandasWithState(
        _update, OUTPUT_SCHEMA, STATE_SCHEMA, "append",
        GroupStateTimeout.NoTimeout)
    writer = (out.writeStream.format("parquet")
              .option("path", out_path)
              .option("checkpointLocation", checkpoint)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def batch_running_increase(df: DataFrame) -> DataFrame:
    """Batch oracle: the same semantics via a window (lag + conditional
    cumulative sum) — streaming output must agree batch-for-batch."""
    from pyspark.sql import Window
    keyed = df.select(canonical_sig("labels").alias("sig"), "ts", "value")
    w = Window.partitionBy("sig").orderBy("ts")
    delta = (F.when(F.col("value") < F.lag("value").over(w), F.col("value"))
             .otherwise(F.col("value") - F.coalesce(F.lag("value").over(w),
                                                    F.col("value"))))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (keyed.withColumn("__d", delta)
            .withColumn("cum_increase",
                        F.sum(F.coalesce(F.col("__d"), F.lit(0.0))).over(wsum))
            .select("sig", "ts", "value", "cum_increase"))
